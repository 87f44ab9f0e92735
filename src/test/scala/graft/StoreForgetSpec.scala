package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for operators/ZoneMaps.targetedDelete (q_store_forget's
  * scale rationale): a clustered forget range must rewrite a strict
  * subset of the layout files (delete cost ∝ deleted data), the
  * post-delete view must equal filtering the whole table (no leaked
  * target, no lost bystander), and the untouched files must remain
  * byte-for-byte the files they were (copy-on-write never touches
  * them). */
class StoreForgetSpec extends AnyFunSuite with SparkSessionFixture {

  private val nFiles = 8

  private def layout(): String = {
    val root = Files.createTempDirectory("graft_forget").toFile
    root.deleteOnExit()
    val path = s"$root/docs"
    graft.operators.ZoneMaps.writeLayout(
      graft.core.Graft.table(spark, "/root/testdata/sf0.01", "documents")
        .select(col("doc_id"), col("lang"), col("text")),
      "doc_id", nFiles, path)
    path
  }

  test("clustered forget rewrites a strict subset; view equals complement") {
    val path = layout()
    val before = spark.read.parquet(path)
    val expected = before.filter(!col("doc_id").between(10L, 39L))
      .orderBy("doc_id").collect().toSeq
    val fileStamps = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val (total, rewritten, view) = graft.operators.ZoneMaps.targetedDelete(
      spark, path, "doc_id", 10L, 39L, s"$path-patch")
    assert(total == nFiles, s"layout should produce $nFiles files, saw $total")
    // [10, 39] is ~6% of the doc_id domain; disjoint range shards mean at
    // most 2 files can intersect it
    assert(rewritten < total, s"no pruning: rewrote $rewritten of $total")
    assert(rewritten <= 2, s"clustered range should localize: rewrote $rewritten")
    assert(view.orderBy("doc_id").collect().toSeq == expected,
      "post-delete view must equal filtering the full table")
    val after = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    assert(after == fileStamps,
      "copy-on-write delete must leave every original layout file untouched")
  }

  test("forget range hitting no zone is an idempotent no-op, not an error") {
    val path = layout()
    val before = spark.read.parquet(path).orderBy("doc_id").collect().toSeq
    val (total, rewritten, view) = graft.operators.ZoneMaps.targetedDelete(
      spark, path, "doc_id", -500L, -100L, s"$path-patch-none")
    assert(total == nFiles && rewritten == 0,
      s"no-zone forget must rewrite nothing: $rewritten of $total")
    assert(view.orderBy("doc_id").collect().toSeq == before,
      "no-zone forget must return the table unchanged")
  }

  test("forget range spanning everything rewrites everything, result empty-safe") {
    val path = layout()
    val bounds = spark.read.parquet(path)
      .agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (total, rewritten, view) = graft.operators.ZoneMaps.targetedDelete(
      spark, path, "doc_id", bounds.getLong(0), bounds.getLong(1),
      s"$path-patch-all")
    assert(rewritten == total, "full-range forget must rewrite all files")
    assert(view.count() == 0, "full-range forget must empty the store")
  }
}
