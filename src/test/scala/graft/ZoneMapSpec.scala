package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for operators/ZoneMaps (q_zonemap_prune's scale rationale):
  * the manifest-selected file set must be a strict subset of the layout
  * for a selective range, the pruned read must equal the full
  * scan-and-filter row-for-row, and a full-range predicate must keep
  * every file (zones are necessary conditions — pruning may never drop a
  * file that could match). */
class ZoneMapSpec extends AnyFunSuite with SparkSessionFixture {

  private val nFiles = 8

  private def layout(): String = {
    val root = Files.createTempDirectory("graft_zonemap").toFile
    root.deleteOnExit()
    val path = s"$root/orders"
    graft.operators.ZoneMaps.writeLayout(
      graft.core.Graft.table(spark, "/root/testdata/sf0.01", "orders"),
      "o_orderkey", nFiles, path)
    path
  }

  test("selective range opens a strict subset of files; result equals full filter") {
    val path = layout()
    val (total, read, pruned) =
      graft.operators.ZoneMaps.prunedRead(spark, path, "o_orderkey", 1000L, 3000L)
    assert(total == nFiles, s"layout should produce $nFiles files, saw $total")
    // [1000, 3000] is ~3% of the orderkey domain; 8 disjoint range shards
    // mean at most 2 can intersect regardless of sampled boundaries
    assert(read < total, s"no pruning: read $read of $total files")
    assert(read <= 2, s"disjoint range shards should localize the range: read $read")
    val expected = spark.read.parquet(path)
      .filter(col("o_orderkey").between(1000L, 3000L))
      .orderBy("o_orderkey").collect()
    assert(pruned.orderBy("o_orderkey").collect().toSeq == expected.toSeq,
      "pruned read must equal full scan-and-filter")
  }

  test("full-range predicate keeps every file") {
    val path = layout()
    val keys = spark.read.parquet(path).agg(
      min(col("o_orderkey")), max(col("o_orderkey"))).head()
    val (total, read, _) = graft.operators.ZoneMaps.prunedRead(
      spark, path, "o_orderkey", keys.getLong(0), keys.getLong(1))
    assert(read == total, s"full range must keep all files: $read of $total")
  }
}
