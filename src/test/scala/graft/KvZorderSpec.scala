package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{KvCommitLog, KvPruneStats, KvStore}

/** Z-ORDER CLUSTERING for the store (sources/KvStore.zorder): the live
  * set rewritten range-partitioned + sorted by the bit-interleaved
  * z-value of two columns, so each committed file covers a tight
  * RECTANGLE in (a, b) space and the existing zone-map sidecars prune
  * 2-D range predicates. Pinned here with a measured file count:
  *
  *  - fixture: a 64×64 grid (k = id linear, cust = id % 64) laid out
  *    range-by-k in 16 files — every file spans ALL cust values, so a
  *    cust-range query prunes NOTHING under the linear layout;
  *  - after `zorder(cust, k)` the same query (zone maps, same pruning
  *    code path) opens a small fraction of the files;
  *  - content is bit-identical (sorted full compare), the commit is one
  *    OCC version, and time travel to the pre-rewrite layout answers. */
class KvZorderSpec extends AnyFunSuite with SparkSessionFixture {

  private val Ddl = "a LONG, b LONG"
  private val Schema = org.apache.spark.sql.types.StructType.fromDDL(Ddl)

  test("zorder collapses 2-D pruning file counts; content and history intact") {
    val d = Files.createTempDirectory("graft_kvzorder").toFile
    d.deleteOnExit()
    val store = d.getAbsolutePath

    // a TRUE 64×64 grid (a and b independent — a correlated fixture like
    // a = id % 64 degenerates the z-curve back to 1-D order), laid out
    // range-by-b in 16 files: every file spans ALL `a` values
    spark.range(0, 4096)
      .select((col("id") % 64).as("a"), expr("id DIV 64").as("b"))
      .repartitionByRange(16, col("b"))
      .write.format("graft.sources.KvSinkProvider")
      .option("path", store).mode("append").save()

    def boxQuery() = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", store).option("schema", Ddl).load()
      .filter(col("a") >= 0 && col("a") <= 7)
      .select("a", "b")

    val expect = boxQuery().collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val (listedBefore, plannedBefore) = KvPruneStats.last(store).get
    // linear-by-b layout: every file spans all `a` values — no pruning
    assert(listedBefore == 16 && plannedBefore == 16)

    val m = KvStore.zorder(spark, store, Schema, ("a", "b"), 16)
    assert(m.version == 2 && m.rewritten == 16)

    val after = boxQuery().collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val (listedAfter, plannedAfter) = KvPruneStats.last(store).get
    assert(after == expect, "z-order rewrite changed content")
    assert(listedAfter == 16)
    // a ∈ [0,7] is 1/8 of one dimension: z-blocks of 256 cells are 16×16
    // rectangles, so the band intersects ~4 of 16 files; anything not
    // sharply smaller means the clustering did not happen
    assert(plannedAfter <= 6,
      s"expected ≤6 of 16 files planned after zorder, got $plannedAfter")

    // time travel below the rewrite still serves the linear layout
    val pre = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", store).option("schema", Ddl)
      .option("asOfCommit", "1").load()
      .count()
    assert(pre == 4096)
    assert(KvCommitLog.latestVersion(d.toPath) == 2)
  }
}
