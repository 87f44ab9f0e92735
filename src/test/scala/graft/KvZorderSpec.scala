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

  test("compact preserves the z-order clustering the store paid for") {
    val d = Files.createTempDirectory("graft_kvzcompact").toFile
    d.deleteOnExit()
    val store = d.getAbsolutePath

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

    assert(KvStore.zorder(spark, store, Schema, ("a", "b"), 16).version == 2)
    assert(KvStore.clusteringOf(store).contains(("a", "b")))

    // size-driven maintenance AFTER the clustering investment: compact
    // must detect the persisted spec and re-sort within the rewrite —
    // a hash bin-pack here would scatter both dimensions and the box
    // query would open all 4 files again
    val m = KvStore.compact(spark, store, Schema, 4)
    assert(m.version == 3 && m.rewritten == 4)

    val after = boxQuery().collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val (listed, planned) = KvPruneStats.last(store).get
    assert(after == expect, "clustering-preserving compact changed content")
    assert(listed == 4)
    // 4 z-ordered files = 32×32 quadrants; a ∈ [0,7] intersects the two
    // a-low quadrants only
    assert(planned <= 2,
      s"expected ≤2 of 4 files planned after compact-after-zorder, got $planned")

    // a spec that no longer names two integer schema columns falls back
    // to the plain bin-pack instead of failing maintenance
    val narrow = org.apache.spark.sql.types.StructType.fromDDL("a LONG")
    val projected = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", store).option("schema", Ddl).load().select("a")
    val store2 = Files.createTempDirectory("graft_kvzcompact2").toFile
    store2.deleteOnExit()
    projected.repartition(6)
      .write.format("graft.sources.KvSinkProvider")
      .option("path", store2.getAbsolutePath).mode("append").save()
    java.nio.file.Files.writeString(
      store2.toPath.resolve("_cluster"), "a,gone")
    val m2 = KvStore.compact(spark, store2.getAbsolutePath, narrow, 2)
    assert(m2.version == 2 && m2.rewritten == 2)
    assert(spark.read.format("graft.sources.KvSourceProvider")
      .option("path", store2.getAbsolutePath).option("schema", "a LONG")
      .load().count() == 4096)
  }
}
