package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.KvStore

/** The wide-delta merge path (r16, the r15 verdict's driver-collect fix):
  * above `spark.graft.merge.keyCollectMax` distinct keys, merge/mergeDV
  * must never materialize the delta's key set on the driver — file
  * targeting falls back to the delta's [min,max] key range and the
  * per-file doomed ordinals come from the distributed key join. These
  * tests drive BOTH paths over identical stores with a tiny threshold
  * and pin (a) result equality row-for-row, (b) that the wide path was
  * actually taken (KvStore.lastMergeKeysDistributed), and (c) the
  * merge-on-read variant still commits proper vectors (time travel
  * below the merge intact). */
class KvStoreWideMergeSpec extends AnyFunSuite with SparkSessionFixture {

  private val schema = StructType.fromDDL("k LONG, v LONG")
  private val CapKey = "spark.graft.merge.keyCollectMax"

  private def freshStore(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_kvwide_$tag").toFile
    d.deleteOnExit()
    val out = d.getAbsolutePath
    spark.range(0, 200).select(col("id").as("k"), (col("id") * 7).as("v"))
      .repartitionByRange(4, col("k"))
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out).mode("append").save()
    out
  }

  private def readKv(out: String) = spark.read
    .format("graft.sources.KvSourceProvider")
    .option("path", out).option("schema", "k LONG, v LONG").load()

  private def rows(out: String): Seq[(Long, Long)] =
    readKv(out).collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sortBy(identity)

  // 60 distinct upsert keys (> the test threshold of 8) confined to the
  // store's UPPER key range [120, 179], so range targeting must leave
  // the low-range files untouched
  private def delta = spark.range(0, 60)
    .select((col("id") + 120).as("k"), lit(-1L).as("v"))

  private def withCap[T](n: Long)(body: => T): T = {
    val prev = spark.conf.getOption(CapKey)
    spark.conf.set(CapKey, n.toString)
    try body finally prev match {
      case Some(v) => spark.conf.set(CapKey, v)
      case None => spark.conf.unset(CapKey)
    }
  }

  test("wide CoW merge ≡ narrow merge, with no driver key set") {
    val narrow = freshStore("cow_narrow")
    val wide = freshStore("cow_wide")
    KvStore.merge(spark, narrow, schema, "k", delta, deleteKeys = Seq(150L, 151L))
    assert(!KvStore.lastMergeKeysDistributed,
      "a 60-key delta under the default 1M cap must take the narrow path")
    val mW = withCap(8) {
      KvStore.merge(spark, wide, schema, "k", delta, deleteKeys = Seq(150L, 151L))
    }
    assert(KvStore.lastMergeKeysDistributed,
      "a 60-key delta under an 8-key cap must take the distributed path")
    assert(rows(wide) == rows(narrow),
      "wide-path merge content diverged from the narrow path")
    assert(mW.rowsDeleted > 0 && mW.rowsAdded == 60)
    // the delta span [120, 179] misses the low-range files entirely —
    // range targeting must leave at least one file untouched
    assert(mW.untouched >= 1, s"range targeting rewrote everything: $mW")
  }

  test("wide mergeDV ≡ narrow mergeDV; vectors committed, history intact") {
    val narrow = freshStore("dv_narrow")
    val wide = freshStore("dv_wide")
    KvStore.mergeDV(spark, narrow, schema, "k", delta)
    assert(!KvStore.lastMergeKeysDistributed)
    val mW = withCap(8) { KvStore.mergeDV(spark, wide, schema, "k", delta) }
    assert(KvStore.lastMergeKeysDistributed)
    assert(rows(wide) == rows(narrow),
      "wide-path mergeDV content diverged from the narrow path")
    assert(mW.rowsDeleted == 60 && mW.rowsAdded == 60, s"got $mW")
    // merge-on-read: data files stay, vectors attached, history readable
    val pre = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", wide).option("schema", "k LONG, v LONG")
      .option("asOfCommit", "1").load()
    assert(pre.count() == 200, "pre-merge snapshot lost")
    assert(new java.io.File(wide).listFiles().exists(_.getName.endsWith(".dv")),
      "wide mergeDV committed no deletion vector")
  }

  test("wide merge with an empty delta is a no-op commit") {
    val out = freshStore("empty")
    val empty = spark.range(0).select(col("id").as("k"), col("id").as("v"))
    val m = withCap(0) { KvStore.merge(spark, out, schema, "k", empty) }
    assert(m.rowsDeleted == 0 && m.rowsAdded == 0)
    assert(rows(out).size == 200)
  }
}
