package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{KvBloom, KvPruneStats, KvZoneMap}

/** Per-file Bloom-filter sidecars (sources/KvBloom + `#bf` lines in
  * sources/KvSink `KvZoneMap`): the point-lookup pruning tier for
  * layouts where every file's [min,max] spans the key domain and bounds
  * can't skip anything. Soundness = no false negatives, pinned both at
  * the filter level (property) and end-to-end (every written key found
  * after pruning); effectiveness = planned < listed, pinned via
  * KvPruneStats. Propagation through CoW rewrites and compaction is
  * presence-derived from the original sidecars — mutation never
  * downgrades the pruning tier. */
class KvBloomSpec extends AnyFunSuite with SparkSessionFixture {

  private def freshDir(name: String): String = {
    val out = new File(sys.props("java.io.tmpdir"), s"graft-kvbloom/$name")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(out)
    out.getAbsolutePath
  }

  /** A HASH-distributed store: all files span the full key range, so
    * zone-map bounds alone can never skip a file. */
  private def writeStore(out: String): Unit =
    spark.range(0L, 8000L)
      .select(col("id").as("k"), (col("id") * 3L).as("v"),
        concat(lit("s"), (col("id") % 1000L).cast("string")).as("tag"))
      .repartition(8, col("v")) // hash layout on ANOTHER column
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out)
      .option("bloomColumns", "k,tag")
      .mode("append").save()

  private def readStore(out: String) =
    spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out).option("schema", "k LONG, v LONG, tag STRING")
      .load()

  test("filter level: no false negatives, roundtrip through encoding") {
    val rnd = new scala.util.Random(20260816L)
    val longs = Array.fill(5000)(rnd.nextLong()) ++
      Array(0L, -1L, Long.MinValue, Long.MaxValue)
    val b = KvBloom.build(longs.map(KvBloom.hashLong))
    val decoded = KvBloom.decode(b.k, b.m, KvBloom.encode(b.bits))
    longs.foreach(v => assert(decoded.mightContain(KvBloom.hashLong(v)),
      s"false negative for $v"))
    // strings, incl. empty / unicode / supplementary-plane
    val strs = Array.fill(2000)(rnd.nextString(rnd.nextInt(12))) ++
      Array("", "héllo", "日本語", "a😀b", "%,\n")
    val sb = KvBloom.build(strs.map(KvBloom.hashString))
    val sd = KvBloom.decode(sb.k, sb.m, KvBloom.encode(sb.bits))
    strs.foreach(s => assert(sd.mightContain(KvBloom.hashString(s)),
      s"false negative for '$s'"))
    // effectiveness sanity at the filter level: ~1% FPP, so the vast
    // majority of absent probes must miss (loose 10% bound — not flaky)
    val absentMiss = (1 to 2000)
      .count(i => !decoded.mightContain(KvBloom.hashLong(rnd.nextLong())))
    assert(absentMiss > 1800, s"only $absentMiss/2000 absent probes missed")
  }

  test("hash layout: bounds can't prune, blooms do — answers unchanged") {
    val out = freshDir("prune")
    writeStore(out)
    // bounds are useless here: a mid-range lookup planned from bounds
    // alone would open all 8 files
    val got = readStore(out).filter(col("k") === 4242L).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((4242L, 12726L)))
    val (listed, planned) = KvPruneStats.last(out).get
    assert(listed === 8)
    assert(planned < 8, "bloom tier planned every file on a point lookup")
    // IN-list: keeps the union of possibly-holding files, still < all
    val in = readStore(out).filter(col("k").isin(1L, 4242L, 7999L))
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(in === Seq(1L, 4242L, 7999L))
    // string equality through the same tier
    val tagged = readStore(out).filter(col("tag") === "s777").count()
    assert(tagged === 8) // 8000 ids, id % 1000 == 777 → 8 rows
    // a value that was NEVER written: blooms prove every file clean
    assert(readStore(out).filter(col("k") === 123456789L).count() === 0L)
    val (l2, p2) = KvPruneStats.last(out).get
    assert(l2 === 8 && p2 === 0, s"absent key planned $p2 files")
  }

  test("end-to-end no false negatives: every written key is found") {
    val out = freshDir("nofn")
    writeStore(out)
    // one probe per file-sized stride — each must survive pruning
    val keys = (0L until 8000L by 97L).toSeq
    val found = readStore(out)
      .filter(col("k").isInCollection(keys)).collect().map(_.getLong(0)).sorted
    assert(found.toSeq === keys.sorted)
  }

  test("nulls: never added, never tested, IS NULL unaffected") {
    val out = freshDir("nulls")
    spark.range(0L, 100L)
      .select(col("id").as("k"),
        when(col("id") % 10L === 0L, lit(null)).otherwise(concat(lit("t"),
          col("id").cast("string"))).as("tag"))
      .repartition(4)
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out).option("bloomColumns", "tag")
      .mode("append").save()
    val t = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out).option("schema", "k LONG, tag STRING").load()
    assert(t.filter(col("tag").isNull).count() === 10L)
    assert(t.filter(col("tag") === "t37").collect().map(_.getLong(0)).toSeq === Seq(37L))
  }

  test("CoW delete rewrites keep the bloom tier (presence-propagated)") {
    val out = freshDir("cow")
    writeStore(out)
    import org.apache.spark.sql.sources.GreaterThanOrEqual
    graft.sources.KvStore.deleteWhere(spark, out,
      org.apache.spark.sql.types.StructType.fromDDL("k LONG, v LONG, tag STRING"),
      Seq(GreaterThanOrEqual("k", 7000L))): Unit
    // every surviving file's sidecar still blooms both columns
    val dataFiles = new File(out).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val live = graft.sources.KvCommitLog.liveFiles(new File(out).toPath)
    assert(live.nonEmpty)
    live.foreach { n =>
      val st = KvZoneMap.read(new File(out, n)).get
      assert(st.blooms.keySet === Set("k", "tag"), s"$n lost its blooms")
    }
    assert(dataFiles.nonEmpty)
    // pruning still engages and answers stay exact after the rewrite
    val got = readStore(out).filter(col("k") === 4242L).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(4242L))
    val (listed, planned) = KvPruneStats.last(out).get
    assert(planned < listed)
    assert(readStore(out).filter(col("k") === 7500L).count() === 0L)
  }

  test("compaction re-blooms the folded files") {
    val out = freshDir("compact")
    writeStore(out)
    graft.sources.KvStore.compact(spark, out,
      org.apache.spark.sql.types.StructType.fromDDL("k LONG, v LONG, tag STRING"),
      2): Unit
    val live = graft.sources.KvCommitLog.liveFiles(new File(out).toPath)
    assert(live.size === 2)
    live.foreach { n =>
      val st = KvZoneMap.read(new File(out, n)).get
      assert(st.blooms.keySet === Set("k", "tag"), s"compacted $n lost blooms")
    }
    val got = readStore(out).filter(col("k") === 4242L).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(4242L))
  }

  test("catalog: TBLPROPERTIES bloomColumns persists and prunes through SQL") {
    val wh = freshDir("catalog-wh")
    spark.conf.set("spark.sql.catalog.graftbloom", "graft.sources.KvCatalog")
    spark.conf.set("spark.sql.catalog.graftbloom.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftbloom.ns")
      spark.sql("""CREATE TABLE graftbloom.ns.t (k BIGINT, v BIGINT, tag STRING)
                   TBLPROPERTIES ('bloomColumns'='k,tag')""")
      spark.range(0L, 4000L)
        .select(col("id").as("k"), (col("id") * 7L).as("v"),
          concat(lit("g"), (col("id") % 100L).cast("string")).as("tag"))
        .repartition(6, col("v"))
        .writeTo("graftbloom.ns.t").append()
      val tdir = new File(new File(wh, "ns"), "t").getAbsolutePath
      val got = spark.sql("SELECT v FROM graftbloom.ns.t WHERE k = 1234")
        .collect().map(_.getLong(0)).toSeq
      assert(got === Seq(8638L))
      val (listed, planned) = KvPruneStats.last(tdir).get
      assert(listed === 6 && planned < 6)
      // property round-trips through SHOW TBLPROPERTIES
      val props = spark.sql("SHOW TBLPROPERTIES graftbloom.ns.t")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("bloomColumns").contains("k,tag"))
      // SQL UPDATE (CoW through KvRowLevel) keeps the tier: the rewritten
      // file re-blooms because the table's bloomCols reach the CoW writer
      spark.sql("UPDATE graftbloom.ns.t SET v = 0 WHERE k = 2222")
      val live = graft.sources.KvCommitLog.liveFiles(new File(tdir).toPath)
      live.foreach { n =>
        val st = KvZoneMap.read(new File(tdir, n)).get
        assert(st.blooms.keySet === Set("k", "tag"), s"post-UPDATE $n lost blooms")
      }
      assert(spark.sql("SELECT v FROM graftbloom.ns.t WHERE k = 2222")
        .collect().map(_.getLong(0)).toSeq === Seq(0L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graftbloom.ns.t")
      spark.conf.unset("spark.sql.catalog.graftbloom")
      spark.conf.unset("spark.sql.catalog.graftbloom.warehouse")
    }
  }

  test("HashAcc: distinct-bounded memory accumulator matches buffered build") {
    val rnd = new scala.util.Random(20260816L)
    // heavy duplication: 50k adds over ~3k distincts (incl. hash 0L and
    // colliding low bits) — the r13-advice shape where row-proportional
    // buffering wasted heap
    val distincts = Array.fill(3000)(rnd.nextLong()) ++ Array(0L, 1L, -1L)
    val acc = new KvBloom.HashAcc
    (0 until 50000).foreach(i => acc.add(distincts(i % distincts.length)))
    assert(!acc.overflowed && !acc.isEmpty)
    val got = acc.toArray
    assert(got.length === distincts.distinct.length)
    assert(got.toSet === distincts.toSet)
    // the built filter is the same filter the old row-buffer produced
    val viaAcc = KvBloom.build(got)
    val viaBuf = KvBloom.build(
      (0 until 50000).map(i => distincts(i % distincts.length)).toArray)
    assert(viaAcc.m === viaBuf.m && viaAcc.bits.toSeq === viaBuf.bits.toSeq)
  }

  test("HashAcc: crossing MaxTrackedDistinct drops the filter explicitly") {
    val acc = new KvBloom.HashAcc
    var i = 0L
    while (!acc.overflowed && i <= KvBloom.MaxTrackedDistinct + 1L) {
      acc.add(KvBloom.hashLong(i)); i += 1
    }
    assert(acc.overflowed) // table freed, later adds are no-ops
    acc.add(KvBloom.hashLong(-1L))
    // the flag survives further adds, and the acc still reads as
    // non-empty (it HAS seen values) — commit() drops it on `overflowed`,
    // not on emptiness
    assert(acc.overflowed && !acc.isEmpty)
  }
}
