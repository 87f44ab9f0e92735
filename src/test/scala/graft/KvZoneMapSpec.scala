package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KvPruneStats

/** Zone-map file skipping for the Store (sources/KvSink `KvZoneMap` +
  * sources/KvSource): the sink publishes per-file integer min/max
  * sidecars at commit; the source consults them at split planning to skip
  * files a pushed static predicate — or a RUNTIME join-key set handed
  * over by Spark's dynamic-pruning machinery (`SupportsRuntimeV2Filtering`)
  * — can never match. */
class KvZoneMapSpec extends AnyFunSuite with SparkSessionFixture {

  private def freshDir(name: String): String = {
    val out = new File(sys.props("java.io.tmpdir"), s"graft-kvzm/$name")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(out)
    out.getAbsolutePath
  }

  private def writeStore(out: String, nParts: Int = 8): Unit =
    spark.range(0L, 8000L)
      .select(col("id").as("k"), (col("id") * 3L).as("v"))
      .repartitionByRange(nParts, col("k"))
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out).mode("append").save()

  private def readStore(out: String) =
    spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out).option("schema", "k LONG, v LONG").load()

  test("sink publishes one sidecar per committed file") {
    val out = freshDir("sidecars")
    writeStore(out)
    val fs = new File(out).listFiles()
    val data = fs.filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val zms = fs.filter(_.getName.startsWith("_zm."))
    assert(data.length === 8)
    assert(zms.map(_.getName.stripPrefix("_zm.").stripSuffix(".zm")).sorted.toSeq ===
      data.map(_.getName).sorted.toSeq)
  }

  test("static point/range predicates skip non-covering files") {
    val out = freshDir("static")
    writeStore(out)
    // point lookup: exactly one of the 8 range-partitioned files covers it
    val one = readStore(out).filter(col("k") === 4242L).collect()
    assert(one.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((4242L, 12726L)))
    val (listed, planned) = KvPruneStats.last(out).get
    assert(listed === 8)
    assert(planned === 1)
    // range: only the covering prefix of files survives
    val n = readStore(out).filter(col("k") < 1500L).count()
    assert(n === 1500L)
    val (_, planned2) = KvPruneStats.last(out).get
    assert(planned2 < 8)
    // IN: two distant keys → at most two files
    val got = readStore(out)
      .filter(col("k").isin(3L, 7777L)).orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(3L, 7777L))
    val (_, planned3) = KvPruneStats.last(out).get
    assert(planned3 <= 2)
  }

  test("a file without a sidecar is never skipped (pruning stays sound)") {
    val out = freshDir("nosidecar")
    writeStore(out)
    // simulate pre-zone-map data / foreign writers: drop the sidecar of
    // the FIRST range file (k min 0 — which does not cover the probe key,
    // so keeping it is purely the missing-stats discipline)
    val first = new File(out).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .find(f => graft.sources.KvZoneMap.read(f).exists(_.cols.get("k").exists(_._1 == 0L)))
      .get
    assert(new File(out, graft.sources.KvZoneMap.sidecarName(first.getName)).delete())
    val got = readStore(out).filter(col("k") === 4242L).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(4242L))
    val (listed, planned) = KvPruneStats.last(out).get
    assert(listed === 8)
    assert(planned === 2, "the statless file must be planned alongside the covering one")
  }

  test("runtime join-key filtering prunes files through dynamic pruning") {
    val out = freshDir("runtime")
    writeStore(out)
    // selective build side over a non-foldable source (a LocalRelation's
    // filter would constant-fold away and dynamic pruning requires a
    // surviving selective predicate): two keys from opposite range ends
    val dim = spark.range(0L, 8000L).select(col("id").as("k"))
      .filter(col("k").isin(10L, 7300L))
      .withColumn("name", concat(lit("n"), col("k")))
    val j = readStore(out).join(broadcast(dim), "k")
      .select(col("k"), col("v"), col("name"))
    val got = j.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got === Seq((10L, 30L, "n10"), (7300L, 21900L, "n7300")))
    val (listed, planned) = KvPruneStats.last(out).get
    assert(listed === 8)
    assert(planned <= 2,
      s"runtime IN-set should prune to the two covering files, planned=$planned")
  }

  private def hasAggregateExec(df: org.apache.spark.sql.DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains("HashAggregate") || p.contains("SortAggregate") ||
      p.contains("ObjectHashAggregate")
  }

  test("stats-answered aggregates: count/min/max folded from sidecars, files never opened") {
    val out = freshDir("statsagg")
    writeStore(out)
    // corrupt one DATA file (sidecar intact): if the scan opened it, the
    // parse would throw — the stats path must not touch it
    val victim = new File(out).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .head
    java.nio.file.Files.write(victim.toPath, "not,a,row\n".getBytes)
    val df = readStore(out).agg(
      count(lit(1)).as("n"), min(col("k")).as("k_min"),
      max(col("k")).as("k_max"), count(col("v")).as("nv"),
      sum(col("v")).as("v_sum"))
    assert(!hasAggregateExec(df), df.queryExecution.executedPlan.toString)
    assert(df.queryExecution.executedPlan.toString.contains("aggpush"))
    val r = df.collect().head
    assert(r.getLong(0) === 8000L)
    assert(r.getLong(1) === 0L)
    assert(r.getLong(2) === 7999L)
    assert(r.getLong(3) === 8000L)
    assert(r.getLong(4) === (0L until 8000L).map(_ * 3L).sum)
  }

  test("a sidecar lacking a requested #sum (old format) falls back to parsing that file") {
    val out = freshDir("oldsidecar")
    writeStore(out)
    // rewrite one sidecar without its #sum lines — the pre-sum format
    val data = new File(out).listFiles().filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")).head
    val side = new File(out, graft.sources.KvZoneMap.sidecarName(data.getName))
    val stripped = scala.io.Source.fromFile(side, "UTF-8").getLines()
      .filterNot(_.startsWith("#sum,")).mkString("", "\n", "\n")
    java.nio.file.Files.write(side.toPath, stripped.getBytes("UTF-8"))
    val df = readStore(out).agg(count(lit(1)).as("n"), sum(col("v")).as("v_sum"))
    assert(!hasAggregateExec(df))
    val r = df.collect().head
    assert(r.getLong(0) === 8000L)
    assert(r.getLong(1) === (0L until 8000L).map(_ * 3L).sum)
  }

  test("stats aggregate falls back to parsing a sidecar-less file, stays exact") {
    val out = freshDir("statsaggfallback")
    writeStore(out)
    val data = new File(out).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(new File(out, graft.sources.KvZoneMap.sidecarName(data.head.getName)).delete())
    val df = readStore(out).agg(count(lit(1)).as("n"), min(col("k")).as("k_min"),
      max(col("k")).as("k_max"))
    assert(!hasAggregateExec(df))
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((8000L, 0L, 7999L)))
  }

  test("stats aggregate declines with a row filter, grouping, or string min") {
    val out = freshDir("statsaggdecline")
    writeStore(out)
    val filtered = readStore(out).filter(col("k") > 10L).agg(count(lit(1)).as("n"))
    assert(hasAggregateExec(filtered))
    assert(filtered.collect().head.getLong(0) === 7989L)
    val grouped = readStore(out).groupBy(col("k") % 2).agg(count(lit(1)).as("n"))
    assert(hasAggregateExec(grouped))
    assert(grouped.collect().map(_.getLong(1)).sum === 8000L)
  }

  test("pruning scales with selectivity, not store size: 1 file planned at 8 AND 80 files") {
    // the 100 TB argument in miniature: a point lookup's cost is the
    // matching data, however much unrelated history the store holds
    for ((files, rows) <- Seq((8, 8000L), (80, 80000L))) {
      val out = freshDir(s"growth$files")
      spark.range(0L, rows)
        .select(col("id").as("k"), (col("id") * 3L).as("v"))
        .repartitionByRange(files, col("k"))
        .write.format("graft.sources.KvSinkProvider")
        .option("path", out).mode("append").save()
      val got = readStore(out).filter(col("k") === 4242L).collect()
      assert(got.map(_.getLong(0)).toSeq === Seq(4242L))
      val (listed, planned) = KvPruneStats.last(out).get
      assert(listed === files)
      assert(planned === 1, s"store of $files files planned $planned for a point lookup")
    }
  }

  test("typed zone maps: double and string bounds prune files") {
    val out = freshDir("typed")
    spark.range(0L, 8000L)
      .select(col("id").as("k"), (col("id") * 1.5).as("price"),
        concat(lit("g"), (col("id") / 1000L).cast("long")).as("grade"))
      .repartitionByRange(8, col("k"))
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out).mode("append").save()
    val rd = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out)
      .option("schema", "k LONG, price DOUBLE, grade STRING").load()
    // double range: only the low-k files can hold price < 1500
    val cheap = rd.filter(col("price") < 1500.0)
    assert(cheap.count() === 1000L)
    val (l1, p1) = KvPruneStats.last(out).get
    assert(l1 === 8 && p1 < 8, s"double pruning planned $p1 of $l1")
    // string equality: grade is k-range-aligned, so at most 2 files span g6
    val g6 = rd.filter(col("grade") === "g6")
    assert(g6.count() === 1000L)
    val (_, p2) = KvPruneStats.last(out).get
    assert(p2 <= 2, s"string pruning planned $p2 of 8")
    // string range prunes too
    rd.filter(col("grade") < "g1").count()
    val (_, p3) = KvPruneStats.last(out).get
    assert(p3 <= 2, s"string range planned $p3 of 8")
  }

  test("string bounds with framing characters escape correctly in sidecars") {
    val out = freshDir("escape")
    val s = spark
    import s.implicits._
    Seq((1L, "a,b\nc"), (2L, "z%z"), (3L, "plain"))
      .toDF("k", "txt").repartition(1)
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out).mode("append").save()
    val data = new File(out).listFiles().filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val st = graft.sources.KvZoneMap.read(data.head).get
    assert(st.scols("txt") === (("a,b\nc", "z%z")))
    val rd = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out).option("schema", "k LONG, txt STRING").load()
    assert(rd.filter(col("txt") === "a,b\nc").count() === 1L)
  }

  test("commit-metadata statistics reach the optimizer: exact rows, real bytes") {
    val out = freshDir("stats")
    writeStore(out)
    val df = readStore(out)
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(8000)), stats.toString)
    val actualBytes = new File(out).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length()).sum
    assert(stats.sizeInBytes === BigInt(actualBytes), stats.toString)
    // the consequence: a genuinely small store becomes the BROADCAST side
    // of a join with a big frame, without any hint
    val big = spark.range(0L, 2000000L).select((col("id") % 8000L).as("k"),
      col("id").as("z"))
    val j = big.join(readStore(out), "k")
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("net mode prunes from daemon-served stats: point lookup fetches one field") {
    val out = freshDir("netprune")
    writeStore(out)
    val port = graft.sources.KvDaemon.ensure(out)
    val netPath = s"net://127.0.0.1:$port"
    val rd = spark.read.format("graft.sources.KvSourceProvider")
      .option("endpoint", s"127.0.0.1:$port")
      .option("schema", "k LONG, v LONG").load()
    val got = rd.filter(col("k") === 4242L).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((4242L, 12726L)))
    val (listed, planned) = KvPruneStats.last(netPath).get
    assert(listed === 8)
    assert(planned === 1, s"daemon stats should prune to 1 field, planned=$planned")
    // runtime join-key pruning works over the socket too
    val dim = spark.range(0L, 8000L).select(col("id").as("k"))
      .filter(col("k").isin(10L, 7300L))
    val j = rd.join(broadcast(dim), "k")
    assert(j.collect().map(_.getLong(0)).sorted.toSeq === Seq(10L, 7300L))
    val (_, planned2) = KvPruneStats.last(netPath).get
    assert(planned2 <= 2, s"runtime keys over net planned $planned2")
    // an unfiltered scan stays full — and never pays the STATS round trips
    assert(rd.count() === 8000L)
    val (_, planned3) = KvPruneStats.last(netPath).get
    assert(planned3 === 8)
  }

  test("pruning composes with asOfCommit time travel (snapshot first, zone maps second)") {
    val out = freshDir("asof")
    writeStore(out) // commit 1: k in [0, 8000)
    spark.range(8000L, 16000L)
      .select(col("id").as("k"), (col("id") * 3L).as("v"))
      .repartitionByRange(8, col("k"))
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out).mode("append").save() // commit 2
    val asOf1 = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out).option("schema", "k LONG, v LONG")
      .option("asOfCommit", "1").load()
    // inside the snapshot: zone maps prune within commit 1's 8 files
    assert(asOf1.filter(col("k") === 4242L).collect().map(_.getLong(0)).toSeq === Seq(4242L))
    val (listed, planned) = KvPruneStats.last(out).get
    assert(listed === 8, "snapshot must hide commit 2's files before pruning")
    assert(planned === 1)
    // outside the snapshot: the row exists in the store but not at asOf 1
    assert(asOf1.filter(col("k") === 12000L).count() === 0L)
    // and the latest view sees it, pruned to one of 16 files
    val latest = readStore(out)
    assert(latest.filter(col("k") === 12000L).count() === 1L)
    val (listed2, planned2) = KvPruneStats.last(out).get
    assert(listed2 === 16 && planned2 === 1)
  }

  test("runtime pruning composes with a pushed static filter") {
    val out = freshDir("compose")
    writeStore(out)
    val dim = spark.range(0L, 8000L).select(col("id").as("k"))
      .filter(col("k").isin(10L, 7300L))
    // static k < 1000 already rules out the 7300 file; runtime keys rule
    // out everything but the first
    val j = readStore(out).filter(col("k") < 1000L).join(broadcast(dim), "k")
    assert(j.collect().map(_.getLong(0)).toSeq === Seq(10L))
    val (listed, planned) = KvPruneStats.last(out).get
    assert(listed === 8)
    assert(planned === 1)
  }
}
