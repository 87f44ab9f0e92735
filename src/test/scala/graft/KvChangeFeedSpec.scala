package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{KvCommitLog, KvStore}

/** CHANGE DATA FEED over the store (sources/KvChangeFeed +
  * KvChangeFeedPlan): `readChangeFeed=true` turns rows into
  * insert/delete EVENTS with `_change_type`/`_commit_version` columns,
  * at the CoW grain — a remove-carrying commit feeds each removed
  * file's rows as deletes and each added file's rows as inserts, so a
  * multiset fold `insert − delete` over any consumed version prefix
  * reconstructs the store content at that version exactly. Pinned:
  *
  *  - batch feed from 0 = converged snapshot stamped at the horizon;
  *  - batch feed (from, to] = per-version exact events whose fold over
  *    a delete + an update equals the final batch read;
  *  - compaction nets to ZERO under the fold;
  *  - the STREAMING feed consumes append + delete + merge commits
  *    (where the plain stream fails or skips) and its converged fold
  *    equals the batch read, across a restart from checkpoint. */
object KvChangeFeedSpec {
  /** Cross-restart event sink for the streaming test (foreachBatch
    * closures must reach a stable reference). */
  val events = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
}

class KvChangeFeedSpec extends AnyFunSuite with SparkSessionFixture {

  private val Ddl = "k LONG, v LONG"
  private val Schema = org.apache.spark.sql.types.StructType.fromDDL(Ddl)

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_kvcdf_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def append(out: String, from: Long, until: Long): Unit =
    spark.range(from, until).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1)
      .write.format("graft.sources.KvSinkProvider").option("path", out)
      .mode("append").save()

  private def feed(store: String, opts: Map[String, String] = Map.empty) = {
    val r = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", store).option("schema", Ddl)
      .option("readChangeFeed", "true")
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  private def batchRows(store: String): Seq[(Long, Long)] =
    spark.read.format("graft.sources.KvSourceProvider")
      .option("path", store).option("schema", Ddl).load()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  /** Multiset fold of a feed DataFrame: +1 per insert, −1 per delete. */
  private def fold(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.groupBy("k", "v")
      .agg(sum(when(col("_change_type") === "insert", 1L).otherwise(-1L)).as("n"))
      .collect()
      .flatMap(r => Seq.fill(r.getLong(2).toInt max 0)((r.getLong(0), r.getLong(1))))
      .sorted.toSeq

  test("batch feed from 0 = converged snapshot; fold across delete+update = final state") {
    val store = freshDir("batch")
    append(store, 0, 10)                    // v1
    append(store, 10, 20)                   // v2
    KvStore.deleteWhere(spark, store, Schema,
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("k", 15L))): Unit // v3
    // v4: UPDATE via merge — replace k=3's row
    KvStore.merge(spark, store, Schema, "k",
      spark.createDataFrame(Seq((3L, 999L))).toDF("k", "v")): Unit

    // snapshot feed: all events are inserts at the horizon version
    val snap = feed(store)
    assert(snap.select("_change_type").distinct()
      .collect().map(_.getString(0)).toSeq === Seq("insert"))
    val horizon = KvCommitLog.latestVersion(java.nio.file.Paths.get(store))
    assert(snap.select("_commit_version").distinct()
      .collect().map(_.getLong(0)).toSeq === Seq(horizon.toLong))
    assert(fold(snap) === batchRows(store))

    // per-version feed above the first append: fold reconstructs the
    // final state from (1, head] given the v1 content as the base
    val delta = feed(store, Map("changesFrom" -> "1"))
    val base = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", store).option("schema", Ddl)
      .option("asOfCommit", "1").load()
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(1L))
    assert(fold(base.unionByName(delta)) === batchRows(store))
    // the delete commit's events are visible as deletes
    assert(delta.filter(col("_change_type") === "delete").count() > 0)
  }

  test("compaction nets to zero under the fold") {
    val store = freshDir("compact")
    append(store, 0, 10)  // v1
    append(store, 10, 20) // v2
    val before = batchRows(store)
    KvStore.compact(spark, store, Schema, 1): Unit // v3: removes all, adds 1
    val delta = feed(store, Map("changesFrom" -> "2"))
    // v3 feeds 20 deletes + 20 inserts; the multiset fold cancels —
    // a CDC consumer sees no net change from maintenance
    assert(delta.count() === 40)
    val net = delta.groupBy("k", "v")
      .agg(sum(when(col("_change_type") === "insert", 1L).otherwise(-1L)).as("n"))
      .filter(col("n") =!= 0L).count()
    assert(net === 0L)
    assert(batchRows(store) === before)
  }

  test("streaming feed consumes delete/merge commits; converged fold == batch; restart exact") {
    val store = freshDir("stream")
    val ckpt = freshDir("ckpt")
    append(store, 0, 10) // v1
    // each run drains its NEW events (above the checkpointed offset)
    // into a durable local buffer — foreachBatch supports checkpoint
    // recovery where the memory sink does not (local mode: the batch
    // collect lands in this JVM)
    val events = KvChangeFeedSpec.events
    events.clear()
    def run(): Int = {
      val before = events.size
      val q = spark.readStream.format("graft.sources.KvSourceProvider")
        .option("path", store).option("schema", Ddl)
        .option("readChangeFeed", "true").load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val got = b.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
          KvChangeFeedSpec.events.synchronized {
            KvChangeFeedSpec.events ++= got
          }: Unit
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      events.size - before
    }
    assert(run() === 10) // snapshot inserts
    // a delete commit arrives while the stream is DOWN; restart resumes
    // from the checkpointed offset and consumes it as delete events
    KvStore.deleteWhere(spark, store, Schema,
      Seq(org.apache.spark.sql.sources.LessThan("k", 3L))): Unit // v2
    append(store, 20, 25) // v3
    // v2 is a CoW rewrite: 10 deletes (the whole original file) + 7
    // re-inserts; v3 adds 5
    assert(run() === 22)
    assert(events.count(_._3 == "delete") === 10)
    val folded = events.groupBy(e => (e._1, e._2))
      .map { case (kv, es) => kv -> es.map(e => if (e._3 == "insert") 1 else -1).sum }
      .collect { case (kv, n) if n > 0 => Seq.fill(n)(kv) }.flatten.toSeq.sorted
    assert(folded === batchRows(store))
    // replayed restart publishes nothing new
    assert(run() === 0)
  }

  test("guardrails: feed rejects net/recursive/asOf/skipChangeCommits; filters stay post-scan") {
    val store = freshDir("guard")
    append(store, 0, 10)
    intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.KvSourceProvider")
        .option("path", store).option("schema", Ddl)
        .option("readChangeFeed", "true").option("skipChangeCommits", "true")
        .load()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.KvSourceProvider")
        .option("path", store).option("schema", Ddl)
        .option("changesFrom", "1").load() // without readChangeFeed
    }
    // _change_type is a REAL output column; filtering on it works (as a
    // post-scan filter — the connector only accepts data-schema columns)
    val ins = feed(store).filter(col("_change_type") === "insert").count()
    assert(ins === 10L)
    // pushed data filters still prune: a key outside every zone plans
    // nothing and the feed is empty
    assert(feed(store).filter(col("k") === 12345L).count() === 0L)
  }

  test("changesTo above the latest commit is a bounds error, not 'vacuumed'") {
    val store = freshDir("oob")
    append(store, 0, 10) // one commit → latest version = 1
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.KvSourceProvider")
        .option("path", store).option("schema", Ddl)
        .option("readChangeFeed", "true")
        .option("changesFrom", "0").option("changesTo", "99")
        .load().collect()
    }
    assert(e.getMessage.contains("exceeds the latest committed version"),
      s"got: ${e.getMessage}")
    assert(!e.getMessage.contains("vacuumed"))
  }
}
