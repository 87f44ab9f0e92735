package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{KvCommitLog, KvStore}

/** The store as a STREAMING SOURCE (sources/KvMicroBatchStream): commit-
  * log versions are offsets, the first batch is a snapshot, later batches
  * are per-commit deltas. Pinned here:
  *
  *  - converged streaming content equals a batch read, with appends
  *    landing both before the stream starts and while it runs;
  *  - a restart from the stream's checkpoint consumes ONLY commits above
  *    the recorded offset, and a txn-committed downstream store stays
  *    exactly-once across the restart;
  *  - non-append commits (remove lines) fail the stream by default and
  *    are skipped whole under skipChangeCommits — never a silent
  *    re-emission of changed rows. */
class KvStreamSourceSpec extends AnyFunSuite with SparkSessionFixture {

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_kvstream_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def append(out: String, from: Long, until: Long): Unit =
    spark.range(from, until).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1)
      .write.format("graft.sources.KvSinkProvider").option("path", out)
      .mode("append").save()

  private def readStreamOf(store: String, skipChanges: Boolean = false) = {
    val r = spark.readStream.format("graft.sources.KvSourceProvider")
      .option("path", store).option("schema", "k LONG, v LONG")
    (if (skipChanges) r.option("skipChangeCommits", "true") else r).load()
  }

  test("snapshot first batch + per-commit deltas; converged == batch read") {
    val store = freshDir("conv")
    append(store, 0, 10)   // v1 — before the stream starts
    append(store, 10, 20)  // v2 — before the stream starts
    val q = readStreamOf(store)
      .writeStream.outputMode("append").format("memory").queryName("kvss_conv")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("kvss_conv").count() == 20,
        "initial snapshot must cover all pre-stream commits")
      append(store, 20, 30)  // v3 — while live: one delta batch
      q.processAllAvailable()
      val got = spark.table("kvss_conv").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == (0L until 30L).map(k => (k, k * 2)),
        "converged stream content must equal a batch read, exactly once")
    } finally q.stop()
  }

  test("restart from checkpoint: only new commits consumed, downstream exactly-once") {
    val src = freshDir("restart_src")
    val dst = freshDir("restart_dst")
    val ckpt = freshDir("restart_ckpt")
    append(src, 0, 10) // v1
    append(src, 10, 20) // v2
    def run(): Unit = {
      val q = readStreamOf(src)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          b.write.format("graft.sources.KvSinkProvider")
            .option("path", dst).option("txnId", s"b$id")
            .mode("append").save()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val dstV1 = KvCommitLog.latestVersion(Paths.get(dst))
    append(src, 20, 25) // v3, landed while no stream is running
    run() // restart from the checkpoint: must consume ONLY v3
    val rows = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", dst).option("schema", "k LONG, v LONG").load()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rows == (0L until 25L).map(k => (k, k * 2)),
      s"restart duplicated or lost rows (got ${rows.size})")
    assert(KvCommitLog.latestVersion(Paths.get(dst)) > dstV1,
      "the restarted stream must have committed the new source batch")
  }

  test("change commits: fail by default, skipped whole with skipChangeCommits") {
    val store = freshDir("chg")
    append(store, 0, 10) // v1
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v BIGINT")
    // default: a DELETE landing mid-stream fails the next trigger loudly
    val q1 = readStreamOf(store)
      .writeStream.outputMode("append").format("memory").queryName("kvss_chg1")
      .start()
    try {
      q1.processAllAvailable()
      KvStore.deleteWhere(spark, store, schema,
        Seq(org.apache.spark.sql.sources.LessThan("k", 3L))) // v2: removes
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      assert(e.getMessage.contains("not append-only") ||
        Option(e.getCause).exists(_.getMessage.contains("not append-only")),
        s"expected the append-only failure, got: ${e.getMessage}")
    } finally q1.stop()
    // skipChangeCommits: the delete commit is skipped WHOLE, appends after
    // it flow — and rows it rewrote are not re-emitted
    append(store, 10, 15) // v3
    val q2 = readStreamOf(store, skipChanges = true)
      .writeStream.outputMode("append").format("memory").queryName("kvss_chg2")
      .start()
    try {
      q2.processAllAvailable() // snapshot at current head: post-delete view
      val snap = spark.table("kvss_chg2").collect().map(_.getLong(0)).sorted.toSeq
      assert(snap == (3L until 15L), s"snapshot must apply the delete: $snap")
      KvStore.deleteWhere(spark, store, schema,
        Seq(org.apache.spark.sql.sources.LessThan("k", 5L))) // v4: removes
      append(store, 15, 18) // v5
      q2.processAllAvailable()
      val got = spark.table("kvss_chg2").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (3L until 18L),
        s"change commit must be skipped whole, appends must flow: $got")
    } finally q2.stop()
  }
}
