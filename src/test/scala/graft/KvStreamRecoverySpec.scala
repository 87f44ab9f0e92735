package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once under an ACTUAL batch replay for the foreachBatch →
  * KvSink path (the claim q_stream_kv_sink's per-batchId directory wipe
  * makes): the writer crashes AFTER persisting batch 1's output but
  * BEFORE the checkpoint commits, so on restart Structured Streaming
  * replays batch 1 with the SAME batchId — the at-least-once replay that
  * idempotent per-batch output must collapse back to exactly-once. The
  * accumulated kv tree must equal an uninterrupted run's, with no
  * duplicated window rows. */
class KvStreamRecoverySpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  private def agg(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("ts", col("ts").cast("timestamp"))
    .withWatermark("ts", "2 hours")
    .groupBy(window(col("ts"), "1 hour"), col("event_type"))
    .agg(count(lit(1)).as("n"))
    .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
      col("n"))

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete(): Unit
  }

  test("injected post-write crash: replayed batch overwrites, never duplicates") {
    val events = graft.core.Graft.table(spark, sf, "events")
      .orderBy("ts", "event_id")
    val root = Files.createTempDirectory("graft_kv_recovery")
    val srcDir = root.resolve("src"); Files.createDirectories(srcDir)
    val ckpt = root.resolve("ckpt").toString
    val staged = root.resolve("staged").toString

    val withIdx = events.withColumn("idx", monotonically_increasing_id())
    def stage(tag: String, i: Int): java.io.File = {
      withIdx.filter(col("idx") % 3 === i).drop("idx")
        .coalesce(1).write.mode("overwrite").parquet(s"$staged/$tag$i")
      new java.io.File(s"$staged/$tag$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
    }

    // Crash keyed on the Nth NON-EMPTY batch (absolute batch ids depend
    // on whether an initial empty batch ran). Returns the crashed flag so
    // the test can assert the injection actually fired post-write.
    def kvWriter(out: String, crashOnNthNonEmpty: Int) = {
      val nonEmpty = new java.util.concurrent.atomic.AtomicInteger(0)
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val fn = (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) => {
        val dir = new java.io.File(s"$out/batch=$id")
        if (dir.exists()) rmTree(dir)
        b.write.format("graft.sources.KvSinkProvider")
          .option("path", dir.getAbsolutePath).mode("append").save()
        if (!b.isEmpty && nonEmpty.incrementAndGet() == crashOnNthNonEmpty &&
            crashed.compareAndSet(false, true))
          throw new RuntimeException("injected post-write crash")
      }
      (fn, crashed)
    }

    val out = root.resolve("kv").toString
    def start(crashOnNthNonEmpty: Int) = {
      val (fn, crashed) = kvWriter(out, crashOnNthNonEmpty)
      val q = agg(
          spark.readStream.schema(events.schema).parquet(srcDir.toString))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(fn)
        .start()
      (q, crashed)
    }

    // run 1: land drops until the FIRST non-empty output batch persists
    // its kv directory and then dies before the checkpoint commit (WHICH
    // batch that is depends on no-data-batch scheduling — irrelevant to
    // the differential; what matters is that an uncommitted non-empty
    // batch is already on disk when the query dies)
    val (q1, crashed1) = start(crashOnNthNonEmpty = 1)
    try {
      (0 until 3).foreach { i =>
        if (q1.exception.isEmpty) {
          Files.move(stage("d", i).toPath, srcDir.resolve(s"drop_$i.parquet"))
          q1.processAllAvailable()
        }
      }
    } catch { case _: Exception => () }
    val deadline = System.currentTimeMillis + 30000
    while (q1.exception.isEmpty && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    assert(q1.exception.isDefined, "injected crash did not terminate run 1")
    assert(crashed1.get(),
      "precondition: the injected crash must have fired after the write")

    // run 2: resume from the checkpoint — the uncommitted batch REPLAYS
    // (same batchId, dir wiped and rewritten), then the remaining drops
    // close out the corpus. The final accumulated window set depends only
    // on the final watermark, not the batching, so it must equal the
    // uninterrupted reference.
    val (q2, _) = start(crashOnNthNonEmpty = 0)
    try {
      q2.processAllAvailable() // replay of the crashed batch
      (0 until 3).foreach { i =>
        if (!Files.exists(srcDir.resolve(s"drop_$i.parquet"))) {
          Files.move(stage("d", i).toPath, srcDir.resolve(s"drop_$i.parquet"))
          q2.processAllAvailable()
        }
      }
    } finally q2.stop()

    // reference: same pipeline, one uninterrupted run, separate tree
    val refRoot = Files.createTempDirectory("graft_kv_recovery_ref")
    val refSrc = refRoot.resolve("src"); Files.createDirectories(refSrc)
    val refOut = refRoot.resolve("kv").toString
    val qr = agg(spark.readStream.schema(events.schema).parquet(refSrc.toString))
      .writeStream.outputMode("append")
      .option("checkpointLocation", refRoot.resolve("ckpt").toString)
      .foreachBatch(kvWriter(refOut, 0)._1)
      .start()
    try {
      (0 until 3).foreach { i =>
        Files.move(stage("r", i).toPath, refSrc.resolve(s"drop_$i.parquet"))
        qr.processAllAvailable()
      }
    } finally qr.stop()

    def readKv(path: String) = spark.read
      .format("graft.sources.KvSourceProvider")
      .option("path", path).option("recursive", "true")
      .option("schema", "ws_us LONG, event_type STRING, n LONG").load()
      .collect().map(_.toString).sorted.toSeq

    val got = readKv(out)
    val ref = readKv(refOut)
    assert(got.nonEmpty, "append-mode stream emitted nothing")
    assert(got.distinct.size === got.size, "duplicated window rows after replay")
    assert(got === ref,
      "recovered run diverged from the uninterrupted run")
  }

  /** The r12 discipline the live twins actually use: the batchId rides
    * as a TRANSACTION ID in the sink's commit-log manifest, so a crash-
    * replayed batch detects it already committed and publishes NOTHING —
    * exactly-once WITHOUT wipe-before-write. Crash-proved: the batch's
    * first-write files must survive the replay untouched (same names,
    * same log version — nothing deleted, nothing duplicated). */
  test("txn-id replay: no duplicate member, no wipe, first write survives") {
    val events = graft.core.Graft.table(spark, sf, "events")
      .orderBy("ts", "event_id")
    val root = Files.createTempDirectory("graft_kv_txn_recovery")
    val srcDir = root.resolve("src"); Files.createDirectories(srcDir)
    val ckpt = root.resolve("ckpt").toString
    val staged = root.resolve("staged").toString
    val out = root.resolve("kv").toString

    val withIdx = events.withColumn("idx", monotonically_increasing_id())
    def stage(i: Int): java.io.File = {
      withIdx.filter(col("idx") % 3 === i).drop("idx")
        .coalesce(1).write.mode("overwrite").parquet(s"$staged/t$i")
      new java.io.File(s"$staged/t$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
    }

    def start(crashOnNthNonEmpty: Int) = {
      val nonEmpty = new java.util.concurrent.atomic.AtomicInteger(0)
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val q = agg(
          spark.readStream.schema(events.schema).parquet(srcDir.toString))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          b.write.format("graft.sources.KvSinkProvider")
            .option("path", s"$out/batch=$id").option("txnId", s"b$id")
            .mode("append").save()
          if (!b.isEmpty && nonEmpty.incrementAndGet() == crashOnNthNonEmpty &&
              crashed.compareAndSet(false, true))
            throw new RuntimeException("injected post-write crash")
        }
        .start()
      (q, crashed)
    }

    // run 1: crash after the first non-empty batch persisted + committed
    // its kv output but BEFORE the streaming checkpoint records it
    val (q1, crashed1) = start(crashOnNthNonEmpty = 1)
    try {
      (0 until 3).foreach { i =>
        if (q1.exception.isEmpty) {
          Files.move(stage(i).toPath, srcDir.resolve(s"drop_$i.parquet"))
          q1.processAllAvailable()
        }
      }
    } catch { case _: Exception => () }
    val deadline = System.currentTimeMillis + 30000
    while (q1.exception.isEmpty && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    assert(q1.exception.isDefined && crashed1.get())

    // snapshot the crashed batch dirs: file sets + log versions
    def batchState(): Map[String, (Set[String], Int)] =
      Option(new java.io.File(out).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("batch=")).map { d =>
          val p = d.toPath
          d.getName -> (graft.sources.KvCommitLog.liveFiles(p),
            graft.sources.KvCommitLog.latestVersion(p))
        }.toMap
    val afterCrash = batchState()
    assert(afterCrash.nonEmpty, "no batch output persisted before the crash")

    // run 2: resume — the uncommitted batch REPLAYS with the same id;
    // its write must be a published no-op
    val (q2, _) = start(crashOnNthNonEmpty = 0)
    try {
      q2.processAllAvailable()
      (0 until 3).foreach { i =>
        if (!Files.exists(srcDir.resolve(s"drop_$i.parquet"))) {
          Files.move(stage(i).toPath, srcDir.resolve(s"drop_$i.parquet"))
          q2.processAllAvailable()
        }
      }
    } finally q2.stop()

    val afterReplay = batchState()
    afterCrash.foreach { case (b, (files, version)) =>
      val (files2, version2) = afterReplay(b)
      assert(files2 == files, s"$b: replay changed the live file set")
      assert(version2 == version, s"$b: replay published a new version")
    }
    // and the accumulated rows equal the plain batch aggregation (no dup)
    val got = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out).option("recursive", "true")
      .option("schema", "ws_us LONG, event_type STRING, n LONG").load()
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got.distinct.size == got.size,
      "duplicated rows after txn replay")
  }
}
