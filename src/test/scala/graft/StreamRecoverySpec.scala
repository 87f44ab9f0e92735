package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Checkpoint-recovery differential: a streaming job stopped mid-corpus
  * and RESTARTED from its checkpoint must produce exactly the rows a
  * clean uninterrupted run produces — Spark's durable-offset/state story,
  * the engine-level analog of the reference server re-scheduling
  * in-flight contexts after worker loss (ImplServer.hs:86-90: the
  * unfinished context goes back on the queue; completed partitions stay
  * in the Store).
  *
  * Setup: the events table lands in a watched directory as three parquet
  * drops. The tumbling aggregation streams into a parquet FILE sink
  * (append mode with a watermark, so windows finalize) with a checkpoint.
  * The query is stopped cold after drop 1, a NEW query object resumes
  * from the same checkpoint for drops 2–3, and the accumulated sink must
  * equal the single-run reference — no lost windows, no double emission.
  */
class StreamRecoverySpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  /** Tumbling hourly counts with a watermark; append mode emits each
    * window exactly once, when the watermark passes it. */
  private def agg(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("ts", col("ts").cast("timestamp"))
    .withWatermark("ts", "2 hours")
    .groupBy(window(col("ts"), "1 hour"), col("event_type"))
    .agg(count(lit(1)).as("n"))
    .select(col("window.start").as("ws"), col("event_type"), col("n"))

  test("restart from checkpoint == uninterrupted run (exactly-once file sink)") {
    val events = graft.core.Graft.table(spark, sf, "events")
      .orderBy("ts", "event_id") // time-ordered landing, the normal case
    val root = Files.createTempDirectory("graft_recovery")
    val srcDir = root.resolve("src"); Files.createDirectories(srcDir)
    val ckpt = root.resolve("ckpt").toString
    val sink = root.resolve("sink").toString
    val staged = root.resolve("staged").toString

    // stage 3 time-ordered drops
    val n = events.count()
    val withIdx = events.withColumn("idx", monotonically_increasing_id())
    (0 until 3).foreach { i =>
      withIdx.filter(col("idx") % 3 === i).drop("idx")
        .coalesce(1).write.mode("overwrite").parquet(s"$staged/d$i")
    }
    def land(i: Int): Unit = {
      val part = new java.io.File(s"$staged/d$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, srcDir.resolve(s"drop_$i.parquet"))
    }

    def start() = agg(
        spark.readStream.schema(events.schema).parquet(srcDir.toString))
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // run 1: first drop only, then stop cold
    val q1 = start()
    try { land(0); q1.processAllAvailable() } finally q1.stop()

    // run 2: NEW query object resumes from the checkpoint
    val q2 = start()
    try {
      land(1); q2.processAllAvailable()
      land(2); q2.processAllAvailable()
    } finally q2.stop()

    // reference: the same pipeline in ONE uninterrupted run
    val refRoot = Files.createTempDirectory("graft_recovery_ref")
    val refSrc = refRoot.resolve("src"); Files.createDirectories(refSrc)
    val refSink = refRoot.resolve("sink").toString
    val qr = agg(spark.readStream.schema(events.schema).parquet(refSrc.toString))
      .writeStream.format("parquet")
      .option("path", refSink)
      .option("checkpointLocation", refRoot.resolve("ckpt").toString)
      .outputMode("append").start()
    try {
      (0 until 3).foreach { i =>
        // the run-1/2 drop files were moved; re-stage from the original table
        withIdx.filter(col("idx") % 3 === i).drop("idx")
          .coalesce(1).write.mode("overwrite").parquet(s"$staged/r$i")
        val p = new java.io.File(s"$staged/r$i").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.move(p.toPath, refSrc.resolve(s"drop_$i.parquet"))
        qr.processAllAvailable()
      }
    } finally qr.stop()

    val got = spark.read.parquet(sink).collect().map(_.toString).sorted.toSeq
    val ref = spark.read.parquet(refSink).collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty, "append-mode sink emitted nothing — watermark never advanced?")
    assert(got == ref,
      "restarted run diverged from the uninterrupted run (lost or duplicated windows)")
  }
}
