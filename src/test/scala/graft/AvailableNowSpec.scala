package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Trigger.AvailableNow — the bounded backlog catch-up shape: a stream
  * that drains everything currently in the source in bounded batches
  * (`maxFilesPerTrigger`), then STOPS; a later restart from the same
  * checkpoint processes only files that arrived in between. This is how
  * a 100 TB corpus gets incrementally re-processed: each run is a finite
  * job (schedulable, retryable), offsets carry across runs, and no file
  * is ever read twice.
  */
class AvailableNowSpec extends AnyFunSuite with SparkSessionFixture {

  private val dir = "/root/testdata/sf0.001"

  test("AvailableNow drains the backlog in bounded batches; restart reads only new files") {
    val events = graft.core.Graft.table(spark, dir, "events")
    val schema = events.schema
    val root = Files.createTempDirectory("graft_availablenow")
    val src = root.resolve("src"); Files.createDirectories(src)
    val ckpt = root.resolve("ckpt").toString

    // backlog: 6 files of the first 600 events, then 2 late-arriving files
    val backlog = events.orderBy("event_id").limit(600).cache()
    val late = events.orderBy(col("event_id").desc).limit(200).cache()
    backlog.repartition(6).write.mode("overwrite")
      .parquet(root.resolve("stage_backlog").toString)
    late.repartition(2).write.mode("overwrite")
      .parquet(root.resolve("stage_late").toString)
    def land(stage: String): Unit =
      new java.io.File(root.resolve(stage).toString).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => Files.copy(f.toPath, src.resolve(s"${stage}_${f.getName}")))

    val batchSizes = new ConcurrentLinkedQueue[Long]()
    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(src.toString)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batchSizes.add(b.count()): Unit
        }
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "AvailableNow stream did not stop itself")
    }

    land("stage_backlog")
    drain()
    val run1 = batchSizes.asScala.toSeq
    assert(run1.sum == backlog.count(), s"run 1 must drain the whole backlog: $run1")
    assert(run1.size >= 3, s"6 files at maxFilesPerTrigger=2 must take >=3 bounded batches: $run1")

    batchSizes.clear()
    land("stage_late")
    drain()
    val run2 = batchSizes.asScala.toSeq
    assert(run2.sum == late.count(),
      s"restart must process ONLY the new files (no re-read of the backlog): $run2")
  }
}
