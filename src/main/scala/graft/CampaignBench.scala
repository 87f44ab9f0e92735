package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scale-campaign main: run a registry subset at an arbitrary sf
  * directory and print ONE JSON line per query with wall seconds,
  * shuffle read/write bytes, disk spill, and peak single-stage shuffle
  * write — ScaleBench's evidence listener generalized to any query list
  * (ScaleBench itself is the ×1..×10 replication harness for the
  * cleaning pipeline; this one measures a fixed corpus, e.g. the
  * key-shift-replicated sf10 fourth decade). Spill may legitimately be
  * non-zero at genuine memory pressure — the claim to defend there is
  * graceful degradation with unchanged results (the spot gates), not
  * zero spill.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=scaled/sf10 SPARK_GRAFT_ONLY=q_a,q_b \
  *     [SPARK_GRAFT_ITERS=1] sbt "runMain graft.CampaignBench"
  */
object CampaignBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "1").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
      .getOrElse(sys.error("SPARK_GRAFT_ONLY is required for a campaign"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleRead = new AtomicLong(0)
    val shuffleWrite = new AtomicLong(0)
    val spilled = new AtomicLong(0)
    val peakStageWrite = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          val w = m.shuffleWriteMetrics.bytesWritten
          shuffleWrite.addAndGet(w)
          spilled.addAndGet(m.diskBytesSpilled)
          peakStageWrite.getAndUpdate(p => math.max(p, w)): Unit
        }
      }
    })

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.contains(n) }
    selected.foreach { case (name, fn) =>
      // each iteration snapshots ITS OWN counters after a listener-settle
      // sleep, so the published record pairs the min wall time with the
      // metrics of the iteration that produced it (not the last one)
      val runs = (1 to iters).map { _ =>
        shuffleRead.set(0); shuffleWrite.set(0)
        spilled.set(0); peakStageWrite.set(0)
        val t0 = System.nanoTime()
        val wall = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[campaign] $name FAILED: ${e.getMessage}")
          -1.0
        }
        // listener events lag task completion; settle before reading
        // (listenerBus is private[spark] — a short sleep suffices here,
        // the numbers are coarse campaign evidence, not a tight gate)
        Thread.sleep(500)
        (wall, shuffleRead.get, shuffleWrite.get, spilled.get,
          peakStageWrite.get)
      }
      val (wall, sr, sw, sp, pk) = runs.minBy(_._1)
      println(f"""{"query":"$name","wall_sec":$wall%.2f,"shuffle_read":$sr,"shuffle_write":$sw,"spill":$sp,"peak_stage_write":$pk,"sf":"$sfDir","iters":$iters}""")
      System.out.flush()
    }
    spark.stop()
  }
}
