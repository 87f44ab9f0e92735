package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence harness for the flagship cleaning pipeline: runs
  * q_llm_clean_pipeline[_staged] against ×1/×2/×5/×10 replications of the
  * sf0.1 documents corpus and prints one JSON line per (variant, factor)
  * with wall seconds and shuffle/spill bytes — turning the "100 TB shape"
  * plan-audit argument into measured scaling data (VERDICT r5 item 6).
  *
  * Replication is workload-preserving, not content-copying: copy k
  * letter-rotates the text (`translate` a..j → rotated), so token counts,
  * token lengths and space structure — everything the quality gate and
  * the per-stage row counts depend on — are IDENTICAL per copy, while
  * content hashes and shingle sets differ, so copies are neither exact
  * nor near duplicates of each other. Every stage's input therefore
  * scales exactly ×f and the dedup joins keep their organic density —
  * measured time growth is the engine's scaling, not an artifact of a
  * degenerate all-duplicates corpus.
  *
  * Usage: SPARK_GRAFT_SF_DIR=base sbt "runMain graft.ScaleBench [factors]"
  * (default factors 1,2,5,10; corpus copies are built once per factor
  * under /tmp/graft-scale and reused).
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factors = args.headOption.getOrElse("1,2,5,10")
      .split(",").map(_.trim.toInt).toSeq
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "2").toInt.max(1)
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
    // clustering scale lever: K ∝ N keeps expected cluster size constant
    // (see queries/Clustering.kOf) — set per replication factor by the
    // sweep driver
    sys.env.get("SPARK_GRAFT_KMEANS_K")
      .foreach(k => spark.conf.set("spark.graft.kmeans.k", k))
    // BPE scale lever: lift the 200-doc training cap so the pair-count
    // rounds run over the WHOLE replicated corpus
    sys.env.get("SPARK_GRAFT_BPE_DOCCAP")
      .foreach(c => spark.conf.set("spark.graft.bpe.doccap", c))

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

    /** ×f corpus: copy k shifts doc_id far past the base range and
      * letter-rotates the text. Built once, reused across runs. */
    def corpusDir(f: Int): String = {
      val out = s"${sys.props("java.io.tmpdir")}/graft-scale/x$f"
      val marker = new java.io.File(s"$out/documents.parquet/_SUCCESS")
      if (!marker.exists()) {
        val base = graft.core.Graft.table(spark, sfDir, "documents")
        val alpha = "abcdefghij"
        val copies = (0 until f).map { k =>
          val rot = alpha.drop(k % 10) + alpha.take(k % 10)
          base.select(
            (col("doc_id") + lit(k.toLong * 100000000L)).as("doc_id"),
            col("lang"), col("n_chars"),
            translate(col("text"), alpha, rot).as("text"))
        }
        copies.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$out/documents.parquet")
      }
      // embeddings twin (clustering/ANN variants): copy k rotates the 64
      // dimensions by k — a coordinate permutation, so every within-copy
      // distance/norm is EXACTLY preserved (identical per-copy workload)
      // while cross-copy vectors decorrelate (no degenerate exact-dup
      // corpus). vec_id shifts keep the k-means seeds (200-207) unique
      // to the base copy — K stays fixed while the corpus scales, which
      // is the pure assignment/update scaling measurement.
      val emarker = new java.io.File(s"$out/embeddings.parquet/_SUCCESS")
      if (!emarker.exists()) {
        val ebase = graft.core.Graft.table(spark, sfDir, "embeddings")
        val ecopies = (0 until f).map { k =>
          val r = k % 64
          val rotated =
            if (r == 0) col("embedding")
            else concat(slice(col("embedding"), r + 1, 64 - r),
              slice(col("embedding"), 1, r))
          ebase.select(
            (col("vec_id") + lit(k.toLong * 100000000L)).as("vec_id"),
            rotated.as("embedding"), col("label"))
        }
        ecopies.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      }
      out
    }

    // drop empty tokens (trailing comma, empty var) and fail fast on
    // unknown names instead of a bare NoSuchElementException mid-sweep
    val variants = sys.env.get("SPARK_GRAFT_SCALE_VARIANTS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .getOrElse(Seq("q_llm_clean_pipeline", "q_llm_clean_pipeline_staged",
        "q_dedup_minhash", "q_dedup_clusters"))
    val unknown = variants.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"SPARK_GRAFT_SCALE_VARIANTS names unknown queries: ${unknown.mkString(", ")}" +
        s" — registry has: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    // one untimed warmup for JIT/codegen
    SparkEntry.queries(variants.head)(spark, corpusDir(1))
      .write.format("noop").mode("overwrite").save()

    for (f <- factors; v <- variants) {
      val dir = corpusDir(f)
      val times = (1 to iters).map { _ =>
        shuffleRead.set(0); shuffleWrite.set(0); spilled.set(0)
        peakStageWrite.set(0)
        val t0 = System.nanoTime()
        SparkEntry.queries(v)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // listener bus is async; let metrics drain
        (secs, shuffleRead.get(), shuffleWrite.get(), spilled.get(),
          peakStageWrite.get())
      }
      val best = times.minBy(_._1)
      println(s"""{"variant":"$v","factor":$f,"sec":${best._1},""" +
        s""""shuffle_read_bytes":${best._2},"shuffle_write_bytes":${best._3},""" +
        s""""disk_spill_bytes":${best._4},"peak_stage_shuffle_write":${best._5},""" +
        s""""iters":$iters,"base":"$sfDir"}""")
      System.out.flush()
    }
    spark.stop()
  }
}
