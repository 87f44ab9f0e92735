package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the BUILD ONCE / SERVE MANY payoff of the persisted
  * artifacts (the number the probe/score path exists for): for each of
  * the text index and the model store, one JSON line comparing the
  * serve-only latency against the full build+serve cost, min-of-iters
  * after an untimed warmup. The ANN index's equivalent (probe-only
  * 0.93 s vs 4.42 s inline fit+probe at sf0.1) is recorded in SURVEY §2;
  * this makes the sibling claims reproducible the same way.
  *
  * Usage: SPARK_GRAFT_SF_DIR=dir sbt "runMain graft.ArtifactBench"
  */
object ArtifactBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = s"${sys.props("java.io.tmpdir")}/graft-artifact-bench"
    def wipe(p: String): Unit = {
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(p), true): Unit
    }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def minOf(body: => Unit): Double = (1 to iters).map(_ => time(body)).min

    val docs = graft.core.Graft.table(spark, sfDir, "documents")
      .select("doc_id", "lang", "text")
    val terms = Seq("hash", "join", "vector")

    // ---- text index ----------------------------------------------------
    val tiDir = s"$root/textindex"
    wipe(tiDir)
    // warmup (also leaves a committed index for the serve-only loop)
    graft.operators.TextIndex.build(docs, "doc_id", "text", tiDir)
    graft.operators.TextIndex.search(spark, tiDir, terms, 10).collect()
    val tiBuild = minOf {
      wipe(tiDir)
      graft.operators.TextIndex.build(docs, "doc_id", "text", tiDir)
      graft.operators.TextIndex.search(spark, tiDir, terms, 10).collect(): Unit
    }
    val tiServe = minOf {
      graft.operators.TextIndex.search(spark, tiDir, terms, 10).collect(): Unit
    }

    // ---- model store ---------------------------------------------------
    val msDir = s"$root/modelstore"
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val test = docs.filter(col("doc_id") % 5 === 0)
    wipe(msDir)
    graft.operators.ModelStore.train(train, "lang", "text", msDir)
    graft.operators.ModelStore.score(test, "doc_id", "text", msDir).collect()
    val msBuild = minOf {
      wipe(msDir)
      graft.operators.ModelStore.train(train, "lang", "text", msDir)
      graft.operators.ModelStore.score(test, "doc_id", "text", msDir)
        .collect(): Unit
    }
    val msServe = minOf {
      graft.operators.ModelStore.score(test, "doc_id", "text", msDir)
        .collect(): Unit
    }

    println(
      f"""{"metric":"artifact_serve_vs_build","iters":$iters,"sf":"$sfDir",""" +
      f""""textindex_build_search_sec":$tiBuild%.3f,""" +
      f""""textindex_search_only_sec":$tiServe%.3f,""" +
      f""""textindex_speedup":${tiBuild / tiServe}%.2f,""" +
      f""""modelstore_train_score_sec":$msBuild%.3f,""" +
      f""""modelstore_score_only_sec":$msServe%.3f,""" +
      f""""modelstore_speedup":${msBuild / msServe}%.2f}""")
    spark.stop()
  }
}
