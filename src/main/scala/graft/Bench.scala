package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every registry query against SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is executed with a noop-format write —
  * the same full materialization Verify pays (count() would let Catalyst
  * drop the top-level ORDER BY) — and failures are reported per-query
  * instead of being recorded as ordinary timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Static conf, default 100: the generated-class cache. At 105
      // queries x several codegen stages each, 100 entries evict
      // constantly, so iteration 2 re-generates and re-JITs classes that
      // iteration 1 already compiled — code-cache churn that made two
      // late-running queries publish ~3x their isolated times in r4.
      // Size it to hold the whole suite's generated classes.
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state throughput: each query runs `iters` times, min is
    // reported — first runs pay per-query codegen/JIT compilation that a
    // long-running engine amortizes away.
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "2").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    var failed = List.empty[String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Untimed warmup: one full sweep of the selected registry. A partial
    // (3-query) warmup left first-iteration JIT/codegen cost landing on
    // whichever queries ran early — r4/r5 both published ~2-6x-inflated
    // times for a shifting handful of early-alphabet queries. Sweeping
    // everything once means the timed min below is steady-state for every
    // query, at the cost of one extra (untimed) pass.
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = selected.map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
      }
      if (times.contains(-1.0)) failed ::= name
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Full detail line first (may exceed a tail-capture window at 88+
    // queries — r01/r02 both came back parsed:null from head truncation),
    // then a compact summary as the LAST stdout line so any tail window
    // still contains one complete parseable JSON object. The compact line
    // keeps a small "queries" map (the slowest 8) so it matches the
    // driver's expected shape while staying a few hundred bytes.
    println(s"""{"metric":"total_detail","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"iters":$iters,"sf":"$sfDir"}""")
    System.out.flush()
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(8)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // "queries" here is TRUNCATED to the slowest 8 (the full map is on the
    // "total_detail" line above); "queries_truncated" flags that so a
    // consumer iterating the map as a full per-query breakdown can detect
    // the truncation instead of silently under-reporting.
    val truncated = results.count(_._2 >= 0) > 8
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$slowest,"queries_truncated":$truncated,"n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"iters":$iters,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
