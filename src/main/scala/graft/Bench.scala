package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every registry query against SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is executed with a noop-format write —
  * the same full materialization Verify pays (count() would let Catalyst
  * drop the top-level ORDER BY) — and failures are reported per-query
  * instead of being recorded as ordinary timings.
  *
  * Contended-machine self-defense (r6 postmortem: a co-scheduled driver
  * JVM inflated five published times 4-7× vs isolated reruns, and min-of-2
  * didn't help because BOTH iterations were contended):
  *  - every iteration time is kept, per-query dispersion (max/min ratio)
  *    is published on the detail line ("spread");
  *  - queries whose spread exceeds 1.5× get ONE extra timed run after the
  *    whole sweep finishes (by then a transient co-scheduled job has
  *    often drained) and the min over all observations is published;
  *  - queries still above 1.5× spread after the retry are listed in
  *    "contended" on both output lines — the record says which numbers
  *    not to trust rather than silently misreporting them;
  *  - /proc/loadavg is sampled before and after the sweep and published
  *    ("loadavg_start"/"loadavg_end" vs "cpus"): a load average well
  *    above the core count is machine-level evidence of co-scheduling.
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
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    def loadavg: Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+").head.toDouble
      catch { case _: Throwable => -1.0 }

    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        -1.0
      }
    }

    // Untimed warmup: one full sweep of the selected registry. A partial
    // (3-query) warmup left first-iteration JIT/codegen cost landing on
    // whichever queries ran early — r4/r5 both published ~2-6x-inflated
    // times for a shifting handful of early-alphabet queries. Sweeping
    // everything once means the timed min below is steady-state for every
    // query, at the cost of one extra (untimed) pass.
    selected.foreach { case (name, fn) => timeOne(name, fn): Unit }

    val loadStart = loadavg
    val firstPass = selected.map { case (name, fn) =>
      (name, fn, (1 to iters).map(_ => timeOne(name, fn)))
    }
    val loadEnd = loadavg

    val spreadLimit = 1.5
    // ...with an absolute floor: a 0.05s wobble on a 0.1s query is
    // scheduler jitter, not contention, and doesn't distort the record.
    val deltaFloor = 0.2
    def dispersed(ts: Seq[Double]): Boolean =
      ts.max / ts.min > spreadLimit && ts.max - ts.min > deltaFloor
    // Post-sweep retry for dispersed queries: one extra run each, taken
    // AFTER the sweep so a transient contender has had time to finish.
    val results = firstPass.map { case (name, fn, times0) =>
      val ok0 = times0.filter(_ >= 0)
      if (ok0.size < times0.size) (name, -1.0, -1.0, false)
      else {
        val retried =
          if (iters > 1 && dispersed(ok0)) ok0 :+ timeOne(name, fn) else ok0
        val ok = retried.filter(_ >= 0)
        val spread = if (ok.min > 0) ok.max / ok.min else 1.0
        (name, ok.min, spread, iters > 1 && dispersed(ok))
      }
    }
    val failed = results.collect { case (n, v, _, _) if v < 0 => n }.sorted
    val contended = results.collect { case (n, _, _, true) => n }.sorted

    def jmap(kv: Seq[(String, String)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (n, v, _, _) => n -> v.toString })
    val spreads = jmap(results.collect { case (n, _, s, _) if s >= 0 =>
      n -> f"$s%.2f" })
    val total = results.collect { case (_, v, _, _) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val contendedJson = contended.map("\"" + _ + "\"").mkString("[", ",", "]")
    val envJson = f""""loadavg_start":$loadStart%.2f,"loadavg_end":$loadEnd%.2f,"cpus":$cpus"""
    // Full detail line first (may exceed a tail-capture window at 88+
    // queries — r01/r02 both came back parsed:null from head truncation),
    // then a compact summary as the LAST stdout line so any tail window
    // still contains one complete parseable JSON object. The compact line
    // keeps a small "queries" map (the slowest 8) so it matches the
    // driver's expected shape while staying a few hundred bytes.
    println(s"""{"metric":"total_detail","value":$total,"unit":"sec","queries":$qs,"spread":$spreads,"contended":$contendedJson,"failed":$failedJson,"iters":$iters,$envJson,"sf":"$sfDir"}""")
    System.out.flush()
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(8)
      .map { case (k, v, _, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // "queries" here is TRUNCATED to the slowest 8 (the full map is on the
    // "total_detail" line above); "queries_truncated" flags that so a
    // consumer iterating the map as a full per-query breakdown can detect
    // the truncation instead of silently under-reporting.
    val truncated = results.count(_._2 >= 0) > 8
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$slowest,"queries_truncated":$truncated,"n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"n_contended":${contended.size},"contended":$contendedJson,"iters":$iters,$envJson,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
