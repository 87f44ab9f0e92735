package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoins

/** Salted-join equivalence and streaming watermark/late-data policy. */
class SkewAndWatermarkSpec extends AnyFunSuite with SparkSessionFixture {

  test("salted equi-join == plain join (orders ⋈ customer)") {
    val o = graft.core.Graft.table(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey")
    val c = graft.core.Graft.table(spark, "/root/testdata/sf0.001", "customer")
      .select("c_custkey", "c_mktsegment")
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .collect().map(_.toString).sorted
    val salted = SkewJoins.saltedEquiJoin(o, c, "o_custkey", "c_custkey", 8)
      .select("o_orderkey", "o_custkey", "c_custkey", "c_mktsegment")
      .collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("AQE splits a skewed join partition at runtime") {
    // One key owns ~90% of the left side — the shape where a static plan
    // puts the whole hot key in one task. With skew-join thresholds sized
    // for the test data, AQE's final plan must mark the sort-merge join
    // as skew-handled (the hot partition split into advisory-sized
    // sub-partitions), and the result must equal the plain join.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val left = s2.range(0, 300000).select(
      when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 1000).as("k"),
      col("id").as("v"))
    val right = s2.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
    val joined = left.join(right, "k")
    // collect() executes THIS DataFrame's QueryExecution, so the
    // AdaptiveSparkPlan below is the final (re-optimized) one; count()
    // would build and execute a different wrapped plan.
    val rows = joined.collect()
    // every left row matches exactly one right key ⇒ count is conserved
    assert(rows.length === 300000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("skew=true"),
      s"AQE did not mark the join skew-handled:\n$plan")
  }

  test("watermark: late rows are dropped, closed windows finalize in append mode") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hour: Int, minute: Int = 0): Timestamp =
      Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

    val mem = MemoryStream[(Timestamp, Long)]
    val counts = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .count()
      .select(col("window.start").as("ws"), col("count"))
    val q = counts.writeStream.format("memory")
      .queryName("t_watermark").outputMode("append").start()
    try {
      // batch 1: two rows in hour 0, one in hour 1 → nothing emitted yet
      mem.addData((ts(0, 10), 1L), (ts(0, 40), 2L), (ts(1, 15), 3L))
      q.processAllAvailable()
      // batch 2: hour 5 advances the watermark to 04:00 → windows 0 and 1
      // close; a LATE row for hour 0 (behind the 01:15-1h watermark after
      // batch 1? no — late relative to the new watermark) rides along
      mem.addData((ts(5, 0), 4L))
      q.processAllAvailable()
      // batch 3: a row for hour 0 is now far behind the 04:00 watermark —
      // it must be DROPPED, not revise the closed window
      mem.addData((ts(0, 55), 9L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_watermark")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).sorted.toSeq
    // hour-0 window counts 2 (late row dropped), hour-1 window counts 1;
    // hour-5 window is still open → absent in append mode
    assert(got == Seq(("2024-01-01 00:00:00.0", 2L), ("2024-01-01 01:00:00.0", 1L)))
  }
}
