package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing's second dividend (q_source_bucketed_agg): a GROUP BY on
  * the bucket key must aggregate with NO exchange — the bucketed scan's
  * hash partitioning already satisfies the aggregation's distribution
  * requirement. At 100 TB the difference is aggregate-in-place vs
  * re-hash the whole fact table. */
class BucketedAggSpec extends AnyFunSuite with SparkSessionFixture {

  test("group-by on the bucket key plans without any exchange") {
    val dir = "/root/testdata/sf0.001"
    graft.queries.Sources.resetTable(spark, "orders_bkt_agg_t")
    graft.core.Graft.table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt_agg_t")
    val agg = spark.table("orders_bkt_agg_t")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed group-by must not shuffle, got:\n$plan")
    // same result as aggregating the plain parquet
    val plain = graft.core.Graft.table(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = agg.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == plain)
  }
}
