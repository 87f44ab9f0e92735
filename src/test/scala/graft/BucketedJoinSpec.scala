package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The whole point of bucketing is the plan shape: a join of two tables
  * bucketed on the join key must not shuffle either side. */
class BucketedJoinSpec extends AnyFunSuite with SparkSessionFixture {

  test("bucketed join plans without a shuffle on either join input") {
    val dir = "/root/testdata/sf0.001"
    graft.queries.Sources.resetTable(spark, "orders_bkt_t")
    graft.queries.Sources.resetTable(spark, "customer_bkt_t")
    graft.core.Graft.table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt_t")
    graft.core.Graft.table(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment")
      .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt_t")
    // force the big-big strategy — at test scale both sides fit the
    // broadcast threshold, which would sidestep bucketing entirely
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("orders_bkt_t")
      .join(spark.table("customer_bkt_t"), col("o_custkey") === col("c_custkey"))
    val plan =
      try joined.queryExecution.executedPlan.toString
      finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a co-located big-big join, got:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle its inputs, got:\n$plan")
    // and it returns the same rows as the plain parquet join
    val plain = graft.core.Graft.table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .join(graft.core.Graft.table(spark, dir, "customer")
        .select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .collect().map(_.toString).sorted
    assert(joined.collect().map(_.toString).sorted.toSeq == plain.toSeq)
  }
}
