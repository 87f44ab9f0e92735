package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer statistics evidence: ANALYZE TABLE feeds the
  * catalog, and the optimizer actually CONSUMES the result — row counts
  * appear in the optimized plan's statistics and filter estimation
  * shrinks them with column stats. (A broadcast-flip assertion is NOT
  * reliable here: datasource tables always know their file sizes, so
  * size-based decisions don't need the catalog — row-count and
  * selectivity estimation are what ANALYZE adds.) */
class CboSpec extends AnyFunSuite with SparkSessionFixture {

  test("ANALYZE TABLE row counts reach the optimizer; column stats drive selectivity") {
    val dir = "/root/testdata/sf0.001"
    graft.queries.Sources.resetTable(spark, "cbo_cust")
    graft.core.Graft.table(spark, dir, "customer")
      .select("c_custkey", "c_nationkey")
      .write.mode("overwrite").saveAsTable("cbo_cust")
    val actual = spark.table("cbo_cust").count()

    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def planRowCount(): Option[BigInt] =
        spark.table("cbo_cust").queryExecution.optimizedPlan.stats.rowCount
      assert(planRowCount().isEmpty,
        "before ANALYZE the optimizer must have no exact row count")

      spark.sql("ANALYZE TABLE cbo_cust COMPUTE STATISTICS")
      assert(planRowCount().contains(BigInt(actual)),
        s"after ANALYZE the optimized plan must carry rowCount=$actual, " +
          s"got ${planRowCount()}")

      // column stats: an equality filter's estimated row count shrinks
      // from "unknown selectivity" to ~n/ndv
      spark.sql("ANALYZE TABLE cbo_cust COMPUTE STATISTICS FOR COLUMNS c_nationkey")
      val filtered = spark.table("cbo_cust")
        .filter(col("c_nationkey") === 0)
        .queryExecution.optimizedPlan.stats.rowCount
      assert(filtered.isDefined && filtered.get < BigInt(actual) / 5,
        s"column stats must shrink the filter estimate well below the " +
          s"table size $actual, got $filtered")
      val exact = spark.table("cbo_cust").filter(col("c_nationkey") === 0).count()
      assert(filtered.get >= BigInt(1) && exact > 0,
        "estimate and reality must both be non-trivial")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }
}
