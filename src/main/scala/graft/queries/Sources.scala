package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Graft._

/** Source/sink formats beyond parquet (SURVEY §2.2 "Scans/sources/
  * sinks"; reference LocalFileStore, /root/reference/src/Core/Store.hs:68-83).
  * Each query round-trips a table through the format and re-aggregates, so
  * the oracle (reading the original parquet) proves the round-trip was
  * lossless.
  */
object Sources extends QueryGroup {

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val qSourceCsv = Q(
    "q_source_csv_roundtrip",
    (s, dir) => {
      val n = table(s, dir, "nation")
      val out = tmpDir("csv")
      n.write.mode("overwrite").option("header", "true").csv(out)
      s.read.schema(n.schema).option("header", "true").csv(out)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n_nations"),
          min(col("n_name")).as("first_nation"))
        .orderBy(col("n_regionkey"))
    },
    Some("""SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_nation
            FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  private val qSourceJson = Q(
    "q_source_json_roundtrip",
    (s, dir) => {
      val r = table(s, dir, "region")
      val out = tmpDir("json")
      r.write.mode("overwrite").json(out)
      s.read.schema(r.schema).json(out)
        .select(col("r_regionkey"), col("r_name"))
        .orderBy(col("r_regionkey"))
    },
    Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"))

  /** Partitioned-parquet sink + re-scan with partition pruning: writes
    * orders partitioned by status, reads back ONE partition — the scan
    * must touch only that directory (partition pruning at the source). */
  private val qSourcePartitioned = Q(
    "q_source_partitioned_parquet",
    (s, dir) => {
      val o = table(s, dir, "orders")
      val out = tmpDir("part_parquet")
      o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
      s.read.parquet(out)
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderpriority"))
    },
    Some(s"""SELECT o_orderpriority, count(*) AS n,
               ${moneySumSql("o_totalprice")} AS total
             FROM orders WHERE o_orderstatus = 'F'
             GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  override val queries: Seq[Q] = Seq(qSourceCsv, qSourceJson, qSourcePartitioned)
}
