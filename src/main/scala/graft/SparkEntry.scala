package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented operator from SURVEY.md §2 is one entry in `queries`
  * (Spark implementation) and, where SQL-expressible, one entry in
  * `oracleSql` (equivalent DuckDB SQL the driver runs for the
  * hash-match correctness gate).
  */
object SparkEntry {

  /** All query groups; each file under graft/queries covers one SURVEY §2
    * capability area. */
  def groups: Seq[QueryGroup] =
    Seq(Relational, Windows, Advanced, Functions, Sources, SqlStore, Llm,
      Training, PipelineQueries, Streaming, Clustering, Bpe)

  private lazy val all: Seq[Q] = {
    val qs = groups.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_top_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
