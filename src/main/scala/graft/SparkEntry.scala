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
    require(floorGates.subsetOf(qs.map(_.name).toSet),
      "floorGates names a query not in the registry: " +
        (floorGates -- qs.map(_.name).toSet).mkString(","))
    qs
  }

  /** FLOOR-DOMINATED gates: queries whose wall time is a fixed floor —
    * live micro-batch triggers (drip-fed `_live`/`q_stream_*` gates pay
    * per-trigger scheduling, not data volume) or a persisted-store
    * round-trip (index build + commit + probe). Min-of-N steady-state
    * timing measures nothing on a fixed floor, so [[Bench]] times these
    * ONCE (after the shared untimed warmup pass — the steady floor, not
    * a one-off codegen/index-bootstrap bill) and caps their rebench at a
    * single run — that protocol cut the r14 sweep's wall clock by the
    * redundant second timed pass over ~130 s of floors (the r14 rc=124
    * postmortem). Membership is validated against the registry so a
    * renamed query cannot silently lose its tag. */
  val floorGates: Set[String] = Set(
    // live drip-fed streaming gates (per-trigger floor)
    "q_stream_ann_ingest", "q_stream_ann_probe", "q_stream_bm25_serve",
    "q_stream_classify", "q_stream_classify_train", "q_stream_ingest",
    "q_stream_ingest_neardup", "q_stream_ingest_neardup_phash",
    "q_stream_join_full_live", "q_stream_join_outer_live",
    "q_stream_kv_sink", "q_stream_live", "q_stream_live_append",
    "q_stream_session_timers_live", "q_stream_store_cdf",
    "q_stream_text_index_ingest",
    // persisted/durable/incremental/compacted store round-trip gates
    "q_classify_nb_compacted", "q_classify_nb_incremental",
    "q_classify_nb_persisted", "q_cluster_kmeans_durable",
    "q_dedup_clusters_durable", "q_graph_pagerank_durable",
    "q_search_hybrid_persisted", "q_sim_ivf_compacted",
    "q_sim_ivf_incremental", "q_sim_ivf_persisted", "q_sim_ivfpq_persisted",
    "q_sim_ivfpq_residual_persisted", "q_text_bm25_compacted",
    "q_text_bm25_incremental", "q_text_bm25_persisted")

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
