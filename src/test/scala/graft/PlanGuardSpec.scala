package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide scale-anti-pattern guard: EVERY gated query's physical
  * plan must be free of the two operators that do not survive a 100×
  * scale-up — CartesianProduct (all-pairs shuffle) and
  * BroadcastNestedLoopJoin (per-row scan of the broadcast side) — unless
  * the query is on the explicit whitelist with a documented reason. A new
  * query that accidentally plans a nested loop (e.g. a join condition
  * Catalyst can't turn into an equi-join) fails here, not in production.
  */
class PlanGuardSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  /** Queries ALLOWED to contain an all-pairs operator, each with why —
    * in every case the broadcast side is CONSTANT-BOUNDED (a scalar, a
    * codebook, a dim), so the "nested loop" is per-row work over k
    * elements, not an n×m blowup. */
  private val whitelist: Map[String, String] = Map(
    // the operator under test IS the cross join; both sides bounded
    "q_join_cross" -> "deliberate cross-join demo, broadcast-bounded dims",
    // non-equi theta predicate; build side is a broadcast-bounded dim
    "q_join_theta" -> "deliberate theta join, broadcast-bounded small side",
    // two single-row aggregates joined into one output row
    "q_agg_sketch_incremental" -> "scalar x scalar result join",
    // the deliberate BRUTE-FORCE baseline the ANN variants are measured
    // against; the broadcast side is the single query vector
    "q_sim_topk" -> "brute-force baseline, single-query-vector broadcast",
    // dense arm = ONE query vector broadcast over a cosine projection
    // (the q_sim_topk discipline); at corpus scale it swaps to the
    // persisted-IVF probe unchanged since fusion consumes only ranks
    "q_search_hybrid_rrf" -> "single-query-vector broadcast, dense arm",
    // shortlist arm = the 2-row query-vector set broadcast (q_sim_topk
    // discipline); the MMR pair matrix itself is a query_id equi-join
    "q_search_mmr" -> "query-vector-set broadcast, shortlist arm",
    // IVF coarse assignment = argmin over the k-row centroid codebook
    "q_sim_ivf" -> "codebook argmin, broadcast k-row centroid table",
    // scalar subquery lowers to a one-row broadcast join by construction
    "q_subquery_scalar" -> "scalar subquery, one-row broadcast",
    // grid construction: one-row scalar bounds exploded into the hour
    // sequence × the distinct type dictionary — both sides constant-
    // bounded; the cross product IS the densified output grid
    "q_timeseries_fill" -> "generated grid, scalar-bounds × type dictionary",
    // the FK rule's two single-row counters joined into one summary row
    "q_dq_checks" -> "scalar × scalar counters join",
    // insert-key offset = max(o_orderkey)+1, a one-row aggregate
    // broadcast against the change batch (derived from the corpus so
    // fixed-constant offsets can't collide at sf>=2)
    "q_cdc_merge" -> "scalar insert-offset, one-row broadcast",
    // per-dimension scale vector (one row) + the 8-query-vector set, both
    // constant-bounded broadcasts over the brute-force scoring tier
    "q_vector_quantize" -> "scale-vector + query-set broadcasts, both bounded",
    // corpus-derived encoding multiplier and row count — one-row broadcast
    "q_window_ntile" -> "scalar (multiplier, count) one-row broadcast",
    // the single GLOBAL key is a literal, so Catalyst folds the salted
    // machinery's per-key bounds equi-join into a one-row broadcast —
    // the broadcast side is the global (min, max) bounds row
    "q_shuffle_global" -> "global min/max bounds, one-row broadcast",
    // the Q11 fence: the (total, part-count) pair aggregated over the
    // per-part rows, broadcast back as one row
    "q11_part_share" -> "scalar (total, count) fence, one-row broadcast",
    // r16 SaltedPrefix rewrites (r15 verdict item 2): the global revenue
    // total / part count is a one-row aggregate broadcast onto the part
    // table — the same scalar-consts shape as q_window_ntile; the salted
    // machinery's bounds/offsets joins themselves plan as equi joins
    "q_abc_classify" -> "scalar revenue total, one-row broadcast",
    "q_gini_concentration" -> "scalar part count, one-row broadcast",
    // the Q22 balance fence: (sum_fp, n) one-row aggregate broadcast
    "q22_dormant_customers" -> "scalar balance fence, one-row broadcast",
    // era split midpoint + (na, nb) era totals — both one-row broadcasts
    "q_drift_terms" -> "corpus midpoint + era totals, one-row broadcasts",
    // trailing-window joins run over the AGGREGATED per-day tables —
    // bounded by the calendar (days, not rows) at any corpus size
    "q_window_distinct_sketch" -> "day-range joins over calendar-bounded aggregates",
    // the two single-row match-count aggregates combined into one output
    // row (the <=> join itself plans as an equi SortMergeJoin)
    "q_join_nullsafe" -> "scalar x scalar result join",
    // the (N, L) corpus totals — one-row broadcast against the
    // label-sized share table
    "q_mix_deviation" -> "scalar (n, l) totals, one-row broadcast",
    // exhaustive IndexPQ (the deliberate ADC baseline, like q_sim_topk):
    // the broadcast side is the 8-query ADC lookup-table set (8 rows ×
    // M×K ints) — constant-bounded; the pruned production shape is
    // q_sim_ivfpq, whose candidate join is cid-equi
    "q_sim_pq_adc" -> "query ADC tables broadcast, query-set-bounded",
    // the K-row class-totals table crossed onto the token stream —
    // bounded by the label alphabet, never the data; the (class, word)
    // model join itself plans as an equi join
    "q_classify_nb" -> "class-totals cross, label-alphabet-bounded",
    "q_classify_nb_persisted" -> "class-totals cross, label-alphabet-bounded",
    "q_classify_nb_incremental" -> "class-totals cross, label-alphabet-bounded",
    "q_classify_nb_compacted" -> "class-totals cross, label-alphabet-bounded",
    "q_stream_classify_train" -> "class-totals cross, label-alphabet-bounded",
    // the 1-row (R, T, V) corpus-totals scalar crossed onto the
    // occurrence stream; both n-gram count joins are gram-equi
    "q_select_dsir" -> "scalar corpus totals, one-row broadcast",
    // the 1-row token-budget scalar crossed onto the ranked corpus
    "q_select_budget" -> "scalar budget, one-row broadcast")

  /** Whole-tree traversal: SparkPlan.collect does NOT descend into
    * AdaptiveSparkPlanExec (its current plan is a field, not a child) or
    * materialized query stages — unwrap both, plus subquery plans, or the
    * sweep is vacuous under AQE. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: (inner ++ p.subqueries).flatMap(flatten)
  }

  test("no registry query plans a cartesian product or nested-loop join") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    var sawWhitelisted = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df =
        try fn(spark, sf)
        catch {
          case e: Throwable =>
            fail(s"$name failed to build its plan at $sf: ${e.getMessage}")
        }
      val bad = flatten(df.queryExecution.executedPlan).collect {
        case c: CartesianProductExec => c.nodeName
        case b: BroadcastNestedLoopJoinExec => b.nodeName
      }
      if (bad.nonEmpty) {
        if (whitelist.contains(name)) sawWhitelisted += 1
        else offenders += s"$name: ${bad.distinct.mkString(", ")}"
      }
    }
    assert(offenders.isEmpty,
      "scale anti-patterns in un-whitelisted queries:\n" +
        offenders.mkString("\n"))
    // the sweep must actually SEE the deliberate all-pairs queries —
    // guards against this test going vacuous again
    assert(sawWhitelisted >= 2,
      s"traversal looks vacuous: only $sawWhitelisted whitelisted hits")
  }
}
