package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{AsOfJoin, AsOfJoinExec, AsOfJoinNode}

/** The native as-of join operator (plans/AsOfJoin): semantics against the
  * union+window lowering, left-outer and tie edge cases, and the custom
  * Rule/Strategy plan shape. */
class AsOfJoinPlanSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  // Graft.table handles both testdata ts encodings (legacy nanos-as-long
  // and native timestamp[us]) — never roll a loader by hand here.
  private def events = graft.core.Graft.table(spark, sf, "events")

  test("native as-of equals the union+window lowering on real events") {
    val oldR = graft.operators.AsOfRangeJoins
      .asOfLastBefore(events, "user_id", "event_id", "ts", "event_type",
        "signup", "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("asof_ts"))
      .orderBy("user_id", "event_id")
      .collect()
    val probe = events.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val build = events.filter(col("event_type") === "signup")
      .select("user_id", "ts", "event_id")
    val newR = AsOfJoin.lastBefore(probe, build, Seq("user_id"), "ts", "ts",
        Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("ts"), col("r_ts"))
      .orderBy("user_id", "event_id")
      .collect()
    assert(newR.length === oldR.length)
    assert(newR.toSeq === oldR.toSeq)
  }

  test("left-outer: probes with no build row keep nulls; ties go to last") {
    val s = spark
    import s.implicits._
    val probe = Seq(
      (1L, 10L, 100L), // before any build for key 1
      (1L, 11L, 200L), // after both ts=150 builds -> tiebreak picks id 7
      (2L, 12L, 500L), // key 2 has no builds at all
      (3L, 13L, 300L)  // exact-ts build matches (inclusive)
    ).toDF("k", "pid", "t")
    val build = Seq(
      (1L, 6L, 150L), (1L, 7L, 150L), // tie on t for key 1
      (3L, 8L, 300L)
    ).toDF("k", "bid", "t")
    val r = AsOfJoin.lastBefore(probe, build, Seq("k"), "t", "t", Seq("bid"))
      .select("k", "pid", "r_bid").orderBy("pid")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2)))
    assert(r.toSeq === Seq((1L, 10L, -1L), (1L, 11L, 7L), (2L, 12L, -1L),
      (3L, 13L, 8L)))
  }

  test("forward: native equals the union+window lowering on real events") {
    val oldR = graft.operators.AsOfRangeJoins
      .asOfFirstAfter(events, "user_id", "event_id", "ts", "event_type",
        "signup", "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("asof_ts"))
      .orderBy("user_id", "event_id")
      .collect()
    val probe = events.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val build = events.filter(col("event_type") === "signup")
      .select("user_id", "ts", "event_id")
    val newR = AsOfJoin.firstAfter(probe, build, Seq("user_id"), "ts", "ts",
        Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("ts"), col("r_ts"))
      .orderBy("user_id", "event_id")
      .collect()
    assert(newR.length === oldR.length)
    assert(newR.toSeq === oldR.toSeq)
  }

  test("nearest: native equals the union+window lowering on real events") {
    val tol = 86400000000L
    val oldR = graft.operators.AsOfRangeJoins
      .asOfNearest(events, "user_id", "event_id", "ts", "event_type",
        "signup", "purchase", tol)
      .select(col("user_id"), col("event_id"), col("ts"), col("asof_ts"))
      .orderBy("user_id", "event_id")
      .collect()
    val usCol = unix_micros(col("ts").cast("timestamp"))
    val probe = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), usCol.as("ts_us"))
    val build = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), usCol.as("ts_us"), col("event_id"))
    val newR = AsOfJoin.nearest(probe, build, Seq("user_id"), "ts_us", "ts_us",
        tol, Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("ts"), col("r_ts"))
      .orderBy("user_id", "event_id")
      .collect()
    assert(newR.length === oldR.length)
    assert(newR.toSeq === oldR.toSeq)
  }

  test("forward edges: exact-ts inclusive, first among later, nulls past end") {
    val s = spark
    import s.implicits._
    val probe = Seq(
      (1L, 10L, 100L), // builds at 150,150 ahead → first by tiebreak (6)
      (1L, 11L, 150L), // exact ts → inclusive match (6)
      (1L, 12L, 200L), // past all builds for key 1 → null
      (2L, 13L, 500L)  // key 2 has no builds → null
    ).toDF("k", "pid", "t")
    val build = Seq(
      (1L, 6L, 150L), (1L, 7L, 150L)
    ).toDF("k", "bid", "t")
    val r = AsOfJoin.firstAfter(probe, build, Seq("k"), "t", "t", Seq("bid"))
      .select("k", "pid", "r_bid").orderBy("pid")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2)))
    assert(r.toSeq === Seq((1L, 10L, 6L), (1L, 11L, 6L), (1L, 12L, -1L),
      (2L, 13L, -1L)))
  }

  test("nearest edges: direction pick, tie → backward, tolerance cut") {
    val s = spark
    import s.implicits._
    val probe = Seq(
      (1L, 10L, 100L), // back at 90 (Δ10) vs fwd at 150 (Δ50) → back (6)
      (1L, 11L, 120L), // back at 90 (Δ30) vs fwd at 150 (Δ30) tie → back (6)
      (1L, 12L, 148L), // back at 90 (Δ58) vs fwd at 150 (Δ2) → fwd (7)
      (1L, 13L, 300L), // nearest is 150 (Δ150) > tol 100 → null
      (2L, 14L, 500L)  // no builds → null
    ).toDF("k", "pid", "t")
    val build = Seq(
      (1L, 6L, 90L), (1L, 7L, 150L)
    ).toDF("k", "bid", "t")
    val r = AsOfJoin.nearest(probe, build, Seq("k"), "t", "t",
        toleranceUs = 100L, buildTiebreak = Seq("bid"))
      .select("k", "pid", "r_bid").orderBy("pid")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2)))
    assert(r.toSeq === Seq((1L, 10L, 6L), (1L, 11L, 6L), (1L, 12L, 7L),
      (1L, 13L, -1L), (2L, 14L, -1L)))
  }

  test("plan shape: AsOfJoinExec with one exchange per side") {
    val probe = events.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val build = events.filter(col("event_type") === "signup")
      .select("user_id", "ts", "event_id")
    val df = AsOfJoin.lastBefore(probe, build, Seq("user_id"), "ts", "ts",
      Seq("event_id"))
    df.collect() // finalize the adaptive plan
    // AQE's string carries both final and initial plans — judge the final
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 2,
      plan)
  }

  test("optimizer rule pushes probe-side filters below the join") {
    val probe = events.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val build = events.filter(col("event_type") === "signup")
      .select("user_id", "ts", "event_id")
    val df = AsOfJoin.lastBefore(probe, build, Seq("user_id"), "ts", "ts",
        Seq("event_id"))
      .filter(col("event_id") > 100L)
    val optimized = df.queryExecution.optimizedPlan
    // after pushdown no Filter may remain ABOVE the join node
    val topFilter = optimized.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.collectFirst { case j: AsOfJoinNode => j }.isDefined => f
    }
    assert(topFilter.isEmpty,
      s"probe-side predicate was not pushed:\n$optimized")
    assert(optimized.collectFirst { case j: AsOfJoinNode => j }.isDefined)
  }
}
