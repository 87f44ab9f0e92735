package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-aware implementations of the join shapes Spark has no single
  * built-in operator for (SURVEY §2.2 "Joins": range/interval, as-of).
  *
  * The naive formulations (theta-join → BroadcastNestedLoopJoin, or
  * per-row subqueries) are O(n²) and fall over at the 100 TB design
  * point. Both operators here compile to *equi*-joins / single-shuffle
  * window plans instead:
  *
  *  - range join: bucketize the time axis; a pair within `tolerance` can
  *    only differ by one bucket, so joining on (key, bucket) with the
  *    right side exploded to 3 adjacent buckets finds every pair exactly
  *    once (bucket delta is a single deterministic value — no dedup
  *    needed), then the precise predicate filters. Shuffle is on
  *    (key, bucket): parallel, skew handled by AQE.
  *  - as-of join: union both sides tagged, one window sort per key, carry
  *    the last match forward with last(_, ignoreNulls). One shuffle+sort,
  *    no join at all — the classic union-and-window as-of lowering.
  */
object AsOfRangeJoins {

  /** All pairs (a, b) with a.key == b.key, a.id < b.id and
    * |a.ts - b.ts| <= toleranceUs, via bucketed equi-join. */
  def rangeSelfJoinPairs(
      events: DataFrame,
      key: String, id: String, ts: String,
      toleranceUs: Long): DataFrame = {
    val us = unix_micros(col(ts).cast("timestamp"))
    val a = events.select(col(key).as("k"), col(id).as("a_id"), us.as("a_us"))
      .withColumn("bucket", (col("a_us") / toleranceUs).cast("long"))
    val b = events.select(col(key).as("k2"), col(id).as("b_id"), us.as("b_us"))
      .withColumn("b_bucket", (col("b_us") / toleranceUs).cast("long"))
      .withColumn("off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("bucket", col("b_bucket") + col("off"))
    a.join(b, col("k") === col("k2") && a("bucket") === b("bucket"))
      .filter(col("a_id") < col("b_id") &&
        abs(col("a_us") - col("b_us")) <= toleranceUs)
      .select(col("k").as(key), col("a_id"), col("b_id"),
        (col("b_us") - col("a_us")).as("delta_us"))
  }

  /** Keyless INTERVAL-OVERLAP join via grid bucketing: all pairs (a, b)
    * with a.lo <= b.hi and b.lo <= a.hi, where each side is a set of
    * closed integer intervals. Without an equi key the naive plan is a
    * BroadcastNestedLoopJoin over the full cross product; instead both
    * sides are exploded to the grid cells of width `gridW` their interval
    * covers and joined as an EQUI-join on the cell. A true overlap is
    * then found in every SHARED cell, so exactly one copy is kept by the
    * ownership rule: the cell containing greatest(a.lo, b.lo) — that
    * point lies inside both intervals whenever they overlap, and its
    * cell is a single deterministic value (no distinct needed).
    *
    * Scale shape: shuffle is on the grid cell — parallel across the
    * whole time axis; each interval replicates ceil(len/gridW)+1 times,
    * so pick gridW near the median interval length (replication ≤ 2-3×).
    * Dense cells (many intervals alive at once) are a genuine data
    * property; AQE skew splitting handles them like any hot equi-key.
    * Inputs must be pre-projected to (id, lo, hi) long columns; output
    * keeps both ids and both intervals. */
  def intervalOverlapPairs(
      a: DataFrame, b: DataFrame, gridW: Long): DataFrame = {
    require(gridW > 0, s"gridW must be positive, got $gridW")
    // Exact long floor-division: `div` truncates toward zero, so shift by
    // one when the remainder is negative (gridW > 0 ⇒ remainder sign ==
    // dividend sign). floor(x / g) as DOUBLE loses integer precision past
    // 2^53 — epoch-micros interval keys overflow that — silently merging
    // or splitting grid cells; this stays in long arithmetic end to end.
    def fdiv(e: String): Column =
      expr(s"(($e) div $gridW) - (CASE WHEN ($e) % $gridW < 0 THEN 1 ELSE 0 END)")
    def cells(df: DataFrame, id: String, lo: String, hi: String) =
      df.select(col(id), col(lo), col(hi),
        explode(sequence(fdiv(lo), fdiv(hi))).as("cell"))
    val ac = cells(a, "a_id", "a_lo", "a_hi")
    val bc = cells(b, "b_id", "b_lo", "b_hi").withColumnRenamed("cell", "b_cell")
    ac.join(bc, col("cell") === col("b_cell"))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi") &&
        col("cell") === fdiv("greatest(a_lo, b_lo)"))
      .select(col("a_id"), col("b_id"),
        col("a_lo"), col("a_hi"), col("b_lo"), col("b_hi"))
  }

  /** As-of join lowered to union+window: for each `probe`-typed row, the
    * most recent `build`-typed timestamp with build.ts <= probe.ts within
    * the same key. Ties at equal ts resolve build-before-probe
    * (inclusive as-of). */
  def asOfLastBefore(
      events: DataFrame,
      key: String, id: String, ts: String, typeCol: String,
      buildType: String, probeType: String): DataFrame = {
    val kind = when(col(typeCol) === buildType, 0).otherwise(1)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), kind, col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col(typeCol).isin(buildType, probeType))
      .withColumn("asof_ts",
        last(when(col(typeCol) === buildType, col(ts)), ignoreNulls = true).over(w))
      .filter(col(typeCol) === probeType)
      .select(col(key), col(id), col(ts), col("asof_ts"))
  }

  /** FORWARD as-of via union+window: the first `build`-typed timestamp
    * with build.ts >= probe.ts within the same key. The mirror of
    * [[asOfLastBefore]] — the window scans ts DESCENDING, so "last build
    * seen" is the smallest build ts at-or-after the probe (build sorts
    * before probe at equal ts → inclusive). */
  def asOfFirstAfter(
      events: DataFrame,
      key: String, id: String, ts: String, typeCol: String,
      buildType: String, probeType: String): DataFrame = {
    val kind = when(col(typeCol) === buildType, 0).otherwise(1)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, kind, col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col(typeCol).isin(buildType, probeType))
      .withColumn("asof_ts",
        last(when(col(typeCol) === buildType, col(ts)), ignoreNulls = true).over(w))
      .filter(col(typeCol) === probeType)
      .select(col(key), col(id), col(ts), col("asof_ts"))
  }

  /** NEAREST-within-tolerance as-of via union+window: both directional
    * candidates (one ascending and one descending window over the same
    * keyed union — two sorts, one shuffle), then the smaller |Δ| wins,
    * subject to |Δ| <= toleranceUs; ties resolve backward. */
  def asOfNearest(
      events: DataFrame,
      key: String, id: String, ts: String, typeCol: String,
      buildType: String, probeType: String,
      toleranceUs: Long): DataFrame = {
    val kind = when(col(typeCol) === buildType, 0).otherwise(1)
    val buildTs = when(col(typeCol) === buildType, col(ts))
    val wb = Window.partitionBy(col(key))
      .orderBy(col(ts), kind, col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, kind, col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = (c: Column) => unix_micros(c.cast("timestamp"))
    val withBoth = events
      .filter(col(typeCol).isin(buildType, probeType))
      .withColumn("back_ts", last(buildTs, ignoreNulls = true).over(wb))
      .withColumn("fwd_ts", last(buildTs, ignoreNulls = true).over(wf))
      .filter(col(typeCol) === probeType)
    val dBack = us(col(ts)) - us(col("back_ts"))
    val dFwd = us(col("fwd_ts")) - us(col(ts))
    val backWins = col("back_ts").isNotNull && dBack <= toleranceUs &&
      (col("fwd_ts").isNull || dFwd > toleranceUs || dBack <= dFwd)
    val fwdWins = col("fwd_ts").isNotNull && dFwd <= toleranceUs
    withBoth
      .withColumn("asof_ts",
        when(backWins, col("back_ts"))
          .when(fwdWins, col("fwd_ts"))
          .otherwise(lit(null).cast(withBoth.schema(ts).dataType)))
      .select(col(key), col(id), col(ts), col("asof_ts"))
  }
}
