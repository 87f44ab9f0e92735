package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Graft._

/** Window functions + grouping sets (SURVEY §2.2 "Window functions",
  * "Aggregations" cube/rollup). Not present in the reference (no named
  * operator — composition-only, /root/reference/src/Core/MapReduceC.hs:24-44);
  * expressed directly as Spark window specs so the planner gets a single
  * shuffle per partitioning key.
  */
object Windows extends QueryGroup {

  /** Top-3 orders per market segment — two-phase bounded top-k via the
    * TopKByValueDesc Aggregator: partial per-partition top-3 buffers merge
    * at the final aggregation, so parallelism is the input partition
    * count, not the 5 distinct segments a
    * `row_number() OVER (PARTITION BY c_mktsegment)` window would funnel
    * everything into. O(k) state per group regardless of group size. */
  private val qWindowTopk = Q(
    "q_window_topk",
    (s, dir) => {
      val c = table(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val o = table(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
      val top3 = udaf(graft.operators.TypedAggregates.TopKByValueDesc(3),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble))
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(top3(col("o_orderkey"), col("o_totalprice")).as("tops"))
        .select(col("c_mktsegment"), posexplode(col("tops")).as(Seq("pos", "kv")))
        .select(col("c_mktsegment"), (col("pos") + 1).cast("int").as("rk"),
          col("kv._1").as("o_orderkey"), col("kv._2").as("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rk"))
    },
    Some("""SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
              SELECT c_mktsegment, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY c_mktsegment
                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders JOIN customer ON o_custkey = c_custkey) t
            WHERE rk <= 3 ORDER BY c_mktsegment, rk"""))

  /** Running total per customer (rows frame). */
  private val qWindowRunning = Q(
    "q_window_running",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "orders")
        .withColumn("running_spent", sum(fixed4(col("o_totalprice"))).over(w) / lit(10000.0))
        .withColumn("order_seq", row_number().over(
          Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))))
        .select(col("o_custkey"), col("order_seq"), col("o_orderkey"), col("running_spent"))
        .orderBy(col("o_custkey"), col("order_seq"))
    },
    Some(s"""SELECT o_custkey, row_number() OVER w AS order_seq, o_orderkey,
               sum(${fixed4Sql("o_totalprice")})
                 OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 10000.0
                 AS running_spent
             FROM orders
             WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             ORDER BY o_custkey, order_seq"""))

  /** lead/lag analytics over the event stream. */
  private val qWindowLeadLag = Q(
    "q_window_leadlag",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("delta", col("value") - coalesce(col("prev_value"), lit(0.0)))
        .select(col("user_id"), col("event_id"), col("value"), col("prev_value"),
          col("next_type"), col("delta"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id, value,
              lag(value, 1) OVER w AS prev_value,
              lead(event_type, 1) OVER w AS next_type,
              value - coalesce(lag(value, 1) OVER w, 0.0) AS delta
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id, event_id"""))

  /** Global rank / dense_rank / ntile — the SCALABLE formulation, as
    * order statistics over the distinct-value COUNT MAP (the same idiom
    * as countMapPercentiles in Functions.scala). A bare
    * `Window.orderBy(...)` (no partitionBy) plans as a single-partition
    * WindowExec: every row moves to one task — fine at 1,500 customers, a
    * scale-killer at 100×. Instead:
    *
    *   1. groupBy(value) count — map-side combined, O(distinct) rows out;
    *   2. ONE global window over the distinct-value table computes, per
    *      value, the count of strictly-greater rows `lo` (running sum)
    *      and the value's position (row_number). Then for every row of
    *      that value, rank = lo + 1 and dense_rank = position — exactly,
    *      no interpolation. This is the only sequential step and it runs
    *      over the value DOMAIN (cents-quantized balances, ~1.1M at full
    *      TPC-H), never the row count;
    *   3. join the O(distinct) rank table back on the value (the big side
    *      shuffles once) and break ties for row_number/ntile with a
    *      per-VALUE window — parallelism = #distinct values, and the join
    *      output is already hash-partitioned by value so no extra shuffle.
    *      ASSUMPTION: value skew is bounded — all rows sharing one value
    *      land in one tie-break task, so a domain where a single value
    *      covers a large row fraction (e.g. a 90%-NULL or default-zero
    *      column) re-creates a hot task. c_acctbal is near-uniform over
    *      ~1.1M cents values, so rows-per-value stays O(n/1.1M); for a
    *      skewed domain the tie-break window would need a salted two-phase
    *      row_number — demonstrated end-to-end by [[qWindowRownumSalted]]
    *      on the 3-value o_orderstatus domain (rank/dense_rank above are
    *      skew-immune already — they come from the count map, not a
    *      per-value scan).
    *
    * Unlike range-partitioner bucketing (the previous design), nothing
    * here samples: a RangePartitioner consumed by two plan branches draws
    * independent boundary samples unless the exchange is reused, and
    * column pruning CAN defeat that reuse — bucket ids then disagree
    * between branches and the offsets silently corrupt. Every step above
    * is a pure function of the data. */
  private val qWindowRank = Q(
    "q_window_rank",
    (s, dir) => {
      val base = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
      val wDesc = Window.orderBy(col("v").desc)
      val wAll = Window.partitionBy()
      val dv = base.groupBy(col("c_acctbal").as("v"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("hi", sum("cnt").over(wDesc))
        .withColumn("lo", col("hi") - col("cnt"))
        .withColumn("dpos", row_number().over(wDesc))
        .withColumn("n_total", sum("cnt").over(wAll))
        .select(col("v"), col("lo"), col("dpos"), col("n_total"))
      val wTie = Window.partitionBy(col("c_acctbal")).orderBy(col("c_custkey"))
      val joined = base
        .join(dv, col("c_acctbal") === col("v"))
        .withColumn("rnk", col("lo") + 1)
        .withColumn("drnk", col("dpos").cast("long"))
        .withColumn("rn", col("lo") + row_number().over(wTie))
      // ntile(4) from the global row number: first (n mod 4) tiles get
      // ceil(n/4) rows — the SQL-standard split, in exact integer math
      // (doubles are exact below 2^53).
      val b4 = floor(col("n_total") / 4.0).cast("long")
      val rem = col("n_total") % 4
      joined
        .withColumn("quartile",
          when(col("rn") <= (b4 + 1) * rem,
            floor((col("rn") - 1) / (b4 + 1)).cast("long") + 1)
            .otherwise(rem + floor((col("rn") - rem * (b4 + 1) - 1) / b4).cast("long") + 1)
            .cast("int"))
        .select(col("c_custkey"), col("c_acctbal"),
          col("rnk").cast("int").as("rnk"), col("drnk").cast("int").as("drnk"),
          col("quartile"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_acctbal,
              CAST(rank() OVER v AS INTEGER) AS rnk,
              CAST(dense_rank() OVER v AS INTEGER) AS drnk,
              CAST(ntile(4) OVER w AS INTEGER) AS quartile
            FROM customer
            WINDOW v AS (ORDER BY c_acctbal DESC),
                   w AS (ORDER BY c_acctbal DESC, c_custkey)
            ORDER BY c_custkey"""))

  /** Range frame: per-customer spend in the 30 days before each order
    * (orderBy on epoch seconds so the frame is numeric on both engines). */
  private val qWindowRangeFrame = Q(
    "q_window_range_frame",
    (s, dir) => {
      val epochS = unix_timestamp(col("o_orderdate").cast("timestamp"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(epochS)
        .rangeBetween(-2592000L, 0L)
      table(s, dir, "orders")
        .withColumn("spent_30d", sum(fixed4(col("o_totalprice"))).over(w) / lit(10000.0))
        .select(col("o_custkey"), col("o_orderkey"), col("spent_30d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some(s"""SELECT o_custkey, o_orderkey,
               sum(${fixed4Sql("o_totalprice")}) OVER (
                 PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) / 10000.0
                 AS spent_30d
             FROM orders ORDER BY o_custkey, o_orderkey"""))

  /** ROLLUP with grouping_id. */
  private val qAggRollup = Q(
    "q_agg_rollup",
    (s, dir) => table(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
              count(*) AS n, GROUPING(l_returnflag, l_linestatus) AS gid
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY gid, l_returnflag, l_linestatus"""))

  /** CUBE with grouping_id. */
  private val qAggCube = Q(
    "q_agg_cube",
    (s, dir) => table(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority")),
    Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               ${moneySumSql("o_totalprice")} AS total,
               GROUPING(o_orderstatus, o_orderpriority) AS gid
             FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             ORDER BY gid, o_orderstatus, o_orderpriority"""))

  /** Arbitrary GROUPING SETS (not just the rollup/cube prefixes): by
    * (status, priority), by priority alone, and the grand total — via the
    * SQL surface, the one place Spark exposes explicit sets. */
  private val qAggGroupingSets = Q(
    "q_agg_grouping_sets",
    (s, dir) => {
      table(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                  grouping_id() AS gid
                FROM orders_gs
                GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                        (o_orderpriority), ())
                ORDER BY gid, o_orderstatus, o_orderpriority""")
    },
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
              GROUPING(o_orderstatus, o_orderpriority) AS gid
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                    (o_orderpriority), ())
            ORDER BY gid, o_orderstatus, o_orderpriority"""))

  /** Analytic window functions beyond the rank family: percent_rank,
    * cume_dist, nth_value, first/last over a per-nation balance ordering.
    * Both engines define them identically on ROWS frames; the window is
    * keyed by nation (high-cardinality at scale, never single-partition). */
  private val qWindowAnalytics = Q(
    "q_window_analytics",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val wFull = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      table(s, dir, "customer")
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("third_bal", nth_value(col("c_acctbal"), 3).over(wFull))
        .withColumn("top_bal", last(col("c_acctbal")).over(wFull))
        .select("c_nationkey", "c_custkey", "c_acctbal", "pr", "cd",
          "third_bal", "top_bal")
        .orderBy("c_nationkey", "c_custkey")
    },
    Some("""SELECT c_nationkey, c_custkey, c_acctbal,
              percent_rank() OVER w AS pr,
              cume_dist() OVER w AS cd,
              nth_value(c_acctbal, 3) OVER wf AS third_bal,
              last_value(c_acctbal) OVER wf AS top_bal
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey
                         ORDER BY c_acctbal, c_custkey),
                   wf AS (PARTITION BY c_nationkey
                          ORDER BY c_acctbal, c_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING)
            ORDER BY c_nationkey, c_custkey"""))

  /** UNPIVOT (wide → long): per-order money columns melted to
    * (measure, value) rows — `Dataset.unpivot`, DuckDB's UNPIVOT. */
  private val qAggUnpivot = Q(
    "q_agg_unpivot",
    (s, dir) => table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        (fixed4(col("o_totalprice")) / lit(10000.0)).as("o_quantized"))
      .unpivot(
        ids = Array(col("o_orderkey")),
        values = Array(col("o_totalprice"), col("o_quantized")),
        variableColumnName = "measure",
        valueColumnName = "amount")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), moneySum(col("amount")).as("total"))
      .orderBy(col("measure")),
    Some(s"""SELECT measure, count(*) AS n, ${moneySumSql("amount")} AS total
             FROM (
               SELECT o_orderkey, amount, measure FROM (
                 SELECT o_orderkey, o_totalprice,
                   ${fixed4Sql("o_totalprice")} / 10000.0 AS o_quantized
                 FROM orders)
               UNPIVOT (amount FOR measure IN (o_totalprice, o_quantized)))
             GROUP BY measure ORDER BY measure"""))

  /** Salted two-phase row_number over a HEAVILY SKEWED partition key —
    * o_orderstatus has 3 values (one covering roughly half the table), so
    * a plain `row_number() OVER (PARTITION BY status ORDER BY key)` puts
    * each value's entire row set into ONE task at any scale: exactly the
    * value-skew residual [[qWindowRank]]'s tie-break documents. The
    * salted plan removes it deterministically with the range-salt
    * stitching of [[graft.operators.SaltedPrefix]] (shared with
    * q_pack_sequences): order-preserving buckets from broadcast per-value
    * [min, max] bounds, per-bucket numbering in parallel, bucket-count
    * offsets lifted back — parallelism = values × buckets, no sampling.
    *
    * Gated against DuckDB's plain single-window row_number. Uniform keys
    * give balanced buckets; a skewed KEY range inside one value would
    * need quantile-derived bucket bounds instead (same stitching). */
  private val qWindowRownumSalted = Q(
    "q_window_rownum_salted",
    (s, dir) => {
      val o = table(s, dir, "orders").select("o_orderkey", "o_orderstatus")
      // row_number = exclusive prefix COUNT + 1, so the shared salted
      // prefix-sum (operators/SaltedPrefix) with value 1 is the whole op
      graft.operators.SaltedPrefix
        .exclusivePrefixSum(o, "o_orderstatus", "o_orderkey", lit(1L))
        .withColumn("rn", col("start_off") + 1)
        .select("o_orderkey", "o_orderstatus", "rn")
        .orderBy("o_orderstatus", "rn")
    },
    Some("""SELECT o_orderkey, o_orderstatus,
              row_number() OVER (PARTITION BY o_orderstatus
                ORDER BY o_orderkey) AS rn
            FROM orders ORDER BY o_orderstatus, rn"""))

  /** Salted row_number over a SKEWED order domain — the quantile-bounds
    * variant (operators/SaltedPrefix.exclusivePrefixSumQuantile). The
    * skewed order is QUADRATIC in the id's high bits:
    * sk_ord = (uid div 2²⁰)² · 2²⁰ + (uid mod 2²⁰) — strictly monotone
    * in uid (the quotient-square term jumps by ≥ 2²⁰ per quotient step,
    * dominating the remainder), hence unique, and for a ~uniform id
    * half the values land in the lowest quarter of the range, so the
    * linear min/max salt would pile ~2× the rows into its first
    * buckets; equi-depth bounds from the deterministic hash-sample keep
    * buckets ~uniform (balance asserted in WindowRankScaleSpec).
    * Squaring only the quotient keeps the value in long range at ANY
    * key scale (a plain uid² overflows once ids pass ~3·10⁹ — hit at
    * the sf1 key-shifted sweep). Same single-window oracle contract as
    * q_window_rownum_salted: bucket quality must never change the
    * numbering. */
  private val qWindowRownumQsalted = Q(
    "q_window_rownum_qsalted",
    (s, dir) => {
      val l = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        // l_linenumber ∈ 1..7 ⇒ uid unique
        .withColumn("uid", col("l_orderkey") * 8 + col("l_linenumber"))
        .withColumn("__q", expr("uid div 1048576"))
        .withColumn("sk_ord",
          col("__q") * col("__q") * lit(1048576L) + pmod(col("uid"), lit(1048576L)))
        .drop("__q")
      graft.operators.SaltedPrefix
        .exclusivePrefixSumQuantile(l, "l_returnflag", "sk_ord", lit(1L))
        .withColumn("rn", col("start_off") + 1)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "rn")
        .orderBy("l_returnflag", "rn")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_returnflag,
              row_number() OVER (PARTITION BY l_returnflag
                ORDER BY ((l_orderkey * 8 + l_linenumber) // 1048576)
                         * ((l_orderkey * 8 + l_linenumber) // 1048576)
                         * 1048576
                         + (l_orderkey * 8 + l_linenumber) % 1048576) AS rn
            FROM lineitem ORDER BY l_returnflag, rn"""))

  /** SCD-type-2 interval construction (the warehouse/CDC "event stream →
    * validity intervals" pass): each per-user event becomes a row valid
    * [ts, next event's ts); the user's latest event stays open
    * (valid_to NULL, is_current). lead() over the per-user window — one
    * hash shuffle on user_id, per-key state is a single row, so the plan
    * scales with user count, not history depth per scan. (event_id breaks
    * ts ties so the intervals are deterministic.) */
  private val qScd2Intervals = Q(
    "q_scd2_intervals",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "valid_from", "event_id")
    },
    Some("""SELECT user_id, event_id, event_type,
              CAST(ts AS TIMESTAMP) AS valid_from,
              CAST(lead(ts, 1) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS TIMESTAMP) AS valid_to,
              (lead(ts, 1) OVER (PARTITION BY user_id
                ORDER BY ts, event_id)) IS NULL AS is_current
            FROM events ORDER BY user_id, valid_from, event_id"""))

  /** Gaps-and-islands session assignment core (see [[qSessionize]] for
    * the plan-shape discussion): events (user_id, event_id, ts, value) →
    * per-session aggregates. Public so the ScalaCheck differential can
    * drive it with random event streams against a collections oracle. */
  def sessionAssign(events: org.apache.spark.sql.DataFrame,
      gapSec: Long): org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > gapSec * 1000000L)
          .cast("long"))
      .withColumn("session_idx",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(fixed4(col("value"))).as("value_units"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("session_start"), col("session_end"),
        (col("value_units") / 10000.0).as("session_value"))
  }

  /** Batch sessionization (gaps-and-islands) — the batch twin of the
    * streaming session window (q_stream_session): a session boundary
    * opens wherever the per-user gap exceeds 30 minutes; the session id
    * is the running count of boundaries. Two window passes over ONE
    * partitioning (lag then running sum both hash on user_id — Catalyst
    * reuses the single shuffle+sort), then an ordinary hash aggregation
    * per (user, session). Per-key window state is O(1); scales with
    * users, not history. */
  private val qSessionize = Q(
    "q_sessionize",
    (s, dir) => sessionAssign(table(s, dir, "events"), 1800L)
      .orderBy("user_id", "session_idx"),
    Some("""WITH g AS (
              SELECT user_id, event_id, ts, value,
                lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events),
            m AS (
              SELECT user_id, event_id, ts, value,
                CAST(prev_ts IS NULL
                     OR epoch_us(CAST(ts AS TIMESTAMP)) -
                        epoch_us(CAST(prev_ts AS TIMESTAMP)) > 1800000000 AS BIGINT)
                  AS new_session
              FROM g),
            x AS (
              SELECT user_id, ts, value,
                CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS session_idx
              FROM m)
            SELECT user_id, session_idx, count(*) AS n_events,
              CAST(min(ts) AS TIMESTAMP) AS session_start,
              CAST(max(ts) AS TIMESTAMP) AS session_end,
              CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0
                AS session_value
            FROM x GROUP BY user_id, session_idx
            ORDER BY user_id, session_idx"""))

  /** Time-series gap filling (sparse → dense resampling): the hourly
    * per-type grid over the corpus' full time range, absent hours
    * materialized with zero counts. The grid is GENERATED, not scanned —
    * one scalar min/max aggregate broadcast into a sequence explode ×
    * the distinct type dictionary — then left-joined to the hourly
    * aggregation. Grid size is (hours × types), independent of row
    * count, so the join's build side stays small at any corpus scale. */
  private val qTimeseriesFill = Q(
    "q_timeseries_fill",
    (s, dir) => {
      val e = table(s, dir, "events")
      val hourly = e
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(fixed4(col("value"))).as("vu"))
      val bounds = e.agg(
        date_trunc("hour", min(col("ts"))).as("mn"),
        date_trunc("hour", max(col("ts"))).as("mx"))
      val grid = bounds
        .select(explode(expr("sequence(mn, mx, interval 1 hour)")).as("h"))
        .crossJoin(e.select(col("event_type")).distinct())
      grid.join(hourly, Seq("h", "event_type"), "left")
        .select(col("h"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"),
          (coalesce(col("vu"), lit(0L)) / 10000.0).as("value_sum"))
        .orderBy("h", "event_type")
    },
    Some("""WITH b AS (
              SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS mn,
                     date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS mx
              FROM events),
            grid AS (
              SELECT g.h, t.event_type
              FROM b, LATERAL (SELECT unnest(generate_series(b.mn, b.mx,
                                INTERVAL 1 HOUR)) AS h) g
              CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
            agg AS (
              SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
                count(*) AS n,
                sum(CAST(round(value * 10000) AS BIGINT)) AS vu
              FROM events GROUP BY 1, 2)
            SELECT grid.h, grid.event_type,
              COALESCE(agg.n, 0) AS n,
              CAST(COALESCE(agg.vu, 0) AS DOUBLE) / 10000.0 AS value_sum
            FROM grid LEFT JOIN agg USING (h, event_type)
            ORDER BY h, event_type"""))

  /** Cohort retention (product-analytics staple): users grouped by their
    * first-activity day; for each (cohort, day-offset) the count of
    * users still active. Two aggregations on user_id reuse one shuffle
    * (min-day and distinct-active-days both hash on user_id); the final
    * (cohort × offset) aggregation is dictionary-sized. */
  private val qCohortRetention = Q(
    "q_cohort_retention",
    (s, dir) => {
      val e = table(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
      val active = e.distinct()
      active.join(cohort, "user_id")
        .select(col("cohort_day"),
          datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"),
          col("user_id"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },
    Some("""WITH e AS (
              SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
              FROM events),
            cohort AS (
              SELECT user_id, min(d) AS cohort_day FROM e GROUP BY user_id),
            active AS (SELECT DISTINCT user_id, d FROM e)
            SELECT c.cohort_day,
              CAST(date_diff('day', c.cohort_day, a.d) AS BIGINT) AS day_offset,
              count(DISTINCT a.user_id) AS n_users
            FROM active a JOIN cohort c USING (user_id)
            GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""))

  /** GLOBAL NTILE — equi-depth bucketing over a whole-table order (the
    * primitive behind range-partitioning a 100 TB sort, equi-depth
    * histograms, and percentile-bucket feature engineering) WITHOUT the
    * single-task global window `ntile(16) OVER (ORDER BY …)` plans. The
    * global position comes from the quantile-salted prefix-sum machinery
    * (operators/SaltedPrefix — balanced under the skewed price
    * distribution), and the tile is then pure arithmetic implementing
    * EXACT SQL NTILE remainder semantics: the first N mod T tiles get
    * ⌈N/T⌉ rows, the rest ⌊N/T⌋ — so the gate hash-matches DuckDB's own
    * ntile, not an approximation of it. The ORDER is the COMPOSITE
    * (price, orderkey) via SaltedPrefix's tie column — the r12 one-int
    * encoding (price4 × (maxkey+1) + key) overflowed int64 at the sf10
    * id domain (price4 ~2^33 × keys ~2^34; caught by the r13 sf10 gate),
    * and no packing survives keys whose widths sum past 63 bits.
    *
    * Scale shape: one one-row broadcast (row count); per-row work is a
    * codegen'd projection; the only windows are the salted machinery's
    * (per-bucket, plus a 32-row offsets pass). */
  private val qWindowNtile = Q(
    "q_window_ntile",
    (s, dir) => {
      val tiles = 16
      val o = table(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val consts = o.agg(count(lit(1)).as("n_total"))
      val encoded = o.crossJoin(broadcast(consts))
        .select(col("o_orderkey"), col("o_totalprice"), col("n_total"),
          fixed4(col("o_totalprice")).as("ord"), lit("all").as("k"))
      graft.operators.SaltedPrefix
        .exclusivePrefixSumQuantile(encoded, "k", "ord", lit(1L), nb = 32,
          tieCol = Some("o_orderkey"))
        .withColumn("pos", col("start_off") + 1L)
        .selectExpr("o_totalprice",
          s"""CASE WHEN pos <= ((n_total div $tiles) + 1) * (n_total % $tiles)
                THEN (pos - 1) div ((n_total div $tiles) + 1) + 1
                ELSE (n_total % $tiles)
                  + (pos - 1 - ((n_total div $tiles) + 1) * (n_total % $tiles))
                    div (n_total div $tiles) + 1
              END AS tile""")
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("price_lo"),
          max(col("o_totalprice")).as("price_hi"))
        .orderBy(col("tile"))
    },
    Some("""WITH t AS (
              SELECT o_totalprice,
                ntile(16) OVER (ORDER BY
                  CAST(round(o_totalprice * 10000) AS BIGINT), o_orderkey) AS tile
              FROM orders)
            SELECT CAST(tile AS BIGINT) AS tile, count(*) AS n,
              min(o_totalprice) AS price_lo, max(o_totalprice) AS price_hi
            FROM t GROUP BY tile ORDER BY tile"""))

  /** Ordered multi-stage FUNNEL (view → click → purchase): a user counts
    * for stage k only with a stage-k event STRICTLY AFTER their stage-
    * (k-1) entry time and within a 1-day conversion window — the
    * product-analytics primitive (drop-off measurement) that a naive
    * per-type count-distinct gets wrong (it counts purchase-before-view
    * users). On this corpus the window yields real attrition
    * (150 → 60 → 25 at sf0.01), so a stage-order or window bug moves
    * the gate.
    *
    * Scale shape: a cascade of per-stage earliest-qualifying-time
    * aggregations — each stage filters the event stream to ONE type at
    * the scan (pushed predicate), hash-aggregates per user (partial
    * map-side min), and equi-joins the previous stage's user→time table
    * on user_id. Every shuffle in the plan is keyed on user_id at
    * user-cardinality row counts; no per-user event sorting, no window
    * over the raw stream, stages prune monotonically (stage k's input ⊆
    * stage k-1's users). The per-user sort a sequence-window funnel
    * would need never happens. */
  private val qFunnel = Q(
    "q_funnel",
    (s, dir) => {
      val ev = table(s, dir, "events").select("user_id", "event_type", "ts")
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, "user_id")
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 1 DAY"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id")
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 1 DAY"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      s1.select(lit("1_view").as("step"), col("user_id"))
        .unionAll(s2.select(lit("2_click").as("step"), col("user_id")))
        .unionAll(s3.select(lit("3_purchase").as("step"), col("user_id")))
        .groupBy("step").agg(count(lit(1)).as("users"))
        .orderBy("step")
    },
    Some("""WITH s1 AS (
              SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY 1),
            s2 AS (
              SELECT e.user_id, min(e.ts) AS t2 FROM events e
              JOIN s1 ON s1.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts > s1.t1
                AND e.ts <= s1.t1 + INTERVAL 1 DAY GROUP BY 1),
            s3 AS (
              SELECT e.user_id, min(e.ts) AS t3 FROM events e
              JOIN s2 ON s2.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                AND e.ts <= s2.t2 + INTERVAL 1 DAY GROUP BY 1)
            SELECT step, count(*) AS users FROM (
              SELECT '1_view' AS step, user_id FROM s1
              UNION ALL SELECT '2_click', user_id FROM s2
              UNION ALL SELECT '3_purchase', user_id FROM s3)
            GROUP BY step ORDER BY step"""))

  /** Event-type TRANSITION MATRIX (first-order Markov counts): for each
    * user's ts-ordered event sequence, count each consecutive
    * (from_type → to_type) step — the behavioral-model sufficient
    * statistic behind next-action prediction and anomaly scoring.
    *
    * Scale shape: ONE shuffle on user_id for the per-user lead() window
    * (per-user partitions are event-per-user sized, never global), then
    * a 25-cell hash aggregation with map-side partials. Ties on ts are
    * broken by event_id so the sequence — and therefore the gate hash —
    * is deterministic under any partitioning. */
  private val qEventsMarkov = Q(
    "q_events_markov",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      table(s, dir, "events").select("user_id", "event_type", "ts", "event_id")
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type").as("from_type"),
          col("next_type").as("to_type"), col("n"))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH seq AS (
              SELECT user_id, event_type,
                lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS next_type
              FROM events)
            SELECT event_type AS from_type, next_type AS to_type,
              count(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** LAST-TOUCH ATTRIBUTION: each purchase is credited to the user's most
    * recent preceding view/click within a 1-day lookback — the
    * marketing-analytics join of an event to its own stream's past. One
    * conditional `last(..., ignoreNulls)` window over a
    * UNBOUNDED-PRECEDING..1-PRECEDING rows frame does the whole lookup:
    * no self-join of events to events, no per-purchase subquery. The
    * frame carries a (ts, event_id, type) struct so the credited touch,
    * its channel, and the recency filter all come from one window pass.
    *
    * Scale shape: one user_id shuffle (per-user partitions, never
    * global); running-frame state is O(1) per row (`last` keeps one
    * struct). Ties broken by event_id — deterministic under any
    * partitioning. */
  private val qAttribLastTouch = Q(
    "q_attrib_last_touch",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .withColumn("touch",
          last(when(col("event_type").isin("view", "click"),
            struct(col("ts").as("ts"), col("event_id").as("event_id"),
              col("event_type").as("event_type"))), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "purchase" && col("touch").isNotNull &&
          col("ts") <= col("touch.ts") + expr("INTERVAL 1 DAY"))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("touch.event_id").as("touch_id"),
          col("touch.event_type").as("channel"))
        .orderBy("purchase_id")
    },
    Some("""WITH seq AS (
              SELECT event_id, user_id, event_type, ts,
                last_value(CASE WHEN event_type IN ('view', 'click')
                  THEN struct_pack(ts := ts, event_id := event_id,
                    event_type := event_type) END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
              FROM events)
            SELECT event_id AS purchase_id, user_id,
              touch.event_id AS touch_id, touch.event_type AS channel
            FROM seq
            WHERE event_type = 'purchase' AND touch IS NOT NULL
              AND ts <= touch.ts + INTERVAL 1 DAY
            ORDER BY purchase_id"""))

  /** Per-group PERCENT-RANK score calibration — the feature-preprocessing
    * step that maps raw scores onto a within-group [0, 1] quantile scale
    * (micro-units). NOT planned as a per-row window: a percent_rank()
    * OVER (PARTITION BY event_type) would funnel the whole corpus
    * through 5 partitions. Instead the count-map shape: one
    * (type, value) hash aggregation, cumulative ranks over the
    * AGGREGATED value table (bounded by the value domain, not the
    * corpus — the q_agg_cms discipline), then an equi-join back on
    * (type, value). Tie semantics are SQL rank (ties share the minimum
    * rank, 956 tied rows in the corpus exercise it), and the DuckDB
    * oracle deliberately uses its NATIVE percent_rank() window — a
    * cross-formulation check, not a mirror. The division
    * lo/(n−1) runs on identical integers in both engines, so the
    * rounded micro value is bit-identical. */
  private val qScoreCalibrate = Q(
    "q_score_calibrate",
    (s, dir) => {
      val e = table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val counts = e.groupBy(col("event_type"), col("value"))
        .agg(count(lit(1)).as("cnt"))
      val cum = counts
        .withColumn("hi",
          sum("cnt").over(Window.partitionBy("event_type").orderBy("value")))
        .withColumn("n", sum("cnt").over(Window.partitionBy("event_type")))
        .select(col("event_type"), col("value"),
          (col("hi") - col("cnt")).as("lo"), col("n"))
      e.join(cum, Seq("event_type", "value"))
        .select(col("event_id"), col("event_type"),
          when(col("n") === 1L, 0L)
            .otherwise(round((col("lo").cast("double") /
              (col("n") - 1).cast("double")) * lit(1000000.0), 0).cast("long"))
            .as("pct_micro"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, event_type,
              CAST(round(percent_rank() OVER (PARTITION BY event_type
                ORDER BY value) * 1000000) AS BIGINT) AS pct_micro
            FROM events ORDER BY event_id"""))

  /** INTER-ARRIVAL GAP statistics — the temporal-health metric of an
    * event stream (is activity cadence drifting?): per user the gap to
    * the previous event in whole seconds (lag over the user's timeline),
    * then per event-type lower-median and lower-p90 of those gaps.
    * Quantiles use the count-map rule (min v with cum ≥ ⌈q·n⌉, ranks as
    * exact integers: (n+1) div 2 and (9n+9) div 10) — the
    * q_outliers_mad discipline, identical on both engines, gaps are
    * exact integer seconds so no float exists anywhere.
    *
    * Scale shape: one user_id window for the lag (per-user partitions),
    * one (type, gap) hash aggregation, cumulative pass over the
    * aggregated gap table (bounded by the gap-value domain). */
  private val qEventsGaps = Q(
    "q_events_gaps",
    (s, dir) => {
      val gaps = table(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("gap_s",
          // micros end-to-end then one floor division: unix_timestamp
          // FLOORS each endpoint while DuckDB's epoch() rounds — the
          // per-endpoint difference was off by one second on 3 rows
          expr("(unix_micros(CAST(ts AS TIMESTAMP)) - " +
            "unix_micros(CAST(lag(ts, 1) OVER " +
            "(PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP))) " +
            "div 1000000"))
        .filter(col("gap_s").isNotNull)
      val gm = gaps.groupBy(col("event_type"), col("gap_s"))
        .agg(count(lit(1)).as("cnt"))
      val cum = gm
        .withColumn("hi",
          sum("cnt").over(Window.partitionBy("event_type").orderBy("gap_s")))
        .withColumn("n", sum("cnt").over(Window.partitionBy("event_type")))
      val med = cum.filter(col("hi") >= expr("(n + 1) div 2"))
        .groupBy(col("event_type")).agg(min(col("gap_s")).as("med_gap_s"))
      val p90 = cum.filter(col("hi") >= expr("(9 * n + 9) div 10"))
        .groupBy(col("event_type")).agg(min(col("gap_s")).as("p90_gap_s"))
      val counts = gaps.groupBy(col("event_type")).agg(count(lit(1)).as("n_gaps"))
      counts.join(med, "event_type").join(p90, "event_type")
        .select("event_type", "n_gaps", "med_gap_s", "p90_gap_s")
        .orderBy("event_type")
    },
    Some("""WITH seq AS (
              SELECT user_id, event_type, ts,
                (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id))) // 1000000 AS gap_s
              FROM events),
            gaps AS (SELECT event_type, gap_s FROM seq WHERE gap_s IS NOT NULL),
            gm AS (
              SELECT event_type, gap_s, count(*) AS cnt
              FROM gaps GROUP BY 1, 2),
            cum AS (
              SELECT event_type, gap_s,
                sum(cnt) OVER (PARTITION BY event_type ORDER BY gap_s) AS hi,
                sum(cnt) OVER (PARTITION BY event_type) AS n
              FROM gm),
            med AS (
              SELECT event_type, min(gap_s) AS med_gap_s FROM cum
              WHERE hi >= (n + 1) // 2 GROUP BY 1),
            p90 AS (
              SELECT event_type, min(gap_s) AS p90_gap_s FROM cum
              WHERE hi >= (9 * n + 9) // 10 GROUP BY 1),
            counts AS (
              SELECT event_type, count(*) AS n_gaps FROM gaps GROUP BY 1)
            SELECT event_type, n_gaps, med_gap_s, p90_gap_s
            FROM counts JOIN med USING (event_type) JOIN p90 USING (event_type)
            ORDER BY event_type"""))

  /** ERROR-RATE SPIKE detection against a trailing baseline — the
    * ops-monitoring shape: hourly error rates compared with the
    * preceding 24 hours, flagged when the hour's rate exceeds 1.5× the
    * baseline rate. The comparison is the integer cross-product
    * errs·base_n·2 > n·base_errs·3 — rates are never materialized as
    * floats, so a borderline hour cannot flip between engines. The
    * trailing frame runs over the AGGREGATED hourly table
    * (calendar-bounded, the q_window_distinct_sketch discipline), one
    * hash aggregation upstream. */
  private val qEventsAnomaly = Q(
    "q_events_anomaly",
    (s, dir) => {
      val h = table(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errs"))
      val w = Window.orderBy(col("hr")).rowsBetween(-24, -1)
      h.withColumn("base_errs", sum("errs").over(w))
        .withColumn("base_n", sum("n").over(w))
        .filter(col("base_n").isNotNull && col("base_n") > 0 &&
          col("errs") * col("base_n") * 2 > col("n") * col("base_errs") * 3)
        .select(col("hr").cast("timestamp_ntz").as("hr"), col("n"), col("errs"))
        .orderBy("hr")
    },
    Some("""WITH h AS (
              SELECT date_trunc('hour', ts) AS hr, count(*) AS n,
                sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs
              FROM events GROUP BY 1),
            w AS (
              SELECT hr, n, errs,
                sum(errs) OVER (ORDER BY hr
                  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS base_errs,
                sum(n) OVER (ORDER BY hr
                  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS base_n
              FROM h)
            SELECT hr, n, CAST(errs AS BIGINT) AS errs FROM w
            WHERE base_n IS NOT NULL AND base_n > 0
              AND errs * base_n * 2 > n * base_errs * 3
            ORDER BY hr"""))

  /** NEW vs RETURNING user accounting per day — the audience-composition
    * split every activity dashboard needs, and the complement of cohort
    * retention (which buckets by cohort; this buckets by calendar day).
    * A user is "new" on their first-ever active day, "returning" on any
    * later active day.
    *
    * Scale shape: activity collapses to DISTINCT (day, user) pairs
    * first (one shuffle, map-side combined); first-seen days are a
    * user-keyed aggregation whose join back REUSES the user_id
    * partitioning; the final per-day aggregation is calendar-sized. No
    * window over raw events, no per-user sort. */
  private val qUsersNewReturning = Q(
    "q_users_new_returning",
    (s, dir) => {
      val pairs = table(s, dir, "events")
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .distinct()
      val first = pairs.groupBy(col("user_id"))
        .agg(min(col("day")).as("first_day"))
      pairs.join(first, "user_id")
        .groupBy(col("day"))
        .agg(
          sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
            .as("new_users"),
          sum(when(col("day") > col("first_day"), 1L).otherwise(0L))
            .as("returning_users"))
        .select(col("day").cast("timestamp_ntz").as("day"),
          col("new_users"), col("returning_users"))
        .orderBy("day")
    },
    Some("""WITH pairs AS (
              SELECT DISTINCT date_trunc('day', ts) AS day, user_id
              FROM events),
            first AS (
              SELECT user_id, min(day) AS first_day FROM pairs GROUP BY 1)
            SELECT pairs.day AS day,
              CAST(sum(CASE WHEN pairs.day = first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
              CAST(sum(CASE WHEN pairs.day > first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users
            FROM pairs JOIN first USING (user_id)
            GROUP BY 1 ORDER BY 1"""))

  override val queries: Seq[Q] = Seq(
    qWindowTopk, qWindowRunning, qWindowLeadLag, qWindowRank,
    qWindowRangeFrame, qWindowAnalytics, qAggRollup, qAggCube,
    qAggGroupingSets, qAggUnpivot, qWindowRownumSalted, qWindowRownumQsalted,
    qWindowNtile, qScd2Intervals, qSessionize, qTimeseriesFill, qCohortRetention,
    qFunnel, qEventsMarkov, qAttribLastTouch, qScoreCalibrate,
    qUsersNewReturning, qEventsGaps, qEventsAnomaly)
}
