package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.Graft.{moneySum, fixed4}

/** Structured-Streaming operators over the `events` schema (SURVEY §2.2
  * Streaming). Every transform is a plain DataFrame→DataFrame function on
  * the UNIFIED API: applied to `spark.read` it is the batch twin the
  * driver's oracle gates; applied to `spark.readStream` it is the
  * incremental version (exercised in StreamingSpec, stream-vs-batch
  * differential — SURVEY §7.4's plan for streaming with no reference
  * analog to test against).
  *
  * Scale notes: all aggregations key on (window × type) or (user ×
  * session) — high-cardinality, shuffle-parallel; state per key is O(1)
  * (counts / bounded session struct), so streaming state stores stay
  * bounded with a watermark evicting expired windows.
  */
object EventStreams {

  /** Tumbling 1-hour window: per event_type counts + exact money sum. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("value_sum"))
      .select(
        col("window.start").cast("timestamp_ntz").as("ws"),
        col("window.end").cast("timestamp_ntz").as("we"),
        col("event_type"), col("n"), col("value_sum"))

  /** Tumbling 1-hour window carrying a 1-hour WATERMARK — the append-mode
    * twin of [[tumbling]]. Append mode emits each window exactly once,
    * after the watermark passes its end, and evicts its state — the
    * bounded-state shape a 100 TB stream needs (complete mode re-emits
    * the whole result table every batch and its state never shrinks).
    * Watermarks require a TIMESTAMP (LTZ) column; session TZ is UTC
    * everywhere so the ntz→ltz cast is value-preserving and the output
    * casts back. On batch input the watermark is a no-op and this equals
    * [[tumbling]]. */
  def tumblingAppend(events: DataFrame): DataFrame =
    events
      .withColumn("tsl", col("ts").cast("timestamp"))
      .withWatermark("tsl", "1 hour")
      .groupBy(window(col("tsl"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("value_sum"))
      .select(
        col("window.start").cast("timestamp_ntz").as("ws"),
        col("window.end").cast("timestamp_ntz").as("we"),
        col("event_type"), col("n"), col("value_sum"))

  /** Sliding 1-hour window every 30 minutes (each event in 2 windows). */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").cast("timestamp_ntz").as("ws"),
        col("window.end").cast("timestamp_ntz").as("we"),
        col("event_type"), col("n"))

  /** Session windows with a 2-hour inactivity gap, per user. Session end
    * is last-event + gap (Spark session_window semantics). */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "2 hours"), col("user_id"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("value_sum"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("session_window.end").cast("timestamp_ntz").as("session_end"),
        col("n"), col("value_sum"))

  /** Watermarked exactly-once dedup on event identity — the streaming
    * ingestion guard that makes an at-least-once upstream (replayed
    * batches, retried producers) exactly-once downstream.
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes the key's event time, so state stays bounded by
    * the delay window — the 100 TB-safe variant of plain streaming
    * dropDuplicates, whose state grows with every key ever seen.
    * Duplicates are guaranteed caught while they arrive inside the
    * delay. Spark refuses the within-watermark variant on batch input
    * outright, so the unified transform branches: the batch twin is
    * exact `dropDuplicates` — the semantics the streaming path converges
    * to whenever duplicates arrive inside the delay, which is exactly
    * the equivalence StreamingSpec's differential pins. */
  def dedupEvents(events: DataFrame): DataFrame =
    if (events.isStreaming)
      events
        .withColumn("tsl", col("ts").cast("timestamp"))
        .withWatermark("tsl", "2 hours")
        .dropDuplicatesWithinWatermark("event_id")
        .drop("tsl")
    else events.dropDuplicates("event_id")

  /** Typed event row for stateful processing; ts carried as epoch
    * microseconds so the Encoder stays timezone-free. */
  final case class EventU(
      event_id: Long, ts_us: Long, user_id: Long, event_type: String, value: Double)

  /** Running per-user stats via flatMapGroupsWithState — the streaming
    * analog of the reference's Reducer (arbitrary per-key state, 0..n
    * outputs). In batch execution each key is processed once with empty
    * initial state, which makes the same code oracle-checkable. */
  final case class UserStats(
      user_id: Long, n: Long, first_us: Long, last_us: Long,
      n_purchase: Long, value4: Long)

  /** Stream-stream interval self-join: each purchase paired with every
    * signup by the same user in the preceding 7 days (inclusive of equal
    * timestamps). Both sides carry a 1-hour watermark and the join
    * condition bounds both event times, so in streaming mode the state
    * store retains only a bounded 7-day window per side — the canonical
    * watermarked stream-stream join shape. On batch input the watermark
    * is a no-op and this is a plain interval join. */
  def purchaseSignupJoin(events: DataFrame): DataFrame = {
    val (p, sg, cond) = purchaseSignupSides(events)
    p.join(sg, cond)
      .select(col("user_id"), col("purchase_id"),
        col("p_ts").cast("timestamp_ntz").as("p_ts"),
        col("s_ts").cast("timestamp_ntz").as("s_ts"))
  }

  /** LEFT OUTER stream-stream interval join — [[purchaseSignupJoin]]'s
    * outer twin, the shape engines get watermark semantics wrong on:
    * every purchase appears, those without a signup in the preceding 7
    * days as a null-padded row. In streaming append mode the null row
    * for an unmatched purchase is emitted EXACTLY ONCE, and only after
    * the global watermark passes the purchase's event time (at which
    * point no matching signup can still arrive: the join bounds s_ts ≤
    * p_ts, so once the watermark clears p_ts the candidate set is
    * closed and the purchase's state is evicted) — bounded state, late
    * null emission, no duplicates. On batch input the watermarks are
    * no-ops and this is a plain left interval join, which is what the
    * oracle gates; the streaming emission contract is differential-
    * tested in StreamingSpec. */
  def purchaseSignupLeftJoin(events: DataFrame): DataFrame = {
    val (p, sg, cond) = purchaseSignupSides(events)
    p.join(sg, cond, "left_outer")
      .select(col("user_id"), col("purchase_id"),
        col("p_ts").cast("timestamp_ntz").as("p_ts"),
        col("s_ts").cast("timestamp_ntz").as("s_ts"))
  }

  /** FULL OUTER stream-stream interval join — both unmatched shapes
    * surface as null-padded rows. Eviction timing is per side: a
    * purchase's candidate window closes when the watermark passes p_ts
    * (the join bounds s_ts ≤ p_ts), a signup's when it passes
    * s_ts + 7 days (matching purchases satisfy p_ts ∈ [s_ts, s_ts+7d]) —
    * so signup-null rows emit LATER than purchase-null rows at the same
    * event time, exactly once each, and both sides' state stays bounded
    * to the 7-day window. On batch input this is a plain full interval
    * join (the oracle-gated twin); the streaming emission contract is
    * differential-tested in StreamJoinFullSpec. */
  def purchaseSignupFullJoin(events: DataFrame): DataFrame = {
    val (p, sg, cond) = purchaseSignupSides(events)
    p.join(sg, cond, "full_outer")
      .select(coalesce(col("user_id"), col("s_user")).as("user_id"),
        col("purchase_id"),
        col("p_ts").cast("timestamp_ntz").as("p_ts"),
        col("s_ts").cast("timestamp_ntz").as("s_ts"))
  }

  /** Shared sides of the purchase↔signup interval joins. Watermarks
    * require TIMESTAMP (LTZ); session TZ is UTC everywhere so the
    * ntz→ltz cast is value-preserving and the outputs cast back. Both
    * sides carry a 1-hour watermark and the join condition bounds both
    * event times, so in streaming mode the state store retains only a
    * bounded 7-day window per side. */
  private def purchaseSignupSides(events: DataFrame) = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").cast("timestamp").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val sg = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"),
        col("ts").cast("timestamp").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    val cond = col("user_id") === col("s_user") &&
      col("s_ts") <= col("p_ts") &&
      col("s_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS")
    (p, sg, cond)
  }

  /** Stream-static enrichment join: each event picks up its user's tier
    * from a STATIC dimension — the stateless streaming join (no watermark,
    * no state store; the dim is re-broadcast per micro-batch). The per-tier
    * aggregation on top keeps the output small. Unified API: on batch
    * input this is an ordinary broadcast join + aggregation. */
  def enrichAgg(events: DataFrame, userDim: DataFrame): DataFrame =
    events
      .join(org.apache.spark.sql.functions.broadcast(userDim), "user_id")
      .groupBy(col("tier"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("value_sum"))

  def userStats(events: Dataset[EventU]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventU], state: GroupState[UserStats]) =>
          var st = state.getOption.getOrElse(
            UserStats(uid, 0L, Long.MaxValue, Long.MinValue, 0L, 0L))
          it.foreach { e =>
            st = UserStats(uid,
              st.n + 1,
              math.min(st.first_us, e.ts_us),
              math.max(st.last_us, e.ts_us),
              st.n_purchase + (if (e.event_type == "purchase") 1L else 0L),
              st.value4 + math.round(e.value * 10000L))
          }
          state.update(st)
          Iterator(st)
      }
  }

  /** Output row of the transformWithState ledger: running totals plus
    * the MapState-derived per-type rollup. */
  final case class UserLedger(
      user_id: Long, n: Long, n_types: Long, top_type: String, value4: Long)

  /** ValueState payload for [[UserLedgerProcessor]]. */
  final case class LedgerTotals(n: Long, value4: Long)

  /** Spark 4 arbitrary stateful processing (transformWithState): the
    * successor API to [GroupState]-based flatMapGroupsWithState, with
    * TYPED STATE VARIABLES the store indexes individually — here a
    * ValueState for the running (count, exact value sum) and a MapState
    * keyed by event type. The MapState matters at scale: per-type
    * counts update point-wise (one store key per type touched) instead
    * of rewriting one monolithic blob per event, and RocksDB state
    * backs it with O(touched keys) write amplification per batch.
    * Emits the updated ledger for every key seen in the batch (update
    * semantics: downstream consumers take the latest row per user). In
    * batch execution each key is processed once with empty state — the
    * oracle-checkable twin the q_stream_tws gate runs; streaming
    * execution (which REQUIRES the RocksDB provider) is
    * differential-tested in StreamingSpec. */
  class UserLedgerProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventU, UserLedger] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{MapState, TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var counts: MapState[String, Long] = _
    @transient private var totals: ValueState[LedgerTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      totals = getHandle.getValueState[LedgerTotals]("totals",
        Encoders.product[LedgerTotals], TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[EventU],
        timerValues: TimerValues): Iterator[UserLedger] = {
      var t = if (totals.exists()) totals.get() else LedgerTotals(0L, 0L)
      rows.foreach { e =>
        t = LedgerTotals(t.n + 1, t.value4 + math.round(e.value * 10000L))
        val c = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, c + 1L)
      }
      totals.update(t)
      // derive the rollup from the map state: distinct-type count and the
      // most frequent type (ties broken lexicographically, so the result
      // is deterministic whatever order the store iterates)
      var nTypes = 0L
      var topType = ""
      var topN = -1L
      counts.iterator().foreach { case (ty, c) =>
        nTypes += 1
        if (c > topN || (c == topN && ty < topType)) { topN = c; topType = ty }
      }
      Iterator.single(UserLedger(user, t.n, nTypes, topType, t.value4))
    }
  }

  /** Per-user ledger via transformWithState — see [[UserLedgerProcessor]]. */
  def userLedger(events: Dataset[EventU]): Dataset[UserLedger] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserLedgerProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Typed event row carrying a REAL timestamp column (watermarkable). */
  final case class EventT(
      event_id: Long, tsl: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** One closed session: end = last event + gap (session_window
    * semantics), value4 = exact 1e-4-unit value sum. */
  final case class SessionClose(
      user_id: Long, start_us: Long, end_us: Long, n: Long, value4: Long)

  /** Open-session state for [[SessionTimeoutProcessor]]. */
  final case class OpenSession(start_us: Long, last_us: Long, n: Long, value4: Long)

  /** Inactivity-timeout sessionization with EVENT-TIME TIMERS — the
    * timer half of the transformWithState API ([[UserLedgerProcessor]]
    * covers the state-variable half). Each user's open session lives in
    * a ValueState; every batch re-registers one timer at
    * last-event + gap, and when the WATERMARK passes that instant the
    * engine calls handleExpiredTimer, which emits the closed session
    * exactly once and clears the state — eviction is driven by event
    * time, not by a poll. A batch whose rows straddle a gap closes the
    * earlier session inline (walking the batch in timestamp order), so
    * sessions are identical whatever the micro-batch boundaries — the
    * property the StreamingSpec differential pins against a local
    * collections oracle. */
  class SessionTimeoutProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventT, SessionClose] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[EventT],
        timerValues: TimerValues): Iterator[SessionClose] = {
      // exact µs from the Timestamp: getTime() is ms-truncated, the
      // sub-ms part lives in getNanos
      def micros(t: java.sql.Timestamp): Long =
        t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
      val sorted = rows.toArray.sortBy(e => micros(e.tsl))
      val out = Seq.newBuilder[SessionClose]
      var st = if (open.exists()) open.get() else null
      sorted.foreach { e =>
        val us = micros(e.tsl)
        val v4 = math.round(e.value * 10000L)
        if (st == null) st = OpenSession(us, us, 1L, v4)
        else if (us - st.last_us >= gapMs * 1000L) {
          out += SessionClose(user, st.start_us, st.last_us + gapMs * 1000L,
            st.n, st.value4)
          st = OpenSession(us, us, 1L, v4)
        } else st = OpenSession(st.start_us, math.max(st.last_us, us),
          st.n + 1L, st.value4 + v4)
      }
      if (st != null) {
        open.update(st)
        // one live timer per key: drop the stale one, arm at last + gap
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(st.last_us / 1000L + gapMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionClose] = {
      // a timer can be stale if later rows extended the session in the
      // same batch that fired it; re-check against the state
      if (open.exists()) {
        val st = open.get()
        if (expiredTimerInfo.getExpiryTimeInMs() >= st.last_us / 1000L + gapMs) {
          open.clear()
          return Iterator.single(SessionClose(user, st.start_us,
            st.last_us + gapMs * 1000L, st.n, st.value4))
        }
      }
      Iterator.empty
    }
  }

  /** Event-time-timer sessionization via transformWithState; the input
    * must already carry a watermark on `tsl` (timers fire when the
    * watermark passes last-event + gap). */
  def sessionTimeouts(events: Dataset[EventT], gapMinutes: Int): Dataset[SessionClose] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimeoutProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Raw events frame → event-time-timer sessionization, append mode —
    * the runLiveDrip-shaped wrapper: watermark on the event time (zero
    * delay; the live gate's drops are chronological, so only the
    * deliberate late sentinel is ever behind the watermark), typed to
    * [[EventT]], closed sessions out. */
  def sessionTimeoutsAppend(events: DataFrame, gapMinutes: Int): DataFrame = {
    import events.sparkSession.implicits._
    val typed = events
      .withColumn("tsl", col("ts").cast("timestamp"))
      .withWatermark("tsl", "0 seconds")
      .select(col("event_id"), col("tsl"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventT]
    sessionTimeouts(typed, gapMinutes).toDF()
  }

  /** Project the events table into the typed stateful input. */
  def toTyped(events: DataFrame): Dataset[EventU] = {
    import events.sparkSession.implicits._
    events.select(
      col("event_id"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us"),
      col("user_id"), col("event_type"), col("value"))
      .as[EventU]
  }
}
