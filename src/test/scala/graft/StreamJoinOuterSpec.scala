package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.EventU

/** The LEFT OUTER stream-stream join emission contract — the place
  * engines get watermark semantics wrong. Proven here, per provider
  * (HDFS-backed and RocksDB state stores):
  *
  *  - the append stream's union of emissions equals the batch twin
  *    (every purchase exactly once, null-padded when unmatched);
  *  - a null-padded row is emitted EXACTLY once, never in the drip that
  *    delivered its purchase, and only once the watermark has passed the
  *    purchase's event time (the candidate window `s_ts ≤ p_ts` is then
  *    closed, so the null verdict is final);
  *  - join state is EVICTED, not accreted: after the flush sentinels,
  *    remaining state is sentinel-sized, far below total rows fed.
  */
class StreamJoinOuterSpec extends AnyFunSuite with SparkSessionFixture {

  private val baseMs = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  /** Epoch micros for "day d, hour h" relative to 2024-01-01 (day may
    * exceed the month — it is plain arithmetic, not a calendar date). */
  private def us(day: Int, hour: Int): Long =
    (baseMs + ((day - 1) * 24L + hour) * 3600000L) * 1000L

  /** timestamp_ntz columns surface as LocalDateTime, ltz as Timestamp —
    * normalize either to epoch micros (session TZ is UTC). */
  private def anyTsUs(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime * 1000L
    case d: java.time.LocalDateTime =>
      d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000L
    case other => fail(s"unexpected timestamp value: $other")
  }

  /** Fixture: one matched purchase, one double-matched, and three
    * distinct unmatched shapes (no signup at all; signup outside the
    * 7-day window; signup after the purchase). */
  private val fixture: Seq[Seq[EventU]] = Seq(
    // drop A (day 1-2, chronological)
    Seq(
      EventU(2, us(1, 8), 3, "signup", 0.0),
      EventU(1, us(1, 10), 1, "signup", 0.0),
      EventU(3, us(2, 10), 5, "signup", 0.0),
      EventU(4, us(2, 11), 5, "signup", 0.0),
      EventU(5, us(2, 9), 2, "purchase", 1.0)), // u2: no signup ever -> null
    // drop B (day 3-5)
    Seq(
      EventU(6, us(3, 12), 1, "purchase", 1.0), // u1: matched by id 1
      EventU(7, us(4, 9), 4, "purchase", 1.0), // u4: signup arrives later -> null
      EventU(8, us(4, 10), 4, "signup", 0.0), // s_ts > p_ts: not a match
      EventU(9, us(5, 12), 5, "purchase", 1.0)), // u5: two matches (3, 4)
    // drop C (day 10): signup of u3 was 8d22h earlier -> outside 7d -> null
    Seq(EventU(10, us(10, 9), 3, "purchase", 1.0)),
    // drops D, E: watermark-flush sentinels on BOTH sides (global
    // watermark is the min over sides); reserved users never match, and
    // drop E repeats the SAME sentinel time so the final watermark
    // (sentinel − 1 h) never clears the sentinels themselves
    Seq(EventU(-1, us(40, 0), -100, "purchase", 0.0),
      EventU(-2, us(40, 0), -200, "signup", 0.0)),
    Seq(EventU(-3, us(40, 0), -100, "purchase", 0.0),
      EventU(-4, us(40, 0), -200, "signup", 0.0)))

  private val allReal: Seq[EventU] = fixture.take(3).flatten

  /** Drives the live join under `providerClass`; returns per-drip
    * (new rows, watermark-after-us) plus (max, final) state row counts. */
  private def run(providerClass: String, sink: String)
      : (Seq[(Seq[(Long, Long, Option[Long])], Long)], Long, Long) = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass", providerClass)
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    implicit val sqlCtx = s2.sqlContext
    import s2.implicits._
    val mem = MemoryStream[EventU]
    val streamingDf = mem.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))
    val q = EventStreams.purchaseSignupLeftJoin(streamingDf)
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    def rows: Seq[(Long, Long, Option[Long])] = s2.table(sink).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(anyTsUs(r.get(3)))))
    def wmUs: Long = Option(q.lastProgress)
      .flatMap(p => Option(p.eventTime.get("watermark")))
      .map(w => java.time.Instant.parse(w).toEpochMilli * 1000L)
      .getOrElse(0L)
    def stateRows: Long = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    var seen = Set.empty[(Long, Long, Option[Long])]
    var maxState = 0L
    try {
      val perDrip = fixture.map { drop =>
        mem.addData(drop)
        q.processAllAvailable()
        maxState = math.max(maxState, stateRows)
        val now = rows
        val fresh = now.filterNot(seen)
        // append sink must never re-emit: every row is fresh exactly once
        assert(now.size == seen.size + fresh.size,
          s"append sink re-emitted rows: $now")
        seen = now.toSet
        (fresh, wmUs)
      }
      (perDrip, maxState, stateRows)
    } finally q.stop()
  }

  test("left-outer join: exactly-once null emission after watermark, " +
      "bounded state, provider-independent") {
    val providers = Seq(
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val results = providers.map { case (label, cls) =>
      label -> run(cls, s"t_join_outer_$label")
    }

    // batch twin: the ground truth every provider must converge to
    implicit val s = spark
    import s.implicits._
    val batchDf = allReal.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))
    val expected = EventStreams.purchaseSignupLeftJoin(batchDf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(anyTsUs(r.get(3)))))
      .sorted

    for ((label, (perDrip, maxState, finalState)) <- results) {
      val emitted = perDrip.flatMap(_._1)
      assert(emitted.sorted == expected,
        s"$label: streamed union != batch twin")
      // the three unmatched shapes all surfaced as null rows
      assert(emitted.collect { case (u, p, None) => (u, p) }.toSet ==
        Set((2L, 5L), (4L, 7L), (3L, 10L)), s"$label: null rows wrong")
      // purchase ids per drip of arrival
      val arrivedIn: Map[Long, Int] = fixture.zipWithIndex.flatMap {
        case (drop, i) => drop.collect {
          case e if e.event_type == "purchase" => e.event_id -> i }
      }.toMap
      perDrip.zipWithIndex.foreach { case ((fresh, wmAfter), i) =>
        fresh.foreach {
          case (_, pid, None) =>
            val pTs = allReal.find(_.event_id == pid).get.ts_us
            assert(i > arrivedIn(pid),
              s"$label: null row for purchase $pid emitted in its own drip")
            assert(pTs < wmAfter,
              s"$label: null row for purchase $pid emitted before the " +
              s"watermark passed it ($pTs >= $wmAfter)")
          case _ => ()
        }
      }
      // state evicted after flush: sentinel-sized remnant, below peak
      assert(finalState < maxState,
        s"$label: state never shrank (max=$maxState final=$finalState)")
      assert(finalState <= 8,
        s"$label: final state $finalState rows — join state accreted")
    }
    // provider choice never changes emissions
    val byLabel = results.toMap
    assert(byLabel("hdfs")._1.flatMap(_._1).sorted ==
      byLabel("rocksdb")._1.flatMap(_._1).sorted)
  }
}
