package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.EventU

/** FULL OUTER stream-stream join emission contract, per provider. On top
  * of the left-outer guarantees (StreamJoinOuterSpec), the full variant
  * must ALSO surface unmatched signups — whose eviction bound is
  * different: a signup can match purchases until the watermark passes
  * s_ts + 7 days (the join bounds p_ts ∈ [s_ts, s_ts+7d]), so its null
  * verdict is final strictly later than a purchase's at the same event
  * time. Proven here:
  *  - union of append emissions equals the batch twin (both null shapes);
  *  - a signup-null row emits exactly once, never in its own drip, and
  *    only after the watermark passed s_ts + 7 days;
  *  - a purchase-null row emits only after the watermark passed p_ts;
  *  - state is evicted to a sentinel-sized remnant, identical emissions
  *    under HDFS-backed and RocksDB providers.
  */
class StreamJoinFullSpec extends AnyFunSuite with SparkSessionFixture {

  private val baseMs = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private val dayUs = 24L * 3600L * 1000000L

  private def us(day: Int, hour: Int): Long =
    (baseMs + ((day - 1) * 24L + hour) * 3600000L) * 1000L

  private def anyTsUs(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime * 1000L
    case d: java.time.LocalDateTime =>
      d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000L
    case other => fail(s"unexpected timestamp value: $other")
  }

  /** Same fixture as the left-outer spec: under FULL semantics the
    * unmatched-signup shapes are id 2 (user 3's signup, only purchase
    * 8d22h later — outside the window) and id 8 (user 4's signup AFTER
    * user 4's only purchase). */
  private val fixture: Seq[Seq[EventU]] = Seq(
    Seq(
      EventU(2, us(1, 8), 3, "signup", 0.0),
      EventU(1, us(1, 10), 1, "signup", 0.0),
      EventU(3, us(2, 10), 5, "signup", 0.0),
      EventU(4, us(2, 11), 5, "signup", 0.0),
      EventU(5, us(2, 9), 2, "purchase", 1.0)),
    Seq(
      EventU(6, us(3, 12), 1, "purchase", 1.0),
      EventU(7, us(4, 9), 4, "purchase", 1.0),
      EventU(8, us(4, 10), 4, "signup", 0.0),
      EventU(9, us(5, 12), 5, "purchase", 1.0)),
    Seq(EventU(10, us(10, 9), 3, "purchase", 1.0)),
    Seq(EventU(-1, us(40, 0), -100, "purchase", 0.0),
      EventU(-2, us(40, 0), -200, "signup", 0.0)),
    Seq(EventU(-3, us(40, 0), -100, "purchase", 0.0),
      EventU(-4, us(40, 0), -200, "signup", 0.0)))

  private val allReal: Seq[EventU] = fixture.take(3).flatten

  private type JoinRow = (Long, Option[Long], Option[Long])

  private def toRow(r: org.apache.spark.sql.Row): JoinRow = (
    r.getLong(0),
    if (r.isNullAt(1)) None else Some(r.getLong(1)),
    if (r.isNullAt(3)) None else Some(anyTsUs(r.get(3))))

  private def run(providerClass: String, sink: String)
      : (Seq[(Seq[JoinRow], Long)], Long, Long) = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass", providerClass)
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    implicit val sqlCtx = s2.sqlContext
    import s2.implicits._
    val mem = MemoryStream[EventU]
    val streamingDf = mem.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))
    val q = EventStreams.purchaseSignupFullJoin(streamingDf)
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    def rows: Seq[JoinRow] = s2.table(sink).collect().toSeq.map(toRow)
    def wmUs: Long = Option(q.lastProgress)
      .flatMap(p => Option(p.eventTime.get("watermark")))
      .map(w => java.time.Instant.parse(w).toEpochMilli * 1000L)
      .getOrElse(0L)
    def stateRows: Long = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    var seen = Set.empty[JoinRow]
    var maxState = 0L
    try {
      val perDrip = fixture.map { drop =>
        mem.addData(drop)
        q.processAllAvailable()
        maxState = math.max(maxState, stateRows)
        val now = rows
        val fresh = now.filterNot(seen)
        assert(now.size == seen.size + fresh.size,
          s"append sink re-emitted rows: $now")
        seen = now.toSet
        (fresh, wmUs)
      }
      (perDrip, maxState, stateRows)
    } finally q.stop()
  }

  test("full-outer join: both null shapes exactly once after their " +
      "per-side watermark bounds, bounded state, provider-independent") {
    val providers = Seq(
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val results = providers.map { case (label, cls) =>
      label -> run(cls, s"t_join_full_$label")
    }

    implicit val s = spark
    import s.implicits._
    val batchDf = allReal.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))
    val expected = EventStreams.purchaseSignupFullJoin(batchDf)
      .collect().toSeq.map(toRow).sorted

    // by-construction ground truth for the two null shapes
    val wantPurchaseNull = Set((2L, 5L), (4L, 7L), (3L, 10L))
    val wantSignupNull = Set((3L, us(1, 8)), (4L, us(4, 10)))

    for ((label, (perDrip, maxState, finalState)) <- results) {
      val emitted = perDrip.flatMap(_._1)
      assert(emitted.sorted == expected, s"$label: streamed union != batch twin")
      assert(emitted.collect { case (u, Some(p), None) => (u, p) }.toSet ==
        wantPurchaseNull, s"$label: purchase-null rows wrong")
      assert(emitted.collect { case (u, None, Some(sTs)) => (u, sTs) }.toSet ==
        wantSignupNull, s"$label: signup-null rows wrong")
      val arrivedIn: Map[Long, Int] = fixture.zipWithIndex.flatMap {
        case (drop, i) => drop.map(e => e.event_id -> i)
      }.toMap
      perDrip.zipWithIndex.foreach { case ((fresh, wmAfter), i) =>
        fresh.foreach {
          case (_, Some(pid), None) =>
            val pTs = allReal.find(_.event_id == pid).get.ts_us
            assert(i > arrivedIn(pid),
              s"$label: null row for purchase $pid emitted in its own drip")
            assert(pTs < wmAfter,
              s"$label: null row for purchase $pid before watermark passage")
          case (u, None, Some(sTs)) =>
            val sid = allReal.find(e =>
              e.event_type == "signup" && e.user_id == u && e.ts_us == sTs)
              .get.event_id
            assert(i > arrivedIn(sid),
              s"$label: null row for signup $sid emitted in its own drip")
            assert(sTs + 7 * dayUs < wmAfter,
              s"$label: null row for signup $sid emitted before the " +
              s"watermark passed s_ts + 7d (${sTs + 7 * dayUs} >= $wmAfter)")
          case _ => ()
        }
      }
      assert(finalState < maxState,
        s"$label: state never shrank (max=$maxState final=$finalState)")
      assert(finalState <= 8,
        s"$label: final state $finalState rows — join state accreted")
    }
    val byLabel = results.toMap
    assert(byLabel("hdfs")._1.flatMap(_._1).sorted ==
      byLabel("rocksdb")._1.flatMap(_._1).sorted)
  }

  test("random corpora × random drip chunkings: emission multiset == batch twin") {
    // micro-batch boundaries must never change the converged result —
    // the chunking-invariance property, checked on random event sets cut
    // at random points (events fed chronologically, as a file source
    // landing in ts order would)
    val genEvents: Gen[Seq[EventU]] = for {
      n <- Gen.chooseNum(4, 22)
      raw <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 5L)
        day <- Gen.chooseNum(1, 12)
        hour <- Gen.chooseNum(0, 23)
        isP <- Gen.oneOf(true, false)
      } yield (u, day, hour, isP))
    } yield raw.distinct.zipWithIndex.map { case ((u, d, h, isP), i) =>
      EventU(i.toLong, us(d, h), u, if (isP) "purchase" else "signup",
        if (isP) 1.0 else 0.0)
    }.sortBy(e => (e.ts_us, e.event_id))
    val genCutMask: Gen[Seq[Boolean]] =
      Gen.listOfN(25, Gen.oneOf(true, false))

    val prop = Prop.forAll(genEvents, genCutMask) { (events, cutMask) =>
      val drips = events.zipWithIndex
        .foldLeft(Vector(Vector.empty[EventU])) { case (acc, (e, i)) =>
          if (i > 0 && cutMask(i % cutMask.size)) acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
        }.filter(_.nonEmpty)
      val flushUs = events.map(_.ts_us).max + 30L * dayUs
      val sentinels = Seq(
        Seq(EventU(-1, flushUs, -100, "purchase", 0.0),
          EventU(-2, flushUs, -200, "signup", 0.0)),
        Seq(EventU(-3, flushUs, -100, "purchase", 0.0),
          EventU(-4, flushUs, -200, "signup", 0.0)))

      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", "4")
      implicit val sqlCtx = s2.sqlContext
      import s2.implicits._
      val mem = MemoryStream[EventU]
      val sink = s"t_join_full_rand_${scala.util.Random.nextInt(Int.MaxValue)}"
      val q = EventStreams.purchaseSignupFullJoin(
          mem.toDF().withColumn("ts",
            timestamp_micros(col("ts_us")).cast("timestamp_ntz")))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      val streamed = try {
        (drips ++ sentinels).foreach { d =>
          mem.addData(d)
          q.processAllAvailable()
        }
        s2.table(sink).collect().toSeq.map(toRow).sorted
      } finally q.stop()

      val batch = EventStreams.purchaseSignupFullJoin(
          spark.createDataFrame(events).withColumn("ts",
            timestamp_micros(col("ts_us")).cast("timestamp_ntz")))
        .collect().toSeq.map(toRow).sorted
      streamed == batch
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
