package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck differentials for the two extracted operator cores whose
  * gated queries only see one dataset shape: integer PageRank (random
  * directed graphs vs a collections fold) and gaps-and-islands
  * sessionization (random event streams vs a collections splitter). The
  * distributed result must equal the sequential oracle EXACTLY — both
  * algorithms were engineered for that (integer arithmetic; quantized
  * sums), so any divergence is a real bug, not float noise.
  */
class GraphSessionPropertySpec extends AnyFunSuite with SparkSessionFixture {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      s <- Gen.choose(0L, 12L)
      d <- Gen.choose(0L, 12L) if d != s
    } yield (s, d)).map(_.distinct)

  /** Sequential integer PageRank — same recurrence, plain Scala. */
  private def naivePageRank(
      edges: List[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      val contrib = edges
        .map { case (s, d) => d -> r(s) / outdeg(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = nodes.map(n => n -> (150000L + 850L * contrib.getOrElse(n, 0L) / 1000L)).toMap
    }
    r
  }

  test("integer PageRank: distributed rounds == sequential fold on random digraphs") {
    implicit val s = spark
    import s.implicits._
    check(Prop.forAll(edgeGen, Gen.choose(1, 4)) { (edges, rounds) =>
      edges.isEmpty || {
        val df = edges.toDF("src", "dst").repartition(5)
        val got = graft.queries.Advanced.integerPageRank(df, rounds)
          .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
        got == naivePageRank(edges, rounds)
      }
    })
  }

  test("fixpoint PageRank == fixed-depth run on random digraphs (absorbing fixpoint)") {
    implicit val s = spark
    import s.implicits._
    // equality must hold whether or not the early exit fires: if the
    // loop stops at k < cap the vector is a fixpoint and rounds k..cap
    // reproduce it, so fixed-cap == fixpoint-cap always
    check(Prop.forAll(edgeGen, Gen.choose(1, 4)) { (edges, cap) =>
      edges.isEmpty || {
        val df = edges.toDF("src", "dst").repartition(5)
        val (ranks, rounds) =
          graft.queries.Advanced.integerPageRankFixpoint(df, cap)
        val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        rounds <= cap && got == naivePageRank(edges, cap)
      }
    })
  }

  test("fixpoint PageRank exits early on an already-stable graph") {
    implicit val s = spark
    import s.implicits._
    // directed cycle: every node has outdeg 1 and indeg 1, so each round
    // computes r' = 150000 + 850*1000000/1000 = 1000000 — stable at the
    // initial vector; the loop must detect it on round 1, not run to cap
    val n = 8L
    val cycle = (0L until n).map(i => (i, (i + 1) % n)).toList
    val df = cycle.toDF("src", "dst").repartition(3)
    val (ranks, rounds) = graft.queries.Advanced.integerPageRankFixpoint(df, 50)
    assert(rounds === 1, "early exit did not fire")
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L until n).map(_ -> 1000000L).toMap)
  }

  private val eventsGen: Gen[List[(Long, Long, Long, Double)]] =
    Gen.nonEmptyListOf(for {
      u <- Gen.choose(1L, 4L)
      tsSec <- Gen.choose(0L, 40000L)
      v <- Gen.choose(0, 99999).map(_ / 100.0)
    } yield (u, tsSec, v)).map(_.zipWithIndex.map { case ((u, t, v), i) =>
      (u, i.toLong, t, v) // unique event_id = position
    })

  /** Sequential sessionizer: sort per user by (ts, event_id), split on
    * gap > gapSec, aggregate; session ids are 1-based in stream order. */
  private def naiveSessions(rows: List[(Long, Long, Long, Double)], gapSec: Long)
      : Set[(Long, Long, Long, Long, Long, Double)] =
    rows.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
        if (e._3 - acc.head.head._3 > gapSec) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }.map(_.reverse).reverse
      sessions.zipWithIndex.map { case (ses, i) =>
        val units = ses.map(e => math.round(e._4 * 10000)).sum
        (u, i + 1L, ses.size.toLong,
          ses.map(_._3).min * 1000000L, ses.map(_._3).max * 1000000L,
          units / 10000.0)
      }
    }.toSet

  test("sessionize: distributed gaps-and-islands == sequential splitter on random streams") {
    implicit val s = spark
    import s.implicits._
    check(Prop.forAll(eventsGen, Gen.oneOf(60L, 600L, 3600L)) { (rows, gap) =>
      rows.isEmpty || {
        val df = rows.toDF("user_id", "event_id", "ts_sec", "value")
          .withColumn("ts", timestamp_seconds(col("ts_sec")).cast("timestamp_ntz"))
          .repartition(5)
        val got = graft.queries.Windows.sessionAssign(df, gap)
          .select(col("user_id"), col("session_idx"), col("n_events"),
            unix_micros(col("session_start").cast("timestamp")).as("start_us"),
            unix_micros(col("session_end").cast("timestamp")).as("end_us"),
            col("session_value"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getDouble(5))).toSet
        got == naiveSessions(rows, gap)
      }
    })
  }
}
