package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential evidence for operators/AsOfRangeJoins.intervalOverlapPairs
  * (q_join_interval's scale rationale): the grid-bucketed equi-join must
  * return EXACTLY the pairs the naive cross-product theta join returns —
  * each pair once, under grid widths smaller than, comparable to, and far
  * larger than the interval lengths (the ownership-cell dedup rule must
  * hold in all three regimes). */
class IntervalJoinSpec extends AnyFunSuite with SparkSessionFixture {

  private def intervals(seed: Int, n: Int, span: Int, maxLen: Int,
      idPrefix: Long): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val lo = rnd.nextInt(span).toLong
      (idPrefix + i, lo, lo + rnd.nextInt(maxLen + 1))
    }
  }

  private def naive(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)]) =
    (for {
      (ai, alo, ahi) <- a
      (bi, blo, bhi) <- b
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)).sorted

  test("grid join equals the naive theta join at every grid width regime") {
    val a = intervals(seed = 1, n = 70, span = 400, maxLen = 25, idPrefix = 0L)
    val b = intervals(seed = 2, n = 60, span = 400, maxLen = 25, idPrefix = 1000L)
    import spark.implicits._
    val ad = a.toDF("a_id", "a_lo", "a_hi")
    val bd = b.toDF("b_id", "b_lo", "b_hi")
    val expected = naive(a, b)
    for (w <- Seq(1L, 7L, 30L, 10000L)) {
      val got = graft.operators.AsOfRangeJoins
        .intervalOverlapPairs(ad, bd, gridW = w)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
      assert(got == expected, s"gridW=$w: grid join diverged from naive " +
        s"(${got.size} vs ${expected.size} pairs)")
    }
  }

  test("epoch-micro-scale and negative bounds keep exact grid cells (no double floor)") {
    import spark.implicits._
    // Beyond 2^53, floor(x / w) in DOUBLE collapses neighboring cells:
    // these two disjoint intervals sit 1<<54 apart but land 4096 apart
    // after a double round-trip at gridW=1. Negative bounds additionally
    // need FLOOR division (truncation would shift the cell by one).
    val base = 1L << 54
    val a = Seq((1L, base, base + 10L), (2L, -1000003L, -1000001L))
    val b = Seq((10L, base + 5L, base + 20L), // overlaps 1
      (11L, base + 4090L, base + 4100L), // near double-rounding ghost of 1
      (12L, -1000002L, -999990L), // overlaps 2
      (13L, -999999L, -999990L)) // misses 2
    val ad = a.toDF("a_id", "a_lo", "a_hi")
    val bd = b.toDF("b_id", "b_lo", "b_hi")
    for (w <- Seq(1L, 7L, 4096L)) {
      val got = graft.operators.AsOfRangeJoins
        .intervalOverlapPairs(ad, bd, gridW = w)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
      assert(got == Seq((1L, 10L), (2L, 12L)),
        s"gridW=$w: exact-integer grid cells diverged: $got")
    }
  }

  test("zero-length and touching intervals overlap per closed-interval semantics") {
    import spark.implicits._
    // [5,5] touches [5,9]; [0,4] touches [4,8]; [0,3] misses [4,8]
    val ad = Seq((1L, 5L, 5L), (2L, 0L, 4L), (3L, 0L, 3L)).toDF("a_id", "a_lo", "a_hi")
    val bd = Seq((10L, 5L, 9L), (11L, 4L, 8L)).toDF("b_id", "b_lo", "b_hi")
    val got = graft.operators.AsOfRangeJoins
      .intervalOverlapPairs(ad, bd, gridW = 7L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 10L), (1L, 11L), (2L, 11L)))
  }
}
