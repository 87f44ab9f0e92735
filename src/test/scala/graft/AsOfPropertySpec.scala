package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoin

/** Property-based differential for the native as-of join, all three
  * directions: random probe/build sets (skewed key space, clustered
  * times, deliberate duplicates) vs a brute-force collections oracle.
  * The fixture-based edges live in AsOfJoinPlanSpec; this sweeps the
  * space between them — empty sides, all-one-key, ties everywhere. */
class AsOfPropertySpec extends AnyFunSuite with SparkSessionFixture {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  // few keys + a narrow time domain ⇒ collisions and ties are common
  private val genRow: Gen[(Long, Long)] = for {
    k <- Gen.choose(0L, 3L)
    t <- Gen.choose(0L, 40L)
  } yield (k, t)

  private val genSide: Gen[List[(Long, Long)]] =
    Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, genRow))

  /** Brute-force oracle. Build ids are position indexes; ties at equal
    * (time) resolve by smallest id — matching the buildTiebreak=bid the
    * Spark side passes. */
  private def oracle(
      probe: Seq[(Long, Long)],
      build: Seq[(Long, Long, Long)], // (k, t, bid)
      dir: String,
      tol: Long): Seq[(Long, Long, Long)] = // (k, pt, matched bid or -1)
    probe.map { case (k, pt) =>
      val same = build.filter(_._1 == k)
      // backward = LAST in (t, bid) build order ⇒ max t; among equal t,
      // max bid (the exec's lastMatch is the last row consumed in sorted
      // order); forward = FIRST at-or-after ⇒ min t, then min bid
      val backPick = same.filter(_._2 <= pt)
        .sortBy(b => (-b._2, -b._3)).headOption
      val fwdPick = same.filter(_._2 >= pt)
        .sortBy(b => (b._2, b._3)).headOption
      val m = dir match {
        case "backward" => backPick
        case "forward" => fwdPick
        case "nearest" =>
          val db = backPick.map(b => pt - b._2).getOrElse(Long.MaxValue)
          val df = fwdPick.map(b => b._2 - pt).getOrElse(Long.MaxValue)
          if (db <= df && db <= tol) backPick
          else if (df < db && df <= tol) fwdPick
          else None
      }
      (k, pt, m.map(_._3).getOrElse(-1L))
    }.sortBy(r => (r._1, r._2, r._3))

  test("native as-of equals the brute-force oracle for all directions") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAll(genSide, genSide) { (probeRaw, buildRaw) =>
      // unique probe ids so result rows can be keyed; build ids = index
      val probe = probeRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val build = buildRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val pDf = probe.toDF("k", "t", "pid")
      val bDf = build.toDF("k", "t", "bid")
      val tol = 5L
      Seq("backward", "forward", "nearest").forall { dir =>
        val joined = dir match {
          case "backward" =>
            AsOfJoin.lastBefore(pDf, bDf, Seq("k"), "t", "t", Seq("bid"))
          case "forward" =>
            AsOfJoin.firstAfter(pDf, bDf, Seq("k"), "t", "t", Seq("bid"))
          case "nearest" =>
            AsOfJoin.nearest(pDf, bDf, Seq("k"), "t", "t", tol, Seq("bid"))
        }
        val got = joined.select(col("k"), col("t"),
            coalesce(col("r_bid"), lit(-1L)))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSeq.sortBy(r => (r._1, r._2, r._3))
        val want = oracle(probe.map(p => (p._1, p._2)), build, dir, tol)
        if (got != want) {
          info(s"dir=$dir probe=$probe build=$build\ngot= $got\nwant=$want")
        }
        got == want
      }
    }
    check(prop)
  }
}
