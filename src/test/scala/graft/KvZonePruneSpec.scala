package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.sources._

import graft.sources.{KvZoneMap, KvZonePrune}

/** ScalaCheck soundness property for the zone-map file-skip decision
  * (sources/KvSource `KvZonePrune`): over arbitrary file contents and
  * arbitrary conjunctions of pushed predicates + runtime key sets, a
  * SKIPPED file must contain no row satisfying the conjunction — the
  * one property pruning must never violate (skipping too little is a
  * performance bug; skipping too much is silent data loss). Stats are
  * computed exactly the way the writer does, including the
  * NaN-withholds-double-bounds rule. */
class KvZonePruneSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(400).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private case class Row(k: Long, d: Double, s: String)

  private val genDouble: Gen[Double] = Gen.frequency(
    8 -> Gen.chooseNum(-1e6, 1e6),
    1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 0.0, -0.0),
    1 -> Gen.chooseNum(-5L, 5L).map(_.toDouble))
  private val genStr: Gen[String] =
    // includes supplementary characters (surrogate pairs) and high-BMP
    // units: code-point order and Java's UTF-16 compareTo DISAGREE on
    // exactly these, so the generator exercises the r11 ADVICE divergence
    Gen.listOfN(3, Gen.oneOf("a", "b", "zz", ",", "%", "\n", "",
      "\uD83D\uDE00", "\uFFFD", "\uE000")).map(_.mkString)
  private val genRow: Gen[Row] = for {
    k <- Gen.chooseNum(-100L, 100L)
    d <- genDouble
    s <- genStr
  } yield Row(k, d, s)

  /** The writer's stats computation, replicated: -0.0 normalized to 0.0,
    * any NaN withholds the double bounds. */
  private def norm(d: Double): Double = if (d == 0.0) 0.0 else d
  private def statsOf(rows: Seq[Row]): KvZoneMap.Stats =
    if (rows.isEmpty) KvZoneMap.Stats(0, Map.empty)
    else {
      val ds = rows.map(r => norm(r.d))
      val dBounds =
        if (ds.exists(_.isNaN)) Map.empty[String, (Double, Double)]
        else Map("d" -> ((ds.min, ds.max)))
      KvZoneMap.Stats(rows.length.toLong,
        Map("k" -> ((rows.map(_.k).min, rows.map(_.k).max))),
        dBounds,
        // string bounds in CODE-POINT order, exactly like the writer
        Map("s" -> ((rows.map(_.s).min(graft.sources.KvEscape.cpOrdering),
          rows.map(_.s).max(graft.sources.KvEscape.cpOrdering)))))
    }

  /** Spark-semantics row evaluation of one well-typed predicate. NaN
    * follows java.lang.Double.compare (NaN greatest, NaN == NaN), which
    * is Spark's ordering. */
  private def rowSat(r: Row, f: Filter): Boolean = {
    def cmpL(v: Any): Int = java.lang.Long.compare(r.k, v.asInstanceOf[Long])
    // Spark comparison semantics: -0.0 == 0.0, NaN greatest and equal to itself
    def cmpD(v: Any): Int =
      java.lang.Double.compare(norm(r.d), norm(v.asInstanceOf[Double]))
    // Spark compares strings as UTF8String = code-point order, NOT Java's
    // UTF-16 compareTo — the naive evaluator must model Spark, so a
    // UTF-16-ordered prune decision now FAILS this property (r11 ADVICE)
    def cmpS(v: Any): Int =
      graft.sources.KvEscape.cpCompare(r.s, v.asInstanceOf[String])
    def cmp(a: String, v: Any): Int = a match {
      case "k" => cmpL(v)
      case "d" => cmpD(v)
      case "s" => cmpS(v)
    }
    f match {
      case EqualTo(a, v) => cmp(a, v) == 0
      case In(a, vs) => vs.exists(cmp(a, _) == 0)
      case GreaterThan(a, v) => cmp(a, v) > 0
      case GreaterThanOrEqual(a, v) => cmp(a, v) >= 0
      case LessThan(a, v) => cmp(a, v) < 0
      case LessThanOrEqual(a, v) => cmp(a, v) <= 0
      case _ => true
    }
  }

  private def genPred: Gen[Filter] = for {
    col <- Gen.oneOf("k", "d", "s")
    lit <- col match {
      case "k" => Gen.chooseNum(-120L, 120L).map(_.asInstanceOf[Any])
      case "d" => genDouble.map(_.asInstanceOf[Any])
      case "s" => genStr.map(_.asInstanceOf[Any])
    }
    lits <- col match {
      case "k" => Gen.listOfN(3, Gen.chooseNum(-120L, 120L)).map(_.map(_.asInstanceOf[Any]))
      case "d" => Gen.listOfN(3, genDouble).map(_.map(_.asInstanceOf[Any]))
      case "s" => Gen.listOfN(3, genStr).map(_.map(_.asInstanceOf[Any]))
    }
    p <- Gen.oneOf[Filter](EqualTo(col, lit), In(col, lits.toArray),
      GreaterThan(col, lit), GreaterThanOrEqual(col, lit),
      LessThan(col, lit), LessThanOrEqual(col, lit))
  } yield p

  test("soundness: a skipped file holds no row satisfying the conjunction") {
    check(Prop.forAll(
      Gen.listOf(genRow),
      Gen.listOfN(4, genPred),
      Gen.listOf(Gen.chooseNum(-120L, 120L)).map(_.toSet)) { (rows, preds, keys) =>
      val st = statsOf(rows)
      val runtime = if (keys.isEmpty) Map.empty[String, Set[Long]]
        else Map("k" -> keys)
      val kept = KvZonePrune.keeps(st, preds, runtime)
      val anySat = rows.exists { r =>
        preds.forall(rowSat(r, _)) &&
          (keys.isEmpty || keys.contains(r.k))
      }
      // pruning may keep a file with no matches (imprecision is fine);
      // it must NEVER skip a file that has one
      !anySat || kept
    })
  }

  test("point lookups inside the bounds are always kept (no false skip at edges)") {
    check(Prop.forAll(Gen.nonEmptyListOf(genRow)) { rows =>
      val st = statsOf(rows)
      rows.forall { r =>
        KvZonePrune.keeps(st, Seq(EqualTo("k", r.k)), Map.empty) &&
        KvZonePrune.keeps(st, Seq(EqualTo("s", r.s)), Map.empty) &&
        KvZonePrune.keeps(st, Seq(EqualTo("d", r.d)), Map.empty)
      }
    })
  }
}
