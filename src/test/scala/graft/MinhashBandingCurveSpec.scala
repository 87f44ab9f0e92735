package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Measured quality curve of the MinHash banding used by q_dedup_minhash
  * (16-wide signature, 4 bands × 4 rows) — VERDICT r6 item 8: the
  * banding parameters become MEASURED quantities, not chosen constants.
  *
  * Theory: a pair with true shingle-Jaccard s becomes a candidate with
  * probability 1 − (1 − s⁴)⁴ — an S-curve with its knee near
  * s ≈ (1/4)^(1/4) ≈ 0.71. This spec builds a seeded corpus whose pairs
  * populate the whole Jaccard range (exact copies; edge edits ≈ 0.93;
  * interior edits stepping 0.8 → 0.65 → 0.5 → 0.3; heavy rewrites;
  * unrelated docs), pushes every doc through the REAL kernels
  * (VecOps.gramHashes 3-gram shingles → VecOps.minhashSig 16), bands
  * exactly like the query (4×4 prefix slices), and measures the
  * candidate rate per true-Jaccard bucket. Asserted:
  *
  *  - the curve is monotone (within sampling slack) across populated
  *    buckets — more similar never means less likely to candidate;
  *  - RECALL floors on the keep side of the knee: ≥0.9 at s ≥ 0.9,
  *    ≥0.7 at s ∈ [0.8, 0.9) (theory: 0.996 and ≈0.89);
  *  - FALSE-POSITIVE ceilings below the knee: ≤0.15 at s < 0.3,
  *    ≤0.03 at s < 0.1 (theory: ≤0.03 and ≈0);
  *  - overall candidate precision against the s ≥ 0.5 ground truth.
  */
class MinhashBandingCurveSpec extends AnyFunSuite {

  private val SigK = 16
  private val Bands = 4
  private val RowsPerBand = 4

  private def grams(tokens: IndexedSeq[String]): Set[Long] = {
    val ad = new GenericArrayData(
      tokens.map(t => UTF8String.fromString(t): AnyRef).toArray)
    graft.functions.VecOps.gramHashes(ad, 3).toLongArray().toSet
  }

  private def signature(gs: Set[Long]): IndexedSeq[Long] =
    graft.functions.VecOps
      .minhashSig(new GenericArrayData(gs.toArray.sorted), SigK)
      .toLongArray().toIndexedSeq

  private def isCandidate(a: IndexedSeq[Long], b: IndexedSeq[Long]): Boolean =
    (0 until Bands).exists { j =>
      a.slice(j * RowsPerBand, (j + 1) * RowsPerBand) ==
        b.slice(j * RowsPerBand, (j + 1) * RowsPerBand)
    }

  test("4x4 banding: monotone S-curve with recall floors and FP ceilings") {
    val rnd = new Random(20260813L)
    val L = 30
    def freshDoc(): IndexedSeq[String] =
      IndexedSeq.fill(L)(s"tok${rnd.nextInt(200000)}")
    def edited(doc: IndexedSeq[String], positions: Seq[Int]): IndexedSeq[String] =
      positions.foldLeft(doc)((d, p) => d.updated(p, s"alt${rnd.nextInt(200000)}"))
    // interior positions spaced ≥3 apart so each edit kills a full
    // 3-gram window and the nominal Jaccard levels actually separate
    def spaced(k: Int): Seq[Int] = (0 until k).map(i => 3 + i * 5)

    val groups: Seq[IndexedSeq[String] => IndexedSeq[String]] = Seq(
      identity, // exact copy → s = 1.0
      d => edited(d, Seq(0)), // edge edit → s ≈ 0.93
      d => edited(d, Seq(L - 1, 0)), // both edges → s ≈ 0.87
      d => edited(d, Seq(15)), // one interior → s ≈ 0.81
      d => edited(d, spaced(2)), // s ≈ 0.65
      d => edited(d, spaced(3)), // s ≈ 0.51
      d => edited(d, spaced(5)), // s ≈ 0.30
      d => edited(d, (0 until L by 3).toSeq), // heavy rewrite → s ≈ 0.05
      _ => freshDoc()) // unrelated → s ≈ 0

    val perGroup = 150
    val pairs = for {
      variant <- groups
      _ <- 1 to perGroup
    } yield {
      val a = freshDoc()
      val b = variant(a)
      val (ga, gb) = (grams(a), grams(b))
      val s = (ga intersect gb).size.toDouble / (ga union gb).size
      (s, isCandidate(signature(ga), signature(gb)))
    }

    def rate(sel: Seq[(Double, Boolean)]): Double =
      sel.count(_._2).toDouble / sel.size

    // bucket by MEASURED Jaccard, not nominal group level
    val buckets = pairs.groupBy { case (s, _) => math.min(9, (s * 10).toInt) }
    val curve = buckets.toSeq.sortBy(_._1)
      .map { case (b, ps) => (b, ps.size, rate(ps)) }
    info("bucket  n  candidate-rate")
    curve.foreach { case (b, n, r) =>
      info(f"[0.$b%d..) $n%4d  $r%.3f")
    }

    // monotone within sampling slack over populated buckets
    val populated = curve.filter(_._2 >= 25)
    populated.sliding(2).foreach {
      case Seq((bl, _, rl), (bh, _, rh)) =>
        assert(rh >= rl - 0.05,
          f"candidate rate fell from bucket $bl ($rl%.3f) to $bh ($rh%.3f)")
      case _ => ()
    }

    // recall floors above the knee
    val hi9 = pairs.filter(_._1 >= 0.9)
    val hi8 = pairs.filter(p => p._1 >= 0.8 && p._1 < 0.9)
    assert(hi9.size >= 100 && hi8.size >= 100, "high-similarity buckets underpopulated")
    assert(rate(hi9) >= 0.9, f"recall ${rate(hi9)}%.3f at s>=0.9")
    assert(rate(hi8) >= 0.7, f"recall ${rate(hi8)}%.3f at s in [0.8,0.9)")

    // false-positive ceilings below the knee
    val lo3 = pairs.filter(_._1 < 0.3)
    val lo1 = pairs.filter(_._1 < 0.1)
    assert(lo3.size >= 200 && lo1.size >= 100, "low-similarity buckets underpopulated")
    assert(rate(lo3) <= 0.15, f"FP rate ${rate(lo3)}%.3f at s<0.3")
    assert(rate(lo1) <= 0.03, f"FP rate ${rate(lo1)}%.3f at s<0.1")

    // precision of the produced candidate set against s >= 0.5 truth
    val candidates = pairs.filter(_._2)
    val precision = candidates.count(_._1 >= 0.5).toDouble / candidates.size
    info(f"candidates=${candidates.size} precision(s>=0.5)=$precision%.3f")
    assert(precision >= 0.85, f"candidate precision $precision%.3f")
  }
}
