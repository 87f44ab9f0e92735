package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparseSimilarity

/** Recall-vs-df-cap curve for the sparse TF-IDF cosine join — the
  * measurement behind q_sim_sparse's ABSOLUTE cap default: tightening
  * the cap bounds postings fan-out (≤ cap² pair rows per term) at the
  * cost of dropping pairs whose only strong overlap is a capped term.
  * Ground truth is the UNCAPPED run on the same corpus; recall at cap c
  * = |pairs(c) ∩ truth| / |truth| over the ≥0.5-cosine pair set.
  *
  * Note the subtlety that makes this a curve worth measuring: the cap
  * changes WEIGHTS too (dropping hot terms removes mass from both dot
  * products and norms), so capped runs can both lose true pairs and
  * surface new ones — recall is measured against truth, monotonicity is
  * asserted on the true-positive count. */
class SparseRecallSpec extends AnyFunSuite with SparkSessionFixture {

  private val dir = "/root/testdata/sf0.001"

  private def pairs(dfCap: Long, nDocs: Long): Set[(Long, Long)] = {
    val docs = graft.core.Graft.table(spark, dir, "documents")
      .select("doc_id", "text")
    SparseSimilarity.cosinePairs(docs, nDocs, dfCap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("recall floors vs absolute df-cap on the sf0.001 corpus") {
    val nDocs = graft.core.Graft.table(spark, dir, "documents").count()
    val truth = pairs(nDocs, nDocs) // cap = N: nothing filtered
    assert(truth.nonEmpty, "degenerate fixture: no ≥0.5-cosine pairs")
    val caps = Seq(1L, 2L, 3L, 5L, 25L, nDocs)
    val curve = caps.map { c =>
      val got = pairs(c, nDocs)
      val tp = (got & truth).size
      val recall = tp.toDouble / truth.size
      info(f"dfCap=$c%3d pairs=${got.size}%4d truePos=$tp%4d recall=$recall%.3f")
      c -> (tp, recall)
    }
    // cap >= N is exactly the uncapped truth
    assert(curve.last._2._2 == 1.0)
    // true-positive count never decreases as the cap loosens
    curve.sliding(2).foreach { case Seq((c1, (tp1, _)), (c2, (tp2, _))) =>
      assert(tp1 <= tp2, s"recall not monotone: cap $c1 -> $tp1, cap $c2 -> $tp2")
    }
    val recallAt = curve.toMap
    // cap=1 degenerates (a shared term has df >= 2, so no pair can score)
    assert(recallAt(1L)._1 == 0, "cap=1 must kill every shared term")
    // floors: near-dup pairs overlap on many RARE trigrams, so recall
    // recovers as soon as df-2 terms survive, and the production-grade
    // caps keep the full high-cosine set on this corpus
    assert(recallAt(2L)._2 >= 0.6, s"cap=2 recall ${recallAt(2L)._2}")
    assert(recallAt(5L)._2 >= 0.95, s"cap=5 recall ${recallAt(5L)._2}")
    assert(recallAt(25L)._2 == 1.0, s"cap=25 recall ${recallAt(25L)._2}")
  }
}
