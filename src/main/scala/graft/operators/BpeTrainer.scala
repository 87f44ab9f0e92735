package graft.operators

import scala.collection.mutable

/** PRODUCTION-SHAPED BPE training (r11 verdict item 6 — the round-count
  * scale dimension): real vocabularies need tens of thousands of merges,
  * and running each as a distributed round (q_bpe_train's formulation —
  * the right shape for DOZENS of merges, measured flat ×1..×10) would
  * pay 32k driver-coordinated corpus passes. Every production trainer
  * (Sennrich's subword-nmt, HF tokenizers, SentencePiece) splits the
  * work instead:
  *
  *   1. ONE distributed pass over the corpus aggregates `(word, freq)` —
  *      the only corpus-scale work, a plain group-by whose shuffle is
  *      bounded by the DISTINCT-word vocabulary, not corpus rows;
  *   2. the merge loop runs in memory over that vocabulary-bounded
  *      table with DELTA-maintained pair counts: a merge re-counts only
  *      the words that CONTAIN the merged pair (tracked by an
  *      occurrence index), so per-round cost is proportional to the
  *      affected words, not the vocabulary.
  *
  * Semantics are EXACTLY the gated q_bpe_train loop (and its DuckDB
  * recursive-CTE oracle): pair counts sum freq over every adjacent
  * symbol position (self-runs count overlapping positions), the round's
  * merge is the (count DESC, left ASC, right ASC) top pair, and
  * application is canonical leftmost-greedy non-overlapping — a single
  * left-to-right pass, which equals first-occurrence/restart because a
  * replacement can never create a new occurrence of the SAME pair to its
  * left (left+right == left is impossible). BpeTrainerSpec pins the
  * equivalence against the distributed loop; q_bpe_train_budget256 gates
  * the 256-budget run against the same chain oracle.
  *
  * Scale contract: driver state is the word-frequency vocabulary — the
  * same metadata-sized driver footprint as the k-means centroid set or
  * the BPE top-1 collect, NOT corpus rows. A 100 TB corpus has a
  * bounded distinct-word vocabulary (production trainers additionally
  * cap it by frequency; `maxVocab` is that knob). */
object BpeTrainer {

  final case class Merge(round: Int, left: String, right: String, cnt: Long)

  /** Train up to `budget` merges over `wordFreqs` (distinct words with
    * corpus frequencies). Stops early when no adjacent pair remains
    * (vocabulary closure — every word is one token). */
  def train(wordFreqs: Seq[(String, Long)], budget: Int,
      maxVocab: Int = Int.MaxValue): Seq[Merge] = {
    // symbol sequences, frequency-capped like production trainers.
    // CODE-POINT splits and ordering throughout: the distributed loop's
    // split(w, "") never cuts a surrogate pair, and UTF8String/DuckDB
    // compare by code point — Java's per-char split/< diverge on
    // supplementary-plane text
    def cpSplit(w: String): Array[String] =
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    val capped = wordFreqs.sortWith { case ((w1, f1), (w2, f2)) =>
      f1 > f2 || (f1 == f2 && graft.sources.KvEscape.cpCompare(w1, w2) < 0)
    }.take(maxVocab)
    val words: Array[Array[String]] = capped.map(p => cpSplit(p._1)).toArray
    val freqs: Array[Long] = capped.map(_._2).toArray

    // pair -> summed freq over every adjacent position; pair -> words
    // containing it (the delta index: a merge touches only these)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def add(wi: Int): Unit = {
      val syms = words(wi); val f = freqs(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
        occ.getOrElseUpdate(p, mutable.Set.empty) += wi
        i += 1
      }
    }
    def remove(wi: Int): Unit = {
      val syms = words(wi); val f = freqs(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val c = counts(p) - f
        if (c == 0L) { counts.remove(p); occ.remove(p) }
        else { counts(p) = c; occ(p) -= wi }
        i += 1
      }
    }
    words.indices.foreach(add)

    // canonical leftmost-greedy non-overlapping application (== the
    // graft_bpe_merge restart-scan kernel on the delimited string)
    def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += l + r; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }

    val merges = Seq.newBuilder[Merge]
    var round = 1
    while (round <= budget && counts.nonEmpty) {
      // (count DESC, l ASC, r ASC) — the oracle chain's exact tie-break;
      // the scan is pair-vocabulary-bounded. Symbol order is CODE-POINT
      // order (cpCompare), matching Spark's UTF8String and the DuckDB
      // oracle — Java String.< is UTF-16 code-unit order, which diverges
      // on supplementary-plane symbols.
      var best: (String, String) = null
      var bestC = Long.MinValue
      counts.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && {
          val l = graft.sources.KvEscape.cpCompare(p._1, best._1)
          l < 0 || (l == 0 && graft.sources.KvEscape.cpCompare(p._2, best._2) < 0)
        })) {
          best = p; bestC = c
        }
      }
      merges += Merge(round, best._1, best._2, bestC)
      // delta update: only words containing the pair change
      val affected = occ(best).toArray.sorted
      affected.foreach { wi =>
        remove(wi)
        words(wi) = applyMerge(words(wi), best._1, best._2)
        add(wi)
      }
      round += 1
    }
    merges.result()
  }
}
