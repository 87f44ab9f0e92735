package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral proof of the n-gram inverted-index document-frequency cap
  * (queries/Llm.scala NGRAM_DF_CAP): grams present in more than DF_CAP
  * documents of a (lang, source) bucket are excluded from the similarity
  * universe, so pairs whose ONLY overlap is a hot gram produce no
  * candidates — the property that bounds join fan-out at scale (df²
  * candidate pairs per gram). */
class NgramDfCapSpec extends AnyFunSuite with SparkSessionFixture {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ngramcap").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("pairs sharing only a hot gram (df > cap) are dropped; rare-gram pairs survive") {
    // Six docs all share the bigram "hot gram" (df=6 > cap=3) and nothing
    // else pairwise; docs 100/101 share the rare bigram "rare pair" (df=2).
    val hotDocs = (0L until 6L).map(i => i -> s"hot gram u${i}a u${i}b")
    val rareDocs = Seq(100L -> "rare pair x1 y1", 101L -> "rare pair x2 y2")
    val dir = writeDocs(hotDocs ++ rareDocs)

    val out = SparkEntry.queries("q_dedup_ngram")(spark, dir).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    // Without the cap, each of the C(6,2)=15 hot-doc pairs has
    // jaccard = 1/5 = 0.2 >= 0.08 and would appear. With it, none do.
    assert(pairs == Set((100L, 101L)),
      s"expected only the rare-gram pair, got ${pairs.toSeq.sorted.mkString(", ")}")
    // The surviving pair's jaccard is over the FILTERED universe:
    // |A∩B|=1 ("rare pair"), |A|=|B|=3 -> 1/5.
    val j = out.head.getDouble(out.head.fieldIndex("jaccard"))
    assert(math.abs(j - 0.2) < 1e-12)
  }

  test("spark.graft.sparse.dfCap pins an absolute cap for the TF-IDF cosine join") {
    // Six docs share one stopword-grade trigram; 100/101 share a rare one.
    // Token layout: every doc has >= 3 words so trigram terms exist.
    val hotDocs = (0L until 6L).map(i => i -> s"hot gram here u${i}a u${i}b")
    // identical texts: all trigram weights shared -> cosine 1.0, so the
    // pair survives the >= 0.5 score floor whenever its terms survive
    // the df cap
    val rareDocs = Seq(100L -> "rare pair term alpha beta",
      101L -> "rare pair term alpha beta")
    val dir = writeDocs(hotDocs ++ rareDocs)
    // default ABSOLUTE cap (100) keeps every term here (max df=6), but
    // the 0.5 cosine floor still kills the hot pairs (one shared
    // stopword-grade trigram vs two rare ones each): only the identical
    // rare pair scores under the default
    val dflt = SparkEntry.queries("q_sim_sparse")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dflt == Set((100L, 101L)),
      s"default absolute cap: expected the rare pair, got ${dflt.toSeq.sorted.mkString(", ")}")
    try {
      // absolute cap 3 admits the rare trigram (df=2) but not the hot
      // one (df=6): only the rare pair scores
      spark.conf.set("spark.graft.sparse.dfCap", "3")
      val got = SparkEntry.queries("q_sim_sparse")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((100L, 101L)),
        s"expected only the rare-term pair, got ${got.toSeq.sorted.mkString(", ")}")
      spark.conf.set("spark.graft.sparse.dfCap", "oops")
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("q_sim_sparse")(spark, dir).collect()
      }
      assert(e.getMessage.contains("spark.graft.sparse.dfCap"))
    } finally spark.conf.unset("spark.graft.sparse.dfCap")
  }

  test("spark.graft.ngram.dfCap raises the cap at runtime (advisor item: config path)") {
    val hotDocs = (0L until 6L).map(i => i -> s"hot gram u${i}a u${i}b")
    val dir = writeDocs(hotDocs)
    try {
      // cap above the hot gram's df=6: the 15 hot pairs reappear
      spark.conf.set("spark.graft.ngram.dfCap", "100")
      val relaxed = SparkEntry.queries("q_dedup_ngram")(spark, dir).collect()
      assert(relaxed.length === 15,
        s"expected C(6,2)=15 hot pairs with the cap raised, got ${relaxed.length}")
    } finally spark.conf.unset("spark.graft.ngram.dfCap")
    val strict = SparkEntry.queries("q_dedup_ngram")(spark, dir).collect()
    assert(strict.isEmpty, "default cap must drop the hot-gram-only pairs again")
  }
}
