package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.KvCommitLog

/** Store-committed COUNT-BASED text models — the TRAIN ONCE / SCORE MANY
  * lifecycle for the multinomial-Naive-Bayes family, the model-artifact
  * twin of [[AnnIndex]]'s versioned index generations (same protocol as
  * the reference's store-backed-pipeline stance, src/Core/Store.hs:41-119):
  * at 100 TB a classifier is trained once over the corpus, committed, and
  * then scores thousands of batches/streams without ever re-touching the
  * training documents.
  *
  * What makes a count model the PERFECT store artifact is that its
  * sufficient statistics are MERGEABLE: per-(class, word) token counts
  * and per-class totals sum exactly, so
  *   - incremental training ([[appendDelta]]) is lossless by construction —
  *     a model trained on A then extended with B scores bit-identically
  *     to one trained on A ∪ B (the gate proves this, not just a spec);
  *   - scoring merges member tables with ONE model-sized group-by — the
  *     corpus is never re-read.
  *
  * Commit protocol (shared with [[AnnIndex]] / the Kv sink): stage the
  * member directory fully, append the commit-log manifest LAST — a crash
  * mid-build leaves an invisible orphan, never a readable half-model.
  * Each manifest names its version's COMPLETE member set (a fit publishes
  * `[gen-N]`; a delta publishes the previous members plus `delta-M`), so
  * older versions stay frozen and `asOf` scoring time-travels exactly.
  *
  * Layout per member (r17): ONE table, `counts` (cls, w, cwc) — the
  * (class, word) token counts plus one MARKER row per (class, document)
  * with `w = NULL` (split never yields null elements, so no real token
  * can collide), whose cwc is the class's doc count. Folding the old
  * separate `classes` table into markers makes staging a SINGLE corpus
  * pass/job; the per-class totals (totc = Σ cwc over real words,
  * ndocs = the marker's cwc) are derived from the merged counts at
  * score time — model-table-sized work. The smoothing scalars
  * (vocabulary size V, training-doc count) are likewise derived at
  * score time, which is what keeps delta merging exact — a stored V
  * would go stale the moment a delta adds unseen words.
  *
  * All scoring arithmetic is the repo's exact-integer bitlen surprisal
  * (see q_classify_nb): both engines — and any member partitioning —
  * produce bit-identical class rankings.
  */
object ModelStore {

  private def genName(v: Int) = s"gen-$v"
  private def deltaName(v: Int) = s"delta-$v"

  /** Latest committed model version, 0 when none. */
  def latestVersion(dir: String): Int =
    KvCommitLog.latestVersion(Paths.get(dir))

  /** Test-only chaos hook: runs after a member directory is fully staged
    * and before its manifest commits — the crash window the manifest-last
    * protocol must make invisible. */
  @volatile var chaosHook: () => Unit = () => ()

  private def stage(docs: DataFrame, labelCol: String, textCol: String,
      dir: String, member: String): Unit = {
    // ONE corpus pass, ONE job (r17; was three jobs — an isEmpty probe
    // plus two separate tokenize actions, one per member table): every
    // doc's tokens flow through a single (cls, w) aggregation together
    // with one per-doc MARKER row (w = NULL — split never yields null
    // elements, so no real token can collide with it; a NULL text
    // contributes just its marker), written as the member's single
    // `counts` table. Per-class totals are derived at score time (see
    // [[score]]). The empty-batch rejection reads the staged parquet
    // FOOTERS on the driver (zero Spark jobs; every doc yields >=1 row —
    // its marker — so rows > 0 iff docs > 0) and runs BEFORE the
    // manifest commit: an empty staged member is an invisible orphan,
    // removed here, never readable. Tokenization is the gated queries'
    // convention (lowercased, single-space split).
    val tok = docs.select(col(labelCol).as("cls"),
      explode(concat(
        coalesce(split(lower(col(textCol)), " "),
          array().cast("array<string>")),
        array(lit(null).cast("string")))).as("w"))
    tok.groupBy("cls", "w").agg(count(lit(1)).as("cwc"))
      .write.mode("overwrite").parquet(s"$dir/$member/counts")
    if (AnnIndex.stagedRowCount(docs.sparkSession,
        s"$dir/$member/counts") == 0L) {
      rmTreeLocal(Paths.get(s"$dir/$member"))
      throw new IllegalArgumentException(
        s"refusing to stage an EMPTY batch as model member $member at " +
          s"$dir — empty members would break every subsequent score")
    }
  }

  private def rmTreeLocal(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(c => rmTreeLocal(c)) finally s.close()
    }
    Files.deleteIfExists(p): Unit
  }

  /** Unique dot-hidden staging name: invisible to [[membersAt]] (only
    * manifests name members) and collision-free across concurrent
    * writers, so no two trainers ever write into the same directory. */
  private def stagingName(): String =
    s".staging-${System.nanoTime}-${Thread.currentThread.getId}"

  /** Train on `docs` and commit a NEW model generation (manifest names
    * only it — a retrain, not an extension). Returns the version. */
  def train(docs: DataFrame, labelCol: String, textCol: String,
      dir: String): Int = {
    val base = Paths.get(dir)
    Files.createDirectories(base)
    val staged = stagingName()
    stage(docs, labelCol, textCol, dir, staged)
    chaosHook()
    KvCommitLog.commitMember(base, staged, genName,
      (_, name) => Seq(name))
  }

  /** Extend the committed model with `docs`' statistics: stages a delta
    * member and commits a manifest naming the previous members PLUS the
    * delta. Lossless by count mergeability — scoring against the result
    * is bit-identical to a one-shot train over the union. The training
    * documents already absorbed into the model are never re-read. */
  def appendDelta(docs: DataFrame, labelCol: String, textCol: String,
      dir: String): Int = {
    membersAt(dir, None) // fail fast: a delta needs a committed model
    val base = Paths.get(dir)
    val staged = stagingName()
    stage(docs, labelCol, textCol, dir, staged)
    chaosHook()
    // OCC rebase: on a lost race the manifest is recomputed from the
    // winner's member set, so a concurrent delta's statistics are folded
    // in rather than lost (count-mergeability makes any interleaving
    // score-identical to the sequential order)
    KvCommitLog.commitMember(base, staged, deltaName,
      (_, name) => membersAt(dir, None) :+ name)
  }

  /** COMPACT the committed member set into one generation: merge the
    * member statistics — the SAME (cls, w) / cls group-by sums that
    * [[score]] performs on every read — once at write time, and commit
    * a manifest naming only the merged member. Lossless by count
    * mergeability (the merge is associative, so merging early vs at
    * read time is the same arithmetic); every later score then unions
    * ONE member instead of N. Older versions keep their frozen member
    * sets (`asOf`). Returns the committed version. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String): Int = {
    // pin the snapshot: members AT base, so the CAS below can reject a
    // commit that lands between this read and the manifest publish
    val base0 = latestVersion(dir)
    val members = membersAt(dir, Some(base0))
    val staged = stagingName()
    // one merged table, one job: the marker rows (w = NULL) sum like any
    // other (cls, w) group, so the compacted member carries exactly the
    // statistics the member set did
    members.map(m => graft.core.Graft.cachedSchemaParquet(spark, s"$dir/$m/counts"))
      .reduce(_ unionAll _)
      .groupBy("cls", "w").agg(sum(col("cwc")).as("cwc"))
      .write.mode("overwrite").parquet(s"$dir/$staged/counts")
    chaosHook()
    // CAS at base0+1: the merged member was derived from the snapshot
    // at base0 — a concurrent commit supersedes it, so abort + rerun
    KvCommitLog.commitMember(Paths.get(dir), staged, genName,
      (_, name) => Seq(name), expectedBase = Some(base0))
  }

  /** Member directories named by the version's manifest (public for
    * specs measuring read amplification). */
  def members(dir: String, asOf: Option[Int] = None): Seq[String] =
    membersAt(dir, asOf)

  /** Reclaim history: drop versions below `keepFrom` and delete member
    * directories only they referenced. Returns the deleted names. */
  def vacuum(dir: String, keepFrom: Int): Seq[String] =
    KvCommitLog.vacuum(Paths.get(dir), keepFrom)

  /** Member directories of the committed model at `asOf` (default
    * latest). */
  private def membersAt(dir: String, asOf: Option[Int]): Seq[String] = {
    val vs = KvCommitLog.versions(Paths.get(dir))
    require(vs.nonEmpty, s"no committed model at $dir " +
      "(an uncommitted member directory is not a model)")
    val latest = vs.last._1
    val v = asOf.getOrElse(latest)
    require(v >= 1 && v <= latest,
      s"model version $v out of committed range [1, $latest] at $dir")
    val manifest = vs.find(_._1 == v).getOrElse(
      throw new IllegalStateException(s"model manifest $v missing at $dir"))._2
    val entries = Files.readAllLines(manifest)
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
    require(entries.nonEmpty, s"model manifest $v at $dir is empty")
    entries
  }

  /** Score `test` against the committed model (latest or `asOf`):
    * argmin-bits multinomial NB over the MERGED member statistics.
    * Returns (idCol, pred_cls, total_bits), one row per test document.
    *
    * Plan shape: member counts union + one (cls, w) group-by (shuffle =
    * distinct model keys, never the corpus), smoothing scalars derived
    * from the model tables and broadcast as the K-row class frame, the
    * test token stream joined on the (cls, w) KEY — the model is never
    * broadcast and the TRAINING documents are never scanned (spec-pinned:
    * the score plan's file scans read only the model dir + test input). */
  def score(test: DataFrame, idCol: String, textCol: String, dir: String,
      asOf: Option[Int] = None): DataFrame = {
    val spark = test.sparkSession
    val members = membersAt(dir, asOf)
    // merged member statistics: real (cls, w) rows feed the token join;
    // per-class totals come from the same merged table (totc = Σ cwc
    // over real words ≡ tokens per class, ndocs = the w-NULL marker's
    // cwc ≡ docs per class; classes with no tokens or a NULL label are
    // dropped, exactly as the old token-side ⋈ doc-side inner join did)
    val cnt0 = members.map(m => graft.core.Graft.cachedSchemaParquet(spark, s"$dir/$m/counts"))
      .reduce(_ unionAll _)
      .groupBy("cls", "w").agg(sum(col("cwc")).as("cwc"))
    val cnt = cnt0.filter(col("w").isNotNull)
    val clsTab = cnt0.groupBy("cls").agg(
        sum(when(col("w").isNotNull, col("cwc")).otherwise(0L)).as("totc"),
        sum(when(col("w").isNull, col("cwc")).otherwise(0L)).as("ndocs"))
      .filter(col("cls").isNotNull && col("totc") > 0L)
    val classes = clsTab
      .crossJoin(cnt.select("w").distinct().agg(count(lit(1)).as("v")))
      .crossJoin(clsTab.agg(sum(col("ndocs")).as("ntr")))
    val teTok = test.select(col(idCol),
      explode(split(lower(col(textCol)), " ")).as("w"))
    val scored = teTok.crossJoin(broadcast(classes))
      .join(cnt, Seq("cls", "w"), "left")
      .withColumn("bits",
        (length(bin(col("totc") + col("v"))) -
          length(bin(coalesce(col("cwc"), lit(0L)) + 1))).cast("long"))
    val perClass = scored
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("bits")).as("tok_bits"),
        (max(length(bin(col("ntr")))) - max(length(bin(col("ndocs")))))
          .cast("long").as("prior_bits"))
      .withColumn("total_bits", col("tok_bits") + col("prior_bits"))
    val wr = Window.partitionBy(col(idCol))
      .orderBy(col("total_bits"), col("cls"))
    perClass.withColumn("rk", row_number().over(wr))
      .filter(col("rk") === 1)
      .select(col(idCol), col("cls").as("pred_cls"), col("total_bits"))
  }
}
