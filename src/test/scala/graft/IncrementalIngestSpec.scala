package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalIngest

/** Multi-round contract of the Store-backed incremental ingestion
  * (operators/IncrementalIngest; gated single-round by
  * q_ingest_incremental): fingerprints accepted in round N are REJECTED
  * as re-crawls in round N+1, rounds only ever append, and a round's
  * returned plan is stable under re-execution (the snapshot pin). */
class IncrementalIngestSpec extends AnyFunSuite with SparkSessionFixture {

  private def freshStore(): String = {
    val d = Files.createTempDirectory("graft_ingest").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def delta(rows: Seq[(Long, String, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "lang", "fp")
  }

  test("round N+1 rejects everything round N accepted; only new content lands") {
    val store = freshStore()
    // round 1: empty store — everything novel, in-delta dup collapses
    val r1 = IncrementalIngest.ingest(spark, store, 1L,
      delta(Seq((1L, "en", 100L), (2L, "de", 200L), (3L, "en", 100L))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(r1.toSeq === Seq((1L, "en", 100L), (2L, "de", 200L)))
    // round 2: re-crawls of 100/200 plus genuinely new 300
    val r2 = IncrementalIngest.ingest(spark, store, 2L,
      delta(Seq((10L, "fr", 100L), (11L, "en", 200L), (12L, "it", 300L))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(r2.toSeq === Seq((12L, "it", 300L)))
    // round 3: nothing new at all → empty accept, store still grows a batch
    val r3 = IncrementalIngest.ingest(spark, store, 3L,
      delta(Seq((20L, "en", 100L), (21L, "en", 300L))))
    assert(r3.count() === 0L)
    // the store accumulated exactly the three per-round batch dirs
    val batches = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(batches.toSeq === Seq("batch=1", "batch=2", "batch=3"))
  }

  test("a round's returned plan is stable under re-execution (snapshot pin)") {
    val store = freshStore()
    val accepted = IncrementalIngest.ingest(spark, store, 1L,
      delta(Seq((1L, "en", 100L), (2L, "de", 200L))))
    // the round already appended batch=1; re-executing the returned plan
    // must NOT see those fps as known (a recursive store read would)
    assert(accepted.count() === 2L)
    assert(accepted.count() === 2L)
    assert(accepted.orderBy("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  private def bandRows(rows: Seq[(Long, String, Seq[Long])]) = {
    val s = spark
    import s.implicits._
    (rows.map { case (id, lang, _) => (id, lang) }.toDF("doc_id", "lang"),
      rows.flatMap { case (id, _, bks) => bks.map(id -> _) }.toDF("doc_id", "bk"))
  }

  test("near-dup rounds: any doc_id-ordered decomposition equals one shot") {
    // 6 docs, hand-built band keys: 2 collides with 1, 4 with history-of-3
    // only transitively (3 rejected but its bands still poison), 5 clean
    val docs = Seq(
      (1L, "en", Seq(10L, 11L)),
      (2L, "de", Seq(11L, 12L)), // shares band 11 with doc 1 → rejected
      (3L, "fr", Seq(12L, 13L)), // shares band 12 with rejected doc 2 → rejected (all-seen)
      (4L, "it", Seq(13L, 14L)), // shares band 13 with rejected doc 3 → rejected
      (5L, "en", Seq(20L, 21L)), // clean → accepted
      (6L, "de", Seq(21L, 22L))) // shares band 21 with doc 5 → rejected
    def run(chunks: Seq[Seq[(Long, String, Seq[Long])]]): Seq[Long] = {
      val store = freshStore()
      chunks.zipWithIndex.flatMap { case (chunk, i) =>
        val (d, b) = bandRows(chunk)
        IncrementalIngest.ingestNearDup(spark, store, i + 1L, d, b)
          .collect().map(_.getLong(0)).toSeq
      }.sorted
    }
    val oneShot = run(Seq(docs))
    assert(oneShot == Seq(1L, 5L))
    assert(run(Seq(docs.take(2), docs.drop(2))) == oneShot)
    assert(run(Seq(docs.take(3), docs.slice(3, 5), docs.drop(5))) == oneShot)
    assert(run(docs.map(Seq(_))) == oneShot)
  }

  test("near-dup round plan: bk-keyed joins, no cartesian, two-phase " +
      "first-wins aggregate") {
    val store = freshStore()
    // seed a history batch so the snapshot probe join is in the plan
    val (d0, b0) = bandRows(Seq((1L, "en", Seq(10L, 11L))))
    IncrementalIngest.ingestNearDup(spark, store, 1L, d0, b0).collect()
    val (d, b) = bandRows(Seq((2L, "de", Seq(11L, 12L)), (3L, "fr", Seq(13L))))
    val accepted = IncrementalIngest.ingestNearDup(spark, store, 2L, d, b)
    val plan = accepted.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"near-dup round degenerated to all-pairs:\n$plan")
    assert(plan.contains("LeftSemi"), s"history probe is not a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"dropped filter is not an anti join:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"first-wins is not two-phase:\n$plan")
  }

  test("compaction: many small batches become few files with identical content") {
    val s = spark
    import s.implicits._
    val store = freshStore()
    // 6 batches x 4 files each of (k, v) rows
    for (b <- 0 until 6)
      (0L until 50L).map(i => (b * 100L + i, i * 3L)).toDF("k", "v")
        .repartition(4)
        .write.format("graft.sources.KvSinkProvider")
        .option("path", s"$store/batches/batch=$b").mode("append").save()
    def readAll(path: String, recursive: Boolean) = {
      val r = spark.read.format("graft.sources.KvSourceProvider")
        .option("path", path).option("schema", "k LONG, v LONG")
      (if (recursive) r.option("recursive", "true") else r).load()
    }
    readAll(s"$store/batches", recursive = true)
      .repartition(2)
      .write.format("graft.sources.KvSinkProvider")
      .option("path", s"$store/compacted").mode("append").save()
    // content identical as a multiset
    val before = readAll(s"$store/batches", recursive = true)
      .collect().map(_.toString).sorted.toSeq
    val after = readAll(s"$store/compacted", recursive = false)
      .collect().map(_.toString).sorted.toSeq
    assert(after === before)
    assert(after.size === 300)
    // ...but 24 committed files became 2, and staging stayed hidden
    val files = new java.io.File(s"$store/compacted").listFiles()
    assert(files.count(f => f.isFile && !f.getName.startsWith("_")) === 2)
  }
}
