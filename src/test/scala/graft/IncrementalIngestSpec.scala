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
}
