package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.EventU

/** Stream-vs-batch differential tests (SURVEY §7.4): each streaming
  * operator, fed the bounded sf0.001 events through a MemoryStream in
  * several micro-batches, must converge to exactly the rows its batch
  * twin produces on the same data — the same discipline as the
  * reference's distributed-vs-naive property (test/Generator.hs:83-92),
  * with the batch engine as the oracle.
  */
object StreamingSpec {
  /** Typed document row for the streaming-cleaning differential. */
  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
}

class StreamingSpec extends AnyFunSuite with SparkSessionFixture {
  import StreamingSpec.Doc

  private lazy val eventsBatch: DataFrame =
    graft.core.Graft.table(spark, "/root/testdata/sf0.001", "events")

  private lazy val typedRows: Seq[EventU] = {
    val ds = EventStreams.toTyped(eventsBatch)
    ds.collect().toSeq
  }

  /** Run a unified transform over a MemoryStream fed in `nChunks`
    * micro-batches; return the final result via the memory sink. */
  private def runStream(
      transform: DataFrame => DataFrame,
      mode: String,
      name: String,
      nChunks: Int = 3): DataFrame = {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventU]
    val streamingDf = mem.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))
    val q = transform(streamingDf).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try {
      typedRows.grouped(math.max(1, typedRows.size / nChunks)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("tumbling window: streaming(complete) == batch") {
    val got = runStream(EventStreams.tumbling, "complete", "t_tumbling")
    val exp = EventStreams.tumbling(eventsBatch)
    assert(sortedRows(got) == sortedRows(exp))
  }

  test("sliding window: streaming(complete) == batch") {
    val got = runStream(EventStreams.sliding, "complete", "t_sliding")
    val exp = EventStreams.sliding(eventsBatch)
    assert(sortedRows(got) == sortedRows(exp))
  }

  test("session window: streaming(complete) == batch") {
    val got = runStream(EventStreams.sessions, "complete", "t_sessions")
    val exp = EventStreams.sessions(eventsBatch)
    assert(sortedRows(got) == sortedRows(exp))
  }

  test("flatMapGroupsWithState: final update per user == batch stats") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventU]
    val q = EventStreams.userStats(mem.toDS()).toDF().writeStream
      .format("memory").queryName("t_stateful").outputMode("update").start()
    try {
      typedRows.grouped(math.max(1, typedRows.size / 3)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    // update mode emits one row per user per micro-batch that touched the
    // user; the LAST emission per user is the converged state.
    val got = spark.table("t_stateful")
      .withColumn("emit_seq", monotonically_increasing_id())
      .groupBy(col("user_id")).agg(max_by(struct(col("*")), col("emit_seq")).as("s"))
      .select(col("s.user_id"), col("s.n"), col("s.first_us"), col("s.last_us"),
        col("s.n_purchase"), col("s.value4"))
    val exp = EventStreams.userStats(EventStreams.toTyped(eventsBatch)).toDF()
    assert(sortedRows(got) == sortedRows(exp))
  }

  test("transformWithState: final update per user == batch ledger (RocksDB state)") {
    // transformWithState's streaming execution requires the RocksDB
    // state store provider (typed state variables are column-family
    // backed); batch execution — the oracle-gated twin — needs none.
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[EventU]
      val q = EventStreams.userLedger(mem.toDS()).toDF().writeStream
        .format("memory").queryName("t_tws").outputMode("update").start()
      try {
        typedRows.grouped(math.max(1, typedRows.size / 3)).foreach { chunk =>
          mem.addData(chunk)
          q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table("t_tws")
        .withColumn("emit_seq", monotonically_increasing_id())
        .groupBy(col("user_id")).agg(max_by(struct(col("*")), col("emit_seq")).as("l"))
        .select(col("l.user_id"), col("l.n"), col("l.n_types"),
          col("l.top_type"), col("l.value4"))
      val exp = EventStreams.userLedger(EventStreams.toTyped(eventsBatch)).toDF()
      assert(sortedRows(got) == sortedRows(exp))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState event-time timers: sessions close exactly once after watermark passage") {
    // The timer half of the TWS API: an inactivity sessionizer whose
    // closed-session emission is DRIVEN by the watermark passing
    // last-event + gap. Differential against a local collections oracle
    // (the reference's naive-evaluator discipline): whatever the
    // micro-batch boundaries, the closed sessions must equal the
    // single-pass gaps-and-islands sessionization of the same rows.
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rows = typedRows.filter(_.user_id % 40 == 0).sortBy(_.ts_us)
      assert(rows.nonEmpty)
      val gapMin = 120
      val mem = MemoryStream[EventU]
      val streamed = mem.toDF()
        .withColumn("tsl", timestamp_micros(col("ts_us")))
        .withWatermark("tsl", "0 seconds")
        .select(col("event_id"), col("tsl"), col("user_id"),
          col("event_type"), col("value"))
        .as[EventStreams.EventT]
      val q = EventStreams.sessionTimeouts(streamed, gapMin).toDF().writeStream
        .format("memory").queryName("t_tws_timer").outputMode("append").start()
      try {
        rows.grouped(math.max(1, rows.size / 5)).foreach { chunk =>
          mem.addData(chunk)
          q.processAllAvailable()
        }
        // two far-future sentinel batches for a reserved user: the first
        // advances the watermark past every open session's timeout (the
        // watermark a batch USES comes from the previous batch's data),
        // the second gives the engine a batch in which those timers fire
        val far = rows.last.ts_us + 365L * 24 * 3600 * 1000000L
        (1 to 2).foreach { i =>
          mem.addData(Seq(EventU(-i.toLong, far + i, -1L, "noop", 0.0)))
          q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table("t_tws_timer").filter(col("user_id") =!= -1L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sorted
      // local collections oracle: same gap rule (new session at >= gap)
      val gapUs = gapMin * 60L * 1000000L
      val exp = rows.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        val ts = es.sortBy(_.ts_us)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
        var start = ts.head.ts_us; var last = ts.head.ts_us
        var n = 1L; var v4 = math.round(ts.head.value * 10000L)
        ts.tail.foreach { e =>
          if (e.ts_us - last >= gapUs) {
            out += ((u, start, last + gapUs, n, v4))
            start = e.ts_us; last = e.ts_us; n = 1L
            v4 = math.round(e.value * 10000L)
          } else {
            last = e.ts_us; n += 1L; v4 += math.round(e.value * 10000L)
          }
        }
        out += ((u, start, last + gapUs, n, v4))
        out
      }.sorted
      assert(got == exp)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream-static enrichment join: complete == batch broadcast join + agg") {
    // The static dim is an ordinary batch DataFrame captured by the
    // unified transform; streaming re-resolves (re-broadcasts) it per
    // micro-batch, so the converged aggregation must equal the batch run.
    val dim = eventsBatch.select(col("user_id")).distinct()
      .withColumn("tier", (col("user_id") % 3).cast("long"))
    val streamed = runStream(EventStreams.enrichAgg(_, dim), "complete", "enrich_sink")
    val batch = EventStreams.enrichAgg(eventsBatch, dim)
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("stream-stream interval join: append == batch interval join") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // feed in event-time order so the 1-hour watermark never drops rows
    // the batch twin would keep (a time-ordered source, the normal case)
    val ordered = typedRows.sortBy(_.ts_us)
    val mem = MemoryStream[EventU]
    val streamingDf = mem.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))
    val q = EventStreams.purchaseSignupJoin(streamingDf).writeStream
      .format("memory").queryName("t_join").outputMode("append").start()
    try {
      ordered.grouped(math.max(1, ordered.size / 3)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("t_join")
    val exp = EventStreams.purchaseSignupJoin(eventsBatch)
    assert(sortedRows(got) == sortedRows(exp))
  }

  test("file streaming source: parquet directory drip-fed == batch") {
    // the production-shaped source: a directory that accumulates parquet
    // drops; each drop becomes a micro-batch via readStream
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val schema = eventsBatch.schema
    val q = EventStreams.tumbling(
        spark.readStream.schema(schema).parquet(dir))
      .writeStream.format("memory").queryName("t_filesrc")
      .outputMode("complete").start()
    try {
      val parts = eventsBatch.randomSplit(Array(1.0, 1.0, 1.0), seed = 7)
      parts.zipWithIndex.foreach { case (chunk, i) =>
        // the source watches the root for FILES: stage each drop, then
        // move its part-file in (the usual atomic-landing pattern)
        val tmp = java.nio.file.Files.createTempDirectory(s"graft_drop$i").toString
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(dir, s"drop_$i.parquet"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("t_filesrc")
    val exp = EventStreams.tumbling(eventsBatch)
    assert(sortedRows(got) == sortedRows(exp))
  }

  test("streaming dedup: dropDuplicates key set == batch distinct") {
    // append mode: each distinct key is emitted exactly once, when first
    // seen — the accumulated sink table IS the distinct set.
    val got = runStream(
      df => df.select(col("user_id"), col("event_type")).dropDuplicates(),
      "append", "t_dedup")
    val exp = eventsBatch.select(col("user_id"), col("event_type")).distinct()
    assert(sortedRows(got) == sortedRows(exp))
  }

  test("unified dedupEvents: replayed micro-batch removed, streaming == batch twin") {
    // q_stream_dedup's live half: the SAME EventStreams.dedupEvents runs
    // on a MemoryStream with a replayed chunk (an at-least-once upstream
    // re-delivering recent events) and must equal the batch twin on the
    // identical duplicated input. The replay picks only events within the
    // 2h delay of the max event time, so their keys are still in state —
    // the regime where within-watermark dedup guarantees exactness.
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ordered = typedRows.sortBy(_.ts_us)
    val maxUs = ordered.last.ts_us
    val replay = ordered.filter(_.ts_us >= maxUs - 2L * 3600 * 1000000)
    assert(replay.nonEmpty, "fixture has no events in the final 2h window")
    val mem = MemoryStream[EventU]
    val streamingDf = mem.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))
      .drop("ts_us")
    val q = EventStreams.dedupEvents(streamingDf).writeStream
      .format("memory").queryName("t_dedup_unified")
      .outputMode("append").start()
    try {
      ordered.grouped(math.max(1, ordered.size / 3)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      mem.addData(replay) // the duplicate delivery
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_dedup_unified")
    val batchInput = eventsBatch.unionAll(
      eventsBatch.filter(col("ts") >= timestamp_micros(lit(maxUs - 2L * 3600 * 1000000))))
    val exp = EventStreams.dedupEvents(batchInput)
    assert(got.count() === eventsBatch.count(), "a replayed event leaked through")
    assert(sortedRows(got.select("event_id")) == sortedRows(exp.select("event_id")))
  }

  test("streaming corpus cleaning: quality gate + exact dedup == batch keeper set") {
    // The front half of q_llm_clean_pipeline as an INCREMENTAL job: new
    // documents stream in, the quality gate filters, dropDuplicates on
    // the content hash admits each content exactly once (first arrival).
    // Fed in doc_id order, first-arrival == the batch min-doc_id keeper,
    // so the accumulated append sink must equal the batch keeper set —
    // corpus ingestion as a continuous pipeline rather than a re-run.
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsBatch = graft.core.Graft
      .table(spark, "/root/testdata/sf0.001", "documents")
    // duplicate injection (as in q_dedup_exact) so dedup has work to do
    val dup = docsBatch.orderBy("doc_id").limit(50)
      .withColumn("doc_id", col("doc_id") + 100000)
    val corpus = docsBatch.unionByName(dup)
    val rows = corpus.selectExpr("doc_id", "text", "lang", "source", "n_chars")
      .as[Doc].collect().sortBy(_.doc_id)

    def clean(df: org.apache.spark.sql.DataFrame) = {
      val toks = split(lower(col("text")), " ")
      val meanLen = aggregate(transform(toks, t => length(t).cast("long")),
        lit(0L), (a, x) => a + x).cast("double") / size(toks)
      df.withColumn("n_tokens", size(toks).cast("long"))
        .withColumn("mean_token_len", meanLen)
        .filter(col("n_tokens") >= 5 && col("n_tokens") <= 10000 &&
          col("mean_token_len") >= 2.0 && col("mean_token_len") <= 12.0)
        .withColumn("content_hash", md5(col("text")))
    }

    val mem = MemoryStream[Doc]
    val q = clean(mem.toDF())
      .dropDuplicates("content_hash")
      .select("doc_id")
      .writeStream.format("memory").queryName("t_clean_stream")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 4)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val wDup = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash")).orderBy(col("doc_id"))
    val expected = clean(corpus)
      .withColumn("rn", row_number().over(wDup))
      .filter(col("rn") === 1)
      .select("doc_id")
    val got = spark.table("t_clean_stream")
    assert(sortedRows(got) == sortedRows(expected))
    // and the injected duplicates were all rejected
    assert(got.filter(col("doc_id") >= 100000).count() === 0)
  }

  test("bounded-state streaming dedup: dropDuplicatesWithinWatermark == batch distinct") {
    // Plain streaming dropDuplicates keeps EVERY seen key in state forever
    // — unbounded at the 100 TB design point. The within-watermark variant
    // evicts keys once the watermark passes them, trading completeness for
    // bounded state: duplicates are only guaranteed caught while their key
    // is younger than the delay. The events span fits inside the delay
    // here (and arrival is time-ordered), so the stream must STILL equal
    // batch distinct exactly — state bounding may not change the answer
    // when its precondition holds.
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ordered = typedRows.sortBy(_.ts_us)
    val mem = MemoryStream[EventU]
    val streamingDf = mem.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp"))
    val q = streamingDf
      .withWatermark("ts", "365 days")
      .select(col("user_id"), col("event_type"), col("ts"))
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type")
      .writeStream.format("memory").queryName("t_dedup_wm")
      .outputMode("append").start()
    try {
      ordered.grouped(math.max(1, ordered.size / 3)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("t_dedup_wm")
    val exp = eventsBatch.select(col("user_id"), col("event_type")).distinct()
    assert(sortedRows(got) == sortedRows(exp))
  }
}
