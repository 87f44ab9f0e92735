package graft.operators

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus ingestion through the kv Store (the continuously-
  * crawled-corpus pattern behind q_ingest_incremental): known-content
  * fingerprints accumulate in per-batch Store directories; each delta is
  * deduplicated against the SNAPSHOT of batches committed before it,
  * then within itself, and its accepted fingerprints are appended as the
  * next batch.
  *
  * Snapshot discipline: the known-set read pins the batch directories
  * that exist WHEN THE ROUND STARTS. A recursive read of the whole store
  * root would re-list lazily at execution time and see the very batch
  * this round appends — anti-joining the delta against its own output
  * (observed: evaluates empty). Pinning the paths makes the round's
  * result stable however many times the returned plan re-executes.
  *
  * Scale shape: one 64-bit fingerprint per known document; the
  * delta⟂store anti-join hash-partitions both sides on the fingerprint
  * (history is the BIG side at 100 TB — never broadcast); in-delta
  * dedup is a fingerprint group-by with map-side partials; the append
  * rides the sink's two-phase commit, so a crashed round publishes
  * nothing and re-runs cleanly.
  */
object IncrementalIngest {

  /** Runs one ingestion round over `delta` (columns: doc_id, lang, fp).
    * Reads every committed `batch=*` under `store`, appends accepted
    * fingerprints as `batch=$batchId`, and returns the accepted rows
    * (doc_id, lang, fp) — first occurrence per fingerprint. */
  /** `txn`: an idempotency id recorded in the batch directory's commit
    * log — a replayed round's append publishes nothing twice, WITHOUT
    * wiping (the Delta `txn` discipline; see KvCommitLog). The snapshot
    * read is bounded to batches strictly BELOW `batchId`, so a replay
    * that already appended its own fingerprints still recomputes the
    * same accepted set (its own batch is not "history" to itself). */
  def ingest(
      spark: SparkSession, store: String, batchId: Long,
      delta: DataFrame, txn: Option[String] = None): DataFrame = {
    val snapshot = earlierBatches(store, batchId)
    val known = snapshot.map { d =>
      spark.read.format("graft.sources.KvSourceProvider")
        .option("path", d).option("schema", "fp LONG").load()
    }.reduceOption(_ unionAll _)
    val novel = known.fold(delta)(k => delta.join(k, Seq("fp"), "left_anti"))
    val accepted = novel.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("lang"), col("doc_id")).as("lang"))
    val w = accepted.select(col("fp"))
      .write.format("graft.sources.KvSinkProvider")
      .option("path", s"$store/batch=$batchId")
    txn.fold(w)(t => w.option("txnId", t)).mode("append").save()
    accepted.select(col("doc_id"), col("lang"), col("fp"))
  }

  /** Committed batch directories strictly below `batchId`, sorted — the
    * history a round dedups against. Bounding (instead of "every dir
    * present") is what makes a crash-replayed round deterministic: its
    * own possibly-already-committed append is excluded. */
  private def earlierBatches(store: String, batchId: Long): Seq[String] =
    Option(new File(store).listFiles())
      .getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && f.getName.startsWith("batch=") &&
        f.getName.stripPrefix("batch=").toLong < batchId)
      .map(_.getAbsolutePath).sorted.toSeq

  /** 4 LSH band keys from a 16-wide minhash signature, each one long:
    * band j's key is the portable fold h → (h·131 + v) mod P over its 4
    * signature values, seeded with j (so equal value-runs in different
    * bands cannot collide). DuckDB twin: [[bandKeysSql]]. */
  def bandKeys(sg: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(3)), j =>
      aggregate(slice(sg, j * lit(4) + lit(1), lit(4)), j.cast("long"),
        (h, v) => (h * lit(131L) + v) % lit(PortableHash.P)))

  def bandKeysSql(sg: String): String =
    s"""list_transform(generate_series(0, 3), j ->
       |  list_reduce(list_prepend(CAST(j AS BIGINT), $sg[j*4+1:j*4+4]),
       |    (h, v) -> (h * 131 + v) % ${PortableHash.P}))""".stripMargin

  /** NEAR-dup ingestion round — [[ingest]]'s MinHash sibling (the
    * continuously-crawled-corpus near-duplicate filter): the history
    * accumulates LSH BAND KEYS instead of exact fingerprints, and a
    * delta document is rejected when ANY of its band keys was already
    * seen — by the committed history snapshot or by a smaller-doc_id
    * document of the same delta. ALL of the delta's band keys are
    * appended (the all-seen contract: rejected documents still poison
    * their bands), which is what makes multi-round sequencing composable
    * — when deltas arrive in doc_id order, any round decomposition
    * yields exactly the one-shot result ("seen earlier" ≡ "smaller
    * doc_id or history"), so the live foreachBatch twin and the batch
    * gate share one oracle.
    *
    * Scale shape mirrors [[ingest]]: 4 band longs per document, the
    * history⟂delta probe is a bk-keyed LEFT SEMI that hash-partitions
    * both sides (history is the big side — never broadcast), in-delta
    * first-wins is a bk group-by with map-side partials, and the append
    * rides the sink's two-phase commit. */
  def ingestNearDup(
      spark: SparkSession, store: String, batchId: Long,
      deltaDocs: DataFrame, deltaBands: DataFrame,
      txn: Option[String] = None): DataFrame = {
    val snapshot = earlierBatches(store, batchId)
    val known = snapshot.map { d =>
      spark.read.format("graft.sources.KvSourceProvider")
        .option("path", d).option("schema", "bk LONG").load()
    }.reduceOption(_ unionAll _)
    val histDrop = known.map(k =>
      deltaBands.join(k, Seq("bk"), "left_semi").select("doc_id"))
    val first = deltaBands.groupBy(col("bk"))
      .agg(min(col("doc_id")).as("first_doc"))
    val inDeltaDrop = deltaBands.join(first, "bk")
      .filter(col("doc_id") > col("first_doc")).select("doc_id")
    val dropped = histDrop.fold(inDeltaDrop)(_ unionAll inDeltaDrop).distinct()
    val w = deltaBands.select(col("bk")).distinct()
      .write.format("graft.sources.KvSinkProvider")
      .option("path", s"$store/batch=$batchId")
    txn.fold(w)(t => w.option("txnId", t)).mode("append").save()
    deltaDocs.join(dropped, Seq("doc_id"), "left_anti")
  }
}
