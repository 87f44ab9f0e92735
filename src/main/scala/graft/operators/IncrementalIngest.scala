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
  def ingest(
      spark: SparkSession, store: String, batchId: Long,
      delta: DataFrame): DataFrame = {
    val snapshot = Option(new File(store).listFiles())
      .getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getAbsolutePath).sorted
    val known = snapshot.map { d =>
      spark.read.format("graft.sources.KvSourceProvider")
        .option("path", d).option("schema", "fp LONG").load()
    }.reduceOption(_ unionAll _)
    val novel = known.fold(delta)(k => delta.join(k, Seq("fp"), "left_anti"))
    val accepted = novel.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("lang"), col("doc_id")).as("lang"))
    accepted.select(col("fp"))
      .write.format("graft.sources.KvSinkProvider")
      .option("path", s"$store/batch=$batchId").mode("append").save()
    accepted.select(col("doc_id"), col("lang"), col("fp"))
  }
}
