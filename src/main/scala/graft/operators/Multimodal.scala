package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.3 "Multimodal columns").
  *
  * Media items travel as opaque `binary` payloads with a typed metadata
  * struct — the schema a 100 TB image/audio/video corpus would use (the
  * payload column stays un-decoded through shuffles; Parquet stores it as
  * BYTE_ARRAY with dictionary off). Decode / feature-extraction runs as a
  * BATCHED per-partition operator: one decoder instance per partition, an
  * iterator-to-iterator transform with no per-row setup — the Scala
  * equivalent of a Pandas-UDF `mapInPandas` pipeline stage.
  *
  * The actual byte→pixels decode is STUBBED with a deterministic fake
  * (this container ships no image/audio libs); everything around it —
  * schema, encoders, partition batching, feature shape — is real and
  * tested (MultimodalSpec).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      kind: String,            // "image" | "audio" | "video"
      payload: Array[Byte],    // opaque encoded bytes
      source: String,
      n_bytes: Long)

  /** Extracted features: fixed-shape per kind, plus a tiny embedding. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      embedding: Array[Float])

  /** Build a MediaItem dataset from the documents table — text bytes
    * standing in for encoded media, kind assigned deterministically. */
  def fromDocuments(documents: DataFrame): Dataset[MediaItem] = {
    import documents.sparkSession.implicits._
    documents
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaItem]
  }

  /** STUB decoder — a real implementation would decode `payload` with an
    * image/audio codec here. Deterministic in the payload bytes so tests
    * and reruns agree. One call per item, but construction-heavy decoder
    * state would live at partition scope (see decodeFeatures). */
  private[operators] def decodeStub(item: MediaItem): MediaFeatures = {
    var h = 0L
    var i = 0
    while (i < item.payload.length) {
      h = (h * 131 + (item.payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    val emb = new Array[Float](8)
    var j = 0
    while (j < 8) {
      emb(j) = (((h >> j) % 97L).toFloat) / 97.0f
      j += 1
    }
    MediaFeatures(
      item.media_id, item.kind,
      width = (h % 640L).toInt + 1,
      height = ((h * 7L) % 480L).toInt + 1,
      n_frames = if (item.kind == "video") (h % 30L).toInt + 2 else 1,
      embedding = emb)
  }

  /** Batched per-partition decode: iterator-in/iterator-out so Spark
    * pipelines it with adjacent narrow stages; the decoder (here: nothing,
    * in real life: codec contexts, model sessions) is initialized once per
    * partition, NOT per row. */
  def decodeFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition decoder setup would go here (expensive, once)
      it.map(decodeStub)
    }
  }

  /** Resize to fit a bounding box, aspect preserved — exact integer
    * arithmetic (floor of w·s, s = min bound ratio), so any engine/rerun
    * produces identical dims. A real pipeline would carry the resampled
    * payload too; the dimension contract is what downstream batching
    * (fixed tensor shapes) depends on. */
  def resize(feats: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.map { f =>
      if (f.width <= maxW && f.height <= maxH) f
      else {
        // scale = min(maxW/w, maxH/h) as exact rationals: pick the axis
        // with the smaller ratio via cross-multiplication, floor the other
        val wLimits = maxW.toLong * f.height <= maxH.toLong * f.width
        val (nw, nh) =
          if (wLimits) (maxW, math.max(1L, maxW.toLong * f.height / f.width).toInt)
          else (math.max(1L, maxH.toLong * f.width / f.height).toInt, maxH)
        f.copy(width = nw, height = nh)
      }
    }
  }

  final case class FrameSample(media_id: Long, kind: String, frame_idx: Int)

  /** Frame sampling: every `every`-th frame index per item (frame 0
    * always included) — the 1→n flatMap shape of a video curation
    * pipeline; images/audio contribute their single frame 0. */
  def frameSample(feats: Dataset[MediaFeatures], every: Int): Dataset[FrameSample] = {
    import feats.sparkSession.implicits._
    feats.flatMap(f =>
      (0 until f.n_frames by every).map(FrameSample(f.media_id, f.kind, _)))
  }
}
