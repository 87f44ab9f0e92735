package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level ZONE MAPS — the manifest-pruning layer every lakehouse
  * table format (Delta/Iceberg/Hudi) puts between the catalog and the
  * scan, reproduced over plain parquet directories: a metadata-sized
  * per-file (min, max) manifest on a layout key, consulted at PLAN time
  * so a selective range predicate opens only the files whose key range
  * intersects it. Parquet row-group stats already prune WITHIN a file
  * (measured in ZOrderLayoutSpec); this prunes the file LIST itself —
  * at 100 TB that is the difference between listing/opening 100k
  * footers and opening the dozen whose zones can match.
  *
  * Reference tie-in: the Store keys partition files by
  * (space, writerId, partitionId, taskId) and readers enumerate exactly
  * the partition files a task needs (/root/reference/src/Core/Store.hs:56-83)
  * — the same select-files-by-metadata-before-reading discipline, here
  * driven by data statistics instead of task identity.
  *
  * Scale notes: the manifest is ONE row per file — the driver-side
  * collect is the manifest read every lakehouse driver does at planning
  * time, bounded by file count, never by data. Building it is a single
  * distributed aggregation keyed by `input_file_name()`; in a real table
  * format it would be written once at layout time and incrementally
  * maintained, not recomputed (the recompute here doubles as an
  * integrity check of the written layout).
  */
object ZoneMaps {

  /** Range-partitioned, key-sorted layout write: nFiles range shards,
    * rows sorted by key inside each — file zones are disjoint, so a
    * range predicate intersects the minimum possible file set (and
    * row-group stats inside each file stay selective too). */
  def writeLayout(df: DataFrame, keyCol: String, nFiles: Int, root: String): Unit =
    df.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(root)

  /** Per-file (path, min, max) manifest over a long layout key. */
  def manifest(spark: SparkSession, root: String, keyCol: String): Array[(String, Long, Long)] =
    spark.read.parquet(root)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

  /** TARGETED DELETE (the right-to-be-forgotten maintenance pass): drop
    * every row with `keyCol BETWEEN lo AND hi` from a zone-mapped layout
    * by rewriting ONLY the files whose zones intersect the forget range —
    * the other files are never opened, let alone rewritten. Survivor rows
    * from the hit files are written to `patchDir`; the post-delete view
    * is (untouched files ∪ patch). This is the copy-on-write DELETE every
    * lakehouse format implements; at 100 TB a clustered forget set (one
    * user's records, contiguous under the layout key) touches a handful
    * of files out of 100k — the manifest makes the delete cost
    * proportional to the DELETED data, not the table.
    *
    * ONE-SHOT / VIEW-ONLY CONTRACT: the hit files stay physically in
    * `root` (copy-on-write — no table format here to carry a tombstone
    * manifest), so ONLY the returned view reflects the delete. Reading
    * `root` directly, calling manifest() on it, or running a SECOND
    * targetedDelete against the same root resurrects the forgotten rows.
    * Callers that need a durable delete must replace the hit files with
    * the patch (or re-run writeLayout on the view); the production path
    * for repeated maintenance passes is a real table format's commit log
    * (the same ownership rule, with the manifest made durable).
    *
    * A forget range intersecting no zone is a legitimate no-op for an
    * idempotent right-to-be-forgotten pass: returns (total, 0, unchanged
    * view of root) instead of throwing.
    *
    * Returns (filesTotal, filesRewritten, postDeleteView) so callers and
    * specs can assert the rewrite really was partial. */
  def targetedDelete(
      spark: SparkSession, root: String, keyCol: String,
      lo: Long, hi: Long, patchDir: String): (Int, Int, DataFrame) = {
    val zones = manifest(spark, root, keyCol)
    val (hit, untouched) =
      zones.partition { case (_, zlo, zhi) => zlo <= hi && zhi >= lo }
    if (hit.isEmpty) return (zones.length, 0, spark.read.parquet(root))
    spark.read.parquet(hit.map(_._1): _*)
      .filter(!col(keyCol).between(lo, hi))
      .write.mode("overwrite").parquet(patchDir)
    val view =
      if (untouched.isEmpty) spark.read.parquet(patchDir)
      else spark.read.parquet(untouched.map(_._1) :+ patchDir: _*)
    (zones.length, hit.length, view)
  }

  /** Pruned read of `keyCol BETWEEN lo AND hi`: consult the manifest,
    * open only intersecting files, keep the residual filter on top (zone
    * intersection is necessary, not sufficient — exactly the lakehouse
    * contract). Returns (filesTotal, filesRead, rows) so callers — and
    * ZoneMapSpec — can assert pruning actually happened. */
  def prunedRead(
      spark: SparkSession, root: String, keyCol: String,
      lo: Long, hi: Long): (Int, Int, DataFrame) = {
    val zones = manifest(spark, root, keyCol)
    val hit = zones.filter { case (_, zlo, zhi) => zlo <= hi && zhi >= lo }
    require(hit.nonEmpty,
      s"zone-map pruning selected no files for [$lo, $hi] — empty-range " +
        "reads should short-circuit at the planner, not reach the scan")
    val df = spark.read.parquet(hit.map(_._1): _*)
      .filter(col(keyCol).between(lo, hi))
    (zones.length, hit.length, df)
  }
}
