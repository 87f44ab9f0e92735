package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic range-salted prefix sums over skewed partition keys.
  *
  * A running sum (or row numbering — a running sum of 1) partitioned by a
  * LOW-CARDINALITY key puts each key's entire row set through one window
  * task at any scale. This helper stitches it from parallel pieces with
  * NO sampling (a RangePartitioner's sampled bounds would not be a pure
  * function of the data):
  *
  *   1. each key's [min, max] order-column bounds come from one tiny
  *      aggregation, broadcast back;
  *   2. the RANGE salt b = ((ord - min) · nb) div (max - min + 1) splits
  *      the key's rows into `nb` ORDER-PRESERVING buckets — every row of
  *      bucket i precedes every row of bucket i+1, which is what makes
  *      per-bucket results stitchable (hash salting would interleave);
  *   3. exclusive prefix sums run per (key, bucket) in parallel; bucket
  *      totals (a ≤ keys·nb row table) are lifted by a running offset and
  *      broadcast-joined back.
  *
  * Assumes the order column is roughly uniform within each key's range
  * (true of synthetic ids); a skewed ORDER domain would need
  * quantile-derived bucket bounds — same stitching, different salt.
  */
object SaltedPrefix {

  /** Adds `start_off` = the exclusive prefix sum of `value` within
    * `partCol` ordered by `orderCol` (0 for each key's first row).
    * `row_number` = start_off + 1 when `value` is `lit(1L)`. The order
    * column must be numeric and unique within a key. */
  def exclusivePrefixSum(
      df: DataFrame, partCol: String, orderCol: String,
      value: Column, nb: Int = 16): DataFrame = {
    val bounds = df.groupBy(partCol)
      .agg(min(orderCol).as("__mn"), max(orderCol).as("__mx"))
    val b = df.join(broadcast(bounds), partCol)
      .withColumn("__bkt",
        expr(s"(($orderCol - __mn) * $nb) div (__mx - __mn + 1)").cast("int"))
    val wLocal = Window.partitionBy(col(partCol), col("__bkt"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = b.withColumn("__v", value)
      .withColumn("__local_off", coalesce(sum(col("__v")).over(wLocal), lit(0L)))
    val totals = local.groupBy(partCol, "__bkt").agg(sum("__v").as("__t"))
    val wOff = Window.partitionBy(col(partCol)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = totals
      .withColumn("__off", coalesce(sum("__t").over(wOff), lit(0L)))
      .select(partCol, "__bkt", "__off")
    local.join(broadcast(offs), Seq(partCol, "__bkt"))
      .withColumn("start_off", col("__off") + col("__local_off"))
      .drop("__mn", "__mx", "__v", "__local_off", "__off", "__bkt")
  }
}
