package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization for vector search (q_vector_quantize) — the
  * memory-bandwidth lever production ANN systems apply before any index
  * structure: per-dimension symmetric scales map float32 vectors to small
  * integer codes (int8 at maxCode=127), and candidate scoring becomes an
  * exact INTEGER dot product. Two properties matter at 100 TB:
  *
  *  - bandwidth: 64 int8 codes are 4× smaller than 64 float32s — the
  *    scan-bound brute-force tier and the bucket-local scoring of the
  *    LSH/IVF tiers all stream candidates from memory, so score
  *    throughput tracks bytes/vector;
  *  - determinism: integer dots are associative — no float-summation-
  *    order divergence between partitionings, engines, or retries
  *    (the float path needs the ordered-fold discipline of
  *    PortableHash.dot to stay reproducible; integers don't).
  *
  * The quantized ranking is an approximation of the exact one; how good
  * an approximation is MEASURED, not assumed, in VectorQuantizeSpec
  * (recall@k vs exact ranking, monotone in code width).
  */
object VectorQuantize {

  /** One-row DataFrame holding `sv`: the per-dimension symmetric scale
    * array (max |x| over the corpus, 0-guarded so constant dimensions
    * quantize to 0 instead of dividing by zero). One map-side-combined
    * aggregation → dims counter rows → one array row; kilobytes at any
    * corpus size, broadcast to the encoder. */
  def scales(e: DataFrame, vecCol: String, dims: Int): DataFrame =
    e.select(explode(sequence(lit(1), lit(dims))).as("d"), col(vecCol))
      .select(col("d"),
        abs(element_at(col(vecCol), col("d")).cast("double")).as("a"))
      .groupBy("d").agg(max(col("a")).as("s"))
      .agg(sort_array(collect_list(struct(col("d"), col("s")))).as("ds"))
      .select(transform(col("ds"),
        x => when(x("s") === 0d, 1d).otherwise(x("s"))).as("sv"))

  /** Quantized codes: round(x_i · maxCode / sv_i) — a codegen'd per-row
    * projection; codes live in [-maxCode, maxCode]. `sv` is the scales
    * array column (from a broadcast of [[scales]]). */
  def encode(v: Column, sv: Column, dims: Int, maxCode: Int = 127): Column =
    transform(sequence(lit(1), lit(dims)), i =>
      round(element_at(v, i).cast("double") * maxCode / element_at(sv, i), 0)
        .cast("long"))

  /** Exact integer dot product of two code arrays — associative, so any
    * evaluation/merge order gives the identical score. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
}
