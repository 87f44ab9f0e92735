package graft.pipeline

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.col

/** Typed pipeline compat API — the reference's user surface
  * (`Mapper`/`Reducer`/`:>`, /root/reference/src/Core/MapReduceC.hs:24-44)
  * re-expressed as composable Dataset transformations.
  *
  * Correspondence:
  *   - reference `Mapper k1 v1 k2 v2 = (k1,v1) -> [(k2,v2)]`  → [[Pipeline.mapper]]
  *     lowered to `ds.flatMap` (whole-partition `concatMap`, exactly the
  *     reference's `toM` lift at MapReduceC.hs:31-33).
  *   - reference `Reducer k v1 v2 = k -> [v1] -> [v2]` (multi-output!) →
  *     [[Pipeline.reducer]] lowered to `groupByKey(_._1).flatMapGroups` —
  *     the only faithful mapping, since SQL agg can't emit 0..n rows per key.
  *   - GADT `:>` composition → method chaining; the output type of each
  *     stage is the input type of the next, checked by scalac like the
  *     reference's `Serializable2 k2 v2 =>` constraint chain.
  *   - the hash-shuffle between stages (Partition.hs:53-57) is implicit in
  *     `groupByKey`; [[Pipeline.repartitionByKey]] exposes it explicitly.
  *
  * Each pipeline also carries its own naive evaluator ([[Pipeline.runLocal]])
  * — the analog of the reference's `naiveEvaluator` (MapReduceC.hs:65-74),
  * used as the differential-test oracle exactly like test/Generator.hs:83-92.
  *
  * Unlike the reference (no combiners, full materialization between stages,
  * MapReduceC.hs:35-40), consecutive mappers here fuse into one Spark stage
  * and Catalyst/Tungsten handle execution; only reducer boundaries shuffle.
  *
  * Value order within a key is unspecified — in the reference it depends on
  * shuffle arrival order (`fromListWith (++)` reverses encounter order,
  * Util.hs:21-22), in Spark on partitioning. Reducers must therefore be
  * insensitive to value order, and result comparison sorts, exactly as the
  * reference's own tests do (test/Generator.hs:86-87).
  */
final class Pipeline[K1, V1, K2, V2] private (
    val length: Int,
    private val runDs: Dataset[(K1, V1)] => Dataset[(K2, V2)],
    private val local: Seq[(K1, V1)] => Seq[(K2, V2)]) {

  /** Append a flatMap stage: one record in, 0..n records out. */
  def mapper[K3, V3](f: ((K2, V2)) => IterableOnce[(K3, V3)])(
      implicit enc: Encoder[(K3, V3)]): Pipeline[K1, V1, K3, V3] =
    new Pipeline(length + 1,
      ds => runDs(ds).flatMap(f),
      xs => local(xs).flatMap(f(_).iterator))

  /** Append a per-key reducer stage emitting 0..n values per key. */
  def reducer[V3](f: (K2, Seq[V2]) => Seq[V3])(
      implicit enc: Encoder[(K2, V3)], kenc: Encoder[K2]): Pipeline[K1, V1, K2, V3] =
    new Pipeline(length + 1,
      ds => runDs(ds).groupByKey(_._1)
        .flatMapGroups((k, it) => f(k, it.map(_._2).toSeq).iterator.map((k, _))),
      xs => {
        // Stable grouping in first-encounter key order; value order is
        // contractually irrelevant (see class doc).
        val ys = local(xs)
        val keys = ys.map(_._1).distinct
        keys.flatMap(k => f(k, ys.collect { case (`k`, v) => v }).map((k, _)))
      })

  /** Append an associative-commutative combine stage: one value per key,
    * folded MAP-SIDE before the shuffle — the combiner the reference's
    * surface lacks (its reducers only ever run post-shuffle,
    * MapReduceC.hs:35-40, so every value crosses the network). Lowered to
    * `groupByKey.reduceGroups`, which Spark plans as a typed aggregation
    * with partial merge: the shuffle carries one pre-folded value per
    * (partition, key) instead of every record. `f` must be associative
    * and commutative; the naive evaluator folds in encounter order, so
    * the ScalaCheck distributed-vs-naive differential flags an `f` that
    * isn't (order then differs run-to-run). */
  def combiner(f: (V2, V2) => V2)(
      implicit enc: Encoder[(K2, V2)], kenc: Encoder[K2]): Pipeline[K1, V1, K2, V2] =
    new Pipeline(length + 1,
      ds => runDs(ds).groupByKey(_._1)
        .reduceGroups((a, b) => (a._1, f(a._2, b._2)))
        .map(_._2),
      xs => {
        val ys = local(xs)
        val keys = ys.map(_._1).distinct
        keys.map(k => k -> ys.collect { case (`k`, v) => v }.reduce(f))
      })

  /** Explicit hash repartition on the key — the reference's
    * between-stage shuffle (Partition.hs:53-57) surfaced as an operator.
    * Local semantics: identity (partitioning is not observable). */
  def repartitionByKey(n: Int): Pipeline[K1, V1, K2, V2] =
    new Pipeline(length,
      ds => {
        val d = runDs(ds)
        d.repartition(n, col(d.columns.head))
      },
      local)

  /** Run distributed on Spark. */
  def run(input: Seq[(K1, V1)])(implicit spark: SparkSession,
      enc: Encoder[(K1, V1)]): Seq[(K2, V2)] =
    runDs(spark.createDataset(input)).collect().toSeq

  /** Run on an existing Dataset (for large / file-backed inputs). */
  def apply(ds: Dataset[(K1, V1)]): Dataset[(K2, V2)] = runDs(ds)

  /** The naive single-threaded evaluator — the semantic oracle. */
  def runLocal(input: Seq[(K1, V1)]): Seq[(K2, V2)] = local(input)
}

object Pipeline {

  /** The identity pipeline — the reference's `MrOut` terminator. */
  def apply[K, V](): Pipeline[K, V, K, V] =
    new Pipeline(0, identity, identity)

  /** Start a pipeline with a mapper stage. */
  def mapper[K1, V1, K2, V2](f: ((K1, V1)) => IterableOnce[(K2, V2)])(
      implicit enc: Encoder[(K2, V2)]): Pipeline[K1, V1, K2, V2] =
    Pipeline[K1, V1]().mapper(f)

  /** Start a pipeline with a reducer stage. */
  def reducer[K, V1, V2](f: (K, Seq[V1]) => Seq[V2])(
      implicit enc: Encoder[(K, V2)], kenc: Encoder[K]): Pipeline[K, V1, K, V2] =
    Pipeline[K, V1]().reducer(f)
}

/** The reference's canonical pipeline (Impl.hs:30-44): run-length char
  * counts → +1 → per-key sum. Shared by the golden test and the
  * q_pipeline_wordcount registry query. */
object WordCount {

  /** mapper (Impl.hs:30-31): run-length encode the value's characters. */
  def runLength(kv: (String, String)): Seq[(String, Int)] = {
    val runs = Seq.newBuilder[(String, Int)]
    var i = 0
    val v = kv._2
    while (i < v.length) {
      var j = i
      while (j < v.length && v(j) == v(i)) j += 1
      runs += ((v(i).toString, j - i))
      i = j
    }
    runs.result()
  }

  /** mapperAdd1 (Impl.hs:33-34). */
  def add1(kv: (String, Int)): Seq[(String, Int)] = Seq((kv._1, kv._2 + 1))

  /** reducer (Impl.hs:36-37): per-key sum, single output. */
  def sumValues(k: String, vs: Seq[Int]): Seq[Int] = Seq(vs.sum)

  def pipeline(spark: SparkSession): Pipeline[String, String, String, Int] = {
    import spark.implicits._
    Pipeline.mapper(runLength).mapper(add1).reducer(sumValues)
  }

  val sampleInput: Seq[(String, String)] = Seq(("", "hello"))

  /** FIXTURES.md §A expected output. */
  val expected: Seq[(String, Int)] =
    Seq(("e", 2), ("h", 2), ("l", 3), ("o", 2))
}
