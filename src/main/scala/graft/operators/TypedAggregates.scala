package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregates (SURVEY §2.2 "UDF/UDAF surface": the
  * reference's Reducer, /root/reference/src/Core/MapReduceC.hs:26, maps to
  * Aggregator[IN, BUF, OUT] when the reduction is a fold).
  *
  * Aggregators get Spark's partial+final aggregation automatically —
  * unlike the reference, whose reducers only ever run post-shuffle
  * (no combiners, /root/reference/src/Core/MapReduceC.hs:35-40).
  */
object TypedAggregates {

  /** Weighted unit price: sum(price quantized to 1e-4) / sum(qty).
    * Integer + integral-double sums keep the result bit-deterministic. */
  object WeightedUnitPrice extends Aggregator[(Long, Double), (Long, Double), Double] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), a: (Long, Double)): (Long, Double) =
      (b._1 + a._1, b._2 + a._2)
    override def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Long, Double)): Double =
      if (b._2 == 0.0) 0.0 else (b._1 / 10000.0) / b._2
    override def bufferEncoder: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k (id, value) rows by value DESC then id ASC — O(k)
    * state per group with partial+final merge, so per-group top-k gets
    * map-side combining instead of funneling whole groups through one
    * window task. The scale-safe replacement for
    * `row_number() OVER (PARTITION BY lowCardKey ...) <= k`. */
  final case class TopKByValueDesc(k: Int)
      extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
    require(k > 0, s"top-k needs k > 0, got $k")
    private def lt(a: (Long, Double), b: (Long, Double)): Boolean =
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
      if (s.size <= k) s else s.sortWith(lt).take(k)
    override def zero: Seq[(Long, Double)] = Vector.empty
    /** O(k) displace-the-worst insert (round-2 VERDICT item 5: the old
      * append+sort was O(k log k) per row once full). The buffer is an
      * UNORDERED k-subset between calls; finish/merge sort as needed. */
    override def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
      if (b.size < k) b :+ a
      else {
        var wi = 0
        var i = 1
        while (i < b.size) { if (lt(b(wi), b(i))) wi = i; i += 1 }
        if (lt(a, b(wi))) b.updated(wi, a) else b
      }
    override def merge(x: Seq[(Long, Double)], y: Seq[(Long, Double)]): Seq[(Long, Double)] =
      trim(x ++ y)
    override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] =
      b.sortWith(lt).take(k)
    override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /** Bounded k-smallest (id, value) pairs by value ASC then id ASC —
    * the deterministic-sampling shape (k smallest hashes per group) with
    * O(k) state and map-side combining; the skew-immune replacement for
    * `row_number() OVER (PARTITION BY group ORDER BY hash) <= k`. */
  final case class TopKPairsByValueAsc(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    require(k > 0, s"top-k needs k > 0, got $k")
    private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
      a._2 < b._2 || (a._2 == b._2 && a._1 < b._1)
    private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
      if (s.size <= k) s else s.sortWith(lt).take(k)
    override def zero: Seq[(Long, Long)] = Vector.empty
    /** O(k) displace-the-worst insert; buffer unordered between calls. */
    override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
      if (b.size < k) b :+ a
      else {
        var wi = 0
        var i = 1
        while (i < b.size) { if (lt(b(wi), b(i))) wi = i; i += 1 }
        if (lt(a, b(wi))) b.updated(wi, a) else b
      }
    override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
      trim(x ++ y)
    override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      b.sortWith(lt).take(k)
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Bounded top-k smallest (k, sorted ascending) over longs — a
    * TypedImperative-style bounded buffer: memory O(k) per group
    * regardless of group size, so it scales to arbitrarily hot keys. */
  final case class TopK(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 0, s"top-k needs k > 0, got $k")
    override def zero: Seq[Long] = Vector.empty
    private def trim(s: Seq[Long]): Seq[Long] =
      if (s.size <= k) s else s.sorted.take(k)
    /** O(k) displace-the-max insert; buffer unordered between calls. */
    override def reduce(b: Seq[Long], a: Long): Seq[Long] =
      if (b.size < k) b :+ a
      else {
        val wi = b.indices.maxBy(b)
        if (a < b(wi)) b.updated(wi, a) else b
      }
    override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = trim(x ++ y)
    override def finish(b: Seq[Long]): Seq[Long] = b.sorted.take(k)
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Element-wise QUANTIZED vector sum — the mergeable state behind
    * per-group embedding centroids (q_agg_vector_centroid): the buffer
    * is one Array[Long] of per-dimension 1e-4-unit sums plus a count,
    * reduced and merged element-wise, so Spark runs partial aggregation
    * MAP-SIDE and the shuffle carries dim longs per group per partition
    * — vs the explode formulation, which shuffles dim rows per INPUT
    * vector (64× more here). Quantization is VecOps.qround (DuckDB
    * round: half away from zero) per element BEFORE summing, so the
    * integer sums are merge-order-proof and the SQL oracle recomputes
    * them bit-identically. */
  final case class VectorSum(dim: Int)
      extends Aggregator[Seq[Float], (Array[Long], Long), (Seq[Long], Long)] {
    override def zero: (Array[Long], Long) = (new Array[Long](dim), 0L)
    override def reduce(b: (Array[Long], Long), v: Seq[Float]): (Array[Long], Long) = {
      var i = 0
      val n = math.min(dim, v.length)
      while (i < n) {
        b._1(i) += graft.functions.VecOps.qround(v(i).toDouble * 10000.0)
        i += 1
      }
      (b._1, b._2 + 1)
    }
    override def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) = {
      var i = 0
      while (i < dim) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
    override def finish(b: (Array[Long], Long)): (Seq[Long], Long) =
      (b._1.toSeq, b._2)
    override def bufferEncoder: Encoder[(Array[Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()
    override def outputEncoder: Encoder[(Seq[Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Long], Long)]()
  }

  /** Element-wise sum of ALREADY-quantized long vectors + count — the
    * mergeable centroid-update state for [[graft.operators.KMeansQuant]]
    * (VectorSum's sibling: no quantization inside the reduce, the input
    * is integer already, so the state is exact by construction). dim
    * longs + a count per (group, partition); partials combine map-side. */
  final case class LongVectorSum(dim: Int)
      extends Aggregator[Seq[Long], (Array[Long], Long), (Seq[Long], Long)] {
    override def zero: (Array[Long], Long) = (new Array[Long](dim), 0L)
    override def reduce(b: (Array[Long], Long), v: Seq[Long]): (Array[Long], Long) = {
      var i = 0
      val n = math.min(dim, v.length)
      while (i < n) {
        b._1(i) += v(i)
        i += 1
      }
      (b._1, b._2 + 1)
    }
    override def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) = {
      var i = 0
      while (i < dim) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
    override def finish(b: (Array[Long], Long)): (Seq[Long], Long) =
      (b._1.toSeq, b._2)
    override def bufferEncoder: Encoder[(Array[Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()
    override def outputEncoder: Encoder[(Seq[Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Long], Long)]()
  }
}
