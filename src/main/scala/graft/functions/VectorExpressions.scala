package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-row vector/text kernels of the
  * LLM-pipeline operators (SURVEY §2.3). Each replaces a composed
  * higher-order-function formulation (see `operators/PortableHash`) whose
  * lambdas Spark evaluates interpretively, with ONE codegen'd call into a
  * tight JVM loop — the same design tier as [[CharHashExpression]].
  *
  * Oracle parity: every kernel is integer arithmetic or an ordered IEEE
  * fold, bit-identical to the DuckDB SQL twins in PortableHash. Quantized
  * rounding uses [[VecOps.qround]] — round-half-away-from-zero evaluated
  * directly on the binary double, exactly DuckDB's `round()` (std::round)
  * semantics (verified: 0.49999999999999994 → 0, ±0.5 → ±1).
  *
  * Scale note: all are per-row projections inside whole-stage codegen —
  * no shuffle, no UDF serialization boundary, trivially data-parallel at
  * any corpus size.
  */
object VecOps {

  val P = 1000000007L

  /** DuckDB round(x)::BIGINT: half away from zero on the binary value.
    * Exact for |x| < 2^53: a - floor(a) is exactly representable, so the
    * 0.5 comparison is exact. */
  def qround(x: Double): Long = {
    val a = math.abs(x)
    val f = math.floor(a)
    val r = f.toLong + (if (a - f >= 0.5) 1L else 0L)
    if (x < 0) -r else r
  }

  /** Σ_i qround(a(i)·b(i)·mult) over float vectors — quantized dot
    * product (order-free integer sum). */
  def quantDot(a: ArrayData, b: ArrayData, mult: Double): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += qround(a.getFloat(i).toDouble * b.getFloat(i).toDouble * mult)
      i += 1
    }
    s
  }

  /** Exact integer squared L2 between two quantized (long) vectors —
    * the k-means assignment kernel ([[graft.operators.KMeansQuant]]).
    * Coordinates are 1e-6 longs, so diff² ≤ ~4·10¹² and a 64-dim sum
    * stays far inside int64. */
  def l2Quant(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  /** array<float> → array<long>: qround(x·mult) per element — the
    * one-pass coordinate quantizer (DuckDB-round semantics). */
  def quantizeVec(v: ArrayData, mult: Double): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = qround(v.getFloat(i).toDouble * mult)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** array<float> → array<long>: qround(x/‖v‖·mult) per element — the
    * SPHERICAL (normalized) coordinate quantizer in one pass. The norm is
    * the ordered left fold Σx², same op sequence as [[cosine]]'s
    * accumulators / PortableHash.dot ≡ DuckDB list_reduce, computed ONCE
    * per row; the composed Column form it replaces
    * (transform(v, x -> round(x / sqrt(aggregate(zip_with(v,v,·*·))) …)))
    * re-evaluated the interpreted dot-fold lambda for EVERY ELEMENT —
    * O(dim²) interpreted expression evals per row, measured at ~2 s per
    * assignment pass over 2000×64-dim rows (the whole ANN gate floor). */
  def quantizeVecNorm(v: ArrayData, mult: Double): ArrayData = {
    val n = v.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      dot += x * x
      i += 1
    }
    val nrm = math.sqrt(dot)
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      out(i) = qround(v.getFloat(i).toDouble / nrm * mult)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Elementwise difference of two quantized (long) vectors — the
    * residual kernel for residual-encoded product quantization
    * (r = qv − coarse centroid). min-length semantics like [[l2Quant]]. */
  def vecSub(a: ArrayData, b: ArrayData): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = a.getLong(i) - b.getLong(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** cosine = dot/(|a||b|), each dot an ordered left fold in double —
    * the same op sequence as DuckDB's list_reduce, so bit-identical. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** One BPE merge pass over a space-delimited symbol string
    * (s = " sym sym … "): replace the FIRST occurrence of " l r " with
    * " lr " and RESTART the scan, until no occurrence remains. Because
    * the replacement restores both boundary spaces, restart-scan is
    * exactly canonical leftmost-greedy non-overlapping merge — including
    * back-to-back pairs ("a b a b" → "ab ab") and self-runs
    * ("a a a a" → "aa aa"), which single-pass replace() gets wrong (it
    * consumes the shared delimiter and skips the adjacent match). The
    * DuckDB twin is a recursive CTE doing the identical
    * first-occurrence/restart step (see queries/Bpe). */
  def bpeMerge(s: UTF8String, l: UTF8String, r: UTF8String): UTF8String = {
    val ls = l.toString
    val rs = r.toString
    val pat = " " + ls + " " + rs + " "
    val rep = " " + ls + rs + " "
    val src = s.toString
    var pos = src.indexOf(pat)
    if (pos < 0) return s
    if (ls.indexOf(' ') >= 0 || rs.indexOf(' ') >= 0) {
      // Degenerate space-containing "symbols" (never produced by the
      // tokenizer, but reachable through the public kernel): keep the
      // literal restart-from-0 semantics — the single-pass resume proof
      // below relies on space-free l/r.
      var cur = src
      while (pos >= 0) {
        cur = cur.substring(0, pos) + rep + cur.substring(pos + pat.length)
        pos = cur.indexOf(pat)
      }
      return UTF8String.fromString(cur)
    }
    // Space-free l/r: a replacement deletes one interior space and keeps
    // both boundary spaces, so no new occurrence can START before the
    // replacement's trailing space — and that space is the same ' ' char
    // as src's (pat and rep both end with it), so the scan can continue
    // over SRC from copied-1 instead of restarting over the rebuilt
    // string. Back-to-back matches share exactly that boundary space
    // ("a b a b", "a a a a"): pos == copied-1 then, and rep's leading
    // space was already emitted as the previous rep's trailing space.
    val sb = new java.lang.StringBuilder(src.length)
    var copied = 0
    while (pos >= 0) {
      if (pos >= copied) sb.append(src, copied, pos).append(rep)
      else sb.append(rep, 1, rep.length)
      copied = pos + pat.length
      pos = src.indexOf(pat, copied - 1)
    }
    sb.append(src, copied, src.length)
    UTF8String.fromString(sb.toString)
  }

  /** Apply an ENTIRE merge table in one kernel call: merges in priority
    * order, each with the canonical leftmost-greedy restart-scan pass of
    * [[bpeMerge]]. One expression eval per row replaces one stacked
    * projection per merge — at production merge counts (32k) the
    * difference between 1 and 32k codegen stages over the corpus (r11
    * verdict item 6). `ls`/`rs` carry the table's left/right symbols
    * positionally. */
  def bpeMergeAll(s: UTF8String, ls: ArrayData, rs: ArrayData): UTF8String = {
    val n = math.min(ls.numElements(), rs.numElements())
    var cur = s
    var i = 0
    while (i < n) {
      cur = bpeMerge(cur, ls.getUTF8String(i), rs.getUTF8String(i))
      i += 1
    }
    cur
  }

  /** Deterministic hyperplane component — PortableHash.hyperplane. */
  def hyperplane(j: Int, i: Int): Long =
    (1315423911L * (j + 1) + 2654435761L * (i + 1)) % 1000003L - 501501L

  /** Sign-of-quantized-dot LSH bucket over nPlanes hyperplanes —
    * PortableHash.lshBucket as one loop. */
  def lshBucket(v: ArrayData, nPlanes: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      var s = 0L
      var i = 0
      while (i < n) {
        s += qround(hyperplane(j, i).toDouble * v.getFloat(i).toDouble * 1e6)
        i += 1
      }
      if (s > 0) bucket += (1L << j)
      j += 1
    }
    bucket
  }

  /** 32-bit SimHash over a token array: per-token rolling charHash, ±1
    * per bit position, sign-aggregated. Integer sums → order-free. */
  def simHash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val sums = new Array[Long](32)
    var i = 0
    while (i < n) {
      val h = CharHashExpression.hash(tokens.getUTF8String(i).toString)
      var j = 0
      while (j < 32) {
        sums(j) += 2L * ((h >> j) & 1L) - 1L
        j += 1
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < 32) {
      if (sums(j) > 0) sh += (1L << j)
      j += 1
    }
    sh
  }

  /** Distinct rolling `n`-gram hashes over a token array: each token
    * charHash'd, each window combined as fold(h*131 + t_i) % P per step —
    * identical to the composed transform/sequence formulation and its
    * DuckDB twin. First-occurrence order (like array_distinct /
    * list_distinct); empty result when fewer than n tokens. */
  def gramHashes(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    val th = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      th(i) = CharHashExpression.hash(tokens.getUTF8String(i).toString)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var w = 0
    while (w <= cnt - n) {
      var h = th(w)
      var g = 1
      while (g < n) {
        h = (h * 131L + th(w + g)) % P
        g += 1
      }
      seen.add(h)
      w += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** All rolling `n`-gram hashes over a token array IN WINDOW ORDER with
    * duplicates kept — the term-frequency-preserving sibling of
    * [[gramHashes]] (same per-window fold(h*131 + t_i) % P), for
    * weighting schemes like tf·idf where a repeated phrase must count
    * more than once. Empty result when fewer than n tokens. */
  def gramSeq(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    val th = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      th(i) = CharHashExpression.hash(tokens.getUTF8String(i).toString)
      i += 1
    }
    val m = if (cnt >= n) cnt - n + 1 else 0
    val out = new Array[Long](m)
    var w = 0
    while (w < m) {
      var h = th(w)
      var g = 1
      while (g < n) {
        h = (h * 131L + th(w + g)) % P
        g += 1
      }
      out(w) = h
      w += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** K-wide minhash signature: m_i = min over hashes of
    * ((2i+1)·h + 7919·i + 1) % P — PortableHash.perm/minhashSig as one
    * loop. Null SLOTS are skipped, matching array_min / DuckDB list_min
    * over the permuted array (perm(null) is null, and both mins ignore
    * nulls); null RESULT when no non-null element remains (the oracle's
    * list_min over an empty/all-null list is NULL). */
  def minhashSig(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    var valid = 0
    var j0 = 0
    while (j0 < n) { if (!hashes.isNullAt(j0)) valid += 1; j0 += 1 }
    if (valid == 0) return null
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = 2L * i + 1
      val b = 7919L * i + 1
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        if (!hashes.isNullAt(j)) {
          val v = (a * hashes.getLong(j) + b) % P
          if (v < m) m = v
        }
        j += 1
      }
      out(i) = m
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Single-pass token statistics — token count, summed character count,
    * stopword hits — for quality scoring (q_text_quality). One tight loop
    * replaces three interpreted HOF lambdas (transform+aggregate for char
    * sum, filter+array_contains for stop hits) that each re-walk the
    * token array. Character counting is `UTF8String.numChars` — the same
    * codepoint semantics as `functions.length` and DuckDB `length()`, so
    * oracle parity is unchanged. Membership is a linear probe over the
    * stopword list (10 entries in practice) with UTF8String equality —
    * byte-wise, same as array_contains on strings.
    *
    * A null TOKEN element yields a NULL result (the composed forms this
    * replaces would null out char_sum through the aggregate anyway, and a
    * partial struct would be silently wrong); split() never produces
    * nulls, so internal callers are unaffected — this guards the
    * SQL-registry path. */
  def tokStats(tokens: ArrayData, stops: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = tokens.numElements()
    val ns = stops.numElements()
    var chars = 0L
    var hits = 0L
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) return null
      val t = tokens.getUTF8String(i)
      chars += t.numChars().toLong
      var j = 0
      var found = false
      while (j < ns && !found) {
        if (stops.getUTF8String(j) == t) found = true
        j += 1
      }
      if (found) hits += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, chars, hits))
  }

  /** Minimum rolling hash over all `gram`-codepoint windows (winnowing
    * fingerprint), reduced mod P at every step — congruent with the
    * oracle's one-mod-per-window unrolled polynomial for gram 8 and safe
    * for any gram/codepoint (an unreduced 9-term window already exceeds
    * 2^63). Returns -1 when the text has fewer than `gram` codepoints
    * (caller pre-filters; the oracle's list_min over an empty list would
    * be NULL). */
  def minGramHash(s: UTF8String, gram: Int): Long = {
    val str = s.toString
    // codepoint array
    val cps = new Array[Long](str.codePointCount(0, str.length))
    var i = 0; var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(k) = cp.toLong
      k += 1
      i += Character.charCount(cp)
    }
    if (cps.length < gram) return -1L
    var minH = Long.MaxValue
    var w = 0
    while (w <= cps.length - gram) {
      var h = cps(w) % P
      var g = 1
      while (g < gram) {
        h = (h * 131L + cps(w + g)) % P
        g += 1
      }
      if (h < minH) minH = h
      w += 1
    }
    minH
  }


  /** 16-bit × 16-bit Morton (Z-order) interleave: bit i of a lands at
    * position 2i, bit i of b at 2i+1 — a 32-bit curve index. Sorting or
    * range-partitioning data by this key co-locates rows that are close
    * in BOTH dimensions, so parquet row-group min/max stats become
    * selective for two-dimensional predicates (measured in
    * ZOrderLayoutSpec). 16 bits per dimension is layout resolution, not
    * a data constraint — inputs are masked. */
  def zorder(a: Long, b: Long): Long = {
    val x = a & 0xffffL
    val y = b & 0xffffL
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Index of the first element of sorted long array `arr` that is >= v
    * (std::lower_bound) = count of elements strictly below v. Binary
    * search — the SaltedPrefix bucket assignment calls this once per row
    * against the broadcast quantile bounds, replacing an interpreted
    * per-element HOF lambda with log2(nb) long compares. */
  def lowerBound(arr: ArrayData, v: Long): Int = {
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getLong(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }
}

private object VecExprChecks {
  val floatArray: DataType => Boolean = {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  val longArray: DataType => Boolean = {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  def check(ok: Boolean, name: String, got: Seq[DataType]): TypeCheckResult =
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name: unexpected input types ${got.map(_.catalogString).mkString(", ")}")
}

/** graft_quantdot(a, b, mult) — Σ qround(a_i·b_i·mult) : BIGINT. */
case class QuantDotExpression(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      VecExprChecks.floatArray(first.dataType) &&
        VecExprChecks.floatArray(second.dataType) && third.dataType == DoubleType,
      prettyName, Seq(first.dataType, second.dataType, third.dataType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_quantdot"
  override protected def nullSafeEval(a: Any, b: Any, m: Any): Any =
    VecOps.quantDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) =>
      s"${ev.value} = graft.functions.VecOps.quantDot($a, $b, $m);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): QuantDotExpression =
    copy(first = f, second = s, third = t)
}

/** graft_l2q(a, b) — exact integer squared L2 over quantized vectors :
  * BIGINT. */
case class L2QuantExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      VecExprChecks.longArray(left.dataType) && VecExprChecks.longArray(right.dataType),
      prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_l2q"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.l2Quant(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.l2Quant($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): L2QuantExpression = copy(left = l, right = r)
}

/** graft_vecsub(a, b) — elementwise difference of quantized vectors :
  * ARRAY<BIGINT> (the PQ residual kernel). */
case class VecSubExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      VecExprChecks.longArray(left.dataType) && VecExprChecks.longArray(right.dataType),
      prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_vecsub"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.vecSub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.vecSub($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecSubExpression = copy(left = l, right = r)
}

/** graft_bpe_merge(s, l, r) — one canonical BPE merge pass : STRING. */
case class BpeMergeExpression(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      Seq(first, second, third).forall(_.dataType == StringType),
      prettyName, Seq(first.dataType, second.dataType, third.dataType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_merge"
  override protected def nullSafeEval(s: Any, l: Any, r: Any): Any =
    VecOps.bpeMerge(s.asInstanceOf[UTF8String], l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l, r) =>
      s"${ev.value} = graft.functions.VecOps.bpeMerge($s, $l, $r);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BpeMergeExpression =
    copy(first = f, second = s, third = t)
}

/** graft_bpe_merge_all(s, ls, rs) — the whole merge TABLE, in priority
  * order, in one kernel pass : STRING. */
case class BpeMergeAllExpression(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  private def strArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      first.dataType == StringType && strArray(second.dataType) &&
        strArray(third.dataType),
      prettyName, Seq(first.dataType, second.dataType, third.dataType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_merge_all"
  override protected def nullSafeEval(s: Any, ls: Any, rs: Any): Any =
    VecOps.bpeMergeAll(s.asInstanceOf[UTF8String], ls.asInstanceOf[ArrayData],
      rs.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, ls, rs) =>
      s"${ev.value} = graft.functions.VecOps.bpeMergeAll($s, $ls, $rs);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BpeMergeAllExpression =
    copy(first = f, second = s, third = t)
}

/** graft_quantvec(v, mult) — per-element qround(x·mult) : ARRAY<BIGINT>. */
case class QuantVecExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      VecExprChecks.floatArray(left.dataType) && right.dataType == DoubleType,
      prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_quantvec"
  override protected def nullSafeEval(v: Any, m: Any): Any =
    VecOps.quantizeVec(v.asInstanceOf[ArrayData], m.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) =>
      s"${ev.value} = graft.functions.VecOps.quantizeVec($v, $m);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QuantVecExpression = copy(left = l, right = r)
}

/** graft_quantvecnorm(v, mult) — per-element qround(x/‖v‖·mult) :
  * ARRAY<BIGINT> (the spherical quantizer, norm computed once per row). */
case class QuantVecNormExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      VecExprChecks.floatArray(left.dataType) && right.dataType == DoubleType,
      prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_quantvecnorm"
  override protected def nullSafeEval(v: Any, m: Any): Any =
    VecOps.quantizeVecNorm(v.asInstanceOf[ArrayData], m.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) =>
      s"${ev.value} = graft.functions.VecOps.quantizeVecNorm($v, $m);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QuantVecNormExpression = copy(left = l, right = r)
}

/** graft_cosine(a, b) — ordered-fold cosine similarity : DOUBLE. */
case class CosineExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      VecExprChecks.floatArray(left.dataType) && VecExprChecks.floatArray(right.dataType),
      prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.cosine($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineExpression = copy(left = l, right = r)
}

/** graft_cms_estimate(sketch, key) — CountMinSketch.estimateCount(key)
  * with the sketch deserialized ONCE per expression instance, not per
  * row — the same foldable-child discipline as Spark's own
  * BloomFilterMightContain. The sketch child must be foldable (a
  * literal: driver-collected aggregate bytes, same pattern as the
  * corpus-count literals elsewhere); the key is probed at array-index
  * cost, which is what makes a per-row candidate filter below a shuffle
  * viable. One-sided error (estimate ≥ true count) means a
  * threshold filter built on it never loses a true heavy hitter. */
case class CmsEstimateExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      left.dataType == BinaryType && left.foldable &&
        right.dataType == LongType,
      prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  @transient private lazy val sketch: org.apache.spark.util.sketch.CountMinSketch = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: sketch bytes are null")
    org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
  }
  def probe(key: Long): Long = sketch.estimateCount(key)

  override protected def nullSafeEval(s: Any, k: Any): Any =
    probe(k.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsProbe", this, classOf[CmsEstimateExpression].getName)
    nullSafeCodeGen(ctx, ev, (_, k) => s"${ev.value} = $ref.probe($k);")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimateExpression = copy(left = l, right = r)
}

/** graft_lshbucket(v, nPlanes) — hyperplane-sign bucket : BIGINT. */
case class LshBucketExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      VecExprChecks.floatArray(left.dataType) && right.dataType == IntegerType,
      prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lshbucket"
  override protected def nullSafeEval(v: Any, p: Any): Any =
    VecOps.lshBucket(v.asInstanceOf[ArrayData], p.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) =>
      s"${ev.value} = graft.functions.VecOps.lshBucket($v, $p);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LshBucketExpression = copy(left = l, right = r)
}

/** graft_simhash(tokens) — 32-bit sign-aggregated fingerprint : BIGINT. */
case class SimHashExpression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }, prettyName, Seq(child.dataType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(t: Any): Any =
    VecOps.simHash(t.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.VecOps.simHash($t);")
  override protected def withNewChildInternal(c: Expression): SimHashExpression =
    copy(child = c)
}

/** graft_gramhashes(tokens, n) — distinct n-gram hashes : ARRAY<BIGINT>. */
case class GramHashesExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(left.dataType match {
      case ArrayType(StringType, _) => right.dataType == IntegerType
      case _ => false
    }, prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gramhashes"
  override protected def nullSafeEval(t: Any, n: Any): Any =
    VecOps.gramHashes(t.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.VecOps.gramHashes($t, $n);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GramHashesExpression = copy(left = l, right = r)
}

/** graft_gramseq(tokens, n) — all n-gram hashes, window order, duplicates
  * kept : ARRAY<BIGINT>. */
case class GramSeqExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(left.dataType match {
      case ArrayType(StringType, _) => right.dataType == IntegerType
      case _ => false
    }, prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gramseq"
  override protected def nullSafeEval(t: Any, n: Any): Any =
    VecOps.gramSeq(t.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.VecOps.gramSeq($t, $n);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GramSeqExpression = copy(left = l, right = r)
}

/** graft_minhashsig(hashes, k) — k-wide minhash signature : ARRAY<BIGINT>. */
case class MinHashSigExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(left.dataType match {
      case ArrayType(LongType, _) => right.dataType == IntegerType
      case _ => false
    }, prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty input -> null signature
  override def prettyName: String = "graft_minhashsig"
  override protected def nullSafeEval(h: Any, k: Any): Any =
    VecOps.minhashSig(h.asInstanceOf[ArrayData], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, k) =>
      s"""
        ${ev.value} = graft.functions.VecOps.minhashSig($h, $k);
        ${ev.isNull} = ${ev.value} == null;
      """)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MinHashSigExpression = copy(left = l, right = r)
}

/** graft_tokstats(tokens, stops) —
  * STRUCT<token_count: BIGINT, char_sum: BIGINT, stop_hits: BIGINT>. */
case class TokStatsExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check((left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) => true
      case _ => false
    }, prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = StructType(Seq(
    StructField("token_count", LongType, nullable = false),
    StructField("char_sum", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))
  override def nullable: Boolean = true // null token element -> null result
  override def prettyName: String = "graft_tokstats"
  override protected def nullSafeEval(t: Any, s: Any): Any =
    VecOps.tokStats(t.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"""
        ${ev.value} = graft.functions.VecOps.tokStats($t, $s);
        ${ev.isNull} = ${ev.value} == null;
      """)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TokStatsExpression = copy(left = l, right = r)
}

/** graft_mingram(text, gram) — min rolling gram-hash : BIGINT. */
case class MinGramHashExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      left.dataType == StringType && right.dataType == IntegerType,
      prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mingram"
  override protected def nullSafeEval(s: Any, g: Any): Any =
    VecOps.minGramHash(s.asInstanceOf[UTF8String], g.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, g) =>
      s"${ev.value} = graft.functions.VecOps.minGramHash($s, $g);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MinGramHashExpression = copy(left = l, right = r)
}

/** graft_lowerbound(bounds, v) — first index with bounds[i] >= v in a
  * sorted BIGINT array = #elements strictly below v : INT. */
case class LowerBoundExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      VecExprChecks.longArray(left.dataType) && right.dataType == LongType,
      prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lowerbound"
  override protected def nullSafeEval(a: Any, v: Any): Any =
    VecOps.lowerBound(a.asInstanceOf[ArrayData], v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, v) =>
      s"${ev.value} = graft.functions.VecOps.lowerBound($a, $v);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LowerBoundExpression = copy(left = l, right = r)
}

/** graft_zorder(a, b) — 16+16-bit Morton interleave : BIGINT. */
case class ZOrderExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExprChecks.check(
      left.dataType == LongType && right.dataType == LongType,
      prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.zorder(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.zorder($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZOrderExpression = copy(left = l, right = r)
}
