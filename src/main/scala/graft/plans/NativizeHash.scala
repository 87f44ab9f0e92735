package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.CharHashExpression

/** Optimizer rule: recognize the composed higher-order-function form of
  * the engine's rolling hash —
  *
  *   aggregate(transform(split(s, ""), c -> ascii(c)::long),
  *             0L, (h, c) -> (h*131 + c) % 1000000007)
  *
  * (`PortableHash.charHash`, also what the DuckDB-twin SQL shape lowers
  * to) — and swap in the native codegen'd [[CharHashExpression]]. The
  * optimizer acts as the compatibility layer: users/SQL write the
  * portable composed form and still execute the tight JVM loop.
  *
  * Matching is SEMANTIC, not purely structural: a candidate subtree with
  * the right (aggregate ∘ transform ∘ split) skeleton is verified by
  * interpreted evaluation on probe strings against the native kernel;
  * only bit-identical candidates are rewritten, so a look-alike fold with
  * different constants is left untouched. */
class NativizeCharHash extends Rule[LogicalPlan] {

  private val probes = Seq("", "a", "hello world", "Zz9 µß")

  /** True iff replacing the string input with each probe literal makes
    * the composed expression evaluate exactly like the native hash. */
  private def semanticallyCharHash(agg: Expression, strInput: Expression): Boolean =
    probes.forall { p =>
      val candidate = agg.transformUp {
        case e if e.fastEquals(strInput) => Literal(UTF8String.fromString(p), StringType)
      }
      try candidate.eval(null) == CharHashExpression.hash(p)
      catch { case _: Exception => false }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg @ ArrayAggregate(
          ArrayTransform(StringSplit(strInput, Literal(delim, StringType), _), _),
          Literal(0L, LongType), _, _)
        if delim.toString.isEmpty && strInput.dataType == StringType &&
          agg.dataType == LongType && semanticallyCharHash(agg, strInput) =>
      CharHashExpression(strInput)
  }
}

object NativizeCharHash {
  /** Imperative runtime injection (extensions path: GraftExtensions). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[NativizeCharHash]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new NativizeCharHash
}

/** Auto-nativization for the remaining composed PortableHash kernels:
  *
  *   minhashSig:  transform(sequence(0, k-1),
  *                  i -> array_min(transform(hashes, t -> perm(i, t))))
  *   gramHashes:  array_distinct(transform(sequence(1, size(th)-(n-1)),
  *                  i -> fold of th[i..i+n-1]))  over th = charHash'd tokens
  *
  * Matching follows the [[NativizeCharHash]] discipline — a structural
  * skeleton gate, then SEMANTIC verification by interpreted evaluation on
  * probe inputs against the native kernel; only bit-identical candidates
  * are rewritten, so perm-like folds with different constants survive
  * untouched.
  *
  * Null/edge contracts:
  *   - minhashSig: the composed form yields `[null × k]` on an empty hash
  *     set while the kernel yields NULL, so the rewrite guards with
  *     `if(size(h)=0, [null × k], kernel)` — verified by an empty probe,
  *     bit-identical on every input.
  *   - gramHashes: on fewer than n tokens the composed Spark form errors
  *     (sequence(1, size-(n-1)) runs DESCENDING when start > stop, then
  *     element_at(th, 0) is an invalid index), while the DuckDB twin's
  *     generate_series(1, 0) is EMPTY. The kernel implements the oracle's
  *     (empty) semantics, so the rewrite is exact wherever the composed
  *     form is defined and repairs the undefined corner to match the
  *     documented SQL-twin behavior. */
class NativizeHashKernels extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types.{ArrayType, IntegerType}
  import graft.functions.{GramHashesExpression, MinHashSigExpression, VecOps}

  private val hashProbes: Seq[Seq[Long]] =
    Seq(Seq(5L), Seq(1L, 2L, 3L), Seq(999999999L, 123456789L, 7L, 0L))
  private val tokenProbes: Seq[Seq[String]] =
    Seq(Seq("a", "b", "c", "d"), Seq("the", "the", "cat", "sat", "mat"),
      Seq("µß", "z9", "hello", "wörld"))

  private def intOf(v: Any): Option[Int] = v match {
    case i: Int => Some(i)
    case l: Long if l.isValidInt => Some(l.toInt)
    case _ => None
  }

  /** (start, stop) of a consecutive ascending integer range expression —
    * either a live `sequence(a, b)` call or the literal array that
    * ConstantFolding collapses it to (extraOptimizations run AFTER the
    * main optimizer batches, so static bounds arrive pre-folded). */
  private def seqBounds(e: Expression): Option[(Int, Int)] = e match {
    case Sequence(Literal(s, _), Literal(t, _), _, _) =>
      for { a <- intOf(s); b <- intOf(t) } yield (a, b)
    case Literal(ad: ArrayData, ArrayType(et, _)) if et == IntegerType || et == LongType =>
      val n = ad.numElements()
      if (n == 0) None
      else {
        val vals = (0 until n).map { i =>
          if (et == IntegerType) ad.getInt(i).toLong else ad.getLong(i)
        }
        val consecutive = vals.zipWithIndex.forall { case (v, i) => v == vals.head + i }
        if (consecutive && vals.head.isValidInt && vals.last.isValidInt)
          Some((vals.head.toInt, vals.last.toInt))
        else None
      }
    case _ => None
  }

  /** Start bound of a range whose stop may be dynamic (size(x) - c). */
  private def seqStart(e: Expression): Option[Int] = e match {
    case Sequence(Literal(s, _), _, _, _) => intOf(s)
    case _ => seqBounds(e).map(_._1)
  }

  /** Substitute `input` with a literal and interpretedly evaluate. */
  private def evalWith(expr: Expression, input: Expression, sub: Literal): Option[Any] = {
    val candidate = expr.transformUp {
      case e if e.fastEquals(input) => sub
    }
    try Option(candidate.eval(null)) catch { case _: Exception => None }
  }

  private def sameLongs(got: ArrayData, want: ArrayData): Boolean =
    got.numElements() == want.numElements() &&
      java.util.Arrays.equals(got.toLongArray(), want.toLongArray())

  private def semanticallyMinhash(whole: Expression, input: Expression, k: Int): Boolean = {
    val nonEmpty = hashProbes.forall { p =>
      evalWith(whole, input,
        Literal.create(p, ArrayType(LongType, containsNull = false))) match {
        case Some(ad: ArrayData) =>
          val want = VecOps.minhashSig(ArrayData.toArrayData(p.toArray), k)
          !ad.toObjectArray(LongType).contains(null) && sameLongs(ad, want)
        case _ => false
      }
    }
    // empty set: composed = [null × k] (array_min over empty is null)
    val empty = evalWith(whole, input,
      Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false))) match {
      case Some(ad: ArrayData) =>
        ad.numElements() == k && (0 until k).forall(ad.isNullAt)
      case _ => false
    }
    nonEmpty && empty
  }

  private def semanticallyGram(whole: Expression, input: Expression, n: Int): Boolean =
    tokenProbes.forall { p =>
      evalWith(whole, input,
        Literal.create(p, ArrayType(StringType, containsNull = false))) match {
        case Some(ad: ArrayData) =>
          val probe = ArrayData.toArrayData(
            p.map(UTF8String.fromString).toArray[Any])
          sameLongs(ad, VecOps.gramHashes(probe, n))
        case _ => false
      }
    }

  private def isLongArray(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  private def isStringArray(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // minhashSig(hashes, k)
    case t @ ArrayTransform(
          seqE,
          LambdaFunction(ArrayMin(ArrayTransform(hashes, _)), _, _))
        if seqBounds(seqE).exists { case (a, b) => a == 0 && b >= 0 } &&
          isLongArray(hashes.dataType) &&
          semanticallyMinhash(t, hashes, seqBounds(seqE).get._2 + 1) =>
      val k = seqBounds(seqE).get._2 + 1
      If(EqualTo(Size(hashes), Literal(0)),
        Literal.create(Seq.fill[Any](k)(null), ArrayType(LongType, containsNull = true)),
        MinHashSigExpression(hashes, Literal(k, IntegerType)))

    // gramHashes(tokens, n)
    case d @ ArrayDistinct(ArrayTransform(seqE, _))
        if seqStart(seqE).contains(1) && isLongArray(d.dataType) => {
      val tokenCands = d.collect {
        case e if isStringArray(e.dataType) => e
      }.foldLeft(Seq.empty[Expression]) { (acc, e) =>
        if (acc.exists(_.fastEquals(e))) acc else acc :+ e
      }
      val hit = (for {
        tokens <- tokenCands.iterator
        n <- (2 to 4).iterator
        if semanticallyGram(d, tokens, n)
      } yield GramHashesExpression(tokens, Literal(n, IntegerType))).nextOption()
      hit.getOrElse(d)
    }
  }
}

object NativizeHashKernels {
  /** Imperative runtime injection (extensions path: GraftExtensions). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[NativizeHashKernels]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new NativizeHashKernels
}
