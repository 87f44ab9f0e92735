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
