package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._

import org.apache.spark.sql.types.{DataType, DataTypes, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial rolling hash:
  *
  *   h = foldLeft(0)((h, cp) => (h * 131 + cp) % 1000000007)  over codepoints
  *
  * Semantically identical to the composed-HOF form in
  * `PortableHash.charHash` (split → ascii → aggregate) and to the DuckDB
  * oracle's `list_reduce` twin, but evaluated as ONE tight JVM loop with
  * full whole-stage codegen — no per-character lambda dispatch, no
  * intermediate array. This is the (b)-tier custom operator of the design
  * ladder: a scalar `Expression` with `doGenCode`, used when builtin
  * composition is semantically right but interpretively slow.
  *
  * Codepoint iteration (not UTF-16 units, not bytes) matches both
  * `functions.ascii` per split character and DuckDB's `ascii()`.
  */
case class CharHashExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_charhash"

  override protected def nullSafeEval(input: Any): Any =
    CharHashExpression.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      code"""
        java.lang.String ${ev.value}_s = $c.toString();
        long ${ev.value}_h = 0L;
        int ${ev.value}_i = 0;
        int ${ev.value}_n = ${ev.value}_s.length();
        while (${ev.value}_i < ${ev.value}_n) {
          int ${ev.value}_cp = ${ev.value}_s.codePointAt(${ev.value}_i);
          ${ev.value}_h = (${ev.value}_h * 131L + (long) ${ev.value}_cp) % 1000000007L;
          ${ev.value}_i += java.lang.Character.charCount(${ev.value}_cp);
        }
        ${ev.value} = ${ev.value}_h;
      """.toString)

  override protected def withNewChildInternal(newChild: Expression): CharHashExpression =
    copy(child = newChild)
}

object CharHashExpression {

  /** Reference JVM implementation (also used by interpreted eval). */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp.toLong) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }
}

/** SparkSessionExtensions hook: `SparkSession.builder.withExtensions(new
  * GraftExtensions)` (or config `spark.sql.extensions=graft.functions.
  * GraftExtensions`) injects graft's native functions at session build
  * time — the standard deployment path for the custom-operator tier,
  * equivalent to the imperative [[GraftFunctions.register]]. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_charhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CharHashExpression].getName, "graft_charhash"),
      (children: Seq[Expression]) => CharHashExpression(children.head)))
}

/** Session-level registration + Column access for graft's native
  * functions (SURVEY §2.2 UDF surface, custom-operator tier (b)). After
  * [[GraftFunctions.register]], `graft_charhash` is callable from SQL
  * text and via [[GraftFunctions.charHashNative]] — and, unlike a Scala
  * UDF, participates in whole-stage codegen and constant folding. */
object GraftFunctions {

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cls.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_charhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CharHashExpression].getName, "graft_charhash"),
      children => CharHashExpression(children.head))
  }

  /** Codegen'd drop-in for PortableHash.charHash on hot paths. The
    * session must have gone through [[register]] first. */
  def charHashNative(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_charhash", c)
}
