package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CharHashExpression
import graft.operators.PortableHash
import graft.plans.NativizeCharHash

/** The auto-nativization optimizer rule: the composed HOF rolling hash
  * must be rewritten to the native kernel — and ONLY when semantically
  * identical. */
class NativizeHashSpec extends AnyFunSuite with SparkSessionFixture {

  private def withRule[T](f: => T): T = {
    NativizeCharHash.register(spark)
    f
  }

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").limit(50)

  test("composed charHash is rewritten to the native expression") {
    withRule {
      val df = docs.select(col("doc_id"),
        PortableHash.charHash(col("text")).as("h"))
      val optimized = df.queryExecution.optimizedPlan
      val natives = optimized.flatMap(_.expressions).flatMap(_.collect {
        case e: CharHashExpression => e })
      assert(natives.nonEmpty, s"not nativized:\n$optimized")
      // and values equal the interpreted composed form (rule off: fresh
      // expression evaluated via the kernel's reference implementation)
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      docs.select(col("doc_id"), col("text")).collect().foreach { r =>
        assert(got(r.getLong(0)) == CharHashExpression.hash(r.getString(1)))
      }
    }
  }

  test("a look-alike fold with different constants is left untouched") {
    withRule {
      // same skeleton, multiplier 137 instead of 131
      val lookalike = aggregate(
        transform(split(col("text"), ""), c => ascii(c).cast("long")),
        lit(0L),
        (h, c) => (h * lit(137L) + c) % lit(PortableHash.P))
      val df = docs.select(lookalike.as("h"))
      val natives = df.queryExecution.optimizedPlan
        .flatMap(_.expressions).flatMap(_.collect {
          case e: CharHashExpression => e })
      assert(natives.isEmpty, "look-alike was wrongly nativized")
    }
  }
}
