package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core.Graft

/** The hi/lo split-sum money arithmetic (core/Graft): the distributed
  * result must equal an exact BigInt reference for arbitrary (including
  * negative) amounts and any partitioning — this is the arithmetic every
  * revenue number in the gate rides on. */
class MoneySumSpec extends AnyFunSuite with SparkSessionFixture {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  // the same per-row quantization fixed4 applies (round half-up at 1e-4)
  private def quantize(x: Double): Long =
    BigDecimal(x * 10000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("moneySum == exact BigInt sum / 1e4 for signed amounts, any partitioning") {
    val s = spark
    import s.implicits._
    val genAmounts = Gen.nonEmptyListOf(Gen.chooseNum(-99999.99, 99999.99))
    check(Prop.forAll(genAmounts, Gen.choose(1, 7)) { (xs, nPart) =>
      val df = xs.toDF("v").repartition(nPart)
      val got = df.agg(Graft.moneySum(col("v")).as("m")).head().getDouble(0)
      val exact = xs.map(x => BigInt(quantize(x))).sum
      got == (BigDecimal(exact) / 10000).toDouble
    })
  }

  test("unitsSum over pre-quantized partials equals single-level moneySum") {
    val s = spark
    import s.implicits._
    val xs = Seq.tabulate(1000)(i => (i % 13, (i * 37 % 1999) - 999 + 0.0101 * i))
    val df = xs.toDF("k", "v")
    val oneLevel = df.agg(Graft.moneySum(col("v"))).head().getDouble(0)
    val twoLevel = df
      .groupBy(col("k")).agg(sum(Graft.fixed4(col("v"))).as("units"))
      .agg(Graft.unitsSum(col("units"))).head().getDouble(0)
    assert(oneLevel === twoLevel)
  }

  test("split-sum handles hi/lo boundary values exactly") {
    val s = spark
    import s.implicits._
    // units straddling multiples of 2^20, and negatives
    val units = Seq(0L, 1L, (1L << 20) - 1, 1L << 20, (1L << 20) + 1,
      -1L, -(1L << 20), -(1L << 20) - 1, (1L << 40) + 12345L, -(1L << 40) - 5L)
    // feed units directly through unitsSum: isolates the split/recombine
    val got = units.toDF("u").agg(Graft.unitsSum(col("u"))).head().getDouble(0)
    val exact = (BigDecimal(units.map(BigInt(_)).sum) / 10000).toDouble
    assert(got === exact)
  }
}
