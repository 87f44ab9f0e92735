package graft

import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_window_rank scale contract: global rank/dense_rank/ntile are derived
  * from the distinct-value count map, so (a) the only global (empty
  * partitionSpec) window in the plan runs over AGGREGATED distinct-value
  * rows — value-domain-bounded — never over raw rows, (b) per-row work is
  * partitioned (tie-break window keyed by the value), and (c) the output
  * is a pure function of the data: invariant to the shuffle-partition
  * setting and equal to the naive single-window formulation. */
class WindowRankScaleSpec extends AnyFunSuite with SparkSessionFixture {

  private val dir = "/root/testdata/sf0.001"

  test("global windows only ever see aggregated distinct-value rows") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false") // plain tree for traversal
    val plan = SparkEntry.queries("q_window_rank")(s2, dir)
      .queryExecution.executedPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    val globals = windows.filter(_.partitionSpec.isEmpty)
    assert(globals.nonEmpty, "expected the distinct-value prefix-sum window")
    globals.foreach { w =>
      val aggBelow = w.child.collect {
        case a: HashAggregateExec => a
        case a: ObjectHashAggregateExec => a
        case a: SortAggregateExec => a
      }
      assert(aggBelow.nonEmpty,
        "a global window must consume the groupBy(value) count map, " +
          "not raw rows — that is the single-partition scale cap")
    }
    // The per-row tie-break window must be partitioned.
    assert(windows.exists(_.partitionSpec.nonEmpty))
  }

  test("salted row_number: every per-row window is salted; offsets windows see only bucket counts") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = SparkEntry.queries("q_window_rownum_salted")(s2, dir)
      .queryExecution.executedPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val onAggregated = w.child.collect {
        case a: HashAggregateExec => a
        case a: ObjectHashAggregateExec => a
        case a: SortAggregateExec => a
      }.nonEmpty
      // each window either (a) consumes the tiny bucket-count aggregate
      // (the offset running sum) or (b) is partitioned by MORE than the
      // skewed value alone — i.e. the salt is in the partition spec, so
      // no task ever sees a whole value's row set
      assert(onAggregated || w.partitionSpec.size >= 2,
        s"unsalted per-row window over raw rows:\n$w")
    }
  }

  test("salted row_number equals the single-window formulation at several partitionings") {
    val expected = graft.core.Graft.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        row_number().over(Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_orderkey"))).cast("long").as("rn"))
      .orderBy("o_orderstatus", "rn").collect().toSeq
    for (np <- Seq("1", "5", "64")) {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", np)
      val got = SparkEntry.queries("q_window_rownum_salted")(s2, dir).collect().toSeq
      assert(got == expected, s"salted rn mismatch at shuffle.partitions=$np")
    }
  }

  test("quantile salt: balanced buckets under a skewed order domain, still salted, still exact") {
    val s = spark
    import s.implicits._
    // skewed order: square of a uniform id — half the values land in the
    // lowest quarter of the range
    val n = 200000
    val df = (0 until n).map(i => (i % 3, (i / 3).toLong))
      .toDF("k", "id")
      .withColumn("ord", col("id") * col("id"))
    val nb = 16
    // LINEAR salt bucket sizes (what the residual was about): replicate
    // the min/max formula per key
    val linMax = df.groupBy("k").agg(max("ord").as("mx"), min("ord").as("mn"))
      .join(df, "k")
      .withColumn("b", expr(s"((ord - mn) * $nb) div (mx - mn + 1)"))
      .groupBy("k", "b").count().agg(max("count")).as[Long].head()
    // QUANTILE salt bucket sizes
    val qMax = graft.operators.SaltedPrefix
      .withQuantileBuckets(df, "k", "ord", nb, sampleOneIn = 64)
      .groupBy("k", "__bkt").count().agg(max("count")).as[Long].head()
    val ideal = n / 3.0 / nb
    // linear collapses (bucket 0 alone holds ~25% of each key = 4× ideal);
    // quantile stays near equi-depth
    assert(linMax > 3.5 * ideal, s"skew fixture lost its skew: linMax=$linMax")
    assert(qMax < 1.5 * ideal, s"quantile buckets imbalanced: qMax=$qMax ideal=$ideal")
    // and the numbering itself stays exact vs the single window
    val got = graft.operators.SaltedPrefix
      .exclusivePrefixSumQuantile(df, "k", "ord", lit(1L), nb, sampleOneIn = 64)
      .select(col("k"), col("id"), (col("start_off") + 1).as("rn"))
      .orderBy("k", "rn").collect().toSeq
    val expected = df.select(col("k"), col("id"),
        row_number().over(Window.partitionBy(col("k")).orderBy(col("ord")))
          .cast("long").as("rn"))
      .orderBy("k", "rn").collect().toSeq
    assert(got == expected)
  }

  test("quantile salt: random order distributions stay exact (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = spark
    import s.implicits._
    // distribution shapes chosen to stress bucket-bound derivation:
    // uniform, squared (low-heavy), cubed, step (heavy ties in density),
    // and constant-ish narrow domains
    val genShape = Gen.oneOf[Long => Long](
      (i: Long) => i,
      (i: Long) => i * i,
      (i: Long) => i * i * i,
      (i: Long) => (i / 100) * 1000 + i % 3,
      (i: Long) => 7L + i / 500)
    val genCase = for {
      n <- Gen.choose(1, 3000)
      nk <- Gen.choose(1, 4)
      shape <- genShape
      nb <- Gen.oneOf(2, 7, 16)
      soi <- Gen.oneOf(4, 64)
    } yield (n, nk, shape, nb, soi)
    val prop = Prop.forAll(genCase) { case (n, nk, shape, nb, soi) =>
      // ord must be unique within a key: mix the shaped value with the
      // unique id in the low bits
      val df = (0 until n).map { i =>
        (i % nk, shape(i.toLong / nk) * 10000L + i)
      }.toDF("k", "ord")
      val got = graft.operators.SaltedPrefix
        .exclusivePrefixSumQuantile(df, "k", "ord", lit(1L), nb, soi)
        .select(col("k"), col("ord"), (col("start_off") + 1).as("rn"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val want = (0 until n).map { i =>
        (i % nk, shape(i.toLong / nk) * 10000L + i)
      }.groupBy(_._1).flatMap { case (k, rows) =>
        rows.map(_._2).sorted.zipWithIndex.map { case (o, idx) =>
          (k, o, idx + 1L)
        }
      }.toSet
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("quantile salt plan: per-row windows carry the bucket in the partition spec") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = SparkEntry.queries("q_window_rownum_qsalted")(s2, dir)
      .queryExecution.executedPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val onAggregated = w.child.collect {
        case a: HashAggregateExec => a
        case a: ObjectHashAggregateExec => a
        case a: SortAggregateExec => a
      }.nonEmpty
      assert(onAggregated || w.partitionSpec.size >= 2,
        s"unsalted per-row window over raw rows:\n$w")
    }
  }

  test("output is invariant to shuffle partitioning and equals the single-window formulation") {
    val expected = {
      val v = Window.orderBy(col("c_acctbal").desc)
      val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
      graft.core.Graft.table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"),
          rank().over(v).cast("int").as("rnk"),
          dense_rank().over(v).cast("int").as("drnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy("c_custkey").collect().toSeq
    }
    for (np <- Seq("1", "5", "64")) {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", np)
      val got = SparkEntry.queries("q_window_rank")(s2, dir).collect().toSeq
      assert(got == expected, s"rank mismatch at shuffle.partitions=$np")
    }
  }
}
