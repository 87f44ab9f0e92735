package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{SeqScan, SeqSource}

/** DataSource V2 connector (sources/SeqSource): values, column pruning,
  * and id-range filter pushdown into split planning. */
class SeqSourceSpec extends AnyFunSuite with SparkSessionFixture {

  private def read(rows: Long, parts: Int = 4) =
    spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  test("produces the deterministic sequence") {
    val got = read(100).orderBy("id").collect()
    assert(got.length === 100)
    assert(got.map(_.getLong(0)).toSeq === (0L until 100L))
    got.foreach { r =>
      assert(r.getLong(1) === SeqSource.val4(r.getLong(0)))
      assert(r.getString(2) === SeqSource.tag(r.getLong(0)))
    }
  }

  test("filter pushdown narrows the scan interval before split planning") {
    val df = read(1000000, parts = 8).filter(col("id") >= 999990L)
    // the pushed range shows up in the scan description and the plan
    // generates only the 10 surviving rows (not a post-filtered million)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }).head
    assert(scan.scan.asInstanceOf[SeqScan].description().contains("[999990,1000000)"),
      scan.scan.description())
    assert(df.count() === 10)
  }

  test("scale smoke: 10M generated rows aggregate + broadcast join, exact") {
    // nothing driver-side: 16 independent range generators feed a
    // partial+final hash agg; the dim side broadcasts. Closed-form checks.
    val s = spark
    import s.implicits._
    val n = 10000000L
    val dim = (0 until 10).map(i => (s"t$i", i % 2 == 0)).toDF("tag", "even")
    val agg = read(n, parts = 16)
      .join(org.apache.spark.sql.functions.broadcast(dim), "tag")
      .groupBy("even")
      .agg(count(lit(1)).as("cnt"), sum(col("id")).as("id_sum"))
      .collect().map(r => r.getBoolean(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // ids with id%10 even: 5 of each 10 → n/2 rows either side
    assert(agg(true)._1 === n / 2)
    assert(agg(false)._1 === n / 2)
    val total = n * (n - 1) / 2
    assert(agg(true)._2 + agg(false)._2 === total)
  }

  test("column pruning reaches the reader schema") {
    val df = read(1000).select("tag")
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }).head
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("tag"))
    assert(df.distinct().count() === 10)
  }

  private def seqScanOf(df: org.apache.spark.sql.DataFrame): SeqScan =
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }).head.scan.asInstanceOf[SeqScan]

  // string-based: AdaptiveSparkPlanExec hides its inner plan from collect
  private def hasAggregateExec(df: org.apache.spark.sql.DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains("HashAggregate") || p.contains("SortAggregate") ||
      p.contains("ObjectHashAggregate")
  }

  test("COMPLETE aggregate pushdown: global count/min/max/sum, no agg exec") {
    val df = read(100000, parts = 8)
      .filter(col("id") >= 123L && col("id") < 4321L)
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"),
        max(col("id")).as("hi"), sum(col("id")).as("s"))
    assert(!hasAggregateExec(df), df.queryExecution.executedPlan.toString)
    assert(seqScanOf(df).description().contains("aggpush"))
    val r = df.collect().head
    val n = 4321L - 123L
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === 123L)
    assert(r.getLong(2) === 4320L)
    assert(r.getLong(3) === (123L + 4320L) * n / 2)
  }

  test("COMPLETE aggregate pushdown: grouped by tag, matches row-level twin") {
    val df = read(54321, parts = 8)
      .filter(col("id") >= 17L)
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("id_min"),
        max(col("id")).as("id_max"), sum(col("id")).as("id_sum"))
    assert(!hasAggregateExec(df), df.queryExecution.executedPlan.toString)
    // the twin computes the same thing row-by-row on the driver — no
    // Spark aggregate that could itself be pushed
    val twin = read(54321, parts = 8).filter(col("id") >= 17L)
      .collect().map(_.getLong(0)).groupBy(SeqSource.tag)
      .map { case (t, ids) =>
        Seq[Any](t, ids.length.toLong, ids.min, ids.max, ids.sum)
      }.toSeq.sortBy(_.head.toString)
    val got = df.orderBy("tag").collect().map(_.toSeq).toSeq
    assert(got === twin)
  }

  test("avg(id) pushes as decomposed SUM+COUNT (Spark-side division)") {
    val df = read(1000).groupBy("tag").agg(avg(col("id")).as("a"))
    assert(!hasAggregateExec(df), df.queryExecution.executedPlan.toString)
    assert(seqScanOf(df).description().contains("aggpush"))
    val got = df.orderBy("tag").collect().map(r => r.getString(0) -> r.getDouble(1))
    // ids with id%10 == r in [0,1000): r, r+10, …, r+990 → mean r+495
    got.zipWithIndex.foreach { case ((t, a), r) =>
      assert(t === s"t$r"); assert(a === (r + 495).toDouble)
    }
  }

  test("aggregate pushdown declines unsupported shapes (sum(val4), count distinct, group by val4)") {
    for (df <- Seq(
        read(1000).groupBy("tag").agg(sum(col("val4")).as("s")),
        read(1000).groupBy("tag").agg(countDistinct(col("id")).as("m")),
        read(1000).groupBy("val4").agg(count(lit(1)).as("n")))) {
      assert(hasAggregateExec(df), df.queryExecution.executedPlan.toString)
      assert(!df.queryExecution.executedPlan.toString.contains("aggpush"))
    }
    // and a post-scan (non-pushed) filter blocks aggregate pushdown
    val f = read(1000).filter(col("val4") > 100L)
      .agg(count(lit(1)).as("n"))
    assert(hasAggregateExec(f))
  }

  test("aggregate pushdown on the empty interval: count 0, null min/max/sum") {
    val df = read(1000).filter(col("id") >= 5000L)
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"), sum(col("id")).as("s"))
    val r = df.collect().head
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("limit pushdown truncates the generated interval") {
    val df = read(100000000L, parts = 8).limit(5)
    val scan = seqScanOf(df)
    assert(scan.description().contains("limitpush=5"), scan.description())
    assert(scan.description().contains("[0,5)"), scan.description())
    assert(df.collect().map(_.getLong(0)).toSeq === (0L until 5L))
  }

  test("top-N pushdown: ORDER BY id DESC LIMIT n plans the tail slice") {
    val df = read(100000000L, parts = 8).orderBy(col("id").desc).limit(3)
    val scan = seqScanOf(df)
    assert(scan.description().contains("limitpush=3 tail"), scan.description())
    assert(scan.description().contains("[99999997,100000000)"), scan.description())
    assert(df.collect().map(_.getLong(0)).toSeq ===
      Seq(99999999L, 99999998L, 99999997L))
  }

  test("top-N pushdown composes with a pushed id-range filter") {
    val df = read(100000000L, parts = 8)
      .filter(col("id") >= 1000L && col("id") < 900000L)
      .orderBy(col("id")).limit(4)
    val scan = seqScanOf(df)
    assert(scan.description().contains("[1000,1004)"), scan.description())
    assert(df.collect().map(_.getLong(0)).toSeq === (1000L until 1004L))
  }
}
