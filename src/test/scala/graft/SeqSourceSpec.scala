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
}
