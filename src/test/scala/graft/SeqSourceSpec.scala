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
