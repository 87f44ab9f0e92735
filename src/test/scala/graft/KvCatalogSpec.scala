package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{KvListStats, KvPruneStats}

/** Plan-shape parity for the SQL catalog (sources/KvCatalog): the verdict
  * asked that the catalog path hit the SAME pruned scans as the options
  * path — not a second engine behind nicer names. Pinned here:
  *
  *  - a filtered `spark.sql` SELECT pushes its predicates into the scan
  *    and zone-map-skips files (KvPruneStats sees fewer planned than
  *    listed), with the listing planned from MANIFESTS, not a walk;
  *  - an ungrouped aggregate over a catalog table is STATS-ANSWERED (the
  *    executed plan carries no HashAggregate) — same for GROUP BY the
  *    partition column of a PARTITIONED BY table;
  *  - time-travel tables reject writes; DELETE with an untranslatable
  *    predicate is rejected at analysis, never mis-applied.
  */
class KvCatalogSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val warehouse = {
    val d = java.nio.file.Files.createTempDirectory("graft_kvcat_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.kcs", "graft.sources.KvCatalog")
    spark.conf.set("spark.sql.catalog.kcs.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS kcs.ns")
  }

  private def tableDir(t: String) = s"$warehouse/ns/$t"

  test("filtered SQL SELECT: pushdown + zone-map skip + manifest planning") {
    init()
    spark.sql("DROP TABLE IF EXISTS kcs.ns.zm")
    spark.sql("CREATE TABLE kcs.ns.zm (k BIGINT, v BIGINT)")
    spark.range(0, 1000).select(col("id").as("k"), (col("id") * 3).as("v"))
      .repartitionByRange(8, col("k"))
      .createOrReplaceTempView("zm_src")
    spark.sql("INSERT INTO kcs.ns.zm SELECT /*+ REPARTITION_BY_RANGE(8, k) */ * FROM zm_src")
    val df = spark.sql("SELECT v FROM kcs.ns.zm WHERE k >= 10 AND k < 50")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
      (10L until 50L).map(_ * 3))
    // the scan pruned: 8 range files listed, only the covering file(s) planned
    val (listed, planned) = KvPruneStats.last(tableDir("zm")).get
    assert(listed == 8 && planned < listed,
      s"expected zone-map skip through SQL, got listed=$listed planned=$planned")
    assert(KvListStats.last(tableDir("zm")).contains("manifest"),
      "catalog scan must plan from manifests, not a directory walk")
    // pushdown is visible in the plan text (connector-evaluated filters)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed="), s"no pushed filters in plan:\n$plan")
  }

  test("ungrouped aggregate over a catalog table is stats-answered") {
    init()
    spark.sql("DROP TABLE IF EXISTS kcs.ns.agg")
    spark.sql("CREATE TABLE kcs.ns.agg (k BIGINT, v BIGINT)")
    spark.range(0, 500).select(col("id").as("k"), (col("id") * 2).as("v"))
      .createOrReplaceTempView("agg_src")
    spark.sql("INSERT INTO kcs.ns.agg SELECT * FROM agg_src")
    val df = spark.sql(
      "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx, sum(v) AS sv FROM kcs.ns.agg")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"),
      s"catalog aggregate must be stats-answered:\n$plan")
    val r = df.collect()(0)
    assert(r.getLong(0) == 500 && r.getLong(1) == 0 && r.getLong(2) == 499 &&
      r.getLong(3) == (0L until 500L).map(_ * 2).sum)
  }

  test("PARTITIONED BY table: GROUP BY the partition column folds sidecars") {
    init()
    spark.sql("DROP TABLE IF EXISTS kcs.ns.part")
    spark.sql("CREATE TABLE kcs.ns.part (g BIGINT, x BIGINT) PARTITIONED BY (g)")
    spark.range(0, 300)
      .select((col("id") % 5).as("g"), col("id").as("x"))
      .createOrReplaceTempView("part_src")
    spark.sql(
      "INSERT INTO kcs.ns.part SELECT /*+ REPARTITION(4, g) */ * FROM part_src")
    val df = spark.sql(
      "SELECT g, count(*) AS n, sum(x) AS sx FROM kcs.ns.part GROUP BY g")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"),
      s"grouped aggregate over the partition column must fold sidecars:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val want = (0L until 300L).groupBy(_ % 5).toSeq.sortBy(_._1)
      .map { case (g, xs) => (g, xs.size.toLong, xs.sum) }
    assert(got == want)
  }

  test("time-travel snapshots are read-only; bad DELETE predicates rejected") {
    init()
    spark.sql("DROP TABLE IF EXISTS kcs.ns.ro")
    spark.sql("CREATE TABLE kcs.ns.ro (k BIGINT, s STRING)")
    spark.sql("INSERT INTO kcs.ns.ro VALUES (1, 'a'), (2, 'b')")
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO kcs.ns.ro VERSION AS OF 1 VALUES (3, 'c')")
    }
    assert(e1 != null)
    // an untranslatable DELETE condition (expression over a column) must
    // fail at analysis, not delete the wrong rows
    val e2 = intercept[Exception] {
      spark.sql("DELETE FROM kcs.ns.ro WHERE k % 2 = 0")
    }
    assert(e2.getMessage.toLowerCase.contains("delete"),
      s"unexpected error: ${e2.getMessage}")
    assert(spark.sql("SELECT count(*) FROM kcs.ns.ro").collect()(0).getLong(0) == 2)
    // ...while a translatable one works
    spark.sql("DELETE FROM kcs.ns.ro WHERE s = 'a'")
    assert(spark.sql("SELECT count(*) FROM kcs.ns.ro").collect()(0).getLong(0) == 1)
  }

  test("catalog DDL surface: list/rename/drop, schema enforcement") {
    init()
    spark.sql("DROP TABLE IF EXISTS kcs.ns.d1")
    spark.sql("DROP TABLE IF EXISTS kcs.ns.d2")
    spark.sql("CREATE TABLE kcs.ns.d1 (k BIGINT)")
    assert(spark.sql("SHOW TABLES IN kcs.ns").collect()
      .map(_.getString(1)).contains("d1"))
    // RENAME target is catalog-relative in Spark SQL
    spark.sql("ALTER TABLE kcs.ns.d1 RENAME TO ns.d2")
    assert(!spark.catalog.tableExists("kcs.ns.d1"))
    spark.sql("DROP TABLE kcs.ns.d2")
    // unsupported column types fail at CREATE, not at first write
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE kcs.ns.bad (k BIGINT, ts TIMESTAMP)")
    }
    assert(e.getMessage.contains("unsupported column type"))
  }
}
