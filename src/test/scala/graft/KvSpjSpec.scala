package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned reads over the Store (sources/KvSink
  * `partitionColumn` + sources/KvSource `partitionedBy`): the sink lays
  * files out one-per-partition-value (sidecars pin min==max), the source
  * reports `KeyGroupedPartitioning(identity(col))` with one
  * `HasPartitionKey` split per value — so an aggregation keyed on the
  * column, or a join of two co-partitioned stores, plans with ZERO
  * shuffle under `spark.sql.sources.v2.bucketing.enabled`. */
class KvSpjSpec extends AnyFunSuite with SparkSessionFixture {

  private def freshDir(name: String): String = {
    val out = new File(sys.props("java.io.tmpdir"), s"graft-kvspj/$name")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(out)
    out.getAbsolutePath
  }

  private def writePartitioned(out: String, rows: Long, mul: Long): Unit =
    spark.range(0L, rows)
      .select((col("id") % 25L).as("k"), (col("id") * mul).as("v"))
      .repartition(5, col("k"))
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out).option("partitionColumn", "k")
      .mode("append").save()

  private def readPartitioned(out: String, valCol: String) =
    spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out).option("schema", s"k LONG, $valCol LONG")
      .option("partitionedBy", "k").load()

  private def withSpjConf[T](body: => T): T = {
    val old = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldBc = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally {
      old match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      oldBc match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // settle AQE to the final plan
    df.queryExecution.executedPlan.toString
  }

  test("partitionColumn write: each committed file pins one value; 25 groups planned") {
    val out = freshDir("layout")
    writePartitioned(out, 5000L, 1L)
    val data = new File(out).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(data.length === 25, "5 tasks x values, one value per task under repartition(k)")
    data.foreach { f =>
      val st = graft.sources.KvZoneMap.read(f).get
      val (mn, mx) = st.cols("k")
      assert(mn === mx, s"${f.getName} spans k [$mn,$mx]")
    }
    val df = readPartitioned(out, "v")
    assert(df.rdd.getNumPartitions === 25)
    assert(df.count() === 5000L)
  }

  test("groupBy(partition column) aggregates with zero shuffle") {
    val out = freshDir("agg")
    writePartitioned(out, 5000L, 3L)
    withSpjConf {
      val df = readPartitioned(out, "v")
        .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val plan = finalPlan(df)
      assert(!plan.contains("Exchange"), plan)
      val got = df.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val want = (0L until 5000L).map(id => (id % 25L, id * 3L))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (k, xs) => (k, xs.length.toLong, xs.map(_._2).sum) }
      assert(got === want)
    }
  }

  test("storage-partitioned join of two co-partitioned stores: zero shuffle") {
    val a = freshDir("spj-a")
    val b = freshDir("spj-b")
    writePartitioned(a, 5000L, 1L)
    writePartitioned(b, 2500L, 7L)
    withSpjConf {
      val fa = readPartitioned(a, "v")
      val fb = readPartitioned(b, "w")
      val j = fa.join(fb, "k")
        .groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // oracle the join in memory
      val av = (0L until 5000L).map(id => (id % 25L, id))
      val bv = (0L until 2500L).map(id => (id % 25L, id * 7L))
      val bByK = bv.groupBy(_._1)
      val want = av.flatMap { case (k, v) =>
        bByK.getOrElse(k, Nil).map { case (_, w) => (k, v + w) }
      }.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (k, xs) => (k, xs.length.toLong, xs.map(_._2).sum) }
      val got = j.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === want)
    }
  }

  test("one-side shuffle: an unpartitioned frame moves TO the store's grouping") {
    val out = freshDir("oneside")
    writePartitioned(out, 5000L, 1L)
    val old = spark.conf.getOption("spark.sql.sources.v2.bucketing.shuffle.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    try withSpjConf {
      val dim = spark.range(0L, 100L)
        .select((col("id") % 25L).as("k"), col("id").as("z"))
      val j = readPartitioned(out, "v").join(dim, "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v") + col("z")).as("s"))
      // exactly one Exchange in the FINAL plan (AQE prints the initial
      // plan too) — the small frame reshuffles TO the store's key
      // grouping; the store itself never moves
      val plan = finalPlan(j).split("== Initial Plan ==").head
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("Reused"))
      assert(exchanges === 1, plan)
      assert(plan.contains("keygroupedpartitioning"), plan)
      val av = (0L until 5000L).map(id => (id % 25L, id))
      val bv = (0L until 100L).map(id => (id % 25L, id))
      val bByK = bv.groupBy(_._1)
      val want = av.flatMap { case (k, v) =>
        bByK.getOrElse(k, Nil).map { case (_, z) => (k, v + z) }
      }.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (k, xs) => (k, xs.length.toLong, xs.map(_._2).sum) }
      val got = j.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === want)
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
    }
  }

  test("grouped aggregation is shuffle-free even without the v2 bucketing conf") {
    // Spark 4 honors the reported KeyGroupedPartitioning for single-table
    // distribution requirements out of the box; the conf gates JOIN
    // alignment (exercised above). Pin both the plan and the values.
    val out = freshDir("fallback")
    writePartitioned(out, 1000L, 1L)
    val df = readPartitioned(out, "v").groupBy("k").agg(sum(col("v")).as("s"))
    val plan = finalPlan(df)
    assert(!plan.contains("Exchange"), plan)
    assert(df.collect().map(_.getLong(1)).sum === (0L until 1000L).sum)
  }

  test("bucketed co-partitioning: HIGH-cardinality keys join with zero shuffle") {
    // identity partitioning needs low-cardinality values; a derived
    // bucket column (here k % 32 — any deterministic hash works) is the
    // manual-bucketing recipe: partition both stores by the bucket,
    // include it in the join condition (redundant but declarative:
    // bucket is a function of k), and clustering {b} ⊆ join keys {k, b}
    // lets Spark line the stores up without moving either.
    def writeBucketed(out: String, rows: Long, mul: Long): Unit =
      spark.range(0L, rows)
        .select(col("id").as("k"), (col("id") % 32L).as("b"),
          (col("id") * mul).as("v"))
        .repartition(8, col("b"))
        .write.format("graft.sources.KvSinkProvider")
        .option("path", out).option("partitionColumn", "b")
        .mode("append").save()
    val a = freshDir("bkt-a")
    val b = freshDir("bkt-b")
    writeBucketed(a, 50000L, 1L)
    writeBucketed(b, 50000L, 3L)
    // join keys {k, b} are a SUPERSET of the partition keys {b} — sound
    // (equal b ⇒ same split pair) but gated by a planner conf that
    // defaults to requiring the full key match
    val old = spark.conf.getOption("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try withSpjConf {
      def rd(p: String, vc: String) =
        spark.read.format("graft.sources.KvSourceProvider")
          .option("path", p).option("schema", s"k LONG, b LONG, $vc LONG")
          .option("partitionedBy", "b").load()
      val j = rd(a, "v").join(rd(b, "w"), Seq("k", "b"))
        .groupBy("b")
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
      val plan = finalPlan(j).split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"), plan)
      val rows = j.collect()
      assert(rows.map(_.getLong(1)).sum === 50000L)
      assert(rows.map(_.getLong(2)).sum === (0L until 50000L).map(i => i * 4L).sum)
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", v)
      case None => spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
    }
  }

  test("grouped stats aggregate: groupBy(partition column) folds sidecars per value") {
    val out = freshDir("groupagg")
    writePartitioned(out, 5000L, 3L)
    val df = readPartitioned(out, "v")
      .groupBy("k")
      .agg(count(lit(1)).as("n"), min(col("v")).as("v_min"),
        max(col("v")).as("v_max"), sum(col("v")).as("v_sum"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"), plan)
    assert(plan.contains("aggpush"), plan)
    def quad(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val got = df.orderBy("k").collect().map(quad).toSeq
    val want = (0L until 5000L).map(id => (id % 25L, id * 3L))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (k, xs) => (k, xs.length.toLong, xs.map(_._2).min,
        xs.map(_._2).max, xs.map(_._2).sum) }
    assert(got === want)
    // fallback: drop one sidecar — that file parses row-by-row, grouped
    // results stay exact
    val data = new File(out).listFiles().filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(new File(out, graft.sources.KvZoneMap.sidecarName(data.head.getName)).delete())
    val again = readPartitioned(out, "v").groupBy("k")
      .agg(count(lit(1)).as("n"), min(col("v")).as("v_min"),
        max(col("v")).as("v_max"), sum(col("v")).as("v_sum"))
      .orderBy("k").collect().map(quad).toSeq
    assert(again === want)
  }

  test("a store not written with partitionColumn fails fast under partitionedBy") {
    val out = freshDir("notpartitioned")
    spark.range(0L, 100L).select((col("id") % 5L).as("k"), col("id").as("v"))
      .repartition(2)
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out).mode("append").save()
    val e = intercept[Exception] {
      readPartitioned(out, "v").collect()
    }
    assert(e.getMessage.contains("was not written with partitionColumn") ||
      Option(e.getCause).exists(_.getMessage.contains("was not written with partitionColumn")),
      e.toString)
  }
}
