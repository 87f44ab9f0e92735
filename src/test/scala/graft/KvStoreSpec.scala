package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, LessThan}
import org.apache.spark.sql.types.StructType

import graft.sources.{KvCommitLog, KvStore, KvZoneMap}

/** Row-level DELETE/MERGE through the Store's commit log (sources/KvStore)
  * — the r11 verdict's "done" criteria, pinned:
  *
  *  - untouched files stay BYTE-IDENTICAL (zone-map targeting: a file
  *    whose bounds cannot match is never opened, let alone rewritten);
  *  - the mutation is CAS-committed: a concurrent commit stealing the
  *    version slot aborts the mutation with its staged adds rolled back;
  *  - vacuum reclaims the superseded pre-mutation files (and only them);
  *  - rewritten files carry fresh sidecars with the sink's exact stats
  *    discipline — stats-answered aggregates stay a metadata fold (and
  *    stay CORRECT) after a delete.
  */
class KvStoreSpec extends AnyFunSuite with SparkSessionFixture {

  private val schema = StructType.fromDDL("k LONG, v LONG")

  private def freshStore(tag: String, ranges: Int = 4): String = {
    val d = Files.createTempDirectory(s"graft_kvstore_$tag").toFile
    d.deleteOnExit()
    val out = d.getAbsolutePath
    spark.range(0, 100).select(col("id").as("k"), (col("id") * 7).as("v"))
      .repartitionByRange(ranges, col("k"))
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out).mode("append").save()
    out
  }

  private def readKv(out: String, asOf: Option[Int] = None) = {
    val r = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out).option("schema", "k LONG, v LONG")
    asOf.fold(r)(v => r.option("asOfCommit", v.toString)).load()
  }

  private def fileBytes(out: String): Map[String, Seq[Byte]] =
    KvCommitLog.liveFiles(Paths.get(out)).map { n =>
      n -> Files.readAllBytes(Paths.get(out, n)).toSeq
    }.toMap

  test("delete rewrites only zone-map-intersecting files; others byte-identical") {
    val out = freshStore("bytes")
    val before = fileBytes(out)
    assert(before.size == 4)
    val m = KvStore.deleteWhere(spark, out, schema, Seq(LessThan("k", 10L)))
    // keys 0..99 in 4 range files of ~25: k<10 lives in exactly one file
    assert(m.rewritten == 1 && m.emptied == 0 && m.untouched == 3,
      s"expected 1 rewrite / 3 untouched, got $m")
    assert(m.rowsDeleted == 10)
    val after = fileBytes(out)
    val survivors = before.keySet.intersect(after.keySet)
    assert(survivors.size == 3)
    survivors.foreach { n =>
      assert(after(n) == before(n), s"untouched file $n changed bytes")
    }
    assert(readKv(out).count() == 90)
    assert(readKv(out, Some(1)).count() == 100, "pre-delete snapshot lost")
  }

  test("stats-answered aggregates stay metadata-folded AND correct after delete") {
    val out = freshStore("stats")
    KvStore.deleteWhere(spark, out, schema, Seq(LessThan("k", 30L)))
    // every live file must carry a sidecar (rewrites publish fresh ones)
    KvCommitLog.liveFiles(Paths.get(out)).foreach { n =>
      assert(KvZoneMap.read(new java.io.File(out, n)).isDefined,
        s"live file $n lost its sidecar")
    }
    val agg = readKv(out).agg(count(lit(1)).as("n"), min(col("k")).as("mn"),
      max(col("k")).as("mx"), sum(col("v")).as("sv"))
    // the plan is aggregate-free: the scan answers from sidecars
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"expected stats-answered plan:\n$plan")
    val r = agg.collect()(0)
    assert(r.getLong(0) == 70 && r.getLong(1) == 30 && r.getLong(2) == 99)
    assert(r.getLong(3) == (30L until 100L).map(_ * 7).sum)
  }

  test("merge: upsert + delete in one atomic version; history intact") {
    val out = freshStore("merge")
    val upserts = spark.range(0, 5)
      .select(col("id").as("k"), lit(9999L).as("v"))
    val m = KvStore.merge(spark, out, schema, "k", upserts,
      deleteKeys = Seq(97L, 98L, 99L))
    assert(m.version == 2, "merge must be ONE new version")
    assert(m.rowsDeleted == 8 && m.rowsAdded == 5)
    val got = readKv(out).orderBy("k").collect()
    assert(got.length == 97)
    assert(got.take(5).forall(_.getLong(1) == 9999L), "upsert not applied")
    assert(got.last.getLong(0) == 96L, "delete keys survived")
    assert(readKv(out, Some(1)).count() == 100, "pre-merge snapshot lost")
  }

  test("concurrent commit aborts the mutation and rolls back its adds") {
    val out = freshStore("conflict")
    val dir = Paths.get(out)
    val base = KvCommitLog.latestVersion(dir)
    val filesBefore = KvCommitLog.liveFiles(dir)
    // a concurrent writer claims base+1 between our snapshot and commit:
    // simulate by pre-claiming the slot the mutation will CAS into
    KvCommitLog.tryAppendAt(dir, base + 1, Seq.empty)
    val e = intercept[IllegalStateException] {
      KvStore.merge(spark, out, schema, "k",
        spark.range(0, 3).select(col("id").as("k"), lit(1L).as("v")),
        expectedBase = Some(base))
    }
    assert(e.getMessage.contains("superseded"))
    // rolled back: live set unchanged, no stray adds in later history
    assert(KvCommitLog.liveFiles(dir) == filesBefore)
    assert(KvCommitLog.latestVersion(dir) == base + 1)
  }

  test("vacuum reclaims exactly the superseded pre-mutation files") {
    val out = freshStore("vacuum")
    val dir = Paths.get(out)
    val before = KvCommitLog.liveFiles(dir)
    KvStore.deleteWhere(spark, out, schema, Seq(LessThan("k", 50L)))
    val after = KvCommitLog.liveFiles(dir)
    val superseded = (before -- after).toSeq.sorted
    assert(superseded.nonEmpty)
    val reclaimed = KvStore.vacuum(out, keepFrom = 2)
    assert(reclaimed == superseded,
      s"expected $superseded reclaimed, got $reclaimed")
    superseded.foreach(n => assert(!Files.exists(dir.resolve(n))))
    after.foreach(n => assert(Files.exists(dir.resolve(n)), s"live $n deleted"))
    // latest view identical across vacuum; pre-mutation snapshot now throws
    assert(readKv(out).count() == 50)
    intercept[Exception] { readKv(out, Some(1)).count() }
  }

  test("truncate-shaped delete (no filters) empties the store, keeps history") {
    val out = freshStore("truncate")
    val m = KvStore.deleteWhere(spark, out, schema, Nil)
    assert(m.emptied + m.rewritten > 0 && m.rowsDeleted == 100)
    assert(readKv(out).count() == 0)
    assert(readKv(out, Some(1)).count() == 100)
  }

  test("delete matching nothing publishes nothing (no-op, same version)") {
    val out = freshStore("noop")
    val v = KvCommitLog.latestVersion(Paths.get(out))
    val bytes = fileBytes(out)
    val m = KvStore.deleteWhere(spark, out, schema, Seq(EqualTo("k", 12345L)))
    assert(m.version == v && m.rowsDeleted == 0L)
    assert(KvCommitLog.latestVersion(Paths.get(out)) == v)
    assert(fileBytes(out) == bytes)
  }
}
