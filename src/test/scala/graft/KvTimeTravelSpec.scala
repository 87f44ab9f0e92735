package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.KvCommitLog

/** Commit log + snapshot time travel (sources/KvCommitLog,
  * q_store_timetravel's mechanism): every sink commit appends a dense
  * manifest version, `asOfCommit=N` reads exactly the union of commits
  * ≤ N, the latest view sees everything, and the log stays invisible to
  * listing-based consumers. */
class KvTimeTravelSpec extends AnyFunSuite with SparkSessionFixture {

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_kvtt_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Three commits: ks in [0,10), [10,20), [20,30). */
  private def writeCommits(out: String): Unit = {
    val s = spark
    import s.implicits._
    for (b <- 0 until 3)
      (b * 10 until (b + 1) * 10).map(i => (i.toLong, i * 7L))
        .toDF("k", "v")
        .repartition(2)
        .write.format("graft.sources.KvSinkProvider")
        .option("path", out).mode("append").save()
  }

  private def readAsOf(out: String, asOf: Option[Int]) = {
    val r = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out).option("schema", "k LONG, v LONG")
    asOf.fold(r)(v => r.option("asOfCommit", v.toString)).load()
  }

  test("asOfCommit=N sees exactly the union of commits <= N") {
    val out = freshDir("asof")
    writeCommits(out)
    assert(KvCommitLog.latestVersion(Paths.get(out)) === 3)
    for (n <- 1 to 3) {
      val ks = readAsOf(out, Some(n)).select("k").collect().map(_.getLong(0)).sorted
      assert(ks.toSeq === (0L until n * 10L), s"asOf=$n")
    }
    // latest view == highest version
    val latest = readAsOf(out, None).select("k").collect().map(_.getLong(0)).sorted
    assert(latest.toSeq === (0L until 30L))
    // asOf past the head behaves like latest (no future files to include)
    val beyond = readAsOf(out, Some(99)).count()
    assert(beyond === 30L)
    // asOf before the first commit is an empty snapshot, not an error
    assert(readAsOf(out, Some(0)).count() === 0L)
  }

  test("snapshots compose with the suffix pattern and pushed filters") {
    val out = freshDir("compose")
    writeCommits(out)
    val got = readAsOf(out, Some(2)).filter(col("k") >= 5L)
      .select("k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (5L until 20L))
  }

  test("manifests are hidden from listing consumers and versions are dense") {
    val out = freshDir("hidden")
    writeCommits(out)
    val vs = KvCommitLog.versions(Paths.get(out)).map(_._1)
    assert(vs === Seq(1, 2, 3))
    // the default (latest) read plans only data files — row count proves
    // no manifest leaked into split planning (a manifest line would fail
    // the CSV parse; equality with 30 rows is the stronger check anyway)
    assert(readAsOf(out, None).count() === 30L)
    // each manifest names files that all exist in the directory
    val dir = Paths.get(out)
    for (n <- 1 to 3) {
      val named = KvCommitLog.filesAsOf(dir, n)
      assert(named.nonEmpty)
      named.foreach(f => assert(Files.exists(dir.resolve(f)), s"missing $f"))
    }
  }

  test("asOfCommit rejects net and recursive modes") {
    val out = freshDir("reject")
    writeCommits(out)
    intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.KvSourceProvider")
        .option("path", out).option("schema", "k LONG, v LONG")
        .option("recursive", "true").option("asOfCommit", "1").load()
    }
  }
}
