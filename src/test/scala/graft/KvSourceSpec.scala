package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.KvScan

/** DataSource V2 kv SOURCE (sources/KvSource) — the read half of the
  * Store analog: sink→source round trip, hscan-style match pattern,
  * hidden-path discipline, column pruning, connector-side filter
  * pushdown. */
class KvSourceSpec extends AnyFunSuite with SparkSessionFixture {

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_kvsrc_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def writeKv(out: String): Unit = {
    val s = spark
    import s.implicits._
    (0L until 100L).map(i => (i, s"seg${i % 4}", i * 3L))
      .toDF("k", "seg", "v")
      .repartition(4)
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out).mode("append").save()
  }

  private def readKv(out: String) =
    spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out)
      .option("schema", "k LONG, seg STRING, v LONG").load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): KvScan =
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }).head.scan.asInstanceOf[KvScan]

  test("sink → source round trip preserves every row and type") {
    val out = freshDir("roundtrip")
    writeKv(out)
    val got = readKv(out).orderBy("k").collect()
    assert(got.length === 100)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i.toLong)
      assert(r.getString(1) === s"seg${i % 4}")
      assert(r.getLong(2) === i * 3L)
    }
  }

  test("one split per committed file; _staging and hidden files invisible") {
    val out = freshDir("hidden")
    writeKv(out)
    val committed = new File(out).listFiles().count(_.getName.endsWith(".csv"))
    assert(committed === 4) // repartition(4) → 4 task commits
    // plant an orphaned straggler attempt and a hidden file — neither is data
    val staging = new File(out, "_staging"); staging.mkdirs()
    Files.write(new File(staging, "part-9-999.csv").toPath,
      "999,segX,999\n".getBytes)
    Files.write(new File(out, ".hidden.csv").toPath, "998,segX,998\n".getBytes)
    val df = readKv(out)
    assert(scanOf(df).planInputPartitions().length === 4)
    assert(df.count() === 100)
  }

  test("match pattern prunes files before split planning (hscan analog)") {
    val out = freshDir("pattern")
    writeKv(out)
    // a foreign file that the pattern must exclude (it would not parse)
    Files.write(new File(out, "notes.txt").toPath, "not,kv,data\n".getBytes)
    val df = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out).option("pattern", ".csv")
      .option("schema", "k LONG, seg STRING, v LONG").load()
    assert(scanOf(df).planInputPartitions().length === 4)
    assert(df.count() === 100)
  }

  test("column pruning reaches the reader schema") {
    val out = freshDir("prune")
    writeKv(out)
    val df = readKv(out).select("seg")
    assert(scanOf(df).readSchema().fieldNames.toSeq === Seq("seg"))
    assert(df.distinct().count() === 4)
  }

  test("filter pushdown is evaluated connector-side") {
    val out = freshDir("pushdown")
    writeKv(out)
    val df = readKv(out).filter(col("k") >= 90L && col("seg") === "seg2")
    val scan = scanOf(df)
    assert(scan.description().contains("pushed="), scan.description())
    assert(scan.description().contains("GreaterThanOrEqual"), scan.description())
    assert(scan.description().contains("EqualTo"), scan.description())
    // k in [90,100) with k%4==2 → 90, 94, 98
    assert(df.orderBy("k").collect().map(_.getLong(0)).toSeq === Seq(90L, 94L, 98L))
  }

  test("strings with delimiters, newlines and percent signs round-trip") {
    val s = spark
    import s.implicits._
    val out = freshDir("escape")
    val nasty = Seq(
      (0L, "plain", 0L),
      (1L, "comma, inside", 1L),
      (2L, "line\nbreak", 2L),
      (3L, "cr\rlf\n", 3L),
      (4L, "100%,done%25", 4L),
      (5L, "", 5L))
    nasty.toDF("k", "seg", "v").coalesce(1)
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out).mode("append").save()
    val got = readKv(out).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === nasty)
    // and a pushed equality on an escaped value still matches post-decode
    val one = readKv(out).filter(col("seg") === "comma, inside").collect()
    assert(one.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("recursive listing reads per-batch subdirectories, hidden dirs skipped") {
    val s = spark
    import s.implicits._
    val out = freshDir("recursive")
    for (b <- 0 until 3) {
      (0L until 10L).map(i => (b * 10L + i, s"seg$b", i))
        .toDF("k", "seg", "v").coalesce(1)
        .write.format("graft.sources.KvSinkProvider")
        .option("path", s"$out/batch=$b").mode("append").save()
    }
    // a hidden subtree that must stay invisible
    val hid = new File(out, "_aborted"); hid.mkdirs()
    Files.write(new File(hid, "part-0-0.csv").toPath, "999,segX,9\n".getBytes)
    val df = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", out).option("recursive", "true")
      .option("schema", "k LONG, seg STRING, v LONG").load()
    assert(scanOf(df).planInputPartitions().length === 3)
    assert(df.count() === 30)
    assert(df.agg(org.apache.spark.sql.functions.sum("k")).head.getLong(0)
      === (0L until 30L).sum)
    // non-recursive read of the same root sees nothing (files live below)
    assert(readKv(out).count() === 0)
  }

  test("KvEscape round-trips arbitrary strings (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(',', '\n', '\r', '%', '\t', ' ', 'é', '中')))
      .map(_.mkString)
    val prop = Prop.forAll(gen) { s =>
      val e = graft.sources.KvEscape.escape(s)
      // framing invariant: escaped form carries no delimiters…
      !e.contains(",") && !e.contains("\n") && !e.contains("\r") &&
        // …and decoding is the exact inverse
        graft.sources.KvEscape.unescape(e) == s
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("string comparisons and In pushdown") {
    val out = freshDir("strings")
    writeKv(out)
    val df = readKv(out).filter(col("seg").isin("seg1", "seg3") && col("v") < 30L)
    // v = 3k < 30 → k < 10; k%4 ∈ {1,3} → 1,3,5,7,9
    assert(df.orderBy("k").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 3L, 5L, 7L, 9L))
  }

  // ---- mode=net: the same contract over a live KvDaemon socket ----

  private def readNet(out: String, pattern: String = "") = {
    val port = graft.sources.KvDaemon.ensure(out)
    val r = spark.read.format("graft.sources.KvSourceProvider")
      .option("endpoint", s"127.0.0.1:$port")
      .option("schema", "k LONG, seg STRING, v LONG")
    (if (pattern.nonEmpty) r.option("pattern", pattern) else r).load()
  }

  test("net: socket round trip equals the file read") {
    val out = freshDir("netroundtrip")
    writeKv(out)
    val got = readNet(out).orderBy("k").collect()
    assert(got.length === 100)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i.toLong)
      assert(r.getString(1) === s"seg${i % 4}")
      assert(r.getLong(2) === i * 3L)
    }
  }

  test("net: one split per served field; hidden paths never served") {
    val out = freshDir("nethidden")
    writeKv(out)
    val staging = new File(out, "_staging"); staging.mkdirs()
    Files.write(new File(staging, "part-9-999.csv").toPath,
      "999,segX,999\n".getBytes)
    Files.write(new File(out, ".hidden.csv").toPath, "998,segX,998\n".getBytes)
    val df = readNet(out)
    assert(scanOf(df).planInputPartitions().length === 4)
    assert(df.count() === 100)
  }

  test("net: server-side match pattern narrows what the daemon returns") {
    val out = freshDir("netpattern")
    writeKv(out)
    Files.write(new File(out, "notes.txt").toPath, "not,kv,data\n".getBytes)
    val df = readNet(out, pattern = ".csv")
    assert(scanOf(df).planInputPartitions().length === 4)
    assert(df.count() === 100)
  }

  test("net: SCAN pages with a cursor until the server reports exhaustion") {
    val out = freshDir("netpaging")
    writeKv(out) // 4 committed files
    val port = graft.sources.KvDaemon.ensure(out)
    // drive the protocol directly with a page size smaller than the
    // listing: 4 fields at count 1 → 4 pages + terminating cursor 0
    val all = graft.sources.KvDaemon.scanFields(s"127.0.0.1:$port", ".csv")
    assert(all.length === 4)
    val sock = new java.net.Socket("127.0.0.1", port)
    try {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      val os = new java.io.PrintWriter(sock.getOutputStream, true)
      var cursor = 0
      var pages = 0
      val seen = scala.collection.mutable.ArrayBuffer[String]()
      var done = false
      while (!done) {
        os.println(s"SCAN $cursor 1 .csv")
        val head = in.readLine()
        assert(head.startsWith("CUR "), head)
        cursor = head.substring(4).toInt
        var l = in.readLine()
        while (l != "END") {
          assert(l.startsWith("F "), l)
          seen += l.substring(2)
          l = in.readLine()
        }
        pages += 1
        done = cursor == 0
      }
      assert(pages === 4)
      assert(seen.sorted.toSeq === all.sorted)
    } finally sock.close()
  }

  test("net: pruning and pushdown still reach the reader over the socket") {
    val out = freshDir("netpush")
    writeKv(out)
    val df = readNet(out).filter(col("k") >= 90L && col("seg") === "seg2")
      .select("k")
    val scan = scanOf(df)
    assert(scan.readSchema().fieldNames.toSeq === Seq("k"))
    assert(scan.description().contains("GreaterThanOrEqual"), scan.description())
    assert(df.orderBy("k").collect().map(_.getLong(0)).toSeq === Seq(90L, 94L, 98L))
  }

  test("net: escaped strings survive the line-framed protocol") {
    val s = spark
    import s.implicits._
    val out = freshDir("netescape")
    val nasty = Seq(
      (0L, "plain", 0L),
      (1L, "comma, inside", 1L),
      (2L, "line\nbreak", 2L),
      (3L, "100%,done%25", 3L))
    nasty.toDF("k", "seg", "v").coalesce(1)
      .write.format("graft.sources.KvSinkProvider")
      .option("path", out).mode("append").save()
    val got = readNet(out).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === nasty)
  }

  test("net: GET rejects traversal and hidden field names") {
    val out = freshDir("netbadget")
    writeKv(out)
    val port = graft.sources.KvDaemon.ensure(out)
    for (bad <- Seq("../etc/passwd", "_staging/part-0-0.csv", ".hidden.csv")) {
      val sock = new java.net.Socket("127.0.0.1", port)
      try {
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
        val os = new java.io.PrintWriter(sock.getOutputStream, true)
        os.println(s"GET $bad")
        assert(in.readLine().startsWith("ERR"), s"daemon served $bad")
      } finally sock.close()
    }
  }
}
