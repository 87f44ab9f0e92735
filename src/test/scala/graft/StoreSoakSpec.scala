package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{KvCommitLog, KvStore}

/** N-WRITER MIXED-VERB CONCURRENCY SOAK for the KV store (r13 verdict
  * item 8). ConcurrentCommitSpec pins each pairwise race with surgical
  * chaos hooks; this spec instead lets 4 writers run seed-reproducible
  * RANDOM schedules of the eight mutation verbs — append / overwrite /
  * whole-tag DELETE (copy-on-write AND deletion-vector, r14) / compact /
  * vacuum / purge_dvs / zorder — against one store and asserts the
  * protocol-level invariants that must survive ANY interleaving:
  *
  *  - every operation either commits or aborts with the EXPLICIT OCC
  *    conflict ("superseded the version-N snapshot") — no other failure
  *    mode exists;
  *  - the log stays DENSE: the surviving manifests form a contiguous
  *    version range ending at the head (vacuum may truncate a prefix,
  *    never punch holes);
  *  - every surviving version is READABLE as a snapshot, and versions
  *    below the vacuum horizon fail with the explicit vacuumed error;
  *  - ATOMIC VISIBILITY: writers only commit whole 20-row tag batches
  *    and only delete whole tags, so in every snapshot every tag count
  *    ∈ {0, 20} — a torn commit (the r13 drip-publish bug class) would
  *    surface as a partial tag;
  *  - no phantom rows: every tag in any snapshot was written by some
  *    writer's schedule.
  *
  * Schedules derive from a fixed seed (per-writer Random(Seed+id)), so
  * a failure replays the same op sequences; thread interleaving stays
  * OS-scheduled, which is the point of a soak. */
class StoreSoakSpec extends AnyFunSuite with SparkSessionFixture {

  private val Seed = 20260816L
  private val Writers = 4
  private val OpsPerWriter = 10
  private val BatchRows = 20

  private val schemaDdl = "k BIGINT, tag BIGINT, v BIGINT"
  private lazy val schema = StructType.fromDDL(schemaDdl)

  private def batch(tag: Long) = {
    import spark.implicits._
    (0 until BatchRows).map { i =>
      (tag * 1000L + i, tag, tag + i)
    }.toDF("k", "tag", "v")
  }

  private def write(dir: String, tag: Long, mode: String): Unit =
    batch(tag).write.format("graft.sources.KvSinkProvider")
      .option("path", dir).mode(mode).save()

  private def read(dir: String, asOf: Option[Int] = None) = {
    val r = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", dir).option("schema", schemaDdl)
    asOf.fold(r)(v => r.option("asOfCommit", v.toString)).load()
  }

  test("4 writers x mixed verbs: dense log, readable snapshots, atomic tags") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_soak/${System.nanoTime()}"
    java.nio.file.Files.createDirectories(Paths.get(dir))
    write(dir, tag = 9999L, mode = "append") // v1: a log exists

    val issuedTags = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    issuedTags.add(9999L)
    val unexpected = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val occAborts = new java.util.concurrent.atomic.AtomicInteger()

    def isOcc(e: Throwable): Boolean = {
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      msgs(e).exists(_.contains("superseded the version"))
    }

    val threads = (0 until Writers).map { w =>
      new Thread(() => {
        val rnd = new scala.util.Random(Seed + w)
        for (op <- 0 until OpsPerWriter) {
          val tag = (w + 1) * 100L + op
          try {
            rnd.nextInt(13) match {
              case 0 | 1 | 2 | 3 => // append a fresh whole-tag batch
                issuedTags.add(tag)
                write(dir, tag, "append")
              case 4 => // overwrite: replace everything with one batch
                issuedTags.add(tag)
                write(dir, tag, "overwrite")
              case 5 | 6 => // whole-tag delete (maybe of a never-written tag)
                KvStore.deleteWhere(spark, dir, schema, Seq(
                  org.apache.spark.sql.sources.EqualTo(
                    "tag", (rnd.nextInt(Writers) + 1) * 100L + rnd.nextInt(OpsPerWriter)))): Unit
              case 7 | 8 => // small-files fold
                KvStore.compact(spark, dir, schema, 2): Unit
              case 9 => // reclaim history, keep a 3-version tail
                val keep = KvCommitLog.latestVersion(Paths.get(dir)) - 2
                if (keep >= 2) KvStore.vacuum(dir, keep): Unit
              case 10 => // whole-tag delete by DELETION VECTOR (r14):
                // same tag-atomicity contract, merge-on-read physics
                KvStore.deleteWhereDV(spark, dir, schema, Seq(
                  org.apache.spark.sql.sources.EqualTo(
                    "tag", (rnd.nextInt(Writers) + 1) * 100L + rnd.nextInt(OpsPerWriter)))): Unit
              case 11 => // materialize any live vectors
                KvStore.purgeDvs(spark, dir, schema): Unit
              case 12 => // clustering rewrite (content-invariant)
                KvStore.zorder(spark, dir, schema, ("tag", "k"), 2): Unit
            }
          } catch {
            case e: Throwable if isOcc(e) => occAborts.incrementAndGet(): Unit
            case e: Throwable =>
              unexpected.add(s"w$w op$op ${e.getClass.getSimpleName}: " +
                s"${e.getMessage}"): Unit
          }
          Thread.sleep(rnd.nextInt(20).toLong)
        }
      }, s"soak-w$w")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(300000))

    assert(unexpected.isEmpty,
      s"non-OCC failures under the soak:\n  ${
        scala.jdk.CollectionConverters.IteratorHasAsScala(
          unexpected.iterator).asScala.mkString("\n  ")}")

    // log density: surviving manifests are a contiguous range ending at
    // the head (a vacuumed prefix is fine; a hole is protocol corruption)
    val dirP = Paths.get(dir)
    val latest = KvCommitLog.latestVersion(dirP)
    val vs = KvCommitLog.versions(dirP).map(_._1).sorted
    assert(vs.nonEmpty && vs.last == latest)
    assert(vs == (vs.head to vs.last),
      s"version holes in the commit log: $vs")

    // snapshot readability at EVERY version: readable at-or-above the
    // vacuum horizon, the explicit vacuumed error strictly below it
    var sawReadable = false
    for (v <- 1 to latest) {
      val r = try Right(read(dir, Some(v)).collect()) catch {
        case e: Throwable => Left(e)
      }
      r match {
        case Right(rows) =>
          sawReadable = true
          // atomic visibility: whole tag batches or nothing
          val perTag = rows.groupBy(_.getLong(1)).map { case (t, rs) =>
            t -> rs.length
          }
          perTag.foreach { case (t, n) =>
            assert(n == BatchRows, s"torn tag $t at version $v: $n rows")
            assert(issuedTags.contains(t), s"phantom tag $t at version $v")
          }
        case Left(e) =>
          assert(!sawReadable,
            s"version $v unreadable AFTER a readable one: ${e.getMessage}")
          assert(Option(e.getMessage).exists(m =>
            m.contains("vacuumed") || m.contains("checkpoint")),
            s"version $v failed without the vacuumed error: ${e.getMessage}")
      }
    }
    assert(sawReadable, "no readable snapshot survived the soak")
    info(s"soak: head=$latest, manifests=${vs.size}, " +
      s"occAborts=${occAborts.get()}")
  }
}
