package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{KvCommitLog, KvStore}

/** READERS vs VACUUM CHURN — the regression test for the torn-listing
  * race the 8-verb soak caught: a reader lists the commit-log manifests,
  * a concurrent vacuum deletes one it folded into its checkpoint, and
  * the reader's `linesOf` hits NoSuchFileException. The fix is a bounded
  * re-list retry in `stateAsOf` / `vacuumDelta`'s read phase /
  * `txnCommitted` — sound because vacuum publishes its checkpoint
  * durably BEFORE deleting what the checkpoint folds, so the retry
  * always converges on consistent state.
  *
  * One writer loops append → vacuum-to-head (maximum manifest churn:
  * every cycle deletes all prior manifests); reader threads hammer
  * `stateAsOf`, snapshot reads at the current head, and `txnCommitted`.
  * Invariants: no reader ever surfaces a file-vanished error, and every
  * successfully read state is a PLAUSIBLE snapshot (row count is a
  * multiple of the batch size — a torn fold would show a partial
  * batch). */
class VacuumChurnSpec extends AnyFunSuite with SparkSessionFixture {

  private val Ddl = "k LONG, v LONG"
  private val Schema = StructType.fromDDL(Ddl)
  private val Batch = 25
  private val Cycles = 30

  test("stateAsOf/txnCommitted never tear while vacuum churns the log") {
    val d = Files.createTempDirectory("graft_vacchurn").toFile
    d.deleteOnExit()
    val store = d.getAbsolutePath
    val dir = Paths.get(store)
    import spark.implicits._

    def append(tag: Long): Unit =
      (0 until Batch).map(i => (tag * 1000L + i, tag)).toDF("k", "v")
        .coalesce(1)
        .write.format("graft.sources.KvSinkProvider")
        .option("path", store).mode("append").save()

    append(0L)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicInteger()

    val readers = (0 until 3).map { r =>
      new Thread(() => {
        val rnd = new scala.util.Random(7L + r)
        while (!stop.get()) {
          try {
            rnd.nextInt(3) match {
              case 0 =>
                val head = KvCommitLog.latestVersion(dir)
                val (live, _) = KvCommitLog.stateAsOf(dir, head)
                assert(live.nonEmpty)
              case 1 =>
                // a full snapshot read through the scan path
                val n = spark.read.format("graft.sources.KvSourceProvider")
                  .option("path", store).option("schema", Ddl).load().count()
                if (n % Batch != 0)
                  failures.add(s"reader$r: torn snapshot count $n"): Unit
              case 2 =>
                KvCommitLog.txnCommitted(dir, "never-committed"): Unit
            }
            reads.incrementAndGet(): Unit
          } catch {
            // a vacuumed-below-horizon error is a legitimate outcome of
            // racing the horizon; a vanished-file error is the bug
            case e: Throwable =>
              val m = Option(e.getMessage).getOrElse(e.getClass.getName)
              if (!m.contains("vacuumed") && !m.contains("reconstructible"))
                failures.add(s"reader$r: ${e.getClass.getSimpleName}: $m"): Unit
          }
        }
      }, s"churn-reader-$r")
    }
    readers.foreach(_.start())
    try {
      for (c <- 1 to Cycles) {
        append(c.toLong)
        // vacuum to the head: deletes every prior manifest each cycle
        KvStore.vacuum(store, KvCommitLog.latestVersion(dir))
      }
    } finally {
      stop.set(true)
      readers.foreach(_.join(60000))
    }
    assert(failures.isEmpty,
      s"reader failures under vacuum churn (reads=${reads.get()}):\n  " +
        scala.jdk.CollectionConverters.IteratorHasAsScala(
          failures.iterator).asScala.mkString("\n  "))
    assert(reads.get() > 0)
    // the store itself stays exact
    val n = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", store).option("schema", Ddl).load().count()
    assert(n == (Cycles + 1).toLong * Batch)
  }
}
