package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{KvCommitLog, KvStore}

/** MODEL-BASED DIFFERENTIAL testing of the store's whole mutation-verb
  * surface — the reference's property-testing discipline
  * (/root/reference/test/Generator.hs:83-92: distributed result must
  * equal a naive in-memory evaluator) applied to the transactional
  * store: a seed-reproducible random schedule of all NINE verbs
  *
  *   append · CoW delete · VECTOR delete · CoW merge · VECTOR merge ·
  *   purge_dvs · compact · zorder · restore
  *
  * runs against one store while a trivial `Map[Long, Long]` model (and
  * its per-version history) tracks intended content. After EVERY
  * committed version: store content == model, and a time-travel read of
  * a random surviving version == that version's recorded model. This is
  * the invariant none of the per-verb specs can state — that ANY
  * interleaving of representations (copy-on-write rewrites, deletion
  * vectors, clustering rewrites, snapshot rollbacks) composes to the
  * same simple semantics. */
class StoreModelSpec extends AnyFunSuite with SparkSessionFixture {

  private val Ddl = "k LONG, v LONG"
  private val Schema = StructType.fromDDL(Ddl)
  private val Seeds = Seq(1L, 42L, 20260816L)
  private val OpsPerSeed = 24

  private def readStore(store: String, asOf: Option[Int] = None) = {
    val r = spark.read.format("graft.sources.KvSourceProvider")
      .option("path", store).option("schema", Ddl)
    asOf.fold(r)(v => r.option("asOfCommit", v.toString)).load()
  }

  private def content(store: String, asOf: Option[Int] = None): Map[Long, Long] =
    readStore(store, asOf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def df(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  for (seed <- Seeds) test(s"nine-verb random schedule vs in-memory model (seed $seed)") {
    val d = Files.createTempDirectory(s"graft_model_$seed").toFile
    d.deleteOnExit()
    val store = d.getAbsolutePath
    val dir = Paths.get(store)
    val rnd = new scala.util.Random(seed)

    var model = Map.empty[Long, Long]
    val history = scala.collection.mutable.Map.empty[Int, Map[Long, Long]]
    var nextKey = 0L

    def appendBatch(): String = {
      val n = 20 + rnd.nextInt(30)
      val rows = (0 until n).map { _ =>
        val k = nextKey; nextKey += 1; (k, k * 3 + 1)
      }
      df(rows).repartition(1 + rnd.nextInt(3))
        .write.format("graft.sources.KvSinkProvider")
        .option("path", store).mode("append").save()
      model = model ++ rows
      s"append($n)"
    }

    def someRange(): (Long, Long) = {
      val lo = rnd.nextLong(math.max(nextKey, 1L))
      (lo, lo + 1 + rnd.nextInt(25))
    }

    def someKeys(): Set[Long] =
      (0 until 1 + rnd.nextInt(10))
        .map(_ => rnd.nextLong(math.max(nextKey, 1L))).toSet

    appendBatch()
    history(KvCommitLog.latestVersion(dir)) = model

    var steps = List("append(seed)")
    for (op <- 1 to OpsPerSeed) {
      val verb = rnd.nextInt(12) match {
        case 0 | 1 | 2 => appendBatch()
        case 3 =>
          val (lo, hi) = someRange()
          KvStore.deleteWhere(spark, store, Schema,
            Seq(GreaterThanOrEqual("k", lo), LessThan("k", hi)))
          model = model.filter { case (k, _) => k < lo || k >= hi }
          s"cowDelete[$lo,$hi)"
        case 4 | 5 =>
          val (lo, hi) = someRange()
          KvStore.deleteWhereDV(spark, store, Schema,
            Seq(GreaterThanOrEqual("k", lo), LessThan("k", hi)))
          model = model.filter { case (k, _) => k < lo || k >= hi }
          s"dvDelete[$lo,$hi)"
        case 6 =>
          val ups = someKeys().toSeq.sorted.map(k => (k, -k))
          val dels = someKeys().toSeq.sorted
          KvStore.merge(spark, store, Schema, "k", df(ups), dels)
          model = (model -- dels) ++ ups
          s"cowMerge(${ups.size}u,${dels.size}d)"
        case 7 =>
          val ups = someKeys().toSeq.sorted.map(k => (k, -2 * k - 5))
          val dels = someKeys().toSeq.sorted
          KvStore.mergeDV(spark, store, Schema, "k", df(ups), dels)
          model = (model -- dels) ++ ups
          s"dvMerge(${ups.size}u,${dels.size}d)"
        case 8 =>
          KvStore.purgeDvs(spark, store, Schema); "purgeDvs"
        case 9 =>
          KvStore.compact(spark, store, Schema, 1 + rnd.nextInt(2)); "compact"
        case 10 =>
          KvStore.zorder(spark, store, Schema, ("k", "v"), 2); "zorder"
        case 11 =>
          val vs = history.keys.toSeq.sorted
          val target = vs(rnd.nextInt(vs.size))
          KvStore.restore(store, target)
          model = history(target)
          s"restore($target)"
      }
      steps ::= verb
      val head = KvCommitLog.latestVersion(dir)
      history(head) = model
      val got = content(store)
      assert(got == model,
        s"content drift after op#$op $verb (head=$head)\n" +
          s"  schedule: ${steps.reverse.mkString(" → ")}\n" +
          s"  missing: ${(model.keySet -- got.keySet).toSeq.sorted.take(10)}\n" +
          s"  phantom: ${(got.keySet -- model.keySet).toSeq.sorted.take(10)}\n" +
          s"  changed: ${model.keySet.intersect(got.keySet)
            .filter(k => model(k) != got(k)).toSeq.sorted.take(10)}")
      // time travel: one random surviving recorded version must replay
      val vs = history.keys.toSeq.sorted
      val probe = vs(rnd.nextInt(vs.size))
      assert(content(store, Some(probe)) == history(probe),
        s"time-travel drift at version $probe after op#$op $verb\n" +
          s"  schedule: ${steps.reverse.mkString(" → ")}")
    }
  }
}
