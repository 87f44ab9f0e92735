package graft

import org.scalatest.funsuite.AnyFunSuite

/** MODEL-BASED DIFFERENTIAL soak for the CATALOG's schema-evolution
  * surface (r15) — the StoreModelSpec discipline lifted one tier up: a
  * seed-reproducible random schedule of DDL + DML verbs
  *
  *   insert · add column · RENAME column · DROP column · range delete ·
  *   SQL UPDATE · compact · zorder
  *
  * runs against one catalog table while a trivial in-memory model
  * (visible columns by BIRTH name + rows keyed by pk) tracks intended
  * content AND presentation. After every verb: `SELECT *` equals the
  * model's logical projection (names, order, values, nulls), and a
  * random recorded commit version time-travels to ITS day's schema and
  * content — the invariant the per-verb KvCatalogSpec tests cannot
  * state: that ANY interleaving of metadata-only evolutions with
  * content mutations and layout rewrites presents one consistent view.
  */
class CatalogEvolutionModelSpec extends AnyFunSuite with SparkSessionFixture {

  private val Seeds = Seq(7L, 20260816L)
  private val OpsPerSeed = 18

  private lazy val warehouse = {
    val d = java.nio.file.Files.createTempDirectory("graft_evomodel").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** One visible column: birth (physical) name, current logical name. */
  private case class Col(birth: String, logical: String)

  for (seed <- Seeds) test(s"evolution verbs vs in-memory model (seed $seed)") {
    spark.conf.set("spark.sql.catalog.kem", "graft.sources.KvCatalog")
    spark.conf.set("spark.sql.catalog.kem.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS kem.ns")
    val tbl = s"kem.ns.m$seed"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, a BIGINT, b STRING)")

    val rnd = new scala.util.Random(seed)
    // visible columns in physical order (k is the pk and never evolves)
    var cols = Vector(Col("k", "k"), Col("a", "a"), Col("b", "b"))
    // rows: pk -> (birth name -> value); absent birth = null
    var rows = Map.empty[Long, Map[String, Any]]
    var nextKey = 0L
    var nextBirth = 0
    val history =
      scala.collection.mutable.Map.empty[Int, (Vector[Col], Map[Long, Map[String, Any]])]

    def lit(c: Col, k: Long): (String, Any) =
      if (c.birth == "k") (k.toString, k)
      else if (c.birth == "b") (s"'s$k'", s"s$k")
      else ((k * 7 + c.birth.length).toString, k * 7 + c.birth.length)

    def version: Int =
      graft.sources.KvCommitLog.latestVersion(
        java.nio.file.Paths.get(s"$warehouse/ns/m$seed"))

    def checkNow(): Unit = {
      val got = spark.sql(s"SELECT * FROM $tbl").collect()
      assert(got.headOption.forall(_.schema.fieldNames.toSeq ==
        cols.map(_.logical)) &&
        spark.table(tbl).columns.toSeq == cols.map(_.logical),
        s"schema drift: got ${spark.table(tbl).columns.toSeq}, " +
          s"want ${cols.map(_.logical)}")
      val gotRows = got.map { r =>
        r.getLong(0) -> cols.zipWithIndex.map { case (c, i) =>
          c.birth -> (if (r.isNullAt(i)) null else r.get(i))
        }.toMap
      }.toMap
      val want = rows.map { case (k, m) =>
        k -> cols.map(c => c.birth -> m.getOrElse(c.birth, null)).toMap
      }
      assert(gotRows == want,
        s"content drift\n  missing: ${(want.keySet -- gotRows.keySet).take(5)}" +
          s"\n  phantom: ${(gotRows.keySet -- want.keySet).take(5)}\n  diff: " +
          want.keySet.intersect(gotRows.keySet)
            .filter(k => want(k) != gotRows(k)).take(3)
            .map(k => s"$k: want=${want(k)} got=${gotRows(k)}").mkString("; "))
    }

    def probeHistory(): Unit = if (history.nonEmpty) {
      val vs = history.keys.toSeq.sorted
      val v = vs(rnd.nextInt(vs.size))
      val (hcols, hrows) = history(v)
      val df = spark.sql(s"SELECT * FROM $tbl VERSION AS OF $v")
      assert(df.columns.toSeq == hcols.map(_.logical),
        s"time-travel schema drift at v$v: got ${df.columns.toSeq}, " +
          s"want ${hcols.map(_.logical)}")
      val got = df.collect().map { r =>
        r.getLong(0) -> hcols.zipWithIndex.map { case (c, i) =>
          c.birth -> (if (r.isNullAt(i)) null else r.get(i))
        }.toMap
      }.toMap
      val want = hrows.map { case (k, m) =>
        k -> hcols.map(c => c.birth -> m.getOrElse(c.birth, null)).toMap
      }
      assert(got == want, s"time-travel content drift at v$v")
    }

    def insertBatch(): String = {
      val n = 5 + rnd.nextInt(10)
      val vals = (0 until n).map { _ =>
        val k = nextKey; nextKey += 1
        val cells = cols.map(c => lit(c, k))
        rows += k -> cols.zip(cells).map { case (c, (_, v)) => c.birth -> v }.toMap
        cells.map(_._1).mkString("(", ", ", ")")
      }
      spark.sql(s"INSERT INTO $tbl VALUES ${vals.mkString(", ")}")
      s"insert($n)"
    }

    insertBatch()
    history(version) = (cols, rows)

    var steps = List("insert(seed)")
    for (op <- 1 to OpsPerSeed) {
      val verb = rnd.nextInt(10) match {
        case 0 | 1 =>
          val v = insertBatch(); history(version) = (cols, rows); v
        case 2 =>
          val birth = s"c$nextBirth"; nextBirth += 1
          spark.sql(s"ALTER TABLE $tbl ADD COLUMN $birth BIGINT")
          cols = cols :+ Col(birth, birth)
          s"add($birth)"
        case 3 =>
          // rename a random non-pk visible column to a fresh name
          val i = 1 + rnd.nextInt(cols.size - 1)
          val to = s"r${nextBirth}_${cols(i).birth}"; nextBirth += 1
          spark.sql(s"ALTER TABLE $tbl RENAME COLUMN ${cols(i).logical} TO $to")
          cols = cols.updated(i, cols(i).copy(logical = to))
          s"rename(${cols(i).birth}->$to)"
        case 4 if cols.size > 2 =>
          val i = 1 + rnd.nextInt(cols.size - 1)
          val victim = cols(i)
          spark.sql(s"ALTER TABLE $tbl DROP COLUMN ${victim.logical}")
          cols = cols.patch(i, Nil, 1)
          s"drop(${victim.birth})"
        case 5 =>
          val lo = rnd.nextLong(math.max(nextKey, 1L))
          val hi = lo + 1 + rnd.nextInt(8)
          spark.sql(s"DELETE FROM $tbl WHERE k >= $lo AND k < $hi")
          rows = rows.filter { case (k, _) => k < lo || k >= hi }
          history(version) = (cols, rows)
          s"delete[$lo,$hi)"
        case 6 =>
          // update a random non-pk LONG column through its logical name
          val longCols = cols.tail.filter(_.birth != "b")
          if (longCols.isEmpty) "skip"
          else {
            val c = longCols(rnd.nextInt(longCols.size))
            val lo = rnd.nextLong(math.max(nextKey, 1L))
            spark.sql(
              s"UPDATE $tbl SET ${c.logical} = k * 100 WHERE k >= $lo")
            rows = rows.map { case (k, m) =>
              k -> (if (k >= lo) m + (c.birth -> (k * 100)) else m)
            }
            history(version) = (cols, rows)
            s"update(${c.birth}, k>=$lo)"
          }
        case 7 =>
          spark.sql(s"CALL kem.system.compact('ns.m$seed', ${1 + rnd.nextInt(2)})")
            .collect()
          history(version) = (cols, rows)
          "compact"
        case 8 =>
          val longCols = cols.filter(_.birth != "b")
          if (longCols.size < 2) "skip"
          else {
            val c2 = longCols.tail(rnd.nextInt(longCols.size - 1))
            spark.sql(
              s"CALL kem.system.zorder('ns.m$seed', 'k,${c2.logical}', 2)")
              .collect()
            history(version) = (cols, rows)
            s"zorder(k,${c2.birth})"
          }
        case _ =>
          val v = insertBatch(); history(version) = (cols, rows); v
      }
      steps ::= verb
      withClue(s"after op#$op $verb\n  schedule: " +
          steps.reverse.mkString(" -> ") + "\n") {
        checkNow()
        probeHistory()
      }
    }
  }
}
