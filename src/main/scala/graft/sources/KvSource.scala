package graft.sources

import java.io.File
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** File-backed key-value SOURCE — the read half of the Store analog
  * ([[KvSinkProvider]] is the write half). This completes the reference's
  * Redis store round trip (/root/reference/src/Core/Store.hs:99-119):
  * `getDataFromPat` there hscans the hash for fields matching `*pat` and
  * deserializes the matching values; here the committed directory stands
  * in for the hash, one committed file per field, and:
  *
  *  - **split planning**: one [[InputPartition]] per committed file —
  *    each reader parses exactly one task's committed output, so the scan
  *    parallelism equals the sink's write parallelism, with no driver
  *    materialization;
  *  - **match pattern** (`option("pattern", suffix)`): the hscan
  *    `*pat` analog, pruning whole FILES before split planning (the
  *    reference's LocalFileStore does the same with `isSuffixOf`,
  *    Store.hs:79);
  *  - **hidden-path discipline**: underscore-prefixed entries
  *    (`_staging`, orphaned straggler attempts) are never listed — the
  *    commit protocol's invariant that only published files are data;
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *    emit only the requested fields;
  *  - **filter pushdown** (`SupportsPushDownFilters`): comparison
  *    predicates on any column are evaluated inside the reader during the
  *    parse, before any row is handed to Spark — the connector-side
  *    filtering a remote KV store would do server-side;
  *  - **snapshot time travel** (`option("asOfCommit", n)`): split
  *    planning consults the sink's [[KvCommitLog]] and reads exactly the
  *    files published by commits ≤ n — the Delta `versionAsOf` contract
  *    over the Store's own transaction log (flat local stores only).
  *
  * Usage: `spark.read.format("graft.sources.KvSourceProvider")
  * .option("path", dir).option("schema", "k LONG, v LONG").load()`.
  * The schema option is required (the sink's CSV carries no header), and
  * field types are the sink's supported four: long/int/double/string.
  *
  * NET MODE: `.option("endpoint", "host:port")` (instead of `path`)
  * reads through a live [[KvDaemon]] over TCP — split planning pages the
  * committed field names hscan-style, each task GET-streams one field,
  * and the same parse/filter/prune pipeline runs on the fetched lines.
  * The daemon applies the suffix `pattern` and hidden-path discipline
  * server-side and lists recursively.
  */
class KvSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ddl = options.get("schema")
    require(ddl != null && ddl.nonEmpty,
      "graft kv source requires option 'schema' (DDL, e.g. \"k LONG, v LONG\")")
    StructType.fromDDL(ddl)
  }
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvReadTable(
      // mode=net reads through a live KvDaemon at option "endpoint"
      // (host:port) instead of listing the local filesystem; "path" is
      // then unused and may be omitted
      Option(properties.get("endpoint"))
        .map("net://" + _)
        .getOrElse(properties.get("path")),
      schema,
      Option(properties.get("pattern")).getOrElse(""),
      Option(properties.get("recursive")).exists(_.toBoolean),
      // snapshot time travel: plan splits from KvCommitLog manifests
      // with version <= asOfCommit instead of the latest directory view
      Option(properties.get("asOfCommit")).map(_.toInt))
}

class KvReadTable(
    path: String, dataSchema: StructType, pattern: String, recursive: Boolean,
    asOfCommit: Option[Int] = None)
    extends Table with SupportsRead {
  require(path != null && path.nonEmpty,
    "graft kv source requires option 'path' (or 'endpoint' for mode=net)")
  require(asOfCommit.isEmpty || (!path.startsWith("net://") && !recursive),
    "graft kv source: asOfCommit applies to flat local stores only " +
      "(the commit log names files in one directory)")
  override def name(): String = s"graft_kv_source($path)"
  override def schema(): StructType = dataSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(path, dataSchema, pattern, recursive, asOfCommit)
}

class KvScanBuilder(
    path: String, dataSchema: StructType, pattern: String, recursive: Boolean,
    asOfCommit: Option[Int] = None)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = dataSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Comparisons and null checks on schema columns are evaluated in the
    * reader (connector-side, before Spark sees the row); anything else is
    * returned unsupported and stays a post-scan filter. Pushed filters
    * are also RE-returned as post-scan residuals only when rejected —
    * accepted ones are fully handled here. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val names = dataSchema.fieldNames.toSet
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, _) => names(a)
      case GreaterThan(a, _) => names(a)
      case GreaterThanOrEqual(a, _) => names(a)
      case LessThan(a, _) => names(a)
      case LessThanOrEqual(a, _) => names(a)
      case In(a, _) => names(a)
      case IsNotNull(a) => names(a)
      case _ => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new KvScan(path, dataSchema, pattern, required, pushed, recursive, asOfCommit)
}

case class KvFilePartition(file: String) extends InputPartition

/** A network split: one committed field served by a [[KvDaemon]] at
  * `endpoint` — the executor fetches it with a streaming GET. */
case class KvNetPartition(endpoint: String, field: String) extends InputPartition

class KvScan(
    path: String,
    dataSchema: StructType,
    pattern: String,
    required: StructType,
    pushed: Array[Filter],
    recursive: Boolean = false,
    asOfCommit: Option[Int] = None)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_kv($path pat='$pattern'" +
      asOfCommit.map(v => s" asOf=$v").getOrElse("") +
      s") cols=${required.fieldNames.mkString(",")}" +
      (if (pushed.nonEmpty) s" pushed=${pushed.mkString(",")}" else "")

  /** One split per committed file; `_staging` and any other hidden
    * (underscore/dot-prefixed) entries are not data — at EVERY level when
    * `recursive` (the per-batch/partitioned kv layout: `path/batch=N/…`).
    * Listing is sorted so split planning is deterministic.
    *
    * A `net://host:port` path plans against a live [[KvDaemon]] instead:
    * one hscan-style SCAN paging pass fetches the committed field NAMES
    * (the daemon applies the suffix pattern and hidden-path discipline
    * server-side, and is always recursive); each name becomes one
    * network split. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (path.startsWith("net://")) {
      val endpoint = path.stripPrefix("net://")
      return KvDaemon.scanFields(endpoint, pattern)
        .map(KvNetPartition(endpoint, _): InputPartition).toArray
    }
    def visible(f: File) =
      !f.getName.startsWith("_") && !f.getName.startsWith(".")
    def walk(d: File): Seq[File] =
      Option(d.listFiles()).getOrElse(Array.empty[File]).toSeq
        .filter(visible)
        .flatMap { f =>
          if (f.isFile) Seq(f)
          else if (recursive && f.isDirectory) walk(f)
          else Nil
        }
    // Snapshot view: the commit log names exactly the files published by
    // commits <= asOf; later commits' files exist in the directory but
    // are not part of that snapshot. Plan-time metadata only.
    val snapshot: File => Boolean = asOfCommit match {
      case Some(v) =>
        val named = KvCommitLog.filesAsOf(java.nio.file.Paths.get(path), v)
        f => named(f.getName)
      case None => _ => true
    }
    walk(new File(path))
      .filter(f => f.getName.endsWith(pattern) && snapshot(f))
      .map(_.getAbsolutePath)
      .sorted
      .map(KvFilePartition(_): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(dataSchema, required.fieldNames, pushed)
}

class KvReaderFactory(
    dataSchema: StructType,
    requiredFields: Array[String],
    pushed: Array[Filter])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    // same parse/filter/project pipeline over either line stream: a
    // local committed file or a daemon-served network fetch
    val (lineSrc, closer): (Iterator[String], () => Unit) = partition match {
      case KvFilePartition(file) =>
        val src = scala.io.Source.fromFile(file, "UTF-8")
        (src.getLines(), () => src.close())
      case KvNetPartition(endpoint, field) =>
        val fl = new KvDaemon.FieldLines(endpoint, field)
        (fl, () => fl.close())
    }
    val idx = dataSchema.fieldNames.zipWithIndex.toMap
    val types = dataSchema.fields.map(_.dataType)
    val outIdx = requiredFields.map(idx)

    new PartitionReader[InternalRow] {
      private val lines = lineSrc
      private var current: Array[Any] = _

      /** Parse one CSV line into typed values (the sink writes
        * long/int/double/string with no quoting or embedded commas for
        * the numeric types; strings are written verbatim, so a trailing
        * -1 split limit preserves empty fields). */
      private def parse(line: String): Array[Any] = {
        val parts = line.split(",", -1)
        Array.tabulate(types.length) { i =>
          types(i) match {
            case LongType => parts(i).toLong
            case IntegerType => parts(i).toInt
            case DoubleType => parts(i).toDouble
            case StringType => KvEscape.unescape(parts(i))
            case dt => throw new IllegalArgumentException(
              s"graft kv source: unsupported field type ${dt.catalogString}")
          }
        }
      }

      private def cmp(colV: Any, litV: Any): Int = colV match {
        case l: Long => java.lang.Long.compare(l, litV.asInstanceOf[Number].longValue())
        case i: Int => java.lang.Long.compare(i.toLong, litV.asInstanceOf[Number].longValue())
        case d: Double => java.lang.Double.compare(d, litV.asInstanceOf[Number].doubleValue())
        case s: String => s.compareTo(litV.toString)
        case _ => throw new IllegalArgumentException(s"graft kv source: uncomparable $colV")
      }

      private def eval(f: Filter, row: Array[Any]): Boolean = f match {
        case EqualTo(a, v) => cmp(row(idx(a)), v) == 0
        case GreaterThan(a, v) => cmp(row(idx(a)), v) > 0
        case GreaterThanOrEqual(a, v) => cmp(row(idx(a)), v) >= 0
        case LessThan(a, v) => cmp(row(idx(a)), v) < 0
        case LessThanOrEqual(a, v) => cmp(row(idx(a)), v) <= 0
        case In(a, vs) => vs.exists(v => cmp(row(idx(a)), v) == 0)
        case IsNotNull(_) => true // the sink never writes nulls
        case _ => true
      }

      override def next(): Boolean = {
        current = null
        while (current == null && lines.hasNext) {
          val line = lines.next()
          if (line.nonEmpty) {
            val row = parse(line)
            if (pushed.forall(eval(_, row))) current = row
          }
        }
        current != null
      }

      override def get(): InternalRow =
        InternalRow.fromSeq(outIdx.toSeq.map { i =>
          current(i) match {
            case s: String => UTF8String.fromString(s)
            case v => v
          }
        })

      override def close(): Unit = closer()
    }
  }
}
