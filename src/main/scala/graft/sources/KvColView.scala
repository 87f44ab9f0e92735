package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** COLUMN-LEVEL SCHEMA EVOLUTION view (r15): `ALTER TABLE DROP COLUMN` /
  * `RENAME COLUMN` as METADATA-ONLY operations over the positional store.
  *
  * The store's rows are positional and its layout history is append-only
  * (the r13 ADD COLUMN discipline: columns only ever append at the end,
  * readers null-fill past a row's width). A column's PHYSICAL identity is
  * therefore its position plus its BIRTH NAME — the name it was created
  * under, which is what every committed artifact (zone-map sidecars,
  * Bloom filters, data-file parse layout) is keyed by, forever. DROP and
  * RENAME never touch any of that:
  *
  *  - RENAME changes only the LOGICAL presentation: a `rename` line in
  *    `_meta` maps the birth name to its current visible name from a
  *    start version on. Old sidecars keep pruning because everything
  *    below the catalog boundary still speaks birth names.
  *  - DROP hides the position: a `drop` line tombstones the birth name
  *    from its start version on. Reads project it out; writes null-fill
  *    the position (a placeholder char per row in the line format);
  *    sidecar entries for it are simply never consulted. Time travel
  *    below the drop still reads the column — the files were never
  *    touched.
  *
  * This class is the whole translation: the full physical era layout plus
  * each position's logical visibility. Everything below the catalog
  * boundary (KvScan, KvSink, KvStore, zone maps, DVs) is untouched and
  * name-pure; [[KvViewScanBuilder]]/[[KvExpandingWriterFactory]] translate
  * at the boundary. (Delta/Iceberg solve the same problem with numeric
  * field ids; birth names are this store's ids, with the one documented
  * restriction that a NEW column may not reuse ANY historical birth name.)
  */
final case class KvColView(
    physical: StructType,
    names: Seq[Option[String]]) {
  require(physical.length == names.length,
    s"view arity ${names.length} != physical arity ${physical.length}")

  /** The visible schema, logical names, physical order, drops removed. */
  val logical: StructType = StructType(
    physical.fields.zip(names).collect {
      case (f, Some(n)) => f.copy(name = n)
    })

  /** Is this view a no-op (no drops, no renames)? The catalog skips the
    * translation layer entirely for identity views. */
  val isIdentity: Boolean =
    names.zip(physical.fieldNames).forall { case (n, p) => n.contains(p) }

  private val toPhys: Map[String, String] =
    physical.fieldNames.zip(names).collect {
      case (p, Some(n)) => n -> p
    }.toMap
  private val toLogical: Map[String, String] =
    toPhys.map(_.swap)

  /** Logical → physical (birth) column name; visible names only. */
  def physOf(logicalName: String): String = toPhys.getOrElse(logicalName,
    throw new IllegalArgumentException(
      s"graft kv catalog: unknown column '$logicalName' " +
        s"(visible: ${logical.fieldNames.mkString(",")})"))

  def logicalOf(physName: String): String = toLogical.getOrElse(physName,
    throw new IllegalArgumentException(
      s"graft kv catalog: physical column '$physName' is not visible"))

  /** Rename a struct's fields logical→physical (positions untouched). */
  def toPhysSchema(s: StructType): StructType =
    StructType(s.fields.map(f =>
      if (toPhys.contains(f.name)) f.copy(name = toPhys(f.name)) else f))

  /** Rename a struct's fields physical→logical; fields outside the map
    * (metadata columns like `_file`) pass through unchanged. */
  def toLogicalSchema(s: StructType): StructType =
    StructType(s.fields.map(f =>
      if (toLogical.contains(f.name)) f.copy(name = toLogical(f.name)) else f))

  /** Rewrite a V1 filter's column references logical→physical. Unknown
    * filter shapes return None — the caller keeps them as residuals
    * (never pushed, so correctness is preserved; Spark re-evaluates). */
  def filterToPhys(f: Filter): Option[Filter] = mapFilter(f, toPhys)
  def filterToLogical(f: Filter): Option[Filter] = mapFilter(f, toLogical)

  private def mapFilter(f: Filter, m: Map[String, String]): Option[Filter] = {
    def col(a: String): Option[String] = m.get(a)
    f match {
      case EqualTo(a, v) => col(a).map(EqualTo(_, v))
      case EqualNullSafe(a, v) => col(a).map(EqualNullSafe(_, v))
      case GreaterThan(a, v) => col(a).map(GreaterThan(_, v))
      case GreaterThanOrEqual(a, v) => col(a).map(GreaterThanOrEqual(_, v))
      case LessThan(a, v) => col(a).map(LessThan(_, v))
      case LessThanOrEqual(a, v) => col(a).map(LessThanOrEqual(_, v))
      case In(a, vs) => col(a).map(In(_, vs))
      case IsNull(a) => col(a).map(IsNull)
      case IsNotNull(a) => col(a).map(IsNotNull)
      case StringStartsWith(a, v) => col(a).map(StringStartsWith(_, v))
      case StringEndsWith(a, v) => col(a).map(StringEndsWith(_, v))
      case StringContains(a, v) => col(a).map(StringContains(_, v))
      case And(l, r) =>
        for (lm <- mapFilter(l, m); rm <- mapFilter(r, m)) yield And(lm, rm)
      case Or(l, r) =>
        for (lm <- mapFilter(l, m); rm <- mapFilter(r, m)) yield Or(lm, rm)
      case Not(c) => mapFilter(c, m).map(Not)
      case _ => None
    }
  }

  /** For each PHYSICAL position: the index of the source column in a
    * LOGICAL-schema row, or -1 (dropped — null-fill). Used by the
    * expanding writer so every committed file keeps the full positional
    * layout regardless of the era it was written in. */
  def writeMapping: Array[Int] = {
    val logIdx = logical.fieldNames.zipWithIndex.toMap
    names.map {
      case Some(n) => logIdx(n) // names holds logical names
      case None => -1
    }.toArray
  }
}

/** Scan-builder boundary translation for an evolved table: Spark speaks
  * logical names, the delegate [[KvScanBuilder]] (constructed over the
  * PHYSICAL era schema) speaks birth names. Data rows are positional —
  * only names cross the boundary, so the wrapped Batch/readers are the
  * delegate's own, untouched.
  *
  * Deliberately NOT forwarded on evolved tables (correctness-neutral,
  * each loses only an optimization): aggregate pushdown, storage-
  * partitioned join reporting, and runtime V2 filtering — each would
  * need V2 expression-tree renames; an evolved table falls back to
  * ordinary scans + Spark-side aggregation until field-id plumbing
  * reaches those paths. */
class KvViewScanBuilder(delegate: KvScanBuilder, view: KvColView)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(view.toPhysSchema(requiredSchema))

  private var accepted: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // translate what we can; untranslatable shapes stay Spark-side
    val (mapped, unmapped) = filters.partition(f => view.filterToPhys(f).isDefined)
    val residualPhys = delegate.pushFilters(mapped.flatMap(view.filterToPhys))
    accepted = mapped.filterNot(f =>
      residualPhys.contains(view.filterToPhys(f).get))
    unmapped ++ residualPhys.flatMap(view.filterToLogical)
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = new KvViewScan(delegate.build(), view)
}

/** The built-scan half of the boundary: physical rows pass through
  * untouched (positional), readSchema is re-presented logically. */
class KvViewScan(delegate: Scan, view: KvColView)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType =
    view.toLogicalSchema(delegate.readSchema())
  override def description(): String = s"graft_kv_view(${delegate.description()})"

  override def toBatch: Batch = this
  private def batch = delegate.toBatch
  override def planInputPartitions(): Array[InputPartition] =
    batch.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory =
    batch.createReaderFactory()

  override def estimateStatistics(): Statistics = delegate match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    delegate.toMicroBatchStream(checkpointLocation)
}

/** Write-side boundary translation: Spark hands LOGICAL rows; every
  * committed file must carry the FULL physical positional layout (a
  * mid-schema drop would otherwise shift every later column's position
  * in new files and misalign positional parsing). Wraps the real
  * [[KvWriterFactory]] — which is constructed over the physical schema,
  * so sidecar stats/Blooms stay keyed by birth names — and expands each
  * row: visible positions copy through, dropped positions null-fill. */
case class KvExpandingWriterFactory(delegate: KvWriterFactory,
    physTypes: Array[org.apache.spark.sql.types.DataType],
    mapping: Array[Int]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = {
    val inner = delegate.createWriter(partitionId, taskId)
    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        val out = new GenericInternalRow(mapping.length)
        var i = 0
        while (i < mapping.length) {
          val src = mapping(i)
          if (src >= 0 && !row.isNullAt(src))
            out.update(i, row.get(src, physTypes(i)))
          // else: stays null (dropped position, or a null source value)
          i += 1
        }
        inner.write(out)
      }
      override def commit() = inner.commit()
      override def abort(): Unit = inner.abort()
      override def close(): Unit = inner.close()
    }
  }
}
