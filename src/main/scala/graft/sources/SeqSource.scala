package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic sequence source — a full DataSource V2
  * connector (`TableProvider` → `Table` → `ScanBuilder` → `Batch` →
  * `PartitionReader`) demonstrating the source-extension surface the way
  * a real external system would plug in:
  *
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *    materialize only the requested fields;
  *  - **filter pushdown** (`SupportsPushDownFilters`): range predicates
  *    on `id` narrow the generated interval BEFORE partition planning, so
  *    a selective scan plans proportionally fewer/smaller splits;
  *  - **split planning**: the [lo, hi) interval divides into
  *    `partitions` independent readers — at cluster scale each task
  *    generates its slice, no driver materialization.
  *
  * Row semantics (pure integer arithmetic, reproducible anywhere, DuckDB
  * twin = `range(n)`):  id ∈ [0, rows);  val4 = (id·7919) % 10007;
  * tag = 't' ++ (id % 10).
  *
  * Usage: `spark.read.format("graft.sources.SeqSourceProvider")
  * .option("rows", n).option("partitions", p).load()`.
  */
class SeqSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.asScala.getOrElse("rows", "1000").toLong,
      properties.asScala.getOrElse("partitions", "8").toInt)
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val4", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  def val4(id: Long): Long = (id * 7919L) % 10007L
  def tag(id: Long): String = "t" + (id % 10L)
}

class SeqTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, partitions)
}

class SeqScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Range predicates on `id` tighten [lo, hi); everything else stays a
    * post-scan filter (returned as unsupported). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SeqScan(lo, math.max(lo, hi), partitions, required)
}

case class SeqRangePartition(start: Long, end: Long) extends InputPartition

class SeqScan(lo: Long, hi: Long, partitions: Int, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft_seq[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    val nParts = math.max(1, math.min(partitions.toLong, n).toInt)
    val step = (n + nParts - 1) / nParts
    (0 until nParts).map { i =>
      SeqRangePartition(lo + i * step, math.min(hi, lo + (i + 1) * step))
    }.filter(p => p.end > p.start).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

class SeqReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqRangePartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "id" => cur
          case "val4" => SeqSource.val4(cur)
          case "tag" => UTF8String.fromString(SeqSource.tag(cur))
        })
      override def close(): Unit = ()
    }
  }
}
