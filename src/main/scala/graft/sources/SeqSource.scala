package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => VExpression, NamedReference, SortDirection, SortOrder => VSortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
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
  *    generates its slice, no driver materialization;
  *  - **COMPLETE aggregate pushdown** (`SupportsPushDownAggregates`):
  *    count/min(id)/max(id)/sum(id), globally or grouped by `tag`, are
  *    answered from the interval arithmetic alone — ZERO rows generated,
  *    no partial/final aggregate in the Spark plan. This is the
  *    connector-side analog of answering `count(*)` from parquet footers
  *    or a warehouse answering an aggregate server-side: at 100 TB the
  *    difference between a metadata lookup and a full scan;
  *  - **limit / top-N pushdown** (`SupportsPushDownLimit` /
  *    `SupportsPushDownTopN`): a LIMIT n (or ORDER BY id LIMIT n) scan
  *    plans an n-row interval slice instead of the full table —
  *    partially pushed, so Spark keeps its (now n-row-cheap) final
  *    limit/sort, but the source stops generating data it knows will be
  *    discarded.
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

  /** Which aggregates the connector can answer in closed form. `CountAll`
    * covers count(*) AND count(col) — no column is ever null here. */
  sealed trait AggKind
  case object CountAll extends AggKind
  case object MinId extends AggKind
  case object MaxId extends AggKind
  case object SumId extends AggKind

  /** A pushed aggregation: optional group-by `tag` plus the agg list. */
  final case class PushedAgg(byTag: Boolean, kinds: Seq[AggKind]) {
    override def toString: String =
      (if (byTag) "group=tag " else "group=() ") + kinds.mkString(",")
  }

  /** The ids in [lo, hi) with id % 10 == r form an arithmetic progression
    * of stride 10: (first, last, n), or None when the range holds none.
    * Exact integer arithmetic — the whole point is that the "storage
    * layer" can answer aggregates without materializing a row. */
  def tagSlice(lo: Long, hi: Long, r: Long): Option[(Long, Long, Long)] = {
    val first = lo + (((r - lo) % 10L) + 10L) % 10L
    if (first >= hi) None
    else {
      val last = first + 10L * ((hi - 1L - first) / 10L)
      Some((first, last, (last - first) / 10L + 1L))
    }
  }

  /** Sum of the arithmetic progression first..last stride 10, n terms —
    * EXACT mod 2^64, matching Spark's wrapping (non-ANSI) Long sum: the
    * even factor is split off BEFORE multiplying (r11 ADVICE — the naive
    * `n*(first+last)/2` loses the carry once the product wraps). `first`
    * and `last` share parity (stride 10), so the midpoint is exact; the
    * remaining wrapped multiply distributes over mod 2^64. */
  def apSum(first: Long, last: Long, n: Long): Long =
    if (n % 2L == 0L) (n / 2L) * (first + last)
    else n * (first + (last - first) / 2L)

  /** ANSI twin: overflow raises (as Spark's own ANSI sum would) instead
    * of wrapping. */
  def apSumChecked(first: Long, last: Long, n: Long): Long =
    try {
      if (n % 2L == 0L) Math.multiplyExact(n / 2L, Math.addExact(first, last))
      else Math.multiplyExact(n, first + (last - first) / 2L)
    } catch { case _: ArithmeticException =>
      throw new ArithmeticException(
        "graft seq source: sum(id) overflows Long (ANSI mode)")
    }
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
    with SupportsPushDownFilters
    with SupportsPushDownAggregates
    with SupportsPushDownLimit
    with SupportsPushDownTopN {

  import SeqSource._

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.schema
  private var agg: Option[PushedAgg] = None
  private var limit: Option[Int] = None
  private var fromTail: Boolean = false

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

  private def isIdRef(e: VExpression): Boolean = e match {
    case f: NamedReference => f.fieldNames.sameElements(Array("id"))
    case _ => false
  }
  private def isColRef(e: VExpression): Boolean = e match {
    case f: NamedReference =>
      f.fieldNames.length == 1 && schemaHas(f.fieldNames()(0))
    case _ => false
  }
  private def schemaHas(n: String) = SeqSource.schema.fieldNames.contains(n)

  /** The shapes answerable in closed form: group by nothing or by `tag`;
    * aggregates from {count(*), count(col) [no nulls ⇒ ≡ count(*)],
    * min(id), max(id), sum(id)}. Anything else is declined and Spark
    * aggregates normally. */
  private def translate(a: Aggregation): Option[PushedAgg] = {
    val byTag = a.groupByExpressions() match {
      case Array() => false
      case Array(f: NamedReference) if f.fieldNames.sameElements(Array("tag")) => true
      case _ => return None
    }
    val kinds = a.aggregateExpressions().toSeq.map[Option[AggKind]] {
      case _: CountStar => Some(CountAll)
      case c: Count if !c.isDistinct && isColRef(c.column) => Some(CountAll)
      case m: Min if isIdRef(m.column) => Some(MinId)
      case m: Max if isIdRef(m.column) => Some(MaxId)
      case s: Sum if !s.isDistinct && isIdRef(s.column) => Some(SumId)
      case _: AggregateFunc => None
    }
    if (kinds.nonEmpty && kinds.forall(_.isDefined)) Some(PushedAgg(byTag, kinds.map(_.get)))
    else None
  }

  /** The connector returns FINAL results (one row per group, globally),
    * so Spark plans no aggregate at all above the scan. */
  override def supportCompletePushDown(a: Aggregation): Boolean =
    limit.isEmpty && translate(a).isDefined

  override def pushAggregation(a: Aggregation): Boolean =
    if (limit.isDefined) false
    else translate(a) match {
      case Some(p) => agg = Some(p); true
      case None => false
    }

  /** Both limit and top-N are PARTIALLY pushed: the source truncates the
    * generated interval, Spark keeps its (now n-row-cheap) final
    * limit/sort. Diamond default from SupportsPushDownLimit/TopN needs an
    * explicit override. */
  override def isPartiallyPushed(): Boolean = true

  /** LIMIT n over the bare scan: generate only an n-row interval slice.
    * Partially pushed (default) — Spark keeps its global limit, which now
    * sees exactly n rows. */
  override def pushLimit(n: Int): Boolean =
    if (agg.isDefined) false
    else { limit = Some(n); fromTail = false; true }

  /** ORDER BY id [ASC|DESC] LIMIT n: the matching interval END is the
    * answer — ascending keeps [lo, lo+n), descending [hi−n, hi). Spark
    * keeps the final (n-row) sort+limit. */
  override def pushTopN(orders: Array[VSortOrder], n: Int): Boolean =
    orders match {
      case Array(o) if agg.isEmpty && isIdRef(o.expression()) =>
        limit = Some(n)
        fromTail = o.direction() == SortDirection.DESCENDING
        true
      case _ => false
    }

  override def build(): Scan = {
    var l = lo
    var h = math.max(lo, hi)
    limit.foreach { n =>
      if (fromTail) l = math.max(l, h - n) else h = math.min(h, l + n)
    }
    new SeqScan(l, h, partitions, required, agg, limit.map(n => (n, fromTail)))
  }
}

case class SeqRangePartition(start: Long, end: Long) extends InputPartition

/** A pushed-aggregation "partition": no row range at all — the single
  * reader answers the aggregate from the interval arithmetic. */
case class SeqAggPartition(lo: Long, hi: Long, agg: SeqSource.PushedAgg,
    ansi: Boolean = false) extends InputPartition

class SeqScan(
    lo: Long, hi: Long, partitions: Int, required: StructType,
    agg: Option[SeqSource.PushedAgg] = None,
    pushedLimit: Option[(Int, Boolean)] = None)
    extends Scan with Batch {

  import SeqSource._

  /** With an aggregation pushed, Spark maps scan output POSITIONALLY:
    * group-by columns first, then one column per aggregate. */
  override def readSchema(): StructType = agg match {
    case None => required
    case Some(PushedAgg(byTag, kinds)) =>
      val g = if (byTag) Seq(StructField("tag", StringType, nullable = false)) else Nil
      val a = kinds.zipWithIndex.map {
        case (CountAll, i) => StructField(s"agg_$i", LongType, nullable = false)
        // min/max/sum of an empty interval are NULL, like SQL says
        case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
      }
      StructType(g ++ a)
  }

  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq[$lo,$hi) cols=${readSchema().fieldNames.mkString(",")}" +
      agg.map(a => s" aggpush=[$a]").getOrElse("") +
      pushedLimit.map { case (n, tail) =>
        s" limitpush=$n${if (tail) " tail" else ""}"
      }.getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    agg.foreach { a =>
      return Array(SeqAggPartition(lo, hi, a,
        org.apache.spark.sql.internal.SQLConf.get.ansiEnabled))
    }
    val n = hi - lo
    val nParts = math.max(1, math.min(partitions.toLong, n).toInt)
    val step = (n + nParts - 1) / nParts
    (0 until nParts).map { i =>
      SeqRangePartition(lo + i * step, math.min(hi, lo + (i + 1) * step))
    }.filter(p => p.end > p.start).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(readSchema().fieldNames)
}

class SeqReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  import SeqSource._

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: SeqRangePartition => rowReader(p)
      case p: SeqAggPartition => aggReader(p)
    }

  private def rowReader(p: SeqRangePartition): PartitionReader[InternalRow] =
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

  /** Closed-form aggregate answers — counts, interval ends, and
    * arithmetic-progression sums; never materializes a source row. */
  private def aggReader(p: SeqAggPartition): PartitionReader[InternalRow] = {
    val sum: (Long, Long, Long) => Long =
      if (p.ansi) apSumChecked else apSum
    val rows: Seq[InternalRow] =
      if (p.agg.byTag) {
        (0L until 10L).flatMap { r =>
          tagSlice(p.lo, p.hi, r).map { case (first, last, n) =>
            InternalRow.fromSeq(
              UTF8String.fromString("t" + r) +: p.agg.kinds.map {
                case CountAll => n
                case MinId => first
                case MaxId => last
                case SumId => sum(first, last, n)
              })
          }
        }
      } else {
        val n = p.hi - p.lo
        Seq(InternalRow.fromSeq(p.agg.kinds.map {
          case CountAll => n
          case MinId => if (n > 0) p.lo else null
          case MaxId => if (n > 0) p.hi - 1 else null
          case SumId => if (n > 0) sum(p.lo, p.hi - 1, n) else null
        }))
      }
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
