package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL MAINTENANCE PROCEDURES for the store catalog (r13) — the verbs an
  * operator runs on a table, reachable from SQL text so maintenance never
  * leaves the query language (the Iceberg `CALL catalog.system.*` shape,
  * on Spark 4's native procedure API):
  *
  * {{{
  *   CALL graftkv.system.compact('ns.t', 2)     -- in-log small-files fold
  *   CALL graftkv.system.checkpoint('ns.t')     -- bound future log reads
  *   CALL graftkv.system.vacuum('ns.t', 3)      -- reclaim history < 3
  * }}}
  *
  * Each lowers onto the SAME engine verb the API path uses
  * ([[KvStore.compact]], [[KvCommitLog.checkpointNow]],
  * [[KvCommitLog.vacuumDelta]]) and returns a one-row result set (via
  * [[LocalScan]] — driver-side metadata, no job) describing what it did,
  * so `CALL` output is assertable in gates and scripts. */
private[sources] object KvProcedures {

  /** One row of driver-side procedure output. */
  private final case class Result(schema: StructType, row: InternalRow)
      extends LocalScan {
    override def rows(): Array[InternalRow] = Array(row)
    override def readSchema(): StructType = schema
  }

  private def out(row: InternalRow, fields: (String, DataType)*): Iterator[Scan] =
    Iterator.single(Result(
      StructType(fields.map { case (n, t) => StructField(n, t, nullable = false) }),
      row): Scan)

  /** A procedure over one store table: `resolve` maps the user's
    * 'ns.table' string to (dir, currentSchema). */
  private abstract class StoreProcedure(
      procName: String, resolve: String => (String, StructType, String => String),
      params: Seq[ProcedureParameter])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    protected def table(input: InternalRow): (String, StructType) = {
      val (dir, schema, _) = tableWithView(input)
      (dir, schema)
    }
    /** dir, PHYSICAL schema, and the logical→birth column translator
      * (identity on non-evolved tables) — procedure column args are
      * user-facing logical names. */
    protected def tableWithView(input: InternalRow)
        : (String, StructType, String => String) = {
      require(!input.isNullAt(0), s"graft kv catalog: $procName needs a table")
      resolve(input.getUTF8String(0).toString)
    }
  }

  private def tableParam: ProcedureParameter =
    ProcedureParameter.in("table", StringType)
      .comment("store table as 'namespace.name'").build()

  def compact(resolve: String => (String, StructType, String => String)): UnboundProcedure =
    new StoreProcedure("compact", resolve, Seq(tableParam,
      ProcedureParameter.in("target_files", IntegerType)
        .comment("file count to fold the live set into").build())) {
      override def description(): String =
        "fold the live file set into target_files files (one OCC commit; " +
          "time travel preserved until vacuum)"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, schema) = table(input)
        val m = KvStore.compact(SparkSession.active, dir, schema,
          input.getInt(1))
        import scala.jdk.CollectionConverters._
        out(InternalRow(m.version, m.rewritten.toLong, m.rowsAdded),
          "version" -> IntegerType, "files_written" -> LongType,
          "rows" -> LongType).asJava
      }
    }

  def checkpoint(resolve: String => (String, StructType, String => String)): UnboundProcedure =
    new StoreProcedure("checkpoint", resolve, Seq(tableParam)) {
      override def description(): String =
        "write a commit-log checkpoint at the current head (bounds log " +
          "reads; carries txn markers forward)"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, _) = table(input)
        val v = KvCommitLog.checkpointNow(Paths.get(dir))
        import scala.jdk.CollectionConverters._
        out(InternalRow(v), "version" -> IntegerType).asJava
      }
    }

  def vacuum(resolve: String => (String, StructType, String => String)): UnboundProcedure =
    new StoreProcedure("vacuum", resolve, Seq(tableParam,
      ProcedureParameter.in("keep_from", IntegerType)
        .comment("oldest commit version that stays time-travelable").build())) {
      override def description(): String =
        "reclaim files unreachable from snapshots >= keep_from, folding " +
          "dropped history into a checkpoint"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, _) = table(input)
        val doomed = KvCommitLog.vacuumDelta(Paths.get(dir), input.getInt(1))
        import scala.jdk.CollectionConverters._
        out(InternalRow(doomed.size.toLong),
          "files_reclaimed" -> LongType).asJava
      }
    }

  def purgeDvs(resolve: String => (String, StructType, String => String)): UnboundProcedure =
    new StoreProcedure("purge_dvs", resolve, Seq(tableParam)) {
      override def description(): String =
        "materialize deletion vectors: rewrite only the vector-carrying " +
          "files without their deleted rows (one OCC commit; content " +
          "unchanged, read-time subtraction reclaimed)"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, schema) = table(input)
        val m = KvStore.purgeDvs(SparkSession.active, dir, schema)
        import scala.jdk.CollectionConverters._
        out(InternalRow(m.version, m.rewritten.toLong, m.emptied.toLong),
          "version" -> IntegerType, "files_rewritten" -> LongType,
          "files_emptied" -> LongType).asJava
      }
    }

  def zorder(resolve: String => (String, StructType, String => String)): UnboundProcedure =
    new StoreProcedure("zorder", resolve, Seq(tableParam,
      ProcedureParameter.in("columns", StringType)
        .comment("two integer columns as 'a,b' — the interleave order").build(),
      ProcedureParameter.in("target_files", IntegerType)
        .comment("file count to cluster the live set into").build())) {
      override def description(): String =
        "rewrite the live set clustered by the bit-interleaved z-value " +
          "of two columns, so zone maps prune on both at once (one OCC " +
          "commit; content unchanged; time travel preserved until vacuum)"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, schema, toPhys) = tableWithView(input)
        val cols = input.getUTF8String(1).toString.split(",").map(_.trim)
        require(cols.length == 2,
          s"graft kv catalog: zorder needs exactly two columns, got " +
            input.getUTF8String(1))
        val m = KvStore.zorder(SparkSession.active, dir, schema,
          (toPhys(cols(0)), toPhys(cols(1))), input.getInt(2))
        import scala.jdk.CollectionConverters._
        out(InternalRow(m.version, m.rewritten.toLong, m.rowsAdded),
          "version" -> IntegerType, "files_written" -> LongType,
          "rows" -> LongType).asJava
      }
    }

  def restore(resolve: String => (String, StructType, String => String)): UnboundProcedure =
    new StoreProcedure("restore", resolve, Seq(tableParam,
      ProcedureParameter.in("version", IntegerType)
        .comment("committed version whose content becomes the new head").build())) {
      override def description(): String =
        "restore the table to an earlier snapshot as a NEW commit — " +
          "metadata-only (old files re-referenced), history preserved " +
          "and auditable; fails loudly if vacuum reclaimed the target"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, _) = table(input)
        val m = KvStore.restore(dir, input.getInt(1))
        import scala.jdk.CollectionConverters._
        out(InternalRow(m.version, m.untouched.toLong),
          "version" -> IntegerType, "files_live" -> LongType).asJava
      }
    }

  val names: Seq[String] =
    Seq("compact", "checkpoint", "vacuum", "purge_dvs", "zorder", "restore")

  def load(ident: Identifier,
      resolve: String => (String, StructType, String => String)): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"graft kv catalog: procedures live in the 'system' namespace, got " +
        ident.toString)
    ident.name() match {
      case "compact" => compact(resolve)
      case "checkpoint" => checkpoint(resolve)
      case "vacuum" => vacuum(resolve)
      case "purge_dvs" => purgeDvs(resolve)
      case "zorder" => zorder(resolve)
      case "restore" => restore(resolve)
      case other => throw new IllegalArgumentException(
        s"graft kv catalog: unknown procedure '$other' — " +
          s"one of ${names.mkString(", ")}")
    }
  }
}
