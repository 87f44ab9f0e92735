package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.unsafe.types.UTF8String

/** SQL TABLE-VALUED surface for the store's change data feed (r13
  * verdict item 5) — the Delta-lake `table_changes` shape:
  *
  * {{{
  *   SELECT * FROM table_changes('graftkv.ns.t', 0, 7)
  * }}}
  *
  * lowers onto the EXACT batch change-feed scan the options path plans
  * ([[KvChangeFeedPlan]] — per-version manifests above `from`, snapshot
  * fold from 0, `_change_type`/`_commit_version` columns), so every
  * contract KvChangeFeedSpec pins for the connector holds verbatim from
  * SQL text. Registered as a session TABLE function (Spark's
  * `TableFunctionRegistry`, injectable via `SparkSessionExtensions
  * .injectTableFunction` — [[graft.functions.GraftExtensions]]), because
  * the `CALL` procedure surface only returns driver-local result sets
  * (`LocalScan`) and a change feed is a distributed scan.
  *
  * The table argument is a fully-qualified `'catalog.ns.table'` string
  * resolved through the session's catalog manager; the named catalog
  * must be a [[KvCatalog]]. `from`/`to` are commit versions with the
  * connector's semantics: `(from, to]` deltas, `from = 0` = snapshot
  * fold, `to` past the latest commit is a bounds error (not "vacuumed").
  *
  * Reference anchor: the Store surface the reference exposes by NAME to
  * every job (/root/reference/src/Core/Store.hs:41-67); this engine
  * makes its mutation HISTORY queryable from SQL the same way its
  * content already is. */
object KvTableChanges {

  val name = "table_changes"

  def info: ExpressionInfo = new ExpressionInfo(
    KvTableChanges.getClass.getName, name)

  /** The TableFunctionRegistry builder: literal args → the change-feed
    * relation's analyzed plan. */
  def builder: Seq[Expression] => LogicalPlan = { args =>
    require(args.length == 3,
      s"$name(table, from, to) takes exactly 3 arguments, got ${args.length}")
    def lit(e: Expression, what: String): Any = e match {
      case Literal(v, _) if v != null => v
      case _ => throw new IllegalArgumentException(
        s"$name: $what must be a non-null literal, got $e")
    }
    val ref = lit(args(0), "table") match {
      case u: UTF8String => u.toString
      case other => throw new IllegalArgumentException(
        s"$name: table must be a string literal 'catalog.ns.table', got $other")
    }
    def version(e: Expression, what: String): Int = lit(e, what) match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long if l.longValue().isValidInt => l.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: $what must be an integer commit version, got $other")
    }
    val from = version(args(1), "from")
    val to = version(args(2), "to")

    val s = SparkSession.active
    val parts = ref.split("\\.")
    require(parts.length >= 3,
      s"$name: table must be fully qualified 'catalog.ns.table', got '$ref'")
    val mgr = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager
    val cat = try mgr.catalog(parts.head) catch {
      case e: Exception => throw new IllegalArgumentException(
        s"$name: no catalog named '${parts.head}' " +
          s"(is spark.sql.catalog.${parts.head} set?)", e)
    }
    val tbl = cat match {
      case tc: TableCatalog =>
        tc.loadTable(Identifier.of(parts.tail.init, parts.last))
      case _ => throw new IllegalArgumentException(
        s"$name: catalog '${parts.head}' is not a table catalog")
    }
    tbl match {
      case kv: KvCatalogTable =>
        require(!kv.isTimeTravel,
          s"$name: cannot read changes of a time-travel snapshot")
        // columns the feed schema carries beyond the data schema are
        // appended by the connector; data columns must be the current
        // era's PHYSICAL layout (rows parse positionally) — an evolved
        // table's logical view is projected on top afterwards
        val raw = s.read.format("graft.sources.KvSourceProvider")
          .option("path", kv.storeDir)
          .option("schema", kv.physSchema.toDDL)
          .option("readChangeFeed", "true")
          .option("changesFrom", from.toString)
          .option("changesTo", to.toString)
          .load()
        val df = kv.colView match {
          case Some(v) =>
            import org.apache.spark.sql.functions.col
            raw.select(
              (v.physical.fieldNames.toSeq.zip(v.names).collect {
                case (p, Some(n)) => col(p).as(n)
              } ++ Seq(col(KvChangeFeed.TypeCol), col(KvChangeFeed.VersionCol))): _*)
          case None => raw
        }
        df.queryExecution.logical
      case other => throw new IllegalArgumentException(
        s"$name: '$ref' is not a graft kv store table " +
          s"(got ${other.getClass.getSimpleName})")
    }
  }

  /** Imperative twin of the extensions path, mirroring
    * [[graft.functions.GraftFunctions.register]]. */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
}
