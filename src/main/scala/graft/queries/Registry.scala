package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle. Queries
  * without an oracle get the driver's weaker rows-only check.
  *
  * Contract (see /root/repo/SparkEntry contract): output column names of
  * the Spark result and the oracle SQL must match exactly; every result
  * must be a deterministic row set (and we additionally give both sides a
  * total ORDER BY so even order-sensitive comparators agree).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryGroup {
  def queries: Seq[Q]
}
