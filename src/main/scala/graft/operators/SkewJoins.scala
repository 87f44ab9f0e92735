package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §7 / 100 TB design note:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's runtime skew splitting handles most cases; explicit salting is
  * the deterministic-plan fallback when one build key dominates so hard
  * that even split shuffle blocks hot-spot a single executor. The big
  * side tags each row with `hash(key-col extras) mod n`; the small side
  * is replicated n× with every salt value, so the shuffle spreads one hot
  * key over n reducers. Result set is EXACTLY the plain join's.
  */
object SkewJoins {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      nSalts: Int): DataFrame = {
    // Deterministic per-row salt from the whole row (any spread works —
    // correctness never depends on the salt value).
    val salted = big.withColumn("_salt",
      pmod(hash(big.columns.map(col): _*), lit(nSalts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
        col(bigKey) === col(smallKey))
      .drop("_salt")
  }

  /** Skew-safe FULL OUTER equi-join. AQE's OptimizeSkewedJoin cannot
    * split EITHER side of a full-outer join (splitting a partition
    * would duplicate the other side's unmatched rows), so a skewed
    * merge key has no runtime rescue — this wires the salted path
    * instead, decomposing the join into three skew-tolerant pieces:
    *
    *   1. matched pairs via [[saltedEquiJoin]] (hot keys spread over
    *      nSalts reducers),
    *   2. left-unmatched rows via LEFT ANTI against the right KEYS
    *      (column-pruned to the key, and anti joins are AQE-splittable
    *      on the probe side),
    *   3. right-unmatched rows via the mirrored ANTI,
    *
    * padded to a common schema and unioned — exactly the full-outer
    * result set. Three shuffles instead of one is the price of
    * skew-safety; use it when the merge key is NOT unique per side
    * (a primary-key MERGE like q_cdc_merge cannot skew by
    * construction and keeps the single full-outer shuffle).
    * Left and right column names must be disjoint (as in any
    * full-outer you'd select from). */
  def skewSafeFullOuter(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      nSalts: Int): DataFrame = {
    val leftCols = left.columns.map(col).toSeq
    val rightCols = right.columns.map(col).toSeq
    val leftNulls = left.schema.fields
      .map(f => lit(null).cast(f.dataType).as(f.name)).toSeq
    val rightNulls = right.schema.fields
      .map(f => lit(null).cast(f.dataType).as(f.name)).toSeq
    val matched = saltedEquiJoin(left, right, leftKey, rightKey, nSalts)
      .select(leftCols ++ rightCols: _*)
    val leftOnly = left
      .join(right.select(col(rightKey)), col(leftKey) === col(rightKey), "left_anti")
      .select(leftCols ++ rightNulls: _*)
    val rightOnly = right
      .join(left.select(col(leftKey)), col(rightKey) === col(leftKey), "left_anti")
      .select(leftNulls ++ rightCols: _*)
    matched.unionAll(leftOnly).unionAll(rightOnly)
  }
}
