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
}
