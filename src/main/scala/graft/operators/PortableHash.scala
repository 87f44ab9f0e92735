package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * The driver's correctness gate compares Spark results against DuckDB by
  * hash, so every "random" quantity (minhash permutations, LSH hyperplanes,
  * simhash bits) must be computable bit-identically in BOTH engines. Spark's
  * own hash()/xxhash64() have no DuckDB equivalent, so we define explicit
  * integer arithmetic over a ~1e9 prime: every op stays well inside the
  * int64 range, and the identical fold is expressible with DuckDB's
  * list_reduce/list_transform lambdas.
  *
  * Scale note (100 TB): all of these are per-row, embarrassingly parallel
  * column expressions — they run inside whole-stage codegen'd projections,
  * no shuffle, no UDF/serialization boundary.
  */
object PortableHash {

  /** Prime modulus; h*131+c stays < 2^63 for h < P. */
  val P = 1000000007L

  /** Polynomial rolling hash of a string: left fold (h*131 + ascii(c)) % P.
    * DuckDB twin: [[charHashSql]]. */
  def charHash(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L),
      (h, c) => (h * lit(131L) + c) % lit(P))

  /** Driver-side Scala twin of [[charHash]] — the same left fold over
    * CODEPOINTS (matching the graft_charhash kernel's iteration and
    * DuckDB ascii()), for computing hash-derived constants (e.g.
    * partition-bucket ids of query terms) on the driver.
    * TextIndexSpec pins build/search agreement. */
  def charHashLocal(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp.toLong) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** DuckDB SQL for [[charHash]] — list_reduce has no init parameter, so
    * the 0 seed is prepended ( (0*131+c1) ≡ fold with init 0 ). */
  def charHashSql(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (h, c) -> (h * 131 + c) % $P)""".stripMargin

  /** The i-th minhash permutation applied to a pre-hashed value t:
    * ((2i+1)*t + 7919*i + 1) % P — odd multiplier, distinct offsets. */
  def perm(i: Column, t: Column): Column =
    ((lit(2L) * i + lit(1L)) * t + lit(7919L) * i + lit(1L)) % lit(P)

  def permSql(i: String, t: String): String =
    s"((2*$i + 1)*$t + 7919*$i + 1) % $P"

  /** K-wide minhash signature over an array of pre-hashed shingles. */
  def minhashSig(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(hashes, t => perm(i, t))))

  def minhashSigSql(hashesExpr: String, k: Int): String =
    s"""list_transform(generate_series(0, ${k - 1}),
       |  i -> list_min(list_transform($hashesExpr, t -> ${permSql("i", "t")})))""".stripMargin

  /** Bit j (0-based) of a non-negative long t: exact for t < 2^53 because
    * t / 2^j is a power-of-two scaling (no rounding) in IEEE double. */
  def bit(t: Column, j: Column): Column =
    floor(t / pow(lit(2.0), j)).cast("long") % lit(2L)

  def bitSql(t: String, j: String): String =
    s"CAST(floor($t / power(2, $j)) AS BIGINT) % 2"

  /** Deterministic pseudo-random LSH hyperplane component w(j,i), roughly
    * zero-centered integers — identical arithmetic in both engines. */
  def hyperplane(j: Column, i: Column): Column =
    (lit(1315423911L) * (j + lit(1)) + lit(2654435761L) * (i + lit(1))) % lit(1000003L) - lit(501501L)

  def hyperplaneSql(j: String, i: String): String =
    s"((1315423911*($j + 1) + 2654435761*($i + 1)) % 1000003 - 501501)"

  // -- float-vector helpers (embeddings) --------------------------------

  /** Dot product of two float vectors as an ordered left fold in double.
    * Element-wise float→double casts are exact and the fold order matches
    * DuckDB's list_reduce, so the result is bit-identical. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def dotSql(a: String, b: String, dim: Int): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(generate_series(1, $dim),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |  (x, y) -> x + y)""".stripMargin

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  def cosineSql(a: String, b: String, dim: Int): String =
    s"(${dotSql(a, b, dim)}) / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)}))"

  /** Sign-of-dot-product LSH bucket over `nPlanes` deterministic
    * hyperplanes: bucket = Σ_j [dot(w_j, v) > 0] · 2^j. At scale this is
    * the candidate-pruning key: vectors only ever join within a bucket.
    *
    * Each dot term is quantized to an integer (round(w·x·1e6)) so the sum
    * is order-independent — the same sign decision can then be recomputed
    * from exploded per-dimension rows through a codegen'd hash aggregate,
    * or by the DuckDB oracle, without float-summation-order divergence. */
  def quantTerm(w: Column, x: Column): Column =
    round(w.cast("double") * x.cast("double") * lit(1e6), 0).cast("long")

  def quantTermSql(w: String, x: String): String =
    s"CAST(round(CAST($w AS DOUBLE) * CAST($x AS DOUBLE) * 1000000.0) AS BIGINT)"

  def lshBucket(v: Column, nPlanes: Int, dim: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(nPlanes - 1)), j => {
        val planeDotQ = aggregate(
          transform(sequence(lit(0), lit(dim - 1)),
            i => quantTerm(hyperplane(j, i), element_at(v, i + lit(1)))),
          lit(0L), (acc, x) => acc + x)
        when(planeDotQ > 0L, floor(pow(lit(2.0), j)).cast("long")).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc + x)

  def lshBucketSql(v: String, nPlanes: Int, dim: Int): String = {
    val planeDotQ =
      s"""list_sum(list_transform(generate_series(0, ${dim - 1}),
         |  i -> ${quantTermSql(hyperplaneSql("j", "i"), s"$v[i + 1]")}))""".stripMargin
    s"""CAST(list_sum(list_transform(generate_series(0, ${nPlanes - 1}),
       |  j -> CASE WHEN ($planeDotQ) > 0
       |            THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)) AS BIGINT)""".stripMargin
  }
}
