package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle enumeration over an undirected graph via degree-ordered
  * orientation — the cluster-density primitive behind near-dup graph
  * analysis (a tight k-clique of mutual duplicates vs a loose chain the
  * same component count would hide).
  *
  * Scale argument: each undirected edge is directed from its
  * (degree, id)-smaller endpoint to the larger — an acyclic total order
  * under which every triangle has exactly one wedge apex, and out-degrees
  * are bounded by O(√m) on ANY graph (a vertex with out-degree d has d
  * neighbors of degree ≥ its own, so deg ≥ d ⇒ d² ≤ Σdeg = 2m). The
  * wedge join's per-key fan-out — the quadratic danger on a hub-and-spoke
  * graph where one boilerplate doc touches thousands — is therefore
  * capped independent of skew, while an id-ordered orientation leaves hub
  * out-degrees unbounded (`TrianglesSpec` measures the gap on a star
  * fixture). Wedges close against the oriented list with a left-semi
  * equi-join; everything hash-partitions on vertex keys, nothing is
  * all-pairs.
  *
  * No analog in the reference (graph ops are out of its MapReduce core's
  * scope, /root/reference/src/Core/MapReduceC.hs:24-44); the shape is the
  * standard compact-forward / Schank-Wagner orientation algorithm.
  */
object Triangles {

  /** Direct each undirected edge (rows `ea` < `eb`, deduplicated) from
    * its (degree, id)-smaller endpoint to the larger: columns (u, w). */
  def orientByDegree(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("ea").as("v"))
      .unionAll(edges.select(col("eb").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    edges
      .join(deg.select(col("v").as("ea"), col("d").as("da")), "ea")
      .join(deg.select(col("v").as("eb"), col("d").as("db")), "eb")
      .select(when(col("da") < col("db") ||
          (col("da") === col("db") && col("ea") < col("eb")),
          struct(col("ea").as("u"), col("eb").as("w")))
        .otherwise(struct(col("eb").as("u"), col("ea").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
  }

  /** All triangles, one row each, vertices sorted: (v_lo, v_mid, v_hi). */
  def triangles(edges: DataFrame): DataFrame = {
    val oriented = orientByDegree(edges)
    oriented.as("e1")
      .join(oriented.as("e2"), col("e1.w") === col("e2.u"))
      .select(col("e1.u").as("x"), col("e1.w").as("y"), col("e2.w").as("z"))
      .join(oriented.as("e3"),
        col("x") === col("e3.u") && col("z") === col("e3.w"), "left_semi")
      .select(least(col("x"), col("y"), col("z")).as("v_lo"),
        (col("x") + col("y") + col("z")
          - least(col("x"), col("y"), col("z"))
          - greatest(col("x"), col("y"), col("z"))).as("v_mid"),
        greatest(col("x"), col("y"), col("z")).as("v_hi"))
  }
}
