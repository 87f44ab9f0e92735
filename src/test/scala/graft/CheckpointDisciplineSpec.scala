package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the iterative-loop checkpoint discipline: the
  * per-round `localCheckpoint`s in ConnectedComponents and the PageRank
  * fixpoint must unpersist superseded blocks as rounds advance — leaving
  * them to the async ContextCleaner measurably degraded repeated runs
  * (q_dedup_clusters 2.6 → 5.5 s across its own bench iterations and up
  * to 5× inflation of unrelated queries sharing the JVM). Each loop may
  * retain ONLY its result's own checkpoint; everything superseded must
  * be gone the moment the call returns. */
class CheckpointDisciplineSpec extends AnyFunSuite with SparkSessionFixture {

  private def persistentCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("connected components retains only the result checkpoint") {
    import spark.implicits._
    // a path graph forces one label-propagation round per diameter unit —
    // the worst case for per-round checkpoint accumulation
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val verts = (0L until 10L).toDF("id")
    val before = persistentCount
    val out = graft.operators.ConnectedComponents.components(verts, edges, 20)
    assert(out.agg(countDistinct(col("component"))).head.getLong(0) == 1L)
    val leaked = persistentCount - before
    assert(leaked <= 1,
      s"components() left $leaked persistent RDDs; only the returned " +
        "labels checkpoint may remain")
  }

  test("pagerank fixpoint retains only the result checkpoint") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val before = persistentCount
    // round cap 6: whether or not integer ranks stabilize on the cycle,
    // several superseded per-round checkpoints are created — the leak
    // this spec guards against would retain all of them
    val (ranks, rounds) =
      graft.queries.Advanced.integerPageRankFixpoint(edges, 6)
    assert(ranks.count() == 4L)
    assert(rounds > 1, "fixpoint should take multiple rounds on a cycle")
    val leaked = persistentCount - before
    assert(leaked <= 1,
      s"integerPageRankFixpoint left $leaked persistent RDDs; only the " +
        "final rank checkpoint may remain")
  }

  test("zero-round fixpoint returns a live (actionable) rank vector") {
    import spark.implicits._
    // maxRounds == 0 means the returned ranks still derive from the
    // internal `nodes` checkpoint; the cleanup pass must NOT destroy its
    // blocks (lineage is truncated — lost blocks are unrecoverable)
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val (ranks, rounds) =
      graft.queries.Advanced.integerPageRankFixpoint(edges, 0)
    assert(rounds == 0)
    // any action on the result would throw on lost checkpoint blocks
    assert(ranks.orderBy("node").collect().map(_.getLong(1)).toSeq ==
      Seq(1000000L, 1000000L))
  }
}
