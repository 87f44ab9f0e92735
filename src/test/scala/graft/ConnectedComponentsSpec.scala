package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ConnectedComponents

/** Connected components: fixture graphs (chain — the case pairwise drops
  * get wrong, triangle, isolates, forest) plus a ScalaCheck differential
  * against a union-find oracle on random graphs. */
class ConnectedComponentsSpec extends AnyFunSuite with SparkSessionFixture {

  private def run(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val v = (0L until n).toDF("id")
    val e = edges.toDF("src", "dst")
    ConnectedComponents.components(v, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  test("chain: transitive closure spans the whole path") {
    // 0-1-2-3 plus isolate 4: pairwise logic sees (0,1),(1,2),(2,3) only;
    // the component must still be {0,1,2,3} with label 0
    val got = run(5, Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L))
  }

  test("triangle + forest + isolates") {
    val got = run(8, Seq((5L, 6L), (6L, 7L), (5L, 7L), (1L, 3L)))
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("random graphs equal the union-find oracle") {
    val genEdges = for {
      n <- Gen.choose(1, 30)
      m <- Gen.choose(0, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
    } yield (n.toLong, es.filter(e => e._1 != e._2))
    val prop = Prop.forAll(genEdges) { case (n, es) =>
      run(n, es) == unionFind(n, es)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
