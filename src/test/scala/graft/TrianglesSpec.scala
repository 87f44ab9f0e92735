package graft

import graft.operators.Triangles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Triangle enumeration: brute-force equivalence on structured fixtures
  * plus the degree-orientation out-degree bound that makes the wedge
  * join skew-safe (the scale argument in operators/Triangles.scala). */
class TrianglesSpec extends AnyFunSuite with SparkSessionFixture {

  private def edgeDf(es: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("ea", "eb")
  }

  private def brute(es: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
    val vs = adj.keys.toSeq.sorted
    (for {
      a <- vs; b <- vs if a < b && adj(a)(b)
      c <- vs if b < c && adj(a)(c) && adj(b)(c)
    } yield (a, b, c)).toSet
  }

  private val star = (1L to 200L).map(i => (0L, i))
  private val clique5 = for {
    a <- 1L to 5L; b <- 1L to 5L if a < b
  } yield (a, b)
  // star ∪ clique: hub 0 touches everything, triangles only in the clique
  // fringe (0,a,b for clique edges (a,b)) and inside the clique itself
  private val fixture = star ++ clique5 ++ Seq((100L, 101L), (150L, 151L))

  test("triangles equal brute force on star+clique+chain fixture") {
    val got = Triangles.triangles(edgeDf(fixture))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute(fixture))
    assert(got.nonEmpty)
  }

  test("triangles: empty and triangle-free graphs") {
    assert(Triangles.triangles(edgeDf(Seq((1L, 2L)))).count() == 0)
    // even cycle: no triangles
    val cycle = (0L until 6L).map(i => (i, (i + 1) % 6))
    assert(Triangles.triangles(edgeDf(cycle)).count() == 0)
  }

  test("random graphs: triangles equal brute force (ScalaCheck differential)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEdges = for {
      nV <- Gen.choose(2, 14)
      nE <- Gen.choose(1, 30)
      es <- Gen.listOfN(nE, for {
        a <- Gen.choose(0L, nV.toLong - 1)
        b <- Gen.choose(0L, nV.toLong - 1) if a != b
      } yield (a, b))
    } yield es
    val prop = Prop.forAll(genEdges) { es =>
      es.isEmpty || {
        val got = Triangles.triangles(edgeDf(es))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        got == brute(es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .distinct)
      }
    }
    // 25 cases: each runs two Spark joins — a minute-scale budget, same
    // as the CC union-find differentials
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("degree orientation bounds hub out-degree where id-order does not") {
    val oriented = Triangles.orientByDegree(edgeDf(fixture))
    val outDeg = oriented.groupBy("u").agg(count(lit(1)).as("od"))
      .agg(max(col("od"))).collect().head.getLong(0)
    // id-ordering would give hub 0 out-degree 200 (every star edge leaves
    // the smallest id); (deg,id)-ordering points star edges AT the hub,
    // so the max out-degree collapses to the clique fringe
    assert(outDeg <= 8, s"max oriented out-degree $outDeg, want <= 8")
    val hubOut = oriented.filter(col("u") === 0L).count()
    assert(hubOut == 0L, s"hub should have no outgoing edges, got $hubOut")
  }
}
