package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Pipeline, WordCount}

/** Golden word-count (FIXTURES.md §A — the reference's only canonical
  * case, /root/reference/src/Impl.hs:30-44 + test/Generator.hs:61-67)
  * plus targeted Pipeline API semantics. */
class PipelineSpec extends AnyFunSuite with SparkSessionFixture {

  test("golden word-count: distributed == expected") {
    implicit val s = spark
    import s.implicits._
    val got = WordCount.pipeline(spark).run(WordCount.sampleInput).sorted
    assert(got == WordCount.expected)
  }

  test("golden word-count: naive evaluator == expected") {
    val got = WordCount.pipeline(spark).runLocal(WordCount.sampleInput).sorted
    assert(got == WordCount.expected)
  }

  test("run-length mapper matches Haskell group semantics") {
    // mapper (_, v) = map (\xs -> (head xs, length xs)) (group v)
    assert(WordCount.runLength(("", "hello")) ==
      Seq(("h", 1), ("e", 1), ("l", 2), ("o", 1)))
    assert(WordCount.runLength(("", "")) == Seq.empty)
    assert(WordCount.runLength(("", "aaa")) == Seq(("a", 3)))
  }

  test("multi-output reducer emits 0..n rows per key") {
    implicit val s = spark
    import s.implicits._
    // emit each distinct value twice for keys with >1 value, drop others —
    // not expressible as SQL agg; the flatMapGroups path must carry it.
    val p = Pipeline.reducer[String, Int, Int]((_, vs) =>
      if (vs.size > 1) vs.sorted.flatMap(v => Seq(v, v)) else Seq.empty)
    val got = p.run(Seq(("a", 1), ("a", 2), ("b", 9))).sorted
    assert(got == Seq(("a", 1), ("a", 1), ("a", 2), ("a", 2)))
  }

  test("repartitionByKey preserves results") {
    implicit val s = spark
    import s.implicits._
    val p = Pipeline
      .mapper[String, String, String, Int](kv => WordCount.runLength(kv))
      .repartitionByKey(3)
      .reducer[Int]((_, vs) => Seq(vs.sum))
    val got = p.run(Seq(("", "hello"), ("", "hello"))).sorted
    assert(got == Seq(("e", 2), ("h", 2), ("l", 4), ("o", 2)))
  }

  test("empty input yields empty output") {
    implicit val s = spark
    import s.implicits._
    val got = WordCount.pipeline(spark).run(Seq.empty)
    assert(got.isEmpty)
  }

  test("combiner: word-count via map-side fold == reducer formulation") {
    implicit val s = spark
    import s.implicits._
    val viaCombiner = Pipeline
      .mapper[String, String, String, Int](WordCount.runLength)
      .mapper[String, Int](WordCount.add1)
      .combiner(_ + _)
    val got = viaCombiner.run(WordCount.sampleInput).sorted
    assert(got == WordCount.expected)
    assert(viaCombiner.runLocal(WordCount.sampleInput).sorted == WordCount.expected)
  }

  test("combiner plans as a partial+final aggregation, not flatMapGroups") {
    implicit val s = spark
    import s.implicits._
    val p = Pipeline
      .mapper[String, String, String, Int](WordCount.runLength)
      .combiner(_ + _)
    val ds = p(spark.createDataset(Seq(("", "hello"), ("", "world"))))
    // the combine stage must reach the planner as a typed AGGREGATION
    // (partial merge before the shuffle) — two aggregate nodes around one
    // exchange — not as the reducer's whole-group flatMapGroups
    val plan = ds.queryExecution.executedPlan.toString
    val aggs = "Aggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"no partial+final aggregation in:\n$plan")
    assert(!plan.contains("FlatMapGroups"),
      s"combiner fell back to whole-group iteration:\n$plan")
    assert(ds.collect().sorted.toSeq ==
      Seq(("d", 1), ("e", 1), ("h", 1), ("l", 3), ("o", 2), ("r", 1), ("w", 1)))
  }
}
