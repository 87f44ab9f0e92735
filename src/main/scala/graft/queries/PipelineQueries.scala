package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Graft._
import graft.pipeline.{Pipeline, WordCount}

/** The typed Pipeline compat API (graft.pipeline) exercised through the
  * driver's correctness gate: the reference's canonical word-count
  * (/root/reference/src/Impl.hs:30-44) and a table-backed pipeline over
  * `events`.
  */
object PipelineQueries extends QueryGroup {

  /** The reference's golden word-count through the compat API. Oracle is
    * the FIXTURES.md §A literal. */
  private val qPipelineWordcount = Q(
    "q_pipeline_wordcount",
    (s, dir) => {
      import s.implicits._
      implicit val spark = s
      WordCount.pipeline(s)
        .run(WordCount.sampleInput)
        .toDF("ch", "cnt")
        .orderBy("ch")
    },
    Some("""SELECT * FROM (VALUES ('e', 2), ('h', 2), ('l', 3), ('o', 2))
              t(ch, cnt) ORDER BY ch"""))

  /** Table-backed typed pipeline: per-event-type counting via
    * Mapper → repartitionByKey → Reducer — the reference's full
    * map/shuffle/reduce shape over a real table. */
  private val qPipelineEvents = Q(
    "q_pipeline_events",
    (s, dir) => {
      import s.implicits._
      val pipe = Pipeline
        .mapper[String, Long, String, Long] { case (et, _) => Seq((et, 1L)) }
        .repartitionByKey(8)
        .reducer[Long]((_, vs) => Seq(vs.sum))
      val input = table(s, dir, "events")
        .select(col("event_type"), col("user_id")).as[(String, Long)]
      pipe(input).toDF("event_type", "n").orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n FROM events
            GROUP BY event_type ORDER BY event_type"""))

  /** The events pipeline with the reduction as a map-side COMBINER
    * (Pipeline.combiner) instead of a post-shuffle reducer — the upgrade
    * the reference's surface can't express (its reducers always run
    * after the shuffle, MapReduceC.hs:35-40, so every record crosses the
    * network; here the shuffle carries one pre-folded value per
    * partition-key). Same oracle as q_pipeline_events: the two lowerings
    * differential-gate each other. */
  private val qPipelineCombiner = Q(
    "q_pipeline_combiner",
    (s, dir) => {
      import s.implicits._
      val pipe = Pipeline
        .mapper[String, Long, String, Long] { case (et, _) => Seq((et, 1L)) }
        .combiner(_ + _)
      val input = table(s, dir, "events")
        .select(col("event_type"), col("user_id")).as[(String, Long)]
      pipe(input).toDF("event_type", "n").orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n FROM events
            GROUP BY event_type ORDER BY event_type"""))

  override val queries: Seq[Q] =
    Seq(qPipelineWordcount, qPipelineEvents, qPipelineCombiner)
}
