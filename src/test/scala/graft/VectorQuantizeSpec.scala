package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorQuantize

/** Measured evidence for operators/VectorQuantize (q_vector_quantize's
  * approximation claim): code range is bounded by construction, and the
  * quantized ranking's recall@5 against the EXACT ranking is a monotone
  * function of code width with measured floors — the quantization
  * parameters are measured, not chosen (same discipline as
  * MinhashBandingCurveSpec / AnnRecallSpec). The corpus embeddings are
  * unit-norm, so exact dot ordering == exact cosine ordering and the
  * recall is against true cosine truth. */
class VectorQuantizeSpec extends AnyFunSuite with SparkSessionFixture {

  private val dims = 64

  private lazy val emb: DataFrame = graft.core.Graft
    .table(spark, "/root/testdata/sf0.01", "embeddings")
    .select("vec_id", "embedding").cache()

  /** Top-5 neighbor ids per query vector under a score column. */
  private def top5(scored: DataFrame): Map[Long, Seq[Long]] = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("query_id", "vec_id", "rk")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
      }
  }

  private def pairs(enc: DataFrame, scoreOf: (String, String) => org.apache.spark.sql.Column) = {
    val q = enc.select(col("vec_id").as("query_id"), col("v").as("qv"))
    enc.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", scoreOf("qv", "v"))
      .select("query_id", "vec_id", "score")
  }

  test("codes bounded; recall@5 vs exact ranking is monotone in code width with floors") {
    val scales = VectorQuantize.scales(emb, "embedding", dims)
    val exact = top5(pairs(
      emb.select(col("vec_id"), col("embedding").as("v")),
      (a, b) => graft.operators.PortableHash.dot(col(a), col(b))))

    val recalls = Seq(1, 3, 7, 127).map { maxCode =>
      val enc = emb.crossJoin(broadcast(scales))
        .select(col("vec_id"),
          VectorQuantize.encode(col("embedding"), col("sv"), dims, maxCode).as("v"))
      val codeMax = enc
        .select(max(array_max(transform(col("v"), abs(_)))).as("m"))
        .head().getLong(0)
      assert(codeMax <= maxCode,
        s"maxCode=$maxCode: code $codeMax escaped the range bound")
      val got = top5(pairs(enc, (a, b) => VectorQuantize.intDot(col(a), col(b))))
      val recall = exact.map { case (q, t) =>
        got.getOrElse(q, Seq.empty).toSet.intersect(t.toSet).size / 5.0
      }.sum / exact.size
      (maxCode, recall)
    }
    recalls.sliding(2).foreach { case Seq((m1, r1), (m2, r2)) =>
      assert(r2 >= r1 - 0.02,
        s"recall must not degrade with code width: $m1→$r1 vs $m2→$r2")
    }
    val byCode = recalls.toMap
    assert(byCode(127) >= 0.75, s"int8 recall floor: ${byCode(127)}")
    assert(byCode(7) >= 0.6, s"int4 recall floor: ${byCode(7)}")
    assert(byCode(1) <= 0.3,
      s"ternary codes should visibly degrade (metric sanity): ${byCode(1)}")
  }
}
