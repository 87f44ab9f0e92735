package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal plumbing: schema, partition batching, determinism, and
  * feature shape of the mapPartitions decode path. */
class MultimodalSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val docs =
    graft.core.Graft.table(spark, "/root/testdata/sf0.001", "documents")

  test("media schema: binary payload + typed metadata") {
    val items = Multimodal.fromDocuments(docs)
    val f = items.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(f("payload") == BinaryType)
    assert(f("media_id") == LongType)
    assert(f("kind") == StringType)
    assert(f("n_bytes") == LongType)
  }

  test("decode preserves row count and is deterministic across runs") {
    val items = Multimodal.fromDocuments(docs)
    val a = Multimodal.decodeFeatures(items).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(items.repartition(7)).collect().sortBy(_.media_id)
    assert(a.length == docs.count())
    assert(a.map(_.media_id).toSeq == b.map(_.media_id).toSeq)
    assert(a.map(_.width).toSeq == b.map(_.width).toSeq)
    assert(a.map(_.embedding.toSeq).toSeq == b.map(_.embedding.toSeq).toSeq)
  }

  test("feature shape contract: dims positive, embedding fixed-width, video multi-frame") {
    val feats = Multimodal.decodeFeatures(Multimodal.fromDocuments(docs)).collect()
    assert(feats.forall(f => f.width >= 1 && f.width <= 640))
    assert(feats.forall(f => f.height >= 1 && f.height <= 480))
    assert(feats.forall(_.embedding.length == 8))
    assert(feats.forall(f => f.embedding.forall(v => v >= 0f && v <= 1f)))
    assert(feats.filter(_.kind == "video").forall(_.n_frames >= 2))
    assert(feats.filter(_.kind != "video").forall(_.n_frames == 1))
  }

  test("resize fits the box, preserves aspect, and is exact-integer stable") {
    val feats = Multimodal.decodeFeatures(Multimodal.fromDocuments(docs))
    val resized = Multimodal.resize(feats, 224, 224).collect()
    val orig = feats.collect().map(f => f.media_id -> f).toMap
    resized.foreach { r =>
      val o = orig(r.media_id)
      assert(r.width <= 224 && r.height <= 224 && r.width >= 1 && r.height >= 1)
      if (o.width <= 224 && o.height <= 224) {
        assert(r.width == o.width && r.height == o.height)
      } else {
        // aspect preserved within integer flooring: r.w/r.h ~ o.w/o.h
        val cross = math.abs(r.width.toLong * o.height - r.height.toLong * o.width)
        assert(cross <= math.max(o.width, o.height).toLong, s"aspect drift for $r vs $o")
      }
    }
  }

  test("frame sampling: every-Nth frame, frame 0 always present") {
    val feats = Multimodal.decodeFeatures(Multimodal.fromDocuments(docs))
    val samples = Multimodal.frameSample(feats, every = 5).collect()
    val byId = samples.groupBy(_.media_id)
    val orig = feats.collect()
    orig.foreach { f =>
      val got = byId(f.media_id).map(_.frame_idx).sorted.toSeq
      val expected = 0 until f.n_frames by 5
      assert(got == expected, s"media ${f.media_id}")
    }
    assert(orig.filter(_.kind != "video")
      .forall(f => byId(f.media_id).map(_.frame_idx).toSeq == Seq(0)))
  }

  test("payload survives a shuffle intact (opaque binary column)") {
    import org.apache.spark.sql.functions._
    val items = Multimodal.fromDocuments(docs)
    val before = items.selectExpr("media_id", "md5(payload) AS h")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = items.repartition(5, col("kind"))
      .selectExpr("media_id", "md5(payload) AS h")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before == after)
  }
}
