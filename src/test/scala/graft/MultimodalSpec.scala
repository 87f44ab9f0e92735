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

  test("feature extraction is REAL per format, honest on opaque payloads") {
    val small = docs.limit(30)
    // real image payloads: dims come from the decoded PPM header
    val img = Multimodal.decodeFeatures(Multimodal.syntheticImages(small)).collect()
    img.foreach { f =>
      assert(f.width == 8 + (f.media_id % 16).toInt)
      assert(f.height == 6 + (f.media_id % 12).toInt)
      assert(f.n_frames == 1)
    }
    // real audio payloads: rate/channels/frames from the decoded WAV
    val aud = Multimodal.decodeFeatures(Multimodal.syntheticAudio(small)).collect()
    aud.foreach { f =>
      assert(f.width == 8000 + (f.media_id % 3).toInt * 4000)
      assert(f.height == 1 + (f.media_id % 2).toInt)
      assert(f.n_frames == 60 + (f.media_id % 40).toInt)
    }
    // real video payloads: dims + frame count from the decoded Y4M
    val vid = Multimodal.decodeFeatures(Multimodal.syntheticVideo420(small)).collect()
    vid.foreach { f =>
      assert(f.width == 3 + (f.media_id % 8).toInt)
      assert(f.height == 3 + (f.media_id % 6).toInt)
      assert(f.n_frames == 2 + (f.media_id % 4).toInt)
      assert(f.n_frames >= 2)
    }
    // opaque payloads (text bytes): dims/frames are NOT invented — they
    // report 0 (unknown), and the embedding is the byte histogram
    val opaque = Multimodal.decodeFeatures(Multimodal.fromDocuments(small)).collect()
    opaque.foreach { f =>
      assert(f.width == 0 && f.height == 0 && f.n_frames == 0)
    }
    // every path: fixed-width embedding, normalized frequencies (sum 1)
    (img ++ aud ++ vid ++ opaque).foreach { f =>
      assert(f.embedding.length == 8)
      assert(f.embedding.forall(v => v >= 0f && v <= 1f))
      assert(math.abs(f.embedding.map(_.toDouble).sum - 1.0) < 1e-5,
        s"embedding of ${f.media_id} is not a distribution")
    }
  }

  test("image embedding equals a local luma-histogram recompute of the fixture formula") {
    val feats = Multimodal.decodeFeatures(
      Multimodal.syntheticImages(docs.limit(25))).collect()
    feats.foreach { f =>
      val id = f.media_id
      val w = 8 + (id % 16).toInt
      val h = 6 + (id % 12).toInt
      val counts = new Array[Long](8)
      (0 until w * h).foreach { p =>
        val r = ((id * 31 + 21L * p) % 256).toInt
        val g = ((id * 31 + 21L * p + 7) % 256).toInt
        val b = ((id * 31 + 21L * p + 14) % 256).toInt
        counts(((299 * r + 587 * g + 114 * b) / 1000) >> 5) += 1
      }
      val want = counts.map(c => c.toFloat / (w * h)).toSeq
      assert(f.embedding.toSeq == want, s"doc $id")
    }
  }

  test("resize fits the box, preserves aspect, and is exact-integer stable") {
    val feats = Multimodal.decodeFeatures(Multimodal.syntheticImages(docs))
    val resized = Multimodal.resize(feats, 12, 9).collect()
    val orig = feats.collect().map(f => f.media_id -> f).toMap
    resized.foreach { r =>
      val o = orig(r.media_id)
      assert(r.width <= 12 && r.height <= 9 && r.width >= 1 && r.height >= 1)
      if (o.width <= 12 && o.height <= 9) {
        assert(r.width == o.width && r.height == o.height)
      } else {
        // aspect preserved within integer flooring: r.w/r.h ~ o.w/o.h
        val cross = math.abs(r.width.toLong * o.height - r.height.toLong * o.width)
        assert(cross <= math.max(o.width, o.height).toLong, s"aspect drift for $r vs $o")
      }
    }
  }

  test("frame sampling: every-Nth frame, frame 0 always present") {
    val vfeats = Multimodal.decodeFeatures(
      Multimodal.syntheticVideo420(docs.limit(40)))
    val vsamples = Multimodal.frameSample(vfeats, every = 3).collect()
    val byId = vsamples.groupBy(_.media_id)
    vfeats.collect().foreach { f =>
      val got = byId(f.media_id).map(_.frame_idx).sorted.toSeq
      val expected = 0 until f.n_frames by 3
      assert(got == expected, s"media ${f.media_id}")
    }
    // single-frame media contribute exactly frame 0
    val ifeats = Multimodal.decodeFeatures(
      Multimodal.syntheticImages(docs.limit(10)))
    val isamples = Multimodal.frameSample(ifeats, every = 3).collect()
    assert(isamples.groupBy(_.media_id).values
      .forall(_.map(_.frame_idx).toSeq == Seq(0)))
    assert(isamples.length == ifeats.count())
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

  test("planted near-dup pairs sit within perceptual hamming 3; their bands collide") {
    val m = graft.operators.Multimodal
    val h = m.decodeImagePHash(m.syntheticImagesNearDup(docs.limit(60)))
      .collect().map(p => p.media_id -> p).toMap
    val pairs = h.keys.filter(id => id % 5 == 1 && h.contains(id - 1)).toSeq
    assert(pairs.nonEmpty, "fixture slice contains no planted clone pairs")
    pairs.foreach { id =>
      val (a, b) = (h(id), h(id - 1))
      val dist = java.lang.Long.bitCount(a.ahash_lo ^ b.ahash_lo) +
        java.lang.Long.bitCount(a.ahash_hi ^ b.ahash_hi)
      assert(dist <= 3, s"planted pair ($id, ${id - 1}) drifted to hamming $dist")
      // pigeonhole: <=3 flips across 4 bands leaves one band intact
      val bandsOf = (p: m.ImagePHash) => Seq(
        p.ahash_lo & 0xffffL, p.ahash_lo >>> 16,
        p.ahash_hi & 0xffffL, p.ahash_hi >>> 16)
      assert(bandsOf(a).zip(bandsOf(b)).exists { case (x, y) => x == y })
    }
  }

  // ---- real image decode: PPM parser + PNG via imageio ----

  test("PPM decode: hand-built P6 bytes with known pixels give exact stats") {
    val m = graft.operators.Multimodal
    // 2x2 image, pixels written out by hand: (R,G,B) rows
    // (10,20,30) (40,50,60) / (70,80,90) (200,250,255)
    val raster = Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 200, 250, 255)
      .map(_.toByte)
    val header = "P6\n2 2\n255\n".getBytes("US-ASCII")
    val payload = header ++ raster
    val (w, h, rgb) = m.decodeImage(payload)
    assert((w, h) === (2, 2))
    assert(rgb.toSeq === raster.toSeq)
    // independently computed channel sums: R=10+40+70+200, etc.
    val sr = rgb.grouped(3).map(p => p(0) & 0xff).sum
    assert(sr === 320)
    assert(rgb.grouped(3).map(p => p(1) & 0xff).sum === 400)
    assert(rgb.grouped(3).map(p => p(2) & 0xff).sum === 435)
  }

  test("PPM header grammar: comments and mixed whitespace are parsed") {
    val m = graft.operators.Multimodal
    val raster = Array.tabulate(1 * 2 * 3)(i => (i * 11).toByte)
    val header = "P6 # trailing comment\n# full comment line\n\t1  2\r\n# another\n255\n"
      .getBytes("US-ASCII")
    val (w, h, rgb) = m.decodeImage(header ++ raster)
    assert((w, h) === (1, 2))
    assert(rgb.toSeq === raster.toSeq)
  }

  test("PPM encode -> decode round-trips arbitrary rasters (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val m = graft.operators.Multimodal
    val gen = for {
      w <- Gen.choose(1, 12)
      h <- Gen.choose(1, 9)
      bytes <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
    } yield (w, h, bytes.map(_.toByte).toArray)
    val prop = Prop.forAll(gen) { case (w, h, raster) =>
      val (dw, dh, rgb) = m.decodeImage(m.ppmEncode(w, h, raster))
      dw == w && dh == h && rgb.toSeq == raster.toSeq
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("PNG decode: imageio branch reproduces pixels written by BufferedImage") {
    val m = graft.operators.Multimodal
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Seq( // (x, y, r, g, b)
      (0, 0, 1, 2, 3), (1, 0, 100, 110, 120), (2, 0, 255, 0, 128),
      (0, 1, 9, 8, 7), (1, 1, 33, 66, 99), (2, 1, 0, 0, 0))
    px.foreach { case (x, y, r, g, b) => img.setRGB(x, y, (r << 16) | (g << 8) | b) }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (w, h, rgb) = m.decodeImage(bos.toByteArray)
    assert((w, h) === (3, 2))
    px.foreach { case (x, y, r, g, b) =>
      val p = (y * 3 + x) * 3
      assert((rgb(p) & 0xff, rgb(p + 1) & 0xff, rgb(p + 2) & 0xff) === ((r, g, b)),
        s"pixel ($x,$y)")
    }
  }

  test("decodeImageStats: distributed sums equal a local decode of the same fixtures") {
    val m = graft.operators.Multimodal
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val items = m.syntheticImages(docs)
    val got = m.decodeImageStats(items).collect()
      .map(s => s.media_id -> ((s.width, s.height, s.sum_r, s.sum_g, s.sum_b))).toMap
    // independent recomputation straight from the fixture formula,
    // no PPM bytes involved
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    assert(got.size === ids.length)
    ids.foreach { id =>
      val w = 8 + (id % 16).toInt
      val h = 6 + (id % 12).toInt
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (p <- 0 until w * h) {
        sr += (id * 31 + 21L * p) % 256
        sg += (id * 31 + 21L * p + 7) % 256
        sb += (id * 31 + 21L * p + 14) % 256
      }
      assert(got(id) === ((w, h, sr, sg, sb)), s"doc $id")
    }
  }

  test("decodeImage rejects junk payloads instead of fabricating pixels") {
    val m = graft.operators.Multimodal
    intercept[IllegalArgumentException](m.decodeImage("not an image".getBytes))
    // truncated raster: header promises more bytes than present
    intercept[IllegalArgumentException](
      m.decodeImage("P6\n4 4\n255\nxy".getBytes("US-ASCII")))
  }

  test("WAV encode -> decode round-trips rate/channels/samples exactly") {
    val m = graft.operators.Multimodal
    val samples = Array[Short](0, 1, -1, 32767, -32768, 1000, -999, 42)
    val bytes = m.wavEncode(44100, 2, samples)
    val (rate, ch, got) = m.wavDecode(bytes)
    assert(rate == 44100 && ch == 2)
    assert(got.toSeq == samples.toSeq, "PCM samples must round-trip bit-exactly")
    // the fixture encoder emits an odd-sized LIST chunk before data: a
    // decoder that skips the RIFF pad byte lands mid-chunk and fails —
    // reaching data at all proves the word-alignment rule is honored
  }

  test("WAV chunk walk: grammar violations are rejected, not misread") {
    val m = graft.operators.Multimodal
    val good = m.wavEncode(8000, 1, Array[Short](1, 2, 3))
    // bad magic
    intercept[IllegalArgumentException](m.wavDecode("RIFX".getBytes ++ good.drop(4)))
    // truncated data chunk: shrink the payload under the declared size
    intercept[IllegalArgumentException](m.wavDecode(good.dropRight(2)))
    // non-PCM format code (3 = IEEE float) in fmt
    val nonPcm = good.clone()
    val fmtBody = {
      var p = 12
      var found = -1
      while (found < 0) {
        val id = new String(nonPcm, p, 4, "US-ASCII")
        val sz = (nonPcm(p + 4) & 0xff) | ((nonPcm(p + 5) & 0xff) << 8)
        if (id == "fmt ") found = p + 8 else p += 8 + sz + (sz % 2)
      }
      found
    }
    nonPcm(fmtBody) = 3
    intercept[IllegalArgumentException](m.wavDecode(nonPcm))
  }

  test("decodeAudioStats: distributed stats equal a local decode of the same fixtures") {
    val m = graft.operators.Multimodal
    val docs = graft.core.Graft
      .table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    val got = m.decodeAudioStats(m.syntheticAudio(docs))
      .collect().map(a => a.media_id -> a).toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val rate = 8000 + (id % 3).toInt * 4000
      val channels = 1 + (id % 2).toInt
      val frames = 60 + (id % 40).toInt
      var sumAbs = 0L; var peak = 0
      (0 until frames * channels).foreach { k =>
        val v = (((id * 37 + k.toLong * 11) % 4001L) - 2000L).toInt
        sumAbs += math.abs(v); peak = math.max(peak, math.abs(v))
      }
      val a = got(id)
      assert(a.sample_rate == rate && a.n_channels == channels &&
        a.n_frames == frames && a.sum_abs == sumAbs && a.peak == peak,
        s"doc $id: $a != ($rate, $channels, $frames, $sumAbs, $peak)")
    }
  }

  test("Y4M encode -> decode round-trips dims/fps/frames exactly") {
    val m = graft.operators.Multimodal
    val frames = Array.tabulate(5)(f =>
      Array.tabulate(3 * 6 * 4)(j => ((f * 50 + j) % 256).toByte))
    val payload = m.y4mEncode(6, 4, 30, 1, frames)
    val (w, h, num, den, back) = m.y4mDecode(payload)
    assert((w, h, num, den) === ((6, 4, 30, 1)))
    assert(back.length === 5)
    back.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("Y4M grammar: frame-line parameters are consumed, violations rejected") {
    val m = graft.operators.Multimodal
    val frames = Array.fill(3)(new Array[Byte](3 * 4 * 4))
    val good = m.y4mEncode(4, 4, 24, 1, frames)
    // the encoder emits "FRAME Xgraft" on odd frames — a decoder that
    // assumes a fixed FRAME\n would misalign; the roundtrip above plus
    // this frame-count check prove the parameter line is consumed
    assert(m.y4mDecode(good)._5.length === 3)
    // bad magic
    intercept[IllegalArgumentException](
      m.y4mDecode("YUV4MPEG3".getBytes ++ good.drop(9)))
    // truncated final frame
    intercept[IllegalArgumentException](m.y4mDecode(good.dropRight(1)))
    // unsupported chroma subsampling must be rejected, not misread
    val c422 = new String(good.takeWhile(_ != '\n'), "US-ASCII")
      .replace("C444", "C422") + "\n"
    val e = intercept[IllegalArgumentException](m.y4mDecode(
      c422.getBytes("US-ASCII") ++ good.dropWhile(_ != '\n').drop(1)))
    assert(e.getMessage.contains("unsupported chroma"))
  }

  test("Y4M 4:2:0: chroma upsamples to exact 2x2 blocks, odd dims clip at edges") {
    val m = graft.operators.Multimodal
    // 3x3 luma, ceil-half chroma = 2x2 cells: hand-checkable
    val y = Array.tabulate(9)(j => (10 + j).toByte)
    val u = Array[Byte](1, 2, 3, 4)
    val v = Array[Byte](5, 6, 7, 8)
    val frame = y ++ u ++ v
    for (tag <- Seq("420", "420jpeg", "420mpeg2", "420paldv")) {
      val payload = m.y4mEncode420(3, 3, 24, 1, Array(frame), tag)
      val (w, h, _, _, back) = m.y4mDecode(payload)
      assert((w, h) === ((3, 3)))
      val f = back.head
      assert(f.length === 27, "4:2:0 frames must normalize to 4:4:4")
      assert(f.slice(0, 9).sameElements(y))
      // cell layout: (y/2, x/2) → pixel rows 0,1 read cell row 0; row 2
      // reads cell row 1; cols 0,1 read cell col 0; col 2 cell col 1
      assert(f.slice(9, 18).toSeq === Seq[Byte](1, 1, 2, 1, 1, 2, 3, 3, 4))
      assert(f.slice(18, 27).toSeq === Seq[Byte](5, 5, 6, 5, 5, 6, 7, 7, 8))
    }
    // truncated 4:2:0 frame rejected
    val good = m.y4mEncode420(3, 3, 24, 1, Array(frame))
    intercept[IllegalArgumentException](m.y4mDecode(good.dropRight(1)))
    // absent C token defaults to 420jpeg per the spec
    val headless = new String(good.takeWhile(_ != '\n'), "US-ASCII")
      .replace(" C420jpeg", "") + "\n"
    val defaulted = m.y4mDecode(
      headless.getBytes("US-ASCII") ++ good.dropWhile(_ != '\n').drop(1))
    assert(defaulted._5.head.sameElements(m.y4mDecode(good)._5.head))
  }

  test("decodeVideoYuvStats: distributed per-plane stats equal a local closed form") {
    val m = graft.operators.Multimodal
    val docs = graft.core.Graft
      .table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    val got = m.decodeVideoYuvStats(m.syntheticVideo420(docs), 2)
      .collect().map(v => v.media_id -> v).toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val w = 3 + (id % 8).toInt
      val h = 3 + (id % 6).toInt
      val nf = 2 + (id % 4).toInt
      val cw = (w + 1) / 2
      var sumY = 0L; var sumU = 0L; var sumV = 0L; var sampled = 0
      (0 until nf by 2).foreach { f =>
        (0 until h).foreach { py =>
          (0 until w).foreach { px =>
            val j = py * w + px
            val c = (py / 2) * cw + px / 2
            sumY += (id * 13 + f.toLong * 101 + j.toLong * 7) % 256
            sumU += (id * 19 + f.toLong * 7 + c.toLong * 11) % 256
            sumV += (id * 23 + f.toLong * 5 + c.toLong * 13) % 256
          }
        }
        sampled += 1
      }
      val got1 = got(id)
      assert(got1.width == w && got1.height == h && got1.n_frames == nf &&
        got1.sum_y_sampled == sumY && got1.sum_u_sampled == sumU &&
        got1.sum_v_sampled == sumV && got1.n_sampled == sampled,
        s"doc $id: $got1 != ($w, $h, $nf, $sumY, $sumU, $sumV, $sampled)")
    }
  }

  test("decodeVideoStats: distributed sampled-luma stats equal a local decode") {
    val m = graft.operators.Multimodal
    val docs = graft.core.Graft
      .table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    val got = m.decodeVideoStats(m.syntheticVideo(docs), 2)
      .collect().map(v => v.media_id -> v).toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val w = 4 + (id % 8).toInt
      val h = 4 + (id % 6).toInt
      val nf = 3 + (id % 5).toInt
      val fps = 24 + (id % 2).toInt * 6
      var sumY = 0L; var sampled = 0
      (0 until nf by 2).foreach { f =>
        (0 until w * h).foreach { j =>
          sumY += (id * 13 + f.toLong * 101 + j.toLong * 7) % 256
        }
        sampled += 1
      }
      val v = got(id)
      assert(v.width == w && v.height == h && v.n_frames == nf &&
        v.fps_num == fps && v.sum_y_sampled == sumY && v.n_sampled == sampled,
        s"doc $id: $v != ($w, $h, $nf, $fps, $sumY, $sampled)")
    }
  }

  test("NN resample picks exactly the floor-index source pixels") {
    val m = graft.operators.Multimodal
    val s = spark
    import s.implicits._
    // 4x2 source, raster bytes 0,1,2,...,23; fit into 2x1 box -> 2x1:
    // target (0,0) reads source (0*2/1=0, 0*4/2=0) -> bytes 0,1,2
    // target (0,1) reads source (0, 1*4/2=2)       -> bytes 6,7,8
    // so rsum_r=0+6, rsum_g=1+7, rsum_b=2+8
    val raster = Array.tabulate(4 * 2 * 3)(_.toByte)
    val payload = m.ppmEncode(4, 2, raster)
    val items = Seq(m.MediaItem(7L, "image", payload, "t", payload.length.toLong))
      .toDS()
    val r = m.decodeResample(items, 2, 1).collect().head
    assert((r.width, r.height, r.fit_w, r.fit_h) === ((4, 2, 2, 1)))
    assert((r.rsum_r, r.rsum_g, r.rsum_b) === ((6L, 8L, 10L)))
  }
}
