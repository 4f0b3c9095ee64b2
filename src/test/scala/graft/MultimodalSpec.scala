package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing specs (codec itself is a deterministic
  * stub — see Multimodal.FakeCodec).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.attachPayload(
    Seq((1L, "hello world"), (2L, ""), (3L, "hello world")).toDF("id", "text"),
    "id", "text")

  test("attachPayload produces binary payload + typed metadata") {
    val r = media.filter(col("media_id") === 1L).head()
    assert(r.getAs[Array[Byte]]("payload").sameElements("hello world".getBytes("UTF-8")))
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes") == 11L)
  }

  test("decodeFeatures is deterministic and partition-independent") {
    val a = Multimodal.decodeFeatures(spark, media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(spark, media.repartition(7)).collect().sortBy(_.media_id)
    assert(a.map(_.width).sameElements(b.map(_.width)))
    assert(a(0).width == a(2).width && a(0).height == a(2).height) // same payload → same fake dims
    assert(a.forall(_.features.length == 8))
  }

  test("resizePayloads fits maxEdge, preserves aspect ratio, never upscales") {
    val decoded = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.media_id -> f).toMap
    val resized = Multimodal.resizePayloads(spark, media, maxEdge = 256).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Array[Byte]]("payload")))).toMap
    resized.foreach { case (id, (w, h, payload)) =>
      val orig = decoded(id)
      if (math.max(orig.width, orig.height) == 0) assert(w == 0 && h == 0)
      else {
        assert(math.max(w, h) <= 256, s"media $id resized to ${w}x$h")
        // aspect preserved within rounding
        val origRatio = orig.width.toDouble / orig.height
        val newRatio = w.toDouble / h
        assert(math.abs(origRatio - newRatio) / origRatio < 0.05,
          s"media $id ratio drift: $origRatio -> $newRatio")
        // no upscale: payload at most the original size
        assert(payload.length <= orig.n_bytes)
      }
    }
    assert(resized.nonEmpty)
  }

  test("a custom MediaCodec is a drop-in through the trait (decode + features + resample)") {
    // minimal "real codec" stand-in: fixed 100x40 dims, constant features,
    // resample halves the payload — distinct from FakeCodec on every method,
    // so the assertions prove the operators call the INJECTED codec
    object TinyCodec extends Multimodal.MediaCodec {
      override def decodeDims(p: Array[Byte]): (Int, Int, Int) =
        if (p == null || p.isEmpty) (0, 0, 0) else (100, 40, 3)
      override def features(p: Array[Byte], dim: Int): Array[Float] =
        Array.fill(dim)(if (p == null) 0f else 0.5f)
      override def resample(p: Array[Byte], scale: Double): Array[Byte] =
        if (p == null || p.isEmpty || scale >= 1.0) p else p.take(math.max(1, p.length / 2))
    }
    val decoded = Multimodal.decodeFeatures(spark, media, featureDim = 4, codec = TinyCodec)
      .collect().map(f => f.media_id -> f).toMap
    assert(decoded(1L).width == 100 && decoded(1L).height == 40 && decoded(1L).channels == 3)
    assert(decoded(2L).width == 0) // empty payload → undecodable
    assert(decoded(1L).features.toSeq == Seq(0.5f, 0.5f, 0.5f, 0.5f))
    val resized = Multimodal.resizePayloads(spark, media, maxEdge = 50, codec = TinyCodec)
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Array[Byte]]("payload")))).toMap
    // 100x40 bounded by maxEdge 50 → 50x20, payload halved by TinyCodec
    assert(resized(1L)._1 == 50 && resized(1L)._2 == 20)
    assert(resized(1L)._3.length == "hello world".getBytes("UTF-8").length / 2)
  }

  test("sampleFrames emits stride-spaced frame numbers") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 1L), stride = 1)
      .select("frame_no").as[Int].collect().sorted.toSeq
    assert(frames == frames.indices.toSeq)
  }
}
