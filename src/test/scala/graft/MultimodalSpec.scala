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

  test("sampleFrames emits stride-spaced frame numbers") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 1L), stride = 1)
      .select("frame_no").as[Int].collect().sorted.toSeq
    assert(frames == frames.indices.toSeq)
  }
}
