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

  test("sampleFrames emits stride-spaced frame numbers") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 1L), stride = 1)
      .select("frame_no").as[Int].collect().sorted.toSeq
    assert(frames == frames.indices.toSeq)
  }
}
