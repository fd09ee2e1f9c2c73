package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary pipeline: text payloads flow through the stub decoder") {
    val docs = Seq((1L, "hello"), (2L, ""), (3L, "a" * 100)).toDF("doc_id", "text")
    val media = Multimodal.fromText(docs, "doc_id", "text")
    assert(media.schema("media").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.id -> f).toMap
    assert(feats(1L).nBytes == 5)
    assert(feats(2L).nBytes == 0)
    assert(feats(3L).nBytes == 100)
    assert(feats(3L).thumbnailBytes == 50)
    // histogram is a unit-L1 16-bin vector for non-empty payloads
    assert(math.abs(feats(1L).histogram.sum - 1.0f) < 1e-5)
    assert(feats(2L).histogram.sum == 0.0f)
  }

  test("null media payloads are skipped, not crashed on") {
    import org.apache.spark.sql.functions._
    val media = Seq((1L, Some("ok")), (2L, None))
      .toDF("id", "text")
      .select(col("id"), encode(col("text"), "UTF-8").as("media"))
    assert(Multimodal.extractFeatures(spark, media).collect().map(_.id).toSeq == Seq(1L))
    assert(Multimodal.sampleFrameRows(spark, media, 4).collect().map(_.id).distinct.toSeq
      == Seq(1L))
  }

  test("stub decode is deterministic") {
    val b = "some bytes".getBytes("UTF-8")
    assert(Multimodal.MediaStub.decode(b).toSeq == Multimodal.MediaStub.decode(b).toSeq)
    assert(Multimodal.MediaStub.sampleFrames(b, 4).length == 3)
  }
}
