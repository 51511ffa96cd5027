package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.mediaTable(spark, sf0001)
    val r = m.head()
    assert(r.payload.nonEmpty && r.format == "fake/raw" && r.width >= 1 && r.height >= 1)
    assert(m.count() == 500)
  }

  test("feature extraction is deterministic with a fixed output dim") {
    val m  = Multimodal.mediaTable(spark, sf0001)
    val f1 = Multimodal.extractFeatures(m, dim = 8).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(m, dim = 8).collect().sortBy(_.media_id)
    assert(f1.forall(_.features.length == 8))
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    // payload_len matches the text byte length
    val meta = Multimodal.payloadMeta(spark, sf0001).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f1.forall(f => meta(f.media_id) == f.payload_len))
  }

  test("frame sampling emits every stride-th frame") {
    import spark.implicits._
    val m = Seq(
      Multimodal.MediaRow(7L, "fake/video", 4, 4, 10, Array[Byte](1, 2, 3))
    ).toDS()
    val frames = Multimodal.sampleFrames(m, stride = 3).collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getLong(0) == 7L))
  }
}
