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

  test("PGM decode: planted pixels come back exactly, header comments handled") {
    val header = "P5\n# a comment\n3 2\n255\n".getBytes("US-ASCII")
    val pixels = Array[Byte](0, 51, 102, -103, -52, -1) // 0,51,102,153,204,255
    val img    = Multimodal.decodePnm(header ++ pixels)
    assert(img.isDefined)
    val d = img.get
    assert(d.width == 3 && d.height == 2)
    assert(d.gray.toSeq == Seq(0f, 51 / 255f, 102 / 255f, 153 / 255f, 204 / 255f, 1f))
  }

  test("PPM decode: RGB averages to grayscale; maxval scales") {
    // one pixel (30, 60, 90) at maxval 100 -> mean 60 / 100 = 0.6
    val bytes = "P6 1 1 100\n".getBytes("US-ASCII") ++ Array[Byte](30, 60, 90)
    val d     = Multimodal.decodePnm(bytes).get
    assert(d.width == 1 && d.height == 1 && math.abs(d.gray(0) - 0.6f) < 1e-6f)
  }

  test("malformed netpbm degrades: truncated raster and bad magic decode to None") {
    assert(Multimodal.decodePnm("P5 2 2 255\n".getBytes ++ Array[Byte](1, 2)).isEmpty) // short raster
    assert(Multimodal.decodePnm("JFIF....".getBytes).isEmpty)                          // not netpbm
    assert(Multimodal.decodePnm("P5 0 2 255\n".getBytes).isEmpty)                      // zero width
  }

  test("extractFeatures runs the REAL decoder for netpbm rows, stub otherwise") {
    import spark.implicits._
    // 4-pixel PGM: values 0,255,255,255 -> dim-2 pooled means (0.5, 1.0)
    val pgm = "P5 4 1 255\n".getBytes("US-ASCII") ++ Array[Byte](0, -1, -1, -1)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/pgm", 4, 1, 1, pgm),
      Multimodal.MediaRow(2L, "image/pgm", 4, 1, 1, "P5 not really".getBytes), // declared but corrupt
      Multimodal.MediaRow(3L, "fake/raw", 1, 1, 1, Array[Byte](0, 0, 0))       // stub path
    ).toDS()
    val f = Multimodal.extractFeatures(rows, dim = 2).collect().sortBy(_.media_id)
    assert(f(0).features.toSeq == Seq(0.5f, 1.0f))
    assert(f(1).features.toSeq == Seq(0f, 0f), "corrupt declared-netpbm must zero, not fake")
    assert(f(2).features.length == 2)
  }

  test("decode: overflowing dimension headers return None, never throw or false-succeed") {
    // 65536 x 40000 wraps w*h negative in Int; 65536 x 65536 wraps to 0 —
    // both must hit the return-None contract, not NegativeArraySizeException
    // or a bogus Some with an empty raster
    val negWrap  = "P5 65536 40000 255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    val zeroWrap = "P5 65536 65536 255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(Multimodal.decodePnm(negWrap).isEmpty)
    assert(Multimodal.decodePnm(zeroWrap).isEmpty)
  }

  test("resize: planted 4x2 PGM downsamples to the expected 2x1 pixels and round-trips") {
    import spark.implicits._
    // pixels 0,64,128,255 / 10,20,30,40 — nearest-neighbor 4x2→2x1 picks
    // row 0 (2*0/1=0? no: sy = y*H/h = 0*2/1 = 0), columns 0 and 2
    val px  = Array[Byte](0, 64, -128, -1, 10, 20, 30, 40)
    val pgm = "P5 4 2 255\n".getBytes("US-ASCII") ++ px
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/pgm", 4, 2, 1, pgm),
      Multimodal.MediaRow(2L, "image/pgm", 4, 1, 1, "P5 corrupt".getBytes), // undecodable: untouched
      Multimodal.MediaRow(3L, "fake/raw", 1, 1, 1, Array[Byte](9, 9))       // non-netpbm: untouched
    ).toDS()
    val out = Multimodal.resizeMedia(rows, 2, 1).collect().sortBy(_.media_id)
    assert(out(0).width == 2 && out(0).height == 1 && out(0).format == "image/pgm")
    val back = Multimodal.decodePnm(out(0).payload).get
    assert(back.width == 2 && back.height == 1)
    assert(back.gray.toSeq == Seq(0f, 128 / 255f)) // source pixels (0,0) and (0,2)
    // pass-through rows are bit-identical
    assert(out(1).payload.toSeq == "P5 corrupt".getBytes.toSeq && out(1).width == 4)
    assert(out(2).payload.toSeq == Seq[Byte](9, 9) && out(2).format == "fake/raw")
  }

  test("resize then decode equals decode then resizeNearest (metadata consistent)") {
    // 3x3 gradient; resize to 2x2 both ways must agree up to PGM requantization
    val px  = Array[Byte](0, 30, 60, 90, 120, -106, -76, -46, -16)
    val pgm = "P5 3 3 255\n".getBytes("US-ASCII") ++ px
    val direct = Multimodal.resizeNearest(Multimodal.decodePnm(pgm).get, 2, 2)
    val rt     = Multimodal.decodePnm(Multimodal.encodePgm(direct)).get
    assert(rt.width == 2 && rt.height == 2)
    // requantization error ≤ 0.5/255 per pixel
    direct.gray.zip(rt.gray).foreach { case (a, b) => assert(math.abs(a - b) <= 0.5f / 255f) }
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
