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

  test("m5: patch ledger by hand on a planted 2x2 checkerboard; non-rasters emit nothing") {
    import spark.implicits._
    // 2×2 raster [0 255 / 0 255] upsamples to a 32² canvas whose left half
    // is 0 and right half is 255 — the four 16² patches are therefore
    // (sum, min, max) = (0,0,0), (65280,255,255), (0,0,0), (65280,255,255)
    val pgm = "P5 2 2 255\n".getBytes("US-ASCII") ++ Array[Byte](0, -1, 0, -1)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/pgm", 2, 2, 1, pgm),
      Multimodal.MediaRow(2L, "audio/wav", 0, 0, 1, Array[Byte](1, 2, 3)), // not a raster
      Multimodal.MediaRow(3L, "image/pgm", 2, 2, 1, "P5 corrupt".getBytes) // undecodable
    ).toDS()
    val got = Multimodal.patchGrid(rows).collect().sortBy(r => (r.patch_row, r.patch_col))
    assert(got.forall(_.media_id == 1L), "only the decodable raster emits patches")
    assert(got.map(r => (r.patch_row, r.patch_col, r.px_sum, r.px_min, r.px_max)).toSeq ==
      Seq((0L, 0L, 0L, 0L, 0L), (0L, 1L, 65280L, 255L, 255L),
          (1L, 0L, 0L, 0L, 0L), (1L, 1L, 65280L, 255L, 255L)))
  }

  test("m9: dHash by hand — monotone gradients hit the all-zero/all-one hashes; copies collide; non-rasters silent") {
    import spark.implicits._
    // 9×8 rasters exactly at grid size, so resizeNearest is the identity:
    // left-to-right increasing ⇒ no g(c) > g(c+1) ⇒ hash (0, 0);
    // decreasing ⇒ all 64 bits set ⇒ both 32-bit halves = 0xFFFFFFFF.
    val inc = "P5 9 8 255\n".getBytes("US-ASCII") ++
      Array.tabulate(72)(i => (i % 9 * 10).toByte)
    val dec = "P5 9 8 255\n".getBytes("US-ASCII") ++
      Array.tabulate(72)(i => (80 - i % 9 * 10).toByte)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/pgm", 9, 8, 1, inc),
      Multimodal.MediaRow(2L, "image/pgm", 9, 8, 1, dec),
      Multimodal.MediaRow(3L, "image/pgm", 9, 8, 1, inc.clone()),           // exact copy of 1
      Multimodal.MediaRow(4L, "audio/wav", 0, 0, 1, Array[Byte](1, 2, 3)), // not a raster
      Multimodal.MediaRow(5L, "image/pgm", 9, 8, 1, "P5 corrupt".getBytes) // undecodable
    ).toDS()
    val got = Multimodal.imageDhash(rows).collect().sortBy(_.media_id)
    assert(got.map(_.media_id).toSeq == Seq(1L, 2L, 3L), "only decodable rasters hash")
    val byId = got.map(r => r.media_id -> (r.hash_hi, r.hash_lo)).toMap
    assert(byId(1L) == (0L, 0L))
    assert(byId(2L) == (0xffffffffL, 0xffffffffL))
    assert(byId(3L) == byId(1L), "identical payloads collide exactly")
  }

  test("m9: dHash is re-encoding-robust — the same raster as PGM and as PNG hash identically") {
    import spark.implicits._
    // what perceptual hashing is FOR: a re-encoded copy (different codec,
    // different bytes, different payload length) collapses to the same
    // key. PNG is lossless, so the decoded gray plane is bit-equal and the
    // dHash must be too — through two entirely different decode paths
    // (decodePnm vs javax.imageio).
    val w = 12; val h = 9
    val px  = Array.tabulate(w * h)(i => ((i * 37 + 5) % 256))
    val pgm = s"P5 $w $h 255\n".getBytes("US-ASCII") ++ px.map(_.toByte)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    px.zipWithIndex.foreach { case (v, i) => img.getRaster.setSample(i % w, i / w, 0, v) }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/pgm", w, h, 1, pgm),
      Multimodal.MediaRow(2L, "image/png", w, h, 1, baos.toByteArray)
    ).toDS()
    val got = Multimodal.imageDhash(rows).collect().sortBy(_.media_id)
    assert(got.length == 2, "both codecs must decode")
    assert((got(0).hash_hi, got(0).hash_lo) == (got(1).hash_hi, got(1).hash_lo),
      "PGM and PNG encodings of one raster must collide exactly")
  }

  test("m9: dHash is resample-robust — a 2x nearest upscale of the same image hashes identically") {
    import spark.implicits._
    // the whole point of a perceptual hash: re-encoded/resampled copies
    // collapse. A k× nearest-neighbor upscale passes through the fixed
    // 9×8 grid to the same samples (floor(c·kw/9)/k = floor(c·w/9) holds
    // for k·w multiples), so the dHash is bit-identical.
    val w = 9; val h = 8
    val base = Array.tabulate(w * h)(i => ((i * 53 + 11) % 256).toByte)
    val up = Array.tabulate(w * 2 * h * 2) { i =>
      val y = i / (w * 2) / 2; val x = i % (w * 2) / 2
      base(y * w + x)
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/pgm", w, h, 1, s"P5 $w $h 255\n".getBytes("US-ASCII") ++ base),
      Multimodal.MediaRow(2L, "image/pgm", w * 2, h * 2, 1, s"P5 ${w * 2} ${h * 2} 255\n".getBytes("US-ASCII") ++ up)
    ).toDS()
    val got = Multimodal.imageDhash(rows).collect().sortBy(_.media_id)
    assert(got.length == 2 && (got(0).hash_hi, got(0).hash_lo) == (got(1).hash_hi, got(1).hash_lo))
  }

  test("m6: frame-energy ledger by hand on a planted 10-sample WAV; partial tail frame kept") {
    import spark.implicits._
    // 8-bit mono raws [128,129,127,200,0,255,64,192,130,126] decode to
    // v = raw-128 = [0,1,-1,72,-128,127,-64,64,2,-2]; frame size 8 cuts
    // an 8-sample head frame and a 2-sample tail frame.
    val raws = Array(128, 129, 127, 200, 0, 255, 64, 192, 130, 126)
    val wav  = encodeWav(8000, 1, 8, raws.map(Array(_)))
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio/wav", 0, 0, 1, wav),
      Multimodal.MediaRow(2L, "image/pgm", 2, 2, 1, "P5 2 2 255\n".getBytes ++ Array[Byte](0, 0, 0, 0)),
      Multimodal.MediaRow(3L, "audio/wav", 0, 0, 1, "RIFFjunk".getBytes) // undecodable
    ).toDS()
    val got = Multimodal.audioFrameEnergy(rows).collect().sortBy(_.frame_id)
    assert(got.forall(_.media_id == 1L), "only the decodable WAV emits frames")
    assert(got.map(r => (r.frame_id, r.n_samples, r.sum_abs, r.sum_sq, r.peak)).toSeq ==
      Seq((0L, 8L, 457L, 45891L, 128L), (1L, 2L, 4L, 8L, 2L)))
  }

  test("m7: silent/active runs collapse into segments; boundary frame opens a new one") {
    import spark.implicits._
    // recording 1: frame 0 all-midscale (v=0, silent), frames 1-2 at the
    // rails (sum_abs 1024 / 1016, both >= 512) → segments [silent 0-0],
    // [active 1-2]; recording 2: one silent frame → a single segment.
    val raws1 = Array.fill(8)(128) ++ Array.fill(8)(0) ++ Array.fill(8)(255)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio/wav", 0, 0, 1, encodeWav(8000, 1, 8, raws1.map(Array(_)))),
      Multimodal.MediaRow(2L, "audio/wav", 0, 0, 1, encodeWav(8000, 1, 8, Array.fill(8)(128).map(Array(_))))
    ).toDS()
    val got = Multimodal.activitySegmentsOf(Multimodal.audioFrameEnergy(rows))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 1L, 0L, 0L),
      (1L, 1L, 1L, 2L, 1L, 2L),
      (2L, 0L, 0L, 1L, 0L, 0L)
    ))
  }

  test("m8: histogram by hand — bin edges at code>>4, sparse bins omitted, non-rasters silent") {
    import spark.implicits._
    // pixels 0,15 → bin 0; 16 → bin 1; 255,255 → bin 15: sparse ledger
    // {0:2, 1:1, 15:2}, bins 2..14 absent
    val pgm = "P5 5 1 255\n".getBytes("US-ASCII") ++ Array[Byte](0, 15, 16, -1, -1)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/pgm", 5, 1, 1, pgm),
      Multimodal.MediaRow(2L, "audio/wav", 0, 0, 1, Array[Byte](1, 2, 3))
    ).toDS()
    val got = Multimodal.imageHistogram(rows).collect().sortBy(_.bin)
    assert(got.forall(_.media_id == 1L))
    assert(got.map(r => (r.bin, r.n_px)).toSeq == Seq((0L, 2L), (1L, 1L), (15L, 2L)))
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

  /** Animated GIF via the ImageIO sequence writer — test-side encoder so
    * the multi-frame decoder is checked against the JDK's own writer, not
    * itself.
    */
  private def makeAnimatedGif(
      frames: Seq[java.awt.image.BufferedImage],
      offsets: Seq[(Int, Int)] = Seq.empty
  ): Array[Byte] = {
    val baos   = new java.io.ByteArrayOutputStream()
    val ios    = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.zipWithIndex.foreach { case (f, i) =>
      val meta =
        if (offsets.isEmpty) null
        else {
          // per-frame ImageDescriptor offsets — the delta-rectangle form
          // optimized GIF encoders emit
          val ts   = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(f)
          val m    = writer.getDefaultImageMetadata(ts, null)
          val fmt  = "javax_imageio_gif_image_1.0"
          val root = m.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val d    = root.getElementsByTagName("ImageDescriptor").item(0)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          d.setAttribute("imageLeftPosition", offsets(i)._1.toString)
          d.setAttribute("imageTopPosition", offsets(i)._2.toString)
          m.setFromTree(fmt, root)
          m
        }
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, meta), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    baos.toByteArray
  }

  test("optimized-GIF delta frames composite against the logical screen (offset patch keeps prior content)") {
    def solid(w: Int, h: Int, v: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      img
    }
    // frame 0 fills the 4x4 screen; frame 1 is a 2x2 patch stored at (2,2) —
    // the raw raster would read as a 2x2 image, the composited frame as the
    // full screen with only that quadrant updated
    val gif    = makeAnimatedGif(Seq(solid(4, 4, 100), solid(2, 2, 200)), offsets = Seq((0, 0), (2, 2)))
    val frames = Multimodal.decodeFrames(gif).get
    assert(frames.length == 2)
    assert(frames.forall(f => f.width == 4 && f.height == 4), frames.map(f => (f.width, f.height)))
    val f1 = frames(1)
    def px(x: Int, y: Int): Float = f1.gray(y * 4 + x)
    assert(math.abs(px(3, 3) - 200f / 255f) <= 1.5f / 255f, f1.gray.toSeq)
    assert(math.abs(px(2, 2) - 200f / 255f) <= 1.5f / 255f)
    // outside the patch rect, frame 0's pixels persist (disposal none)
    Seq((0, 0), (3, 0), (0, 3), (1, 1)).foreach { case (x, y) =>
      assert(math.abs(px(x, y) - 100f / 255f) <= 1.5f / 255f, s"($x,$y) = ${px(x, y)}")
    }
  }

  test("frame sampling decodes REAL animated-GIF frames; each sampled payload is that frame's pixels") {
    import spark.implicits._
    def grayFrame(v: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 2) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      img
    }
    val gif = makeAnimatedGif(Seq(grayFrame(0), grayFrame(85), grayFrame(170), grayFrame(255)))
    assert(Multimodal.decodeFrames(gif).get.length == 4)
    val m   = Seq(Multimodal.MediaRow(9L, "image/gif", 2, 2, 4, gif)).toDS()
    val out = Multimodal.sampleFrames(m, stride = 2).collect().sortBy(_.getInt(1))
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 2))
    // the sampled payloads are per-frame PGMs carrying that frame's gray level
    val f0 = Multimodal.decodePnm(out(0).getAs[Array[Byte]](2)).get
    val f2 = Multimodal.decodePnm(out(1).getAs[Array[Byte]](2)).get
    assert(f0.width == 2 && f0.height == 2 && f0.gray.forall(_ == 0.0f))
    assert(f2.gray.forall(g => math.abs(g - 170f / 255f) <= 1.5f / 255f), f2.gray.toSeq)
  }

  /** Hand-assembled 24-bit BI_RGB BMP: 54-byte header + 4-byte-padded BGR
    * rows. `pixelRowsTopDown` lists rows top-first; `height` < 0 writes them
    * as a top-down raster, positive height flips to the spec's bottom-up
    * storage.
    */
  private def makeBmp(width: Int, height: Int, pixelRowsTopDown: Seq[Seq[(Int, Int, Int)]]): Array[Byte] = {
    val h        = math.abs(height)
    val rowBytes = ((3 * width + 3) / 4) * 4
    val buf      = java.nio.ByteBuffer.allocate(54 + rowBytes * h).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24).putInt(0)
    buf.putInt(rowBytes * h).putInt(0).putInt(0).putInt(0).putInt(0)
    val storageRows = if (height < 0) pixelRowsTopDown else pixelRowsTopDown.reverse
    storageRows.foreach { row =>
      row.foreach { case (r, g, b) => buf.put(b.toByte).put(g.toByte).put(r.toByte) }
      (3 * width until rowBytes).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  test("BMP decode: bottom-up raster unflips, BGR averages, row padding skipped") {
    val bmp = makeBmp(
      2,
      2,
      Seq(
        Seq((30, 20, 10), (0, 0, 0)),   // top row: avg 20, 0
        Seq((30, 30, 30), (90, 90, 90)) // bottom row: 30, 90
      )
    )
    val img = Multimodal.decodeBmp(bmp).get
    assert(img.width == 2 && img.height == 2)
    val expected = Array(20f, 0f, 30f, 90f).map(_ / 255f)
    img.gray.zip(expected).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6f) }
  }

  test("BMP decode: negative height means top-down storage, same image back") {
    val rows = Seq(
      Seq((30, 20, 10), (0, 0, 0)),
      Seq((30, 30, 30), (90, 90, 90))
    )
    val up   = Multimodal.decodeBmp(makeBmp(2, 2, rows)).get
    val down = Multimodal.decodeBmp(makeBmp(2, -2, rows)).get
    assert(up.gray.toSeq == down.gray.toSeq)
  }

  test("BMP decode: bad magic, truncation, and unsupported bpp all return None") {
    val good = makeBmp(2, 2, Seq(Seq((1, 1, 1), (2, 2, 2)), Seq((3, 3, 3), (4, 4, 4))))
    assert(Multimodal.decodeBmp("XY".getBytes ++ good.drop(2)).isEmpty)
    assert(Multimodal.decodeBmp(good.dropRight(3)).isEmpty)
    val bpp32 = good.clone(); bpp32(28) = 32
    assert(Multimodal.decodeBmp(bpp32).isEmpty)
    // hostile dimensions: width × height wraps Int — must reject, not allocate
    val huge = good.clone()
    val bb   = java.nio.ByteBuffer.wrap(huge).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 65536); bb.putInt(22, 65536)
    assert(Multimodal.decodeBmp(huge).isEmpty)
  }

  test("decoders never throw on random bytes or corrupted headers (fuzz, fixed seed)") {
    val rnd  = new scala.util.Random(42)
    val good = Seq(
      makeBmp(3, 2, Seq(Seq((9, 9, 9), (8, 8, 8), (7, 7, 7)), Seq((1, 1, 1), (2, 2, 2), (3, 3, 3)))),
      "P5 3 2 255\n".getBytes("US-ASCII") ++ Array[Byte](0, 1, 2, 3, 4, 5)
    )
    // pure noise: every decoder must return (usually None), never throw
    for (_ <- 1 to 300) {
      val bs = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      Multimodal.decodeBmp(bs)
      Multimodal.decodePnm(bs)
      Multimodal.decodeWav(bs)
      Multimodal.decodeFrames(bs)
    }
    // corrupted valid payloads: flip 1–4 bytes anywhere (header or raster)
    for (_ <- 1 to 300; g <- good) {
      val b = g.clone()
      for (_ <- 0 to rnd.nextInt(4)) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeBmp(b)
      Multimodal.decodePnm(b)
    }
    // truncations of valid payloads at every length
    for (g <- good; n <- 0 until g.length) {
      Multimodal.decodeBmp(g.take(n))
      Multimodal.decodePnm(g.take(n))
      Multimodal.decodeWav(g.take(n))
    }
  }

  /** Encode a grayscale pixel grid with the JDK's own writers — the
    * fixture generator for the ImageIO decode tests (PNG is lossless, so
    * planted values round-trip exactly; JPEG is lossy by design).
    */
  private def encodeWith(fmt: String, w: Int, h: Int, gray: Seq[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = gray(y * w + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  test("PNG decode via ImageIO: planted grayscale pixels come back exactly (lossless)") {
    val gray = Seq(0, 51, 102, 153, 204, 255)
    val png  = encodeWith("png", 3, 2, gray)
    val img  = Multimodal.decodeImageIo(png).get
    assert(img.width == 3 && img.height == 2)
    assert(img.gray.toSeq == gray.map(_ / 255f))
  }

  test("JPEG decode via ImageIO: dimensions exact, pixels within lossy tolerance") {
    val gray = Seq.tabulate(64)(i => i * 4) // smooth gradient — JPEG-friendly
    val jpg  = encodeWith("jpg", 8, 8, gray)
    val img  = Multimodal.decodeImageIo(jpg).get
    assert(img.width == 8 && img.height == 8)
    img.gray.zip(gray.map(_ / 255f)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.1f, s"jpeg drifted: $a vs $b")
    }
  }

  test("ImageIO decode: hostile payloads return None — noise, truncations, and a decompression bomb") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val bs = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      Multimodal.decodeImageIo(bs) // must never throw
    }
    val png = encodeWith("png", 4, 4, Seq.fill(16)(128))
    for (n <- 0 until png.length) Multimodal.decodeImageIo(png.take(n))
    // declared-huge header: rewrite the PNG IHDR dimensions to 65536×65536.
    // The reader must reject from the HEADER (MaxImagePixels), before any
    // raster allocation could OOM.
    val bomb = png.clone()
    val dimOff = 16 // PNG: 8-byte sig + 4 len + 4 "IHDR" → width at 16, height at 20 (big-endian)
    for ((v, o) <- Seq((65536, dimOff), (65536, dimOff + 4)); i <- 0 until 4)
      bomb(o + i) = ((v >> (8 * (3 - i))) & 0xff).toByte
    assert(Multimodal.decodeImageIo(bomb).isEmpty)
    assert(4096L * 4096L <= Multimodal.MaxImagePixels, "cap must still admit real 4k frames")
  }

  test("PNG/JPEG rows route to the ImageIO decoder; corrupt declared-png zeroes; resize re-encodes") {
    import spark.implicits._
    val png = encodeWith("png", 4, 1, Seq(0, 255, 255, 255))
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", 4, 1, 1, png),
      Multimodal.MediaRow(2L, "image/png", 4, 1, 1, Array[Byte](1, 2, 3)), // declared but corrupt
      Multimodal.MediaRow(3L, "image/jpeg", 8, 8, 1, encodeWith("jpg", 8, 8, Seq.fill(64)(200)))
    ).toDS()
    val f = Multimodal.extractFeatures(rows, dim = 2).collect().sortBy(_.media_id)
    assert(f(0).features.toSeq == Seq(0.5f, 1.0f))
    assert(f(1).features.toSeq == Seq(0f, 0f), "corrupt declared-png must zero, not stub-fake")
    assert(f(2).features.forall(v => math.abs(v - 200 / 255f) < 0.1f))
    val resized = Multimodal.resizeMedia(rows, 2, 1).collect().sortBy(_.media_id)
    assert(resized(0).format == "image/pgm" && resized(0).width == 2)
    assert(Multimodal.decodePnm(resized(0).payload).get.gray.toSeq == Seq(0f, 1f))
    assert(resized(1).payload.toSeq == Seq[Byte](1, 2, 3), "undecodable rows pass through untouched")
    assert(resized(2).format == "image/pgm" && resized(2).width == 2 && resized(2).height == 1)
  }

  test("BMP rows route to the real decoder and resize re-encodes them as PGM") {
    import spark.implicits._
    val bmp = makeBmp(2, 2, Seq(Seq((100, 100, 100), (200, 200, 200)), Seq((10, 10, 10), (50, 50, 50))))
    val row = Multimodal.MediaRow(5L, "image/bmp", 2, 2, 1, bmp)
    // decode() must agree with the direct parse, not the stub
    val viaDispatch = Multimodal.decode(row, 4)
    val direct      = Multimodal.poolFeatures(Multimodal.decodeBmp(bmp).get.gray, 4)
    assert(viaDispatch.toSeq == direct.toSeq)
    val resized = Multimodal.resizeMedia(Seq(row).toDS(), 1, 1).collect().head
    assert(resized.format == "image/pgm" && resized.width == 1 && resized.height == 1)
    assert(Multimodal.decodePnm(resized.payload).nonEmpty)
  }

  /** Hand-built RIFF/WAVE PCM payload — the inverse of decodeWav, kept
    * test-side so the decoder is checked against the spec, not itself.
    */
  private def encodeWav(
      rate: Int, channels: Int, bits: Int, frames: Array[Array[Int]], fmtCode: Int = 1): Array[Byte] = {
    val bytesPer  = bits / 8
    val dataBytes = frames.length * channels * bytesPer
    val bb = java.nio.ByteBuffer
      .allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmtCode.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * bytesPer).putShort((channels * bytesPer).toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    frames.foreach(f =>
      f.foreach { s =>
        if (bits == 8) bb.put(s.toByte)
        else if (bits == 16) bb.putShort(s.toShort)
        else if (bits == 24) { bb.put(s.toByte).put((s >> 8).toByte).put((s >> 16).toByte) }
        else bb.putInt(s) // 32-bit PCM, or float32 passed as raw IEEE bits
      }
    )
    bb.array()
  }

  test("WAV PCM decode: 16-bit stereo averages channels, 8-bit mono normalizes") {
    // 16-bit stereo: frames average to mono in [-1, 1]
    val wav16 = encodeWav(8000, 2, 16, Array(Array(16384, -16384), Array(32767, 32767), Array(0, -32768)))
    val a     = Multimodal.decodeWav(wav16).get
    assert(a.sampleRate == 8000 && a.channels == 2 && a.samples.length == 3)
    assert(a.samples(0) == 0.0f)
    assert(math.abs(a.samples(1) - 32767f / 32768f) < 1e-6)
    assert(a.samples(2) == -0.5f)
    // 8-bit unsigned mono: 128 → 0, 255 → ~1, 0 → -1
    val wav8 = encodeWav(4000, 1, 8, Array(Array(128), Array(255), Array(0)))
    val b    = Multimodal.decodeWav(wav8).get
    assert(b.samples.toSeq == Seq(0.0f, 127f / 128f, -1.0f))
  }

  test("WAV G.711 decode hits the published ITU anchor values; float32/24/32-bit PCM round-trip") {
    // µ-law (format 7): published expansion anchors
    val ulaw = encodeWav(8000, 1, 8, Array(Array(0xff), Array(0x7f), Array(0x00), Array(0x80)), fmtCode = 7)
    val u    = Multimodal.decodeWav(ulaw).get
    assert(u.samples.toSeq == Seq(0.0f, 0.0f, -32124f / 32768f, 32124f / 32768f))
    // A-law (format 6): published expansion anchors
    val alaw = encodeWav(8000, 1, 8, Array(Array(0x55), Array(0xd5), Array(0x2a), Array(0xaa)), fmtCode = 6)
    val a    = Multimodal.decodeWav(alaw).get
    assert(a.samples.toSeq == Seq(-8f / 32768f, 8f / 32768f, -32256f / 32768f, 32256f / 32768f))
    // IEEE float32 (format 3): raw bit patterns decode to the exact floats
    val fbits = Array(0.25f, -1.0f, 0.0f).map(java.lang.Float.floatToIntBits)
    val fwav  = encodeWav(16000, 1, 32, fbits.map(Array(_)), fmtCode = 3)
    assert(Multimodal.decodeWav(fwav).get.samples.toSeq == Seq(0.25f, -1.0f, 0.0f))
    // 24-bit PCM: full-scale and negative mid-scale sign-extend correctly
    val w24 = encodeWav(8000, 1, 24, Array(Array(8388607), Array(-4194304), Array(0)))
    val s24 = Multimodal.decodeWav(w24).get.samples
    assert(math.abs(s24(0) - 8388607f / 8388608f) < 1e-6 && s24(1) == -0.5f && s24(2) == 0.0f)
    // 32-bit PCM
    val w32 = encodeWav(8000, 1, 32, Array(Array(Int.MinValue), Array(1073741824)))
    assert(Multimodal.decodeWav(w32).get.samples.toSeq == Seq(-1.0f, 0.5f))
  }

  test("WAV decode rejects hostile and truncated payloads via return-None") {
    val good = encodeWav(8000, 1, 16, Array(Array(100), Array(-100)))
    assert(Multimodal.decodeWav(good).nonEmpty)
    // declared data chunk far beyond the actual bytes → None, no allocation
    val hostile = good.clone()
    hostile(40) = 0xff.toByte; hostile(41) = 0xff.toByte
    hostile(42) = 0xff.toByte; hostile(43) = 0x7f.toByte
    assert(Multimodal.decodeWav(hostile).isEmpty)
    assert(Multimodal.decodeWav(good.take(30)).isEmpty)       // truncated mid-header
    assert(Multimodal.decodeWav("RIFFxxxx".getBytes).isEmpty) // not WAVE
    // format 3 (IEEE float) declaring a 16-bit width is malformed → None
    val floatFmt = good.clone(); floatFmt(20) = 3
    assert(Multimodal.decodeWav(floatFmt).isEmpty)
  }

  test("audio/wav rows route to the real decoder; envelope features are non-trivial") {
    import spark.implicits._
    val wav = encodeWav(8000, 1, 16, Array.tabulate(64)(i => Array(if (i < 32) 0 else 16384)))
    val row = Multimodal.MediaRow(1L, "audio/wav", 0, 0, 1, wav)
    val viaDispatch = Multimodal.decode(row, 4)
    // first half silent, second half loud — the envelope sees the step
    assert(viaDispatch(0) == 0.0f && viaDispatch(3) > 0.4f)
    // corrupt declared-wav degrades to zero features, never the stub fake
    val corrupt = Multimodal.decode(row.copy(payload = wav.take(20)), 4)
    assert(corrupt.toSeq == Seq(0.0f, 0.0f, 0.0f, 0.0f))
    // and the Dataset path carries it end to end
    val feats = Multimodal.extractFeatures(Seq(row).toDS(), dim = 4).collect().head
    assert(feats.features.toSeq == viaDispatch.toSeq)
  }

  // ── compressed-media demux ──────────────────────────────────────────

  /** Hand-encode one MPEG1 Layer III 128kbps/44100 mono frame (417 bytes
    * + padding bit 0): header 0xFF 0xFB 0x90 0xC0, zero payload.
    */
  private def mp3Frame(padding: Int = 0): Array[Byte] = {
    val len = 144 * 128000 / 44100 + padding // 417 or 418
    val f   = new Array[Byte](len)
    f(0) = 0xff.toByte
    f(1) = 0xfb.toByte // MPEG1, Layer III, no CRC
    f(2) = (0x90 | (padding << 1)).toByte // bitrate idx 9 = 128k, sr idx 0 = 44100
    f(3) = 0xc0.toByte // mono
    f
  }

  test("MP3 frame walk: frames counted, duration from samples/rate, ID3v2 skipped") {
    val frames  = Array.fill(38)(mp3Frame()).flatten // ~1 second
    val id3     = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++ new Array[Byte](10)
    val m       = Multimodal.parseMp3(id3 ++ frames).get
    assert(m.version == "1" && m.layer == 3 && m.bitrateKbps == 128)
    assert(m.sampleRate == 44100 && m.channels == 1 && m.nFrames == 38)
    assert(m.durationMs == 38L * 1152 * 1000 / 44100) // 992 ms
    // padding bit lengthens a frame by one byte without desyncing the walk
    val padded = mp3Frame(1) ++ mp3Frame(0)
    assert(Multimodal.parseMp3(padded).get.nFrames == 2)
  }

  test("MP3 walk: hostile input returns None; trailing garbage keeps the valid prefix") {
    assert(Multimodal.parseMp3(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Multimodal.parseMp3(new Array[Byte](0)).isEmpty)
    val truncated = mp3Frame().take(100)
    assert(Multimodal.parseMp3(truncated).isEmpty) // first frame incomplete
    val garbageTail = mp3Frame() ++ Array[Byte](0x13, 0x37)
    assert(Multimodal.parseMp3(garbageTail).get.nFrames == 1)
    // reserved version bits / invalid bitrate index reject cleanly
    val badVer = mp3Frame(); badVer(1) = 0xeb.toByte // version bits 01 = reserved
    assert(Multimodal.parseMp3(badVer).isEmpty)
    val freeBr = mp3Frame(); freeBr(2) = 0x00
    assert(Multimodal.parseMp3(freeBr).isEmpty)
  }

  /** Minimal ISO-BMFF builders: box(type, payload) with 32-bit size. */
  private def box(t: String, payload: Array[Byte]): Array[Byte] = {
    val size = 8 + payload.length
    val out  = java.nio.ByteBuffer.allocate(size)
    out.putInt(size).put(t.getBytes("US-ASCII")).put(payload)
    out.array()
  }
  private def u32be(vs: Long*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => bb.putInt(v.toInt))
    bb.array()
  }

  test("MP4 box walk: brand, movie duration, per-track handler/timescale/samples") {
    val ftyp = box("ftyp", "isom".getBytes ++ u32be(0) ++ "isom".getBytes)
    val mvhd = box("mvhd", u32be(0) ++ u32be(0, 0) ++ u32be(1000, 2500) ++ new Array[Byte](80))
    def trak(handler: String, timescale: Long, dur: Long, samples: Long) = {
      val mdhd = box("mdhd", u32be(0) ++ u32be(0, 0) ++ u32be(timescale, dur) ++ u32be(0))
      val hdlr = box("hdlr", u32be(0, 0) ++ handler.getBytes("US-ASCII") ++ new Array[Byte](13))
      val stsz = box("stsz", u32be(0, 0, samples))
      val stbl = box("stbl", stsz)
      val minf = box("minf", stbl)
      box("trak", box("mdia", mdhd ++ hdlr ++ minf))
    }
    val payload = ftyp ++ box("moov", mvhd ++ trak("vide", 30, 75, 75L) ++ trak("soun", 44100, 110250, 108L))
    val m = Multimodal.parseMp4(payload).get
    assert(m.brand == "isom" && m.durationMs == 2500L)
    assert(m.tracks.length == 2)
    val vid = m.tracks.find(_.handler == "vide").get
    assert(vid.timescale == 30L && vid.durationMs == 2500L && vid.nSamples == 75L)
    val aud = m.tracks.find(_.handler == "soun").get
    assert(aud.durationMs == 2500L && aud.nSamples == 108L)
  }

  test("MP4 sample table: stco/stsc/stsz/stss resolve to absolute addresses; I-frame payloads slice mdat") {
    // two chunks: chunk 1 carries 2 samples, chunk 2 carries the remaining 1
    // (stsc runs), per-sample sizes 3/1/2, samples 1 and 3 are sync — the
    // payload bytes prove address arithmetic end-to-end
    val ftyp  = box("ftyp", "isom".getBytes ++ u32be(0) ++ "isom".getBytes)
    val mdat  = Array[Byte](10, 11, 12, 20, 30, 31) // s1=10,11,12  s2=20  s3=30,31
    def moovFor(c1: Long, c2: Long): Array[Byte] = {
      val tkhd = box("tkhd", u32be(0, 0, 0, 1, 0, 1000) ++ new Array[Byte](52) ++ u32be(64L << 16, 48L << 16))
      val mdhd = box("mdhd", u32be(0, 0, 0, 1000, 1000, 0))
      val hdlr = box("hdlr", u32be(0, 0) ++ "vide".getBytes ++ new Array[Byte](13))
      val stsz = box("stsz", u32be(0, 0, 3, 3, 1, 2))
      val stsc = box("stsc", u32be(0, 2, 1, 2, 1, 2, 1, 1)) // chunk1: 2 samples, chunk2+: 1
      val stco = box("stco", u32be(0, 2, c1, c2))
      val stss = box("stss", u32be(0, 2, 1, 3))
      val stbl = box("stbl", stsz ++ stsc ++ stco ++ stss)
      val mvhd = box("mvhd", u32be(0, 0, 0, 1000, 1000) ++ new Array[Byte](80))
      box("moov", mvhd ++ box("trak", tkhd ++ box("mdia", mdhd ++ hdlr ++ box("minf", stbl))))
    }
    val moovLen = moovFor(0, 0).length
    val base    = ftyp.length + moovLen + 8 // mdat body start
    val payload = ftyp ++ moovFor(base, base + 4) ++ box("mdat", mdat)
    val m       = Multimodal.parseMp4(payload).get
    val vid     = m.tracks.find(_.handler == "vide").get
    assert(vid.width == 64 && vid.height == 48)
    assert(m.videoSamples.map(s => (s.offset - base, s.size, s.sync)) ==
      Seq((0L, 3L, true), (3L, 1L, false), (4L, 2L, true)))
    val frames = Multimodal.mp4SyncFrames(payload)
    assert(frames.map(_._1) == Seq(1, 3))
    assert(frames(0)._2.toSeq == Seq[Byte](10, 11, 12))
    assert(frames(1)._2.toSeq == Seq[Byte](30, 31))
    // absent stss ⇒ every sample is sync (ISO 14496-12 §8.6.2)
    def moovNoStss(c1: Long, c2: Long): Array[Byte] = {
      val tkhd = box("tkhd", u32be(0, 0, 0, 1, 0, 1000) ++ new Array[Byte](52) ++ u32be(64L << 16, 48L << 16))
      val mdhd = box("mdhd", u32be(0, 0, 0, 1000, 1000, 0))
      val hdlr = box("hdlr", u32be(0, 0) ++ "vide".getBytes ++ new Array[Byte](13))
      val stsz = box("stsz", u32be(0, 0, 3, 3, 1, 2))
      val stsc = box("stsc", u32be(0, 2, 1, 2, 1, 2, 1, 1))
      val stco = box("stco", u32be(0, 2, c1, c2))
      val mvhd = box("mvhd", u32be(0, 0, 0, 1000, 1000) ++ new Array[Byte](80))
      box("moov", mvhd ++ box("trak", tkhd ++ box("mdia", mdhd ++ hdlr ++ box("minf", box("stbl", stsz ++ stsc ++ stco)))))
    }
    val mLen2 = moovNoStss(0, 0).length
    val base2 = ftyp.length + mLen2 + 8
    val p2    = ftyp ++ moovNoStss(base2, base2 + 4) ++ box("mdat", mdat)
    assert(Multimodal.mp4SyncFrames(p2).map(_._1) == Seq(1, 2, 3))
    // out-of-bounds chunk offsets: index resolves, extraction skips (no overrun)
    val p3 = ftyp ++ moovFor(100000, 100004) ++ box("mdat", mdat)
    assert(Multimodal.mp4SyncFrames(p3).isEmpty)
  }

  test("frame sampling emits REAL MP4 I-frame payloads (stride over the sync list, mdat bytes)") {
    import spark.implicits._
    // doc_id=7, n_chars=23 → 23 samples, sync at 0,4,8,12,16,20 (6 syncs);
    // stride 2 keeps syncs 0,8,16 — payload = that sample's mdat bytes
    val r   = Multimodal.synthRow(7L, 23L)
    val m   = Seq(r).toDS()
    val out = Multimodal.sampleFrames(m, stride = 2).collect().sortBy(_.getInt(1))
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 8, 16))
    out.foreach { row =>
      val i     = row.getInt(1)
      val bytes = row.getAs[Array[Byte]](2)
      assert(bytes.length == (i % 5) + 1, s"sample $i size")
      assert(bytes.forall(_ == ((i * 13 + 7) % 256).toByte), s"sample $i content")
    }
    // a video row whose payload is NOT parseable keeps the metadata fallback
    val fake = Seq(Multimodal.MediaRow(8L, "fake/video", 4, 4, 6, Array[Byte](1, 2, 3))).toDS()
    assert(Multimodal.sampleFrames(fake, stride = 3).collect().map(_.getInt(1)).toSeq == Seq(0, 3))
  }

  test("m4 synthetic mp4: sync-frame payload bytes match the (doc_id, n_chars) arithmetic") {
    // one synthetic row checked against hand arithmetic: doc_id=7, n_chars=23
    // → samples 23, sizes (i%5)+1, sync every 4th, bytes (i*13+7)%256
    val r = Multimodal.synthRow(7L, 23L)
    assert(r.format == "video/mp4" && r.width == 9 && r.height == 9)
    val frames = Multimodal.mp4SyncFrames(r.payload)
    val expIdx = (0 until 23 by 4)
    assert(frames.map(_._1) == expIdx.map(_ + 1))
    expIdx.zip(frames).foreach { case (i, (_, bytes)) =>
      assert(bytes.length == (i % 5) + 1, s"sample $i size")
      assert(bytes.forall(_ == ((i * 13 + 7) % 256).toByte), s"sample $i content")
    }
    val meta = Multimodal.parseMp4(r.payload).get
    assert(meta.videoSamples.length == 23 && meta.tracks.head.nSamples == 23)
  }

  test("MP4 walk: truncated/hostile boxes return None, never overrun") {
    assert(Multimodal.parseMp4(new Array[Byte](4)).isEmpty)
    val ftyp = box("ftyp", "isom".getBytes ++ u32be(0))
    // declared size beyond the buffer
    val lying = ftyp.clone(); lying(3) = 0x7f.toByte
    assert(Multimodal.parseMp4(lying).isEmpty)
    // no ftyp at all -> not an MP4
    assert(Multimodal.parseMp4(box("moov", new Array[Byte](0))).isEmpty)
    // random bytes (fixed seed) never throw
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(64) + 4)(rnd.nextInt(256).toByte)
      Multimodal.parseMp4(junk) // must not throw
      Multimodal.parseMp3(junk)
    }
  }

  test("mediaDemux dispatches every family: image dims, wav/mp3 audio, mp4 video") {
    import spark.implicits._
    val pgm = "P5 2 2 255 ".getBytes("US-ASCII") ++ Array[Byte](0, 50, 100, (200 & 0xff).toByte)
    val wav = {
      // 4 samples, 8-bit mono 8000Hz — reuse the encoder-shaped bytes from the WAV spec
      val data = Array[Byte](0, 64, 127.toByte, 255.toByte)
      val bb = java.nio.ByteBuffer.allocate(44 + data.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
      bb.put("data".getBytes).putInt(data.length).put(data)
      bb.array()
    }
    val mp3  = Array.fill(5)(mp3Frame()).flatten
    val ftyp = box("ftyp", "isom".getBytes ++ u32be(0))
    val mvhd = box("mvhd", u32be(0) ++ u32be(0, 0) ++ u32be(1000, 7000) ++ new Array[Byte](80))
    val mp4  = ftyp ++ box("moov", mvhd)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/pgm", 2, 2, 1, pgm),
      Multimodal.MediaRow(2L, "audio/wav", 0, 0, 1, wav),
      Multimodal.MediaRow(3L, "audio/mpeg", 0, 0, 1, mp3),
      Multimodal.MediaRow(4L, "video/mp4", 0, 0, 1, mp4),
      Multimodal.MediaRow(5L, "video/mp4", 0, 0, 1, Array[Byte](9, 9, 9, 9))
    )
    val got = Multimodal.mediaDemux(rows.toDS()).collect().map(d => d.media_id -> d).toMap
    assert(got(1L).kind == "image" && got(1L).ok && got(1L).width == 2 && got(1L).height == 2)
    assert(got(2L).kind == "audio" && got(2L).ok && got(2L).sample_rate == 8000 && got(2L).duration_ms == 0L) // 4 samples < 1ms
    assert(got(3L).kind == "audio" && got(3L).ok && got(3L).n_frames == 5L && got(3L).duration_ms == 5L * 1152 * 1000 / 44100)
    assert(got(4L).kind == "video" && got(4L).ok && got(4L).duration_ms == 7000L)
    assert(got(5L).kind == "video" && !got(5L).ok)
  }

  test("m2 synthetic corpus: every family's synthRow round-trips through its real parser") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.synthRow(4L, 37L),  // image/pgm: w=6, h=5
      Multimodal.synthRow(5L, 37L),  // wav: 37 samples
      Multimodal.synthRow(6L, 37L),  // mp3: 37/10+1 = 4 frames
      Multimodal.synthRow(7L, 137L)  // mp4: dur (137%100)*10 = 370ms, 50 samples
    )
    val got = Multimodal.mediaDemux(rows.toDS()).collect().map(d => d.media_id -> d).toMap
    assert(got(4L).kind == "image" && got(4L).ok && got(4L).width == 6 && got(4L).height == 5)
    assert(got(5L).kind == "audio" && got(5L).ok && got(5L).sample_rate == 8000 && got(5L).n_frames == 37L
      && got(5L).duration_ms == 37L * 1000 / 8000)
    assert(got(6L).kind == "audio" && got(6L).ok && got(6L).n_frames == 4L
      && got(6L).duration_ms == 4L * 1152 * 1000 / 44100)
    assert(got(7L).kind == "video" && got(7L).ok && got(7L).duration_ms == 370L && got(7L).n_frames == 50L
      && got(7L).n_tracks == 1)
  }

  test("m3 maintained catalog == m2 full recompute; base segment never re-demuxed") {
    val full = Multimodal.mediaDemuxQuery(spark, sf0001).collect().map(_.toSeq).toSeq
    val incr = Multimodal.mediaDemuxIncremental(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(full.nonEmpty && incr == full)
    // the sealed base segment is reused, not rebuilt, on a second increment
    val split = graft.sources.Tables.documents(spark, sf0001)
      .agg(org.apache.spark.sql.functions.expr("coalesce((max(doc_id) + 1) div 2, 0)").as("k"))
      .head().getLong(0)
    val baseDir = java.nio.file.Paths.get(
      Multimodal.mediaCatalogBaseCache(spark, sf0001, split), "catalog.parquet")
    def mtime = java.nio.file.Files.list(baseDir)
      .filter(_.toString.endsWith(".parquet")).findFirst.get.toFile.lastModified()
    val m0 = mtime
    Multimodal.mediaDemuxIncremental(spark, sf0001).collect()
    assert(mtime == m0, "base catalog segment was rewritten by an increment")
  }
}
