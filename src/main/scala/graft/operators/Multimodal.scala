package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/featurized per partition.
  *
  * Decoding dispatches on the format tag: netpbm images (PGM/PPM) decode
  * FOR REAL via the pure-JVM [[decodePnm]] parser, uncompressed 24-bit
  * BMP via [[decodeBmp]], compressed formats the JDK ships codecs for
  * (JPEG, PNG, GIF) via [[decodeImageIo]] (`javax.imageio` — built into
  * the JRE, no native deps, works offline), and RIFF/WAVE PCM audio via
  * the hand-rolled [[decodeWav]]. Compressed audio and MP4 video DEMUX
  * for real too ([[parseMp3]] walks MPEG audio frames, [[parseMp4]] walks
  * the ISO-BMFF box tree — frame counts, durations, track tables); only
  * the codec SAMPLE SYNTHESIS (MDCT/H.26x) falls to [[decodeStub]], a
  * clearly-marked deterministic fake. The Spark-side plumbing is real either way: binary
  * column + metadata struct schema, partition-batched decoding via typed
  * `mapPartitions` (the Scala analogue of `mapInPandas` batch decoding:
  * one iterator per partition so a codec instance amortizes
  * per-partition, not per-row), and a fixed-width feature-vector output
  * schema ready for the ANN operators.
  */
object Multimodal {

  /** One media row: payload plus the typed metadata a real pipeline would
    * carry (format tag, declared dimensions, frame count).
    */
  final case class MediaRow(
      media_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      payload: Array[Byte]
  )

  final case class MediaFeatures(media_id: Long, payload_len: Long, features: Array[Float])

  /** Build a media table from `documents` — payload = UTF-8 bytes of the
    * text standing in for an encoded image; metadata derived
    * deterministically. (Real deployments read payloads from their own
    * binary-bearing Parquet; the *column shapes* are what matters here.)
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        lit("fake/raw").as("format"),
        (pmod(col("doc_id"), lit(64)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 1).cast("int").as("height"),
        lit(1).as("n_frames"),
        encode(col("text"), "UTF-8").as("payload")
      )
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake standing in for codecs the JDK
    * lacks entirely (compressed audio, video containers). Every image
    * family decodes for real ([[decodePnm]]/[[decodeBmp]]/
    * [[decodeImageIo]]), as does WAV PCM audio ([[decodeWav]]);
    * everything around this call (batching, schema, partitioning) is
    * production-shaped either way.
    */
  private[operators] def decodeStub(row: MediaRow, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < row.payload.length) {
      out(i % dim) += (row.payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  final case class DecodedImage(width: Int, height: Int, gray: Array[Float])

  /** REAL decoder for binary netpbm images — P5 (PGM, grayscale) and P6
    * (PPM, RGB), maxval ≤ 255 — the one image family a pure JVM can parse
    * in ~30 lines with no codec library. Header token scan handles
    * whitespace and `#` comments per the spec; pixels normalize to [0,1]
    * grayscale (RGB averages its channels). Truncated or malformed
    * payloads return None — callers degrade observably, never throw.
    */
  private[graft] def decodePnm(b: Array[Byte]): Option[DecodedImage] = {
    if (b.length < 2 || b(0) != 'P' || (b(1) != '5' && b(1) != '6')) return None
    val rgb = b(1) == '6'
    var pos = 2
    def nextInt(): Int = {
      while (pos < b.length && (b(pos) == '#' || Character.isWhitespace(b(pos)))) {
        if (b(pos) == '#') while (pos < b.length && b(pos) != '\n') pos += 1
        else pos += 1
      }
      var v = -1
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = math.max(v, 0) * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val w      = nextInt()
    val h      = nextInt()
    val maxVal = nextInt()
    pos += 1 // exactly one whitespace byte separates maxval from raster
    if (w <= 0 || h <= 0 || maxVal <= 0 || maxVal > 255) return None
    // dimension product in LONG: a malicious 'P5 65536 65536' header would
    // wrap w*h in Int (to 0 or negative) and either allocate a bogus
    // empty image or throw — both violate the return-None contract. Any
    // honest payload's pixel count is also bounded by the byte array, so
    // the length check below (done in long space) rejects huge headers.
    val nL = w.toLong * h.toLong
    if (nL > Int.MaxValue || (b.length - pos).toLong < (if (rgb) 3L * nL else nL)) return None
    val n = nL.toInt
    val out = new Array[Float](n)
    var i   = 0
    while (i < n) {
      val v =
        if (rgb) {
          val o = pos + 3 * i
          ((b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)) / 3.0f
        } else (b(pos + i) & 0xff).toFloat
      out(i) = v / maxVal
      i += 1
    }
    Some(DecodedImage(w, h, out))
  }

  /** REAL decoder for uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) —
    * the second image family a pure JVM parses without a codec library.
    * Little-endian header fields, 4-byte-padded rows, bottom-up raster
    * unless the height field is negative (top-down per the spec); BGR
    * channels average to [0,1] grayscale like [[decodePnm]]. All size
    * arithmetic runs in long space so hostile width/height headers reject
    * via the return-None contract instead of wrapping into a bogus
    * allocation; palette, RLE, and 16/32-bpp variants are out of scope and
    * return None.
    */
  private[graft] def decodeBmp(b: Array[Byte]): Option[DecodedImage] = {
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def i32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = i32(10)
    val dibSize = i32(14)
    val w       = i32(18)
    val hRaw    = i32(22)
    val topDown = hRaw < 0
    val h       = math.abs(hRaw.toLong).toInt // abs of Int.MinValue would stay negative in Int
    val bpp     = u16(28)
    val comp    = i32(30)
    if (dibSize < 40 || w <= 0 || hRaw == Int.MinValue || h <= 0 || bpp != 24 || comp != 0) return None
    val rowBytes = ((3L * w + 3) / 4) * 4
    val nL       = w.toLong * h.toLong
    if (nL > Int.MaxValue || dataOff < 54 || dataOff.toLong + rowBytes * h > b.length) return None
    val out = new Array[Float](nL.toInt)
    var y   = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val base   = dataOff.toLong + srcRow * rowBytes
      var x      = 0
      while (x < w) {
        val o = (base + 3L * x).toInt // bounded by b.length, so Int-safe
        out(y * w + x) = (((b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)) / 3.0f) / 255.0f
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(w, h, out))
  }

  /** Pixel-count ceiling for [[decodeImageIo]] — 16M pixels (a 4096×4096
    * frame; the bulk-RGB read below is a 64 MB int array at the cap). The
    * dimensions come from the format HEADER via the reader API *before*
    * any raster allocation, so a decompression bomb (a 40-byte PNG
    * declaring 65536×65536) rejects via the return-None contract instead
    * of an executor OOM — the same hostile-header stance as
    * [[decodePnm]]/[[decodeBmp]]'s long-space dimension checks.
    */
  private[graft] val MaxImagePixels: Long = 1L << 24

  /** REAL decoder for the compressed image formats the JDK bundles codecs
    * for — JPEG, PNG, GIF (plus whatever else the runtime's ImageIO
    * service registry offers). Pure `javax.imageio`: no new dependencies,
    * works offline. Header dimensions are validated against
    * [[MaxImagePixels]] before the raster is decoded; unreadable,
    * truncated, or oversized payloads return None per the shared
    * degrade-observably contract (callers emit zero features, never a
    * fake). Pixels normalize to [0,1] grayscale by the same per-pixel RGB
    * average as the hand-rolled decoders.
    */
  private[graft] def decodeImageIo(b: Array[Byte]): Option[DecodedImage] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h.toLong > MaxImagePixels) return None
          val img  = reader.read(0)
          val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
          val out  = new Array[Float](w * h)
          var i = 0
          while (i < out.length) {
            val p = rgbs(i)
            out(i) = ((((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3.0f) / 255.0f
            i += 1
          }
          Some(DecodedImage(w, h, out))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Cheap container-signature gate for the multi-frame decode path: GIF
    * (`GIF87a`/`GIF89a`) is the only bundled-JDK multi-frame format the
    * corpus carries, so single-frame payloads (JPEG/PNG — the common case)
    * skip [[decodeFrames]] entirely instead of paying a full raster decode
    * just to discard it (ADVICE r9).
    */
  private[graft] def isGifSignature(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte && b(3) == '8'.toByte

  /** REAL multi-frame decode via the ImageIO sequence API — container
    * formats whose bundled JDK reader exposes multiple images (animated
    * GIF being the universal one) yield EVERY frame as a [[DecodedImage]];
    * single-frame formats yield a 1-element seq.
    *
    * GIF frames are COMPOSITED against the logical screen: optimized GIFs
    * store later frames as delta rectangles at an (x, y) offset with a
    * per-frame disposal method, so the raw raster is a partial patch, not
    * the frame a viewer shows. Each emitted frame is the full logical
    * screen after drawing the patch (transparent pixels leave the prior
    * content visible), then disposal applies: `none`/`doNotDispose` keep
    * the canvas, `restoreToBackgroundColor` clears the patch rect,
    * `restoreToPrevious` reverts it. Undrawn/cleared canvas reads as
    * black. Non-GIF multi-frame readers (none bundled in the corpus's
    * formats) keep the raw per-image rasters.
    *
    * The same hostile-header stance as [[decodeImageIo]]: per-frame
    * dimensions are validated against [[MaxImagePixels]] from the header
    * before any raster is allocated, and BOTH the total source raster
    * budget and the total composited output budget (n × screen) are capped
    * by the same bound (a 10,000-frame GIF bomb rejects instead of
    * materializing), all under the shared return-None contract.
    */
  private[graft] def decodeFrames(b: Array[Byte]): Option[Vector[DecodedImage]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true) // seekForwardOnly=false: getNumImages needs scans
          val n = reader.getNumImages(true)
          if (n <= 0) return None
          val isGif = reader.getFormatName.equalsIgnoreCase("gif")
          // logical screen for compositing; frame-0 dims when absent
          var sw = 0
          var sh = 0
          if (isGif) {
            val sm = reader.getStreamMetadata
            if (sm != null) {
              val tree = sm.getAsTree("javax_imageio_gif_stream_1.0").asInstanceOf[org.w3c.dom.Element]
              val lsd  = tree.getElementsByTagName("LogicalScreenDescriptor")
              if (lsd.getLength > 0) {
                val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
                sw = e.getAttribute("logicalScreenWidth").toInt
                sh = e.getAttribute("logicalScreenHeight").toInt
              }
            }
            if (sw <= 0 || sh <= 0) { sw = reader.getWidth(0); sh = reader.getHeight(0) }
            if (sw <= 0 || sh <= 0 || n.toLong * sw * sh > MaxImagePixels) return None
          }
          val canvas =
            if (isGif) new java.awt.image.BufferedImage(sw, sh, java.awt.image.BufferedImage.TYPE_INT_ARGB)
            else null
          val g = if (isGif) canvas.createGraphics() else null
          try {
            val out         = Vector.newBuilder[DecodedImage]
            var totalPixels = 0L
            var i           = 0
            while (i < n) {
              val w = reader.getWidth(i)
              val h = reader.getHeight(i)
              totalPixels += w.toLong * h.toLong
              if (w <= 0 || h <= 0 || totalPixels > MaxImagePixels) return None
              val img = reader.read(i)
              if (!isGif) {
                out += toGray(img.getRGB(0, 0, w, h, null, 0, w), w, h)
              } else {
                val (left, top, disposal) = gifFrameGeometry(reader, i)
                val prev =
                  if (disposal == "restoreToPrevious")
                    canvas.getRGB(0, 0, sw, sh, null, 0, sw)
                  else null
                g.drawImage(img, left, top, null)
                out += toGray(canvas.getRGB(0, 0, sw, sh, null, 0, sw), sw, sh)
                disposal match {
                  case "restoreToBackgroundColor" =>
                    g.setComposite(java.awt.AlphaComposite.Clear)
                    g.fillRect(left, top, w, h)
                    g.setComposite(java.awt.AlphaComposite.SrcOver)
                  case "restoreToPrevious" =>
                    canvas.setRGB(0, 0, sw, sh, prev, 0, sw)
                  case _ => () // none / doNotDispose: canvas persists
                }
              }
              i += 1
            }
            Some(out.result())
          } finally if (g != null) g.dispose()
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** ARGB pixel array → grayscale [[DecodedImage]] (alpha ignored:
    * transparent canvas is transparent-BLACK, the documented composite
    * background).
    */
  private def toGray(rgbs: Array[Int], w: Int, h: Int): DecodedImage = {
    val gray = new Array[Float](w * h)
    var j = 0
    while (j < gray.length) {
      val p = rgbs(j)
      gray(j) = ((((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3.0f) / 255.0f
      j += 1
    }
    DecodedImage(w, h, gray)
  }

  /** Frame i's (left, top, disposalMethod) from the GIF image metadata tree
    * (`ImageDescriptor` position attributes + `GraphicControlExtension`
    * disposal); (0, 0, "none") when a node is absent.
    */
  private def gifFrameGeometry(reader: javax.imageio.ImageReader, i: Int): (Int, Int, String) = {
    var left     = 0
    var top      = 0
    var disposal = "none"
    val md       = reader.getImageMetadata(i)
    if (md != null) {
      val tree = md.getAsTree("javax_imageio_gif_image_1.0").asInstanceOf[org.w3c.dom.Element]
      val desc = tree.getElementsByTagName("ImageDescriptor")
      if (desc.getLength > 0) {
        val e = desc.item(0).asInstanceOf[org.w3c.dom.Element]
        left = e.getAttribute("imageLeftPosition").toInt
        top = e.getAttribute("imageTopPosition").toInt
      }
      val gce = tree.getElementsByTagName("GraphicControlExtension")
      if (gce.getLength > 0) {
        val d = gce.item(0).asInstanceOf[org.w3c.dom.Element].getAttribute("disposalMethod")
        if (d.nonEmpty) disposal = d
      }
    }
    (left, top, disposal)
  }

  final case class DecodedAudio(sampleRate: Int, channels: Int, samples: Array[Float])

  /** ITU-T G.711 µ-law byte → linear 16-bit sample (the public-standard
    * expansion: complement, mantissa<<3 + bias, shift by segment, sign
    * from the complemented byte). Anchors: 0xFF → 0, 0x00 → −32124,
    * 0x80 → +32124.
    */
  private[graft] def ulawToLinear(uIn: Int): Int = {
    val u = ~uIn & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** ITU-T G.711 A-law byte → linear 16-bit sample (XOR 0x55, segment
    * expansion). Anchors: 0x55 → −8, 0xD5 → +8, 0x2A → −32256,
    * 0xAA → +32256.
    */
  private[graft] def alawToLinear(aIn: Int): Int = {
    val a   = (aIn ^ 0x55) & 0xff
    val seg = (a & 0x70) >> 4
    var t   = (a & 0x0f) << 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** REAL decoder for RIFF/WAVE audio — linear PCM (8-bit unsigned,
    * 16/24/32-bit signed), IEEE float32 (format 3), and the G.711
    * telephony codecs (A-law format 6, µ-law format 7, via
    * [[alawToLinear]]/[[ulawToLinear]]) — every WAV family a pure JVM
    * decodes without a codec library, closing the "audio is a stub" gap
    * the same way netpbm/BMP closed images. Chunk scan honors the RIFF
    * contract (little-endian sizes, word-aligned chunks, `fmt ` before
    * `data`); channels average to one mono stream normalized to [−1, 1],
    * the same collapse-to-one-plane convention as the image decoders'
    * grayscale. All size arithmetic runs in long space and every chunk
    * bound is checked against the actual byte array, so hostile headers
    * (a 40-byte payload declaring a 2 GB data chunk) reject via the
    * shared return-None contract instead of allocating or throwing.
    * Perceptually-compressed codecs (MP3/AAC/OGG) have no JDK decoder and
    * stay with the disclosed stub, as video sample synthesis does (the
    * DEMUX layers are real — [[parseMp3]]/[[parseMp4]]).
    */
  private[graft] def decodeWav(b: Array[Byte]): Option[DecodedAudio] = {
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def i32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int, s: String): Boolean = (0 until 4).forall(i => b(o + i) == s.charAt(i).toByte)
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos                                     = 12L
    var fmtOk                                   = false
    var fmtCode, channels, rate, bits           = 0
    var samples: Array[Float]                   = null
    while (pos + 8 <= b.length && samples == null) {
      val p  = pos.toInt
      val sz = i32(p + 4).toLong & 0xffffffffL // RIFF sizes are unsigned
      if (pos + 8 + sz > b.length) return None // truncated or hostile chunk
      if (tag(p, "fmt ") && sz >= 16) {
        fmtCode = u16(p + 8)
        channels = u16(p + 10)
        rate = i32(p + 12)
        bits = u16(p + 22) // fmt data +14: bitsPerSample
        fmtOk = channels > 0 && rate > 0 && (fmtCode match {
          case 1     => bits == 8 || bits == 16 || bits == 24 || bits == 32 // linear PCM
          case 3     => bits == 32                                          // IEEE float
          case 6 | 7 => bits == 8                                           // G.711 A-law / µ-law
          case _     => false
        })
      } else if (tag(p, "data")) {
        if (!fmtOk) return None
        val frameBytes = (bits / 8) * channels
        val n          = (sz / frameBytes).toInt
        val out        = new Array[Float](n)
        var f          = 0
        while (f < n) {
          val base = p + 8 + f * frameBytes
          var acc  = 0.0f
          var c    = 0
          while (c < channels) {
            val o = base + (bits / 8) * c
            acc += ((fmtCode, bits) match {
              case (1, 8)  => ((b(o) & 0xff) - 128) / 128.0f
              case (1, 16) => ((b(o) & 0xff) | (b(o + 1) << 8)).toShort / 32768.0f
              case (1, 24) =>
                (((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) << 16)) << 8 >> 8) / 8388608.0f
              case (1, 32) => i32(o) / 2147483648.0f
              case (3, _)  => java.lang.Float.intBitsToFloat(i32(o))
              case (6, _)  => alawToLinear(b(o) & 0xff) / 32768.0f
              case _       => ulawToLinear(b(o) & 0xff) / 32768.0f
            })
            c += 1
          }
          out(f) = acc / channels
          f += 1
        }
        samples = out
      }
      pos += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (samples == null) None else Some(DecodedAudio(rate, channels, samples))
  }

  /** Mean-pool a pixel stream into `dim` contiguous buckets — the
    * fixed-width feature contract the ANN operators consume.
    */
  private[graft] def poolFeatures(px: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (px.isEmpty) return out
    val counts = new Array[Int](dim)
    var i      = 0
    while (i < px.length) {
      val bkt = (i.toLong * dim / px.length).toInt
      out(bkt) += px(i); counts(bkt) += 1; i += 1
    }
    var j = 0
    while (j < dim) { if (counts(j) > 0) out(j) /= counts(j); j += 1 }
    out
  }

  /** Format-dispatched image parse: netpbm and 24-bit BMP via the
    * hand-rolled parsers, JPEG/PNG/GIF via the JDK codecs; None for
    * non-image formats (caller decides stub vs degrade).
    */
  private[graft] def parseImage(format: String, payload: Array[Byte]): Option[Option[DecodedImage]] =
    format match {
      case "image/pgm" | "image/ppm"                  => Some(decodePnm(payload))
      case "image/bmp"                                => Some(decodeBmp(payload))
      case "image/jpeg" | "image/jpg" | "image/png" | "image/gif" => Some(decodeImageIo(payload))
      case _                                          => None
    }

  /** Format-dispatched decode: every image family decodes for real
    * ([[decodePnm]]/[[decodeBmp]]/[[decodeImageIo]]) and WAV PCM audio via
    * [[decodeWav]] (features = the pooled amplitude ENVELOPE — |sample|
    * mean per bucket — since a mean of signed samples converges to zero);
    * only media with no JDK codec at all (compressed audio, video) hits
    * the disclosed stub. A payload DECLARED a real format but undecodable
    * yields all-zero features — an observable degradation a quality
    * filter can drop, never a stub-fake that would masquerade as a real
    * decode.
    */
  private[graft] def decode(row: MediaRow, dim: Int): Array[Float] =
    parseImage(row.format, row.payload) match {
      case Some(Some(img)) => poolFeatures(img.gray, dim)
      case Some(None)      => new Array[Float](dim)
      case None if row.format == "audio/wav" =>
        decodeWav(row.payload) match {
          case Some(a) => poolFeatures(a.samples.map(math.abs), dim)
          case None    => new Array[Float](dim)
        }
      case None => decodeStub(row, dim)
    }

  /** Feature extraction over the media table: per-partition iteration (codec
    * init would happen once per partition, here a no-op), fixed-dim float
    * features out. Narrow transformation — scales with splits, no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup would go here (one codec instance)
      rows.map(r => MediaFeatures(r.media_id, r.payload.length.toLong, decode(r, dim)))
    }
  }

  /** Nearest-neighbor resize of a decoded grayscale image — integer source
    * index per target pixel, no interpolation: deterministic, allocation-
    * bounded, and exactly reproducible across JVMs (float filter kernels
    * are not). The standard thumbnail/normalize step between decode and
    * feature extraction.
    */
  private[graft] def resizeNearest(img: DecodedImage, w: Int, h: Int): DecodedImage = {
    require(w > 0 && h > 0)
    val out = new Array[Float](w * h)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x  = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        out(y * w + x) = img.gray(sy * img.width + sx)
        x += 1
      }
      y += 1
    }
    DecodedImage(w, h, out)
  }

  /** Re-encode a grayscale image as binary PGM (P5, maxval 255) — the
    * inverse of [[decodePnm]] for the grayscale plane, so resized payloads
    * stay valid netpbm and round-trip through the same decoder.
    */
  private[graft] def encodePgm(img: DecodedImage): Array[Byte] = {
    val header = s"P5\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out    = new Array[Byte](header.length + img.gray.length)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < img.gray.length) {
      val v = math.round(math.min(1.0f, math.max(0.0f, img.gray(i))) * 255.0f)
      out(header.length + i) = v.toByte
      i += 1
    }
    out
  }

  /** Resize every decodable image payload (netpbm, BMP, JPEG/PNG/GIF) to
    * `w`×`h` and re-encode as PGM, updating the metadata columns to match;
    * undecodable or non-image rows pass through UNTOUCHED (resize is an
    * enhancement, not a filter — a quality gate downstream decides what to
    * drop). Same per-partition batching as [[extractFeatures]]; narrow,
    * shuffle-free.
    */
  def resizeMedia(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val decoded = parseImage(r.format, r.payload).flatten
        decoded match {
          // resized output re-encodes as PGM regardless of source format:
          // the grayscale plane is what survives the pipeline
          case Some(img) =>
            val resized = resizeNearest(img, w, h)
            r.copy(format = "image/pgm", width = w, height = h, payload = encodePgm(resized))
          case None => r
        }
      }
    }
  }

  final case class SampledFrame(media_id: Long, frame_no: Int, frame_payload: Array[Byte])

  /** `ftyp` at bytes 4–8 — the ISO-BMFF signature gate for the MP4 frame
    * path, same role as [[isGifSignature]] for the raster path.
    */
  private[graft] def isMp4Signature(b: Array[Byte]): Boolean =
    b.length >= 8 && b(4) == 'f'.toByte && b(5) == 't'.toByte && b(6) == 'y'.toByte && b(7) == 'p'.toByte

  /** Frame sampling — every `stride`-th frame, REAL where the container
    * yields frames without a codec:
    *   - animated GIF: frames individually decoded and COMPOSITED
    *     ([[decodeFrames]]); each sampled frame lands as its own PGM
    *     payload — actual per-frame pixels, not the container repeated;
    *   - MP4: the sync (I-frame) samples resolved through the
    *     stco/stsc/stsz/stss tables ([[mp4SyncFrames]]); every `stride`-th
    *     sync sample lands as its own payload of that frame's mdat bytes
    *     (codec bitstream, not pixels — frame PAYLOAD extraction is the
    *     demux layer's job, pixel decode stays behind the disclosed stub),
    *     `frame_no` = the track's 0-based sample index.
    * Both paths are signature-gated so single-frame payloads (JPEG/PNG —
    * the common case) never pay a decode that the fallback would discard
    * (ADVICE r9). Everything else keeps the metadata-level enumeration
    * (declared `n_frames` stepped by `stride`, container payload carried
    * through). Typed `mapPartitions`-style flatMap, the per-partition
    * batch shape every decoder here uses; output schema
    * `(media_id, frame_no, frame_payload)` is unchanged.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): DataFrame = {
    require(stride > 0)
    import media.sparkSession.implicits._
    media
      .flatMap { r =>
        val gifFrames =
          if (isGifSignature(r.payload)) decodeFrames(r.payload).filter(_.length > 1) else None
        val mp4Frames =
          if (gifFrames.isEmpty && isMp4Signature(r.payload)) Some(mp4SyncFrames(r.payload)).filter(_.nonEmpty)
          else None
        (gifFrames, mp4Frames) match {
          case (Some(frames), _) =>
            Range(0, frames.length, stride)
              .map(i => SampledFrame(r.media_id, i, encodePgm(frames(i))))
          case (_, Some(syncs)) =>
            syncs.zipWithIndex.collect {
              case ((sampleNo, bytes), j) if j % stride == 0 =>
                SampledFrame(r.media_id, sampleNo - 1, bytes)
            }
          case _ =>
            Range(0, math.max(r.n_frames, 0), stride)
              .map(i => SampledFrame(r.media_id, i, r.payload))
        }
      }
      .toDF()
  }

  // ── Compressed-media DEMUX (real container/frame parsing; only the
  //    codec's sample synthesis remains behind the disclosed stub) ──────

  final case class Mp3Meta(
      version: String,   // "1" | "2" | "2.5"
      layer: Int,        // 1..3
      bitrateKbps: Int,  // first frame's
      sampleRate: Int,
      channels: Int,
      nFrames: Int,
      durationMs: Long
  )

  private val Mp3BitrateV1 = Array(
    // layer index 1..3 → kbps table, index 1..14 (0 = free, 15 = invalid)
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // L1
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),    // L2
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)      // L3
  )
  private val Mp3BitrateV2 = Array(
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256), // L1
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),      // L2
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)       // L3
  )

  /** REAL MPEG-audio (MP3/MP2/MP1) frame walker: skips a leading ID3v2 tag
    * (syncsafe size), then parses each 4-byte frame header — sync, version,
    * layer, bitrate/samplerate indices, padding — computes the frame length
    * from the standard tables, and steps frame to frame. Yields frame
    * count, duration (frames × samples-per-frame / rate), and the stream
    * parameters: the demux layer of an audio pipeline (what sampling,
    * deduplication by duration, and stats need), all pure JVM. The MDCT
    * sample DECODE is the part that stays behind [[decodeStub]] — that
    * line is disclosed, not blurred. Malformed/truncated input → None;
    * a valid prefix with trailing garbage ≥ one frame counts what it saw.
    */
  private[graft] def parseMp3(b: Array[Byte]): Option[Mp3Meta] = {
    var pos = 0
    // ID3v2 header: "ID3" ver(2) flags(1) syncsafe-size(4)
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) | ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      pos = 10 + sz
      if (pos < 0 || pos > b.length) return None
    }
    var nFrames            = 0
    var samplesAccum       = 0L
    var first: Option[Mp3Meta] = None
    var ok                 = true
    while (ok && pos + 4 <= b.length) {
      val h0 = b(pos) & 0xff; val h1 = b(pos + 1) & 0xff
      if (h0 != 0xff || (h1 & 0xe0) != 0xe0) ok = false
      else {
        val verBits   = (h1 >> 3) & 0x3 // 00=2.5, 10=2, 11=1 (01 reserved)
        val layerBits = (h1 >> 1) & 0x3 // 01=III, 10=II, 11=I (00 reserved)
        if (verBits == 1 || layerBits == 0) return None
        val layer   = 4 - layerBits // 1..3
        val h2      = b(pos + 2) & 0xff
        val brIdx   = (h2 >> 4) & 0xf
        val srIdx   = (h2 >> 2) & 0x3
        val padding = (h2 >> 1) & 0x1
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/invalid
        val v1      = verBits == 3
        val kbps    = (if (v1) Mp3BitrateV1 else Mp3BitrateV2)(layer - 1)(brIdx)
        val srBase  = Array(44100, 48000, 32000)(srIdx)
        val rate    = verBits match {
          case 3 => srBase     // MPEG1
          case 2 => srBase / 2 // MPEG2
          case _ => srBase / 4 // MPEG2.5
        }
        val samplesPerFrame = layer match {
          case 1 => 384
          case 2 => 1152
          case _ => if (v1) 1152 else 576
        }
        val frameLen =
          if (layer == 1) (12 * kbps * 1000 / rate + padding) * 4
          else samplesPerFrame / 8 * kbps * 1000 / rate + padding
        if (frameLen <= 4 || pos + frameLen > b.length) ok = false
        else {
          if (first.isEmpty) {
            val mono = ((b(pos + 3) & 0xff) >> 6) == 3
            val ver  = verBits match { case 3 => "1"; case 2 => "2"; case _ => "2.5" }
            first = Some(Mp3Meta(ver, layer, kbps, rate, if (mono) 1 else 2, 0, 0L))
          }
          nFrames += 1
          samplesAccum += samplesPerFrame
          pos += frameLen
        }
      }
    }
    first.collect {
      case m if nFrames > 0 =>
        m.copy(nFrames = nFrames, durationMs = samplesAccum * 1000L / m.sampleRate)
    }
  }

  final case class Mp4Track(
      handler: String, timescale: Long, durationMs: Long, nSamples: Long,
      width: Int = 0, height: Int = 0)
  /** One addressable sample of the video track: absolute file offset + byte
    * size from the stco/stsc/stsz walk, sync (I-frame) flag from stss
    * (absent stss ⇒ every sample is sync, per ISO 14496-12 §8.6.2).
    */
  final case class Mp4Sample(offset: Long, size: Long, sync: Boolean)
  final case class Mp4Meta(
      brand: String, durationMs: Long, tracks: Seq[Mp4Track],
      videoSamples: Seq[Mp4Sample] = Nil)

  /** REAL MP4 / ISO-BMFF box parser: walks the `[size][type]` box tree
    * (64-bit largesize supported), recursing into moov/trak/mdia/minf/stbl,
    * and extracts the movie duration (mvhd v0/v1), and per track the
    * handler type (vide/soun), media timescale + duration (mdhd), track
    * dimensions (tkhd, 16.16 fixed point) and sample count (stsz). For the
    * FIRST video track the full sample table is resolved — per-sample sizes
    * (stsz), chunk offsets (stco), sample-to-chunk runs (stsc) and sync
    * flags (stss) combine into absolute `(offset, size, sync)` addresses
    * ([[Mp4Sample]]) — so I-frame payloads are extractable from the
    * container with no codec involved; the codec payload decode itself
    * stays behind the disclosed stub. Hostile/truncated structures → None,
    * never a throw or an overrun.
    */
  private[graft] def parseMp4(b: Array[Byte]): Option[Mp4Meta] = {
    def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def typ(o: Int): String = new String(b, o + 4, 4, "US-ASCII")
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")

    var brand                        = ""
    var movieDurMs                   = 0L
    val tracks                       = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
    var tHandler                     = ""; var tScale = 0L; var tDurMs = 0L; var tSamples = 0L
    var tW                           = 0; var tH = 0
    var tSizes: Array[Long]          = null // per-sample sizes (null = uniform tUniform)
    var tUniform                     = 0L
    var tChunkOffs: Array[Long]      = null
    var tStsc: Array[(Long, Long)]   = null // (first_chunk, samples_per_chunk)
    var tSync: Array[Long]           = null // 1-indexed sync sample numbers
    var videoSamples: Seq[Mp4Sample] = Nil
    var sawFtyp                      = false

    /** stco/stsc/stsz/stss → absolute per-sample addresses (first video
      * track only). Chunks take their samples-per-chunk from the stsc run
      * in force; samples are laid out back-to-back within each chunk.
      */
    def resolveSamples(): Seq[Mp4Sample] = {
      if (tChunkOffs == null || tStsc == null || tStsc.isEmpty) return Nil
      val n =
        if (tSizes != null) tSizes.length
        else if (tUniform > 0 && tSamples > 0 && tSamples <= Int.MaxValue) tSamples.toInt
        else return Nil // per-entry sizes declared but table unresolvable
      val syncSet = if (tSync == null) null else tSync.toSet
      val out     = scala.collection.mutable.ArrayBuffer.empty[Mp4Sample]
      var sample  = 0
      var chunk   = 0
      while (chunk < tChunkOffs.length && sample < n) {
        // samples-per-chunk = last stsc entry whose first_chunk ≤ this chunk
        var spc = tStsc.head._2
        var e   = 0
        while (e < tStsc.length && tStsc(e)._1 <= chunk + 1) { spc = tStsc(e)._2; e += 1 }
        var off = tChunkOffs(chunk)
        var j   = 0L
        while (j < spc && sample < n) {
          val sz = if (tSizes != null) tSizes(sample) else tUniform
          out += Mp4Sample(off, sz, syncSet == null || syncSet.contains(sample + 1L))
          off += sz; sample += 1; j += 1
        }
        chunk += 1
      }
      out.toSeq
    }

    def flushTrack(): Unit = {
      if (tScale > 0 || tSamples > 0 || tHandler.nonEmpty) {
        tracks += Mp4Track(tHandler, tScale, tDurMs, tSamples, tW, tH)
        if (tHandler == "vide" && videoSamples.isEmpty) videoSamples = resolveSamples()
      }
      tHandler = ""; tScale = 0L; tDurMs = 0L; tSamples = 0L; tW = 0; tH = 0
      tSizes = null; tUniform = 0L; tChunkOffs = null; tStsc = null; tSync = null
    }

    def walk(start: Int, end: Int): Boolean = {
      var pos = start
      while (pos + 8 <= end) {
        var size   = u32(pos)
        var hdr    = 8
        if (size == 1) {
          if (pos + 16 > end) return false
          size = u64(pos + 8); hdr = 16
        } else if (size == 0) size = (end - pos).toLong // box extends to end
        if (size < hdr || pos + size > end) return false
        val t    = typ(pos)
        val body = pos + hdr
        t match {
          case "ftyp" =>
            if (size < hdr + 4) return false
            brand = typ(body - 4); sawFtyp = true // major_brand is body's first 4 bytes
          case "mvhd" =>
            if (size < hdr + 20) return false
            val ver = b(body) & 0xff
            val (ts, dur) =
              if (ver == 1) (u32(body + 20), u64(body + 24)) else (u32(body + 12), u32(body + 16))
            if (ts > 0) movieDurMs = dur * 1000L / ts
          case "mdhd" =>
            if (size < hdr + 20) return false
            val ver = b(body) & 0xff
            val (ts, dur) =
              if (ver == 1) (u32(body + 20), u64(body + 24)) else (u32(body + 12), u32(body + 16))
            tScale = ts
            if (ts > 0) tDurMs = dur * 1000L / ts
          case "hdlr" =>
            if (size < hdr + 12) return false
            tHandler = typ(body + 4) // handler_type at body+8, typ reads o+4
          case "tkhd" =>
            // v0 fixed layout: width/height as 16.16 at body+76/+80
            if (size >= hdr + 84 && (b(body) & 0xff) == 0) {
              tW = (u32(body + 76) >> 16).toInt
              tH = (u32(body + 80) >> 16).toInt
            }
          // Sample-table boxes degrade LENIENTLY: a declared entry count
          // that does not fit inside the box keeps the header-level
          // metadata (e.g. stsz's sample_count) but skips the table — the
          // sample index is then unresolvable (no addressing, no frame
          // extraction) without rejecting the whole container. Truncated
          // tables can never overrun: entries are read only when the full
          // declared span fits.
          case "stsz" =>
            if (size < hdr + 12) return false
            tUniform = u32(body + 4)
            tSamples = u32(body + 8) // sample_count
            if (tUniform == 0 && tSamples <= (size - hdr - 12) / 4)
              tSizes = Array.tabulate(tSamples.toInt)(i => u32(body + 12 + 4 * i))
          case "stco" =>
            if (size < hdr + 8) return false
            val n = u32(body + 4)
            if (n <= (size - hdr - 8) / 4)
              tChunkOffs = Array.tabulate(n.toInt)(i => u32(body + 8 + 4 * i))
          case "stsc" =>
            if (size < hdr + 8) return false
            val n = u32(body + 4)
            if (n <= (size - hdr - 8) / 12)
              tStsc = Array.tabulate(n.toInt)(i => (u32(body + 8 + 12 * i), u32(body + 12 + 12 * i)))
          case "stss" =>
            if (size < hdr + 8) return false
            val n = u32(body + 4)
            if (n <= (size - hdr - 8) / 4)
              tSync = Array.tabulate(n.toInt)(i => u32(body + 8 + 4 * i))
          case "trak" =>
            if (!walk(body, pos + size.toInt)) return false
            flushTrack()
          case c if containers.contains(c) =>
            if (!walk(body, pos + size.toInt)) return false
          case _ => () // leaf box we don't need — skip
        }
        if (size > Int.MaxValue) return false
        pos += size.toInt
      }
      pos == end || pos >= end - 7 // trailing sub-8-byte slack tolerated
    }

    if (b.length < 8 || !walk(0, b.length) || !sawFtyp) None
    else Some(Mp4Meta(brand, movieDurMs, tracks.toSeq, videoSamples))
  }

  /** I-FRAME extraction from an MP4 payload: every sync sample's bytes,
    * sliced at the stco/stsc/stsz-resolved address. Out-of-bounds addresses
    * (hostile or truncated files) are skipped, never overrun. Frame numbers
    * are the track's 1-indexed sample numbers, so a consumer can correlate
    * with stss directly.
    */
  private[graft] def mp4SyncFrames(b: Array[Byte]): Seq[(Int, Array[Byte])] =
    parseMp4(b) match {
      case None => Nil
      case Some(m) =>
        m.videoSamples.zipWithIndex.collect {
          case (s, i) if s.sync && s.offset >= 0 && s.size >= 0 && s.offset + s.size <= b.length =>
            (i + 1, java.util.Arrays.copyOfRange(b, s.offset.toInt, (s.offset + s.size).toInt))
        }
    }

  /** Demux metadata per media row, format-dispatched across EVERY family
    * the engine handles: real image decode dims, WAV sample counts, MP3
    * frame walks, MP4 box trees. Output schema is the fixed media-catalog
    * row a curation pipeline joins against (kind, ok flag, dims, duration,
    * frames/samples, track count). Narrow mapPartitions, shuffle-free —
    * the same batch shape as [[extractFeatures]].
    */
  final case class MediaDemux(
      media_id: Long,
      kind: String, // image | audio | video | other
      ok: Boolean,
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long,
      n_frames: Long,
      n_tracks: Int
  )

  def mediaDemux(media: Dataset[MediaRow]): Dataset[MediaDemux] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        parseImage(r.format, r.payload) match {
          case Some(img) =>
            MediaDemux(r.media_id, "image", img.isDefined, img.map(_.width).getOrElse(0),
              img.map(_.height).getOrElse(0), 0, 0L, 1L, 1)
          case None =>
            r.format match {
              case "audio/wav" =>
                val a = decodeWav(r.payload)
                MediaDemux(r.media_id, "audio", a.isDefined, 0, 0,
                  a.map(_.sampleRate).getOrElse(0),
                  a.map(x => x.samples.length / math.max(x.channels, 1) * 1000L /
                    math.max(x.sampleRate, 1)).getOrElse(0L),
                  a.map(_.samples.length.toLong).getOrElse(0L), 1)
              case "audio/mpeg" | "audio/mp3" =>
                val m = parseMp3(r.payload)
                MediaDemux(r.media_id, "audio", m.isDefined, 0, 0,
                  m.map(_.sampleRate).getOrElse(0), m.map(_.durationMs).getOrElse(0L),
                  m.map(_.nFrames.toLong).getOrElse(0L), 1)
              case "video/mp4" =>
                val m = parseMp4(r.payload)
                val vid = m.flatMap(_.tracks.find(_.handler == "vide"))
                MediaDemux(r.media_id, "video", m.isDefined,
                  vid.map(_.width).getOrElse(0), vid.map(_.height).getOrElse(0), 0,
                  m.map(_.durationMs).getOrElse(0L),
                  vid.map(_.nSamples).getOrElse(0L), m.map(_.tracks.length).getOrElse(0))
              case _ =>
                MediaDemux(r.media_id, "other", ok = false, 0, 0, 0, 0L, r.n_frames.toLong, 0)
            }
        }
      }
    }
  }

  /** Deterministic synthetic media corpus for [[mediaDemuxQuery]]: each
    * document becomes a VALID payload of one of the four media families
    * (by doc_id mod 4 — binary PGM, RIFF/WAVE PCM, MPEG1-LIII frames,
    * ISO-BMFF MP4), with every size parameter a pure function of
    * (doc_id, n_chars). That is the point: the DuckDB oracle predicts the
    * demux output from the SAME arithmetic on the `documents` columns —
    * no binary parsing oracle-side — so the REAL decoders/demuxers sit
    * inside the hash-checked path: a parser that misreads a header
    * byte, a frame length, or a box offset breaks the driver gate, not
    * just a unit spec.
    */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRow] =
    syntheticMediaWhere(spark, dir, lit(true))

  /** Slice variant: the predicate lands BEFORE the typed map, so it pushes
    * into the documents scan (an id-range slice reads only its row groups —
    * the property [[mediaDemuxIncremental]]'s delta pass relies on).
    */
  private[graft] def syntheticMediaWhere(
      spark: SparkSession,
      dir: String,
      cond: org.apache.spark.sql.Column
  ): Dataset[MediaRow] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .where(cond)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .map { case (id, nChars) => synthRow(id, nChars) }
  }

  private[graft] def synthRow(id: Long, nChars: Long): MediaRow = {
    import java.nio.{ByteBuffer, ByteOrder}
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(t.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    def u32(vs: Long*): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 * vs.length); vs.foreach(v => bb.putInt(v.toInt)); bb.array()
    }
    (id % 4) match {
      case 0 => // binary PGM, dims from doc_id, raster bytes synthetic
        val w      = (id % 14 + 2).toInt
        val h      = (id % 10 + 1).toInt
        val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
        val raster = Array.tabulate(w * h)(i => ((i * 31 + id) % 256).toByte)
        MediaRow(id, "image/pgm", w, h, 1, header ++ raster)
      case 1 => // 8-bit mono 8000 Hz WAV, sample count from n_chars
        val n    = math.min(math.max(nChars, 1L), 64L).toInt
        val data = Array.tabulate(n)(i => ((i * 7 + id) % 256).toByte)
        val bb   = ByteBuffer.allocate(44 + n).order(ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes).putInt(36 + n).put("WAVE".getBytes)
        bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
          .putInt(8000).putInt(8000).putShort(1).putShort(8)
        bb.put("data".getBytes).putInt(n).put(data)
        MediaRow(id, "audio/wav", 0, 0, 1, bb.array())
      case 2 => // MPEG1 Layer III 128 kbps / 44100 mono frames, count from n_chars
        val nf    = math.min(nChars / 10 + 1, 5L).toInt
        val frame = new Array[Byte](417)
        frame(0) = 0xff.toByte; frame(1) = 0xfb.toByte; frame(2) = 0x90.toByte; frame(3) = 0xc0.toByte
        MediaRow(id, "audio/mpeg", 0, 0, nf, Array.fill(nf)(frame).flatten)
      case _ => // MP4: one video track with a REAL sample table + mdat payload
        val durMs   = (nChars % 100) * 10
        val samples = math.min(nChars, 50L).toInt
        val w       = (id % 14 + 2).toInt
        val h       = (id % 10 + 2).toInt
        // per-sample size (i%5)+1 bytes, every byte of sample i is
        // ((i*13+id)%256), sync (I-frame) every 4th sample — all pure
        // (doc_id, n_chars) arithmetic so the m4 oracle predicts the
        // extracted-payload byte sums with no binary parsing
        val sizes = Array.tabulate(samples)(i => (i % 5) + 1)
        val data  = Array.concat(Array.tabulate(samples) { i =>
          Array.fill(sizes(i))(((i * 13 + id) % 256).toByte)
        }: _*)
        val syncNums = (0 until samples by 4).map(i => i + 1L) // 1-indexed
        val ftyp     = box("ftyp", "isom".getBytes ++ u32(0) ++ "isom".getBytes)
        def buildMoov(chunkOffset: Long): Array[Byte] = {
          val mvhd = box("mvhd", u32(0, 0, 0, 1000, durMs) ++ new Array[Byte](80))
          val tkhd = box(
            "tkhd",
            u32(0, 0, 0, 1, 0, durMs) ++ new Array[Byte](52) ++ u32(w.toLong << 16, h.toLong << 16)
          )
          val mdhd  = box("mdhd", u32(0, 0, 0, 1000, durMs, 0))
          val hdlr  = box("hdlr", u32(0, 0) ++ "vide".getBytes("US-ASCII") ++ new Array[Byte](13))
          val stsz  = box("stsz", u32((Seq(0L, 0L, samples.toLong) ++ sizes.map(_.toLong)): _*))
          val stsc  = box("stsc", u32(0, 1, 1, samples, 1)) // one chunk run: all samples
          val stco  = box("stco", u32(0, 1, chunkOffset))
          val stss  = box("stss", u32((Seq(0L, syncNums.length.toLong) ++ syncNums): _*))
          val stbl  = box("stbl", stsz ++ stsc ++ stco ++ stss)
          val trak  = box("trak", tkhd ++ box("mdia", mdhd ++ hdlr ++ box("minf", stbl)))
          box("moov", mvhd ++ trak)
        }
        // two-pass: moov's size is offset-independent, so build once to
        // measure, once with the real mdat body offset
        val moovLen = buildMoov(0L).length
        val moov    = buildMoov(ftyp.length + moovLen + 8L)
        MediaRow(id, "video/mp4", w, h, samples, ftyp ++ moov ++ box("mdat", data))
    }
  }

  final case class PatchRow(
      media_id: Long,
      patch_row: Long,
      patch_col: Long,
      px_sum: Long,
      px_min: Long,
      px_max: Long
  )

  /** Canonical canvas and patch side for [[patchGrid]] — 32² canvas cut
    * into 16² patches (a 2×2 grid), the ViT preprocessing shape scaled to
    * the test payloads.
    */
  val PatchCanvas = 32
  val PatchSize   = 16

  /** M5 — ViT-style patch extraction: decode → nearest-resize to the
    * [[PatchCanvas]]² canvas → cut [[PatchSize]]² patches → per-patch
    * INTEGER pixel ledger `(px_sum, px_min, px_max)` over the 0–255 byte
    * plane. This is the image half of "tokenize the modality": a vision
    * loader consumes exactly this grid (patch embeddings start from these
    * pixels), and the integer ledger is the deterministic audit of each
    * patch's content. Per-row work is a narrow `mapPartitions` decode
    * (binary parsing has no Catalyst expression form — the m-family
    * contract); nothing shuffles but the output sort.
    *
    * Uniquely for a raster op, m5 carries a FULL DuckDB oracle: the
    * synthetic corpus's PGM pixels are pure doc_id arithmetic
    * (`synthRow`: byte(i) = (i·31 + id) mod 256, dims from id), and
    * [[resizeNearest]]'s index map (`sy = ty·h div 32`) plus the patch
    * cut are integer expressions — so the oracle regenerates every pixel
    * of every patch relationally and the hash checks the DECODE PATH
    * end-to-end, pixels included (m2 checks headers; this checks rasters).
    * The byte recovery `round(gray·255)` is exact: gray = v/255f with
    * float error ≪ the rounding margin.
    */
  def patchGrid(media: Dataset[MediaRow]): Dataset[PatchRow] = {
    import media.sparkSession.implicits._
    val canvas = PatchCanvas
    val side   = PatchSize
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        parseImage(r.format, r.payload).flatten match {
          case Some(img) =>
            val c = resizeNearest(img, canvas, canvas)
            val n = canvas / side
            for { pr <- 0 until n; pc <- 0 until n } yield {
              var sum = 0L
              var mn  = 255L
              var mx  = 0L
              var y   = pr * side
              while (y < (pr + 1) * side) {
                var x = pc * side
                while (x < (pc + 1) * side) {
                  val b = math.round(c.gray(y * canvas + x) * 255f).toLong
                  sum += b
                  if (b < mn) mn = b
                  if (b > mx) mx = b
                  x += 1
                }
                y += 1
              }
              PatchRow(r.media_id, pr.toLong, pc.toLong, sum, mn, mx)
            }
          case None => Seq.empty[PatchRow]
        }
      }
    }
  }

  /** M5's registry surface: the patch ledger over the synthetic corpus's
    * decodable images (the PGM quarter; WAV/MP3/MP4 payloads are not
    * rasters and emit no patches).
    */
  def patchGridQuery(spark: SparkSession, dir: String): DataFrame =
    patchGrid(syntheticMedia(spark, dir))
      .toDF()
      .orderBy("media_id", "patch_row", "patch_col")

  final case class AudioFrameRow(
      media_id: Long,
      frame_id: Long,
      n_samples: Long,
      sum_abs: Long,
      sum_sq: Long,
      peak: Long
  )

  /** Samples per analysis frame for [[audioFrameEnergy]] — a short-time
    * window (8 samples = 1 ms at the synthetic corpus's 8 kHz), the
    * front end of every VAD / silence-trim / loudness-normalization stage
    * a speech-training pipeline runs before feature extraction.
    */
  val AudioFrameSamples: Int = 8

  /** M6 — short-time frame energy over decoded PCM: cut each audio
    * stream into non-overlapping [[AudioFrameSamples]]-sample frames and
    * emit per-frame Σ|v|, Σv² and peak |v| in INTEGER quantization units
    * (v = round(sample·128) ∈ [−128, 128]). Integers rather than float
    * RMS on purpose: for 8-bit PCM the decode `(raw−128)/128f` is exact
    * in binary floating point, so `round(·128)` recovers `raw−128`
    * losslessly and the whole ledger is hashable cross-engine — the same
    * no-floats-in-the-oracle discipline as [[patchGrid]]'s pixel sums.
    *
    * Scale shape: embarrassingly parallel `mapPartitions` over payload
    * rows (decode is per-row, no shuffle); the final ORDER BY in the
    * registry surface is presentation-only. At 100 TB this is a
    * map-only pass whose cost is the payload scan itself.
    *
    * Reference anchor: the reference stores blobs and queries metadata
    * only (`StorageQueryConsole/Config/QueryType.cs:3-12` has no media
    * ops) — this extends the engine to the audio-curation surface the
    * survey's LLM-pipeline mandate calls for.
    */
  def audioFrameEnergy(media: Dataset[MediaRow]): Dataset[AudioFrameRow] = {
    import media.sparkSession.implicits._
    val frame = AudioFrameSamples
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val decoded = r.format match {
          case "audio/wav" => decodeWav(r.payload)
          case _           => None
        }
        decoded match {
          case Some(a) =>
            a.samples.iterator.zipWithIndex
              .map { case (s, i) => (i / frame, math.round(s * 128f).toLong) }
              .toSeq
              .groupBy(_._1)
              .toSeq
              .map { case (fid, vs) =>
                val xs = vs.map(_._2)
                AudioFrameRow(
                  r.media_id,
                  fid.toLong,
                  xs.length.toLong,
                  xs.map(math.abs).sum,
                  xs.map(v => v * v).sum,
                  xs.map(math.abs).max
                )
              }
          case None => Seq.empty[AudioFrameRow]
        }
      }
    }
  }

  /** M6's registry surface: the frame-energy ledger over the synthetic
    * corpus's WAV quarter (`doc_id % 4 == 1`); the slice predicate lands
    * before the typed map so the documents scan prunes to that quarter.
    */
  def audioFrameEnergyQuery(spark: SparkSession, dir: String): DataFrame =
    audioFrameEnergy(syntheticMediaWhere(spark, dir, col("doc_id") % 4 === 1))
      .toDF()
      .orderBy("media_id", "frame_id")

  final case class AudioHashRow(media_id: Long, hash_hi: Long, hash_lo: Long)

  /** Time slices for [[audioEnvelopeHash]] — 65 slices yield 64
    * adjacent-difference bits, the 1-D analogue of the dHash grid's 9
    * columns per row.
    */
  val AudioHashSlices: Int = 65

  /** M10 — perceptual AUDIO hash: the recording's integer amplitude
    * envelope nearest-resampled into [[AudioHashSlices]] time slices
    * (slice k of sample i = `i·65 div n`, the same integer index map as
    * the dHash resize), per-slice energy `E_k = Σ|round(sample·128)|`,
    * bit k = `E_k > E_{k+1}` — a temporal-envelope difference hash, the
    * audio twin of [[imageDhash]] (Haitsma/Kalker-style band-difference
    * fingerprinting with TIME slices standing in for spectral bands: a
    * relational FFT would put floats in the oracle, while the envelope
    * form keeps the whole derivation integer and therefore hash-checkable
    * cross-engine). Amplitude comparisons (not values) make the hash
    * invariant to uniform loudness scaling up to quantization, the same
    * monotone-compare robustness the image dHash gets from pixel
    * gradients. Packed as two 32-bit BIGINT halves so neither engine
    * shifts into the sign bit (m9's convention).
    *
    * Like every m-family decoder this is per-row `mapPartitions` codec
    * work over the REAL WAV parse ([[decodeWav]]); the 8-bit PCM decode
    * round-trips losslessly through `round(·128)` (m6's argument), so
    * the DuckDB oracle rebuilds every slice energy from the synthetic
    * corpus's sample formula and checks RIFF parse + decode + resample +
    * difference-pack end to end.
    */
  def audioEnvelopeHash(media: Dataset[MediaRow]): Dataset[AudioHashRow] = {
    import media.sparkSession.implicits._
    val slices = AudioHashSlices
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val decoded = r.format match {
          case "audio/wav" => decodeWav(r.payload)
          case _           => None
        }
        decoded.collect { case a if a.samples.nonEmpty =>
          val n = a.samples.length
          val e = new Array[Long](slices)
          var i = 0
          while (i < n) {
            e((i.toLong * slices / n).toInt) += math.abs(math.round(a.samples(i) * 128f)).toLong
            i += 1
          }
          var hi = 0L
          var lo = 0L
          var k  = 0
          while (k < slices - 1) {
            if (e(k) > e(k + 1)) { if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32) }
            k += 1
          }
          AudioHashRow(r.media_id, hi, lo)
        }
      }
    }
  }

  /** M10's registry surface: the envelope-hash ledger over the WAV
    * quarter (`doc_id % 4 == 1`) — a read of the decode-once layout.
    */
  def audioEnvelopeHashQuery(spark: SparkSession, dir: String): DataFrame =
    audioHashLedger(spark, dir).orderBy("media_id")

  /** Bump when either perceptual-hash derivation changes; folds into the
    * corresponding ledger layout's cache key. v2: the layouts additionally
    * persist `bandstat.parquet` (the level-0 max band occupancy) so the
    * dhash rungs' query path pays no occupancy-probe job.
    */
  private[graft] val DhashLedgerSchemeVersion     = 2
  private[graft] val AudioHashLedgerSchemeVersion = 2

  /** Per-JVM cache of each ledger layout's persisted band-occupancy bound
    * (layouts are content-keyed and immutable, so a cached value can
    * never go stale). First read per layout is one 1-row parquet scan;
    * every later dhash rung constructs its plan with ZERO driver-side
    * jobs — the job-count assert in DedupSpec pins it.
    */
  private val bandBoundCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def bandBoundOf(spark: SparkSession, layout: String): Long =
    bandBoundCache
      .computeIfAbsent(layout, l => Tables.cachedRead(spark, s"$l/bandstat.parquet").head().getLong(0))
      .longValue()

  /** Write the build-time occupancy stat beside a freshly-built ledger —
    * shared by all three modality builds so the stat derivation can never
    * diverge from [[graft.operators.Dedup.dhashLevel0MaxOccupancy]].
    */
  private def writeBandStat(spark: SparkSession, ledgerPath: String, out: String): Unit = {
    val bound = graft.operators.Dedup.dhashLevel0MaxOccupancy(Tables.cachedRead(spark, ledgerPath))
    spark.range(1).select(lit(bound).as("max_occ")).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/bandstat.parquet")
  }

  /** Decode-once IMAGE hash ledger: `(media_id, hash_hi, hash_lo)` over
    * the raster quarter, persisted per corpus version. The decode +
    * resize + hash is the dominant per-row cost of the whole perceptual
    * family, and the pair/group/capped rungs each scan the ledger several
    * times (counts, banding, expansion sides) — without this layout every
    * such scan re-decoded every payload. One build serves m9/n17/n18/n21;
    * the stream-maintained catalog ([[graft.streaming.DhashStream]])
    * remains the continuously-updated twin of the same table.
    */
  private def imageDhashLayout(spark: SparkSession, dir: String): String = {
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"dhashled-v$DhashLedgerSchemeVersion"
    )
    graft.sources.LayoutCache.getOrBuild(spark, "graft_dhashled", key) { out =>
      imageDhash(syntheticMediaWhere(spark, dir, col("doc_id") % 4 === 0))
        .toDF()
        .write.mode("overwrite").parquet(s"$out/ledger.parquet")
      writeBandStat(spark, s"$out/ledger.parquet", out)
    }
  }

  private[graft] def imageDhashLedger(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.cachedRead(spark, s"${imageDhashLayout(spark, dir)}/ledger.parquet")

  /** The persisted level-0 occupancy bound for the image ledger. */
  private[graft] def imageDhashBandBound(spark: SparkSession, dir: String): Long =
    bandBoundOf(spark, imageDhashLayout(spark, dir))

  /** Decode-once AUDIO hash ledger — [[imageDhashLedger]]'s twin over the
    * WAV quarter, serving m10/n20/n22/n23.
    */
  private def audioHashLayout(spark: SparkSession, dir: String): String = {
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"ahashled-v$AudioHashLedgerSchemeVersion"
    )
    graft.sources.LayoutCache.getOrBuild(spark, "graft_ahashled", key) { out =>
      audioEnvelopeHash(syntheticMediaWhere(spark, dir, col("doc_id") % 4 === 1))
        .toDF()
        .write.mode("overwrite").parquet(s"$out/ledger.parquet")
      writeBandStat(spark, s"$out/ledger.parquet", out)
    }
  }

  private[graft] def audioHashLedger(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.cachedRead(spark, s"${audioHashLayout(spark, dir)}/ledger.parquet")

  /** The persisted level-0 occupancy bound for the audio ledger. */
  private[graft] def audioHashBandBound(spark: SparkSession, dir: String): Long =
    bandBoundOf(spark, audioHashLayout(spark, dir))

  /** Bump when the keyframe fingerprint or the media-level simhash
    * derivation changes; folds into the video ledger layout's cache key.
    */
  private[graft] val VideoHashLedgerSchemeVersion = 2

  /** M11 — per-KEYFRAME fingerprint table over the MP4 quarter: every
    * sync (I-frame) sample resolved through the real stco/stsc/stsz/stss
    * demux ([[mp4SyncFrames]] — no codec needed to LOCATE and EXTRACT
    * keyframe payloads), fingerprinted with the cross-engine md5-derived
    * 64-bit hash over the payload's lowercase hex (the n3 recipe —
    * `Dedup.shingleHash64`'s two 32-bit halves, so the DuckDB oracle
    * rebuilds every fingerprint from the synthetic corpus's
    * (doc_id, n_chars) byte arithmetic and `md5()` agrees byte-for-byte).
    * A keyframe fingerprint is an EXACT content hash, not a perceptual
    * one — video near-dup lives one level up, in how many keyframes two
    * videos SHARE ([[videoSimhashOf]]), which is how production video
    * dedup works once frames are fingerprinted (codec-decoded perceptual
    * frame hashes would slot into the same two-level shape; the codec
    * step is this container's disclosed stub).
    */
  def videoKeyframeHash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val frames = media
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (isMp4Signature(r.payload))
            mp4SyncFrames(r.payload).iterator.map { case (no, bytes) => (r.media_id, no.toLong, bytes) }
          else Iterator.empty
        }
      }
      .toDF("media_id", "frame_no", "frame_payload")
    val hx = lower(hex(col("frame_payload")))
    frames.select(
      col("media_id"),
      col("frame_no"),
      conv(substring(md5(hx), 1, 8), 16, 10).cast("long").as("hash_hi"),
      conv(substring(md5(hx), 9, 8), 16, 10).cast("long").as("hash_lo")
    )
  }

  /** Media-level video hash: per-bit MAJORITY vote across the video's
    * keyframe fingerprints — simhash over keyframes, so two videos
    * sharing most keyframes (re-encodes, truncations, re-containered
    * copies) land within small Hamming distance and the SAME shared pair/
    * group/capped core (n17's machinery) serves the video modality
    * unchanged. All integer arithmetic (bit extract, 2·Σbit > n vote,
    * shift-pack into 32-bit halves), so the DuckDB oracle replays it
    * relationally over the rebuilt keyframe hashes. Wide ops are
    * keyframe-cardinality ×64 (the vote explode) — linear in corpus
    * frames at any scale, no pairwise anything.
    */
  private[graft] def videoSimhashOf(keyframes: DataFrame): DataFrame =
    keyframes
      .select(col("media_id"), col("hash_hi"), col("hash_lo"), explode(expr("sequence(0, 63)")).as("k"))
      .withColumn(
        "bit",
        expr(
          "(CASE WHEN k >= 32 THEN shiftright(hash_hi, CAST(k - 32 AS INT)) " +
            "ELSE shiftright(hash_lo, CAST(k AS INT)) END) & CAST(1 AS BIGINT)"
        )
      )
      .groupBy("media_id", "k")
      .agg(sum("bit").as("s"), count(lit(1)).as("n"))
      .withColumn("mbit", when(col("s") * 2 > col("n"), lit(1L)).otherwise(lit(0L)))
      .groupBy("media_id")
      .agg(
        expr("sum(CASE WHEN k >= 32 THEN shiftleft(mbit, CAST(k - 32 AS INT)) ELSE CAST(0 AS BIGINT) END)")
          .as("hash_hi"),
        expr("sum(CASE WHEN k < 32 THEN shiftleft(mbit, CAST(k AS INT)) ELSE CAST(0 AS BIGINT) END)")
          .as("hash_lo")
      )

  /** Decode-once VIDEO hash layout: keyframe fingerprints AND the derived
    * media-level simhash persisted per corpus version (the m9/m10 ledger
    * discipline) — one demux+hash build serves m11/n24/n25/n26, and the
    * pair/group/capped rungs scan media-cardinality parquet instead of
    * re-demuxing containers.
    */
  private def videoHashLayout(spark: SparkSession, dir: String): String = {
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"vhashled-v$VideoHashLedgerSchemeVersion"
    )
    graft.sources.LayoutCache.getOrBuild(spark, "graft_vhashled", key) { out =>
      videoKeyframeHash(syntheticMediaWhere(spark, dir, col("doc_id") % 4 === 3))
        .write.mode("overwrite").parquet(s"$out/keyframes.parquet")
      videoSimhashOf(spark.read.parquet(s"$out/keyframes.parquet"))
        .write.mode("overwrite").parquet(s"$out/media.parquet")
      // the stat grades the MEDIA-level ledger — the table the n24/n26
      // pair core bands; keyframe fingerprints never enter a band walk
      writeBandStat(spark, s"$out/media.parquet", out)
    }
  }

  /** The persisted level-0 occupancy bound for the video media ledger. */
  private[graft] def videoHashBandBound(spark: SparkSession, dir: String): Long =
    bandBoundOf(spark, videoHashLayout(spark, dir))

  /** M11's registry surface: the keyframe fingerprint ledger. */
  def videoKeyframeHashQuery(spark: SparkSession, dir: String): DataFrame =
    videoKeyframeLedger(spark, dir).orderBy("media_id", "frame_no")

  private[graft] def videoKeyframeLedger(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.cachedRead(spark, s"${videoHashLayout(spark, dir)}/keyframes.parquet")

  /** The media-level `(media_id, hash_hi, hash_lo)` ledger n24/n25/n26
    * pair/group/cap — same shape as the image and audio ledgers, so the
    * shared core serves all three modalities.
    */
  private[graft] def videoHashLedger(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.cachedRead(spark, s"${videoHashLayout(spark, dir)}/media.parquet")

  final case class HistogramRow(media_id: Long, bin: Long, n_px: Long)

  /** Intensity bins for [[imageHistogram]] — 16 equal-width bins over the
    * 8-bit code space (bin = byte >> 4).
    */
  val HistogramBins: Int = 16

  /** M8 — per-image intensity histogram over the decodable rasters:
    * every pixel requantized to its 8-bit code and bucketed into
    * [[HistogramBins]] equal-width bins. The image-statistics front end
    * of visual curation — exposure/contrast outlier filtering, flat-image
    * drops, and the cheap first key for histogram-equality near-dup
    * blocking — and, like [[patchGrid]], a pure map-only pass: decode and
    * bucket per row, one optional explode, no shuffle before the final
    * per-media aggregate keyed media_id.
    *
    * Zero-count bins are NOT emitted (the contract is the sparse
    * histogram); a consumer densifies against `range(16)` if it needs
    * the full vector.
    */
  def imageHistogram(media: Dataset[MediaRow]): Dataset[HistogramRow] = {
    import media.sparkSession.implicits._
    // bin = code >> shift, where 2^shift = 256 / HistogramBins
    val shift = Integer.numberOfTrailingZeros(256 / HistogramBins)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        parseImage(r.format, r.payload).flatten match {
          case Some(img) =>
            val counts = new Array[Long](HistogramBins)
            var i = 0
            while (i < img.gray.length) {
              val b = math.round(img.gray(i) * 255f).toInt & 0xff
              counts(b >> shift) += 1
              i += 1
            }
            (0 until HistogramBins).collect {
              case bin if counts(bin) > 0 => HistogramRow(r.media_id, bin.toLong, counts(bin))
            }
          case None => Seq.empty[HistogramRow]
        }
      }
    }
  }

  /** M8's registry surface: the sparse histogram ledger over the
    * synthetic corpus's PGM quarter.
    */
  def imageHistogramQuery(spark: SparkSession, dir: String): DataFrame =
    imageHistogram(syntheticMediaWhere(spark, dir, col("doc_id") % 4 === 0))
      .toDF()
      .orderBy("media_id", "bin")

  final case class DhashRow(media_id: Long, hash_hi: Long, hash_lo: Long)

  /** dHash grid: 8 rows × 9 columns of nearest-resized luma, compared
    * horizontally-adjacent → 8×8 = 64 difference bits. The standard
    * difference-hash shape (Krawetz's dHash; 9-wide so every row yields
    * exactly 8 comparisons).
    */
  val DhashRows: Int = 8
  val DhashCols: Int = 9

  /** M9 — perceptual difference hash (dHash) per decodable raster: decode
    * → nearest-resize to the [[DhashCols]]×[[DhashRows]] luma grid →
    * bit k (k = r·8+c) set iff grid(r,c) > grid(r,c+1). The 64 bits are
    * emitted as TWO 32-bit-packed BIGINTs (`hash_hi` = bits 32–63,
    * `hash_lo` = bits 0–31) so neither engine ever shifts into the sign
    * bit — the same dodge the minhash family uses for portable integer
    * emission. This is the image analogue of d4's text fingerprint: the
    * content-addressed key image dedup groups by, robust to re-encoding
    * and resampling because both hash sides pass through the same
    * fixed-grid resize.
    *
    * Map-only: decode + resize + 64 integer comparisons per row, no
    * shuffle before the output sort. The byte recovery `round(gray·255)`
    * is exact (the [[patchGrid]] argument), so the comparison is integer
    * `>` on both engines and the DuckDB oracle regenerates every grid
    * cell relationally from the PGM quarter's pixel arithmetic — the
    * decode path, resize index map, and bit packing are all inside the
    * hash-checked contract.
    */
  def imageDhash(media: Dataset[MediaRow]): Dataset[DhashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        parseImage(r.format, r.payload).flatten.map { img =>
          val g  = resizeNearest(img, DhashCols, DhashRows)
          var hi = 0L
          var lo = 0L
          var rr = 0
          while (rr < DhashRows) {
            var cc = 0
            while (cc < DhashCols - 1) {
              val a = math.round(g.gray(rr * DhashCols + cc) * 255f).toInt
              val b = math.round(g.gray(rr * DhashCols + cc + 1) * 255f).toInt
              if (a > b) {
                val k = rr * (DhashCols - 1) + cc
                if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
              }
              cc += 1
            }
            rr += 1
          }
          DhashRow(r.media_id, hi, lo)
        }
      }
    }
  }

  /** M9's registry surface: the dHash ledger over the PGM quarter. */
  def imageDhashQuery(spark: SparkSession, dir: String): DataFrame =
    imageDhashLedger(spark, dir).orderBy("media_id")

  /** Activity threshold for [[audioActivitySegments]], in the same
    * quantization units as [[AudioFrameSamples]]-sample `sum_abs`: with
    * 8-bit samples roughly uniform over the code space, E[Σ|v|] ≈ 8·64 =
    * 512, so 512 splits the synthetic corpus into a genuine mix of
    * active and silent frames rather than a degenerate all-one class.
    */
  val VadSumAbsThreshold: Long = 512L

  /** M7 — voice-activity segmentation: classify each [[audioFrameEnergy]]
    * frame active/silent by `sum_abs ≥` [[VadSumAbsThreshold]], then
    * collapse consecutive same-class frames into segments
    * (gaps-and-islands: a segment opens where the class flips). Emits per
    * segment its class, length and frame span — the silence-trim /
    * utterance-split front end an ASR-training pipeline runs before
    * feature extraction, and the audio twin of [[graft.operators.Funnel]]'s
    * event sessionization.
    *
    * Scale shape: the decode pass is map-only ([[audioFrameEnergy]]);
    * the two window functions and the final aggregate are all keyed by
    * media_id, so the only exchange is one hash partition on media_id
    * and per-key state is bounded by a single recording's frame count.
    */
  def audioActivitySegments(spark: SparkSession, dir: String): DataFrame =
    activitySegmentsOf(audioFrameEnergy(syntheticMediaWhere(spark, dir, col("doc_id") % 4 === 1)))

  /** The segment collapse alone, over any frame-energy ledger — split out
    * so specs can drive it with hand-built recordings.
    */
  private[graft] def activitySegmentsOf(frames: Dataset[AudioFrameRow]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("media_id").orderBy("frame_id")
    frames
      .toDF()
      .withColumn("active", (col("sum_abs") >= VadSumAbsThreshold).cast("long"))
      .withColumn(
        "chg",
        when(lag("active", 1).over(w).isNull || lag("active", 1).over(w) =!= col("active"), 1L)
          .otherwise(0L)
      )
      .withColumn("seg_id", sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .groupBy("media_id", "seg_id", "active")
      .agg(
        count(lit(1)).as("n_frames"),
        min("frame_id").as("start_frame"),
        max("frame_id").as("end_frame")
      )
      .orderBy("media_id", "seg_id")
  }

  /** M2 — the demux catalog over the synthetic corpus, the oracle-checked
    * registry surface for EVERY real parser in this file (PGM dims, WAV
    * rate/samples, MP3 frame walk, MP4 box tree). See [[syntheticMedia]]
    * for why the oracle needs no binary parsing.
    */
  def mediaDemuxQuery(spark: SparkSession, dir: String): DataFrame =
    catalogRows(mediaDemux(syntheticMedia(spark, dir))).orderBy("doc_id")

  /** The fixed media-catalog projection shared by m2, the sealed base
    * segment, m3's delta pass, and the streaming twin
    * ([[graft.streaming.MediaCatalogStream]]) — one definition so no
    * maintained catalog's schema can drift from the recompute's.
    */
  private[graft] def catalogRows(demux: Dataset[MediaDemux]): DataFrame =
    demux
      .toDF()
      .select(
        col("media_id").as("doc_id"),
        col("kind"), col("ok"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("duration_ms"), col("n_frames"),
        col("n_tracks").cast("long").as("n_tracks")
      )

  final case class Mp4FrameStats(
      doc_id: Long,
      width: Long,
      height: Long,
      n_samples: Long,
      n_sync: Long,
      sync_bytes: Long,
      sync_byte_sum: Long
  )

  /** M4 — I-FRAME extraction stats over the synthetic MP4 slice: per video
    * payload, the track dims (tkhd), sample count, sync-sample count and
    * byte size (stss × stsz), and the SUM OF THE EXTRACTED I-FRAME PAYLOAD
    * BYTES (unsigned) — the last column is the point: it is computable only
    * by actually slicing mdat at the stco/stsc/stsz-resolved addresses
    * ([[mp4SyncFrames]]), so a parser that misresolves any table breaks the
    * driver's hash gate, not just a unit spec. The DuckDB oracle predicts
    * every column from (doc_id, n_chars) arithmetic ([[syntheticMedia]]'s
    * contract — no binary parsing oracle-side). The id-slice predicate
    * pushes into the documents scan; per-payload work is a narrow
    * mapPartitions, shuffle-free — frame extraction at 100 TB is a map over
    * payload splits, exactly this shape.
    */
  def mp4FrameQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticMediaWhere(spark, dir, col("doc_id") % 4 === 3)
      .mapPartitions { rows =>
        rows.map { r =>
          val m      = parseMp4(r.payload).getOrElse(Mp4Meta("", 0L, Nil))
          val vid    = m.tracks.find(_.handler == "vide")
          val frames = mp4SyncFrames(r.payload)
          Mp4FrameStats(
            r.media_id,
            vid.map(_.width.toLong).getOrElse(0L),
            vid.map(_.height.toLong).getOrElse(0L),
            m.videoSamples.length.toLong,
            frames.length.toLong,
            frames.map(_._2.length.toLong).sum,
            frames.map(_._2.map(_ & 0xff).map(_.toLong).sum).sum
          )
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Bump with any change to the stored media-catalog scheme. v2: the
    * synthetic MP4 corpus gained tkhd dims + a real sample table + mdat,
    * so catalogs built from the v1 corpus must not be reused.
    */
  private[graft] val MediaCatSchemeVersion = 2

  /** The SEALED base-slice media catalog: demux rows for `doc_id <
    * batchStartId`, persisted once per corpus version. Decode/demux is the
    * expensive per-byte step of a media pipeline — at 100 TB the point of
    * maintenance is that yesterday's payloads are never re-parsed — so the
    * catalog is the artifact and the payloads are cold storage.
    */
  private[graft] def mediaCatalogBaseCache(spark: SparkSession, dir: String, batchStartId: Long): String = {
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"mediacat-v$MediaCatSchemeVersion-b$batchStartId"
    )
    graft.sources.LayoutCache.getOrBuild(spark, "graft_mediacat", key) { out =>
      catalogRows(mediaDemux(syntheticMediaWhere(spark, dir, col("doc_id") < batchStartId)))
        .write.mode("overwrite").parquet(s"$out/catalog.parquet")
    }
  }

  /** M3 — the MAINTAINED media catalog: the sealed base segment unioned
    * with a delta demux of only the new slice (n5's id split). Catalog
    * rows are per-payload and disjoint across segments, so maintenance is
    * trivially EXACT — the whole point of demuxing into a catalog — and
    * m2's oracle applies verbatim. Per-increment cost ∝ new payload
    * bytes: the base side is a columnar catalog read (no payload I/O at
    * all), the delta side parses only rows the pushed id filter admits.
    * Completes the maintenance matrix's media family (pairs n5, clusters
    * n12, tokenizer v4, vectors s12, postings t7, catalog m3).
    */
  def mediaDemuxIncremental(spark: SparkSession, dir: String): DataFrame = {
    val split = Tables
      .documents(spark, dir)
      .agg(expr("coalesce((max(doc_id) + 1) div 2, 0)").as("k"))
      .head().getLong(0)
    val base  = Tables.cachedRead(spark, s"${mediaCatalogBaseCache(spark, dir, split)}/catalog.parquet")
    val delta = catalogRows(mediaDemux(syntheticMediaWhere(spark, dir, col("doc_id") >= split)))
    base.unionByName(delta).orderBy("doc_id")
  }

  /** M1 — metadata projection used as the oracle-checked query surface for
    * the multimodal path: byte length of each payload.
    */
  def payloadMeta(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), octet_length(encode(col("text"), "UTF-8")).cast("long").as("payload_len"))
      .orderBy("doc_id")
}
