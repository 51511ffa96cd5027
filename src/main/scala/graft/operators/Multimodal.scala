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
  * the hand-rolled [[decodeWav]]. Only formats with no JDK codec at all
  * (compressed audio, video containers) fall to [[decodeStub]], a
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

  final case class DecodedAudio(sampleRate: Int, channels: Int, samples: Array[Float])

  /** REAL decoder for RIFF/WAVE PCM audio (16-bit signed or 8-bit
    * unsigned, any channel count) — the audio family a pure JVM parses
    * without a codec library, closing the "audio is a stub" gap the same
    * way netpbm/BMP closed images. Chunk scan honors the RIFF contract
    * (little-endian sizes, word-aligned chunks, `fmt ` before `data`);
    * channels average to one mono stream normalized to [−1, 1], the same
    * collapse-to-one-plane convention as the image decoders' grayscale.
    * All size arithmetic runs in long space and every chunk bound is
    * checked against the actual byte array, so hostile headers (a 40-byte
    * payload declaring a 2 GB data chunk) reject via the shared
    * return-None contract instead of allocating or throwing. Compressed
    * codecs (MP3/AAC/OGG) have no JDK decoder and stay with the disclosed
    * stub, as video does.
    */
  private[graft] def decodeWav(b: Array[Byte]): Option[DecodedAudio] = {
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def i32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int, s: String): Boolean = (0 until 4).forall(i => b(o + i) == s.charAt(i).toByte)
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos                                     = 12L
    var fmtOk                                   = false
    var channels, rate, bits                    = 0
    var samples: Array[Float]                   = null
    while (pos + 8 <= b.length && samples == null) {
      val p  = pos.toInt
      val sz = i32(p + 4).toLong & 0xffffffffL // RIFF sizes are unsigned
      if (pos + 8 + sz > b.length) return None // truncated or hostile chunk
      if (tag(p, "fmt ") && sz >= 16) {
        val audioFormat = u16(p + 8)
        channels = u16(p + 10)
        rate = i32(p + 12)
        bits = u16(p + 22) // fmt data +14: bitsPerSample
        fmtOk = audioFormat == 1 && channels > 0 && rate > 0 && (bits == 8 || bits == 16)
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
            acc += (if (bits == 16) {
                      val o = base + 2 * c
                      ((b(o) & 0xff) | (b(o + 1) << 8)).toShort / 32768.0f
                    } else ((b(base + c) & 0xff) - 128) / 128.0f)
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

  /** Frame sampling stub: every `stride`-th frame of a multi-frame payload.
    * With the fake 1-frame payloads this is an identity-shaped pass; the
    * operator exists to pin the (media_id, frame_no, frame_payload) output
    * contract.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): DataFrame = {
    require(stride > 0)
    media
      .toDF()
      .select(
        col("media_id"),
        explode(expr(s"sequence(0, n_frames - 1, $stride)")).as("frame_no"),
        col("payload").as("frame_payload")
      )
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
