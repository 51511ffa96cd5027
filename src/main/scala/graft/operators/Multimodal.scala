package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/featurized per partition.
  *
  * The decode step itself is STUBBED — this container has no image/audio
  * codecs — behind [[decodeStub]], a clearly-marked deterministic fake. The
  * Spark-side plumbing is real: binary column + metadata struct schema,
  * partition-batched decoding via typed `mapPartitions` (the Scala analogue
  * of `mapInPandas` batch decoding: one iterator per partition so a real
  * decoder would amortize codec init per-partition, not per-row), and a
  * fixed-width feature-vector output schema ready for the ANN operators.
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

  /** STUB decoder — deterministic fake standing in for an image/audio codec.
    * A real implementation would decode `payload` with the codec named by
    * `format`; everything around this call (batching, schema, partitioning)
    * is production-shaped.
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

  /** Feature extraction over the media table: per-partition iteration (codec
    * init would happen once per partition, here a no-op), fixed-dim float
    * features out. Narrow transformation — scales with splits, no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup would go here (one codec instance)
      rows.map(r => MediaFeatures(r.media_id, r.payload.length.toLong, decodeStub(r, dim)))
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
