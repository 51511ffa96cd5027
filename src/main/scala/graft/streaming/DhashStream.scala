package graft.streaming

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming perceptual-hash catalog maintenance — the thirteenth
  * maintained-artifact family: [[Multimodal.imageDhash]]'s ledger kept
  * current as media payloads arrive, so image near-dup pairs (n17) are
  * answerable continuously without ever re-decoding a byte — and, since
  * round 14, the AUDIO twin ([[audioHashStream]]): the same
  * segment/replay/degrade machinery with [[Multimodal.audioEnvelopeHash]]
  * as the per-batch hasher, because both ledgers share the
  * `(media_id, hash_hi, hash_lo)` shape and therefore the SAME pair
  * query ([[dhashPairsStreamed]] serves n17 over an image catalog and
  * n20 over an audio one). Each
  * micro-batch's payloads are decoded and hashed ONCE (the expensive
  * per-pixel step) and landed as that batch's own catalog segment; dHash
  * rows are per-payload and disjoint across segments, so the union over
  * `batch_id=` partitions is EXACTLY the batch recompute (the
  * MediaCatalogStream contract, applied to the dedup front end), and the
  * pair query runs [[Dedup.dhashPairsFromHashes]] — the same two-level
  * core as batch n17 — over the unioned ledger.
  *
  * Idempotence follows the shared pattern: every segment write goes to a
  * `batch_id=<id>/` partition with overwrite, so a checkpoint replay of
  * batch N rewrites the same directory instead of duplicating hash rows.
  */
object DhashStream {

  /** Watch `mediaDir` for new media-row parquet; maintain the dHash
    * catalog segments under `catalogDir/batch_id=<id>/`.
    */
  def dhashStream(
      spark: SparkSession,
      mediaDir: String,
      catalogDir: String,
      checkpointDir: String,
      sourceSchema: Option[StructType] = None
  ): StreamingQuery =
    hashStream(spark, mediaDir, catalogDir, checkpointDir, sourceSchema, dhashSchemeTag)(m =>
      Multimodal.imageDhash(m).toDF()
    )

  /** Scheme tags stamped into the catalog dir (DedupStream's `_scheme`
    * discipline): the batch ledgers rebuild via content-keyed cache
    * directories when [[Multimodal.DhashLedgerSchemeVersion]] /
    * [[Multimodal.AudioHashLedgerSchemeVersion]] bump, but a
    * checkpoint-resumed STREAM would keep appending new-scheme segments
    * onto old-scheme history and silently corrupt every cross-batch pair
    * — so a version bump must fail fast against an existing catalog.
    */
  private[graft] def dhashSchemeTag: String     = s"dhash-ledger-v${Multimodal.DhashLedgerSchemeVersion}"
  private[graft] def audioHashSchemeTag: String = s"audio-hash-ledger-v${Multimodal.AudioHashLedgerSchemeVersion}"

  /** The AUDIO catalog stream — [[Multimodal.audioEnvelopeHash]] per
    * micro-batch, everything else identical (n20's continuous-maintenance
    * story; the pair query over its catalog is [[dhashPairsStreamed]]).
    */
  def audioHashStream(
      spark: SparkSession,
      mediaDir: String,
      catalogDir: String,
      checkpointDir: String,
      sourceSchema: Option[StructType] = None
  ): StreamingQuery =
    hashStream(spark, mediaDir, catalogDir, checkpointDir, sourceSchema, audioHashSchemeTag)(m =>
      Multimodal.audioEnvelopeHash(m).toDF()
    )

  /** The VIDEO catalog stream (15th maintained family) — keyframe
    * fingerprints + per-bit-majority media simhash per micro-batch
    * ([[Multimodal.videoKeyframeHash]] → [[Multimodal.videoSimhashOf]]).
    * A video's simhash depends only on its OWN keyframes, so the
    * per-batch hasher is self-contained and the segment-union contract
    * (union over `batch_id=` partitions ≡ the batch recompute) holds
    * exactly as for the image and audio catalogs; the pair query over
    * the streamed catalog is [[dhashPairsStreamed]] unchanged (n24's
    * continuous-maintenance story).
    */
  def videoHashStream(
      spark: SparkSession,
      mediaDir: String,
      catalogDir: String,
      checkpointDir: String,
      sourceSchema: Option[StructType] = None
  ): StreamingQuery =
    hashStream(spark, mediaDir, catalogDir, checkpointDir, sourceSchema, videoHashSchemeTag)(m =>
      Multimodal.videoSimhashOf(Multimodal.videoKeyframeHash(m))
    )

  private[graft] def videoHashSchemeTag: String =
    s"video-hash-ledger-v${Multimodal.VideoHashLedgerSchemeVersion}"

  private def hashStream(
      spark: SparkSession,
      mediaDir: String,
      catalogDir: String,
      checkpointDir: String,
      sourceSchema: Option[StructType],
      schemeTag: String
  )(hash: org.apache.spark.sql.Dataset[Multimodal.MediaRow] => DataFrame): StreamingQuery = {
    val schema = StreamSource.schemaFor(spark, mediaDir, sourceSchema)
    spark.readStream
      .schema(schema)
      .parquet(mediaDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, catalogDir, batchId, schemeTag)(hash)
      }
      .start()
  }

  /** One micro-batch: hash the new payloads through the SAME hasher every
    * batch surface uses ([[Multimodal.imageDhash]] /
    * [[Multimodal.audioEnvelopeHash]]), landed as this batch's own
    * segment.
    */
  private[graft] def processBatch(batch: DataFrame, catalogDir: String, batchId: Long, schemeTag: String)(
      hash: org.apache.spark.sql.Dataset[Multimodal.MediaRow] => DataFrame
  ): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    // a catalog built under an older ledger scheme cannot be appended to
    // — fail fast per batch (DedupStream.assertOrStampScheme pattern)
    DedupStream.assertOrStampScheme(spark, catalogDir, schemeTag)
    hash(batch.as[Multimodal.MediaRow])
      .write
      .mode("overwrite")
      .parquet(s"$catalogDir/batch_id=$batchId")
  }

  /** The stream-maintained ledger (all segments unioned). An absent or
    * segment-less catalog directory degrades to an empty ledger — the
    * deployment-ordering case (stream started, nothing landed) must answer
    * "no pairs", not throw schema inference errors (the TakedownStream
    * contract).
    */
  private[graft] def ledger(spark: SparkSession, catalogDir: String): DataFrame = {
    if (StreamSource.hasCommittedSegments(spark, catalogDir))
      spark.read.parquet(catalogDir).select("media_id", "hash_hi", "hash_lo")
    else {
      import spark.implicits._
      spark.emptyDataset[(Long, Long, Long)].toDF("media_id", "hash_hi", "hash_lo")
    }
  }

  /** N17 over the STREAM-MAINTAINED ledger — the same two-level pair core
    * as the batch rung, no payload ever re-decoded.
    */
  def dhashPairsStreamed(spark: SparkSession, catalogDir: String): DataFrame =
    Dedup.dhashPairsFromHashes(ledger(spark, catalogDir))
}
