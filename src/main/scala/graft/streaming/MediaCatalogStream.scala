package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming media-catalog maintenance — [[Multimodal.mediaDemuxIncremental]]'s
  * sealed-segment shape wired into a `foreachBatch` loop, so a media-payload
  * stream keeps the demux catalog current continuously: each micro-batch's
  * payloads are decoded/demuxed ONCE (the expensive per-byte step — image
  * dims, WAV/MP3 audio walks, MP4 box trees) and landed as that batch's own
  * catalog segment. No payload is ever re-parsed after its own micro-batch —
  * per-batch cost tracks batch bytes, and because catalog rows are
  * per-payload and disjoint across segments, the union over `batch_id=`
  * partitions is EXACTLY the batch recompute (m2's contract — maintenance
  * is trivially exact, which is the whole point of demuxing into a catalog).
  * Completes the streaming-twin set for the maintained-artifact families
  * alongside [[DedupStream]] (pairs) and [[VectorIndexStream]] (vectors).
  *
  * Idempotence follows the shared pattern: every segment write goes to a
  * `batch_id=<id>/` partition with overwrite, so a checkpoint replay of
  * batch N rewrites the same directory instead of duplicating catalog rows.
  */
object MediaCatalogStream {

  /** Watch `mediaDir` for new media-row parquet files; maintain the catalog
    * segments under `catalogDir` (`batch_id=<id>/` folder-of-parquet, m2's
    * column contract via the shared [[Multimodal.catalogRows]] projection).
    */
  def catalogStream(
      spark: SparkSession,
      mediaDir: String,
      catalogDir: String,
      checkpointDir: String,
      sourceSchema: Option[StructType] = None
  ): StreamingQuery = {
    val schema = StreamSource.schemaFor(spark, mediaDir, sourceSchema)
    spark.readStream
      .schema(schema)
      .parquet(mediaDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, catalogDir, batchId)
      }
      .start()
  }

  /** One micro-batch: demux the new payloads through the SAME
    * [[Multimodal.mediaDemux]] + [[Multimodal.catalogRows]] pipeline every
    * batch surface uses (one definition — a streamed segment can never
    * diverge from what the batch delta pass would write), landed as this
    * batch's own segment. Exposed for the StreamingSpec differential
    * against the batch-mode m2 recompute.
    */
  private[graft] def processBatch(batch: DataFrame, catalogDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    Multimodal
      .catalogRows(Multimodal.mediaDemux(batch.as[Multimodal.MediaRow]))
      .write
      .mode("overwrite")
      .parquet(s"$catalogDir/batch_id=$batchId")
  }
}
