package graft.streaming

import graft.sources.BloomManifest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming Bloom-manifest maintenance — the twelfth maintained-artifact
  * family: the file-skipping index of [[BloomManifest]] kept current at
  * ingest, so point lookups over a continuously-growing log prune to ~one
  * file without ever rebuilding the index. Each micro-batch lands its rows
  * as that batch's own data segment AND the matching (file, bloom) manifest
  * rows — the expensive step (hashing every key into bloom bits) runs once
  * per ingested row, never again. Data segments are immutable after their
  * batch, so manifest rows are per-file and disjoint across segments: the
  * union over `batch_id=` partitions is exactly the batch-built manifest
  * over the same files (the maintenance-is-exact contract the catalog and
  * postings families carry).
  *
  * Idempotence follows the shared pattern: both the data segment and its
  * manifest segment write to `batch_id=<id>/` with overwrite, so a
  * checkpoint replay of batch N rewrites both directories instead of
  * duplicating rows or blooms.
  */
object ManifestStream {

  /** Watch `eventsDir` for new event parquet; maintain data segments under
    * `indexDir/data/batch_id=<id>/` and their blooms under
    * `indexDir/manifest/batch_id=<id>/`.
    */
  def manifestStream(
      spark: SparkSession,
      eventsDir: String,
      indexDir: String,
      checkpointDir: String,
      sourceSchema: Option[StructType] = None
  ): StreamingQuery = {
    val schema = StreamSource.schemaFor(spark, eventsDir, sourceSchema)
    spark.readStream
      .schema(schema)
      .parquet(eventsDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, indexDir, batchId)
      }
      .start()
  }

  /** One micro-batch: land the rows, then bloom THIS segment's files
    * through the same [[BloomManifest.writeManifestFor]] the batch layout
    * build uses (one definition — a streamed manifest can never diverge
    * from the batch-built one over the same files).
    *
    * The two writes are NOT atomic together: a crash between them leaves
    * (on replay) a rewritten data segment whose new file names the old
    * manifest segment doesn't list yet. Readers in that window skip the
    * dangling old names ([[BloomManifest.candidateFiles]]'s existence
    * guard) and transiently miss segment N's rows; the replayed manifest
    * write converges the index — the same eventual-per-segment contract
    * every two-artifact family (postings+stats, vectors+centroids)
    * carries under mid-replay reads.
    */
  private[graft] def processBatch(batch: DataFrame, indexDir: String, batchId: Long): Unit = {
    val spark   = batch.sparkSession
    val dataDir = s"$indexDir/data/batch_id=$batchId"
    batch.write.mode("overwrite").parquet(dataDir)
    BloomManifest.writeManifestFor(spark, dataDir, s"$indexDir/manifest/batch_id=$batchId")
  }

  /** Point lookup over the STREAM-MAINTAINED index: probe every segment's
    * manifest rows (one distributed pass over the unioned `batch_id=`
    * partitions), read only surviving files, apply the exact predicate
    * (the projection is [[BloomManifest.pointSelect]] — one definition
    * with the batch layout's lookup). Absent directories (no batch landed
    * yet) degrade to an empty result — the key provably isn't in an empty
    * index.
    */
  def pointLookupStreamed(spark: SparkSession, indexDir: String, key: Long): DataFrame = {
    def empty(): DataFrame = {
      import spark.implicits._
      spark.emptyDataset[(Long, Long, String, String)].toDF("event_id", "user_id", "event_type", "props")
    }
    // candidateFiles' existence check is driver-side and a concurrent
    // replay can delete a file between probe and read (TOCTOU):
    // ignoreMissingFiles absorbs deletions DURING the scan, and one
    // re-probe absorbs a deletion between the check and path resolution —
    // the retry re-reads the manifest, which the replay rewrites last, so
    // second-round candidates are the converged segment's files.
    def attempt(): DataFrame = {
      val cands = BloomManifest.candidateFiles(spark, s"$indexDir/manifest", key)
      if (cands.isEmpty) empty()
      else BloomManifest.pointSelect(spark.read.option("ignoreMissingFiles", "true").parquet(cands: _*), key)
    }
    try attempt()
    catch { case _: org.apache.spark.sql.AnalysisException => attempt() }
  }
}
