package graft.streaming

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming twin of the d25 contamination gate
  * ([[graft.operators.Curation.contaminationGate]]): benchmark
  * decontamination evaluated in the INGEST path — every arriving document
  * gets its overlap-share verdict against the FROZEN eval-suite shingle
  * set before it can enter the corpus. This is where the gate belongs in a
  * production pipeline: contamination is cheapest to stop at the door
  * (per-batch cost ∝ batch shingles), and retro-scrubbing a 100 TB corpus
  * is the expensive alternative d25's batch form exists to audit.
  *
  * Stateless per document — no `GroupState`, no watermark: a verdict
  * depends only on the doc's own shingles and the frozen benchmark set, so
  * each micro-batch runs the SAME [[Curation.gateAgainst]] rule the batch
  * gate uses (one definition, zero drift by construction). The benchmark
  * side is resolved ONCE before the stream starts and broadcasts into
  * every micro-batch as bare 8-byte hashes — the eval suite is tiny next
  * to the stream, the same asymmetry that shapes batch d8/d20/d25.
  *
  * Idempotence follows [[DedupStream]]'s pattern: each micro-batch lands
  * in a `batch_id=<id>/` overwrite partition, so checkpoint replay
  * rewrites rather than duplicates.
  */
object DecontaminationStream {

  /** Watch `docsDir` for new document parquet files; land
    * `(doc_id, n_shingles, n_hit, verdict)` rows under
    * `outDir/batch_id=<id>/`. The benchmark shingle-hash set is resolved
    * once from `corpusDir` (the d25 `doc_id % 50` membership rule) and
    * reused frozen across all micro-batches.
    */
  def gateStream(
      spark: SparkSession,
      corpusDir: String,
      docsDir: String,
      outDir: String,
      checkpointDir: String,
      sourceSchema: Option[StructType] = None
  ): StreamingQuery = {
    val bench  = Curation.benchShingleHashes(spark, corpusDir)
    val schema = StreamSource.schemaFor(spark, docsDir, sourceSchema)
    spark.readStream
      .schema(schema)
      .parquet(docsDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, bench, outDir, batchId)
      }
      .start()
  }

  /** One micro-batch: shingle the arriving docs, apply the shared verdict
    * rule against the frozen benchmark set. Exposed for the spec's
    * differential against batch d25.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      benchHashes: DataFrame,
      outDir: String,
      batchId: Long
  ): Unit =
    Curation
      .gateAgainst(
        Dedup
          .shingles(batch)
          .withColumn("h", xxhash64(col("s")))
          .select("doc_id", "h"),
        benchHashes
      )
      .write
      .mode("overwrite")
      .parquet(s"$outDir/batch_id=$batchId")
}
