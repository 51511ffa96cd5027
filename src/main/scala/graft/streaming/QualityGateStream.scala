package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming twin of the d21 LM-quality gate
  * ([[graft.operators.TextAnalysis.lmQualityKeep]]): the
  * perplexity-filter stage evaluated in the INGEST path — every arriving
  * document is scored against the FROZEN corpus-trained bigram model and
  * kept only if its score clears the FROZEN quartile cutoff. This is how
  * the gate actually runs in a training pipeline: the model and threshold
  * are versioned artifacts of a reference corpus; new data is filtered
  * against them without retraining (retraining is v3's layout rebuild on
  * the next corpus version, not a per-batch event).
  *
  * Stateless per document — no `GroupState`, no watermark: a doc's score
  * depends only on its own text and the frozen artifacts, so each
  * micro-batch is scored with the SAME [[TextAnalysis.scoreDocsAgainst]]
  * join the batch build uses (one scorer, zero drift by construction) and
  * appended. Per-batch cost tracks batch size; the model join broadcasts
  * when the bigram table fits and hash-joins on `(w1, w2)` otherwise.
  *
  * Idempotence follows [[DedupStream]]'s pattern: each micro-batch lands
  * in a `batch_id=<id>/` overwrite partition, so checkpoint replay
  * rewrites rather than duplicates.
  */
object QualityGateStream {

  /** Watch `docsDir` for new document parquet files; land kept
    * `(doc_id, lm_q)` rows under `keptDir/batch_id=<id>/`. The model,
    * vocab and cutoff are resolved ONCE from `corpusDir`'s persisted v3
    * layout before the stream starts (building it on first use).
    */
  def gateStream(
      spark: SparkSession,
      corpusDir: String,
      docsDir: String,
      keptDir: String,
      checkpointDir: String,
      sourceSchema: Option[StructType] = None
  ): StreamingQuery = {
    val (model, vocab) = TextAnalysis.lmModel(spark, corpusDir)
    val cutoff         = TextAnalysis.lmCutoff(spark, corpusDir)
    val schema = StreamSource.schemaFor(spark, docsDir, sourceSchema)
    spark.readStream
      .schema(schema)
      .parquet(docsDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, model, vocab, cutoff, keptDir, batchId)
      }
      .start()
  }

  /** One micro-batch: score against the frozen model, gate on the frozen
    * cutoff. Exposed for the spec's differential against batch d21.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      model: DataFrame,
      vocab: DataFrame,
      cutoff: Double,
      keptDir: String,
      batchId: Long
  ): Unit =
    TextAnalysis
      .scoreDocsAgainst(batch.select("doc_id", "text"), model, vocab)
      .where(col("lm_q") >= cutoff)
      .write
      .mode("overwrite")
      .parquet(s"$keptDir/batch_id=$batchId")
}
