package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming TAKEDOWN application — the eleventh maintained-artifact
  * family: deletion requests (GDPR erasure, DMCA, opt-out — streams in
  * any real deployment) arrive as `(doc_id, dl)` parquet files and fold
  * into the tombstone-ledger artifact beside the postings index, so
  * search stops surfacing a deleted document within one micro-batch of
  * its request — WITHOUT touching any sealed index segment. The ledger is
  * itself sealed `batch_id=` segments (overwrite → checkpoint-replay
  * idempotent, the shared contract), the query-side mask unions them, and
  * the next purging compaction ([[TextAnalysis.compactSegmentsPurged]])
  * drops the rows physically and retires the ledger — t17's lifecycle
  * with the request feed live.
  *
  * Duplicate requests are expected (re-submissions, overlapping feeds):
  * the LEDGER keeps them (sealed segments are never rewritten), and the
  * query side de-duplicates by doc_id before both the mask and the stats
  * negation — deleting twice must subtract once.
  *
  * ADMISSION CONTRACT: a ledger entry must reference a document that IS
  * in the index, with its true `dl` — the stats negation trusts both. A
  * request for a never-ingested id (or one re-submitted AFTER a purge
  * already dropped it) would mask nothing yet still subtract, skewing
  * idf/avgdl for every query. Production enforces this where requests
  * are admitted (validate against the catalog; retire the ledger with
  * each purge — the [[TextAnalysis.compactSegmentsPurged]] contract);
  * the engine keeps the check out of the per-query path on purpose — a
  * corpus-wide doc-id probe per search to re-verify the ledger would
  * cost more than the mask itself.
  */
object TakedownStream {

  /** Watch `requestsDir` for deletion-request parquet; maintain ledger
    * segments under `ledgerDir/batch_id=<id>/`.
    */
  def takedownStream(
      spark: SparkSession,
      requestsDir: String,
      ledgerDir: String,
      checkpointDir: String,
      sourceSchema: Option[StructType] = None
  ): StreamingQuery = {
    val schema = StreamSource.schemaFor(spark, requestsDir, sourceSchema)
    spark.readStream
      .schema(schema)
      .parquet(requestsDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, ledgerDir, batchId)
      }
      .start()
  }

  /** One micro-batch of requests landed as its own sealed ledger segment. */
  private[graft] def processBatch(batch: DataFrame, ledgerDir: String, batchId: Long): Unit =
    batch
      .select("doc_id", "dl")
      .write.mode("overwrite").parquet(s"$ledgerDir/batch_id=$batchId")

  /** The stream-maintained ledger, de-duplicated for query use (smallest
    * dl wins deterministically on conflicting resubmissions — any single
    * row per doc_id is correct, determinism is for the specs).
    *
    * Deployment ordering: queries may arrive BEFORE the first takedown
    * batch lands (the stream exists, the directory doesn't yet) — the
    * same gap [[StreamSource]] closes for stream starts. An absent or
    * segment-less ledger directory degrades to an empty ledger, so the
    * ranking is simply the unmasked index instead of a schema-inference
    * failure.
    */
  private[graft] def ledger(spark: SparkSession, ledgerDir: String): DataFrame = {
    val raw =
      if (StreamSource.hasCommittedSegments(spark, ledgerDir))
        spark.read.parquet(ledgerDir).select(col("doc_id").cast("long"), col("dl").cast("long"))
      else {
        import spark.implicits._
        spark.emptyDataset[(Long, Long)].toDF("doc_id", "dl")
      }
    raw.groupBy("doc_id").agg(min("dl").as("dl"))
  }

  /** BM25 over the STREAM-MAINTAINED postings index masked by the
    * STREAM-MAINTAINED ledger — t17's query shape with both artifacts
    * live: broadcast anti join for the mask, one negative stats row for
    * the corpus-stats correction, ranking equal to a from-scratch index
    * over the survivors (the spec's differential).
    */
  def bm25RankStreamedTombstoned(
      spark: SparkSession,
      indexDir: String,
      ledgerDir: String,
      terms: Seq[String] = TextAnalysis.KeywordTerms,
      k: Int = 20
  ): DataFrame = {
    val ts = terms.distinct
    require(
      ts.nonEmpty && ts.forall(t => t.nonEmpty && !t.contains("'") && !t.contains(" ")),
      s"terms must be non-empty, quote-free, space-free: $ts"
    )
    val led = ledger(spark, ledgerDir)
    TextAnalysis.bm25OverSegments(
      spark.read
        .parquet(s"$indexDir/postings")
        .where(col("token").isInCollection(ts))
        .join(broadcast(led.select("doc_id")), Seq("doc_id"), "left_anti"),
      spark.read
        .parquet(s"$indexDir/stats")
        .select("n_docs", "n_dl", "sum_dl")
        .unionByName(TextAnalysis.ledgerNegation(led)),
      k
    )
  }
}
