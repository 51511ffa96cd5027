package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming inverted-index maintenance — [[TextAnalysis.bm25RankIncremental]]'s
  * sealed-segment shape wired into a `foreachBatch` loop, so a document
  * stream keeps the search index current continuously: each micro-batch is
  * tokenized ONCE into its own token-clustered postings segment plus an
  * additive `(n_docs, n_dl, sum_dl)` stats row. No document is ever
  * re-tokenized after its own micro-batch — per-batch cost tracks batch
  * size, and the maintained ranking stays EXACT (t7's argument, inherited
  * per segment): per-(doc, token) tf rows are disjoint across segments, df
  * is a query-time window over the term-filtered union, and the corpus
  * stats combine as sums of longs. Completes the streaming-twin set for the
  * maintained-artifact families ([[DedupStream]] pairs,
  * [[VectorIndexStream]] vectors, [[MediaCatalogStream]] catalog, here
  * postings).
  *
  * Idempotence follows the shared pattern: both writes go to
  * `batch_id=<id>/` partitions with overwrite, so a checkpoint replay of
  * batch N rewrites the same directories instead of double-counting
  * postings or stats.
  */
object PostingsStream {

  /** Watch `docsDir` for new document parquet files; maintain the postings
    * segments under `indexDir/postings/batch_id=<id>/` (token-clustered,
    * `(token, doc_id, tf, dl)`) and the additive stats rows under
    * `indexDir/stats/batch_id=<id>/`.
    */
  def postingsStream(
      spark: SparkSession,
      docsDir: String,
      indexDir: String,
      checkpointDir: String,
      sourceSchema: Option[StructType] = None
  ): StreamingQuery = {
    val schema = StreamSource.schemaFor(spark, docsDir, sourceSchema)
    spark.readStream
      .schema(schema)
      .parquet(docsDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, indexDir, batchId)
      }
      .start()
  }

  /** One micro-batch: the SAME segment/stats builders every batch surface
    * uses ([[TextAnalysis.postingsSegment]]/[[TextAnalysis.postingsStats]]
    * — one definition, so a streamed segment can never tokenize differently
    * from the batch delta builder), landed as this batch's own partitions.
    * Exposed for the StreamingSpec differential against the t4 corpus scan.
    */
  private[graft] def processBatch(batch: DataFrame, indexDir: String, batchId: Long): Unit = {
    TextAnalysis
      .postingsSegment(batch)
      .repartition(col("token"))
      .sortWithinPartitions("token")
      .write.mode("overwrite").parquet(s"$indexDir/postings/batch_id=$batchId")
    TextAnalysis
      .postingsStats(batch)
      .write.mode("overwrite").parquet(s"$indexDir/stats/batch_id=$batchId")
  }

  /** BM25 over the STREAM-MAINTAINED index: the term-filtered union across
    * every streamed segment through the shared
    * [[TextAnalysis.bm25OverSegments]] tail — bit-equal to t4's corpus scan
    * over the same documents (the t7 exactness contract at N segments
    * instead of two). Query I/O stays ∝ the query terms' posting lists in
    * every segment: the token IN-list pushes into each `batch_id=`
    * partition's token-clustered row groups.
    */
  def bm25RankStreamed(
      spark: SparkSession,
      indexDir: String,
      terms: Seq[String] = TextAnalysis.KeywordTerms,
      k: Int = 20
  ): DataFrame = {
    val ts = terms.distinct
    require(
      ts.nonEmpty && ts.forall(t => t.nonEmpty && !t.contains("'") && !t.contains(" ")),
      s"terms must be non-empty, quote-free, space-free: $ts"
    )
    TextAnalysis.bm25OverSegments(
      spark.read.parquet(s"$indexDir/postings").where(col("token").isInCollection(ts)),
      spark.read.parquet(s"$indexDir/stats"),
      k
    )
  }

  /** COMPACT the stream-maintained `batch_id=` segment fan into one sealed
    * segment pair under `compactDir` — the periodic background job that
    * caps the fan's read amplification after N batches (t16's fold,
    * [[TextAnalysis.compactSegments]]: row set preserved, stats summed,
    * ranking provably unchanged). The compacted pair lands as
    * `compactDir/postings.parquet` + `compactDir/stats.parquet` — the
    * single-segment layout — and is queried through the same
    * [[TextAnalysis.bm25OverSegments]] tail; the stream keeps appending
    * NEW batches to `indexDir` beside it (the standard LSM generation
    * handoff, with the next compaction folding old generation + new fan).
    */
  def compactStreamedIndex(spark: SparkSession, indexDir: String, compactDir: String): Unit =
    TextAnalysis.compactSegments(
      spark.read.parquet(s"$indexDir/postings").drop("batch_id"),
      spark.read.parquet(s"$indexDir/stats").drop("batch_id"),
      compactDir
    )
}
