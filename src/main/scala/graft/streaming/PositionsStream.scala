package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming POSITIONAL-index maintenance — the ninth maintained-artifact
  * family, mirroring [[PostingsStream]] for t15's positions layout: each
  * micro-batch of documents is position-indexed ONCE into its own
  * token-clustered `(doc_id, token, positions)` segment. A document's
  * position rows live in exactly one segment, so the union of segments IS
  * the batch layout's row set and the phrase query
  * ([[TextAnalysis.phraseOverPositions]], one definition for both paths)
  * stays exact with zero query-time statistics — the same disjointness
  * argument as [[PostingsStream]], simpler even, because positions carry
  * no corpus-level term like df.
  *
  * Idempotence follows the shared pattern: segments land in
  * `batch_id=<id>/` partitions with overwrite, so a checkpoint replay of
  * batch N rewrites its directory instead of duplicating position rows.
  */
object PositionsStream {

  /** Watch `docsDir` for new document parquet files; maintain positional
    * postings under `indexDir/positions/batch_id=<id>/`.
    */
  def positionsStream(
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

  /** One micro-batch through the SAME segment builder the batch layout
    * uses ([[TextAnalysis.positionsSegment]]). Exposed for the
    * StreamingSpec differential against t15's corpus-level index.
    */
  private[graft] def processBatch(batch: DataFrame, indexDir: String, batchId: Long): Unit =
    TextAnalysis
      .positionsSegment(batch)
      .repartition(col("token"))
      .sortWithinPartitions("token")
      .write.mode("overwrite").parquet(s"$indexDir/positions/batch_id=$batchId")

  /** Phrase search over the STREAM-MAINTAINED positional index — the
    * shared adjacency tail over the segment union; term equality filters
    * push into each `batch_id=` partition's token-clustered row groups.
    */
  def phraseSearchStreamed(
      spark: SparkSession,
      indexDir: String,
      phrase: Seq[String] = TextAnalysis.PhraseTerms
  ): DataFrame =
    TextAnalysis.phraseOverPositions(
      spark.read.parquet(s"$indexDir/positions"),
      phrase
    )

  /** COMPACT the `batch_id=` positions fan into one token-clustered
    * segment at `compactDir/positions.parquet` — t16's fold for the
    * positional family (simpler even: positions carry no additive stats
    * to sum). Row set preserved exactly (a document's position rows live
    * in one segment), so [[TextAnalysis.phraseOverPositions]] over the
    * compacted segment answers identically while term probes drop from N
    * row-group seeks back to one.
    */
  def compactStreamedPositions(spark: SparkSession, indexDir: String, compactDir: String): Unit =
    spark.read
      .parquet(s"$indexDir/positions")
      .drop("batch_id")
      .repartition(col("token"))
      .sortWithinPartitions("token")
      .write.mode("overwrite").parquet(s"$compactDir/positions.parquet")
}
