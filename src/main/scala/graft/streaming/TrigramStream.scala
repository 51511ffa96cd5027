package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming trigram-index maintenance —
  * [[TextAnalysis.substringSearchIncremental]]'s sealed-segment shape wired
  * into a `foreachBatch` loop, so a document stream keeps the SUBSTRING
  * index current continuously: each micro-batch is grammed ONCE into its
  * own g-clustered segment. No document is ever re-grammed after its own
  * micro-batch — per-batch cost tracks batch size — and the maintained
  * search stays EXACT with no query-time statistic at all (t10's argument
  * at N segments): a doc's gram rows live entirely inside its own
  * segment, so the all-grams candidate count over the union is the same
  * count the monolithic index produces. The eighth streaming-maintenance
  * family, and the one where exactness is cheapest.
  *
  * Idempotence follows the shared pattern: segments land in
  * `batch_id=<id>/` partitions with overwrite, so a checkpoint replay of
  * batch N rewrites its own directory instead of double-counting grams —
  * a duplicate gram row would inflate `ng` past the all-grams threshold
  * and silently DROP matches, which is why the replay property is load-
  * bearing here, not cosmetic.
  */
object TrigramStream {

  /** Watch `docsDir` for new document parquet files; maintain g-clustered
    * trigram segments under `indexDir/trigrams/batch_id=<id>/`.
    */
  def trigramStream(
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

  /** One micro-batch: the SAME segment builder every batch surface uses
    * ([[TextAnalysis.trigramSegment]] — one definition, so a streamed
    * segment can never gram differently from the batch delta builder),
    * landed as this batch's own partition. Exposed for the StreamingSpec
    * differential against t8's monolithic index.
    */
  private[graft] def processBatch(batch: DataFrame, indexDir: String, batchId: Long): Unit = {
    TextAnalysis
      .trigramSegment(batch)
      .repartition(col("g"))
      .sortWithinPartitions("g")
      .write.mode("overwrite").parquet(s"$indexDir/trigrams/batch_id=$batchId")
  }

  /** Substring search over the STREAM-MAINTAINED index: the shared
    * candidate+verify tail over the union of every streamed segment —
    * identical answers to t8's monolithic index over the same documents.
    * The gram IN-list pushes into each `batch_id=` partition's g-clustered
    * row groups; `dir` supplies the document table the exact verify reads.
    */
  def substringSearchStreamed(
      spark: SparkSession,
      dir: String,
      indexDir: String,
      pattern: String = TextAnalysis.SubstringPattern
  ): DataFrame =
    TextAnalysis.substringOverTrigrams(
      spark,
      dir,
      SegmentFan.tableRead(spark, indexDir, Seq("trigrams"), "trigrams"),
      pattern
    )

  /** COMPACT the streamed trigram-segment fan into one sealed generation —
    * the r12 postings discipline via the shared [[SegmentFan.compact]]
    * (retention audit: this family was "foldable, not wired"). A pure row
    * move, so the search stays exact by t10's own argument (a doc's gram
    * rows live entirely inside one segment either way); the fold re-
    * clusters by `g` so the generation keeps the IN-list row-group
    * pushdown the per-batch segments had. Returns the new cutoff (0 =
    * no-op).
    */
  def compactStreamedTrigrams(spark: SparkSession, indexDir: String): Long =
    SegmentFan.compact(
      spark,
      indexDir,
      Seq("trigrams"),
      (_, df) => df.repartition(col("g")).sortWithinPartitions("g")
    )
}
