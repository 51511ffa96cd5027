package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming novelty gate — [[Dedup.noveltyScores]]' first-seen semantics
  * wired into a `foreachBatch` loop, so a document stream is scored for
  * redundancy CONTINUOUSLY: each micro-batch is shingled once, scored
  * against the maintained first-seen shingle index plus its own
  * within-batch order, and only its genuinely NEW shingles are appended to
  * the index. No document is ever re-shingled after its own micro-batch,
  * and the index grows by the novel fraction only — the redundant bulk of
  * a crawl stream (the very thing this operator measures) costs index
  * nothing. Per-batch cost tracks batch size; this is n15's only viable
  * shape when the corpus arrives as a stream.
  *
  * "Earlier" in stream mode means arrival order: a shingle is stale if ANY
  * earlier micro-batch carried it, or an earlier doc_id within the same
  * batch did. When batches arrive in doc_id order (the staged-cut spec
  * feeds exactly that), the union of per-batch outputs is BIT-EQUAL to the
  * batch n15 over the same corpus — the [[DedupStream]] equivalence
  * argument applied to the first-seen index instead of the bucket index.
  *
  * Idempotence follows the family pattern: novelty rows AND index appends
  * land in `batch_id=<id>/` partitions with overwrite, and the scoring
  * join reads only strictly-earlier partitions — a checkpoint replay of
  * batch N rewrites its own directories and scores against exactly the
  * same earlier index, so replays can neither double index rows nor shift
  * a verdict.
  */
object NoveltyStream {

  /** Watch `docsDir` for new document parquet files; maintain the
    * first-seen shingle index under `indexDir/firsts/` and land per-doc
    * novelty rows under `outDir/batch_id=<id>/`.
    */
  def noveltyStream(
      spark: SparkSession,
      docsDir: String,
      indexDir: String,
      outDir: String,
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
        processBatch(batch, indexDir, outDir, batchId)
      }
      .start()
  }

  /** One micro-batch: shingle the new documents ONCE, score novelty
    * against (stored earlier index ∪ within-batch order), append only the
    * batch's first-seen shingles. Exposed for the StreamingSpec
    * differential against the batch-mode n15.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      indexDir: String,
      outDir: String,
      batchId: Long
  ): Unit = {
    val spark = batch.sparkSession
    val sh    = Dedup.shingles(batch.select("doc_id", "text"))
    // within-batch first occurrence (the batch-local n15 window)
    val byShingle = Window.partitionBy("s")
    val local     = sh.withColumn("batch_first", min("doc_id").over(byShingle))
    val firstsDir = s"$indexDir/firsts"
    val stored =
      if (new java.io.File(firstsDir).exists())
        spark.read.parquet(firstsDir).where(col("batch_id") < batchId).select(col("s"), lit(true).as("stored"))
      else spark.emptyDataFrame.selectExpr("CAST(NULL AS STRING) s", "CAST(NULL AS BOOLEAN) stored").limit(0)
    val scored = local
      .join(stored, Seq("s"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        count(when(col("stored") || col("batch_first") < col("doc_id"), lit(1))).as("n_seen_before")
      )
      .orderBy("doc_id")
    scored.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    // append ONLY shingles no earlier batch carried, at their batch-local
    // first doc — one row per novel shingle, so the index grows by the
    // novel fraction and a replay rewrites the identical rows
    local
      .where(col("doc_id") === col("batch_first"))
      .select(col("s"), col("doc_id").as("first_doc"))
      .distinct()
      .join(stored, Seq("s"), "left_anti")
      .write
      .mode("overwrite")
      .parquet(s"$firstsDir/batch_id=$batchId")
  }

  /** The union of every batch's novelty rows — the stream-side frame the
    * spec compares against [[Dedup.noveltyScores]].
    */
  private[graft] def noveltyFromStream(spark: SparkSession, outDir: String): DataFrame =
    spark.read
      .parquet(outDir)
      .select("doc_id", "n_shingles", "n_seen_before")
      .orderBy("doc_id")
}
