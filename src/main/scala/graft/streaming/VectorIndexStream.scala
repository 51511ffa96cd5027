package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming vector-index maintenance — [[Similarity.annIvfIncremental]]'s
  * sealed-base + delta-segment shape wired into a `foreachBatch` loop, so an
  * embedding stream keeps the IVF index current continuously: each
  * micro-batch is assigned ONCE against the base layout's FROZEN centroids
  * and appended as its own cluster-partitioned delta segment. The base is
  * never re-read, re-assigned, or re-clustered, and no vector is ever
  * re-assigned after its own micro-batch — per-batch cost tracks batch size,
  * the s12 maintenance contract ([[Similarity.ivfDeltaLayoutCache]]) moved
  * from a daily batch to a stream. This completes the streaming-twin matrix
  * for the maintained-artifact families (dedup index → [[DedupStream]],
  * vector index → here).
  *
  * Idempotence follows [[DedupStream.processBatch]]'s pattern: every segment
  * write goes to a `batch_id=<id>/` partition with overwrite, so a
  * checkpoint replay of batch N rewrites the same directory instead of
  * duplicating vectors. `cl` is a partition column WITHIN each batch
  * directory, so a probe's IN-list prunes `cl=` directories across every
  * streamed segment exactly as it does on the sealed base — unprobed
  * clusters cost zero I/O, sealed or fresh
  * ([[Similarity.probeSearchStreamed]] is the query side; StreamingSpec
  * pins full-probe ≡ brute force and streamed ≡ batch-delta assignments).
  *
  * The standard IVF caveat carries over unchanged from s12: centroids
  * frozen at the base build drift as the streamed corpus grows; the
  * re-cluster is a base rebuild, amortized, never a per-batch cost.
  */
object VectorIndexStream {

  /** Watch `vecsDir` for new embedding parquet files; maintain the delta
    * segments under `deltaDir` (`batch_id=<id>/cl=<c>/` folder-of-parquet),
    * assigned against `baseLayout`'s frozen centroids
    * ([[Similarity.ivfBaseLayoutCache]]).
    */
  def deltaSegmentsStream(
      spark: SparkSession,
      vecsDir: String,
      baseLayout: String,
      deltaDir: String,
      checkpointDir: String,
      sourceSchema: Option[StructType] = None
  ): StreamingQuery = {
    val schema = StreamSource.schemaFor(spark, vecsDir, sourceSchema)
    spark.readStream
      .schema(schema)
      .parquet(vecsDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, baseLayout, deltaDir, batchId)
      }
      .start()
  }

  /** One micro-batch: assign the new vectors against the FROZEN base
    * centroids (the same [[Similarity.assignCol]] expression every IVF
    * layout writer uses — one definition, so a streamed segment can never
    * diverge from what the batch delta builder would write), then land them
    * as this batch's own cluster-partitioned segment. Exposed for the
    * StreamingSpec differential against the batch-mode s12 delta.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      baseLayout: String,
      deltaDir: String,
      batchId: Long
  ): Unit = {
    val spark = batch.sparkSession
    val centroids = spark.read
      .parquet(s"$baseLayout/centroids.parquet")
      .orderBy("cl")
      .collect()
      .map(_.getSeq[Float](1))
    batch
      .withColumn("cl", Similarity.assignCol(centroids))
      .write
      .mode("overwrite")
      .partitionBy("cl")
      .parquet(s"$deltaDir/batch_id=$batchId")
  }
}
