package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming duplicate-CLUSTER maintenance — n12's incremental contraction
  * ([[Dedup.incrementalDupClusters]]) wired into the [[DedupStream]] loop:
  * each micro-batch first extends the pair index (MinHash artifacts + the
  * batch's verified pairs, [[DedupStream.processBatch]]), then the full
  * cluster table is updated by star contraction over (prior snapshot's
  * cluster edges ∪ this batch's pairs) and landed as `batch_id=<id>/`.
  * The n12 exactness argument applies per step: a cluster table IS a
  * spanning star of its component and adding edges preserves connectivity,
  * so snapshot N equals the from-scratch components over every pair
  * discovered through batch N (StreamingSpec pins snapshot-final ≡ the n6
  * full recompute). Per-batch cost scales with the batch's pairs plus the
  * prior CLUSTER table (component-bounded), never the corpus — no document
  * is ever re-shingled and no historical pair re-derived.
  *
  * Snapshots form a chain (`batch_id=N` is derived from `batch_id=N-1`
  * plus the idempotently-rewritten pairs of batch N), so a checkpoint
  * replay of batch N deterministically rewrites the same snapshot — the
  * shared idempotence pattern, one level up the derivation ladder.
  */
object ClusterStream {

  /** Watch `docsDir` for new document parquet files; maintain the MinHash
    * index under `indexDir`, verified pairs under `pairsDir/batch_id=<id>`
    * (both exactly as [[DedupStream]]), and full-corpus cluster snapshots
    * under `clustersDir/batch_id=<id>`.
    */
  def clustersStream(
      spark: SparkSession,
      docsDir: String,
      indexDir: String,
      pairsDir: String,
      clustersDir: String,
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
        processBatch(batch, indexDir, pairsDir, clustersDir, batchId)
      }
      .start()
  }

  /** One micro-batch: pairs first (the [[DedupStream]] step, reused — one
    * definition), then the cluster snapshot from the PERSISTED artifacts
    * (prior snapshot + this batch's landed pairs), so a replayed batch
    * recomputes from exactly the same inputs. Exposed for the
    * StreamingSpec differential against the batch-mode n6 recompute.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      indexDir: String,
      pairsDir: String,
      clustersDir: String,
      batchId: Long
  ): Unit = {
    DedupStream.processBatch(batch, indexDir, pairsDir, batchId)
    val spark    = batch.sparkSession
    val newPairs = spark.read.parquet(s"$pairsDir/batch_id=$batchId").select("doc_a", "doc_b")
    val priorEdges =
      if (batchId == 0L) newPairs.limit(0)
      else
        spark.read
          .parquet(s"$clustersDir/batch_id=${batchId - 1}")
          .select(col("cluster_id").as("doc_a"), col("doc_id").as("doc_b"))
    Dedup
      .clustersFromPairsStar(priorEdges.unionByName(newPairs))
      .write
      .mode("overwrite")
      .parquet(s"$clustersDir/batch_id=$batchId")
    // snapshot retention ([[SnapshotChain]]): batch N+1 and any replay of
    // N read only snapshot N−1..N; superseded cluster snapshots retire.
    // The PAIRS segments are untouched — they are sealed per-batch
    // discoveries, not superseded tables.
    SnapshotChain.retain(
      spark, clustersDir, graft.GraftConf.int(spark, "stream.snapshot_keep", 4))
  }
}
