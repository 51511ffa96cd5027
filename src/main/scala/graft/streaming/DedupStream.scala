package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming incremental near-dup detection — [[Dedup.incrementalNearDupPairs]]'
  * batch-vs-persisted-index shape wired into a `foreachBatch` loop, so a
  * document stream dedups continuously: each micro-batch is MinHashed once,
  * its artifacts land in a growing on-disk index, and only THEN is it joined
  * against every earlier batch's stored buckets. No document is ever
  * re-shingled after its own micro-batch — per-batch cost tracks batch size,
  * the only shape continuous dedup at 100 TB can take.
  *
  * Idempotence follows [[EventStream.windowedCountsToParquet]]'s pattern:
  * every write (index artifacts AND discovered pairs) goes to a
  * `batch_id=<id>/` partition with overwrite, so a checkpoint replay of
  * batch N rewrites the same directories instead of duplicating index rows
  * or pair reports. Each pair is discovered exactly once — by the batch
  * that delivers its LATER member (cross pairs join strictly earlier
  * batches; within-batch pairs are ordered) — so the union over `batch_id`
  * partitions is the full pair set with no cross-batch duplicates.
  */
object DedupStream {

  /** Watch `docsDir` for new document parquet files; maintain the MinHash
    * index under `indexDir` (`docsets/`, `buckets/` folder-of-parquet
    * tables partitioned by `batch_id`) and land verified near-dup pairs
    * under `pairsDir/batch_id=<id>/`.
    */
  def incrementalPairsStream(
      spark: SparkSession,
      docsDir: String,
      indexDir: String,
      pairsDir: String,
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
        processBatch(batch, indexDir, pairsDir, batchId)
      }
      .start()
  }

  /** One micro-batch: shingle+MinHash the new documents ONCE, persist their
    * artifacts, then verify candidates from (stored corpus buckets ⋈ this
    * batch's buckets) plus the batch's internal collisions. Exposed for the
    * StreamingSpec differential against the batch-mode n5.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      indexDir: String,
      pairsDir: String,
      batchId: Long
  ): Unit = {
    val spark = batch.sparkSession
    // Scheme guard: the batch layouts rebuild under a new signature scheme
    // because the scheme tag is in their cache keys, but a checkpoint-
    // resumed STREAM would happily append new-scheme segments onto an
    // index whose older batch_id= segments carry the previous scheme's
    // hashes — verifyPairs would then intersect disjoint hash spaces and
    // silently report cross-batch near-dups as non-dups. The index
    // carries a `_scheme` marker; a mismatch fails fast (re-bootstrap the
    // index directory) instead of corrupting it.
    assertOrStampScheme(spark, indexDir, Dedup.minhashSchemeTag(spark))
    val (docSets, buckets) = Dedup.minhashArtifacts(batch.select("doc_id", "text"))
    // Persist FIRST, then join from what was read back: verification runs
    // against exactly the stored artifacts, and a replayed batch reuses the
    // overwrite path end-to-end.
    docSets.write.mode("overwrite").parquet(s"$indexDir/docsets/batch_id=$batchId")
    buckets.write.mode("overwrite").parquet(s"$indexDir/buckets/batch_id=$batchId")
    val allSets    = indexTable(spark, indexDir, "docsets")
    val allBuckets = indexTable(spark, indexDir, "buckets")
    val mine       = allBuckets.where(col("batch_id") === batchId)
    val corpus     = allBuckets.where(col("batch_id") < batchId)
    // Stream arrival order need not follow doc_id order, so cross pairs
    // normalize to (least, greatest) — the (doc_a < doc_b) contract the
    // batch rungs guarantee by construction.
    val crossCand = corpus
      .as("a")
      .join(mine.as("b"), col("a.band") === col("b.band") && col("a.bv") === col("b.bv"))
      .where(col("a.doc_id") =!= col("b.doc_id"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b")
      )
      .distinct()
    val selfCand = mine
      .as("a")
      .join(mine.as("b"), col("a.band") === col("b.band") && col("a.bv") === col("b.bv") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    Dedup
      .verifyPairs(allSets.select("doc_id", "ss", "c"), crossCand.unionByName(selfCand))
      .write
      .mode("overwrite")
      .parquet(s"$pairsDir/batch_id=$batchId")
  }

  /** One logical index table (`docsets` or `buckets`) — the
    * [[SegmentFan.tableRead]] union of the newest committed generation
    * and the live `batch_id=` fan at or above its cutoff (the shared
    * crash-safety argument lives on [[SegmentFan]]).
    */
  private[graft] def indexTable(spark: SparkSession, indexDir: String, table: String): DataFrame =
    SegmentFan.tableRead(spark, indexDir, IndexTables, table)

  private val IndexTables = Seq("docsets", "buckets")

  /** COMPACT the maintained MinHash index's `batch_id=` segment fan into
    * one sealed GENERATION (VERDICT r18 item 4): the stream appends one
    * segment per micro-batch forever, and at daily cadence over years
    * every [[indexTable]] read pays the whole segment fan in listing and
    * small-file overhead — the exact problem the postings/positions/vector
    * layouts solved in r12 (t16's fold). The fold itself is the shared
    * [[SegmentFan.compact]] (newest segment excluded as the checkpoint-
    * replay rewrite target; all-tables `_SUCCESS` commit; cutoff-filtered
    * reads; GC on every call including the no-op path). batch_id rides
    * along as a DATA column because the incremental pairing rule orders
    * on it. Row-set preservation is exact (a fold moves rows), so
    * stream ≡ batch holds across the boundary — StreamingSpec pins a
    * compacted run against an uncompacted twin and the exact-Jaccard
    * batch oracle. Returns the new cutoff (0 = no-op). Scheme-guarded
    * like every batch: a session under a bumped signature scheme must
    * re-bootstrap, not compact history it cannot reproduce.
    */
  def compactIndex(spark: SparkSession, indexDir: String): Long = {
    assertOrStampScheme(spark, indexDir, Dedup.minhashSchemeTag(spark))
    SegmentFan.compact(spark, indexDir, IndexTables)
  }

  /** Stamp `indexDir/_scheme` with `tag` on first use; on every later
    * batch require it to match. Idempotent under replay (equal tag
    * rewrites nothing); a mismatch throws with both tags in the message.
    */
  private[graft] def assertOrStampScheme(spark: SparkSession, indexDir: String, tag: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$indexDir/_scheme")
    val fs   = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) {
      val in = fs.open(path)
      val stored =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      if (stored != tag)
        throw new IllegalStateException(
          s"maintained index at $indexDir was built under scheme '$stored' but this session produces '$tag'; " +
            "a stream cannot rebuild its history — re-bootstrap the index directory (and its checkpoint) " +
            "instead of mixing hash schemes across segments"
        )
    } else {
      val out = fs.create(path, true)
      try out.write(tag.getBytes("UTF-8"))
      finally out.close()
    }
  }
}
