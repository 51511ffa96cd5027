package graft.streaming

import graft.operators.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming tokenizer-count maintenance — v4's maintained-word-count rung
  * ([[Bpe.bpeMergesIncremental]]) wired into a `foreachBatch` loop: each
  * micro-batch of documents is tokenized ONCE into its own `(word, freq)`
  * count segment. Because BPE induction consumes only word frequencies and
  * counts are additive longs, retraining from the summed union of the
  * streamed segments is BIT-IDENTICAL to v1's full retrain on the same
  * corpus (the v4 exactness argument at N segments) — but the historical
  * stream is never re-tokenized: per-batch cost is one batch scan, and the
  * (bounded, vocabulary-sized) induction runs only when a retrain is
  * actually requested, not per batch. This is the cadence real tokenizer
  * pipelines use — counts maintained continuously, training an explicit
  * occasional step — and it completes the streaming-twin set for every
  * segment-maintained artifact family ([[DedupStream]] pairs,
  * [[VectorIndexStream]] vectors, [[MediaCatalogStream]] catalog,
  * [[PostingsStream]] postings, here tokenizer counts).
  *
  * Idempotence follows the shared pattern: each segment write goes to a
  * `batch_id=<id>/` partition with overwrite, so a checkpoint replay of
  * batch N rewrites the same directory instead of double-counting words.
  */
object TokenizerStream {

  /** Watch `docsDir` for new document parquet files; maintain the count
    * segments under `countsDir/batch_id=<id>/`.
    */
  def wordCountStream(
      spark: SparkSession,
      docsDir: String,
      countsDir: String,
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
        processBatch(batch, countsDir, batchId)
      }
      .start()
  }

  /** One micro-batch: the SAME count builder every batch surface uses
    * ([[Bpe.wordCounts]] — one definition, so a streamed segment can never
    * count differently from the batch maintenance path), landed as this
    * batch's own segment. Exposed for the StreamingSpec differential.
    */
  private[graft] def processBatch(batch: DataFrame, countsDir: String, batchId: Long): Unit =
    Bpe
      .wordCounts(batch)
      .write
      .mode("overwrite")
      .parquet(s"$countsDir/counts/batch_id=$batchId")

  /** Pre-r20 deployments wrote segments at `countsDir/batch_id=N` (directly
    * under the root); the [[SegmentFan]] layout moved them under
    * `countsDir/counts/batch_id=N`. A read or compact that silently
    * ignored the legacy dirs would drop historical counts from every
    * retrain with no error (ADVICE r19) — so both entry points fold them
    * in first: each legacy segment is RENAMED into the fan (a pure move —
    * segment contents and ids are unchanged, so the summed-union retrain
    * is bit-identical before and after).
    *
    * Only names [[SegmentFan.parsedId]] accepts migrate — an unparseable
    * leftover (`batch_id=copy`, a pasted-nanos overflow name) is ignored
    * by every fan reader, and moving it would convert a harmless stray
    * into a partition-discovery breaker inside `counts/`.
    *
    * A COLLISION (the same id in both layouts) has one normal, system-
    * produced cause: a pre-upgrade crash left batch N in the legacy
    * layout, and the post-upgrade checkpoint replay rewrote batch N into
    * the fan — two row-identical copies of the same idempotent write. So
    * a collision resolves by COMPARING ROW SETS (vocab-sized, one cheap
    * job): equal → the legacy copy is redundant and is deleted; unequal →
    * genuinely ambiguous, throw. Concurrency: a rename that fails because
    * another migrator moved the segment first (src gone, dst present) is
    * that migrator's success, not an error. Crash-safe: each segment is
    * handled independently and a re-run finishes whatever remains.
    */
  private[graft] def foldLegacyCountSegments(spark: SparkSession, countsDir: String): Int = {
    val root = new org.apache.hadoop.fs.Path(countsDir)
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val legacy = fs
      .listStatus(root)
      .filter(s => s.isDirectory && SegmentFan.parsedId(s.getPath.getName, "batch_id=").isDefined)
      .map(_.getPath)
    if (legacy.isEmpty) return 0
    val fanRoot = new org.apache.hadoop.fs.Path(root, "counts")
    if (!fs.exists(fanRoot)) fs.mkdirs(fanRoot)
    // A committed generation whose cutoff exceeds a legacy id means that id
    // is ALREADY below tableRead's batch_id >= cutoff filter: renaming it
    // into the fan would park it in the GC-eligible range where the next
    // compact deletes it without ever folding its rows — silent loss. This
    // state is unreachable through the shipped entry points (both fold
    // before the first compact); reaching it means a dual-writer misconfig
    // or a manual restore, which must fail loudly (ADVICE r20).
    SegmentFan.latestGen(spark, countsDir, Seq("counts")).foreach { case (cutoff, _) =>
      val below = legacy.flatMap(p => SegmentFan.parsedId(p.getName, "batch_id=")).filter(_ < cutoff)
      if (below.nonEmpty)
        throw new IllegalStateException(
          s"legacy tokenizer count segments ${below.sorted.mkString(",")} are below the committed " +
            s"generation cutoff $cutoff at $countsDir: folding them into the fan would GC them " +
            "unfolded. Restore them as a NEW batch (or fold them into the generation) manually."
        )
    }
    legacy.foreach { src =>
      val dst = new org.apache.hadoop.fs.Path(fanRoot, src.getName)
      if (fs.exists(dst)) {
        // On a collision, ALWAYS try the row comparison first (ADVICE r21):
        // inferring a torn write purely from a missing `_SUCCESS` deletes
        // valid data when success markers are disabled
        // (mapreduce.fileoutputcommitter.marksuccessfuljobs=false) or lost
        // in a manual restore. Only a legacy copy whose parquet actually
        // FAILS TO READ is treated as the pre-upgrade torn write and
        // dropped in favor of the committed fan copy; a readable copy that
        // diverges still fails loudly regardless of markers.
        val legacyRead = scala.util.Try {
          val legacyRows = spark.read.parquet(src.toString).select("word", "freq")
          val fanRows    = spark.read.parquet(dst.toString).select("word", "freq")
          legacyRows.exceptAll(fanRows).isEmpty && fanRows.exceptAll(legacyRows).isEmpty
        }
        legacyRead match {
          case scala.util.Success(true) =>
            fs.delete(src, true) // replay-produced duplicate of the fan copy
          case scala.util.Success(false) =>
            throw new IllegalStateException(
              s"tokenizer count segment ${src.getName} exists in BOTH the legacy layout ($src) " +
                s"and the fan layout ($dst) WITH DIFFERENT ROWS; cannot decide which copy is " +
                "authoritative — delete the stale one manually before retraining"
            )
          case scala.util.Failure(_)
              if !fs.exists(new org.apache.hadoop.fs.Path(src, "_SUCCESS")) =>
            // unreadable AND markerless: the torn write the collision came from
            fs.delete(src, true)
            return foldLegacyCountSegments(spark, countsDir) + 1
          case scala.util.Failure(e) =>
            throw new IllegalStateException(
              s"tokenizer count segment ${src.getName} carries _SUCCESS but failed to read " +
                s"during the legacy/fan comparison at $src — refusing to guess",
              e
            )
        }
      } else if (!fs.rename(src, dst) && !(fs.exists(dst) && !fs.exists(src)))
        throw new IllegalStateException(s"failed to migrate legacy count segment $src -> $dst")
    }
    legacy.length
  }

  /** Retrain the merge table from the STREAM-MAINTAINED counts: the summed
    * union across every streamed segment through the shared
    * [[Bpe.trainFromCounts]] induction — bit-equal to v1's full retrain
    * over the same documents (StreamingSpec pins the equality).
    */
  def mergesFromStream(
      spark: SparkSession,
      countsDir: String,
      numMerges: Int = -1 // -1 = the graft.bpe.merges session knob
  ): DataFrame = {
    foldLegacyCountSegments(spark, countsDir)
    Bpe
      .trainFromCounts(
        spark,
        SegmentFan.tableRead(spark, countsDir, Seq("counts"), "counts").select("word", "freq"),
        Bpe.resolveMergesKnob(spark, numMerges)
      )
      .orderBy("merge_rank")
  }

  /** COMPACT the streamed count-segment fan into one sealed generation —
    * the shared [[SegmentFan.compact]] with a RE-AGGREGATING fold: counts
    * are additive longs, and [[Bpe.trainFromCounts]] itself re-groups by
    * word summing freq, so pre-summing the folded rows is bit-identical
    * by associativity of long addition (the v4 exactness argument, pinned
    * across the boundary in StreamingSpec). Unlike the row-move folds,
    * this one also bounds ROWS: vocab-per-batch × batches collapses to
    * one vocab-sized table per generation. The folded rows carry the
    * cutoff-1 batch_id (the newest id they cover) — nothing orders on it
    * downstream, it exists for the generation read's cutoff filter shape.
    */
  def compactStreamedCounts(spark: SparkSession, countsDir: String): Long = {
    foldLegacyCountSegments(spark, countsDir)
    SegmentFan.compact(
      spark,
      countsDir,
      Seq("counts"),
      (_, df) => {
        val cut = df.agg(max("batch_id")).head()
        val id  = if (cut.isNullAt(0)) 0L else cut.getLong(0)
        df.groupBy("word")
          .agg(sum("freq").as("freq"))
          .withColumn("batch_id", lit(id))
      }
    )
  }
}
