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

  /** One logical index table (`docsets` or `buckets`) as the union of the
    * newest committed GENERATION (rows with `batch_id <` the generation's
    * cutoff, folded by [[compactIndex]]) and the live `batch_id=` segment
    * fan at or above the cutoff. Fan directories BELOW the cutoff are
    * excluded by filter, not by trusting deletion — a crash between the
    * generation commit and the fan GC leaves duplicate bytes on disk but
    * never duplicate rows in a read (the SnapshotChain committed-marker
    * discipline). `batch_id` is normalized to long on both sides (the fan
    * side is a discovered partition column whose inferred type can differ
    * from the generation's stored column).
    */
  private[graft] def indexTable(spark: SparkSession, indexDir: String, table: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def read(p: String): Option[DataFrame] = {
      val hp = new org.apache.hadoop.fs.Path(p)
      if (fs.exists(hp) && fs.listStatus(hp).nonEmpty) Some(spark.read.parquet(p)) else None
    }
    val gen = latestGen(spark, indexDir)
    val fan = read(s"$indexDir/$table")
      .map(_.withColumn("batch_id", col("batch_id").cast("long")))
      .map(df => gen.fold(df) { case (cut, _) => df.where(col("batch_id") >= cut) })
    val genRows = gen.flatMap { case (_, dir) => read(s"$dir/$table.parquet") }
      .map(_.withColumn("batch_id", col("batch_id").cast("long")))
    (fan, genRows) match {
      case (Some(f), Some(g)) => f.unionByName(g)
      case (Some(f), None)    => f
      case (None, Some(g))    => g
      case (None, None) =>
        throw new IllegalStateException(s"maintained index at $indexDir has no segments and no generation")
    }
  }

  /** The newest COMMITTED generation under `indexDir`: `gen=<cutoff>`
    * whose docsets AND buckets tables both carry `_SUCCESS` (half-written
    * generations from a crashed compaction are invisible, exactly like a
    * markerless snapshot in [[SnapshotChain]]). Returns (cutoff, dir).
    */
  private def latestGen(spark: SparkSession, indexDir: String): Option[(Long, String)] = {
    val p  = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    fs.listStatus(p)
      .map(_.getPath)
      .filter { d =>
        val s = d.getName.stripPrefix("gen=")
        // ≤ 18 digits: parseable as Long without overflow — a stray
        // all-digit name longer than that must be skipped, not thrown on
        d.getName.startsWith("gen=") && s.nonEmpty && s.length <= 18 && s.forall(_.isDigit)
      }
      .filter(d => Seq("docsets", "buckets").forall(t =>
        fs.exists(new org.apache.hadoop.fs.Path(d, s"$t.parquet/_SUCCESS"))))
      .map(d => (d.getName.stripPrefix("gen=").toLong, d.toString))
      .sortBy(_._1)
      .lastOption
  }

  /** COMPACT the maintained MinHash index's `batch_id=` segment fan into
    * one sealed GENERATION (VERDICT r18 item 4): the stream appends one
    * segment per micro-batch forever, and at daily cadence over years
    * every [[indexTable]] read pays the whole segment fan in listing and
    * small-file overhead — the exact problem the postings/positions/vector
    * layouts solved in r12 (t16's fold). This applies the same LSM
    * generation handoff to the dedup index, in place and crash-safe:
    *
    *   1. cutoff = the NEWEST fan id. Everything strictly older is folded;
    *      the newest segment itself never is, because after a crash the
    *      newest batch is the one a checkpoint replay rewrites — folding
    *      it would double its rows when the replayed segment lands.
    *   2. the previous generation ∪ folded fan rows (batch_id kept as a
    *      DATA column — the incremental pairing rule orders on it) land at
    *      `gen=<cutoff>/{docsets,buckets}.parquet`; the generation is
    *      invisible until BOTH tables commit `_SUCCESS`.
    *   3. folded fan dirs and superseded generations are deleted LAST —
    *      pure GC, because readers already exclude them by cutoff filter.
    *
    * Row-set preservation is exact (a fold moves rows, touching neither
    * keys nor payloads), so stream ≡ batch holds across the boundary —
    * StreamingSpec pins a compacted run against an uncompacted twin and
    * the exact-Jaccard batch oracle. Returns the new cutoff (0 = no-op:
    * fewer than two live segments). Scheme-guarded like every batch: a
    * session under a bumped signature scheme must re-bootstrap, not
    * compact history it cannot reproduce.
    */
  def compactIndex(spark: SparkSession, indexDir: String): Long = {
    assertOrStampScheme(spark, indexDir, Dedup.minhashSchemeTag(spark))
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fanDirs(table: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/$table")
      if (!fs.exists(p)) Nil
      else
        fs.listStatus(p)
          .map(_.getPath)
          .filter { d =>
            val s = d.getName.stripPrefix("batch_id=")
            d.getName.startsWith("batch_id=") && s.nonEmpty && s.length <= 18 && s.forall(_.isDigit)
          }
          .map(d => (d.getName.stripPrefix("batch_id=").toLong, d))
          .toSeq
    }
    val prevCut = latestGen(spark, indexDir).map(_._1).getOrElse(0L)
    // GC relative to the CURRENT committed cutoff runs even on the no-op
    // path: a crash between a previous compaction's generation commit and
    // its GC leaves folded fan segments + a superseded generation behind
    // (readers already exclude them by filter), and on a low-traffic
    // stream the next fold might be far away — reclaim them on every call
    def gc(cutoff: Long): Unit = {
      Seq("docsets", "buckets").foreach(t =>
        fanDirs(t).filter(_._1 < cutoff).foreach(d => fs.delete(d._2, true)))
      fs.listStatus(new org.apache.hadoop.fs.Path(indexDir))
        .map(_.getPath)
        .filter { d =>
          val s = d.getName.stripPrefix("gen=")
          d.getName.startsWith("gen=") && s.nonEmpty && s.length <= 18 &&
            s.forall(_.isDigit) && s.toLong < cutoff
        }
        .foreach(d => fs.delete(d, true))
    }
    gc(prevCut)
    val live = fanDirs("docsets").map(_._1).filter(_ >= prevCut)
    if (live.length <= 1) return 0L
    val cutoff = live.max
    Seq("docsets", "buckets").foreach { t =>
      indexTable(spark, indexDir, t)
        .where(col("batch_id") < cutoff)
        .write.mode("overwrite").parquet(s"$indexDir/gen=$cutoff/$t.parquet")
    }
    gc(cutoff)
    cutoff
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
