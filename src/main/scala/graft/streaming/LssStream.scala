package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming LSS maintenance — the sixteenth maintained-artifact family,
  * and the one whose batch build is the most expensive text layout in the
  * engine (the full corpus-wide shared-prefix aggregation, 43–51 s at
  * sf0.1, 10× that at 10×): the per-doc longest-shared-substring table
  * (n19's surface `(doc_id, lss_len, lss_fp)`) kept current as documents
  * arrive, with NO document ever re-exploded after its own micro-batch.
  *
  * Shape per batch N:
  *   1. the batch's docs are exploded ONCE into their (len, fp) span keys
  *      (`Dedup.lssPrefixStream`, the same generator chain every batch
  *      surface uses) and landed as this batch's SEALED key segment under
  *      `keys/batch_id=N` — the TrigramStream sealed-segment discipline;
  *   2. historical carriers of the batch's keys come from a NARROW
  *      (doc_id, len, fp) scan of the prior segments joined to the batch
  *      key set — never from re-reading document text;
  *   3. sharedness per key is min≠max on doc_id over (historical carriers
  *      ∪ batch rows) — partial-aggregable, no distinct-set state (a key
  *      is a batch key, so it has ≥1 batch carrier; one more carrier
  *      anywhere makes it shared);
  *   4. snapshot N = the (max len, min fp) fold over prior snapshot rows ∪
  *      the batch docs' shared keys ∪ historical carriers' candidate rows
  *      — the ClusterStream snapshot-chain pattern. Adding documents can
  *      never UNshare a span, so a prior row is a still-valid candidate
  *      and the fold only ever improves it; an existing doc's candidates
  *      can only change through keys carried by a NEW doc, and those are
  *      exactly the batch keys (LssStreamSpec pins snapshot-final ≡ the
  *      n19 full recompute, the improvement corner, the fp tie corner,
  *      and idempotent replay).
  *
  * Span identity in the stored segments is the (md5, xxhash64) DUAL
  * fingerprint — 192 independent bits (ADVICE r17: md5 alone is
  * chosen-prefix-collision practical, and unlike the batch path — where a
  * collision only perturbs the reported `lss_fp` tie-break because
  * sharedness and lss_len are recomputed on exact strings — a streamed
  * false "shared" verdict would persist in every subsequent snapshot,
  * since sharedness is monotone and never re-derived. With the dual key a
  * false share needs a simultaneous md5 AND xxhash64 collision on the
  * same span pair; no known technique produces one, and the random
  * chance is 2⁻¹⁹²). The snapshot SURFACE still reports and tie-breaks
  * on `lss_fp = md5(span)` alone — the registered n19 contract — so the
  * xxhash64 half rides only inside the segments and the sharedness
  * grouping; the stream's residual exposure is now the same tie-break
  * exposure the batch table accepts, not the wider poisoning channel.
  *
  * Idempotence follows the shared pattern: the key segment and the
  * snapshot land under `batch_id=<id>/` with overwrite, and batch N's
  * inputs (segments < N, snapshot N−1, the replayed batch) are untouched
  * by batch N's writes, so a checkpoint replay rewrites byte-identical
  * outputs. A `graft.lss.max_tokens` change mid-stream would silently mix
  * span caps across segments — the `_scheme` stamp fails that fast
  * (DedupStream's discipline).
  *
  * ROW retention: none, deliberately — every key row stays load-bearing
  * forever (any old doc can be the carrier that shares a FUTURE doc's
  * span), so nothing is ever superseded or retired. FILE retention is a
  * different question (VERDICT r19): one sealed segment per batch grows
  * the listing + small-file fan without bound at daily cadence — the
  * same growth `SegmentFan` already folds for the MinHash/trigram/
  * tokenizer families — so [[compactKeySegments]] folds the key fan as
  * a PURE ROW MOVE (identity row set, re-clustered by fp — the layout
  * each segment already uses, since the only reader is an fp equi-join).
  * The fold is sound for the incremental delta because the per-batch
  * historical read filters on the `batch_id` DATA column (preserved by
  * the fold), not on segment boundaries, and the replay-target newest
  * segment is never folded ([[SegmentFan]]'s crash argument); the
  * marginal batch cost stays DATA-bound either way (measured flat at
  * 14–22 s over 10 replica-sized batches, `ScaleRehearsal lssstream`) —
  * the fold bounds METADATA cost, not bytes read.
  */
object LssStream {

  /** Watch `docsDir` for new document parquet; maintain key segments under
    * `stateDir/keys/batch_id=<id>` and full LSS snapshots under
    * `stateDir/lss/batch_id=<id>`.
    */
  def lssStream(
      spark: SparkSession,
      docsDir: String,
      stateDir: String,
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
        processBatch(batch, stateDir, batchId)
      }
      .start()
  }

  /** Stream-local scheme component: bump with any change to the stored
    * segment shape. v2 = the dual (md5, xxhash64) span key (ADVICE r17).
    */
  private[graft] val StreamSchemeVersion = 2

  private[graft] def schemeTag(cap: Int): String =
    s"lss-stream-v${Dedup.LssSchemeVersion}.$StreamSchemeVersion#c$cap"

  /** One micro-batch. Exposed for the LssStreamSpec differential against
    * the n19 full recompute.
    */
  private[graft] def processBatch(batch: DataFrame, stateDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val cap   = graft.GraftConf.int(spark, "lss.max_tokens", 16)
    DedupStream.assertOrStampScheme(spark, stateDir, schemeTag(cap))
    // the batch's only explode, sealed as its own key segment (fp-
    // clustered: the only reader is an equi-join on fp, and neighboring
    // fingerprints compress their (len, fp) runs)
    val pfx = Dedup
      .lssPrefixStream(batch, cap)
      .select(col("doc_id"), col("len"), md5(col("s")).as("fp"), xxhash64(col("s")).as("fp2"))
      .distinct()
    pfx
      .repartition(col("fp"))
      .sortWithinPartitions("len", "fp")
      .write.mode("overwrite").parquet(s"$stateDir/keys/batch_id=$batchId")
    val keys = spark.read.parquet(s"$stateDir/keys/batch_id=$batchId")
    // historical carriers of the batch's keys: 4-column scan, partition-
    // pruned to segments < N, join strategy left to AQE (the batch key
    // set is small for a small batch and corpus-sized for a bootstrap
    // batch — a forced broadcast would be the maskedHashLedger mistake).
    // Key identity everywhere below is the dual (len, fp, fp2) — see the
    // object scaladoc's collision argument.
    val batchKeys = keys.select("len", "fp", "fp2").distinct()
    val hist = SegmentFan
      .tableRead(spark, stateDir, Seq("keys"), "keys")
      .where(col("batch_id") < batchId)
      .select("doc_id", "len", "fp", "fp2")
      .join(batchKeys, Seq("len", "fp", "fp2"), "left_semi")
    val shared = hist
      .unionByName(keys.select("doc_id", "len", "fp", "fp2"))
      .groupBy("len", "fp", "fp2")
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .where(col("mn") =!= col("mx"))
      .select("len", "fp", "fp2")
    // candidates: the batch docs' shared keys, the historical carriers'
    // rows of those keys, and every prior-snapshot row (still valid —
    // sharedness is monotone under ingest)
    val prior =
      if (batchId == 0L) spark.emptyDataFrame.select(lit(0L).as("doc_id"), lit(0L).as("len"), lit("").as("fp")).limit(0)
      else
        spark.read
          .parquet(s"$stateDir/lss/batch_id=${batchId - 1}")
          .select(col("doc_id"), col("lss_len").as("len"), col("lss_fp").as("fp"))
    // sharedness decided on the dual key; the fold below then drops fp2 —
    // the snapshot surface stays (doc_id, lss_len, lss_fp=md5), n19's
    // registered contract including the md5 tie-break
    val cand = keys
      .select("doc_id", "len", "fp", "fp2")
      .unionByName(hist)
      .join(shared, Seq("len", "fp", "fp2"), "left_semi")
      .select("doc_id", "len", "fp")
      .unionByName(prior)
    cand
      .groupBy("doc_id", "len")
      .agg(min(col("fp")).as("fp"))
      .groupBy("doc_id")
      .agg(max_by(struct(col("len"), col("fp")), col("len")).as("m"))
      .select(col("doc_id"), col("m.len").as("lss_len"), col("m.fp").as("lss_fp"))
      .write.mode("overwrite").parquet(s"$stateDir/lss/batch_id=$batchId")
    // SNAPSHOT retention (round 18): batch N+1 and any replay of N read
    // only snapshot N−1..N, so superseded snapshots retire once the chain
    // exceeds the keep window — unbounded chains are both dead storage
    // (one full table per batch) and an erasure liability (old snapshots
    // retain taken-down rows). Key ROWS are never retired — they stay
    // load-bearing forever (object scaladoc); [[compactKeySegments]] only
    // moves them between files.
    SnapshotChain.retain(
      spark, s"$stateDir/lss", graft.GraftConf.int(spark, "stream.snapshot_keep", 4))
  }

  /** COMPACT the key-segment fan into one sealed generation — the shared
    * [[SegmentFan.compact]] with the identity fold, re-clustered by fp
    * (each sealed segment's own layout, so the generation reads exactly
    * like a big segment). Bounds the file/listing fan without touching
    * the no-row-retention rationale: the row set before and after is
    * identical, `batch_id` rides along as a data column for the
    * incremental read's `< batchId` filter, and the newest segment stays
    * live as the checkpoint-replay rewrite target. Scheme-guarded like
    * every batch. Returns the new cutoff (0 = no-op).
    */
  def compactKeySegments(spark: SparkSession, stateDir: String): Long = {
    val cap = graft.GraftConf.int(spark, "lss.max_tokens", 16)
    DedupStream.assertOrStampScheme(spark, stateDir, schemeTag(cap))
    SegmentFan.compact(
      spark,
      stateDir,
      Seq("keys"),
      (_, df) => df.repartition(col("fp")).sortWithinPartitions("len", "fp")
    )
  }

  /** The stream-maintained LSS table as of `batchId` (the latest committed
    * snapshot when omitted) — row-identical to n19's batch table over the
    * same documents.
    */
  def longestSharedSubstringStreamed(
      spark: SparkSession,
      stateDir: String,
      batchId: Option[Long] = None
  ): DataFrame = {
    val id = batchId.getOrElse {
      val p  = new org.apache.hadoop.fs.Path(s"$stateDir/lss")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // COMMITTED = the directory carries Spark's _SUCCESS marker (ADVICE
      // r17: a crash after the batch_id=N dir is created but before the
      // write commits leaves a torn directory that a bare max() would
      // select until the idempotent replay overwrites it — the doc
      // promises committed, so readers skip markerless snapshots and fall
      // back to the newest committed one)
      val committed = fs
        .listStatus(p)
        .map(_.getPath)
        .collect {
          case d if d.getName.startsWith("batch_id=") &&
            fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")) =>
            d.getName.stripPrefix("batch_id=").toLong
        }
      require(committed.nonEmpty, s"no committed LSS snapshot under $stateDir/lss")
      committed.max
    }
    spark.read.parquet(s"$stateDir/lss/batch_id=$id").orderBy("doc_id")
  }
}
