package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Watermark-bounded STREAM-STREAM interval join — the tenth streaming
  * family, and the one canonical Structured Streaming pattern the first
  * nine (all stream-to-table / stateful-fold shapes) did not cover: two
  * live sources joined on a key plus a time-range condition, through
  * Spark's symmetric hash join (`StreamingSymmetricHashJoinExec`). The
  * batch twin is a2 ([[graft.operators.AsOf.intervalPairCount]]): pairs of
  * same-user events within `gapSeconds` of each other, oriented by
  * `a.event_id < b.event_id`.
  *
  * Why this shape is THE scale pattern for stream enrichment: the join
  * condition bounds each side's match window symmetrically
  * (`b.ts ∈ [a.ts − gap, a.ts + gap]`), so once the watermark passes
  * `row.ts + gap` Spark PROVES the row can never match again and evicts it
  * — per-side state is O(events in the last `watermark + gap` of event
  * time), never O(stream). Without the range bound the same join would
  * hold both streams' full history forever; that unbounded-state cliff is
  * exactly what this family demonstrates avoiding.
  *
  * Exactness contract (same as the other families' replay discipline):
  * the pair set equals the batch twin's when arrival is event-time
  * ordered across micro-batches and `watermarkDelay ≥ gap` — a batch-1
  * row whose partner arrives in batch 2 has `ts ≥ partner.ts − gap ≥
  * watermark − gap`, which the eviction rule (`ts + gap < watermark`)
  * provably retains. The staged-arrival spec pins this against a2's
  * corpus; inner-join matches are facts, never revised, so append mode
  * fits.
  */
object IntervalJoinStream {

  /** The SELF-PAIR shape of a2: two watches over the same event feed,
    * joined within ±`gapSeconds`, each unordered pair emitted once via
    * the `a_event_id < b_event_id` orientation. That orientation is what
    * makes this a self-join twin — pointing A and B at DISTINCT streams
    * would silently drop the matches whose left id happens to be larger;
    * for genuine two-stream enrichment use [[intervalEnrichStream]],
    * which carries no id constraint. Emits `(a_event_id, b_event_id)`
    * pairs to an append-mode memory sink.
    */
  def intervalPairStream(
      spark: SparkSession,
      eventsDirA: String,
      eventsDirB: String,
      sinkTable: String,
      gapSeconds: Long = 300L,
      watermarkDelay: String = "10 minutes",
      sourceSchema: Option[StructType] = None
  ): StreamingQuery =
    joined(spark, eventsDirA, eventsDirB, gapSeconds, watermarkDelay, sourceSchema)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()

  /** The same join landed through the shared foreachBatch idempotence
    * pattern: pair rows go to `outDir/pairs/batch_id=<id>/` with
    * overwrite, so a checkpoint replay of batch N rewrites its directory
    * instead of duplicating pairs — the contract every maintained-artifact
    * family carries.
    */
  def intervalPairStreamCheckpointed(
      spark: SparkSession,
      eventsDirA: String,
      eventsDirB: String,
      outDir: String,
      checkpointDir: String,
      gapSeconds: Long = 300L,
      watermarkDelay: String = "10 minutes",
      sourceSchema: Option[StructType] = None
  ): StreamingQuery =
    joined(spark, eventsDirA, eventsDirB, gapSeconds, watermarkDelay, sourceSchema)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        processBatch(batch, outDir, batchId)
      }
      .start()

  /** One joined micro-batch landed as its own `batch_id=` partition with
    * overwrite. Exposed for the spec's direct replay check.
    */
  private[graft] def processBatch(batch: org.apache.spark.sql.DataFrame, outDir: String, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/pairs/batch_id=$batchId")

  /** LEFT OUTER variant — the ENRICHMENT shape: every purchase event
    * emits exactly once, joined to each qualifying click as matches
    * arrive, or as `(purchase_id, null)` once the watermark PROVES no
    * click can still arrive (Spark emits the outer null on state
    * eviction). This is the contract a feature-join pipeline needs:
    * downstream misses no event, enrichment is best-effort within the
    * time bound, and the null emission is delayed by exactly the
    * out-of-orderness allowance — never forever.
    *
    * The flush caveat is inherent to outer stream joins and spec-pinned:
    * an unmatched row near the head of the stream emits only after LATER
    * input advances the watermark past its window. A drained file source
    * (no more batches) therefore leaves the final tail's nulls pending —
    * production streams keep flowing, and the spec grades exactly the
    * provably-final prefix.
    */
  def intervalEnrichStream(
      spark: SparkSession,
      eventsDirA: String,
      eventsDirB: String,
      sinkTable: String,
      gapSeconds: Long = 300L,
      watermarkDelay: String = "10 minutes",
      sourceSchema: Option[StructType] = None
  ): StreamingQuery = {
    val a = EventStream
      .streamingEvents(spark, eventsDirA, sourceSchema)
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    val b = EventStream
      .streamingEvents(spark, eventsDirB, sourceSchema)
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkDelay)
    a.join(
      b,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL ${gapSeconds} SECONDS") &&
        col("c_ts") <= col("p_ts") + expr(s"INTERVAL ${gapSeconds} SECONDS"),
      "leftOuter"
    ).select(col("purchase_id"), col("click_id"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
  }

  private def joined(
      spark: SparkSession,
      eventsDirA: String,
      eventsDirB: String,
      gapSeconds: Long,
      watermarkDelay: String,
      sourceSchema: Option[StructType]
  ) = {
    val a = EventStream
      .streamingEvents(spark, eventsDirA, sourceSchema)
      .select(col("event_id").as("a_event_id"), col("user_id").as("a_user_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", watermarkDelay)
    val b = EventStream
      .streamingEvents(spark, eventsDirB, sourceSchema)
      .select(col("event_id").as("b_event_id"), col("user_id").as("b_user_id"), col("ts").as("b_ts"))
      .withWatermark("b_ts", watermarkDelay)
    // equality key drives the symmetric hash partitioning; the two ts
    // range conjuncts are what let the state store evict. The id
    // inequality (pair orientation — de-duplicates the self-join's two
    // orientations of each pair) also sits in the condition: writing it as
    // a post-join filter changes nothing, PushPredicateThroughJoin folds
    // it straight back in. Known benign noise: StreamingJoinHelper logs
    // one "Error trying to extract state constraint" WARN per batch when
    // its conjunct walk hits the non-time predicate, then derives the
    // watermark bound from the ts terms anyway — the spec proves eviction
    // runs (numRowsRemoved > 0).
    a.join(
      b,
      col("a_user_id") === col("b_user_id") &&
        col("a_event_id") < col("b_event_id") &&
        col("b_ts") >= col("a_ts") - expr(s"INTERVAL ${gapSeconds} SECONDS") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL ${gapSeconds} SECONDS")
    ).select(col("a_event_id"), col("b_event_id"))
  }
}
