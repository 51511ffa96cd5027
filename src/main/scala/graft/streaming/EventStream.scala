package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.LongType

/** Structured-Streaming façade over the `events` table (extension — the
  * reference is pure batch, SURVEY §1.1).
  *
  * The same logical aggregation is exposed three ways:
  *   - [[windowedCountsBatch]]: tumbling-day counts as a batch DataFrame
  *     (oracle-checked — `window('1 day')` aligns to the epoch exactly like
  *     the oracle's `date_trunc('day', ts)`).
  *   - [[windowedCountsStream]]: complete-mode streaming twin, used by the
  *     stream≡batch spec. Complete mode retains all window state and the
  *     memory sink buffers the full result — fine for the differential
  *     test, NOT the unbounded-stream deployment shape.
  *   - [[windowedCountsAppendStream]]: the production shape — append mode,
  *     where the watermark both finalizes windows (emit-once) and evicts
  *     their state, bounding memory on an unbounded stream. Late events
  *     behind the watermark are dropped (proven in StreamingSpec).
  */
object EventStream {

  /** File stream over a directory of event parquet files, with the same
    * ns→µs `ts` normalization as the batch loader
    * ([[graft.sources.Tables.events]]) but to TIMESTAMP (instant) — the
    * event-time type watermarks require. One definition for every streaming
    * consumer: a schema change in the events table is handled here or
    * nowhere.
    */
  private[graft] def streamingEvents(
      spark: SparkSession,
      eventsDir: String,
      sourceSchema: Option[StructType] = None
  ): DataFrame = {
    val fileSchema = StreamSource.schemaFor(spark, eventsDir, sourceSchema)
    val raw        = spark.readStream.schema(fileSchema).parquet(eventsDir)
    fileSchema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  private def windowed(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").cast("timestamp_ntz").as("ws"), col("event_type"), col("cnt"))

  /** W1 — tumbling 1-day counts per event_type, batch form. */
  def windowedCountsBatch(spark: SparkSession, dir: String): DataFrame =
    windowed(Tables.events(spark, dir)).orderBy("ws", "event_type")

  /** W4 — HOPPING-window counts (1-day windows sliding every 12 h): each
    * event lands in exactly window-size/slide = 2 windows, the overlapping
    * trend view dashboards want where tumbling windows jitter at the
    * boundary. Spark's `window(ts, '1 day', '12 hours')` expands each row to
    * its 2 covering windows BEFORE the aggregation, so the shuffle carries
    * (window, type) partial counts — ×2 the tumbling exchange, still
    * window-count-bounded, never event-bounded. Window starts align to the
    * epoch on the 12 h grid, which is what the oracle mirrors in integer µs
    * arithmetic (`(epoch_us // 12h − j) · 12h` for j ∈ {0,1}). Same shape
    * streams under a watermark exactly like [[windowedCountsStream]].
    */
  private def hopWindowed(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").cast("timestamp_ntz").as("ws"), col("event_type"), col("cnt"))

  def hoppingCountsBatch(spark: SparkSession, dir: String): DataFrame =
    hopWindowed(Tables.events(spark, dir)).orderBy("ws", "event_type")

  /** Streaming twin of [[hoppingCountsBatch]] — the SAME aggregation
    * ([[hopWindowed]]) under a watermark, complete-mode memory sink for the
    * stream ≡ batch differential. Hopping state is (windows per slide ×
    * window count) rows; the watermark finalizes and evicts windows in
    * append-mode deployments exactly as for tumbling windows.
    */
  def hoppingCountsStream(spark: SparkSession, eventsDir: String, sinkTable: String): StreamingQuery =
    hopWindowed(streamingEvents(spark, eventsDir).withWatermark("ts", "1 hour"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkTable)
      .start()

  /** Complete-mode streaming twin of [[windowedCountsBatch]] writing to an
    * in-memory table named `sinkTable`. `eventsDir` must be a *directory*
    * of event parquet files (file stream sources watch directories — new
    * files arriving are new micro-batch input, the folder-of-parquet table
    * model streaming-ified).
    */
  def windowedCountsStream(spark: SparkSession, eventsDir: String, sinkTable: String): StreamingQuery =
    windowed(streamingEvents(spark, eventsDir).withWatermark("ts", "1 hour"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkTable)
      .start()

  /** Streaming parquet sink: append-mode windowed counts written back out
    * as a folder-of-parquet table via `foreachBatch` — closing the loop of
    * the engine's own table model (stream a folder in, land a folder out).
    * `foreachBatch` rather than the built-in parquet sink so each
    * micro-batch can use the full batch writer (coalesce for file sizing).
    *
    * foreachBatch itself is only at-least-once; idempotence comes from
    * writing each batch to a `batch_id=<id>/` partition with overwrite —
    * a checkpoint replay of batch N rewrites the same directory instead of
    * appending duplicates. Readers see `batch_id` as a partition column.
    */
  def windowedCountsToParquet(
      spark: SparkSession,
      eventsDir: String,
      outDir: String,
      checkpointDir: String,
      watermark: String = "1 hour"
  ): StreamingQuery =
    windowed(streamingEvents(spark, eventsDir).withWatermark("ts", watermark))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // no emptiness pre-check: that would execute the batch plan twice,
        // and writing an empty batch is harmless
        batch.coalesce(1).write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .start()

  /** W5 — streaming ingest dedup: drop events whose `event_id` was already
    * seen, keeping state only within the watermark horizon
    * (`dropDuplicatesWithinWatermark`) — the exactly-once-ingest operator an
    * at-least-once delivery pipeline (every log/queue replay) needs in front
    * of a training corpus. State is keyed by event_id but EVICTED once the
    * watermark passes an event's time + interval, so memory is
    * O(events-in-horizon), not O(stream history) — the property plain
    * `dropDuplicates` lacks on an unbounded stream. Duplicates arriving
    * within the horizon are suppressed (StreamingSpec stages a cross-batch
    * replay to prove it); re-deliveries later than the watermark are by
    * definition outside the delivery-retry window.
    */
  def dedupedEventStream(
      spark: SparkSession,
      eventsDir: String,
      sinkTable: String,
      watermark: String = "1 hour"
  ): StreamingQuery =
    streamingEvents(spark, eventsDir)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "event_type")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()

  /** W4 — stream-stream join: every purchase paired with ALL of the same
    * user's clicks from the preceding hour (the streaming twin of A3's
    * tolerance-bounded correlation, set-valued instead of latest-match).
    * Both sides are watermarked and the join condition is time-range
    * bounded, which is what lets Spark EVICT buffered join state once the
    * watermark passes `pts − bound` — state is O(events in horizon), the
    * property an unbounded stream-stream join must have. StreamingSpec
    * proves landed output == the batch join on the same data.
    */
  def purchaseClickJoinStream(
      spark: SparkSession,
      eventsDir: String,
      sinkTable: String,
      watermark: String = "1 hour"
  ): StreamingQuery = {
    val ev = streamingEvents(spark, eventsDir)
    val purchases = ev
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
      .withWatermark("pts", watermark)
    val clicks = ev
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cuser"), col("ts").as("cts"))
      .withWatermark("cts", watermark)
    purchases
      .join(
        clicks,
        col("user_id") === col("cuser") &&
          col("cts") <= col("pts") && col("cts") >= col("pts") - expr("interval 1 hour")
      )
      .select("purchase_id", "click_id")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
  }

  /** Append-mode variant: a window's counts are emitted exactly once, when
    * the watermark passes its end — and events arriving later than the
    * watermark are *dropped*, the behavior that bounds state on an unbounded
    * stream. StreamingSpec stages a late event to prove the drop.
    */
  def windowedCountsAppendStream(
      spark: SparkSession,
      eventsDir: String,
      sinkTable: String,
      watermark: String = "1 hour"
  ): StreamingQuery =
    windowed(streamingEvents(spark, eventsDir).withWatermark("ts", watermark))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
}
