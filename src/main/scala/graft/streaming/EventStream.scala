package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructType}

/** Structured-Streaming façade over the `events` table (extension — the
  * reference is pure batch, SURVEY §1.1).
  *
  * The same logical aggregation is exposed twice:
  *   - [[windowedCountsBatch]]: tumbling-day counts as a batch DataFrame
  *     (oracle-checked — `window('1 day')` aligns to the epoch exactly like
  *     the oracle's `date_trunc('day', ts)`).
  *   - [[windowedCountsStream]]: the identical plan over `readStream` with a
  *     watermark for state eviction. StreamingSpec drives it through the
  *     streaming engine (file source → memory sink) and asserts
  *     stream ≡ batch, the invariant that makes the façade trustworthy.
  *
  * At scale the stateful agg shuffles on (window, event_type) once per
  * micro-batch and the 1-hour watermark bounds state size.
  */
object EventStream {

  private def windowed(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"))

  /** W1 — tumbling 1-day counts per event_type, batch form. */
  def windowedCountsBatch(spark: SparkSession, dir: String): DataFrame =
    windowed(Tables.events(spark, dir)).orderBy("ws", "event_type")

  /** Same plan over a file-source stream; returns the started query writing
    * to an in-memory table named `sinkTable`. `eventsDir` must be a
    * *directory* of event parquet files (file stream sources watch
    * directories — new files arriving are new micro-batch input, which is
    * exactly the folder-of-parquet table model streaming-ified).
    */
  def windowedCountsStream(spark: SparkSession, eventsDir: String, sinkTable: String): StreamingQuery = {
    // File stream sources need an explicit schema; read it from the footer.
    val fileSchema: StructType = spark.read.parquet(eventsDir).schema
    val raw = spark.readStream.schema(fileSchema).parquet(eventsDir)
    // Watermarks require event time as TIMESTAMP (not NTZ): window on the
    // instant type, then cast the window bound back to NTZ so the streaming
    // result is schema-identical to the batch form (session tz is UTC, so
    // the wall-clock values agree).
    val events = fileSchema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").cast("timestamp_ntz").as("ws"), col("event_type"), col("cnt"))
      .writeStream
      .outputMode("complete")
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
  ): StreamingQuery = {
    val fileSchema: StructType = spark.read.parquet(eventsDir).schema
    val raw = spark.readStream.schema(fileSchema).parquet(eventsDir)
    val events = fileSchema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").cast("timestamp_ntz").as("ws"), col("event_type"), col("cnt"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
  }
}
