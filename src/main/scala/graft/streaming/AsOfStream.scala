package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Stateful streaming twin of the a1 as-of join
  * ([[graft.operators.AsOf.purchaseAsofClick]]): for every purchase, the
  * latest click by the same user at-or-before it, matched across
  * micro-batches with `flatMapGroupsWithState`.
  *
  * The state per user is EXACTLY what the batch window's running
  * `last(value, ignoreNulls)` carries implicitly — one (ts, click_id) pair,
  * O(users) total, never O(events). The fold reproduces the batch
  * operator's total order: within a batch, events sort by (ts, side) with
  * clicks before purchases at equal ts (inclusive `<=` match), and a
  * same-instant click replaces the stored one only when its event_id is
  * SMALLER (the a5-style min-id tie totalization the batch side encodes as
  * `__ord = -event_id`). Each purchase emits at most one match, exactly
  * once, so append mode fits — matches are facts, never revised.
  *
  * Exact when events arrive in event-time order across batches (within a
  * batch they are sorted here) — the same contract as [[FunnelStream]] /
  * [[TransitionStream]]: production fronts this with a watermark-delayed,
  * time-ordered replay, which is what the staged-arrival spec models. A
  * click arriving late (behind a purchase already processed) cannot revise
  * the emitted match; a late click older than the stored one is correctly
  * ignored (it could never win the running `last`).
  */
object AsOfStream {

  final case class AsOfEvent(user_id: Long, event_type: String, event_id: Long, tsMicros: Long)

  /** The running "latest click" — the window state made explicit. */
  final case class LastClick(ts: Long, id: Long)

  final case class AsOfMatch(purchase_id: Long, click_id: Long)

  private[graft] def updateUser(
      userId: Long,
      events: Iterator[AsOfEvent],
      state: GroupState[LastClick]
  ): Iterator[AsOfMatch] = {
    // batch-window total order: clicks sort before purchases at equal ts
    val evs = events.toArray.sortBy(e => (e.tsMicros, if (e.event_type == "click") 0 else 1))
    var st  = state.getOption.orNull
    val out = scala.collection.mutable.ArrayBuffer.empty[AsOfMatch]
    evs.foreach { e =>
      if (e.event_type == "click") {
        if (st == null || e.tsMicros > st.ts || (e.tsMicros == st.ts && e.event_id < st.id))
          st = LastClick(e.tsMicros, e.event_id)
      } else if (e.event_type == "purchase") {
        if (st != null) out += AsOfMatch(e.event_id, st.id)
      }
    }
    if (st != null) state.update(st)
    out.iterator
  }

  /** Streaming purchase-asof-click over a directory of event parquet files;
    * append-mode memory sink accumulates the match stream.
    */
  def purchaseAsofClickStateful(
      spark: SparkSession,
      eventsDir: String,
      sinkTable: String
  ): StreamingQuery = {
    import spark.implicits._
    val events: Dataset[AsOfEvent] = EventStream
      .streamingEvents(spark, eventsDir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"), col("event_id"), unix_micros(col("ts")).as("tsMicros"))
      .as[AsOfEvent]

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(updateUser)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
  }
}
