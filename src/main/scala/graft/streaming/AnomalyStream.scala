package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Stateful streaming twin of the w10 hourly anomaly rule
  * ([[graft.operators.CoreQueries.w10HourlyAnomalies]]): alert when an
  * hour's event count exceeds 2× the median of the previous 7 OBSERVED
  * hourly counts — the rule evaluated live, as hours close, instead of over
  * the finished table.
  *
  * The state is EXACTLY what the batch `rowsBetween(-7, -1)` window carries
  * implicitly: the currently-open hour's running count plus the last 7
  * closed (hour, cnt) pairs — 8 small tuples TOTAL, regardless of stream
  * length. An hour closes (and its alert decision becomes final, append
  * semantics) when the stream first observes a LATER hour; the trailing
  * median is over observed hours, matching the batch frame's row-based
  * window (hours with zero events are absent from both).
  *
  * The collapse is global (one logical key), like the batch groupBy(hour) —
  * the per-batch data volume through the single group is the twin-scale
  * caveat; the production shape pre-aggregates each micro-batch to
  * (hour, partial_cnt) upstream so only hour-counts reach the stateful
  * fold. Exact when events arrive in event-time order across micro-batches
  * (sorted within a batch here) — the same replay contract as
  * [[AsOfStream]] / [[FunnelStream]]; an event older than the open hour
  * arrives too late to change an already-final decision and is dropped
  * (documented, spec-pinned).
  */
object AnomalyStream {

  final case class TsEvent(tsMicros: Long)

  final case class HourCnt(hour: Long, cnt: Long)

  /** Open-hour accumulator + trailing closed hours (≤7, oldest first). */
  final case class AnomState(openHour: Long, openCnt: Long, trail: List[HourCnt])

  final case class Alert(hour: Long, cnt: Long, med: Long)

  private val HourMicros = 3600L * 1000000L

  private[graft] def updateAll(
      key: Int,
      events: Iterator[TsEvent],
      state: GroupState[AnomState]
  ): Iterator[Alert] = {
    val evs = events.toArray.sortBy(_.tsMicros)
    var st  = state.getOption.orNull
    val out = scala.collection.mutable.ArrayBuffer.empty[Alert]
    evs.foreach { e =>
      val h = Math.floorDiv(e.tsMicros, HourMicros) * HourMicros
      if (st == null) st = AnomState(h, 1L, Nil)
      else if (h == st.openHour) st = st.copy(openCnt = st.openCnt + 1)
      else if (h > st.openHour) {
        // the open hour closes: its alert decision is final (append mode)
        if (st.trail.length == 7) {
          val med = st.trail.map(_.cnt).sorted.apply(3) // batch's element_at(sort_array, 4)
          if (st.openCnt > med * 2) out += Alert(st.openHour, st.openCnt, med)
        }
        val trail2 = (st.trail :+ HourCnt(st.openHour, st.openCnt)).takeRight(7)
        st = AnomState(h, 1L, trail2)
      }
      // h < openHour: late beyond the open hour — the decision it would
      // feed is already final; dropped by contract
    }
    if (st != null) state.update(st)
    out.iterator
  }

  /** Streaming w10 over a directory of event parquet files; append-mode
    * memory sink accumulates alerts for CLOSED hours (hour as epoch-µs).
    */
  def hourlyAnomaliesStateful(
      spark: SparkSession,
      eventsDir: String,
      sinkTable: String
  ): StreamingQuery = {
    import spark.implicits._
    val events: Dataset[TsEvent] = EventStream
      .streamingEvents(spark, eventsDir)
      .select(unix_micros(col("ts")).as("tsMicros"))
      .as[TsEvent]

    events
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(updateAll)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
      .start()
  }
}
