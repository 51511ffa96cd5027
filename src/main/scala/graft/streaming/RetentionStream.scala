package graft.streaming

import graft.operators.Retention
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming twin of [[graft.operators.Retention.retentionCohorts]]
  * (u1): emit each user's NEW (cohort_day, day_offset) pair the first time
  * that offset is observed, across micro-batches, with
  * `flatMapGroupsWithState` — the sink's groupBy count IS the batch
  * retention matrix.
  *
  * State per user is TWO fields: the cohort day (first active day) and a
  * bitmask of the ≤ [[Retention.MaxOffsetDays]]+1 offsets already emitted
  * — strictly smaller than [[FunnelStream]]'s three anchors and, like
  * u1's collect_set, calendar-bounded: a bot user with 10⁸ events in a
  * week still costs one int and one long. Offsets past the horizon are
  * neither stored nor emitted (u1's cut applied at the state layer, which
  * is what keeps the mask a single long). Each (user, offset) emits
  * exactly once, so the output stream is append-mode and the sink
  * aggregation never retracts.
  *
  * Cross-batch contract: in-order arrival per user (watermark-delayed
  * replay), ENFORCED like [[TransitionStream]] — a day arriving EARLIER
  * than the saved cohort day is a late arrival and is dropped rather than
  * silently rewriting the user's cohort (which would corrupt every offset
  * already emitted). The spec models the contract by splitting journeys
  * mid-stream and asserting stream ≡ batch.
  */
object RetentionStream {

  final case class DayEvent(user_id: Long, epochDay: Int)

  /** firstDay = the user's cohort day (days since 1970-01-01); offsetMask
    * bit k = offset k already emitted.
    */
  final case class RetState(firstDay: Int, offsetMask: Long)

  final case class CohortHit(cohort_day: Int, day_offset: Long)

  private[graft] def updateUser(
      userId: Long,
      events: Iterator[DayEvent],
      state: GroupState[RetState]
  ): Iterator[CohortHit] = {
    val days = events.map(_.epochDay).toArray.distinct.sorted
    if (days.isEmpty) Iterator.empty
    else {
      val out = Seq.newBuilder[CohortHit]
      var st  = state.getOption
      days.foreach { d =>
        st match {
          case None =>
            st = Some(RetState(d, 1L))
            out += CohortHit(d, 0L)
          case Some(RetState(f, m)) =>
            val off = (d - f).toLong
            // off < 0: late arrival (guard, see scaladoc); off > horizon:
            // u1's offset cut — not stored, keeping the mask one long
            if (off >= 0 && off <= Retention.MaxOffsetDays && (m & (1L << off)) == 0L) {
              st = Some(RetState(f, m | (1L << off)))
              out += CohortHit(f, off)
            }
        }
      }
      st.foreach(state.update)
      out.result().iterator
    }
  }

  /** Streaming retention hits over a directory of event parquet files;
    * append-mode memory sink — `GROUP BY cohort_day, day_offset COUNT(*)`
    * over the sink reproduces u1.
    */
  def retentionStateful(
      spark: SparkSession,
      eventsDir: String,
      sinkTable: String
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val events: Dataset[DayEvent] = EventStream
      .streamingEvents(spark, eventsDir)
      .select(
        col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).as("epochDay")
      )
      .as[DayEvent]

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
