package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization: split each user's event stream into sessions separated by
  * >30-minute gaps. Exposed twice with a stream≡batch spec tying them
  * together:
  *
  *   - [[sessionCountsBatch]] (oracle-checked): lag/cumulative-sum windows —
  *     one shuffle on user_id, deterministic tie-break by event_id.
  *   - [[sessionCountsStateful]]: `flatMapGroupsWithState` keeping per-user
  *     state across micro-batches — the custom-state rung of the streaming
  *     surface. State is one (lastTs, count) pair per user: O(users), not
  *     O(events), which is what bounds memory on an unbounded stream.
  */
object Sessionize {

  val GapMicros: Long = 30L * 60 * 1000 * 1000 // 30 min in µs

  /** W2 — sessions per user, batch form: session starts where the gap from
    * the previous event exceeds 30 min; count = sum of session starts.
    */
  def sessionCountsBatch(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables
      .events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(
          col("prev_ts").isNull ||
            (unix_micros(col("ts").cast("timestamp")) - unix_micros(col("prev_ts").cast("timestamp"))) > GapMicros,
          1L
        ).otherwise(0L)
      )
      .groupBy("user_id")
      .agg(sum("new_session").as("n_sessions"))
      .orderBy("user_id")
  }

  final case class SessionEvent(user_id: Long, tsMicros: Long)
  final case class UserSessions(lastTs: Long, sessions: Long)
  final case class SessionCount(user_id: Long, n_sessions: Long)

  /** Per-group state transition: fold this batch's (sorted) events into the
    * running (lastTs, sessionCount) state and emit the updated count.
    */
  private[graft] def updateUser(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[UserSessions]
  ): Iterator[SessionCount] = {
    val sorted = events.map(_.tsMicros).toArray.sorted
    if (sorted.isEmpty) Iterator.empty
    else {
      var (last, n) =
        state.getOption.map(s => (s.lastTs, s.sessions)).getOrElse((Long.MinValue, 0L))
      sorted.foreach { t =>
        if (last == Long.MinValue || t - last > GapMicros) n += 1
        last = t
      }
      state.update(UserSessions(last, n))
      Iterator.single(SessionCount(userId, n))
    }
  }

  /** Streaming form over a directory of event parquet files. Update-mode
    * memory sink: latest row per user is the running session count.
    */
  def sessionCountsStateful(
      spark: SparkSession,
      eventsDir: String,
      sinkTable: String
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val events: Dataset[SessionEvent] = EventStream
      .streamingEvents(spark, eventsDir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"))
      .as[SessionEvent]

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateUser)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(sinkTable)
      .start()
  }
}
