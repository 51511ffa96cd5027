package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming twin of [[graft.operators.CoreQueries.w8EventTransitions]]:
  * emit each user's consecutive (prev_type → event_type) transition pairs
  * across micro-batches with `flatMapGroupsWithState`.
  *
  * State per user is the LAST event only (type + its (ts, event_id) order
  * key — 3 fields), O(users) like [[FunnelStream]]/[[Sessionize]]: a
  * transition needs exactly one event of memory, which is why the Markov
  * summary streams so cheaply while the batch form pays a full sort
  * window. Within a batch events sort by the batch operator's (ts,
  * event_id) key; the cross-batch contract is the usual one (in-order
  * arrival per user, what a watermark-delayed replay provides — the spec
  * models it by splitting journeys mid-stream and asserting stream ≡
  * batch). The contract is ENFORCED, not assumed: an event ordering
  * at-or-before the saved state key is a late arrival and is dropped
  * rather than emitting a wrong-direction transition (spec-pinned).
  */
object TransitionStream {

  final case class TypedEvent(user_id: Long, event_type: String, tsMicros: Long, event_id: Long)

  final case class LastEvent(event_type: String, tsMicros: Long, event_id: Long)

  final case class Transition(prev_type: String, event_type: String)

  private[graft] def updateUser(
      userId: Long,
      events: Iterator[TypedEvent],
      state: GroupState[LastEvent]
  ): Iterator[Transition] = {
    // The saved (tsMicros, event_id) key GUARDS the in-order contract: an
    // event arriving in a later micro-batch but ordering at-or-before the
    // state would emit a wrong-direction transition and regress the state.
    // Such late arrivals are dropped — the same watermark-violation stance
    // as Spark's own late-row handling (skip, never corrupt state).
    val stateKey = state.getOption.map(l => (l.tsMicros, l.event_id))
    val evs = events.toArray
      .filter(e => stateKey.forall { case (ts, id) => e.tsMicros > ts || (e.tsMicros == ts && e.event_id > id) })
      .sortBy(e => (e.tsMicros, e.event_id))
    if (evs.isEmpty) Iterator.empty
    else {
      val out  = Seq.newBuilder[Transition]
      var prev = state.getOption.map(l => (l.event_type, l.tsMicros, l.event_id))
      evs.foreach { e =>
        prev.foreach { case (pt, _, _) => out += Transition(pt, e.event_type) }
        prev = Some((e.event_type, e.tsMicros, e.event_id))
      }
      prev.foreach { case (pt, ts, id) => state.update(LastEvent(pt, ts, id)) }
      out.result().iterator
    }
  }

  /** Streaming transition pairs over a directory of event parquet files;
    * append-mode memory sink — each emitted row is one transition, so the
    * sink's groupBy count IS the batch operator's matrix.
    */
  def transitionsStateful(
      spark: SparkSession,
      eventsDir: String,
      sinkTable: String
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val events: Dataset[TypedEvent] = EventStream
      .streamingEvents(spark, eventsDir)
      .select(
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("tsMicros"),
        col("event_id")
      )
      .as[TypedEvent]

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
