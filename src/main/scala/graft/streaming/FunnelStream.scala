package graft.streaming

import graft.operators.Funnel
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming twin of [[graft.operators.Funnel]]: track each user's
  * funnel progress (signup → click → purchase, [[Funnel.StageWindowHours]]
  * between stages) across micro-batches with `flatMapGroupsWithState`.
  *
  * State per user is exactly the three stage anchors (3 longs) — O(users),
  * never O(events), the same bound as [[Sessionize]]. Anchors only ever set
  * once ("first qualifying event", the batch operator's first-touch rule),
  * so the fold is idempotent per event and exact when events arrive in
  * event-time order across batches (within a batch they are sorted here;
  * cross-batch reordering is the usual streaming caveat — production fronts
  * this with a watermark-delayed, time-ordered replay, which is what the
  * staged-arrival spec models).
  */
object FunnelStream {

  final case class FunnelEvent(user_id: Long, event_type: String, tsMicros: Long)

  /** Long.MinValue = anchor unset. */
  final case class FunnelState(sT: Long, cT: Long, pT: Long)

  /** Highest stage reached: 0 none, 1 signup, 2 +click, 3 +purchase. */
  final case class UserStage(user_id: Long, stage: Int)

  private val Unset = Long.MinValue

  /** Same-timestamp events fold in stage order (signup before click before
    * purchase) so strict `>` window comparisons match the batch operator.
    */
  private val stageRank: Map[String, Int] = Funnel.StageTypes.zipWithIndex.toMap

  private[graft] def updateUser(
      userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]
  ): Iterator[UserStage] = {
    val evs = events.toArray.sortBy(e => (e.tsMicros, stageRank.getOrElse(e.event_type, 3)))
    if (evs.isEmpty) Iterator.empty
    else {
      val W       = Funnel.WindowMicros
      val st      = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
      var (s, c, p) = (st.sT, st.cT, st.pT)
      evs.foreach { e =>
        e.event_type match {
          case "signup"   => if (s == Unset) s = e.tsMicros
          case "click"    => if (c == Unset && s != Unset && e.tsMicros > s && e.tsMicros <= s + W) c = e.tsMicros
          case "purchase" => if (p == Unset && c != Unset && e.tsMicros > c && e.tsMicros <= c + W) p = e.tsMicros
          case _          =>
        }
      }
      state.update(FunnelState(s, c, p))
      val stage = if (p != Unset) 3 else if (c != Unset) 2 else if (s != Unset) 1 else 0
      Iterator.single(UserStage(userId, stage))
    }
  }

  /** Streaming per-user funnel stages over a directory of event parquet
    * files; update-mode memory sink — the latest row per user is their
    * current stage.
    */
  def funnelStagesStateful(
      spark: SparkSession,
      eventsDir: String,
      sinkTable: String
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val events: Dataset[FunnelEvent] = EventStream
      .streamingEvents(spark, eventsDir)
      .where(col("event_type").isInCollection(Funnel.StageTypes))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tsMicros"))
      .as[FunnelEvent]

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
