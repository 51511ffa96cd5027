package graft

import graft.streaming.TransitionStream
import org.apache.spark.sql.functions._

/** The stateful streaming transition counter must agree with the batch w8
  * matrix when events arrive in event-time order across micro-batches.
  */
class TransitionStreamSpec extends SparkSpec {

  test("stateful streaming transitions == batch w8 across staged micro-batches") {
    val dir     = java.nio.file.Files.createTempDirectory("graft_tr_mb")
    val staging = java.nio.file.Files.createTempDirectory("graft_tr_stage")
    val events  = graft.sources.Tables.events(spark, sf0001)
    // split MID-journey: every user active on both sides of the cut has a
    // cross-batch transition that only the carried state can produce
    val mid = "2024-01-15 00:00:00"
    def stage(cond: org.apache.spark.sql.Column, out: String): Unit = {
      events.where(cond).coalesce(1).write.mode("overwrite").parquet(s"$staging/$out")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(out)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"$out.parquet")
      )
    }
    stage(col("ts") < mid, "b1")
    val q = TransitionStream.transitionsStateful(spark, dir.toString, "transition_mb_sink")
    try {
      q.processAllAvailable()
      stage(col("ts") >= mid, "b2")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark
      .table("transition_mb_sink")
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val batch = graft.operators.CoreQueries
      .w8EventTransitions(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // the cut actually exercised the carry: at least one user exists on
    // both sides, so a purely per-batch fold would have LOST transitions
    val usersBefore =
      events.where(col("ts") < mid).select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val usersAfter =
      events.where(col("ts") >= mid).select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert((usersBefore & usersAfter).nonEmpty, "cut must split at least one journey")
  }

  test("state carry: last event bridges batches, sorting is (ts, event_id)") {
    import TransitionStream._
    val st = new TestGroupState[LastEvent]
    // batch 1: two same-instant events — event_id orders them (5 then 6)
    val out1 = updateUser(
      1L,
      Iterator(TypedEvent(1L, "click", 100L, 6L), TypedEvent(1L, "view", 100L, 5L)),
      st
    ).toSeq
    assert(out1 == Seq(Transition("view", "click")))
    assert(st.get == LastEvent("click", 100L, 6L))
    // batch 2: one event → exactly the cross-batch transition
    val out2 = updateUser(1L, Iterator(TypedEvent(1L, "purchase", 200L, 7L)), st).toSeq
    assert(out2 == Seq(Transition("click", "purchase")))
    // empty batch: no output, state untouched
    assert(updateUser(1L, Iterator.empty, st).isEmpty)
    assert(st.get == LastEvent("purchase", 200L, 7L))
  }

  test("late arrivals ordering at-or-before the saved state are dropped, not applied") {
    import TransitionStream._
    val st = new TestGroupState[LastEvent]
    assert(updateUser(1L, Iterator(TypedEvent(1L, "click", 200L, 7L)), st).isEmpty)
    assert(st.get == LastEvent("click", 200L, 7L))
    // strictly earlier ts, same ts with smaller id, and the state's own
    // (ts, id) — all late; none may emit or regress the state
    val late = Iterator(
      TypedEvent(1L, "view", 100L, 3L),
      TypedEvent(1L, "view", 200L, 6L),
      TypedEvent(1L, "view", 200L, 7L)
    )
    assert(updateUser(1L, late, st).isEmpty)
    assert(st.get == LastEvent("click", 200L, 7L))
    // a mixed batch applies only the in-order suffix: the late row neither
    // emits nor perturbs the transition the fresh row produces
    val out = updateUser(
      1L,
      Iterator(TypedEvent(1L, "view", 150L, 4L), TypedEvent(1L, "purchase", 300L, 9L)),
      st
    ).toSeq
    assert(out == Seq(Transition("click", "purchase")))
    assert(st.get == LastEvent("purchase", 300L, 9L))
  }
}
