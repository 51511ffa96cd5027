package graft

import graft.operators.Funnel
import java.sql.Timestamp

/** Planted-user funnel semantics: stage windows anchor at the FIRST
  * qualifying event of the previous stage, boundaries are inclusive on the
  * window end, and users who skip a stage never reach later ones.
  */
class FunnelSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("w3: stage windows, boundary inclusion, and stage skipping — hand-planted users") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    Seq(
      // u1: completes the funnel inside both windows
      (1L, 1L, "signup", ts("2024-01-01 00:00:00")),
      (2L, 1L, "click", ts("2024-01-01 01:00:00")),
      (3L, 1L, "purchase", ts("2024-01-01 02:00:00")),
      // u2: click 25h after signup — outside the window → signup only
      (4L, 2L, "signup", ts("2024-01-01 00:00:00")),
      (5L, 2L, "click", ts("2024-01-02 01:00:00")),
      // u3: clicks in window, purchase 26h after the click → stops at click
      (6L, 3L, "signup", ts("2024-01-01 00:00:00")),
      (7L, 3L, "click", ts("2024-01-01 01:00:00")),
      (8L, 3L, "purchase", ts("2024-01-02 03:00:00")),
      // u4: no signup — appears nowhere, whatever else it does
      (9L, 4L, "click", ts("2024-01-01 01:00:00")),
      (10L, 4L, "purchase", ts("2024-01-01 02:00:00")),
      // u5: click EXACTLY 24h after signup — window end is inclusive
      (11L, 5L, "signup", ts("2024-01-01 00:00:00")),
      (12L, 5L, "click", ts("2024-01-02 00:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val Array(row) = Funnel.funnelStages(spark, dir).collect()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((4L, 3L, 1L)))
  }

  test("w3: first-touch anchoring — a later in-window click cannot resurrect a dead funnel") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel2").toString
    Seq(
      // the FIRST in-window click (01:00) anchors the purchase window; the
      // purchase lands 30h after it → out, even though a second click at
      // 20:00 would have put the purchase within ITS 24h window
      (1L, 1L, "signup", ts("2024-01-01 00:00:00")),
      (2L, 1L, "click", ts("2024-01-01 01:00:00")),
      (3L, 1L, "click", ts("2024-01-01 20:00:00")),
      (4L, 1L, "purchase", ts("2024-01-02 07:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val Array(row) = Funnel.funnelStages(spark, dir).collect()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((1L, 1L, 0L)))
  }

  test("w3: single-pass form == chained-join form on the real corpus") {
    val a = Funnel.funnelStages(spark, sf0001).collect().map(_.toSeq).toSeq
    val b = Funnel.funnelStagesChained(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("w3: planted pathological bot user — pre-signup click flood cannot evict the qualifying click") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_bot").toString
    // u1 is a bot: 5000 junk clicks BEFORE its first signup, then one
    // qualifying click and purchase. Any capped earliest-N click buffer
    // (N ≤ 5000) would have kept only pre-signup junk and reported a dead
    // funnel; the exact spill-capable form must still see 1/1/1. u2 is a
    // control completing normally.
    val junk = (0 until 5000).map(i => (100L + i, 1L, "click", ts("2024-01-01 00:00:00")))
    val rows = junk ++ Seq(
      (10000L, 1L, "signup", ts("2024-01-02 00:00:00")),
      (10001L, 1L, "click", ts("2024-01-02 01:00:00")),
      (10002L, 1L, "purchase", ts("2024-01-02 02:00:00")),
      (10003L, 2L, "signup", ts("2024-01-01 00:00:00")),
      (10004L, 2L, "click", ts("2024-01-01 01:00:00")),
      (10005L, 2L, "purchase", ts("2024-01-01 02:00:00"))
    )
    rows
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val Array(row) = Funnel.funnelStages(spark, dir).collect()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((2L, 2L, 2L)))
    // and the bounded-state chained twin agrees on the pathological corpus
    val Array(chained) = Funnel.funnelStagesChained(spark, dir).collect()
    assert(row.toSeq == chained.toSeq)
  }
}
