package graft

import graft.operators.Retention
import java.sql.Timestamp

/** Cohort retention semantics: cohort = first active DAY, a day counts once
  * however many events it holds, offsets past the horizon are cut, and
  * every cohort's offset-0 row counts the whole cohort.
  */
class RetentionSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("u1: hand-planted cohorts — day dedup, offset cap, cohort anchoring") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_retention").toString
    Seq(
      // u1: cohort 01-01, returns day 1 and day 3; three events on day 0
      // must still count the day once
      (1L, 1L, "click", ts("2024-01-01 01:00:00")),
      (2L, 1L, "click", ts("2024-01-01 02:00:00")),
      (3L, 1L, "view", ts("2024-01-01 23:59:59")),
      (4L, 1L, "click", ts("2024-01-02 12:00:00")),
      (5L, 1L, "click", ts("2024-01-04 00:00:00")),
      // u2: cohort 01-02, never returns
      (6L, 2L, "view", ts("2024-01-02 09:00:00")),
      // u3: cohort 01-01, also active at offset 20 — past the 14-day
      // horizon, so that day must be cut while offset 0 survives
      (7L, 3L, "click", ts("2024-01-01 05:00:00")),
      (8L, 3L, "click", ts("2024-01-21 05:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Retention
      .retentionCohorts(spark, dir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(
      got == Map(
        ("2024-01-01", 0L) -> 2L, // u1 + u3
        ("2024-01-01", 1L) -> 1L, // u1
        ("2024-01-01", 3L) -> 1L, // u1
        ("2024-01-02", 0L) -> 1L  // u2
      )
    )
  }

  test("w7: rolling window spans gaps, cuts at the last observed day, and counts distinct once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rolling").toString
    Seq(
      (1L, 1L, "click", ts("2024-01-01 01:00:00")),
      (2L, 2L, "view", ts("2024-01-01 02:00:00")),
      (3L, 1L, "click", ts("2024-01-02 03:00:00")),
      (4L, 1L, "click", ts("2024-01-02 04:00:00")), // same user+day twice → once
      (5L, 3L, "click", ts("2024-01-10 05:00:00"))  // after an 8-day gap
    ).toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Retention
      .rollingActiveUsers(spark, dir)
      .collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got("2024-01-01") == ((2L, 2L)))
    assert(got("2024-01-02") == ((1L, 2L)))
    // gap days are still window anchors while served by trailing activity…
    (3 to 7).foreach(d => assert(got(f"2024-01-0$d%d") == ((0L, 2L)), s"day $d"))
    assert(got("2024-01-08") == ((0L, 1L))) // 01-01 aged out, only 01-02's user
    // …but an anchor served by nothing is absent, and the curve cuts at max(day)
    assert(!got.contains("2024-01-09"))
    assert(got("2024-01-10") == ((1L, 1L)))
    assert(!got.contains("2024-01-11"))
    assert(got.size == 9)
  }

  test("u2: new/returning split reconciles with u1 cohorts and w7's daily actives") {
    val rows = Retention
      .newVsReturning(spark, sf0001)
      .collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // n_new per day IS u1's offset-0 cohort size
    val cohort0 = Retention
      .retentionCohorts(spark, sf0001)
      .collect()
      .collect { case r if r.getLong(1) == 0L => r.getDate(0).toString -> r.getLong(2) }
      .toMap
    cohort0.foreach { case (d, n) => assert(rows(d)._1 == n, s"day $d new != cohort size") }
    // new + returning = w7's n_users_1d on the days w7 reports activity
    val dau = Retention
      .rollingActiveUsers(spark, sf0001)
      .collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
      .toMap
    rows.foreach { case (d, (nw, rt)) => assert(dau(d) == nw + rt, s"day $d DAU mismatch") }
    assert(rows.values.exists(_._2 > 0L), "corpus must contain returning users")
  }

  test("u1: offset-0 dominates every later offset per cohort (real corpus)") {
    val rows = Retention
      .retentionCohorts(spark, sf0001)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    val day0 = rows.collect { case (c, 0L, n) => c -> n }.toMap
    // every cohort has an offset-0 row (each user is active on their first
    // day), and no later offset can exceed it
    assert(rows.map(_._1).distinct.forall(day0.contains))
    assert(rows.forall { case (c, _, n) => n <= day0(c) })
    assert(rows.nonEmpty)
  }
}
