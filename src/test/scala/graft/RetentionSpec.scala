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

  test("u3: RFM quartile buckets by hand — four customers land 1..4 on every axis") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rfm").toString
    def order(k: Long, cust: Long, price: Double, date: String) =
      (k, cust, "O", price, ts(date + " 00:00:00"), "1-URGENT")
    Seq(
      order(1L, 1L, 10.0, "2024-01-31"),                                  // r=0  f=1 m=1000
      order(2L, 2L, 20.0, "2024-01-21"), order(3L, 2L, 20.0, "2024-01-11"), // r=10 f=2 m=4000
      order(4L, 3L, 30.0, "2024-01-11"), order(5L, 3L, 30.0, "2024-01-05"),
      order(6L, 3L, 30.0, "2024-01-02"),                                  // r=20 f=3 m=9000
      order(7L, 4L, 40.0, "2024-01-01"), order(8L, 4L, 40.0, "2024-01-01"),
      order(9L, 4L, 40.0, "2024-01-01"), order(10L, 4L, 40.0, "2024-01-01") // r=30 f=4 m=16000
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Retention.rfmSegments(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq
    // distinct values on every axis → the interpolated quartile cut-points
    // fall strictly between adjacent values and each customer gets its rank;
    // r_bucket is inverted per RFM convention (most recent scores 4)
    assert(got == Seq(
      (1L, 0L, 1L, 1000L, 4L, 1L, 1L),
      (2L, 10L, 2L, 4000L, 3L, 2L, 2L),
      (3L, 20L, 3L, 9000L, 2L, 3L, 3L),
      (4L, 30L, 4L, 16000L, 1L, 4L, 4L)
    ))
  }

  test("u3: real corpus — buckets stay in 1..4 and are monotone in their measure") {
    val rows = Retention.rfmSegments(spark, sf0001)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, rb, fb, mb) => Seq(rb, fb, mb).forall(b => b >= 1 && b <= 4) })
    // bucket order must follow value order on each axis — except recency,
    // whose score is inverted (staler customers score LOWER)
    def monotone(pairs: Seq[(Long, Long)]): Boolean =
      pairs.sortBy(_._1).sliding(2).forall { case Seq((_, b1), (_, b2)) => b1 <= b2; case _ => true }
    assert(monotone(rows.map(r => (r._1, -r._4)).toSeq), "recency buckets")
    assert(monotone(rows.map(r => (r._2, r._5)).toSeq), "frequency buckets")
    assert(monotone(rows.map(r => (r._3, r._6)).toSeq), "monetary buckets")
  }

  test("u4: sequences come out in (ts, event_id) order — same-instant ties by id; lengths reconcile") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_useq").toString
    // user 1: out-of-insertion-order rows + a same-instant tie (ids 4 < 5)
    Seq(
      (5L, 1L, "purchase", ts("2024-01-02 00:00:00")),
      (4L, 1L, "click", ts("2024-01-02 00:00:00")),
      (1L, 1L, "view", ts("2024-01-01 00:00:00")),
      (9L, 2L, "view", ts("2024-01-03 00:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Retention.userEventSequences(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 3L, "view click purchase"), (2L, 1L, "view")))
    // real corpus: row per user, n_events reconciles with the raw count
    val rows  = Retention.userEventSequences(spark, sf0001).collect()
    val total = graft.sources.Tables.events(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.forall(r => r.getString(2).split(" ").length.toLong == r.getLong(1)))
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
