package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cohort retention over the events log — "of the users first seen on day
  * D, how many came back k days later". The companion report to [[Funnel]]:
  * the funnel measures conversion through stages, retention measures return
  * over time. Like w3 it is a behavioral-analytics staple one step past the
  * reference's scan/filter/aggregate surface (`Config/QueryType.cs:3-12`),
  * built from the same primitives.
  */
object Retention {

  /** Offsets past this horizon are cut — a retention report is read as a
    * short curve per cohort, not an unbounded triangle.
    */
  val MaxOffsetDays = 14L

  /** U1 — daily cohort retention counts `(cohort_day, day_offset, n_users)`.
    *
    * ONE shuffle on `user_id` carries the whole computation: the per-user
    * aggregate takes `min(day)` (the cohort) and `collect_set(day)` (the
    * distinct active days) in the same partial-aggregable pass — map-side
    * combine collapses a user's events to its distinct-day set before the
    * exchange, so the shuffle carries at most (corpus day span) dates per
    * user, never raw events, and a bot user with 10⁸ events in a week
    * costs the reducer 7 dates. (This bounded-set shape is why it is NOT
    * the w3 spill problem: days are bounded by the calendar, events are
    * not.) The explode back to (cohort, offset) is narrow, and the second
    * groupBy aggregates a frame already cut to ≤ [[MaxOffsetDays]]+1 rows
    * per user — at 100 TB the second exchange moves (users × active days)
    * pairs, orders of magnitude below the event count.
    */
  def retentionCohorts(spark: SparkSession, dir: String, maxOffsetDays: Long = MaxOffsetDays): DataFrame = {
    val days = Tables
      .events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    days
      .groupBy("user_id")
      .agg(min("day").as("cohort_day"), collect_set("day").as("active_days"))
      .select(col("cohort_day"), explode(col("active_days")).as("day"))
      .select(col("cohort_day"), datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .where(col("day_offset") <= maxOffsetDays)
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** W7 — daily + trailing-7-day distinct active users `(day, n_users_1d,
    * n_users_7d)`: the DAU/WAU pair every engagement dashboard leads with.
    *
    * Spark has no `COUNT(DISTINCT …) OVER (RANGE …)` (distinct aggregates
    * are unsupported in window functions). Two scalable escapes exist and
    * the choice matters: a range-join of the activity frame against a
    * broadcast day grid LOOKS cheap but a non-equi join is nested-loop —
    * O(frame × days) comparisons, quadratic in history length. Instead the
    * log collapses to the distinct (day, user) frame FIRST (one shuffle,
    * the same partial-aggregable collapse u1 rides), and each collapsed row
    * EXPLODES into the ≤ `windowDays` window-anchor
    * days it serves — linear fan-out, equi-keyed groupBy, no join. A
    * window anchored after the last observed day is cut by a 1-row
    * broadcast max-day bound (so the curve ends with the data; windows at
    * corpus start are naturally partial, mirroring a dashboard's ramp-in).
    *
    * The counting is two distinct-free aggregations, NOT two
    * `countDistinct`s over the exploded frame: multiple distinct
    * aggregates plan a Catalyst Expand that restreams the (already
    * windowDays×-exploded) frame once per distinct — the k×-restream cost
    * dq3's scaladoc documents. Collapsing to (anchor day, user) first
    * (partial-aggregable, map-side combinable) leaves a frame of at most
    * users × days rows whose second pass needs no distinct at all: the row
    * itself is the distinct user, and "active on the anchor day" rides
    * along as a max'd flag.
    */
  /** Trailing window width for [[rollingActiveUsers]] — THE definition the
    * oracle's `range(0, N)` must agree with.
    */
  val RollingWindowDays = 7

  /** U2 — new vs returning daily actives `(day, n_new, n_returning)`:
    * the growth-accounting split of w7's DAU (how much of today's traffic
    * is acquisition vs retention). Rides u1's exact shape: ONE user_id
    * shuffle collapses each user to (first day, distinct-day set) with
    * calendar-bounded state, then the explode tags each (user, day) as new
    * (day = cohort day) or returning and a conditional aggregation counts
    * both sides — the log is scanned once and never re-joined.
    */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id")
      .agg(min("day").as("d0"), collect_set("day").as("days"))
      .select(col("d0"), explode(col("days")).as("day"))
      .groupBy("day")
      .agg(
        sum(when(col("day") === col("d0"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("day") =!= col("d0"), 1L).otherwise(0L)).as("n_returning")
      )
      .orderBy("day")

  def rollingActiveUsers(spark: SparkSession, dir: String, windowDays: Int = RollingWindowDays): DataFrame = {
    val events = Tables.events(spark, dir)
    val dayUser = events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val maxDay = events.agg(max(to_date(col("ts"))).as("max_day"))
    dayUser
      .select(
        col("day"),
        col("user_id"),
        explode(expr(s"sequence(day, date_add(day, ${windowDays - 1}))")).as("d")
      )
      .crossJoin(broadcast(maxDay))
      .where(col("d") <= col("max_day"))
      .groupBy("d", "user_id")
      .agg(max(when(col("day") === col("d"), 1L).otherwise(0L)).as("on_d"))
      .groupBy("d")
      .agg(sum("on_d").as("n_users_1d"), count(lit(1)).as("n_users_7d"))
      .select(col("d").as("day"), col("n_users_1d"), col("n_users_7d"))
      .orderBy("day")
  }

  /** U4 — per-user EVENT SEQUENCES: each user's full event-type history as
    * one space-joined string in (ts, event_id) order, plus its length —
    * the behavioral-sequence export a session-LM / next-action-model
    * training run consumes (and the batch twin of the per-user fold the
    * streaming families keep incrementally). Determinism: the collected
    * structs sort by (ts, event_id, event_type), a total order — same-
    * instant events never reorder across runs or engines.
    *
    * Scale shape: ONE user-keyed hash exchange; per-key state is that
    * user's events (the per-entity bound every u/w operator carries — a
    * user's lifetime event count, not the corpus). collect_list here is
    * the POINT of the operator (the sequence IS the output), not
    * aggregation state smuggling — the output row count equals the user
    * count and each row is one training example.
    */
  def userEventSequences(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        array_join(
          expr("transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)"),
          " "
        ).as("seq")
      )
      .orderBy("user_id")

  /** U3 — RFM segmentation of the order book: per customer the classic
    * recency (days since last order, measured from the corpus's max order
    * date), frequency (order count) and monetary (lifetime spend in
    * cents) triple, each quartile-bucketed 1–4.
    *
    * The bucketing is deliberately NOT `ntile` — a global ntile is a
    * single-partition window over every customer (the exact scale smell
    * this repo pins plans against). Instead: one customer-key shuffle
    * aggregates the triple, one scalar aggregate computes the three
    * quartile cut-points per dimension (`percentile` is an aggregate, not
    * a sort), and bucket assignment is a broadcast-join + map-side
    * comparison `1 + Σ (v > qᵢ)`. At 10⁸ customers nothing in the plan
    * exceeds one hash exchange; for f/m, ties sit deterministically in
    * the lower bucket on both engines (strict `>` against identical
    * interpolated cut-points — Spark `percentile` and DuckDB
    * `quantile_cont` share the (n−1)·p linear-interpolation definition,
    * the parity x2 established). The inverted recency bucket flips that
    * rule: `4 − Σ (recency_days > qᵢ)` means a value equal to a
    * cut-point is NOT subtracted, so recency cut-point ties land in the
    * HIGHER score — identically on both engines, for the same strict-`>`
    * reason.
    *
    * Bucket orientation follows RFM convention: ALL three buckets grow
    * with customer value — `r_bucket` is 4 for the MOST RECENT quartile
    * (recency is a "days since" measure, so its comparison is inverted:
    * `4 − Σ (recency_days > qᵢ)`), while `f_bucket`/`m_bucket` are 4 for
    * the most frequent / highest-spending quartile.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val cust = o
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"),
        (sum(col("o_totalprice").cast("decimal(12,2)")) * 100).cast("long").as("monetary_cents")
      )
    val dmax = o.agg(max(col("o_orderdate")).as("d_max"))
    val base = cust
      .crossJoin(broadcast(dmax))
      .withColumn(
        "recency_days",
        datediff(col("d_max").cast("date"), col("last_order").cast("date")).cast("long")
      )
      .select("custkey", "recency_days", "n_orders", "monetary_cents")
    val cuts = base.agg(
      expr("percentile(recency_days, array(0.25D, 0.5D, 0.75D))").as("rq"),
      expr("percentile(n_orders, array(0.25D, 0.5D, 0.75D))").as("fq"),
      expr("percentile(monetary_cents, array(0.25D, 0.5D, 0.75D))").as("mq")
    )
    def bucket(v: String, q: String) =
      expr(
        s"CAST(1 + (CASE WHEN $v > $q[0] THEN 1 ELSE 0 END) " +
          s"+ (CASE WHEN $v > $q[1] THEN 1 ELSE 0 END) " +
          s"+ (CASE WHEN $v > $q[2] THEN 1 ELSE 0 END) AS BIGINT)"
      )
    // Recency scores INVERTED (4 = most recent): same strict-> tie rule,
    // subtracted from 4 instead of added to 1.
    def bucketInv(v: String, q: String) =
      expr(
        s"CAST(4 - (CASE WHEN $v > $q[0] THEN 1 ELSE 0 END) " +
          s"- (CASE WHEN $v > $q[1] THEN 1 ELSE 0 END) " +
          s"- (CASE WHEN $v > $q[2] THEN 1 ELSE 0 END) AS BIGINT)"
      )
    base
      .crossJoin(broadcast(cuts))
      .select(
        col("custkey"),
        col("recency_days"),
        col("n_orders"),
        col("monetary_cents"),
        bucketInv("recency_days", "rq").as("r_bucket"),
        bucket("n_orders", "fq").as("f_bucket"),
        bucket("monetary_cents", "mq").as("m_bucket")
      )
      .orderBy("custkey")
  }
}
