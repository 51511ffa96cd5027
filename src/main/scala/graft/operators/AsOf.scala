package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — the time-series operator the reference
  * lacks entirely (SURVEY §1.1: "no asof, no interval joins") and Spark SQL
  * has no built-in for.
  *
  * Composed from built-ins per the preference order (compose > custom
  * Expression > custom plan node): tag and UNION both sides, then one
  * `last(value, ignoreNulls)` running window per key — each left row picks
  * up the latest right row with `right.ts <= left.ts`.
  *
  * Scale shape: ONE shuffle (the window's hash partition on the key) over
  * left+right, no pairwise anything, state = one running value per key
  * during the sorted scan. This is the plan an interval self-join would
  * need a range-join optimizer for, obtained by construction instead.
  */
object AsOf {

  /** Generic as-of join: for each row of `left`, attach `rightVal` from the
    * latest `right` row with the same `key` and `right.ts <= left.ts`
    * (inclusive). Inner semantics: left rows with no prior right row drop.
    * `right` must be unique per (key, ts) for deterministic results — true
    * for event streams keyed at µs/ns precision.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      leftId: String,
      rightVal: String
  ): DataFrame = {
    val l = left.select(
      col(key),
      col(ts),
      lit(1).as("__side"),
      lit(0L).as("__ord"),
      col(leftId).as("__left_id"),
      lit(null).cast(right.schema(rightVal).dataType).as("__rv")
    )
    val r = right.select(
      col(key),
      col(ts),
      lit(0).as("__side"),
      lit(0L).as("__ord"),
      lit(null).cast(left.schema(leftId).dataType).as("__left_id"),
      col(rightVal).as("__rv")
    )
    runAsofWindow(l.unionByName(r), key, ts)
      .select(col("__left_id").as(leftId), col("__match").as(rightVal), col(key), col(ts))
  }

  /** THE as-of matching core, shared by the two-table and fused-self paths
    * so the semantics cannot diverge: right rows (`__side` 0) sort before
    * left rows at equal ts ⇒ inclusive (<=) match; running `last` picks the
    * latest right value; left rows with no prior right drop (inner).
    * Expects columns `__side`, `__ord`, `__left_id`, `__rv`.
    *
    * `__ord` makes the ordering TOTAL among right rows that share a
    * timestamp: without it the window sort is ambiguous at equal (ts,
    * __side) and `last()` returns whichever same-instant right row the
    * shuffle happened to place last — nondeterministic across runs and
    * divergent from an oracle that pins a tie rule. The row with the
    * MAXIMUM `__ord` sorts last and wins, so callers encode "minimum
    * event_id on a timestamp tie" (the a5 oracle's rule) as `-event_id`.
    * Left rows carry a constant: their relative order cannot change any
    * row's own running `last`.
    */
  private def runAsofWindow(tagged: DataFrame, key: String, ts: String): DataFrame = {
    val w = Window
      .partitionBy(key)
      .orderBy(col(ts), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1 && col("__match").isNotNull)
  }

  /** Single-scan as-of for the SELF-JOIN case (both sides are row subsets
    * of ONE table): instead of filtering the table twice and unioning two
    * scans — which reads the table twice at any scale — tag each row with
    * its side in one pass and run the same running-`last` window. `isLeft`
    * picks the left side; rows satisfying neither predicate must be
    * filtered out by the caller before the call. Identical window
    * semantics to [[asofJoin]] (right rows order before left at equal ts ⇒
    * inclusive match); exactly one scan + one window shuffle.
    */
  private def asofJoinFusedSelf(
      e: DataFrame,
      key: String,
      ts: String,
      isLeft: org.apache.spark.sql.Column,
      leftId: org.apache.spark.sql.Column,
      rightVal: org.apache.spark.sql.Column,
      rightOrd: org.apache.spark.sql.Column
  ): DataFrame = {
    val tagged = e.select(
      col(key),
      col(ts),
      when(isLeft, 1).otherwise(0).as("__side"),
      when(isLeft, lit(0L)).otherwise(rightOrd.cast("long")).as("__ord"),
      when(isLeft, leftId).as("__left_id"),
      when(!isLeft, rightVal).as("__rv")
    )
    runAsofWindow(tagged, key, ts)
      .select(col("__left_id"), col("__match"), col(key), col(ts))
  }

  /** A2 — interval self-join, banded: count pairs of events by the same
    * user within 5 minutes of each other. A naive range join is O(n²) per
    * user; banding buckets each event into ⌊ts/5min⌋ and joins bucket
    * b with {b, b+1} — every qualifying pair shares-or-neighbors a bucket
    * (complete by construction), and the join is a plain equi-join on
    * (user, bucket) whose fan-out is bounded by bucket occupancy. This is
    * the interval-join shape Spark lacks an optimizer rule for, obtained
    * by construction — same trick streaming interval joins use.
    */
  def intervalPairCount(spark: SparkSession, dir: String, gapSeconds: Long = 300L): DataFrame =
    // no distinct needed: b.bucket is a single value and the three probe
    // buckets are distinct, so each qualifying pair matches exactly once —
    // the count stays a cheap partial aggregate with no pair-level shuffle
    intervalPairs(spark, dir, gapSeconds).agg(count(lit(1)).as("pair_cnt"))

  /** The pair ENUMERATION under a2's banded join — one definition for the
    * count above and for the stream-stream twin's differential
    * ([[graft.streaming.IntervalJoinStream]]).
    */
  def intervalPairs(spark: SparkSession, dir: String, gapSeconds: Long = 300L): DataFrame = {
    val events    = Tables.eventsRaw(spark, dir)
    val gapMicros = gapSeconds * 1000000L
    val e = events.select(col("event_id"), col("user_id"), Tables.tsMicrosCol(events).as("tus"))
      .withColumn("bucket", (col("tus") / gapMicros).cast("long"))
    // pair orientation is by event_id (not time), so the partner's bucket
    // can be one below OR one above: |Δts| <= gap ⇒ bucket(b) ∈
    // {bucket(a)−1, bucket(a), bucket(a)+1} — probe all three (complete)
    val probe = e.withColumn(
      "jb",
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1))
    )
    val pairs = probe
      .as("a")
      .join(e.as("b"), col("a.user_id") === col("b.user_id") && col("a.jb") === col("b.bucket"))
      .where(
        col("a.event_id") < col("b.event_id") &&
          abs(col("a.tus") - col("b.tus")) <= gapMicros
      )
      .select(col("a.event_id").as("a_event_id"), col("b.event_id").as("b_event_id"))
    pairs
  }

  /** A1 — for every purchase event, the most recent prior (or simultaneous)
    * click by the same user. Oracle: DuckDB's native ASOF JOIN. Both sides
    * are subsets of `events`, so the fused single-scan path applies: one
    * pushed `event_type IN (click, purchase)` scan instead of two scans
    * unioned (2× the table read at 100 TB). The generic two-table
    * [[asofJoin]] remains for genuinely distinct inputs.
    */
  def purchaseAsofClick(spark: SparkSession, dir: String): DataFrame =
    purchaseAsofClickOn(Tables.eventsRaw(spark, dir)) // raw ts: ordering-equivalent, no per-row conversion

  /** A6 — a1 over the USER-BUCKETED events layout
    * ([[graft.sources.BucketedFacts.eventsByUser]]): identical semantics
    * and oracle, but the scan itself reports HashPartitioning(user_id),
    * so the as-of window runs with ZERO exchange — the full-log shuffle
    * that dominates every per-user operator at 100 TB is paid once at
    * ingest instead of per query. PlanShapeSpec asserts the exchange-free
    * plan; the a1 twin pins result equality.
    */
  def purchaseAsofClickBucketed(spark: SparkSession, dir: String): DataFrame =
    purchaseAsofClickOn(spark.table(graft.sources.BucketedFacts.eventsByUser(spark, dir)))

  private def purchaseAsofClickOn(events: DataFrame): DataFrame =
    asofJoinFusedSelf(
      events.where(col("event_type").isin("click", "purchase")),
      key = "user_id",
      ts = "ts",
      isLeft = col("event_type") === "purchase",
      leftId = col("event_id"),
      rightVal = col("event_id"),
      rightOrd = -col("event_id") // same-instant clicks: the MIN id wins
    )
      .select(col("__left_id").as("purchase_id"), col("__match").as("click_id"))
      .orderBy("purchase_id")

  /** A4 — FORWARD as-of: for every purchase, the EARLIEST click at-or-after
    * it by the same user (post-conversion behavior lookahead — the mirror
    * of A1). No new machinery: negating the time column turns "latest right
    * with ts ≤ left.ts" into "earliest right with ts ≥ left.ts", so the
    * same [[runAsofWindow]] core serves both directions and the semantics
    * cannot diverge. Negation happens on the RAW time representation (ns
    * long, or µs when the table carries native timestamps) — ordering-
    * equivalent to the oracle's native-timestamp ASOF comparison, no
    * precision truncation.
    */
  def purchaseAsofNextClick(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.eventsRaw(spark, dir)
    val negTs =
      if (Tables.eventsTsIsNanos(events)) -col("ts")
      else -unix_micros(col("ts").cast("timestamp"))
    asofJoinFusedSelf(
      events.where(col("event_type").isin("click", "purchase")).withColumn("__negts", negTs),
      key = "user_id",
      ts = "__negts",
      isLeft = col("event_type") === "purchase",
      leftId = col("event_id"),
      rightVal = col("event_id"),
      rightOrd = -col("event_id") // same-instant clicks: the MIN id wins
    )
      .select(col("__left_id").as("purchase_id"), col("__match").as("click_id"))
      .orderBy("purchase_id")
  }

  /** A5 — NEAREST-event join: for each purchase, the click minimizing
    * |Δt| in EITHER direction — the sensor-alignment semantics (a1 is
    * "most recent before", a4 "earliest after"; a5 composes them). Ties in
    * |Δt| resolve to the BACKWARD match (the one a1 would give), so the
    * operator degrades to as-of exactly when gaps are symmetric; WITHIN a
    * direction, same-instant clicks resolve to the minimum event_id (the
    * `rightOrd` total-order key), matching the oracle's
    * `ORDER BY abs(Δ), direction, event_id` rule deterministically rather
    * than by the accident of shuffle placement.
    *
    * Built as two passes of the same fused single-scan window core (one
    * per direction — each is one scan + one user_id window shuffle, the
    * pinned a1/a4 shape) joined on purchase id: purchase-cardinality keys,
    * never events. Purchases whose user has no click at all drop, matching
    * the as-of family's inner semantics; one-sided purchases keep their
    * only candidate.
    */
  def purchaseNearestClick(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.eventsRaw(spark, dir)
    val base = events
      .where(col("event_type").isin("click", "purchase"))
      .withColumn("tus", Tables.tsMicrosCol(events))
    val leftKey  = struct(col("event_id").as("pid"), col("tus").as("ptus"))
    val rightVal = struct(col("event_id").as("cid"), col("tus").as("ctus"))
    val back = asofJoinFusedSelf(base, "user_id", "tus",
      isLeft = col("event_type") === "purchase", leftId = leftKey, rightVal = rightVal,
      rightOrd = -col("event_id"))
      .select(
        col("__left_id.pid").as("purchase_id"),
        col("__match.cid").as("b_id"),
        (col("__left_id.ptus") - col("__match.ctus")).as("b_gap")
      )
    val fwd = asofJoinFusedSelf(base.withColumn("__negts", -col("tus")), "user_id", "__negts",
      isLeft = col("event_type") === "purchase", leftId = leftKey, rightVal = rightVal,
      rightOrd = -col("event_id"))
      .select(
        col("__left_id.pid").as("purchase_id"),
        col("__match.cid").as("f_id"),
        (col("__match.ctus") - col("__left_id.ptus")).as("f_gap")
      )
    back
      .join(fwd, Seq("purchase_id"), "full_outer")
      .select(
        col("purchase_id"),
        when(col("b_gap").isNull, col("f_id"))
          .when(col("f_gap").isNull, col("b_id"))
          .when(col("f_gap") < col("b_gap"), col("f_id"))
          .otherwise(col("b_id")) // ties (f_gap == b_gap) resolve backward
          .as("click_id")
      )
      .orderBy("purchase_id")
  }

  /** A3 — tolerance-bounded as-of: like [[purchaseAsofClick]] but the match
    * must lie within `toleranceSeconds` BEFORE the purchase (the standard
    * asof-tolerance semantics: match first, then drop matches older than the
    * tolerance — not re-match). The matched click's timestamp rides through
    * the window as a struct payload, so the gap filter needs no second join.
    */
  def purchaseAsofClickWithin(spark: SparkSession, dir: String, toleranceSeconds: Long = 3600L): DataFrame = {
    val events = Tables.eventsRaw(spark, dir)
    val base = events
      .where(col("event_type").isin("click", "purchase"))
      .withColumn("tus", Tables.tsMicrosCol(events))
    asofJoinFusedSelf(
      base,
      key = "user_id",
      ts = "tus",
      isLeft = col("event_type") === "purchase",
      leftId = col("event_id"),
      rightVal = struct(col("event_id").as("click_id"), col("tus").as("click_tus")),
      rightOrd = -col("event_id") // same-instant clicks: the MIN id wins
    )
      .where(col("tus") - col("__match.click_tus") <= toleranceSeconds * 1000000L)
      .select(col("__left_id").as("purchase_id"), col("__match.click_id").as("click_id"))
      .orderBy("purchase_id")
  }
}
