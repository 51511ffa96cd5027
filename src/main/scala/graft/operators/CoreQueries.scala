package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's seven canonical query shapes (Q1–Q7) plus the two
  * declared extensions (Q8 exact-dedup count, Q9 star join) — SURVEY.md §2.4.
  *
  * Each shape in the reference is a fixed SQL string fanned out per blob with
  * a hand-rolled client-side final merge (`QueryOrchestration.cs:118-185` and
  * the per-query methods cited below). Here each is one declarative
  * DataFrame plan: Catalyst inserts the Partial/Final `HashAggregate` pair
  * the reference implements by hand, and pushes filters into the Parquet
  * scan (`PushedFilters` — asserted in PlanShapeSpec).
  *
  * Scale notes (100 TB): every query below is a scan → (filter) →
  * partial-agg → single-exchange → final-agg pipeline, i.e. the minimal
  * shuffle shape for its semantics; Q6 is shuffle-free; Q9's only large
  * shuffle is lineitem⋈orders (both sides keyed on orderkey), the dimension
  * hops stay broadcast.
  */
object CoreQueries {

  /** Q1 — TotalCount (`QueryOrchestration.cs:348-369`): global COUNT(*).
    * Per-file partial counts merged by Catalyst, mirroring the reference's
    * sum-of-per-blob-counts merge (`QO:364`).
    */
  def q1TotalCount(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).agg(count(lit(1)).as("cnt"))

  /** Q2 — TimeFilterCount (`QO:325-346`): COUNT with timestamp-range
    * predicate. The comparison runs against the RAW ts column (nanos long)
    * with a pre-converted literal, so `GreaterThan(ts, …)` reaches the
    * Parquet row-group stats — filtering on the normalized
    * `timestamp_micros(ts div 1000)` would push nothing (verified via
    * PLANS.md; PlanShapeSpec pins the pushed comparison). Mirrors the
    * reference pushing its WHERE into the storage service (`QO:338`).
    */
  def q2TimeFilterCount(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.eventsRaw(spark, dir)
    val filtered =
      if (Tables.eventsTsIsNanos(raw))
        raw.filter(col("ts") > lit(Tables.nanosLiteral("2024-01-15T00:00:00")))
      else raw.filter(col("ts") > expr("timestamp_ntz'2024-01-15 00:00:00'"))
    filtered.agg(count(lit(1)).as("cnt"))
  }

  /** Q3 — FilterCount (`QO:300-323`): COUNT with string-equality predicate
    * (the reference's `_4='Warning'`, `QO:315`). Dictionary + stats pruning
    * apply at the Parquet scan.
    */
  def q3FilterCount(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .filter(col("event_type") === "error")
      .agg(count(lit(1)).as("cnt"))

  /** Q4 — MinMax (`QO:276-298`): global min & max of the timestamp column.
    * Aggregates the RAW nanos column (min/max commute with the monotone
    * ns→µs conversion) so the scan reads one untransformed int64 — and
    * normalizes only the two result values. Min-of-mins / max-of-maxes
    * merge (`QO:292-293`) is Catalyst's Partial/Final agg.
    */
  def q4MinMax(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.eventsRaw(spark, dir)
    if (Tables.eventsTsIsNanos(raw))
      raw
        .agg(min("ts").as("mn"), max("ts").as("mx"))
        .select(
          expr("cast(timestamp_micros(mn div 1000) as timestamp_ntz)").as("min_ts"),
          expr("cast(timestamp_micros(mx div 1000) as timestamp_ntz)").as("max_ts")
        )
    else raw.agg(min("ts").as("min_ts"), max("ts").as("max_ts"))
  }

  /** Q5 — MaxBy (`QO:242-274`): grouped max (max timestamp per group). The
    * reference re-groups per-blob maxima client-side (`QO:258-265`); here
    * that is the Final-mode HashAggregate after one shuffle on the (low
    * cardinality) group key.
    */
  def q5MaxBy(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.eventsRaw(spark, dir)
    if (Tables.eventsTsIsNanos(raw))
      raw
        .groupBy("event_type")
        .agg(max("ts").as("mx")) // aggregate raw nanos; convert 5 results, not 100k rows
        .select(col("event_type"), expr("cast(timestamp_micros(mx div 1000) as timestamp_ntz)").as("max_ts"))
        .orderBy("event_type")
    else raw.groupBy("event_type").agg(max("ts").as("max_ts")).orderBy("event_type")
  }

  /** Q6 — PointFilter (`QO:219-240`): full-row select by key equality
    * (`QO:232`). Highly selective predicate → Parquet stats skip nearly all
    * row groups; no shuffle at all.
    */
  def q6PointFilter(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .filter(col("event_id") === 4242L)
      .select("event_id", "user_id", "event_type", "props")

  /** Q7 — Distinct (`QO:189-217`): the reference computes distinct values
    * *via* group-by-count then discards the counts (`QO:202-208`); we keep
    * the counts (strictly more information, same plan shape).
    */
  def q7Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** Q8 — exact-duplicate count over `documents` (extension, SURVEY §2.4):
    * COUNT(*) − COUNT(DISTINCT text). At 100 TB scale prefer grouping on a
    * 128-bit fingerprint of the text (see [[Dedup.exactDupRows]]) so the
    * shuffle carries 16-byte keys instead of whole documents; at test scale
    * the direct form is the oracle-exact baseline.
    */
  def q8DedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .agg((count(lit(1)) - countDistinct(col("text"))).as("dup_rows"))

  /** Q9 — star join (extension, SURVEY §2.4): lineitem ⋈ orders ⋈ customer ⋈
    * nation, grouped count per nation. `nation` (25 rows) is explicitly
    * broadcast — it is tiny at every scale. `customer` and `orders` are left
    * to Catalyst/AQE: at test scale they auto-broadcast; at 100 TB they are
    * large and must shuffle on their keys, which the declarative plan
    * already does correctly.
    */
  /** Q10 — ROLLUP aggregation (extension: the reference has no grouping
    * sets, SURVEY §2.3; Spark's are native). Measures summed as
    * DECIMAL(12,2): decimal addition is exact and associative, so the result
    * is bit-deterministic regardless of partial-aggregation order — the rule
    * FIXTURES.md §3 imposes on any measure-sum query. The exact decimal sum
    * is then emitted as BIGINT minor units (×100 — the fractional part is
    * exactly representable at scale 2, so the conversion is lossless):
    * integer columns hash identically across engines, where decimal
    * *rendering* does not.
    */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame =
    // fanOut (guide §2.5): the Expand(rollup) partial aggregation otherwise
    // runs single-task on a one-row-group scan; decimal sums and counts are
    // exact and associative, so partial-agg placement cannot move a bit.
    Tables
      .fanOut(Tables.lineitem(spark, dir), Seq(s"$dir/lineitem.parquet"), Seq(col("l_orderkey"), col("l_linenumber")))
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        (sum(col("l_quantity").cast("decimal(12,2)")) * 100).cast("long").as("sum_qty_cents"),
        count(lit(1)).as("cnt")
      )
      .orderBy(
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first
      )

  /** Q11 — pricing summary (TPC-H Q1 shape): filtered multi-measure grouped
    * aggregation over the fact table. All measures cast to DECIMAL before
    * summing — exact, associative, bit-deterministic under any partial-agg
    * order (doubles would drift with partition count). The canonical
    * scan→partial→exchange(6 groups)→final pipeline at any scale. Measures
    * are emitted as BIGINT minor units (×100 for scale-2 sums, ×10000 for
    * the scale-4 discounted sum — lossless, since the decimal arithmetic is
    * exact at those scales): integer columns hash identically across
    * engines, where decimal rendering does not.
    */
  def q11PricingSummary(spark: SparkSession, dir: String): DataFrame =
    // fanOut after the filter (guide §2.5, same shape as q19/q10): the
    // decimal partial agg otherwise runs on the scan's single row-group
    // partition; decimal sums and counts are exact and associative.
    Tables
      .fanOut(
        Tables
          .lineitem(spark, dir)
          .where(col("l_shipdate") <= expr("timestamp_ntz'1999-06-30 00:00:00'")),
        Seq(s"$dir/lineitem.parquet"),
        Seq(col("l_orderkey"), col("l_linenumber"))
      )
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(col("l_quantity").cast("decimal(12,2)")) * 100).cast("long").as("sum_qty_cents"),
        (sum(col("l_extendedprice").cast("decimal(12,2)")) * 100).cast("long").as("sum_base_cents"),
        (sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(12,2)"))) * 10000)
          .cast("long")
          .as("sum_disc_e4"),
        count(lit(1)).as("cnt")
      )
      .orderBy("l_returnflag", "l_linestatus")

  /** Q19 — CUBE aggregation: all four grouping sets over
    * (returnflag, linestatus) — the full grouping-sets surface beside Q10's
    * ROLLUP (SURVEY §2.3 lists grouping sets as absent from the reference;
    * Spark's are native GROUPING SETS expansion inside one aggregation, not
    * a union of re-scans). Measures in BIGINT minor units as in Q10/Q11.
    */
  def q19Cube(spark: SparkSession, dir: String): DataFrame =
    // fanOut: same reasoning as q10 — Expand(cube) × decimal sums.
    Tables
      .fanOut(Tables.lineitem(spark, dir), Seq(s"$dir/lineitem.parquet"), Seq(col("l_orderkey"), col("l_linenumber")))
      .cube("l_returnflag", "l_linestatus")
      .agg(
        (sum(col("l_quantity").cast("decimal(12,2)")) * 100).cast("long").as("sum_qty_cents"),
        count(lit(1)).as("cnt")
      )
      .orderBy(
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first
      )

  /** Q20 — PIVOT: one row per day, one count column per event type. The
    * pivot value list is declared (never inferred — inference would scan
    * twice and make the schema data-dependent, both wrong at 100 TB); a
    * pivot over K declared values is a single grouped aggregation with K
    * conditional counts, exactly what the oracle's COUNT(*) FILTER form
    * computes. Missing combinations are 0, matching SQL FILTER semantics.
    */
  def q20Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .withColumn("day", col("ts").cast("date"))
      .groupBy("day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na
      .fill(0L)
      .orderBy("day")

  /** Q13E — set difference (EXCEPT): customers minus those with an URGENT
    * order. Completes the set-op family beside Q13's INTERSECT, and is Q14's
    * NOT-EXISTS expressed as a set op — Catalyst plans both as a left-anti
    * join, so the answers (and plans) coincide.
    */
  def q13eExcept(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .select("c_custkey")
      .except(
        Tables
          .orders(spark, dir)
          .where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey"))
      )
      .orderBy("c_custkey")

  /** Q12 — ranking window: top-3 orders by totalprice per priority class.
    * Order key includes o_orderkey so ranking is total (no FP tie wobble);
    * output carries only keys/ranks, never the double measure.
    */
  def q12WindowTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables
      .orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select("o_orderpriority", "rn", "o_orderkey")
      .orderBy("o_orderpriority", "rn")
  }

  /** Q13 — set operation (INTERSECT): nation keys present in both customer
    * and supplier. The reference's only set op is implicit union of per-blob
    * results (SURVEY §2.3).
    */
  def q13Intersect(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .select("c_nationkey")
      .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").as("c_nationkey")))
      .orderBy("c_nationkey")

  /** Q14 — anti join: customers with no URGENT order (NOT EXISTS). Left-anti
    * is the shuffle-minimal plan shape; the priority filter is pushed below
    * the join so the right side shrinks before it shuffles.
    */
  def q14AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .join(
        Tables.orders(spark, dir).where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"),
        "left_anti"
      )
      .select("c_custkey")
      .orderBy("c_custkey")

  /** Q27 — semi join: customers WITH at least one URGENT order (EXISTS) —
    * q14's complement, completing the join-type surface (inner/outer/anti/
    * semi/asof/interval/salted/bucketed). Left-semi short-circuits on first
    * match and ships only the probe side's key column — at scale this is
    * strictly cheaper than the inner-join-plus-distinct a naive EXISTS
    * rewrite would run.
    */
  def q27SemiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .join(
        Tables.orders(spark, dir).where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"),
        "left_semi"
      )
      .select("c_custkey")
      .orderBy("c_custkey")

  /** X1 — HLL sketch distinct count of users (extension: the sketch rung of
    * the distinct ladder — at 100 TB `COUNT(DISTINCT)` shuffles every key,
    * `approx_count_distinct` ships a fixed-size HLL buffer per partition).
    * HLL estimates are engine-specific → no SQL oracle; CoreQueriesSpec
    * bounds it against the exact count.
    */
  def x1ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .agg(approx_count_distinct("user_id", 0.02).as("approx_users"))

  /** X5 — grouped + rolled-up HLL distinct users: per-event-type sketches
    * AND the grand total from ONE aggregation pass. This is the property
    * that makes sketches the 100 TB answer and exact distinct not: HLL
    * registers MERGE, so partial sketches combine map-side, the rollup's
    * total row is a merge of the group sketches rather than a second scan,
    * and the shuffle carries one fixed-size buffer per (group × task) —
    * where exact grouped distinct ships every distinct (type, user) pair.
    * Engine-hash-dependent output ⇒ no SQL oracle; CoreQueriesSpec bounds
    * every row against its exact twin.
    */
  def x5ApproxDistinctRollup(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .rollup("event_type")
      .agg(approx_count_distinct("user_id", 0.02).as("approx_users"))
      .orderBy(asc_nulls_first("event_type"))

  /** Q15 — global top-k with total ordering: plans as
    * `TakeOrderedAndProject` (per-partition top-k, driver merge of
    * k·partitions rows) — never a full sort.
    */
  def q15TopOrders(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_orderpriority")

  /** Q16 — left outer join + aggregate: order count per customer including
    * zero-order customers (`count(o_orderkey)` skips the unmatched nulls).
    */
  def q16OuterJoinCount(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  /** Q17 — compound scalar predicates: IN-list, LIKE, regexp, IS NOT NULL,
    * boolean combination (every predicate form SURVEY §2.3 lists as absent
    * from the reference). IN and LIKE push to the parquet scan; the regexp
    * evaluates post-scan inside codegen.
    */
  def q17PredicateKinds(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .where(
        col("event_type").isin("error", "purchase") &&
          col("props").like("{\"k\":%") &&
          col("props").rlike("\\d") &&
          col("props").isNotNull &&
          (col("user_id") % 2 === 0 || col("event_id") < 100)
      )
      .agg(count(lit(1)).as("cnt"))

  /** Q18 — three-level dimension chain: region → nation → customer counts.
    * Both dimension hops broadcast (region 5 rows, nation 25) — the only
    * scan-proportional work is the customer pass.
    */
  def q18RegionRollup(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("n_name")).as("n_nations"))
      .orderBy("r_name")

  /** D5 — corpus composition: doc counts and total chars per (source, lang). */
  def d5SourceStats(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("cnt"), sum(length(col("text"))).as("total_chars"))
      .orderBy("source", "lang")

  /** X2 — exact percentiles per group. Spark's `percentile` and DuckDB's
    * `quantile_cont` share the linear-interpolation definition (position
    * p·(n−1)), and the interpolation arithmetic over identical doubles is
    * bit-deterministic — so unlike the sketch aggregates this one IS
    * oracle-checkable. At 100 TB exact percentile sorts each group's values
    * once per partition (TypedImperativeAggregate buffer); the sketch
    * alternative is `approx_percentile` when groups outgrow memory.
    */
  def x2Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90")
      )
      .orderBy("event_type")

  /** X3 — approximate percentiles per group: the sketch rung of the
    * percentile ladder that X2's docstring promises. `approx_percentile`
    * (Greenwald–Khanna) keeps a bounded-size quantile summary per
    * (group, partition) and merges summaries — the exchange carries
    * O(accuracy) state per group instead of every value, which is what
    * survives groups of 10¹⁰ rows at 100 TB. Sketch contents are
    * engine-specific → no SQL oracle; CoreQueriesSpec bounds its rank error
    * against exact X2.
    */
  def x3ApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy("event_type")
      .agg(
        expr("approx_percentile(value, 0.5, 10000)").as("p50"),
        expr("approx_percentile(value, 0.9, 10000)").as("p90")
      )
      .orderBy("event_type")

  /** X4 — heavy hitters: approximate top-k most frequent users
    * (`approx_top_k`, a frequent-items sketch). The sketch rung of the
    * frequency ladder: the exchange carries one bounded-size sketch per
    * partition instead of every (user, count) pair — the shape that finds
    * hot keys in a 10¹² row log without a full groupBy. Counts are exact
    * while distinct keys fit the tracked capacity (true at every test SF —
    * CoreQueriesSpec pins equality with the exact top-k); sketch internals
    * are engine-specific → rows-only at the driver gate.
    */
  def x4ApproxTopUsers(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables
      .events(spark, dir)
      .agg(expr(s"approx_top_k(user_id, $k, 65536)").as("top"))
      // the sketch's emission order among EQUAL counts is internal state —
      // re-sort the k survivors (count desc, user_id tiebreak) so ranks are
      // deterministic run to run
      .select(
        posexplode(
          expr(
            "array_sort(top, (a, b) -> case when a.count > b.count then -1 when a.count < b.count then 1 " +
              "when a.item < b.item then -1 when a.item > b.item then 1 else 0 end)"
          )
        ).as(Seq("pos", "t"))
      )
      .select((col("pos") + 1).cast("long").as("rnk"), col("t.item").as("user_id"), col("t.count").as("cnt"))

  /** Q3P — FilterCount with a POSITIONAL column reference, the reference's
    * literal predicate form (`_4='Warning'`, `QueryOrchestration.cs:313-315`
    * — its CSV-over-blob tables have no header, so columns are addressed
    * 1-based by position). [[positionalCol]] resolves the ordinal against the
    * schema at plan time; the resulting plan is identical to Q3's (same
    * pushed filter), which is the point: positional reference is a naming
    * convenience, not a different operator.
    */
  def q3PositionalFilterCount(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.filter(positionalCol(e, 4) === "error").agg(count(lit(1)).as("cnt"))
  }

  /** `_<n>`-style 1-based positional column reference (`QO:313-315`). */
  def positionalCol(df: DataFrame, ordinal1Based: Int): org.apache.spark.sql.Column =
    col(df.columns(ordinal1Based - 1))

  /** J1 — JSON-in-string extraction (extension, SURVEY §2.3 scalar-function
    * checklist): pull `props.k` out of the events' JSON payload column and
    * aggregate it. `get_json_object` is codegen'd; no UDF.
    */
  def j1PropsExtract(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** P1 — Q2's semantics against the day-partitioned physical layout
    * ([[Prep.dayPartitionedEventsCache]]): the `day >=` predicate prunes at
    * the DIRECTORY level (`PartitionFilters` in the scan — whole days of a
    * 100 TB log never touch I/O), the `ts >` predicate trims the boundary
    * day's rows. Same count as Q2 by construction — which is the point:
    * P1 proves the layout investment changes the scan, not the answer
    * (hash-checked against Q2's own oracle SQL).
    */
  def p1PartitionedTimeCount(spark: SparkSession, dir: String): DataFrame = {
    val layout = Prep.dayPartitionedEventsCache(spark, dir)
    graft.sources.Tables.cachedRead(spark, layout)
      .where(
        col("day") >= lit(java.sql.Date.valueOf("2024-01-15")) &&
          col("ts") > expr("timestamp_ntz'2024-01-15 00:00:00'")
      )
      .agg(count(lit(1)).as("cnt"))
  }

  /** Z1 — rectangle scan over the z-ordered events layout
    * ([[Prep.zorderEventsCache]]): a user-cohort × time-window predicate,
    * the 2-dim filter shape neither a time partition nor a user sort can
    * serve alone. Both predicates are on plain stored columns, so they push
    * into the parquet scan (PlanShapeSpec pins `PushedFilters` carries
    * both), and the Morton clustering makes each row group's user_id AND ts
    * min/max tight — at 100 TB the scan touches only row groups whose
    * (user, time) square intersects the query rectangle. Results are
    * layout-independent (same rows, different physical order), so the
    * DuckDB oracle runs the identical predicate on the unclustered table.
    * `value` aggregates under the e6-quantized-long contract.
    */
  def z1ZorderRange(spark: SparkSession, dir: String): DataFrame = {
    val layout = Prep.zorderEventsCache(spark, dir)
    graft.sources.Tables.cachedRead(spark, layout)
      .where(
        col("user_id").between(lit(40), lit(90)) &&
          col("ts") >= expr("timestamp_ntz'2024-01-08 00:00:00'") &&
          col("ts") < expr("timestamp_ntz'2024-01-17 00:00:00'")
      )
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        // per-row e6 quantization BEFORE the sum: integer addition is
        // order-independent, so the hash compare is immune to the layout's
        // different physical row order (a float sum would drift in the ulps)
        sum(round(col("value") * 1000000).cast("long")).as("value_e6")
      )
      .orderBy("event_type")
  }

  /** Q21 — part-dimension revenue: lineitem ⋈ part, discounted revenue per
    * brand (completes table coverage — every table the engine serves now has
    * a registered query). `part` is a mid-size dimension: explicitly
    * broadcast at test scale; at 100 TB its size class decides (AQE picks
    * broadcast vs shuffle from runtime stats — the declarative join is
    * correct either way). Revenue in BIGINT 1e-4 units per the decimal rule.
    */
  def q21PartBrandRevenue(spark: SparkSession, dir: String): DataFrame =
    // fanOut the probe side (guide §2.5): the broadcast-hash probe and the
    // decimal partial agg otherwise run on the scan's single row-group
    // partition. Join output and decimal sums are placement-independent.
    Tables
      .fanOut(
        Tables.lineitem(spark, dir),
        Seq(s"$dir/lineitem.parquet"),
        Seq(col("l_orderkey"), col("l_linenumber"))
      )
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        (sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(12,2)"))) * 10000)
          .cast("long")
          .as("revenue_e4"),
        count(lit(1)).as("cnt")
      )
      .orderBy("p_brand")

  /** Q22 — the salted-join machinery at the query surface: lineitem ⋈ orders
    * through [[Skew.saltedJoin]] (orders replicated saltFactor×, lineitem
    * deterministically salted), grouped counts per priority. Oracle = the
    * PLAIN join's SQL — salting must be answer-invariant; the driver hash
    * gate proves it on every run. At scale this is the manual fallback when
    * one orderkey outgrows AQE's skew-split thresholds.
    */
  def q22SaltedJoinCount(spark: SparkSession, dir: String): DataFrame =
    Skew
      .saltedJoin(
        // project BOTH sides to what the query consumes before the salted
        // exchange (guide §2.3): the old all-column salt hash forced the
        // scan to read lineitem's 16 columns and replicated 9-column
        // orders saltFactor×. (l_orderkey, l_linenumber) is the row's
        // primary key, so the salt keeps per-row entropy inside a hot key.
        Tables.lineitem(spark, dir).select("l_orderkey", "l_linenumber"),
        Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
        "l_orderkey",
        "o_orderkey",
        saltCols = Seq("l_orderkey", "l_linenumber")
      )
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")

  def q9StarJoin(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("n_name")

  /** Q23 — q9's star join with the `lineitem ⋈ orders` leg running on the
    * BUCKETED fact layout ([[graft.sources.BucketedFacts]]): both sides
    * pre-partitioned and per-bucket sorted on the orderkey, so the big-big
    * join sort-merges bucket-to-bucket with ZERO Exchange on either fact
    * side (PhysicalLayoutSpec asserts the plan). The `merge` hint pins the
    * strategy — a broadcast of `orders` at toy scale would silently bypass
    * the layout this query exists to exercise, and at real scale orders is
    * never broadcastable anyway. Oracle: identical to q9 — layout must
    * never change answers.
    */
  def q23BucketedStar(spark: SparkSession, dir: String): DataFrame = {
    val (l, o) = graft.sources.BucketedFacts.lineitemOrders(spark, dir)
    spark
      .table(l)
      .hint("merge")
      .join(spark.table(o), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("n_name")
  }

  /** Q24 — shipping-priority top-k (TPC-H Q3 shape): selective filters on
    * ALL THREE inputs (segment on customer, date ranges on orders and
    * lineitem) pushed to the scans, then fact-fact join → grouped revenue →
    * top 10. What matters at 100 TB: the date predicates prune row groups
    * before either shuffle; customer is filtered then hashed (a real
    * customer table outgrows broadcast, so the plan must survive as a
    * shuffle join — no broadcast hint here, AQE may still pick one at toy
    * scale); and the final ordering is `TakeOrderedAndProject`, never a
    * global sort. Revenue in BIGINT e4 minor units as in q11/q21.
    */
  def q24ShippingPriority(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .where(col("l_shipdate") > expr("timestamp_ntz'1998-03-15 00:00:00'"))
      .join(
        Tables.orders(spark, dir).where(col("o_orderdate") < expr("timestamp_ntz'1998-03-15 00:00:00'")),
        col("l_orderkey") === col("o_orderkey")
      )
      .join(
        Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey")
      )
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
      .agg(
        (sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(12,2)"))) * 10000)
          .cast("long")
          .as("revenue_e4")
      )
      .orderBy(col("revenue_e4").desc, col("l_orderkey"))
      .limit(10)

  /** Q25 — local-supplier volume (TPC-H Q5 shape): the 6-table chain
    * lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region with the
    * `c_nationkey = s_nationkey` locality constraint and a one-year order
    * window. Join geometry at scale: facts (lineitem/orders) shuffle on
    * their keys; supplier/nation/region are dims → broadcast (supplier is
    * 10⁻⁴ of lineitem in TPC-H geometry); the locality predicate rides the
    * supplier join as an equi-key (s_nationkey = c_nationkey) rather than a
    * post-join filter, so mismatched rows never materialize. Customer joins
    * by hash (same non-broadcastable reasoning as q24).
    */
  def q25LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .join(
        Tables
          .orders(spark, dir)
          .where(
            col("o_orderdate") >= expr("timestamp_ntz'1997-01-01 00:00:00'") &&
              col("o_orderdate") < expr("timestamp_ntz'1998-01-01 00:00:00'")
          ),
        col("l_orderkey") === col("o_orderkey")
      )
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(
        broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey")
      )
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(
        broadcast(Tables.region(spark, dir)).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey")
      )
      .groupBy("n_name")
      .agg(
        (sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(12,2)"))) * 10000)
          .cast("long")
          .as("revenue_e4"),
        count(lit(1)).as("cnt")
      )
      .orderBy(col("revenue_e4").desc, col("n_name"))

  /** Q26 — month-over-month order trend per priority: monthly counts, the
    * running cumulative count, and the delta vs the previous month — the
    * lag/lead + running-frame window surface beside q12's ranking window.
    * Both windows are PARTITIONED BY priority: parallelism = partition
    * count and no task ever sees more than one priority's months (the
    * unpartitioned running total is the same funnel [[Curation.globalIds]]
    * documents). The windows run over the already-aggregated monthly frame
    * (5 priorities × ~80 months), not raw orders — aggregate first, window
    * over the small result.
    */
  def q26MonthlyOrderTrend(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = Tables
      .orders(spark, dir)
      .groupBy(
        col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month")
      )
      .agg(count(lit(1)).as("cnt"))
    val byMonth = Window.partitionBy("o_orderpriority").orderBy("month")
    monthly
      .withColumn("cum_cnt", sum("cnt").over(byMonth.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("delta", col("cnt") - lag("cnt", 1).over(byMonth))
      .orderBy("o_orderpriority", "month")
  }

  /** Q29 — the TPC-H Q6 shape: revenue delta from discount removal over a
    * narrow date/discount/quantity slice. The whole query is a SCAN: every
    * predicate pushes into the parquet reader (range on ship date, range on
    * discount, bound on quantity — all row-group-prunable min/max shapes),
    * and what survives aggregates map-side to one partial per task. At
    * 100 TB this query's cost is I/O after pruning, nothing else — the
    * purest test that filters actually reach the scan. Revenue follows the
    * decimal rule: exact DECIMAL product, emitted as BIGINT 1e-4 units.
    */
  def q29DiscountRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .where(
        col("l_shipdate") >= expr("timestamp'1997-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp'1998-01-01 00:00:00'") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24
      )
      .agg(
        expr(
          "cast(sum(cast(l_extendedprice as decimal(12,2)) * cast(l_discount as decimal(12,2))) * 10000 as bigint)"
        ).as("revenue_e4"),
        count(lit(1)).as("cnt")
      )

  /** Value bands for [[q30ValueBandJoin]] — a rate-card-style dimension
    * with a deliberate overlap ("all") so the operator is a real JOIN (an
    * event can match several bands), not a disguised CASE expression.
    */
  val ValueBands: Seq[(String, Long, Long)] = Seq(
    ("tiny", 0L, 10L),
    ("small", 10L, 50L),
    ("mid", 50L, 150L),
    ("large", 150L, 300L),
    ("huge", 300L, 1000L),
    ("all", 0L, 1000L)
  )

  /** Q30 — numeric range-band join: count events per value band where
    * membership is `lo ≤ value < hi` — the rate-card/SLA-tier lookup shape.
    *
    * A direct `value BETWEEN lo AND hi` join is non-equi ⇒ nested-loop:
    * every event compared against every band. Instead each band EXPLODES
    * into the fixed-width buckets it covers and the join becomes an
    * EQUI-join on `bucket = floor(value / width)` with the range predicate
    * left as a residual — a hash probe against only the 1–2 bands sharing
    * the event's bucket. With this 6-row dimension both plans would
    * broadcast, but the equi form probes a hash map (BroadcastHashJoin,
    * plan-asserted) instead of scanning the band list per event, and it is
    * the construction that survives when the band table is itself large
    * (same family as a2's banded interval join). Bucketing only routes
    * candidate pairs — the residual decides membership — so the float
    * `floor` never has to agree with the oracle, which joins on the range
    * predicate alone.
    */
  def q30ValueBandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val width = 64L
    val bands = ValueBands
      .toDF("band", "lo", "hi")
      .select(
        col("band"),
        col("lo"),
        col("hi"),
        explode(expr(s"sequence(lo div $width, hi div $width)")).as("bucket")
      )
    Tables
      .events(spark, dir)
      .select(col("value"), floor(col("value") / width).cast("long").as("bucket"))
      .join(broadcast(bands), "bucket")
      .where(col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("band")
  }

  /** W8 — event-transition matrix: counts of consecutive (prev_type →
    * event_type) pairs per user journey — the Markov-chain summary behind
    * "what do users do right after signup". Consecutiveness is defined
    * per user in (ts, event_id) order; `event_id` breaks timestamp ties so
    * both engines see ONE deterministic sequence (a bare ts ordering would
    * make the lag nondeterministic on same-instant events).
    *
    * One window shuffle on `user_id` (each user's journey sorts within its
    * partition — no global order), then a ~|types|² groupBy that collapses
    * map-side. First events (lag = NULL) are excluded: they have no
    * transition, and emitting a synthetic "start" state is the consumer's
    * modeling choice, not the operator's.
    */
  def w8EventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("prev_type", "event_type")
  }

  /** W9 — inter-event gap histogram: the distribution of time between a
    * user's consecutive events, log₂-bucketed in microseconds
    * `(gap_class, n_gaps)` — the latency/cadence fingerprint that
    * separates organic traffic (seconds–hours spread) from bots
    * (machine-periodic spikes in one bucket). Composes w8's per-user lag
    * (same (ts, event_id) deterministic ordering) with d17's
    * binary-length bucketing — exact integer arithmetic end to end, no
    * float log that could misbucket at power-of-two boundaries. One
    * user_id window shuffle, then a ~60-key aggregation that collapses
    * map-side.
    */
  /** W10 — hourly rate-anomaly detection: hours whose event count
    * exceeds 2× the median of the trailing 7 FULLY-OBSERVED hours — the
    * alerting rule an ops dashboard runs over w6's regularized series.
    * Median (not mean) so a single prior spike cannot mask a new one;
    * the trailing frame excludes the current row (an hour must not
    * suppress its own alert) and the first 7 hours emit nothing (no
    * baseline yet), both matching the oracle.
    *
    * Exactness discipline: the hourly series collapses to (hour, cnt)
    * first — at most time-range/3600 rows, so the subsequent GLOBAL
    * 7-row window runs on a frame orders of magnitude below the event
    * count (the single-partition window is bounded by the calendar, not
    * the log; a year is 8,760 rows). The median of 7 longs is taken as
    * the exact 4th order statistic (`sort_array(collect_list)[4]`) and
    * compared in integer space (`cnt > 2*med`) — no float percentile
    * interpolation to diverge cross-engine (the w9/d17 discipline).
    */
  def w10HourlyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables
      .events(spark, dir)
      // ntz cast: the driver hashes output columns, and a with-timezone
      // hour would schema-mismatch the oracle's plain timestamp
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("hour").rowsBetween(-7, -1)
    hourly
      .withColumn("window_cnts", collect_list(col("cnt")).over(w))
      .where(size(col("window_cnts")) === 7)
      .withColumn("med", element_at(sort_array(col("window_cnts")), 4))
      .where(col("cnt") > col("med") * 2)
      .select(col("hour"), col("cnt"), col("med"))
      .orderBy("hour")
  }

  def w9GapHistogram(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.eventsRaw(spark, dir)
    val w      = Window.partitionBy("user_id").orderBy("tus", "event_id")
    events
      .select(col("user_id"), col("event_id"), Tables.tsMicrosCol(events).as("tus"))
      .withColumn("gap", col("tus") - lag("tus", 1).over(w))
      .where(col("gap").isNotNull)
      .groupBy(length(bin(col("gap"))).cast("long").as("gap_class"))
      .agg(count(lit(1)).as("n_gaps"))
      .orderBy("gap_class")
  }

  /** W6 — gap-filled hourly resampling: counts per (hour, event_type) over
    * the table's full observed range, with ABSENT cells emitted as 0 — the
    * regularized series a dashboard or anomaly detector consumes (a plain
    * groupBy silently skips empty hours, which reads as "no data" instead
    * of "zero events"). The time grid is built INSIDE the plan — min/max
    * bounds via a 2-value aggregate, `sequence(...)` exploded, cross-joined
    * with the distinct types — so no driver-side collect manufactures the
    * calendar; the grid (hours × types) then LEFT-joins the counted cells.
    * Plan reality (PlanShapeSpec pins it): Catalyst rewrites the
    * bounds/types branches — written here over the counted cells — back
    * into direct scans via `RemoveRedundantAggregates`, so the table is
    * read three times, BUT each auxiliary scan is column-pruned to its
    * single column (`ts` for bounds, `event_type` for types) with the
    * full-width scan only under the counting groupBy. At 100 TB the
    * refinement is explicitly persisting the counted cells (they are
    * cell-count-sized) and deriving grid and bounds from the materialized
    * table — the composition, not the operator, decides that.
    */
  def w6ResampleHourly(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(spark, dir)
      .select(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
    val counts = e.groupBy("hr", "event_type").agg(count(lit(1)).as("cnt"))
    // bounds/types written over the counted cells; Catalyst's
    // RemoveRedundantAggregates rewrites them into direct single-column
    // scans anyway (see docstring) — keeping this form documents intent and
    // stays correct under either physical choice
    val hours = counts
      .agg(min("hr").as("d0"), max("hr").as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 hour)")).as("hr"))
      // sequence() materializes instants even over NTZ bounds — re-assert
      // NTZ before the join so the grid keys match the counted cells' type
      // (and the parquet doesn't carry +00:00 vs the oracle's naive
      // timestamps, the trap Tables.events exists to close)
      .select(col("hr").cast("timestamp_ntz").as("hr"))
    val types = counts.select("event_type").distinct()
    hours
      .crossJoin(types)
      .join(counts, Seq("hr", "event_type"), "left")
      .select(col("hr"), col("event_type"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("hr", "event_type")
  }

  /** Q28 — customers whose balance exceeds their nation's average: the
    * correlated-scalar-subquery shape (`WHERE c_acctbal > (SELECT AVG …
    * WHERE same nation)`), written directly as its decorrelated plan — the
    * per-nation aggregate (25 rows) broadcast back onto the customer scan,
    * which is exactly what Catalyst's subquery decorrelation rewrites the
    * SQL form into. Comparison is exact integer arithmetic
    * (`bal_cents × n_customers > total_cents`) instead of `bal > avg`: an
    * average is a ratio, and cross-multiplying keeps every operand a
    * BIGINT — no float average whose last-ulp rounding could flip a
    * boundary customer between engines. Balances go through DECIMAL(12,2)
    * to cents per the q10/q11 decimal rule.
    */
  def q28AboveNationAvg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables
      .customer(spark, dir)
      .select(
        col("c_custkey"),
        col("c_nationkey"),
        expr("cast(cast(c_acctbal as decimal(12,2)) * 100 as bigint)").as("bal_cents")
      )
    val perNation = c
      .groupBy("c_nationkey")
      .agg(sum("bal_cents").as("total_cents"), count(lit(1)).as("n_cust"))
    c.join(broadcast(perNation), "c_nationkey")
      .where(col("bal_cents") * col("n_cust") > col("total_cents"))
      .select("c_custkey", "bal_cents")
      .orderBy("c_custkey")
  }

  /** Q31 — customer order distribution (TPC-H Q13 shape): how many
    * customers placed 0, 1, 2, … qualifying orders. The signature
    * difficulty is the AGGREGATE-OF-AGGREGATE over an OUTER join: the
    * zero-order customers exist only because the join is LEFT (an inner
    * join silently drops them and the 0-bucket vanishes), and the
    * order-priority predicate must live IN the join condition — as a WHERE
    * it would turn the outer join back into an inner one.
    *
    * Scale shape: orders filters at the scan, then shuffles on custkey;
    * the first aggregate groups on the SAME key, so Catalyst reuses the
    * join's hash partitioning (no second exchange for the per-customer
    * count). The second aggregate's domain is |distinct order counts| —
    * tens of rows — and collapses map-side.
    */
  def q31CustomerOrderDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .select("c_custkey")
      .join(
        Tables
          .orders(spark, dir)
          .where(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"),
        "left"
      )
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q32 — small-quantity-order revenue (TPC-H Q17 shape): revenue from
    * lineitems whose quantity is below 20% of the average quantity for
    * their part, over one brand. The reference correlated form
    * (`WHERE l_quantity < (SELECT 0.2*avg(l_quantity) WHERE same part)`)
    * decorrelates into per-part statistics joined back onto the same rows —
    * here a single window over `l_partkey`, so the matched slice is scanned
    * ONCE (an agg+self-join would scan it twice). The fraction compares by
    * cross-multiplication in BIGINT (`5·qty·n < Σqty`, the q28 discipline):
    * no float average whose last-ulp rounding could flip a boundary row
    * between engines.
    *
    * Scale shape: the brand predicate prunes `part` to ~5%, which
    * broadcasts; the lineitem scan prunes to matching parts via the
    * broadcast hash semi-probe before the single partkey shuffle.
    */
  def q32SmallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lp = Tables
      .lineitem(spark, dir)
      .join(
        broadcast(Tables.part(spark, dir).where(col("p_brand") === "Brand#4").select("p_partkey")),
        col("l_partkey") === col("p_partkey")
      )
      .select(
        col("l_partkey"),
        col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice")
      )
    val byPart = Window.partitionBy("l_partkey")
    lp.withColumn("n", count(lit(1)).over(byPart))
      .withColumn("s", sum("qty").over(byPart))
      .where(col("qty") * 5 * col("n") < col("s"))
      .agg(
        expr("cast(sum(cast(l_extendedprice as decimal(12,2)) * 10000) as bigint)").as("revenue_e4"),
        count(lit(1)).as("cnt")
      )
  }

  /** Q33 — large-volume orders (TPC-H Q18 shape): orders whose total
    * quantity exceeds a threshold, with their customer. The reference form
    * is `o_orderkey IN (SELECT l_orderkey … HAVING sum > 250)`; the
    * scale-correct plan aggregates lineitem FIRST (partial map-side sums →
    * one orderkey shuffle), filters to the surviving hundreds of orders,
    * and only then joins orders and customer — the filtered aggregate is
    * broadcastable, so the two dimension joins never shuffle the facts
    * again. Joining before aggregating would drag customer names through
    * the lineitem shuffle. Quantities sum in BIGINT; top-100 by
    * (total_qty, orderkey) is `TakeOrderedAndProject`, never a global sort.
    */
  def q33LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables
      .lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .where(col("total_qty") > 250)
    big
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_name"),
        col("c_custkey"),
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        col("total_qty")
      )
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q34 — suppliers who kept orders waiting (TPC-H Q21 shape): for
    * finalized multi-supplier orders, count per supplier the late lines
    * where that supplier was the ONLY late one. The reference form is the
    * hardest correlation in TPC-H — an EXISTS (another supplier on the
    * order) AND a NOT EXISTS (another LATE supplier on the order) both
    * correlated to the outer row. Decorrelated: both quantified predicates
    * are per-ORDER facts, so one window over `l_orderkey` computes
    * |suppliers| and |late suppliers| and the pair of subqueries becomes
    * two integer comparisons. "Late" adapts TPC-H's receipt-vs-commit to
    * this schema: shipped more than 90 days after the order date.
    *
    * Scale shape: one orderkey shuffle for the lineitem⋈orders join, the
    * window reuses that partitioning (no second exchange), then a
    * supplier-count aggregation whose domain is |suppliers| and a
    * broadcast name join. `collect_set` over the window is bounded by
    * lines-per-order (≤13 here, single digits in any real order table).
    */
  def q34WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val lo = Tables
      .lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(
        Tables
          .orders(spark, dir)
          .where(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey")
      )
      .select(
        col("l_orderkey"),
        col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("interval 90 days")).as("late")
      )
    val byOrder = Window.partitionBy("l_orderkey")
    lo.withColumn("n_supp", size(collect_set(col("l_suppkey")).over(byOrder)))
      .withColumn("n_late_supp", size(collect_set(when(col("late"), col("l_suppkey"))).over(byOrder)))
      .where(col("late") && col("n_supp") > 1 && col("n_late_supp") === 1)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select("s_name", "numwait")
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Q35 — suppliers with excess shipments of one part type (TPC-H Q20
    * shape): the nested-IN ladder `s_suppkey IN (SELECT … WHERE l_partkey
    * IN (SELECT …) GROUP BY supp, part HAVING sum(qty) > 50)`. Written as
    * its decorrelated plan: the part-type predicate prunes `part` at the
    * scan and broadcasts as a LEFT SEMI probe (lineitem keeps only
    * qualifying parts without widening its rows), the date range prunes
    * the lineitem scan, the (supp, part) aggregate collapses map-side,
    * and the surviving supplier keys semi-join `supplier`. Both IN
    * memberships are semi joins — no duplicate-inflating inner join
    * anywhere, which is the classic Q20 rewrite mistake.
    */
  /** Q36 — late-shipment priority split (TPC-H Q12 shape): for lineitems
    * shipped late (>90 days after the order date), per return flag, how
    * many belong to urgent/high-priority orders vs the rest — the
    * conditional-aggregation-over-a-join shape (`SUM(CASE WHEN …)` twice
    * in one pass). Both counts come from ONE fact-fact join and ONE
    * aggregation: splitting into two filtered queries would scan and
    * shuffle the join twice for what a CASE computes per row. The
    * lateness predicate is a row-local timestamp comparison evaluated at
    * the join (no pre-aggregation can capture it); the ~3-key groupBy
    * collapses map-side.
    */
  def q36LateShipmentPriority(spark: SparkSession, dir: String): DataFrame = {
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables
      .lineitem(spark, dir)
      .select("l_orderkey", "l_shipdate", "l_returnflag")
      .join(
        Tables.orders(spark, dir).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey")
      )
      .where(col("l_shipdate") > col("o_orderdate") + expr("interval 90 days"))
      .groupBy("l_returnflag")
      .agg(
        count(when(urgent, lit(1))).as("high_line_count"),
        count(when(!urgent, lit(1))).as("low_line_count")
      )
      .orderBy("l_returnflag")
  }

  /** Q37 — dormant rich customers (TPC-H Q22 shape): customers whose
    * balance exceeds the average over POSITIVE balances yet who placed no
    * RECENT order (none since 2000-01-01 — this synthetic corpus has
    * every customer ordering at least once over its 6½ years, so TPC-H's
    * literal never-ordered set is empty and the recency window restores
    * the shape's teeth), grouped by nation. Composes the two quantified
    * predicates TPC-H saves for last: a global scalar subquery (the
    * average — one 1-row broadcast, compared by BIGINT
    * cross-multiplication per the q28 rule) and a NOT EXISTS (a LEFT ANTI
    * join against the distinct recent-order custkeys). The anti join's
    * right side is date-pruned at the scan and custkey-distinct BEFORE
    * the join — anti joins don't inflate, but the distinct means the
    * build side is |recent customers|, not |recent orders|.
    */
  def q37DormantRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables
      .customer(spark, dir)
      .select(
        col("c_custkey"),
        col("c_nationkey"),
        expr("cast(cast(c_acctbal as decimal(12,2)) * 100 as bigint)").as("bal_cents")
      )
    val global = c.where(col("bal_cents") > 0).agg(sum("bal_cents").as("total_cents"), count(lit(1)).as("n_pos"))
    c.crossJoin(broadcast(global))
      .where(col("bal_cents") * col("n_pos") > col("total_cents"))
      .join(
        Tables
          .orders(spark, dir)
          .where(col("o_orderdate") >= expr("timestamp_ntz'2000-01-01 00:00:00'"))
          .select(col("o_custkey"))
          .distinct(),
        col("c_custkey") === col("o_custkey"),
        "left_anti"
      )
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), sum("bal_cents").as("total_bal_cents"))
      .orderBy("c_nationkey")
  }

  /** Q38 — late-order priority census (TPC-H Q4 shape): per order
    * priority, how many orders in one quarter had AT LEAST ONE late
    * lineitem. TPC-H writes it as a correlated EXISTS; here the lateness
    * predicate references the OUTER row's order date (this schema has no
    * per-line commit date), so the decorrelation is join → row-local
    * lateness filter → `distinct` on the order key — the distinct IS the
    * EXISTS (an order with five late lines counts once). The quarter
    * predicate prunes the orders scan; the distinct runs on (orderkey,
    * priority) pairs already co-partitioned by the join, and the final
    * ~5-key census collapses map-side.
    */
  def q38PriorityLateOrders(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .where(
        col("o_orderdate") >= expr("timestamp_ntz'1997-07-01 00:00:00'") &&
          col("o_orderdate") < expr("timestamp_ntz'1997-10-01 00:00:00'")
      )
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
      .join(
        Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey")
      )
      .where(col("l_shipdate") > col("o_orderdate") + expr("interval 90 days"))
      .select("o_orderkey", "o_orderpriority")
      .distinct()
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** Q39 — supplier-nation market share (TPC-H Q8 shape): per order year,
    * the revenue a chosen supplier nation captured within one region's
    * ECONOMY-part orders — the deepest join chain in the registry
    * (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region on the demand side,
    * ⋈ part on the product side, ⋈ supplier ⋈ nation again on the supply
    * side — nation plays two roles). TPC-H outputs `mkt_share`, a ratio;
    * this emits numerator and denominator as exact BIGINT e4 sums and
    * leaves the division to the consumer — the one CASE-gated sum and the
    * total come from the SAME aggregation pass (q36's discipline).
    *
    * Join geometry at scale: facts shuffle once on orderkey; customer
    * hashes; part, supplier, and both nation roles broadcast (dims);
    * the region and part-type predicates prune their broadcasts before
    * they ship. A second query per numerator would re-run the whole
    * chain — the CASE keeps it one pass.
    */
  def q39MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val demandNations = nation
      .join(
        broadcast(Tables.region(spark, dir)).where(col("r_name") === "AMERICA"),
        col("n_regionkey") === col("r_regionkey")
      )
      .select(col("n_nationkey").as("cust_nationkey"))
    val supplyNations = nation.select(col("n_nationkey").as("supp_nationkey"), col("n_name").as("supp_nation"))
    Tables
      .lineitem(spark, dir)
      .join(
        Tables
          .orders(spark, dir)
          .where(
            col("o_orderdate") >= expr("timestamp_ntz'1996-01-01 00:00:00'") &&
              col("o_orderdate") < expr("timestamp_ntz'1998-01-01 00:00:00'")
          ),
        col("l_orderkey") === col("o_orderkey")
      )
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(demandNations), col("c_nationkey") === col("cust_nationkey"))
      .join(
        broadcast(Tables.part(spark, dir).where(col("p_type") === "ECONOMY").select("p_partkey")),
        col("l_partkey") === col("p_partkey")
      )
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(supplyNations), col("s_nationkey") === col("supp_nationkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        expr(
          "cast(sum(case when supp_nation = 'NATION_1' then cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(12,2))) else cast(0 as decimal(12,2)) end) * 10000 as bigint)"
        ).as("nation_e4"),
        expr(
          "cast(sum(cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(12,2)))) * 10000 as bigint)"
        ).as("total_e4")
      )
      .orderBy("o_year")
  }

  /** Q40 — returned-item reporting (TPC-H Q10 shape): top-20 customers by
    * revenue lost to returns in one quarter. Both selective predicates
    * (return flag, order-date quarter) push to their scans BEFORE the
    * fact-fact join, customer/nation join after the revenue aggregation
    * has collapsed the stream to one row per customer — the q33 rewrite
    * discipline: dimension attributes never ride the big shuffle. Top-20
    * is `TakeOrderedAndProject` on (revenue, custkey).
    */
  def q40ReturnedItemRevenue(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables
      .lineitem(spark, dir)
      .where(col("l_returnflag") === "R")
      .join(
        Tables
          .orders(spark, dir)
          .where(
            col("o_orderdate") >= expr("timestamp_ntz'1997-01-01 00:00:00'") &&
              col("o_orderdate") < expr("timestamp_ntz'1997-04-01 00:00:00'")
          ),
        col("l_orderkey") === col("o_orderkey")
      )
      .groupBy("o_custkey")
      .agg(
        (sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(12,2)"))) * 10000)
          .cast("long")
          .as("revenue_e4")
      )
    perCust
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q41 — supplier diversity census (TPC-H Q16 shape, adapted to this
    * schema's lack of partsupp): per (brand, size) over a size IN-list,
    * how many DISTINCT suppliers shipped such parts — excluding one brand
    * and a blacklist via NOT IN (here: suppliers with negative balance).
    * The NOT IN decorrelates to a LEFT ANTI join against the (tiny,
    * scan-pruned) blacklist; supplier identity flows as a bare key, and
    * the count-distinct collapses partial-aggregate style on
    * (brand, size, suppkey) before the final census.
    */
  def q41SupplierDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .select("l_partkey", "l_suppkey")
      .join(
        broadcast(
          Tables
            .part(spark, dir)
            .where(col("p_brand") =!= "Brand#4" && col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
            .select("p_partkey", "p_brand", "p_size")
        ),
        col("l_partkey") === col("p_partkey")
      )
      .join(
        broadcast(Tables.supplier(spark, dir).where(col("s_acctbal") < 0).select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"),
        "left_anti"
      )
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))

  /** Q42 — two-nation trade volume (TPC-H Q7 shape): revenue shipped
    * between one nation PAIR, in both directions, per year. Nation joins
    * TWICE (supplier side and customer side) and the pair constraint is
    * the signature DISJUNCTIVE join predicate — (A→B) OR (B→A) — which
    * must stay a residual on equi joins, never degrade the join itself to
    * a nested loop: both nation lookups are broadcast equi joins on the
    * keys, and the OR filters the 2×2 name combinations after. The ship-
    * date range prunes the lineitem scan.
    */
  def q42TradeVolume(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    Tables
      .lineitem(spark, dir)
      .where(
        col("l_shipdate") >= expr("timestamp_ntz'1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp_ntz'1998-01-01 00:00:00'")
      )
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")), col("l_suppkey") === col("s_suppkey"))
      .join(
        broadcast(nation.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk")
      )
      .join(
        broadcast(nation.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk")
      )
      .where(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
      )
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("yr"))
      .agg(
        (sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(12,2)"))) * 10000)
          .cast("long")
          .as("revenue_e4")
      )
      .orderBy("supp_nation", "cust_nation", "yr")
  }

  /** Q43 — disjunctive-predicate revenue (TPC-H Q19 shape): three OR'd
    * (brand ∧ size-range ∧ quantity-range) clauses over a lineitem⋈part
    * join. The plan discipline: the JOIN stays a plain equi hash probe on
    * partkey (broadcast — part is a dim) with the whole OR as a residual;
    * the per-clause brand/size conjuncts additionally union into a
    * scan-level filter on `part` (any row matching NO clause's brand can
    * be dropped before the join — the OR-pushdown Catalyst derives as
    * `p_brand IN (...)`). Revenue in exact e4, plus the matched-line
    * count.
    */
  def q43DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val clause1 = col("p_brand") === "Brand#4" && col("p_size").between(1, 15) && col("l_quantity").between(1, 21)
    val clause2 = col("p_brand") === "Brand#9" && col("p_size").between(1, 25) && col("l_quantity").between(10, 30)
    val clause3 = col("p_brand") === "Brand#19" && col("p_size").between(1, 35) && col("l_quantity").between(20, 40)
    Tables
      .lineitem(spark, dir)
      .join(
        broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey")
      )
      .where(clause1 || clause2 || clause3)
      .agg(
        (sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(12,2)"))) * 10000)
          .cast("long")
          .as("revenue_e4"),
        count(lit(1)).as("cnt")
      )
  }

  /** Q44 — promotion revenue share (TPC-H Q14 shape): of one month's
    * shipped revenue, how much came from PROMO parts. TPC-H outputs the
    * percentage; this emits numerator and denominator as exact e4 BIGINTs
    * from ONE CASE-gated pass (the q36/q39 discipline — two filtered
    * queries would join the month's lineitems against part twice).
    */
  def q44PromoRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .where(
        col("l_shipdate") >= expr("timestamp_ntz'1997-06-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp_ntz'1997-07-01 00:00:00'")
      )
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_type")), col("l_partkey") === col("p_partkey"))
      .agg(
        expr(
          "cast(sum(case when p_type = 'PROMO' then cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(12,2))) else cast(0 as decimal(12,2)) end) * 10000 as bigint)"
        ).as("promo_e4"),
        expr(
          "cast(sum(cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(12,2)))) * 10000 as bigint)"
        ).as("total_e4")
      )

  /** Q45 — min-cost supplier per part (TPC-H Q2 shape): for one (size,
    * type) slice of `part`, the cheapest catalog supplier within one
    * region, full supplier detail, top-100 by account balance. Uses the
    * DERIVED `partsupp` ([[graft.sources.Tables.partsupp]]) — integer
    * arithmetic end to end (cost in cents, balance e2-quantized), so the
    * correlated-MIN subquery TPC-H writes decorrelates into an exact
    * aggregate-and-rejoin. Scale shape: partsupp is 4 rows per part —
    * dim-sized — so EVERYTHING here broadcasts; the only wide object in
    * the plan is the final 100-row sort, and (s_name, p_partkey) gives
    * the LIMIT cut a total order.
    */
  def q45MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val regionSuppliers = Tables
      .supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(
        broadcast(Tables.region(spark, dir).where(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey")
      )
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val eligible = Tables
      .partsupp(spark, dir)
      .join(
        broadcast(Tables.part(spark, dir).where(col("p_size") <= 10 && col("p_type") === "STANDARD").select("p_partkey")),
        col("ps_partkey") === col("p_partkey"),
        "left_semi"
      )
      .join(broadcast(regionSuppliers), col("ps_suppkey") === col("s_suppkey"))
    val minCost = eligible.groupBy("ps_partkey").agg(min("ps_cost_cents").as("min_cents"))
    eligible
      .join(broadcast(minCost), Seq("ps_partkey"))
      .where(col("ps_cost_cents") === col("min_cents"))
      .select(
        expr("cast(round(s_acctbal * 100) as bigint)").as("acctbal_e2"),
        col("s_name"),
        col("n_name"),
        col("ps_partkey").as("p_partkey"),
        col("ps_cost_cents").as("cost_c")
      )
      .orderBy(col("acctbal_e2").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Q46 — important stock identification (TPC-H Q11 shape): per part, the
    * total stock value (`cost × availqty`, integer cents) held by one
    * nation's suppliers, keeping parts whose value exceeds
    * [[Q46MeanMultiple]]× the nation's MEAN per-part value. TPC-H's fixed
    * fraction is SF-coupled (it returns nothing once the catalog outgrows
    * it); the mean-relative cut `value × nparts > K × total` is scale-free
    * and still a pure INTEGER comparison — never a float fraction — so the
    * cut is bit-deterministic in both engines. The global (total, count)
    * decorrelates to a 1-row broadcast aggregate (the q37 global-scalar
    * pattern). Scale shape: partsupp is dim-sized; this query never
    * touches a fact table.
    */
  val Q46MeanMultiple = 2L

  def q46ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables
      .supplier(spark, dir)
      .join(
        broadcast(Tables.nation(spark, dir).where(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey")
      )
      .select("s_suppkey")
    val values = Tables
      .partsupp(spark, dir)
      .join(broadcast(natSupp), col("ps_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("ps_partkey")
      .agg(sum(col("ps_cost_cents") * col("ps_availqty")).as("stock_value_c"))
    values
      .crossJoin(broadcast(values.agg(sum("stock_value_c").as("total_c"), count(lit(1)).as("nparts"))))
      .where(col("stock_value_c") * col("nparts") > col("total_c") * Q46MeanMultiple)
      .select(col("ps_partkey"), col("stock_value_c"))
      .orderBy(col("stock_value_c").desc, col("ps_partkey"))
  }

  /** Q47 — top supplier by quarterly revenue (TPC-H Q15 shape): the
    * revenue view over one ship-quarter of lineitem, then the supplier(s)
    * whose revenue EQUALS the maximum — TPC-H's correlated `= (SELECT
    * MAX…)` as a global max WINDOW over the aggregated view, so lineitem
    * is physically scanned ONCE (a broadcast-max crossJoin re-plans the
    * view per branch — two scans; PlanShapeSpec pins the single scan).
    * The unpartitioned window is safe here because it runs over the
    * per-supplier AGGREGATE — a dim-sized frame — never the fact table.
    * Revenue is the exact e4 BIGINT, so the max-equality is never a float
    * comparison and a genuine tie would return both rows in both engines.
    */
  def q47TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables
      .lineitem(spark, dir)
      .where(
        col("l_shipdate") >= expr("timestamp_ntz'1998-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp_ntz'1998-04-01 00:00:00'")
      )
      .groupBy("l_suppkey")
      .agg(
        (sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(12,2)"))) * 10000)
          .cast("long")
          .as("total_revenue_e4")
      )
    rev
      .withColumn("max_rev", max("total_revenue_e4").over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .where(col("total_revenue_e4") === col("max_rev"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")), col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue_e4")
      .orderBy("s_suppkey")
  }

  /** Q48 — product type profit (TPC-H Q9, now the FULL shape): per
    * (supplier nation, order year), profit = revenue − supply cost × qty
    * over lineitems of one part-name family whose (part, supplier) pair
    * exists in the derived catalog. Adaptation disclosed: the testdata's
    * `l_suppkey` was generated independently of the derived partsupp, so
    * the pair join keeps the catalog-consistent subset (≈ 4/|supplier| of
    * the family's lineitems) rather than TPC-H's all-of-them — a
    * deterministic slice both engines compute identically. Profit is a
    * PER-ROW exact BIGINT (e4 revenue minus cents×100×qty) summed as
    * integers, so group totals are order-independent. Scale shape: one
    * fact scan; part/partsupp/supplier/nation all broadcast; orders joins
    * on its key; the (nation, year) aggregate collapses map-side.
    */
  def q48ProductProfit(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .join(
        broadcast(Tables.part(spark, dir).where(col("p_name").like("%red%")).select("p_partkey")),
        col("l_partkey") === col("p_partkey"),
        "left_semi"
      )
      .join(
        broadcast(Tables.partsupp(spark, dir)),
        col("l_partkey") === col("ps_partkey") && col("l_suppkey") === col("ps_suppkey")
      )
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(
        col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        (expr("cast(cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(12,2))) * 10000 as bigint)")
          - col("ps_cost_cents") * 100L * col("l_quantity").cast("long")).as("amount_e4")
      )
      .groupBy("nation", "o_year")
      .agg(sum("amount_e4").as("profit_e4"))
      .orderBy(col("nation"), col("o_year").desc)

  /** Q49 — excess availability (TPC-H Q20, now the FULL shape with
    * `ps_availqty`): suppliers in one REGION (adapted from TPC-H's single
    * nation — the smallest testdata SF has nations with zero suppliers, a
    * region is populated at every SF) holding more than half their
    * shipped volume of one part-name family in stock — the nested-IN
    * ladder decorrelated exactly as [[q35ExcessShipments]] (semi joins
    * throughout, no duplicate-inflating inner join), but with the
    * availability comparison TPC-H actually specifies: `2 × availqty >
    * Σ qty`, held in integers on both engines. The shipped aggregate is
    * the only fact-table term; everything else is dim-sized.
    */
  def q49ExcessAvailability(spark: SparkSession, dir: String): DataFrame = {
    val shipped = Tables
      .lineitem(spark, dir)
      .where(
        col("l_shipdate") >= expr("timestamp_ntz'1997-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp_ntz'1998-01-01 00:00:00'")
      )
      .join(
        broadcast(Tables.part(spark, dir).where(col("p_name").like("small%")).select("p_partkey")),
        col("l_partkey") === col("p_partkey"),
        "left_semi"
      )
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val excess = Tables
      .partsupp(spark, dir)
      .join(shipped, col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey"))
      .where(col("ps_availqty") * 2L > col("qty"))
      .select("ps_suppkey")
      .distinct()
    val regionNations = Tables
      .nation(spark, dir)
      .join(
        broadcast(Tables.region(spark, dir).where(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey")
      )
      .select("n_nationkey")
    Tables
      .supplier(spark, dir)
      .join(broadcast(regionNations), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  def q35ExcessShipments(spark: SparkSession, dir: String): DataFrame = {
    val qualified = Tables
      .lineitem(spark, dir)
      .where(
        col("l_shipdate") >= expr("timestamp_ntz'1997-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp_ntz'1998-01-01 00:00:00'")
      )
      .join(
        broadcast(Tables.part(spark, dir).where(col("p_type") === "PROMO").select("p_partkey")),
        col("l_partkey") === col("p_partkey"),
        "left_semi"
      )
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
      .where(col("qty") > 50)
      .select("l_suppkey")
      .distinct()
    Tables
      .supplier(spark, dir)
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** Q50 — Bloom-PREFILTERED fact↔dim semi join: per-supplier shipment
    * volume restricted to one region's suppliers, with the fact scan
    * pre-filtered by a Bloom filter built from the dim keys (Spark's own
    * `bloom_filter_agg` / `might_contain` Catalyst expressions,
    * registered by [[graft.functions.SketchFunctions]]) BEFORE the join.
    *
    * The bloom is a pre-filter, never a truth source — survivors still
    * pass the exact semi join, so the output is identical to the plain
    * join and the oracle is the plain ANSI semi join. That is the d20
    * decontamination pattern applied to the TPC-H star: at 100 TB the
    * payoff is shuffle reduction when the dim is too large to broadcast
    * (no BroadcastHashJoin available) yet its key set still fits a few
    * MB of bloom bits — fact rows that cannot match are dropped at the
    * scan, so the join exchange moves only ~selectivity of the fact
    * stream plus the fpp tail. Locally the dim IS broadcast (100
    * suppliers), making the bloom pure overhead-measurement; the sizing
    * (20 bits/key ⇒ fpp ≈ 6e-5) and the filter→join composition are
    * what this query pins. Spark's AQE runtime bloom
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does this
    * implicitly when statistics line up; q50 is the EXPLICIT form a
    * pipeline reaches for when it knows the key set (e.g. a curated
    * allow-list) before the optimizer does.
    */
  /** Q51 — supplier BUSY DAYS: per supplier, merge the overlapping
    * [order date, ship date] intervals of its lineitems and total the
    * covered days — the canonical overlapping-interval-union shape
    * (time-in-state, utilization, on-call coverage) that naive
    * `SUM(end - start)` double-counts. The merge is the relational
    * island construction: order intervals by start within supplier,
    * running `max(end)` over all PRECEDING rows, an island opens where
    * `start` clears that running maximum, and a running sum of the open
    * flags numbers the islands. Deterministic regardless of tie order
    * (the running max is order-insensitive among equal starts).
    *
    * Scale shape: both windows and the two aggregates are keyed by
    * l_suppkey — one hash exchange, per-key state bounded by one
    * supplier's lineitems, no self-join (the O(n²) overlap join this
    * shape tempts). Fine at 100 TB wherever a single key's interval
    * count fits a partition, the same bound every per-entity window in
    * this repo carries.
    */
  def q51SupplierBusyDays(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = Tables
      .lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(
        col("l_suppkey"),
        col("o_orderdate").cast("date").as("d0"),
        col("l_shipdate").cast("date").as("d1")
      )
    val wOrd = Window.partitionBy("l_suppkey").orderBy("d0", "d1")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv
      .withColumn("prev_max", max("d1").over(wRun))
      .withColumn(
        "opens",
        when(col("prev_max").isNull || col("d0") > col("prev_max"), 1L).otherwise(0L)
      )
      .withColumn("island", sum("opens").over(wCum))
      .groupBy("l_suppkey", "island")
      .agg(min("d0").as("s"), max("d1").as("e"))
      .groupBy("l_suppkey")
      .agg(
        count(lit(1)).as("n_busy_periods"),
        sum(datediff(col("e"), col("s")) + 1).cast("long").as("busy_days")
      )
      .orderBy("l_suppkey")
  }

  def q50BloomPrefilterJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SketchFunctions.register(spark)
    val dim = Tables
      .supplier(spark, dir)
      .join(
        broadcast(
          Tables
            .nation(spark, dir)
            .join(
              broadcast(Tables.region(spark, dir).where(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey")
            )
            .select("n_nationkey")
        ),
        col("s_nationkey") === col("n_nationkey")
      )
      .select("s_suppkey")
    // ONE materialization of the dim side (bounded: one region's suppliers —
    // the same size argument that makes it the broadcast side). The key
    // array feeds nItems, the bloom build and the semi-join probe; the
    // previous shape re-ran the supplier⋈nation⋈region scan for each.
    import spark.implicits._
    val keys: Array[Long] = dim.as[Long].collect()
    val nItems            = math.max(keys.length.toLong, 1L)
    val nBits             = math.max(1024L, nItems * 20L)
    val dimLocal          = keys.toSeq.toDF("s_suppkey")
    val bf = dimLocal
      .agg(call_function("bloom_filter_agg", col("s_suppkey"), lit(nItems), lit(nBits)).as("bf"))
      .head()
      .getAs[Array[Byte]](0)
    Tables
      .lineitem(spark, dir)
      .where(call_function("might_contain", lit(bf), col("l_suppkey")))
      .join(broadcast(dimLocal), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_suppkey")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).cast("long").as("sum_qty")
      )
      .orderBy("l_suppkey")
  }
}
