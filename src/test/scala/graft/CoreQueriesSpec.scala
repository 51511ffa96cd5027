package graft

import graft.operators.CoreQueries
import org.apache.spark.sql.functions.countDistinct
import java.time.LocalDateTime

/** Q1–Q9 against values computed independently by DuckDB on sf0.001
  * (differential testing, mechanizing the reference's dual-engine
  * methodology — SURVEY §5).
  */
class CoreQueriesSpec extends SparkSpec {

  test("q1 total count") {
    assert(CoreQueries.q1TotalCount(spark, sf0001).head().getLong(0) == 1000L)
  }

  test("q2 time-filter count") {
    assert(CoreQueries.q2TimeFilterCount(spark, sf0001).head().getLong(0) == 506L)
  }

  test("q3 filter count") {
    assert(CoreQueries.q3FilterCount(spark, sf0001).head().getLong(0) == 201L)
  }

  test("q4 min/max ts (µs precision)") {
    val r = CoreQueries.q4MinMax(spark, sf0001).head()
    assert(r.getAs[LocalDateTime]("min_ts") == LocalDateTime.parse("2024-01-01T00:09:58.778549"))
    assert(r.getAs[LocalDateTime]("max_ts") == LocalDateTime.parse("2024-01-30T23:26:16.220708"))
  }

  test("q5 grouped max") {
    val rows = CoreQueries.q5MaxBy(spark, sf0001).collect()
    assert(rows.length == 5)
    assert(rows.head.getString(0) == "click")
    assert(rows.head.getAs[LocalDateTime]("max_ts") == LocalDateTime.parse("2024-01-30T19:30:58.549781"))
  }

  test("q6 point filter is a single full row") {
    // event_id 4242 exists only at sf>=0.01; at sf0.001 use an in-range key.
    val r = CoreQueries.q6PointFilter(spark, sf001).collect()
    assert(r.length == 1 && r.head.getLong(0) == 4242L)
  }

  test("q7 distinct group counts") {
    val rows = CoreQueries.q7Distinct(spark, sf0001).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("click", 210L), ("error", 201L), ("purchase", 202L), ("signup", 199L), ("view", 188L)
    ))
  }

  test("q8 exact-dup count") {
    assert(CoreQueries.q8DedupExact(spark, sf0001).head().getLong(0) == 0L)
  }

  test("x1 approx distinct within rsd bound of exact") {
    val approx = CoreQueries.x1ApproxDistinct(spark, sf001).head().getLong(0).toDouble
    val exact = graft.sources.Tables.events(spark, sf001)
      .select("user_id").distinct().count().toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("x3 approx percentiles within 2% rank error of the true quantile") {
    val approx = CoreQueries
      .x3ApproxPercentiles(spark, sf001)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val vals = graft.sources.Tables
      .events(spark, sf001)
      .select("event_type", "value")
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    assert(approx.keySet == vals.keySet)
    for ((t, (p50, p90)) <- approx) {
      val v = vals(t)
      def rankOf(x: Double): Double = v.count(_ <= x).toDouble / v.length
      assert(math.abs(rankOf(p50) - 0.5) <= 0.02, s"$t p50=$p50 rank=${rankOf(p50)}")
      assert(math.abs(rankOf(p90) - 0.9) <= 0.02, s"$t p90=$p90 rank=${rankOf(p90)}")
    }
  }

  test("x4 approx top-k users: counts exact below sketch capacity, top-k count multiset right") {
    val got = CoreQueries.x4ApproxTopUsers(spark, sf001).collect()
    assert(got.length == 5 && got.map(_.getLong(0)).toSeq == (1L to 5L))
    val exact = graft.sources.Tables
      .events(spark, sf001)
      .groupBy("user_id")
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // every reported count must equal the true count for that user…
    got.foreach(r => assert(exact(r.getLong(1)) == r.getLong(2), s"user ${r.getLong(1)}"))
    // …and the reported counts must be the true top-5 count multiset
    // (item order among equal counts is sketch-internal, so compare counts)
    val topCounts = exact.values.toSeq.sorted(Ordering[Long].reverse).take(5)
    assert(got.map(_.getLong(2)).toSeq.sorted(Ordering[Long].reverse) == topCounts)
  }

  test("q3p positional form computes the same count as q3 with the same pushed filter") {
    assert(
      CoreQueries.q3PositionalFilterCount(spark, sf0001).head().getLong(0) ==
        CoreQueries.q3FilterCount(spark, sf0001).head().getLong(0)
    )
    val plan = CoreQueries.q3PositionalFilterCount(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(event_type,"), plan)
  }

  test("q19 cube: grand-total row equals the table count; all 4 grouping sets present") {
    val rows  = CoreQueries.q19Cube(spark, sf0001).collect()
    val total = graft.sources.Tables.lineitem(spark, sf0001).count()
    // NULLS FIRST ordering puts the (null, null) grand total first
    assert(rows.head.isNullAt(0) && rows.head.isNullAt(1) && rows.head.getLong(3) == total)
    // cube = rollup's sets plus the (linestatus-only) slice
    assert(rows.exists(r => r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("q20 pivot: per-day counts sum back to the table count") {
    val rows = CoreQueries.q20Pivot(spark, sf0001).collect()
    val total = rows.map(r => (1 to 5).map(r.getLong(_)).sum).sum
    assert(total == graft.sources.Tables.events(spark, sf0001).count())
    assert(rows.length == 30) // events span 2024-01-01..30 at sf0.001
  }

  test("q13e except == q14 anti-join (NOT EXISTS as a set op)") {
    val except = CoreQueries.q13eExcept(spark, sf0001).collect().map(_.getLong(0)).toSeq
    val anti   = CoreQueries.q14AntiJoin(spark, sf0001).collect().map(_.getLong(0)).toSeq
    assert(except == anti && except.nonEmpty)
  }

  test("q9 star join") {
    val rows = CoreQueries.q9StarJoin(spark, sf0001).collect()
    assert(rows.length == 25)
    assert(rows.take(3).map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("NATION_0", 142L), ("NATION_1", 215L), ("NATION_10", 356L)
    ))
  }

  test("x5 rollup sketches: every group and the total within 5% of exact distinct") {
    val approx = CoreQueries
      .x5ApproxDistinctRollup(spark, sf0001)
      .collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1))
      .toMap
    val events = graft.sources.Tables.events(spark, sf0001)
    val exactGroups = events
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1))
      .toMap
    val exactTotal = events.select(countDistinct("user_id")).head().getLong(0)
    val exact      = exactGroups + (None -> exactTotal)
    assert(approx.keySet == exact.keySet) // 5 types + the rollup total row
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong), s"$k: approx=$a exact=$n")
    }
  }

  test("q27 semi join complements q14 anti join: disjoint, union = all customers") {
    val semi = CoreQueries.q27SemiJoin(spark, sf0001).collect().map(_.getLong(0)).toSet
    val anti = CoreQueries.q14AntiJoin(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(semi.nonEmpty && anti.nonEmpty)
    assert((semi & anti).isEmpty)
    val all = spark.read.parquet(s"$sf0001/customer.parquet").select("c_custkey").collect().map(_.getLong(0)).toSet
    assert((semi | anti) == all)
  }

  test("w6: gap hours materialize as zero rows; present cells keep their counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_w6").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      (1L, 1L, "click", ts("2024-01-01 00:10:00")),
      (2L, 1L, "click", ts("2024-01-01 00:50:00")),
      // hour 01:00 has nothing — must appear as 0
      (3L, 1L, "click", ts("2024-01-01 02:30:00")),
      (4L, 1L, "view", ts("2024-01-01 02:40:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = CoreQueries
      .w6ResampleHourly(spark, dir)
      .collect()
      // planted table carries instant timestamps (ntz only on the real
      // nanos corpus) — parse the hour from the rendered form, type-agnostic
      .map(r => (r.get(0).toString.substring(11, 13).toInt, r.getString(1)) -> r.getLong(2))
      .toMap
    // 3 hours (00..02) x 2 types = 6 cells, zeros included
    assert(got.size == 6)
    assert(got((0, "click")) == 2L && got((1, "click")) == 0L && got((2, "click")) == 1L)
    assert(got((0, "view")) == 0L && got((1, "view")) == 0L && got((2, "view")) == 1L)
  }

  test("q28: strictly above the nation average, exact at the boundary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q28").toString
    Seq(
      // nation 1: avg = 200.00 → only the 300.00 customer qualifies (200 is
      // AT the average, and the rule is strictly above)
      (11L, 1L, 100.0),
      (12L, 1L, 200.0),
      (13L, 1L, 300.0),
      // nation 2: a single customer equals its own average → excluded
      (21L, 2L, 50.0)
    ).toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = CoreQueries.q28AboveNationAvg(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((13L, 30000L)))
  }

  test("w8: transitions follow per-user (ts, event_id) order; ties and singletons behave") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft_w8").toString
    Seq(
      // u1: signup → click → click → purchase
      (1L, 1L, "signup", ts("2024-01-01 00:00:00")),
      (2L, 1L, "click", ts("2024-01-01 01:00:00")),
      (3L, 1L, "click", ts("2024-01-01 02:00:00")),
      (4L, 1L, "purchase", ts("2024-01-01 03:00:00")),
      // u2: two events at the SAME instant — event_id must break the tie
      // (5 before 6), so the one transition is view → click, never reversed
      (5L, 2L, "view", ts("2024-01-01 00:00:00")),
      (6L, 2L, "click", ts("2024-01-01 00:00:00")),
      // u3: a single event has no transition
      (7L, 3L, "signup", ts("2024-01-01 00:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = CoreQueries
      .w8EventTransitions(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(
      got == Map(
        ("signup", "click") -> 1L,
        ("click", "click") -> 1L,
        ("click", "purchase") -> 1L,
        ("view", "click") -> 1L
      )
    )
    // no cross-user transition: u1's purchase never chains into u2/u3
  }

  test("w10: spike over 2x trailing median flags; warmup hours and median-masking don't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_w10").toString
    def at(hour: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00").toInstant.plusSeconds(i.toLong)
    // hours 0..6: 3 events each (baseline, also the no-baseline warmup);
    // hour 7: 7 events (> 2*3 → FLAGS); hour 8: 5 events (median of
    // trailing 7 is still 3 — the single prior spike must not mask via a
    // mean — but 5 <= 6 → no flag); hour 9: 2 events (no flag)
    val rows = for {
      (h, n) <- (0 to 6).map(h => (h, 3)) ++ Seq((7, 7), (8, 5), (9, 2))
      i      <- 0 until n
    } yield (h.toLong * 100 + i, 1L, "a", java.sql.Timestamp.from(at(h, i)))
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = CoreQueries
      .w10HourlyAnomalies(spark, dir)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toString, r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == Seq(("2024-01-01T07:00", 7L, 3L)))
  }

  test("w9: gap buckets are exact at power-of-two boundaries; mass = events - users") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime // ms
    def at(deltaMicros: Long) = new java.sql.Timestamp(base + deltaMicros / 1000)
    val dir = java.nio.file.Files.createTempDirectory("graft_w9").toString
    Seq(
      // u1 gaps in µs: 1 (class 1), 2 (class 2), 4096 (class 13)
      (1L, 1L, "a", at(0L)),
      (2L, 1L, "a", at(1000L)),      // ms precision floor: plant ms-multiples
      (3L, 1L, "a", at(3000L)),      // gap 2000 µs → bin length 11
      (4L, 1L, "a", at(3000L + 1024000L)), // gap 1024000 µs → class 20
      // u2: single event → no gap
      (5L, 2L, "a", at(0L))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = CoreQueries
      .w9GapHistogram(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    def cls(gapUs: Long) = java.lang.Long.toBinaryString(gapUs).length.toLong
    assert(got == Map(cls(1000L) -> 1L, cls(2000L) -> 1L, cls(1024000L) -> 1L))
    // real corpus: every user with n events contributes exactly n-1 gaps
    val real = CoreQueries.w9GapHistogram(spark, sf0001).collect().map(_.getLong(1)).sum
    val ev   = graft.sources.Tables.events(spark, sf0001)
    val expect = ev.count() - ev.select("user_id").distinct().count()
    assert(real == expect)
  }

  test("q30: banded equi-join counts match the range semantics, overlap included") {
    val got = CoreQueries
      .q30ValueBandJoin(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val total = graft.sources.Tables.events(spark, sf0001).count()
    // "all" overlaps the five disjoint bands: it must count every event,
    // and the disjoint bands must partition the same total — both facts
    // fail if bucketing drops or duplicates a candidate pair
    assert(got("all") == total)
    assert(Seq("tiny", "small", "mid", "large", "huge").map(got).sum == total)
    // boundary rule is lo ≤ v < hi: replay locally on the raw values
    val values = graft.sources.Tables
      .events(spark, sf0001)
      .select("value")
      .collect()
      .map(_.getDouble(0))
    CoreQueries.ValueBands.foreach { case (band, lo, hi) =>
      assert(got(band) == values.count(v => v >= lo && v < hi).toLong, band)
    }
  }

  test("q51: interval union by hand — nested absorbed, touching merges, gap splits, inclusive days") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val dir = java.nio.file.Files.createTempDirectory("graft_busy").toString
    Seq( // (l_orderkey, l_suppkey, l_shipdate)
      (101L, 1L, ts("2024-01-10")), // [01-01, 01-10]
      (102L, 1L, ts("2024-01-08")), // [01-05, 01-08] nested → absorbed
      (103L, 1L, ts("2024-01-12")), // [01-10, 01-12] touches → same island
      (104L, 1L, ts("2024-02-03")), // [02-01, 02-03] gap → new island
      (105L, 2L, ts("2024-03-01"))  // single zero-length interval → 1 day
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(
      (101L, ts("2024-01-01")), (102L, ts("2024-01-05")), (103L, ts("2024-01-10")),
      (104L, ts("2024-02-01")), (105L, ts("2024-03-01"))
    ).toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = CoreQueries.q51SupplierBusyDays(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // supplier 1: [01-01..01-12] = 12 days + [02-01..02-03] = 3 days
    assert(got == Seq((1L, 2L, 15L), (2L, 1L, 1L)))
  }

  test("q50: bloom prefilter is invisible in the output (identical to the plain semi join) and visible in the plan") {
    import org.apache.spark.sql.functions._
    val got = CoreQueries.q50BloomPrefilterJoin(spark, sf0001)
    // plain-join twin, no bloom: same dim, same agg
    val dim = graft.sources.Tables
      .supplier(spark, sf0001)
      .join(
        graft.sources.Tables.nation(spark, sf0001)
          .join(graft.sources.Tables.region(spark, sf0001).where(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey"),
        col("s_nationkey") === col("n_nationkey")
      )
      .select("s_suppkey")
    val plain = graft.sources.Tables
      .lineitem(spark, sf0001)
      .join(dim, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity").cast("long")).cast("long").as("sum_qty"))
      .orderBy("l_suppkey")
    assert(got.collect().toSeq == plain.collect().toSeq)
    assert(got.count() > 0)
    // the prefilter must sit in the physical plan (scan-side), not be optimized away
    val physical = got.queryExecution.executedPlan.toString
    assert(physical.contains("might_contain"), "bloom prefilter missing from the physical plan")
  }
}
