package graft

import graft.operators.SketchBounds
import org.apache.spark.sql.functions.col

/** The bounded companions' local gate: every within_bound row must be TRUE
  * (the driver's oracle asserts the same by hash) and the exact columns
  * must agree with their already-oracled exact twins where one exists.
  */
class SketchBoundsSpec extends SparkSpec {

  test("x1b: exact distinct matches, sketch within bound") {
    val r = SketchBounds.x1bApproxDistinctBound(spark, sf0001).head()
    val exact = graft.sources.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(r.getLong(0) == exact && r.getBoolean(1))
  }

  test("x3b: p50/p90 equal x2's exact percentiles; both rank gates hold") {
    val b = SketchBounds.x3bApproxPercentilesBound(spark, sf0001).collect()
    val x2 = graft.operators.CoreQueries.x2Percentiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(b.nonEmpty)
    b.foreach { r =>
      val (p50, p90) = x2(r.getString(0))
      assert(r.getDouble(1) == p50 && r.getDouble(2) == p90)
      assert(r.getBoolean(3) && r.getBoolean(4), r.getString(0))
    }
  }

  test("x4b: 5 ranked exact heavy hitters, sketch agreement bound true") {
    val rows = SketchBounds.x4bApproxTopUsersBound(spark, sf001).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 5L))
    assert(rows.map(_.getLong(2)).toSeq == rows.map(_.getLong(2)).toSeq.sorted(Ordering[Long].reverse))
    rows.foreach(r => assert(r.getBoolean(3)))
  }

  test("x5b: rollup total row present (nulls first), every bound true") {
    val rows = SketchBounds.x5bApproxDistinctRollupBound(spark, sf0001).collect()
    assert(rows.head.isNullAt(0)) // the rollup grand-total row
    assert(rows.length >= 2)
    rows.foreach(r => assert(r.getBoolean(2)))
  }

  test("dq3b: one row per events column, exact profile equals dq1, bounds true") {
    val b = SketchBounds.dq3bProfileEventsBound(spark, sf0001)
    val dq1 = graft.operators.Profile.profileEvents(spark, sf0001)
    assert(b.count() == dq1.count())
    assert(
      b.select("col_name", "n_rows", "n_nonnull", "n_distinct")
        .exceptAll(dq1).count() == 0)
    assert(b.where(!col("within_bound")).count() == 0)
  }
}
