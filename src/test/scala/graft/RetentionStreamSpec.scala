package graft

import graft.streaming.RetentionStream
import org.apache.spark.sql.functions._

/** The stateful streaming retention counter must agree with batch u1 when
  * events arrive in event-time order across micro-batch cuts.
  */
class RetentionStreamSpec extends SparkSpec {

  test("stateful streaming retention == batch u1 across staged micro-batches") {
    val dir     = java.nio.file.Files.createTempDirectory("graft_ret_mb")
    val staging = java.nio.file.Files.createTempDirectory("graft_ret_stage")
    val events  = graft.sources.Tables.events(spark, sf0001)
    // split MID-history: users active on both sides exercise the carried
    // (cohort, offset-mask) state — a per-batch fold would re-cohort them
    val mid = "2024-01-15 00:00:00"
    def stage(cond: org.apache.spark.sql.Column, out: String): Unit = {
      events.where(cond).coalesce(1).write.mode("overwrite").parquet(s"$staging/$out")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(out)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"$out.parquet")
      )
    }
    stage(col("ts") < mid, "b1")
    val q = RetentionStream.retentionStateful(spark, dir.toString, "retention_mb_sink")
    try {
      q.processAllAvailable()
      stage(col("ts") >= mid, "b2")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark
      .table("retention_mb_sink")
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .select(
        date_add(lit("1970-01-01").cast("date"), col("cohort_day")).as("cohort_day"),
        col("day_offset"),
        col("n_users")
      )
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    val batch = graft.operators.Retention
      .retentionCohorts(spark, sf0001)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
    val usersBefore =
      events.where(col("ts") < mid).select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val usersAfter =
      events.where(col("ts") >= mid).select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert((usersBefore & usersAfter).nonEmpty, "cut must split at least one journey")
  }

  test("state carry: cohort anchors once, offsets dedup, horizon and late days drop") {
    import RetentionStream._
    val st = new TestGroupState[RetState]
    // batch 1: days 100 (cohort) and 103, day 100 repeated → emitted once
    val out1 = updateUser(1L, Iterator(DayEvent(1L, 103), DayEvent(1L, 100), DayEvent(1L, 100)), st).toSeq
    assert(out1 == Seq(CohortHit(100, 0L), CohortHit(100, 3L)))
    assert(st.get == RetState(100, (1L << 0) | (1L << 3)))
    // batch 2: repeat of day 103 (no re-emit), new day 105, day 130 past
    // the 14-day horizon (cut, not stored), late day 99 (dropped — the
    // cohort must not rewrite)
    val out2 = updateUser(
      1L,
      Iterator(DayEvent(1L, 103), DayEvent(1L, 105), DayEvent(1L, 130), DayEvent(1L, 99)),
      st
    ).toSeq
    assert(out2 == Seq(CohortHit(100, 5L)))
    assert(st.get == RetState(100, (1L << 0) | (1L << 3) | (1L << 5)))
    // empty batch: no output, state untouched
    assert(updateUser(1L, Iterator.empty, st).isEmpty)
  }
}
