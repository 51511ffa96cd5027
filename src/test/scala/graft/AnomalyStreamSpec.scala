package graft

import graft.streaming.AnomalyStream
import org.apache.spark.sql.functions._

/** The streaming anomaly rule must agree with batch w10 on a full in-order
  * replay (alerts exist only for CLOSED hours, so the replay appends one
  * sentinel event two hours past the end to close the final real hour), and
  * its fold must pin the batch frame's exact semantics: 7-observed-hour
  * warmup, row-based (gap-skipping) trailing window, low-median tie, late
  * events dropped once the decision is final.
  */
class AnomalyStreamSpec extends SparkSpec {

  test("streaming anomalies == batch w10 across staged micro-batches") {
    val dir     = java.nio.file.Files.createTempDirectory("graft_anom_mb")
    val staging = java.nio.file.Files.createTempDirectory("graft_anom_stage")
    val events  = graft.sources.Tables.events(spark, sf0001)
    val mid     = "2024-01-15 00:00:00"
    def stage(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$staging/$out")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(out)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"$out.parquet")
      )
    }
    stage(events.where(col("ts") < mid), "b1")
    val q = AnomalyStream.hourlyAnomaliesStateful(spark, dir.toString, "anom_mb_sink")
    try {
      q.processAllAvailable()
      stage(events.where(col("ts") >= mid), "b2")
      q.processAllAvailable()
      // sentinel: closes the final real hour (its own hour never closes and
      // cannot alert — it has no later observation)
      val maxUs = events.agg(max(unix_micros(col("ts").cast("timestamp")))).head().getLong(0)
      stage(
        events
          .limit(1)
          .withColumn("ts", expr(s"timestamp_micros(${maxUs + 7200000000L}L)").cast(events.schema("ts").dataType)),
        "b3"
      )
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark
      .table("anom_mb_sink")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val batch = graft.operators.CoreQueries
      .w10HourlyAnomalies(spark, sf0001)
      .select(unix_micros(col("hour").cast("timestamp")).as("h"), col("cnt"), col("med"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(batch.nonEmpty, "sf0.001 must contain at least one hourly anomaly for this test to have teeth")
    assert(streamed == batch, s"missing ${batch -- streamed}, extra ${streamed -- batch}")
  }

  test("fold semantics: warmup, gap-skipping row window, spike alert, late drop") {
    import AnomalyStream._
    val hour = 3600L * 1000000L
    val st   = new TestGroupState[AnomState]
    // hours 0..6: one event each (warmup — no alert possible before 7
    // closed hours exist)
    val warm = (0 until 7).map(h => TsEvent(h * hour))
    assert(updateAll(0, warm.iterator, st).isEmpty)
    // hour 7 spikes to 3; closing it (first hour-8 event) must alert with
    // med = 1 over the 7 warmup hours
    val spike = Seq(TsEvent(7 * hour), TsEvent(7 * hour + 1), TsEvent(7 * hour + 2))
    assert(updateAll(0, spike.iterator, st).isEmpty, "open hour must not alert early")
    val closed = updateAll(0, Iterator(TsEvent(8 * hour)), st).toSeq
    assert(closed == Seq(Alert(7 * hour, 3L, 1L)), s"got $closed")
    // a LATE event for hour 5 (decision already final) is dropped, not
    // retro-applied
    assert(updateAll(0, Iterator(TsEvent(5 * hour + 10)), st).isEmpty)
    assert(st.get.openHour == 8 * hour && st.get.openCnt == 1L)
    // gap: jumping to hour 12 closes hour 8 against the previous 7
    // OBSERVED hours (rows, not calendar) — trail is now h1..h7 with the
    // spike count 3 among them, median still 1
    val gap = updateAll(0, Iterator(TsEvent(12 * hour)), st).toSeq
    assert(gap.isEmpty, "cnt 1 is not an anomaly")
    assert(st.get.trail.map(_.hour) == (2 to 8).map(_.toLong * hour).toList)
    assert(st.get.openHour == 12 * hour)
  }
}
