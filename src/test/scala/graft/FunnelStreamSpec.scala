package graft

import graft.streaming.FunnelStream
import org.apache.spark.sql.functions._

/** The stateful streaming funnel must agree with the batch operator when
  * events arrive in event-time order across micro-batches (the
  * watermark-ordered replay production fronts it with).
  */
class FunnelStreamSpec extends SparkSpec {

  private def streamedCounts(sink: String): (Long, Long, Long) = {
    // update-mode sink: stage is monotone per user, so max() is the latest
    val stages = spark
      .table(sink)
      .groupBy("user_id")
      .agg(max("stage").as("stage"))
      .collect()
      .map(_.getInt(1))
    (
      stages.count(_ >= 1).toLong,
      stages.count(_ >= 2).toLong,
      stages.count(_ >= 3).toLong
    )
  }

  test("stateful streaming funnel == batch w3 across staged micro-batches") {
    val dir     = java.nio.file.Files.createTempDirectory("graft_fun_mb")
    val staging = java.nio.file.Files.createTempDirectory("graft_fun_stage")
    val events  = graft.sources.Tables.events(spark, sf0001)
    val mid     = "2024-01-15 00:00:00"
    def stage(cond: org.apache.spark.sql.Column, out: String): Unit = {
      events.where(cond).coalesce(1).write.mode("overwrite").parquet(s"$staging/$out")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(out)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"$out.parquet")
      )
    }
    stage(col("ts") < mid, "b1")
    val q = FunnelStream.funnelStagesStateful(spark, dir.toString, "funnel_mb_sink")
    try {
      q.processAllAvailable()
      stage(col("ts") >= mid, "b2")
      q.processAllAvailable()
    } finally q.stop()
    val Array(row) = graft.operators.Funnel.funnelStages(spark, sf0001).collect()
    val batch      = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(streamedCounts("funnel_mb_sink") == batch)
    assert(batch._1 > 0L)
  }

  test("state transition: anchors set once, windows enforced, cross-batch carry") {
    import FunnelStream._
    val W  = graft.operators.Funnel.WindowMicros
    val st = new TestGroupState[FunnelState]
    // batch 1: signup, then a click INSIDE the window
    val out1 = updateUser(
      1L,
      Iterator(FunnelEvent(1L, "signup", 0L), FunnelEvent(1L, "click", W / 2)),
      st
    ).toSeq
    assert(out1.head.stage == 2)
    // batch 2: purchase outside the click window does nothing; a later one
    // inside it completes the funnel only if it is the FIRST qualifying one
    val out2 = updateUser(1L, Iterator(FunnelEvent(1L, "purchase", W / 2 + W + 1)), st).toSeq
    assert(out2.head.stage == 2)
    val out3 = updateUser(1L, Iterator(FunnelEvent(1L, "purchase", W / 2 + W)), st).toSeq
    assert(out3.head.stage == 3)
    // a second, earlier signup in a later batch cannot move the anchor
    assert(st.get.sT == 0L)
  }
}
