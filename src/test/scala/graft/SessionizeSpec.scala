package graft

import graft.streaming.Sessionize

class SessionizeSpec extends SparkSpec {

  test("stateful streaming session counts == batch session counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet")
    )
    val q = Sessionize.sessionCountsStateful(spark, dir.toString, "sess_sink")
    try q.processAllAvailable()
    finally q.stop()
    // update-mode sink: last emitted row per user is the running count
    val streamed = spark
      .table("sess_sink")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("n_sessions").as("n_sessions"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val batch = Sessionize
      .sessionCountsBatch(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("state carries across real micro-batches (staged file arrival)") {
    import org.apache.spark.sql.functions._
    val dir     = java.nio.file.Files.createTempDirectory("graft_sess_mb")
    val staging = java.nio.file.Files.createTempDirectory("graft_sess_stage")
    val events  = graft.sources.Tables.events(spark, sf0001)
    val mid     = "2024-01-15 00:00:00"
    def stage(cond: org.apache.spark.sql.Column, out: String): Unit = {
      events.where(cond).coalesce(1).write.mode("overwrite").parquet(s"$staging/$out")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(out)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"$out.parquet")
      )
    }
    // batch 1 (first half of the month) is present at query start…
    stage(col("ts") < mid, "b1")
    val q = Sessionize.sessionCountsStateful(spark, dir.toString, "sess_mb_sink")
    try {
      q.processAllAvailable()
      // …then the second half arrives as a separate micro-batch
      stage(col("ts") >= mid, "b2")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark
      .table("sess_mb_sink")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("n_sessions").as("n_sessions"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val batch = Sessionize
      .sessionCountsBatch(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(streamed == batch)
  }

  test("state transition splits on >30min gaps across batches") {
    import Sessionize._
    // simulate two micro-batches via two updateUser calls on carried state
    val st = new TestGroupState[UserSessions]
    val min = 60L * 1000 * 1000
    val out1 = updateUser(1L, Iterator(SessionEvent(1L, 0L), SessionEvent(1L, 10 * min)), st).toSeq
    assert(out1.head.n_sessions == 1L) // 10min gap: same session
    val out2 = updateUser(1L, Iterator(SessionEvent(1L, 50 * min), SessionEvent(1L, 120 * min)), st).toSeq
    assert(out2.head.n_sessions == 3L) // 40min gap then 70min gap: two new sessions
  }
}

/** Minimal GroupState stub for unit-testing the transition function. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  private var v: Option[S] = None
  override def exists: Boolean = v.isDefined
  override def get: S = v.get
  override def getOption: Option[S] = v
  override def update(newState: S): Unit = v = Some(newState)
  override def remove(): Unit = v = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
