package graft

import graft.streaming.IntervalJoinStream
import org.apache.spark.sql.functions._

/** The stream-stream interval join must (1) reproduce a2's exact pair set
  * across staged micro-batches, (2) actually EVICT join state under the
  * watermark — the bounded-state property that makes the pattern viable on
  * an unbounded stream — and (3) land idempotently under checkpoint replay
  * through the shared batch_id-overwrite contract.
  */
class IntervalJoinStreamSpec extends SparkSpec {

  private def pairSet(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
    rows.map(r => (r.getLong(0), r.getLong(1))).toSet

  test("stream-stream interval join == batch a2 pairs across staged micro-batches; watermark evicts state") {
    val dir     = java.nio.file.Files.createTempDirectory("graft_ivj")
    val staging = java.nio.file.Files.createTempDirectory("graft_ivj_stage")
    val events  = graft.sources.Tables.events(spark, sf0001)
    def stage(cond: org.apache.spark.sql.Column, out: String): Unit = {
      events.where(cond).coalesce(1).write.mode("overwrite").parquet(s"$staging/$out")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(out)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"$out.parquet")
      )
    }
    // three event-time-ordered stages so the final batch's surviving state
    // is provably smaller than the corpus
    val cuts = Seq("2024-01-10 00:00:00", "2024-01-20 00:00:00")
    stage(col("ts") < cuts(0), "b1")
    val q = IntervalJoinStream.intervalPairStream(spark, dir.toString, dir.toString, "ivj_sink")
    val (stateRows, removedRows) =
      try {
        q.processAllAvailable()
        stage(col("ts") >= cuts(0) && col("ts") < cuts(1), "b2")
        q.processAllAvailable()
        stage(col("ts") >= cuts(1), "b3")
        q.processAllAvailable()
        val sos = q.recentProgress.flatMap(_.stateOperators)
        (sos.lastOption.map(_.numRowsTotal).getOrElse(0L), sos.map(_.numRowsRemoved).sum)
      } finally q.stop()
    val streamed = pairSet(spark.table("ivj_sink").collect())
    val batch    = pairSet(graft.operators.AsOf.intervalPairs(spark, sf0001).collect())
    assert(batch.nonEmpty)
    assert(streamed == batch, s"missing ${(batch -- streamed).take(5)}, extra ${(streamed -- batch).take(5)}")
    // the count twin is the same enumeration reduced
    val cnt = graft.operators.AsOf.intervalPairCount(spark, sf0001).head().getLong(0)
    assert(cnt == batch.size.toLong)
    // bounded state: eviction must have actually run (rows removed), and
    // the surviving state must be well under the no-eviction total of
    // 2 sides x |events|
    val totalEvents = events.count()
    assert(removedRows > 0, "watermark removed no join state")
    assert(
      stateRows < totalEvents,
      s"state not bounded: $stateRows rows survive vs $totalEvents events (2x that with no eviction)"
    )
  }

  test("left-outer enrichment: matches as they arrive, nulls once provably final — == batch left join") {
    val dir     = java.nio.file.Files.createTempDirectory("graft_ivjo")
    val staging = java.nio.file.Files.createTempDirectory("graft_ivjo_stage")
    val events  = graft.sources.Tables.events(spark, sf0001)
    def stage(cond: org.apache.spark.sql.Column, out: String): Unit = {
      events.where(cond).coalesce(1).write.mode("overwrite").parquet(s"$staging/$out")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(out)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"$out.parquet")
      )
    }
    val cuts = Seq("2024-01-10 00:00:00", "2024-01-20 00:00:00")
    stage(col("ts") < cuts(0), "b1")
    val q = IntervalJoinStream.intervalEnrichStream(spark, dir.toString, dir.toString, "ivjo_sink")
    try {
      q.processAllAvailable()
      stage(col("ts") >= cuts(0) && col("ts") < cuts(1), "b2")
      q.processAllAvailable()
      stage(col("ts") >= cuts(1), "b3")
      q.processAllAvailable()
    } finally q.stop()
    def pairSetOpt(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Option[Long])] =
      rows.map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    val streamed = pairSetOpt(spark.table("ivjo_sink").collect())
    // batch twin: plain left join under the same condition
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val batch = pairSetOpt(
      p.join(
        c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 300 SECONDS") &&
          col("c_ts") <= col("p_ts") + expr("INTERVAL 300 SECONDS"),
        "left_outer"
      ).select("purchase_id", "click_id").collect()
    )
    assert(batch.exists(_._2.isEmpty) && batch.exists(_._2.nonEmpty), "fixture needs both outcomes")
    // every streamed row is a batch row (no spurious nulls or matches)
    assert((streamed -- batch).isEmpty, s"spurious: ${(streamed -- batch).take(5)}")
    // every MATCHED batch row arrived (inner matches never wait on the watermark)
    assert(batch.filter(_._2.nonEmpty).subsetOf(streamed))
    // nulls: complete for the provably-final prefix. The watermark active
    // while batch 3 runs is derived from the END of batch 2 (watermarks
    // lag one batch), so the provable horizon is batch 2's max event time
    // minus delay minus gap; later nulls stay pending on a drained source
    // by design.
    val maxTs = events.where(col("ts") < cuts(1))
      .agg(max(unix_micros(col("ts").cast("timestamp")))).head().getLong(0)
    val horizonUs = maxTs - (10 * 60 + 300) * 1000000L
    val finalNulls = pairSetOpt(
      p.join(
        c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 300 SECONDS") &&
          col("c_ts") <= col("p_ts") + expr("INTERVAL 300 SECONDS"),
        "left_outer"
      ).where(col("click_id").isNull && unix_micros(col("p_ts").cast("timestamp")) < horizonUs)
        .select("purchase_id", "click_id").collect()
    )
    assert(finalNulls.subsetOf(streamed), s"missing final nulls: ${(finalNulls -- streamed).take(5)}")
    assert(finalNulls.nonEmpty, "horizon must leave a provable prefix")
  }

  test("checkpointed variant: batch_id overwrite makes replay idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft_ivj_ck")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      src.resolve("part-0.parquet")
    )
    val out = s"$base/out"
    val q = IntervalJoinStream.intervalPairStreamCheckpointed(
      spark, src.toString, src.toString, out, s"$base/ckpt"
    )
    try q.processAllAvailable()
    finally q.stop()
    val landed = pairSet(spark.read.parquet(s"$out/pairs").select("a_event_id", "b_event_id").collect())
    val batch  = pairSet(graft.operators.AsOf.intervalPairs(spark, sf0001).collect())
    assert(landed == batch && landed.nonEmpty)
    // replay batch 0's joined rows under the same batch_id: same directory
    // rewritten, no duplication
    IntervalJoinStream.processBatch(graft.operators.AsOf.intervalPairs(spark, sf0001), out, 0L)
    val replayed = pairSet(spark.read.parquet(s"$out/pairs").select("a_event_id", "b_event_id").collect())
    assert(replayed == landed)
  }
}
