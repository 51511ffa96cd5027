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

  /** Pure-Scala reference model of the funnel semantics — independent of
    * both Spark implementations, for the randomized three-way differential.
    */
  private def modelFunnel(events: Seq[(Long, String, Long)], w: Long): (Long, Long, Long) = {
    var (ns, nc, np) = (0L, 0L, 0L)
    events.groupBy(_._1).foreach { case (_, evs) =>
      evs.filter(_._2 == "signup").map(_._3).minOption.foreach { st =>
        ns += 1
        evs.filter(e => e._2 == "click" && e._3 > st && e._3 <= st + w).map(_._3).minOption.foreach { ct =>
          nc += 1
          if (evs.exists(e => e._2 == "purchase" && e._3 > ct && e._3 <= ct + w)) np += 1
        }
      }
    }
    (ns, nc, np)
  }

  test("randomized three-way differential: model == Spark single-pass == streaming fold") {
    import org.scalacheck.Gen
    import spark.implicits._
    val W = graft.operators.Funnel.WindowMicros
    // hour-grid timestamps over 3 window-widths: boundary hits and ties are
    // likely by construction, which is where the three forms could diverge
    val evGen = for {
      user <- Gen.chooseNum(1L, 5L)
      typ  <- Gen.oneOf("signup", "click", "purchase", "view", "error")
      hour <- Gen.chooseNum(0L, 72L)
    } yield (user, typ, hour * 3600L * 1000000L)
    val corpusGen = Gen.listOfN(40, evGen)
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
    for ((corpus, i) <- samples(corpusGen, 6).zipWithIndex) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_fprop$i").toString
      corpus.zipWithIndex.map { case ((u, t, us), j) =>
        (j.toLong, u, t, new java.sql.Timestamp(us / 1000L))
      }.toDF("event_id", "user_id", "event_type", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val model = modelFunnel(corpus, W)
      val Array(row) = graft.operators.Funnel.funnelStages(spark, dir).collect()
      assert((row.getLong(0), row.getLong(1), row.getLong(2)) == model, s"spark != model on sample $i: $corpus")
      // streaming fold, one batch per user (updateUser sorts internally)
      val stages = corpus.groupBy(_._1).map { case (u, evs) =>
        val st = new TestGroupState[FunnelStream.FunnelState]
        FunnelStream
          .updateUser(u, evs.map(e => FunnelStream.FunnelEvent(u, e._2, e._3)).iterator, st)
          .toSeq.head.stage
      }.toSeq
      val streamed = (
        stages.count(_ >= 1).toLong,
        stages.count(_ >= 2).toLong,
        stages.count(_ >= 3).toLong
      )
      assert(streamed == model, s"stream fold != model on sample $i: $corpus")
    }
  }
}
