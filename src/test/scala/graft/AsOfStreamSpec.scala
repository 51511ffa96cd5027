package graft

import graft.streaming.AsOfStream
import org.apache.spark.sql.functions._

/** The stateful streaming as-of join must agree with the batch a1 operator
  * when events arrive in event-time order across micro-batches (the
  * watermark-ordered replay production fronts it with), and its per-user
  * fold must pin the batch window's exact tie semantics.
  */
class AsOfStreamSpec extends SparkSpec {

  test("streaming as-of == batch a1 across staged micro-batches") {
    val dir     = java.nio.file.Files.createTempDirectory("graft_asof_mb")
    val staging = java.nio.file.Files.createTempDirectory("graft_asof_stage")
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
    val q = AsOfStream.purchaseAsofClickStateful(spark, dir.toString, "asof_mb_sink")
    try {
      q.processAllAvailable()
      stage(col("ts") >= mid, "b2")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark
      .table("asof_mb_sink")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val batch = graft.operators.AsOf
      .purchaseAsofClick(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(batch.nonEmpty)
    assert(streamed == batch, s"missing ${batch -- streamed}, extra ${streamed -- batch}")
  }

  test("fold semantics: inclusive match, min-id same-instant tie, cross-batch carry, no revision") {
    import AsOfStream._
    val st = new TestGroupState[LastClick]
    // batch 1: click(id 5) and purchase at the SAME instant -> inclusive match;
    // a same-instant click with smaller id (3) arrives in the same batch and wins the tie
    val out1 = updateUser(
      1L,
      Iterator(
        AsOfEvent(1L, "purchase", 100L, 10L),
        AsOfEvent(1L, "click", 5L, 10L),
        AsOfEvent(1L, "click", 3L, 10L)
      ),
      st
    ).toSeq
    assert(out1 == Seq(AsOfMatch(100L, 3L)), s"got $out1")
    assert(st.get == LastClick(10L, 3L))
    // batch 2: purchase with no intervening click carries the stored match
    val out2 = updateUser(1L, Iterator(AsOfEvent(1L, "purchase", 101L, 20L)), st).toSeq
    assert(out2 == Seq(AsOfMatch(101L, 3L)))
    // batch 3: a LATE click older than the stored one is ignored; a newer one replaces
    val out3 = updateUser(
      1L,
      Iterator(AsOfEvent(1L, "click", 9L, 5L), AsOfEvent(1L, "click", 7L, 30L), AsOfEvent(1L, "purchase", 102L, 40L)),
      st
    ).toSeq
    assert(out3 == Seq(AsOfMatch(102L, 7L)))
    assert(st.get == LastClick(30L, 7L))
    // purchases before any click never match (inner semantics)
    val st2  = new TestGroupState[LastClick]
    val out4 = updateUser(2L, Iterator(AsOfEvent(2L, "purchase", 200L, 1L)), st2).toSeq
    assert(out4.isEmpty && st2.getOption.isEmpty)
  }

  test("randomized differential: streaming fold == batch window on tie-heavy corpora") {
    import org.scalacheck.Gen
    import spark.implicits._
    // coarse 10-instant grid over 5 users: same-instant click/purchase
    // collisions and multi-click ties are likely by construction
    val evGen = for {
      user <- Gen.chooseNum(1L, 5L)
      typ  <- Gen.oneOf("click", "purchase", "view")
      t    <- Gen.chooseNum(0L, 9L)
    } yield (user, typ, t * 1000000L)
    val corpusGen = Gen.listOfN(30, evGen)
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
    for ((corpus, i) <- samples(corpusGen, 5).zipWithIndex) {
      val rows = corpus.zipWithIndex.map { case ((u, t, us), j) =>
        (j.toLong, u, t, new java.sql.Timestamp(us / 1000L))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_asprop$i").toString
      rows.toDF("event_id", "user_id", "event_type", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = graft.operators.AsOf
        .purchaseAsofClick(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      // streaming fold, whole corpus as one batch per user (sorted internally)
      val streamed = corpus.zipWithIndex
        .collect { case ((u, t, us), j) if t == "click" || t == "purchase" =>
          AsOfStream.AsOfEvent(u, t, j.toLong, us)
        }
        .groupBy(_.user_id)
        .flatMap { case (u, evs) =>
          AsOfStream.updateUser(u, evs.iterator, new TestGroupState[AsOfStream.LastClick]).toSeq
        }
        .map(m => (m.purchase_id, m.click_id))
        .toSet
      assert(streamed == batch, s"sample $i: missing ${batch -- streamed}, extra ${streamed -- batch}\n$corpus")
    }
  }
}
