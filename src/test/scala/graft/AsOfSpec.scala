package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {

  test("asof join on a hand-built fixture: inclusive, most-recent, inner") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, 10L), // key 1, ts 10 -> matches right ts 10 (inclusive)
      (101L, 1L, 25L), // key 1, ts 25 -> right ts 20
      (102L, 2L, 5L),  // key 2, ts 5  -> no prior right row: dropped
      (103L, 2L, 50L)  // key 2, ts 50 -> right ts 30
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (900L, 1L, 10L),
      (901L, 1L, 20L),
      (902L, 2L, 30L)
    ).toDF("click_id", "user_id", "ts")
    val got = AsOf
      .asofJoin(left, right, "user_id", "ts", "event_id", "click_id")
      .select("event_id", "click_id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(100L -> 900L, 101L -> 901L, 103L -> 902L))
  }

  test("a2 banded interval join equals the brute-force range join") {
    import org.apache.spark.sql.functions._
    val banded = AsOf.intervalPairCount(spark, sf0001).head().getLong(0)
    val events = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"))
    val brute = events.as("a")
      .join(events.as("b"), col("a.user_id") === col("b.user_id") && col("a.event_id") < col("b.event_id"))
      .where(abs(col("a.tus") - col("b.tus")) <= 300000000L)
      .count()
    assert(banded == brute && banded > 0)
  }

  test("a1 on real events: every match is the max prior click of that user") {
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables.eventsRaw(spark, sf0001)
    val got = AsOf.purchaseAsofClick(spark, sf0001)
    // property check computed independently via a (test-scale) range join
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val c = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id_x"), col("user_id"), col("ts").as("cts"))
    val expect = p
      .join(c, Seq("user_id"))
      .where(col("cts") <= col("pts"))
      .groupBy("purchase_id")
      .agg(max(struct(col("cts"), col("click_id_x"))).as("m"))
      .select(col("purchase_id"), col("m.click_id_x").as("click_id"))
    assert(got.count() > 0)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("a4 forward asof: earliest at-or-after match, inclusive, inner — planted") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft_a4").toString
    Seq(
      // user 1: clicks before AND after the purchase — forward picks the after one
      (1L, 1L, "click", ts("2024-01-01 00:01:00")),
      (2L, 1L, "purchase", ts("2024-01-01 00:03:00")),
      (3L, 1L, "click", ts("2024-01-01 00:05:00")),
      (4L, 1L, "click", ts("2024-01-01 00:07:00")), // later click loses to the earlier one
      // user 2: click exactly AT the purchase instant — inclusive match
      (5L, 2L, "purchase", ts("2024-01-01 00:10:00")),
      (6L, 2L, "click", ts("2024-01-01 00:10:00")),
      // user 3: only a prior click — forward drops the purchase (inner)
      (7L, 3L, "click", ts("2024-01-01 00:01:00")),
      (8L, 3L, "purchase", ts("2024-01-01 00:09:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AsOf
      .purchaseAsofNextClick(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(2L -> 3L, 5L -> 6L))
  }

  test("a4 on real events mirrors a1's property with the inequality flipped") {
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables.eventsRaw(spark, sf0001)
    val got = AsOf.purchaseAsofNextClick(spark, sf0001)
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val c = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id_x"), col("user_id"), col("ts").as("cts"))
    val expect = p
      .join(c, Seq("user_id"))
      .where(col("cts") >= col("pts"))
      .groupBy("purchase_id")
      .agg(min(struct(col("cts"), col("click_id_x"))).as("m"))
      .select(col("purchase_id"), col("m.click_id_x").as("click_id"))
    assert(got.count() > 0)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("a5: nearest picks the closer side, ties go backward, one-sided and no-click behave") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft_a5").toString
    Seq(
      // u1: click 2h before and 1h after → forward wins
      (10L, 1L, "click", ts("2024-01-01 08:00:00")),
      (11L, 1L, "purchase", ts("2024-01-01 10:00:00")),
      (12L, 1L, "click", ts("2024-01-01 11:00:00")),
      // u2: click exactly 1h either side → TIE → backward (id 20)
      (20L, 2L, "click", ts("2024-01-01 09:00:00")),
      (21L, 2L, "purchase", ts("2024-01-01 10:00:00")),
      (22L, 2L, "click", ts("2024-01-01 11:00:00")),
      // u3: only a forward click exists
      (31L, 3L, "purchase", ts("2024-01-01 10:00:00")),
      (32L, 3L, "click", ts("2024-01-01 23:00:00")),
      // u4: only a backward click exists
      (40L, 4L, "click", ts("2024-01-01 01:00:00")),
      (41L, 4L, "purchase", ts("2024-01-01 10:00:00")),
      // u5: purchase with NO click at all → absent from the result
      (51L, 5L, "purchase", ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AsOf
      .purchaseNearestClick(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(11L -> 12L, 21L -> 20L, 31L -> 32L, 41L -> 40L))
  }

  test("same-instant clicks resolve to the MIN event_id in every asof direction") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_tie").toString
    // ids deliberately planted larger-first so the file's physical row order
    // disagrees with the tie rule — only a total window order passes
    Seq(
      // u1: TWO clicks at the same instant 1h before the purchase and two
      // more at the same instant 1h after: backward pair ties on |Δt| with
      // the forward pair (→ backward direction wins), and within each
      // direction the same-µs pair must resolve to the min id
      (6L, 1L, "click", ts("2024-01-01 09:00:00")),
      (5L, 1L, "click", ts("2024-01-01 09:00:00")),
      (7L, 1L, "purchase", ts("2024-01-01 10:00:00")),
      (9L, 1L, "click", ts("2024-01-01 11:00:00")),
      (8L, 1L, "click", ts("2024-01-01 11:00:00")),
      // u2: forward-only same-instant pair
      (11L, 2L, "purchase", ts("2024-01-01 10:00:00")),
      (13L, 2L, "click", ts("2024-01-01 11:00:00")),
      (12L, 2L, "click", ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(toMap(AsOf.purchaseAsofClick(spark, dir)) == Map(7L -> 5L))
    assert(toMap(AsOf.purchaseAsofNextClick(spark, dir)) == Map(7L -> 8L, 11L -> 12L))
    assert(toMap(AsOf.purchaseAsofClickWithin(spark, dir)) == Map(7L -> 5L))
    assert(toMap(AsOf.purchaseNearestClick(spark, dir)) == Map(7L -> 5L, 11L -> 12L))
  }

  test("a5 composes a1/a4: every nearest match is one of the directional matches") {
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val near = toMap(AsOf.purchaseNearestClick(spark, sf0001))
    val back = toMap(AsOf.purchaseAsofClick(spark, sf0001))
    val fwd  = toMap(AsOf.purchaseAsofNextClick(spark, sf0001))
    assert(near.keySet == (back.keySet ++ fwd.keySet))
    near.foreach { case (p, c) =>
      assert(back.get(p).contains(c) || fwd.get(p).contains(c), s"purchase $p")
    }
    assert(near.nonEmpty)
  }
}
