package graft

import graft.operators.Dedup
import graft.streaming.LssStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the streaming LSS maintenance family ([[LssStream]]): every
  * snapshot in the chain equals the n19 full recompute over the documents
  * ingested so far, including the corners that make incremental LSS
  * non-trivial —
  *   - IMPROVEMENT: an early doc's answer grows when a later batch lands
  *     a doc sharing a LONGER run;
  *   - FP TIE: same length, smaller fingerprint arriving later flips the
  *     stored row (the (max len, min md5) rule is over ALL shared spans,
  *     not frozen at first write);
  *   - FIRST SHARE: a doc that shared nothing gains its first row when
  *     its partner finally arrives;
  *   - batch-INTERNAL sharing (two docs of the same micro-batch);
  * plus idempotent replay (re-running the last batch rewrites the same
  * snapshot) and the `_scheme` cap guard.
  */
class LssStreamSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "t", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def snap(dir: String, id: Long): Map[Long, (Long, String)] =
    LssStream
      .longestSharedSubstringStreamed(spark, dir, Some(id))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  private def scratch(docs: DataFrame): Map[Long, (Long, String)] =
    Dedup.longestSharedSubstringFrom(docs, 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("snapshot chain == n19 full recompute at every batch; all corners") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lss_stream").toString
    // batch 0: docs 1/2 share "a b" (internal sharing); doc 3 shares
    // nothing yet; doc 4 carries "p q r s" alone
    val b0 = docsDf(
      1L -> "a b x1",
      2L -> "a b x2",
      3L -> "m n o x3",
      4L -> "p q r s x4"
    )
    LssStream.processBatch(b0, dir, 0L)
    val s0 = snap(dir, 0L)
    assert(s0 == scratch(b0))
    assert(s0(1L)._1 == 2L && !s0.contains(3L) && !s0.contains(4L))
    // batch 1: doc 5 shares the LONGER "p q r s" with 4 (improvement from
    // nothing for 4), doc 6 gives 3 its FIRST row, doc 7 extends 1's best
    // from 2 to 3 tokens
    val b1 = docsDf(
      5L -> "p q r s x5",
      6L -> "m n o x6",
      7L -> "a b q9 zz yy ww x7"
    )
    LssStream.processBatch(b1, dir, 1L)
    val d01 = b0.unionByName(b1)
    val s1  = snap(dir, 1L)
    assert(s1 == scratch(d01), s"snapshot 1 diverged: $s1")
    assert(s1(4L)._1 == 4L && s1(3L)._1 == 3L)
    // batch 2: doc 8 shares "zz yy ww" (3 tokens) with 7 — 7's answer
    // must IMPROVE from its 2-token run with 1; and 1 stays at 2
    val b2 = docsDf(8L -> "zz yy ww x8")
    LssStream.processBatch(b2, dir, 2L)
    val all = d01.unionByName(b2)
    val s2  = snap(dir, 2L)
    assert(s2 == scratch(all), s"snapshot 2 diverged: $s2")
    assert(s2(7L)._1 == 3L && s2(1L)._1 == 2L)
    // idempotent replay: re-running the last batch rewrites the same rows
    LssStream.processBatch(b2, dir, 2L)
    assert(snap(dir, 2L) == s2)
    // latest-snapshot read resolves to batch 2
    assert(
      LssStream.longestSharedSubstringStreamed(spark, dir)
        .collect().map(_.getLong(0)).toSet == s2.keySet
    )
  }

  test("fp tie corner: same length, smaller fingerprint arriving later wins") {
    // doc 10 carries two 2-token runs; "k1 k2" arrives shared first. If
    // the second shared run's md5 is smaller, the stored row must flip to
    // it (same len) — and must NOT flip if larger. Both orientations are
    // exercised by picking the pair AFTER md5 ordering is known.
    val a   = "k1 k2"
    val b   = "j1 j2"
    val fpA = java.security.MessageDigest.getInstance("MD5").digest(a.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fpB = java.security.MessageDigest.getInstance("MD5").digest(b.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val (first, second) = if (fpA < fpB) (b, a) else (a, b) // second has the SMALLER fp
    val dir = java.nio.file.Files.createTempDirectory("graft_lss_stream_tie").toString
    val b0  = docsDf(10L -> s"$first q5 $second", 11L -> s"$first x11")
    LssStream.processBatch(b0, dir, 0L)
    val b1 = docsDf(12L -> s"$second x12")
    LssStream.processBatch(b1, dir, 1L)
    val got = snap(dir, 1L)
    assert(got == scratch(b0.unionByName(b1)))
    assert(got(10L)._2 == (if (fpA < fpB) fpA else fpB), "the smaller-fp run must win the tie")
  }

  test("streamed final snapshot == batch n19 on the sf0.001 corpus, split in three") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val dir  = java.nio.file.Files.createTempDirectory("graft_lss_stream_sf").toString
    LssStream.processBatch(docs.where(pmod(col("doc_id"), lit(3)) === 0), dir, 0L)
    LssStream.processBatch(docs.where(pmod(col("doc_id"), lit(3)) === 1), dir, 1L)
    LssStream.processBatch(docs.where(pmod(col("doc_id"), lit(3)) === 2), dir, 2L)
    assert(snap(dir, 2L) == scratch(docs), "streamed != batch n19 at sf0.001")
  }

  test("latest-snapshot read skips a torn (markerless) directory — committed means _SUCCESS") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lss_stream_torn").toString
    LssStream.processBatch(docsDf(30L -> "a b c", 31L -> "a b c"), dir, 0L)
    val committed = snap(dir, 0L)
    assert(committed.nonEmpty)
    // simulate a crash mid-snapshot-write: batch_id=1's dir exists (with a
    // stray part file, no _SUCCESS) — the default read must NOT select it
    val torn = new java.io.File(s"$dir/lss/batch_id=1")
    assert(torn.mkdirs())
    java.nio.file.Files.writeString(torn.toPath.resolve("part-TORN.parquet"), "not parquet")
    val got = LssStream
      .longestSharedSubstringStreamed(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got == committed, "default read selected the torn snapshot over the committed one")
    // and after the idempotent replay commits batch 1, the default read moves forward
    LssStream.processBatch(docsDf(32L -> "a b c"), dir, 1L)
    val advanced = LssStream
      .longestSharedSubstringStreamed(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(advanced.contains(32L), "default read must advance to the replayed committed snapshot")
  }

  test("snapshot retention: superseded snapshots retire past the keep window; replay and torn dirs survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lss_stream_retain").toString
    // 6 batches at the default keep=4: snapshots 0 and 1 must be gone,
    // 2..5 present and committed
    (0 until 6).foreach { i =>
      LssStream.processBatch(docsDf((40L + i) -> s"a b c x$i"), dir, i.toLong)
    }
    def present: Set[Long] = new java.io.File(s"$dir/lss").listFiles()
      .map(_.getName).collect { case n if n.startsWith("batch_id=") => n.stripPrefix("batch_id=").toLong }
      .toSet
    assert(present == Set(2L, 3L, 4L, 5L), s"retained $present")
    // replay of the LAST batch still works (reads snapshot 4, which is kept)
    LssStream.processBatch(docsDf(45L -> "a b c x5"), dir, 5L)
    assert(snap(dir, 5L).keySet == (40L to 45L).toSet)
    // a torn dir NEWER than the cutoff survives retention (in-flight write)
    val torn = new java.io.File(s"$dir/lss/batch_id=7")
    assert(torn.mkdirs())
    LssStream.processBatch(docsDf(46L -> "a b c x6"), dir, 6L)
    assert(present.contains(7L), "in-flight (markerless, newer-than-cutoff) dir must survive")
    // ...and the latest-committed reader still skips it
    assert(
      LssStream.longestSharedSubstringStreamed(spark, dir)
        .collect().map(_.getLong(0)).max == 46L
    )
  }

  test("key-fan compaction: pure row move — compacted twin streams identically, fan bounded, post-fold batches and replay exact") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    def third(i: Int) = docs.where(pmod(col("doc_id"), lit(3)) === i)
    val plain     = java.nio.file.Files.createTempDirectory("graft_lss_nofold").toString
    val compacted = java.nio.file.Files.createTempDirectory("graft_lss_fold").toString
    (0 until 3).foreach(i => LssStream.processBatch(third(i), plain, i.toLong))
    LssStream.processBatch(third(0), compacted, 0L)
    LssStream.processBatch(third(1), compacted, 1L)
    // fold batch 0 (everything below the newest segment) into gen=1
    assert(LssStream.compactKeySegments(spark, compacted) == 1L)
    val fan = new java.io.File(s"$compacted/keys").listFiles()
      .map(_.getName).count(_.startsWith("batch_id="))
    assert(fan == 1, s"fan not bounded after fold: $fan segments")
    // the row set is identical across the fold: the same keys stream on
    LssStream.processBatch(third(2), compacted, 2L)
    assert(snap(compacted, 2L) == snap(plain, 2L))
    assert(snap(compacted, 2L) == scratch(docs))
    // replay of the newest batch after the fold is still idempotent (its
    // segment was never folded — the SegmentFan replay-target rule)
    LssStream.processBatch(third(2), compacted, 2L)
    assert(snap(compacted, 2L) == scratch(docs))
    // compacting again folds up to the new newest and answers still hold
    assert(LssStream.compactKeySegments(spark, compacted) == 2L)
    LssStream.processBatch(third(2), compacted, 2L) // replay against gen=2
    assert(snap(compacted, 2L) == scratch(docs))
  }

  test("scheme guard: a cap change mid-stream fails fast") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lss_stream_guard").toString
    LssStream.processBatch(docsDf(20L -> "a b x"), dir, 0L)
    spark.conf.set("graft.lss.max_tokens", "8")
    try {
      val e = intercept[IllegalStateException] {
        LssStream.processBatch(docsDf(21L -> "a b y"), dir, 1L)
      }
      assert(e.getMessage.contains("lss-stream-v"))
    } finally spark.conf.unset("graft.lss.max_tokens")
  }
}
