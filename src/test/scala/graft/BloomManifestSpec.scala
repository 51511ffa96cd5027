package graft

import graft.sources.BloomManifest
import graft.streaming.ManifestStream
import org.apache.spark.sql.functions._

/** The bloom file-skipping manifest must (a) return exactly the full
  * scan's rows for any key — no false negatives, ever — while (b) reading
  * strictly fewer files than the layout holds, and (c) its streaming
  * maintenance must equal the batch build and replay idempotently.
  */
class BloomManifestSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String, String)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet

  test("z2: bloom-pruned lookup == full scan for the registered key AND a sample; files read < layout files") {
    // the registered key (4242) only exists at sf0.01+ — at this SF the
    // check is the empty==empty degenerate, the sampled keys below are the
    // non-empty ones
    val full   = rows(graft.operators.CoreQueries.q6PointFilter(spark, sf0001))
    val pruned = rows(BloomManifest.pointLookupBloomPruned(spark, sf0001))
    assert(pruned == full, "bloom pruning must never change the answer")

    val layout = BloomManifest.eventsManifestCache(spark, sf0001)
    val nFiles = spark.read.parquet(s"$layout/manifest.parquet").count()
    assert(nFiles >= 8, "the layout must actually be multi-file for pruning to mean anything")

    // a present key probes to at least its own file but prunes most others
    val sample = graft.sources.Tables
      .events(spark, sf0001)
      .select("event_id")
      .orderBy(xxhash64(col("event_id")))
      .limit(5)
      .collect()
      .map(_.getLong(0))
    sample.foreach { k =>
      val cands = BloomManifest.candidateFiles(spark, s"$layout/manifest.parquet", k)
      assert(cands.nonEmpty && cands.size < nFiles, s"key $k: ${cands.size} of $nFiles files")
      val fullK = rows(
        graft.sources.Tables
          .events(spark, sf0001)
          .filter(col("event_id") === k)
          .select("event_id", "user_id", "event_type", "props")
      )
      assert(rows(BloomManifest.pointLookupBloomPruned(spark, sf0001, k)) == fullK, s"key $k")
    }

    // an absent key prunes to (almost) nothing — ~1% fpp per file,
    // deterministic for fixed data, and the empty-candidate path returns
    // an empty result with the right schema
    val absent = BloomManifest.candidateFiles(spark, s"$layout/manifest.parquet", -987654321L)
    assert(absent.size <= 2, s"absent key should prune nearly all files, probed ${absent.size}")
    assert(rows(BloomManifest.pointLookupBloomPruned(spark, sf0001, -987654321L)).isEmpty)
  }

  test("manifest stream: streamed index == batch answer per batch; replay idempotent; empty index degrades") {
    val base = java.nio.file.Files.createTempDirectory("graft_manifest_stream")
    val events = graft.sources.Tables.events(spark, sf0001)

    // pre-first-batch: the index directories don't exist yet
    assert(ManifestStream.pointLookupStreamed(spark, s"$base/idx", 4242L).collect().isEmpty)

    // stage events as two halves arriving as separate files
    val srcDir   = base.resolve("src"); java.nio.file.Files.createDirectories(srcDir)
    val staging  = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$staging/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        srcDir.resolve(s"$name.parquet")
      )
    }
    val half1 = events.where(pmod(xxhash64(col("event_id")), lit(2)) === 0)
    val half2 = events.where(pmod(xxhash64(col("event_id")), lit(2)) === 1)
    // a key guaranteed present in EACH half (4242 doesn't exist at sf0.001)
    val k1 = half1.agg(min("event_id")).head().getLong(0)
    val k2 = half2.agg(min("event_id")).head().getLong(0)
    stage(half1, "b1")
    val q = ManifestStream.manifestStream(spark, srcDir.toString, s"$base/idx", s"$base/ckpt")
    try {
      q.processAllAvailable()
      val mid = rows(ManifestStream.pointLookupStreamed(spark, s"$base/idx", k1))
      assert(
        mid == rows(half1.filter(col("event_id") === k1).select("event_id", "user_id", "event_type", "props")) &&
          mid.nonEmpty
      )
      // k2's rows haven't arrived yet — the index answers from what it has
      assert(rows(ManifestStream.pointLookupStreamed(spark, s"$base/idx", k2)).isEmpty)
      stage(half2, "b2")
      q.processAllAvailable()
    } finally q.stop()

    val streamed = rows(ManifestStream.pointLookupStreamed(spark, s"$base/idx", k2))
    val full     = rows(events.filter(col("event_id") === k2).select("event_id", "user_id", "event_type", "props"))
    assert(streamed == full && full.nonEmpty, "stream-maintained index must equal the batch answer")

    // a sampled key set agrees too (per-key: union of segments == full table)
    events.select("event_id").orderBy(xxhash64(col("event_id"))).limit(3).collect().map(_.getLong(0)).foreach { k =>
      val want = rows(events.filter(col("event_id") === k).select("event_id", "user_id", "event_type", "props"))
      assert(rows(ManifestStream.pointLookupStreamed(spark, s"$base/idx", k)) == want, s"key $k")
    }

    // checkpoint-replay idempotence: re-landing batch 0 rewrites its
    // segments, the answer is unchanged
    ManifestStream.processBatch(half1, s"$base/idx", 0L)
    assert(rows(ManifestStream.pointLookupStreamed(spark, s"$base/idx", k2)) == streamed)

    // mid-replay window: a manifest entry whose data file is gone (the
    // data segment was rewritten, its manifest not yet) is SKIPPED, never
    // thrown on — k1's rows transiently disappear, the index still answers
    val dataSeg = new java.io.File(s"$base/idx/data/batch_id=0")
    dataSeg.listFiles().filter(_.getName.endsWith(".parquet")).foreach(f => assert(f.delete()))
    assert(rows(ManifestStream.pointLookupStreamed(spark, s"$base/idx", k1)).isEmpty,
      "dangling manifest entries must be skipped, not read")
    // replaying the batch (data + manifest) restores the rows
    ManifestStream.processBatch(half1, s"$base/idx", 0L)
    assert(
      rows(ManifestStream.pointLookupStreamed(spark, s"$base/idx", k1)) ==
        rows(events.filter(col("event_id") === k1).select("event_id", "user_id", "event_type", "props"))
    )
  }
}
