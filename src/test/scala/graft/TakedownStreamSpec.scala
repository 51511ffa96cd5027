package graft

import graft.operators.TextAnalysis
import graft.streaming.{PostingsStream, TakedownStream}
import org.apache.spark.sql.functions._

/** The streaming takedown family must hide deleted documents from the
  * stream-maintained index exactly (== a from-scratch index over the
  * survivors), subtract duplicate requests once, and land its ledger
  * idempotently under checkpoint replay.
  */
class TakedownStreamSpec extends SparkSpec {

  private def ranks(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("pre-first-takedown queries degrade to the unmasked index (absent or segment-less ledger dir)") {
    val base = java.nio.file.Files.createTempDirectory("graft_takedown_empty")
    val docs = graft.sources.Tables.documents(spark, sf0001)
    PostingsStream.processBatch(docs, s"$base/idx", 0L)
    val unmasked = ranks(
      TextAnalysis.bm25OverSegments(
        spark.read.parquet(s"$base/idx/postings").where(col("token").isInCollection(TextAnalysis.KeywordTerms)),
        spark.read.parquet(s"$base/idx/stats").select("n_docs", "n_dl", "sum_dl"),
        20
      )
    )
    // ledger dir does not exist yet — the deployment-ordering case where a
    // query lands before the first takedown batch
    val beforeAny = ranks(TakedownStream.bm25RankStreamedTombstoned(spark, s"$base/idx", s"$base/ledger"))
    assert(beforeAny == unmasked && unmasked.nonEmpty, "absent ledger must mean unmasked ranking")
    // and the dir-exists-but-no-segments case (stream started, nothing landed)
    java.nio.file.Files.createDirectories(base.resolve("ledger"))
    val stillEmpty = ranks(TakedownStream.bm25RankStreamedTombstoned(spark, s"$base/idx", s"$base/ledger"))
    assert(stillEmpty == unmasked, "segment-less ledger must mean unmasked ranking")
  }

  test("streamed takedowns: masked ranking == survivor rebuild; duplicates subtract once; sealed + idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft_takedown")
    val docs = graft.sources.Tables.documents(spark, sf0001)
    // the stream-maintained postings index, three hash-sliced batches
    (0 until 3).foreach { i =>
      PostingsStream.processBatch(
        docs.where(pmod(xxhash64(col("doc_id")), lit(3)) === i),
        s"$base/idx",
        i.toLong
      )
    }
    // takedown set: doc_id % 10 == 3, arriving as TWO request batches with
    // one document resubmitted in the second (the duplicate case)
    val tomb = docs
      .where(pmod(col("doc_id"), lit(10)) === 3)
      .select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
    val median = tomb.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0)
    val req1   = tomb.where(col("doc_id") <= median)
    val req2   = tomb.where(col("doc_id") > median).unionByName(req1.limit(1))
    val reqDir  = base.resolve("req"); java.nio.file.Files.createDirectories(reqDir)
    val staging = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$staging/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        reqDir.resolve(s"$name.parquet")
      )
    }
    stage(req1, "b1")
    val q = TakedownStream.takedownStream(spark, reqDir.toString, s"$base/ledger", s"$base/ckpt")
    try {
      q.processAllAvailable()
      // after batch 1 only req1's docs are hidden
      val mid = ranks(TakedownStream.bm25RankStreamedTombstoned(spark, s"$base/idx", s"$base/ledger"))
      assert(mid.forall { case (_, id) => !(id % 10 == 3 && id <= median) })
      stage(req2, "b2")
      q.processAllAvailable()
    } finally q.stop()
    // ground truth: a from-scratch corpus scan over the survivors
    val survivorsDir = java.nio.file.Files.createTempDirectory("graft_takedown_truth").toString
    docs.where(pmod(col("doc_id"), lit(10)) =!= 3)
      .write.mode("overwrite").parquet(s"$survivorsDir/documents.parquet")
    val truth  = ranks(TextAnalysis.bm25Rank(spark, survivorsDir))
    val masked = ranks(TakedownStream.bm25RankStreamedTombstoned(spark, s"$base/idx", s"$base/ledger"))
    assert(masked == truth && truth.nonEmpty, "duplicate request must subtract once, mask must equal rebuild")
    // ledger landed as two sealed segments
    assert(new java.io.File(s"$base/ledger").listFiles().count(_.getName.startsWith("batch_id=")) == 2)
    // checkpoint-replay idempotence: re-landing batch 0 rewrites its
    // directory, the answer is unchanged
    TakedownStream.processBatch(req1, s"$base/ledger", 0L)
    assert(ranks(TakedownStream.bm25RankStreamedTombstoned(spark, s"$base/idx", s"$base/ledger")) == masked)
    // and the purge path retires the streamed ledger entirely
    val purged = java.nio.file.Files.createTempDirectory("graft_takedown_purge").toString
    TextAnalysis.compactSegmentsPurged(
      spark.read.parquet(s"$base/idx/postings").drop("batch_id"),
      spark.read.parquet(s"$base/idx/stats").drop("batch_id"),
      TakedownStream.ledger(spark, s"$base/ledger"),
      purged
    )
    val purgedRanks = ranks(
      TextAnalysis.bm25OverSegments(
        spark.read.parquet(s"$purged/postings.parquet").where(col("token").isInCollection(TextAnalysis.KeywordTerms)),
        spark.read.parquet(s"$purged/stats.parquet"),
        20
      )
    )
    assert(purgedRanks == truth)
  }
}
