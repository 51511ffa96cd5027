package graft

import graft.streaming.QualityGateStream
import org.apache.spark.sql.functions._

/** The streaming LM-quality gate must agree with batch d21 when the stream
  * replays the training corpus against its own frozen model, and the
  * frozen-artifact scorer must extend correctly to out-of-corpus text.
  */
class QualityGateStreamSpec extends SparkSpec {

  test("streaming quality gate == batch d21 across staged micro-batches") {
    val dir     = java.nio.file.Files.createTempDirectory("graft_qgate_mb")
    val staging = java.nio.file.Files.createTempDirectory("graft_qgate_stage")
    val base    = java.nio.file.Files.createTempDirectory("graft_qgate_out")
    val docs    = graft.sources.Tables.documents(spark, sf0001)
    def stage(cond: org.apache.spark.sql.Column, out: String): Unit = {
      docs.where(cond).coalesce(1).write.mode("overwrite").parquet(s"$staging/$out")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(out)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"$out.parquet")
      )
    }
    stage(col("doc_id") < 250, "b1")
    val q = QualityGateStream.gateStream(
      spark, sf0001, dir.toString, s"$base/kept", s"$base/ckpt"
    )
    try {
      q.processAllAvailable()
      stage(col("doc_id") >= 250, "b2")
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lm_q").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = rows(spark.read.parquet(s"$base/kept"))
    val batch    = rows(graft.operators.TextAnalysis.lmQualityKeep(spark, sf0001))
    assert(batch.nonEmpty)
    assert(streamed == batch, s"missing ${(batch -- streamed).take(5)}, extra ${(streamed -- batch).take(5)}")
  }

  test("frozen-model scorer: unseen bigrams/contexts smooth, short docs unscored, seen text exact") {
    import spark.implicits._
    val (model, vocab) = graft.operators.TextAnalysis.lmModel(spark, sf0001)
    val vv             = vocab.head().getLong(0)
    // a doc that repeats a corpus phrase scores identically to the layout's
    // score for a corpus doc with that exact text (frozen stats, same math)
    val corpusText = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").orderBy("doc_id").head()
    val probe = Seq(
      (1L, corpusText.getString(1)),  // in-corpus text
      (2L, "zzqx9 zzqx8 zzqx7"),      // every bigram AND context unseen
      (3L, "one-token")               // < 2 tokens: no score at all
    ).toDF("doc_id", "text")
    val scored = graft.operators.TextAnalysis
      .scoreDocsAgainst(probe, model, vocab)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val layoutScore = graft.operators.TextAnalysis.bigramLmScore(spark, sf0001)
      .where(col("doc_id") === corpusText.getLong(0)).head().getLong(1)
    assert(scored(1L) == layoutScore, "frozen-stats rescore of corpus text must equal the layout score")
    // fully-unseen text: every bigram contributes ln(1/vv) exactly
    val expectedUnseen = Math.round(Math.log(1.0 / vv) * 1000000.0)
    assert(scored(2L) == expectedUnseen, s"got ${scored(2L)}, want $expectedUnseen")
    assert(!scored.contains(3L), "sub-bigram docs carry no transition evidence and must stay unscored")
  }
}
