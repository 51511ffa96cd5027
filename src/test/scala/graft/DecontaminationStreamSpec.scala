package graft

import graft.streaming.DecontaminationStream
import org.apache.spark.sql.functions._

/** The streaming contamination gate must agree with batch d25 when the
  * stream replays the training corpus against its own frozen benchmark
  * set, and the frozen set must catch a replayed eval doc outright.
  */
class DecontaminationStreamSpec extends SparkSpec {

  test("streaming contamination gate == batch d25 across staged micro-batches") {
    val dir     = java.nio.file.Files.createTempDirectory("graft_dstream_mb")
    val staging = java.nio.file.Files.createTempDirectory("graft_dstream_stage")
    val base    = java.nio.file.Files.createTempDirectory("graft_dstream_out")
    // batch d25 gates the non-bench corpus; stage exactly that population
    val docs = graft.sources.Tables.documents(spark, sf0001).where(col("doc_id") % 50 =!= 0)
    def stage(cond: org.apache.spark.sql.Column, out: String): Unit = {
      docs.where(cond).coalesce(1).write.mode("overwrite").parquet(s"$staging/$out")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(out)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"$out.parquet")
      )
    }
    stage(col("doc_id") < 250, "b1")
    val q = DecontaminationStream.gateStream(
      spark, sf0001, dir.toString, s"$base/verdicts", s"$base/ckpt"
    )
    try {
      q.processAllAvailable()
      stage(col("doc_id") >= 250, "b2")
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_shingles", "n_hit", "verdict")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
    val streamed = rows(spark.read.parquet(s"$base/verdicts"))
    val batch    = rows(graft.operators.Curation.contaminationGate(spark, sf0001))
    assert(batch.nonEmpty)
    assert(streamed == batch, s"missing ${(batch -- streamed).take(5)}, extra ${(streamed -- batch).take(5)}")
    // the gate actually bites on this corpus: both verdicts present
    assert(streamed.map(_._4) == Set("keep", "drop"))
  }

  test("frozen benchmark set: a replayed eval doc is fully contaminated; novel text is clean") {
    import spark.implicits._
    val benchDoc = graft.sources.Tables.documents(spark, sf0001)
      .where(col("doc_id") % 50 === 0)
      .select("doc_id", "text").orderBy("doc_id").head()
    val probe = Seq(
      (900001L, benchDoc.getString(1)),       // verbatim eval doc → every shingle hits
      (900002L, "zq1 zq2 zq3 zq4 zq5"),       // novel text → zero hits
      (900003L, "one two")                    // < 3 tokens: no shingles, no verdict row
    ).toDF("doc_id", "text")
    val bench = graft.operators.Curation.benchShingleHashes(spark, sf0001)
    val out   = java.nio.file.Files.createTempDirectory("graft_dstream_probe").toString
    DecontaminationStream.processBatch(probe, bench, out, 0L)
    val got = spark.read.parquet(s"$out/batch_id=0")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    val (n1, h1, v1) = got(900001L)
    assert(n1 == h1 && v1 == "drop", s"replayed eval doc must be fully contaminated, got $got")
    val (n2, h2, v2) = got(900002L)
    assert(n2 > 0 && h2 == 0L && v2 == "keep")
    assert(!got.contains(900003L), "sub-shingle docs carry no overlap evidence and must stay unscored")
  }
}
