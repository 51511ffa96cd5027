package graft

import graft.operators.{CoreQueries, Prep}
import org.apache.spark.sql.types._
import java.nio.file.Files

class PrepSpec extends SparkSpec {

  test("compaction preserves Q1/Q4 invariants (DP1)") {
    val out = Files.createTempDirectory("graft_compact").toString
    val stats = Prep.compact(spark, s"$sf0001/events.parquet", s"$out/events.parquet", targetMb = 1)
    assert(stats.outFiles >= 1)
    // the compacted copy must answer the reference queries identically
    assert(
      CoreQueries.q1TotalCount(spark, out).head().getLong(0) ==
        CoreQueries.q1TotalCount(spark, sf0001).head().getLong(0)
    )
    assert(
      CoreQueries.q4MinMax(spark, out).head().toSeq ==
        CoreQueries.q4MinMax(spark, sf0001).head().toSeq
    )
  }

  test("compaction preserves the full row multiset") {
    val out = Files.createTempDirectory("graft_compact2").toString
    Prep.compact(spark, s"$sf0001/documents.parquet", s"$out/documents.parquet", targetMb = 1)
    val before = spark.read.parquet(s"$sf0001/documents.parquet")
    val after  = spark.read.parquet(s"$out/documents.parquet")
    assert(after.count() == before.count())
    assert(after.exceptAll(before).count() == 0L)
    assert(before.exceptAll(after).count() == 0L)
  }

  test("csv.gz -> parquet conversion with declared schema (O9)") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    import spark.implicits._
    val src = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5)).toDF("id", "name", "v")
    src.coalesce(1).write.option("compression", "gzip").csv(s"$tmp/in")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType), StructField("v", DoubleType)
    ))
    Prep.csvGzToParquet(spark, s"$tmp/in/*.csv.gz", schema, s"$tmp/out")
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() == 2)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("alpha", "beta"))
  }
}
