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

  test("orc rewrite: content round-trips and predicates push into the ORC scan") {
    val out = Files.createTempDirectory("graft_orc").toString
    val before = spark.read.parquet(s"$sf0001/documents.parquet")
    Prep.toOrc(before, s"$out/documents.orc")
    val after = Prep.orcTable(spark, s"$out/documents.orc")
    assert(after.count() == before.count())
    assert(after.exceptAll(before).count() == 0L && before.exceptAll(after).count() == 0L)
    // the scan surface carries over: an equality predicate reaches the ORC
    // reader as a pushed filter, same as parquet
    val q    = after.where(org.apache.spark.sql.functions.col("source") === "src3")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(source,src3)"), plan)
    assert(q.count() == before.where(org.apache.spark.sql.functions.col("source") === "src3").count())
    // normalized events (µs NTZ) survive the format hop with answers intact
    val evOut = Files.createTempDirectory("graft_orc_ev").toString
    Prep.toOrc(graft.sources.Tables.events(spark, sf0001), s"$evOut/events.orc")
    val ev = Prep.orcTable(spark, s"$evOut/events.orc")
    assert(ev.count() == CoreQueries.q1TotalCount(spark, sf0001).head().getLong(0))
    import org.apache.spark.sql.functions.{max, min}
    val Seq(a, b) = ev.agg(min("ts"), max("ts")).head().toSeq
    assert(CoreQueries.q4MinMax(spark, sf0001).head().toSeq == Seq(a, b))
  }

  test("passthrough mode converts blobs 1:1 with .csv.gz suffix strip (DP:101-110)") {
    val tmp = Files.createTempDirectory("graft_pass").toString
    import spark.implicits._
    // two non-empty blobs + one empty blob (must be dropped, QO:459-462)
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
      .coalesce(1).write.option("compression", "gzip").csv(s"$tmp/a")
    Seq((3L, "gamma")).toDF("id", "name")
      .coalesce(1).write.option("compression", "gzip").csv(s"$tmp/b")
    val in = Files.createDirectory(java.nio.file.Paths.get(tmp, "in")).toString
    def moveBlob(from: String, to: String): Unit = {
      val f = new java.io.File(from).listFiles().filter(_.getName.endsWith(".csv.gz")).head
      assert(f.renameTo(new java.io.File(in, to)))
    }
    moveBlob(s"$tmp/a", "blob-one.csv.gz")
    moveBlob(s"$tmp/b", "blob-two.csv.gz")
    Files.createFile(java.nio.file.Paths.get(in, "empty.csv.gz"))
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val stats  = Prep.passthroughCsvGz(spark, in, schema, s"$tmp/out")
    assert(stats.inFiles == 2L && stats.outFiles == 2L) // empty blob dropped
    // 1:1 naming: each output part is the blob name minus the suffix
    val outNames = new java.io.File(s"$tmp/out").listFiles().map(_.getName).toSet
    assert(outNames == Set("blob-one.parquet", "blob-two.parquet"))
    val back = spark.read.parquet(s"$tmp/out/*.parquet")
    assert(back.count() == 3L)
  }

  test("ndjson(.gz) -> parquet conversion with declared schema; queries agree with the csv path") {
    val tmp = Files.createTempDirectory("graft_json").toString
    import spark.implicits._
    val src = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5))
      .toDF("id", "name", "v")
    src.coalesce(1).write.option("compression", "gzip").json(s"$tmp/in")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType), StructField("v", DoubleType)
    ))
    Prep.jsonToParquet(spark, s"$tmp/in/*.json.gz", schema, s"$tmp/out")
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() == 3)
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5)))
    // malformed-in-schema rows degrade to nulls rather than failing the job
    val badDir = Files.createTempDirectory("graft_json_bad").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(badDir, "part.json"),
      "{\"id\": 7, \"name\": \"ok\", \"v\": 1.0}\n{\"id\": \"not-a-number\", \"name\": \"bad\"}\n".getBytes
    )
    Prep.jsonToParquet(spark, s"$badDir/*.json", schema, s"$tmp/out2")
    val rows = spark.read.parquet(s"$tmp/out2").orderBy("name").collect()
    assert(rows.length == 2 && rows.exists(_.isNullAt(0)))
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

  test("jsonl.gz export round-trips the documents table exactly (parquet -> jsonl.gz -> parquet)") {
    val tmp  = Files.createTempDirectory("graft_jsonl").toString
    val docs = graft.sources.Tables.documents(spark, sf0001)
    Prep.toJsonlGz(docs, s"$tmp/export")
    // parts are genuinely gzip'd jsonl
    val parts = new java.io.File(s"$tmp/export").listFiles().filter(_.getName.endsWith(".json.gz"))
    assert(parts.nonEmpty, "export must land .json.gz parts")
    val back = Prep.jsonlTable(spark, s"$tmp/export", docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("schema evolution: mergeSchema unions generations; the default silently drops the added column") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_evolve").toString
    // generation 1: (id, text); generation 2 adds lang
    Seq((1L, "old row")).toDF("id", "text")
      .write.mode("append").parquet(s"$tmp/t")
    Seq((2L, "new row", "en")).toDF("id", "text", "lang")
      .write.mode("append").parquet(s"$tmp/t")
    val merged = Prep.evolvedTable(spark, s"$tmp/t")
    assert(merged.columns.toSet == Set("id", "text", "lang"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("lang")), "old generation must carry null in the added column")
    assert(rows(1).getString(rows(1).fieldIndex("lang")) == "en")
    // the documented hazard: a plain read takes ONE footer's schema, so the
    // added column may be entirely absent — the reason evolvedTable exists
    val plain = spark.read.parquet(s"$tmp/t")
    assert(plain.columns.length <= 3)
  }
}
