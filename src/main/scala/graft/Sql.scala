package graft

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point — the reference's second query surface: a SQL string run
  * against a named external table (DDL at `QueryOrchestration.cs:416-424`,
  * execution at `QO:425-439`). Here the DDL step is temp-view registration
  * of the folder-of-parquet tables (same listing/empty-blob semantics as
  * [[graft.sources.Tables]]) and execution is `spark.sql` — one Catalyst
  * engine behind both surfaces, so a SQL query and its DataFrame twin
  * compile to the same physical plan (SqlSpec proves result equality on
  * q1/q7/q9 and plan equality on q3).
  *
  * CLI: `runMain graft.Sql <sfDir> "<sql>"`.
  */
object Sql {

  /** Every table the engine serves, in dependency-free registration order. */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  /** Register the tables under `dir` as temp views (the reference's CREATE
    * EXTERNAL TABLE step). `events` arrives ts-normalized (TIMESTAMP_NTZ µs)
    * so SQL users never see the raw nanos encoding; `cosine_sim` is
    * registered so the vector operators are reachable from SQL too.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir) else Tables.table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    graft.functions.VectorFunctions.register(spark)
  }

  /** Run one SQL string against the tables under `dir`. */
  def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sql)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: runMain graft.Sql <sfDir> \"<sql>\"")
    val spark = GraftSession.getOrCreate()
    try run(spark, args(0), args(1)).show(100, truncate = false)
    finally spark.stop()
  }
}
