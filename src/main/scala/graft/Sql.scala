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

  /** Reference-parity persistent DDL: drop-if-exists then CREATE TABLE for
    * every served table, as NAMED EXTERNAL catalog tables over the
    * folder-of-parquet locations (the reference's `.drop table … if exists`
    * + `.create external table` pair, `QueryOrchestration.cs:413-424`).
    * Unlike [[registerViews]]' session-scoped temp views, these survive in
    * the metastore and are visible to any catalog client. `events` needs the
    * nanos→NTZ normalization no bare external table can express, so it is
    * served as a catalog VIEW over the raw external table — same µs
    * semantics as the DataFrame loader, persistently.
    */
  def createTables(spark: SparkSession, dir: String, database: String = "graft"): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    def dropIfExists(name: String): Unit =
      if (spark.catalog.tableExists(s"$database.$name")) {
        val isView = spark.catalog.getTable(s"$database.$name").tableType == "VIEW"
        spark.sql(s"DROP ${if (isView) "VIEW" else "TABLE"} $database.$name")
      }
    tableNames.filterNot(_ == "events").foreach { n =>
      dropIfExists(n)
      spark.sql(s"CREATE TABLE $database.$n USING parquet LOCATION '$dir/$n.parquet'")
    }
    dropIfExists("events")
    dropIfExists("events_raw")
    val raw = Tables.eventsRaw(spark, dir)
    if (Tables.eventsTsIsNanos(raw)) {
      spark.sql(s"CREATE TABLE $database.events_raw USING parquet LOCATION '$dir/events.parquet'")
      val cols = raw.schema.fieldNames
        .map {
          case "ts" => "cast(timestamp_micros(ts div 1000) as timestamp_ntz) AS ts"
          case c    => s"`$c`"
        }
        .mkString(", ")
      spark.sql(s"CREATE VIEW $database.events AS SELECT $cols FROM $database.events_raw")
    } else {
      spark.sql(s"CREATE TABLE $database.events USING parquet LOCATION '$dir/events.parquet'")
    }
    graft.functions.VectorFunctions.register(spark)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: runMain graft.Sql <sfDir> \"<sql>\"")
    val spark = GraftSession.getOrCreate()
    try run(spark, args(0), args(1)).show(100, truncate = false)
    finally spark.stop()
  }
}
