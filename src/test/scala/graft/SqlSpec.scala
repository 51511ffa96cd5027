package graft

import org.apache.spark.sql.functions._

/** The SQL façade ([[Sql]]) must be the same engine as the DataFrame
  * registry — mirroring the reference's two query surfaces (direct query vs
  * external-table SQL, `QueryOrchestration.cs:416-439`) answering
  * identically.
  */
class SqlSpec extends SparkSpec {

  test("sql facade ≡ dataframe registry on q1/q7/q9 (shared ANSI SQL)") {
    // these oracle strings are ANSI enough to run on BOTH DuckDB and Spark —
    // running them through the façade proves surface equivalence end to end
    for (name <- Seq("q1_total_count", "q7_distinct", "q9_star_join")) {
      val viaDf  = SparkEntry.queries(name)(spark, sf0001).collect().map(_.toSeq).toSeq
      val viaSql = Sql.run(spark, sf0001, SparkEntry.oracleSql(name)).collect().map(_.toSeq).toSeq
      assert(viaDf == viaSql, name)
    }
  }

  test("sql facade serves every table and the vector function") {
    Sql.registerViews(spark, sf0001)
    for (t <- Sql.tableNames)
      assert(spark.sql(s"SELECT COUNT(*) AS c FROM $t").head().getLong(0) > 0L, t)
    // events arrives normalized: SQL users see TIMESTAMP_NTZ, not raw nanos
    assert(
      spark.sql("SELECT ts FROM events").schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType
    )
    val selfCos = spark
      .sql("SELECT cosine_sim(embedding, embedding) AS c FROM embeddings WHERE vec_id = 0")
      .head()
      .getDouble(0)
    assert(math.abs(selfCos - 1.0) < 1e-6)
  }

  test("sql facade pushes predicates like the dataframe path") {
    Sql.registerViews(spark, sf0001)
    val plan = spark
      .sql("SELECT COUNT(*) AS cnt FROM events WHERE event_type = 'error'")
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("EqualTo(event_type,"), plan)
  }
}
