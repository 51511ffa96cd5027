package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` names every implemented operator from SURVEY.md §2; `oracleSql`
  * gives the DuckDB-runnable equivalent for each (omitted only for ops whose
  * output depends on engine-internal hash functions — those get rows-only
  * checks plus dedicated ScalaTest specs).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q9StarJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_total_count"       -> (CoreQueries.q1TotalCount _),
    "q2_time_filter_count" -> (CoreQueries.q2TimeFilterCount _),
    "q3_filter_count"      -> (CoreQueries.q3FilterCount _),
    "q4_min_max"           -> (CoreQueries.q4MinMax _),
    "q5_max_by"            -> (CoreQueries.q5MaxBy _),
    "q6_point_filter"      -> (CoreQueries.q6PointFilter _),
    "q7_distinct"          -> (CoreQueries.q7Distinct _),
    "q8_dedup_exact"       -> (CoreQueries.q8DedupExact _),
    "q9_star_join"         -> (CoreQueries.q9StarJoin _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_total_count" -> "SELECT COUNT(*) AS cnt FROM events",
    "q2_time_filter_count" ->
      "SELECT COUNT(*) AS cnt FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'",
    "q3_filter_count" ->
      "SELECT COUNT(*) AS cnt FROM events WHERE event_type = 'error'",
    "q4_min_max" ->
      "SELECT MIN(ts) AS min_ts, MAX(ts) AS max_ts FROM events",
    "q5_max_by" ->
      "SELECT event_type, MAX(ts) AS max_ts FROM events GROUP BY event_type ORDER BY event_type",
    "q6_point_filter" ->
      "SELECT event_id, user_id, event_type, props FROM events WHERE event_id = 4242",
    "q7_distinct" ->
      "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
    "q8_dedup_exact" ->
      "SELECT COUNT(*) - COUNT(DISTINCT text) AS dup_rows FROM documents",
    "q9_star_join" ->
      ("SELECT n_name, COUNT(*) AS cnt FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name")
  )
}
