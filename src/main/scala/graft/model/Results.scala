package graft.model

import graft.operators.CoreQueries
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed result models — the Spark-native counterpart of the reference's
  * CSV-decoding result classes (`QueryOrchestration.cs:45-77`: `CountResult`,
  * `MinMaxResult<T>`, `MaxByResult`, `CountByResult`). There the types
  * exist to positionally decode headerless CSV streams; here they are
  * `Dataset[T]` element types, so field names/types are checked at compile
  * time and the Encoder replaces the hand-rolled `[Index(n)]` binding.
  */
final case class CountResult(cnt: Long)
final case class MinMaxResult(min_ts: java.time.LocalDateTime, max_ts: java.time.LocalDateTime)
final case class MaxByResult(event_type: String, max_ts: java.time.LocalDateTime)
final case class CountByResult(event_type: String, cnt: Long)

/** Typed façade over the core queries — same plans, compile-time row types. */
object TypedQueries {
  def totalCount(spark: SparkSession, dir: String): Dataset[CountResult] = {
    import spark.implicits._
    CoreQueries.q1TotalCount(spark, dir).as[CountResult]
  }
  def minMax(spark: SparkSession, dir: String): Dataset[MinMaxResult] = {
    import spark.implicits._
    CoreQueries.q4MinMax(spark, dir).as[MinMaxResult]
  }
  def maxBy(spark: SparkSession, dir: String): Dataset[MaxByResult] = {
    import spark.implicits._
    CoreQueries.q5MaxBy(spark, dir).as[MaxByResult]
  }
  def countBy(spark: SparkSession, dir: String): Dataset[CountByResult] = {
    import spark.implicits._
    CoreQueries.q7Distinct(spark, dir).as[CountByResult]
  }
}
