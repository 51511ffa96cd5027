package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered-stage funnel analysis over the events log — "how many users
  * signed up, then clicked within the window, then purchased within the
  * window of that click". The behavioral-analytics staple the reference's
  * scan/filter/aggregate surface (`Config/QueryType.cs:3-12`) stops short
  * of, built from the same primitives.
  *
  * Plan shape at 100 TB: each stage is `filter(event_type) → groupBy(user)
  * → min(ts)` — the event-type filters push into the parquet scan, every
  * wide op keys on `user_id`, and consecutive stages join on that same key,
  * so the stage joins reuse the aggregation's hash partitioning instead of
  * introducing a new shuffle shape. State per stage is O(users), never
  * O(events); nothing materializes event pairs.
  */
object Funnel {

  /** Conversion window between consecutive funnel stages. 24 h differentiates
    * all three stage counts on the test corpora (15/4/1 at sf0.001).
    */
  val StageWindowHours = 24L

  private val WindowMicros = StageWindowHours * 3600L * 1000000L

  /** W3 — three-stage funnel signup → click → purchase, each within
    * [[StageWindowHours]] of the previous stage's FIRST qualifying event.
    * "First qualifying" (min-ts chaining) makes the funnel deterministic:
    * stage n anchors at the earliest event that satisfied stage n−1, the
    * standard first-touch attribution rule. All time arithmetic happens in
    * integer epoch micros on both engines ([[Tables.tsMicrosCol]] here,
    * `epoch_us` in the oracle), so window-boundary comparisons are exact —
    * no float or timestamp-precision wobble.
    */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev   = Tables.eventsRaw(spark, dir)
    val base = ev.select(col("user_id"), col("event_type"), Tables.tsMicrosCol(ev).as("tus"))

    val signup = base
      .where(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min("tus").as("s_t"))
    val click = base
      .where(col("event_type") === "click")
      .join(signup, "user_id")
      .where(col("tus") > col("s_t") && col("tus") <= col("s_t") + WindowMicros)
      .groupBy("user_id")
      .agg(min("tus").as("c_t"))
    val purchase = base
      .where(col("event_type") === "purchase")
      .join(click, "user_id")
      .where(col("tus") > col("c_t") && col("tus") <= col("c_t") + WindowMicros)
      .groupBy("user_id")
      .agg(min("tus").as("p_t"))

    signup
      .agg(count(lit(1)).as("n_signup"))
      .crossJoin(click.agg(count(lit(1)).as("n_signup_click")))
      .crossJoin(purchase.agg(count(lit(1)).as("n_full_funnel")))
  }
}
