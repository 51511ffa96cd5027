package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered-stage funnel analysis over the events log — "how many users
  * signed up, then clicked within the window, then purchased within the
  * window of that click". The behavioral-analytics staple the reference's
  * scan/filter/aggregate surface (`Config/QueryType.cs:3-12`) stops short
  * of, built from the same primitives.
  */
object Funnel {

  /** Conversion window between consecutive funnel stages. 24 h differentiates
    * all three stage counts on the test corpora (15/4/1 at sf0.001).
    */
  val StageWindowHours = 24L

  private[graft] val WindowMicros = StageWindowHours * 3600L * 1000000L

  /** The funnel's stage event types, in order — THE single definition the
    * batch operator, the chained twin, and the streaming form all filter on
    * (the stream ≡ batch spec only holds if they agree).
    */
  val StageTypes: Seq[String] = Seq("signup", "click", "purchase")

  /** W3 — three-stage funnel signup → click → purchase, each within
    * [[StageWindowHours]] of the previous stage's FIRST qualifying event.
    * "First qualifying" (min-ts chaining) makes the funnel deterministic:
    * stage n anchors at the earliest event that satisfied stage n−1, the
    * standard first-touch attribution rule. All time arithmetic happens in
    * integer epoch micros on both engines ([[Tables.tsMicrosCol]] here,
    * `epoch_us` in the oracle), so window-boundary comparisons are exact.
    *
    * Plan shape at 100 TB — ONE events scan, ONE user_id shuffle: the
    * funnel-relevant event types filter at the scan (pushed), each user's
    * stage anchors resolve inside a single `groupBy(user_id)` — `min` of
    * the signup times plus the collected click/purchase time lists — and
    * the later anchors derive narrowly per user via `filter`+`array_min`
    * over those lists. The chained-join formulation
    * ([[funnelStagesChained]]) recomputes the signup subtree once per
    * downstream stage (3 scans, 3 shuffles); this form trades that for
    * per-user click/purchase timestamp arrays in the aggregation state —
    * bounded by a user's own activity (a pathological bot user is the skew
    * case, the same one sessionization salts around), while the shuffle
    * payload stays 8 bytes per relevant event.
    */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev   = Tables.eventsRaw(spark, dir)
    val base = ev
      .where(col("event_type").isInCollection(StageTypes))
      .select(col("user_id"), col("event_type"), Tables.tsMicrosCol(ev).as("tus"))
    base
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("tus"))).as("s_t"),
        collect_list(when(col("event_type") === "click", col("tus"))).as("clicks"),
        collect_list(when(col("event_type") === "purchase", col("tus"))).as("purchases")
      )
      .withColumn(
        "c_t",
        expr(s"array_min(filter(clicks, t -> t > s_t AND t <= s_t + $WindowMicros))")
      )
      .withColumn(
        "p_t",
        expr(s"array_min(filter(purchases, t -> t > c_t AND t <= c_t + $WindowMicros))")
      )
      .agg(
        count(col("s_t")).as("n_signup"),
        count(col("c_t")).as("n_signup_click"),
        count(col("p_t")).as("n_full_funnel")
      )
  }

  /** The chained-join formulation of [[funnelStages]]: each stage is
    * `filter → groupBy(user) → min(ts)` joined to the previous stage's
    * anchor. Bounded aggregation state (no per-user arrays) at the cost of
    * re-scanning and re-shuffling per stage — the right trade when single
    * users can be pathologically hot. Kept as the differential twin; the
    * spec pins both forms equal.
    */
  private[graft] def funnelStagesChained(spark: SparkSession, dir: String): DataFrame = {
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
