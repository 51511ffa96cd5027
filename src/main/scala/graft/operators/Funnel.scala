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
    * funnel-relevant event types filter at the scan (pushed), then three
    * chained per-user window minimums over the SAME partitioning resolve
    * the stage anchors (`s_t` = first signup; `c_t` = first click inside
    * `s_t`'s window, a predicate on the previous window's result; `p_t`
    * likewise), and a per-user collapse + global count ride the exchange
    * already in place. No per-user state is ever collected into a single
    * row: an earlier formulation aggregated each user's click/purchase
    * timestamps with `collect_list`, whose buffer is one unspillable array
    * per user — a bot user with 10⁸ events is a guaranteed executor OOM at
    * real scale. `WindowExec` holds the same rows in a spillable buffer
    * (`ExternalAppendOnlyUnsafeRowArray` overflows to disk past its
    * in-memory threshold), so the pathological user degrades to disk
    * throughput instead of killing the job, and the result stays EXACT —
    * the capped-array alternative (keep N earliest clicks) silently breaks
    * first-touch attribution for any user whose junk pre-signup clicks
    * crowd out the cap. The chained-join formulation
    * ([[funnelStagesChained]]) keeps O(1) aggregation state at the cost of
    * 3 scans + 3 shuffles; the spec pins both forms equal, including on a
    * planted pathological bot user.
    */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev   = Tables.eventsRaw(spark, dir)
    val base = ev
      .where(col("event_type").isInCollection(StageTypes))
      .select(col("user_id"), col("event_type"), Tables.tsMicrosCol(ev).as("tus"))
    val w = Window.partitionBy("user_id")
    base
      .withColumn("s_t", min(when(col("event_type") === "signup", col("tus"))).over(w))
      .withColumn(
        "c_t",
        min(
          when(
            col("event_type") === "click" && col("tus") > col("s_t") && col("tus") <= col("s_t") + WindowMicros,
            col("tus")
          )
        ).over(w)
      )
      .withColumn(
        "p_t",
        min(
          when(
            col("event_type") === "purchase" && col("tus") > col("c_t") && col("tus") <= col("c_t") + WindowMicros,
            col("tus")
          )
        ).over(w)
      )
      // anchors are constant per user; collapse to one row per user on the
      // partitioning the windows already established (no new exchange)
      .groupBy("user_id")
      .agg(max("s_t").as("s_t"), max("c_t").as("c_t"), max("p_t").as("p_t"))
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
