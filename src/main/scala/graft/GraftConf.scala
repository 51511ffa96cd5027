package graft

import org.apache.spark.sql.SparkSession

/** Session-level tuning knobs for the ANN / dedup / text operators —
  * recall-vs-cost trade-offs (probe width, LSH banding, shingle and span
  * granularity) that a user running at their OWN scale must be able to turn
  * without recompiling. Values live in the SparkSession conf under the
  * `graft.` prefix, so they are settable three equivalent ways: on the
  * session builder, via `spark.conf.set(...)` at runtime, or from a
  * [[Runner]] config file's `conf.graft.*` keys. Every operator keeps its
  * compiled default (the value the whole spec suite and BASELINE.md pin)
  * when a knob is unset, and an explicit method argument always wins over
  * the conf — the conf is the *deployment* override, not an API.
  *
  * Knobs that parameterize a PERSISTED layout (minhash signatures, IVF
  * partitions, BPE merge count) are folded into that layout's cache key by
  * the operator, so two settings can never share (or silently corrupt)
  * one artifact.
  */
object GraftConf {

  /** Integer knob: `graft.<key>`, falling back to `default` when unset. */
  def int(spark: SparkSession, key: String, default: Int): Int =
    spark.conf.getOption(s"graft.$key").map(_.trim.toInt).getOrElse(default)

  /** Double knob: `graft.<key>`, falling back to `default` when unset. */
  def double(spark: SparkSession, key: String, default: Double): Double =
    spark.conf.getOption(s"graft.$key").map(_.trim.toDouble).getOrElse(default)
}
