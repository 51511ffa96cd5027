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
    parsed(spark, key, default, _.toInt)

  /** Double knob: `graft.<key>`, falling back to `default` when unset. */
  def double(spark: SparkSession, key: String, default: Double): Double =
    parsed(spark, key, default, _.toDouble)

  /** String knob: `graft.<key>`, falling back to `default` when unset. */
  def string(spark: SparkSession, key: String, default: String): String =
    spark.conf.getOption(s"graft.$key").map(_.trim).getOrElse(default)

  // A malformed value must name the key it came from — a bare
  // NumberFormatException("four") from deep inside an operator is
  // undiagnosable when a config file sets a dozen graft.* knobs.
  private def parsed[A](spark: SparkSession, key: String, default: A, f: String => A): A =
    spark.conf.getOption(s"graft.$key") match {
      case None => default
      case Some(raw) =>
        try f(raw.trim)
        catch {
          case e: NumberFormatException =>
            throw new IllegalArgumentException(
              s"malformed session knob graft.$key='$raw': ${e.getMessage}", e)
        }
    }
}
