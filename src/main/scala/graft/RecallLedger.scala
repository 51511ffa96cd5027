package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Measures the ANN family's recall@10 against exact brute force across its
  * tuning knobs (IVF probe width, quantized-shortlist size) — the operating-
  * point ledger BASELINE.md publishes so a user picks (recall, cost) from
  * measured data rather than folklore. The exact reference ranking is
  * recomputed HERE, driver-side from the raw embeddings (independent of
  * every index path being graded, including `cosine_sim` itself).
  *
  * Usage: `runMain graft.RecallLedger <sfDir>` — prints the markdown table.
  */
object RecallLedger {

  /** Query ids sampled evenly across the corpus — fixed so the ledger and
    * the spec pinning it grade the same set.
    */
  private[graft] def queryIds(n: Long, count: Int = 20): Seq[Long] =
    (0 until count).map(i => i * (n / count))

  /** Exact top-k neighbor ids per query, driver-side double-precision
    * cosine with the (cos desc, vec_id asc) tie rule every rung shares.
    */
  private[graft] def exactTopK(
      embs: Map[Long, Array[Float]],
      qids: Seq[Long],
      k: Int
  ): Map[Long, Set[Long]] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    qids.map { q =>
      val qv = embs(q)
      val top = embs.iterator
        .filter(_._1 != q)
        .map { case (id, v) => (cos(qv, v), id) }
        .toSeq
        .sortBy { case (c, id) => (-c, id) }
        .take(k)
        .map(_._2)
        .toSet
      q -> top
    }.toMap
  }

  /** Mean recall@k of `rung` over the query set: |approx ∩ exact| / k. */
  private def meanRecall(
      spark: SparkSession,
      exact: Map[Long, Set[Long]],
      k: Int,
      rung: Long => org.apache.spark.sql.DataFrame
  ): Double = {
    val per = exact.keys.toSeq.sorted.map { q =>
      val got = rung(q).collect().map(_.getLong(1)).toSet
      (exact(q) & got).size.toDouble / k
    }
    per.sum / per.size
  }

  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate()
    val k     = 10
    val embs = graft.sources.Tables
      .embeddings(spark, dir)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    val qids  = queryIds(embs.size.toLong)
    val exact = exactTopK(embs, qids, k)
    println(s"# ANN recall@$k ledger — ${qids.size} queries, corpus ${embs.size} vectors ($dir)")
    println()
    println("| rung | knob | recall@10 |")
    println("|---|---|---|")
    def row(rung: String, knob: String, r: Double): Unit =
      println(f"| $rung | $knob | ${r}%.3f |")
    row("s2 LSH (16 planes, 4×4 bands)", "fixed", meanRecall(spark, exact, k, q => Similarity.annLsh(spark, dir, q, k)))
    for (np <- Seq(1, 2, 4, 8, 16))
      row("s4/s6 IVF (16 clusters)", s"nprobe=$np",
        meanRecall(spark, exact, k, q => Similarity.annIvfPartitioned(spark, dir, q, k, 16, np)))
    // The corpus-scaled AUTO operating point (nc ~ √n, np = ceil(nc/4) — what a
    // 100 TB deployment sets via graft.ann.nclusters=auto): the recall
    // floor at the scaled knobs is MEASURED here, next to the fixed rows,
    // so scaling nc never silently trades recall for pruning.
    val (ancL, anpL) = Similarity.autoIvfKnobs(embs.size.toLong)
    row("s4/s6 IVF (auto √n-scaled)", s"nc=$ancL nprobe=$anpL",
      meanRecall(spark, exact, k, q => Similarity.annIvfPartitioned(spark, dir, q, k, ancL, anpL)))
    for (np <- Seq(1, 2, 4, 8, 16))
      row("s9 IVF×SQ8 (shortlist 50)", s"nprobe=$np",
        meanRecall(spark, exact, k, q => Similarity.annIvfQuantized(spark, dir, q, k, 16, np)))
    for (sl <- Seq(10, 20, 50, 100))
      row("s17 PQ (8×32 codebooks)", s"shortlist=$sl",
        meanRecall(spark, exact, k, q => Similarity.annPq(spark, dir, q, k, sl)))
    for (np <- Seq(1, 2, 4, 8, 16))
      row("s18 IVF×PQ (shortlist 50)", s"nprobe=$np",
        meanRecall(spark, exact, k, q => Similarity.annIvfPq(spark, dir, q, k, 16, np)))
    // Lifecycle generations (round 14): the maintained index's COMPACTED
    // fold and the TOMBSTONED mask graded on the real corpus — s20p/s21p
    // prove planted-hit survival; these rows measure recall across probe
    // widths so the ledger covers every generation a production index
    // passes through (base → incremental → compacted → tombstoned).
    for (np <- Seq(1, 2, 4, 8, 16))
      row("s12→compacted generation (16 clusters)", s"nprobe=$np",
        meanRecall(spark, exact, k, q => Similarity.annIvfCompactedCorpus(spark, dir, q, k, 16, np)))
    // tombstoned: the reference ranking itself excludes the masked ids —
    // recall is against brute force over SURVIVORS, the only honest
    // baseline for a deletion generation. Sampled qids that the mask
    // deletes are SKIPPED (a corpus size whose sampling stride lands on
    // an id%10==3 value must narrow the query set, not crash the ledger
    // after half the table has printed).
    val survivors = embs.filter { case (id, _) => id % 10 != 3 }
    val qidsT     = qids.filter(survivors.contains)
    val exactT    = exactTopK(survivors, qidsT, k)
    for (np <- Seq(1, 2, 4, 8, 16))
      row(s"tombstoned base (mask id%10==3, ${qidsT.size} queries)", s"nprobe=$np",
        meanRecall(spark, exactT, k, q => Similarity.annIvfTombstonedCorpus(spark, dir, q, k, 16, np)))
    // b2 bitext mining (round 17): PAIR-set recall against b1's exact
    // margin pairs — |b2 ∩ b1| / |b1| over (src, tgt) pairs, the honest
    // metric for a mining rung (per-query top-k recall doesn't apply; the
    // output is a pair set). nprobe == nclusters is the completeness pin
    // BitextSpec also asserts (must print 1.000).
    val b1pairs = Similarity
      .bitextMarginPairs(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    for (np <- Seq(1, 2, 4, 8, 16)) {
      val b2pairs = Similarity
        .bitextMarginPairsIvf(spark, dir, nClusters = 16, nProbe = np)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      row(s"b2 bitext margin pairs (16 clusters, vs b1's ${b1pairs.size} pairs)", s"nprobe=$np",
        (b2pairs & b1pairs).size.toDouble / b1pairs.size)
    }
    val b2auto = Similarity
      .bitextMarginPairsIvf(spark, dir, nClusters = ancL, nProbe = anpL)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    row(s"b2 bitext margin pairs (auto √n-scaled, vs b1's ${b1pairs.size} pairs)",
      s"nc=$ancL nprobe=$anpL", (b2auto & b1pairs).size.toDouble / b1pairs.size)
    spark.stop()
  }
}
