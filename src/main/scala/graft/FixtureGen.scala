package graft

import org.apache.spark.sql.SparkSession

/** One-shot generator for the COMMITTED fixture at `fixtures/embdup/` — the
  * planted near-duplicate embeddings behind `n4p_embedding_dup_pairs_planted`.
  *
  * Why a committed file and not in-test generation: the driver's correctness
  * gate runs the registered queries against the read-only `/root/testdata`
  * corpora, whose random embeddings contain no pair above the 0.95 near-dup
  * threshold at any SF — so n4's oracle, while green, never sees a positive
  * row. A static fixture unioned into the corpus (and into the DuckDB oracle
  * via `read_parquet` of the same file) makes the hash-checked path exercise
  * real matches. Deterministic seed; 6 planted pairs at cosine ≈ 0.9996
  * (hyperplane-LSH miss probability < 1e-7 per pair) + 4 singletons, ids
  * from 1,000,000 so no SF's vec_ids can collide.
  *
  * Usage (re-run only if the scheme changes, then commit the result):
  * `sbt "runMain graft.FixtureGen [outDir]"`
  */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    // `--only <name>` regenerates a single fixture (committed parquet is
    // content-keyed into layout caches, so rewriting byte-identical-value
    // files with fresh metadata would churn every cache and the git tree)
    if (args.length == 2 && args(0) == "--only") {
      val spark = GraftSession.getOrCreate()
      args(1) match {
        case "bitextplant" => bitextPlant(spark, "fixtures/bitextplant")
        case "annplant"    => annPlant(spark, "fixtures/annplant")
        case "simdup"      => simDup(spark, "fixtures/simdup")
        case other         => sys.error(s"unknown fixture: $other")
      }
      spark.stop()
      return
    }
    val out   = if (args.nonEmpty) args(0) else "fixtures/embdup"
    val spark = GraftSession.getOrCreate()
    import spark.implicits._
    val rnd = new scala.util.Random(20260813)
    def vec(): Array[Float]                   = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] = v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    val rows = scala.collection.mutable.Buffer.empty[(Long, Array[Float], Int)]
    var id   = 1000000L
    (0 until 6).foreach { _ =>
      val b = vec()
      rows += ((id, b, 9)); id += 1
      rows += ((id, jitter(b), 9)); id += 1
    }
    (0 until 4).foreach { _ => rows += ((id, vec(), 9)); id += 1 }
    rows.toSeq
      .toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
    val parent = new java.io.File(out).getParent match {
      case null => "fixtures"
      case p    => p
    }
    annPlant(spark, s"$parent/annplant")
    simDup(spark, s"$parent/simdup")
    bitextPlant(spark, s"$parent/bitextplant")
    spark.stop()
  }

  /** The BITEXT planted-positive fixture (`fixtures/bitextplant`) behind
    * `b2p_bitext_planted` (VERDICT r17 item 4 — the last production index
    * rung without a planted twin): three known "translated pairs" — a
    * source-half vector (even label) and a target-half partner (odd label)
    * at jitter 0.005 → pair cosine ≈ 0.99998, a decade above the testdata
    * corpora's max background cosine (≈ 0.5 over random 64-dim Gaussians),
    * so each side's cross-lingual nearest neighbor is its partner under
    * ANY retrieval that surfaces the partner at all, and the ratio margin
    * (nn_cos / davg with davg diluted by background top-4 cosines ≈ 0.4)
    * lands ≈ 1.9 — far above the 1.05 threshold on BOTH the full
    * neighborhood (the DuckDB oracle) and any IVF-pruned sub-neighborhood
    * (pruning can only shrink davg's top-4, never raise it, so
    * margin_pruned ≥ margin_full — the one-sided containment BitextSpec
    * pins). Ids from 2,100,000: disjoint from every SF's vec_ids and the
    * annplant (2,000,000..) / embdup (1,000,000..) ranges — and from
    * ScaleRehearsal's +1e9-stride replicas, hence the exact id RANGE
    * filters in the rung (the s14p discipline).
    */
  def bitextPlant(spark: SparkSession, out: String): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float], s: Float): Array[Float] =
      v.map(x => x + s * rnd.nextGaussian().toFloat)
    val rows = (0 until 3).flatMap { p =>
      val base = vec()
      Seq(
        (2100000L + 2 * p, base, 2 * p),              // source half (even label)
        (2100001L + 2 * p, jitter(base, 0.005f), 2 * p + 1) // target half (odd label)
      )
    }
    rows
      .toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
  }

  /** The SimHash planted-positive fixture (`fixtures/simdup`) behind
    * `n3p_simhash_pairs_planted`: three groups of IDENTICAL-text documents
    * (sizes 2/3/2 → exactly 5 expected pairs at Hamming distance 0) plus
    * three singletons, each document drawn from its own disjoint synthetic
    * vocabulary (`g<k>w<j>` tokens that no testdata corpus contains), so
    * cross-group and fixture-vs-corpus shingle sets are DISJOINT and their
    * 64-bit SimHash signatures land at background Hamming distance (~32,
    * measured ≥ 16 in DedupSpec) — far above the ≤ 7 pair threshold.
    * Identical text ⇒ identical shingle set ⇒ identical signature is
    * hash-function-independent, which is what lets the twin carry a full
    * DuckDB oracle (text-equality pairs) while n3 itself stays no-oracle.
    * Ids from 3,000,000: disjoint from every SF's doc_ids and the other
    * fixtures' id ranges.
    */
  def simDup(spark: SparkSession, out: String): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815)
    // one disjoint 60-token vocabulary per text; 120 tokens per document
    def text(group: Int): String = {
      val vocab = Array.tabulate(60)(j => s"g${group}w${j}x${rnd.nextInt(100000)}")
      Array.fill(120)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val groupSizes = Seq(2, 3, 2)
    val rows       = scala.collection.mutable.Buffer.empty[(Long, String, String, String, Long)]
    var id         = 3000000L
    groupSizes.zipWithIndex.foreach { case (sz, g) =>
      val t = text(g)
      (0 until sz).foreach { _ =>
        rows += ((id, t, "xx", "planted", t.length.toLong)); id += 1
      }
    }
    (0 until 3).foreach { k =>
      val t = text(100 + k)
      rows += ((id, t, "xx", "planted", t.length.toLong)); id += 1
    }
    rows.toSeq
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$out/documents.parquet")
  }

  /** The ANN planted-positive fixture (`fixtures/annplant`) behind
    * `s2p_ann_lsh_planted` / `s11p_ann_ivf_filtered_planted`: one query
    * vector (id 2,000,000, label 7) plus five graded near-neighbors at
    * jitter scales 0.01/0.02/0.04/0.07/0.10 → cosines ≈ 0.99995 … 0.995,
    * each gap ≥ 4e-4 (three decades above float/double discrepancy) and all
    * five decades above the testdata corpora's max background cosine
    * (≈ 0.5). The TWO CLOSEST neighbors carry label 8, the remaining three
    * label 7 — so the filtered twin's top-3 must SKIP the two best matches,
    * proving the predicate composes pre-search rather than post-filtering
    * the unfiltered top-k. Ids from 2,000,000: disjoint from every SF's
    * vec_ids and from the embdup fixture (1,000,000..).
    */
  def annPlant(spark: SparkSession, out: String): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float], s: Float): Array[Float] =
      v.map(x => x + s * rnd.nextGaussian().toFloat)
    val q = vec()
    val rows = Seq(
      (2000000L, q, 7),
      (2000001L, jitter(q, 0.01f), 8),
      (2000002L, jitter(q, 0.02f), 8),
      (2000003L, jitter(q, 0.04f), 7),
      (2000004L, jitter(q, 0.07f), 7),
      (2000005L, jitter(q, 0.10f), 7)
    )
    rows
      .toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
  }
}
