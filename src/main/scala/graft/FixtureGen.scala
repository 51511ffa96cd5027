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
    annPlant(spark, new java.io.File(out).getParent match {
      case null => "fixtures/annplant"
      case p    => s"$p/annplant"
    })
    spark.stop()
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
