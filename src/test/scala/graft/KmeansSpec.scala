package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The k-means|| coarse quantizer must actually FIND cluster structure —
  * the r11 watch item the lowest-id-seed trainer failed on clustered
  * corpora (all seeds land in whichever cluster owns the low ids) — while
  * keeping the tiny-corpus degradation and the driver-bounded, RNG-free
  * contract.
  */
class KmeansSpec extends SparkSpec {

  /** 8 well-separated clusters in 64 dims: cluster c concentrates on axis
    * 8c with a small deterministic per-vector jitter on the other axes.
    * vec_ids are assigned so that ALL low ids sit in cluster 0 — the exact
    * geometry that defeats lowest-id seeding.
    */
  private lazy val clusteredDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_km_fix").toString
    val rows = for {
      c <- 0 until 8
      i <- 0 until 40
    } yield {
      val v = Array.fill(64)(0.0f)
      v(8 * c) = 1.0f
      // deterministic jitter, small enough to keep clusters separated
      (0 until 64).foreach { d =>
        if (d != 8 * c) v(d) = (((c * 40 + i) * 31 + d * 7) % 13 - 6) * 0.01f
      }
      ((c * 40 + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("k-means|| finds every planted cluster (bijection to true centers)") {
    val e  = graft.sources.Tables.embeddings(spark, clusteredDir)
    val cs = Similarity.refinedCentroids(e, 8)
    assert(cs.length == 8)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / math.sqrt(na * nb)
    }
    val trueCenters = (0 until 8).map { c =>
      val v = Array.fill(64)(0.0f); v(8 * c) = 1.0f; v.toSeq
    }
    // each learned centroid maps cleanly to one true center, and the map
    // covers all 8 — no true cluster left unowned (the failure mode of
    // all-seeds-in-cluster-0)
    val owners = cs.map(c => trueCenters.indices.maxBy(t => cos(c, trueCenters(t))))
    assert(owners.toSet == (0 until 8).toSet, s"clusters owned: ${owners.toSet}")
    cs.zip(owners).foreach { case (c, t) =>
      assert(cos(c, trueCenters(t)) > 0.9, s"centroid too far from its cluster axis: ${cos(c, trueCenters(t))}")
    }
  }

  test("on the clustered fixture, nprobe=1 IVF is exact for in-cluster queries") {
    // with one centroid per true cluster, the query's own cluster holds
    // all its near neighbors — the recall lift the trainer exists for
    val got = Similarity
      .annIvfPartitioned(spark, clusteredDir, queryId = 85L, k = 10, nClusters = 8, nProbe = 1)
      .collect()
      .map(_.getLong(1))
      .toSet
    val brute = Similarity
      .annBruteForce(spark, clusteredDir, queryId = 85L, k = 10)
      .collect()
      .map(_.getLong(1))
      .toSet
    assert(got == brute, s"nprobe=1 missed in-cluster neighbors: ${brute -- got}")
  }

  test("measured lift vs the replaced trainer: lowest-id seeding leaves planted clusters unowned") {
    val e = graft.sources.Tables.embeddings(spark, clusteredDir)
    // the r11 trainer, reproduced: seeds = the 8 lowest-id vectors (ALL in
    // cluster 0 on this fixture) + one Lloyd round
    val seeds = e.orderBy("vec_id").limit(8).collect().map(_.getSeq[Float](1))
    val old   = Similarity.lloydStep(e, seeds)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / math.sqrt(na * nb)
    }
    val trueCenters = (0 until 8).map { c =>
      val v = Array.fill(64)(0.0f); v(8 * c) = 1.0f; v.toSeq
    }
    def owned(cs: Array[Seq[Float]]): Set[Int] =
      cs.map(c => trueCenters.indices.maxBy(t => cos(c, trueCenters(t)))).toSet
    val oldOwned = owned(old)
    val newOwned = owned(Similarity.refinedCentroids(e, 8))
    // the measured lift: the old trainer strands most clusters (its seeds
    // start inside one), the new one covers all 8 — this is what moves the
    // nprobe=1 recall from ~|ownedClusters|/8 to exact on clustered data
    assert(newOwned.size == 8)
    assert(
      oldOwned.size < newOwned.size,
      s"expected the lowest-id trainer to strand clusters on this fixture; owned $oldOwned"
    )
  }

  test("sample-capped training still finds every planted cluster (the 100 TB path)") {
    val e = graft.sources.Tables.embeddings(spark, clusteredDir)
    spark.conf.set("graft.ann.kmeans.sample", "128")
    val cs =
      try Similarity.refinedCentroids(e, 8)
      finally spark.conf.unset("graft.ann.kmeans.sample")
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / math.sqrt(na * nb)
    }
    val trueCenters = (0 until 8).map { c =>
      val v = Array.fill(64)(0.0f); v(8 * c) = 1.0f; v.toSeq
    }
    // training on the 128-row hash slice (of 320) must still own all 8
    // clusters — centroid quality needs a sample, never the corpus
    assert(cs.map(c => trueCenters.indices.maxBy(t => cos(c, trueCenters(t)))).toSet == (0 until 8).toSet)
  }

  test("tiny corpus degrades to one centroid per distinct vector") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_km_tiny").toString
    Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(1.0f, 1.0f))
    ).toDF("vec_id", "embedding").write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val cs = Similarity.refinedCentroids(graft.sources.Tables.embeddings(spark, dir), 16)
    assert(cs.length == 3)
  }

  /** Occupancy-skew fixture for the v5 BALANCE pass, in a 2-D fan (every
    * inter-blob cosine meaningful — no orthogonal ties): a heavy family
    * of 200 vectors in two ±4° lobes around 0° that one centroid owns
    * whole at k=3, plus small blobs at 50° and 90°. Deterministic jitter
    * off-plane keeps the rows distinct.
    */
  private lazy val skewedDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_km_skew").toString
    def at(deg: Double, id: Long): (Long, Seq[Float]) = {
      val r = math.toRadians(deg)
      val v = Array.fill(16)(0.0f)
      v(0) = math.cos(r).toFloat
      v(1) = math.sin(r).toFloat
      (2 until 16).foreach(d => v(d) = ((id * 31 + d * 7) % 13 - 6) * 0.002f)
      (id, v.toSeq)
    }
    val rows =
      (0 until 100).map(i => at(-4.0, i.toLong)) ++
        (0 until 100).map(i => at(4.0, 100L + i)) ++
        (0 until 30).map(i => at(50.0, 200L + i)) ++
        (0 until 30).map(i => at(90.0, 230L + i))
    rows.toDF("vec_id", "embedding").write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("balance pass splits the oversized cluster and holds the occupancy cap; balance=0 reproduces the skew") {
    val e = graft.sources.Tables.embeddings(spark, skewedDir)
    def sizes(cs: Array[Seq[Float]]): Seq[Long] = {
      val m = e.withColumn("cl", Similarity.assignCol(cs))
        .groupBy("cl").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      cs.indices.map(i => m.getOrElse(i, 0L))
    }
    val n    = 260.0
    val mean = n / 3
    // balance OFF: the two heavy lobes land in one centroid — measured
    // max occupancy far above the tau threshold (the r19 crossover skew)
    spark.conf.set("graft.ann.kmeans.balance", "0")
    val raw =
      try sizes(Similarity.refinedCentroids(e, 3))
      finally spark.conf.unset("graft.ann.kmeans.balance")
    assert(raw.sum == 260L)
    assert(raw.max > 1.5 * mean, s"fixture must be skewed without balance; sizes $raw")
    // balance ON (defaults): the heavy cluster splits into its lobes and
    // every cluster sits under tau × mean — effective ≈ nominal pruning
    val balanced = sizes(Similarity.refinedCentroids(e, 3))
    assert(balanced.sum == 260L)
    assert(balanced.max <= 1.25 * mean, s"balance pass left an oversized cluster; sizes $balanced")
    // determinism: the balanced trainer is a pure function of the corpus
    assert(Similarity.refinedCentroids(e, 3).toSeq == Similarity.refinedCentroids(e, 3).toSeq)
  }

  test("weightedReduce: deterministic, spread-seeking, weight-respecting") {
    val cand = Array(
      Seq(1.0f, 0.0f, 0.0f),
      Seq(0.99f, 0.1f, 0.0f), // near-duplicate of 0, light
      Seq(0.0f, 1.0f, 0.0f),
      Seq(0.0f, 0.0f, 1.0f)
    )
    val w = Array(100L, 1L, 90L, 80L)
    val r1 = Similarity.weightedReduce(cand, w, 3)
    val r2 = Similarity.weightedReduce(cand, w, 3)
    assert(r1.toSeq == r2.toSeq, "reduction must be deterministic")
    assert(r1.length == 3)
    // the three heavy, mutually-orthogonal candidates win; the light
    // near-duplicate is absorbed
    def nearest(v: Seq[Float]) = cand.indices.maxBy { i =>
      val d = v.zip(cand(i)).map { case (a, b) => a * b }.sum; d
    }
    assert(r1.map(nearest).toSet == Set(0, 2, 3))
  }
}
