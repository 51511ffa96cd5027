package graft

/** Scratch diagnostic for optimization round 21 — times the warm layout
  * probes and the fixed per-query overhead pieces individually so the
  * optimization targets are measured, not guessed. Not part of the driver
  * contract.
  */
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r  = f
      println(f"[probe] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // 1. contentKey costs
    time("contentKey documents x10") {
      (1 to 10).foreach(_ =>
        graft.sources.LayoutCache.contentKey(spark, s"$sfDir/documents.parquet", "probe"))
    }
    time("contentKey embeddings x10") {
      (1 to 10).foreach(_ =>
        graft.sources.LayoutCache.contentKey(spark, s"$sfDir/embeddings.parquet", "probe"))
    }

    // 2. fresh read.parquet analysis cost (base table, x10)
    time("spark.read.parquet(lineitem) x10") {
      (1 to 10).foreach(_ => spark.read.parquet(s"$sfDir/lineitem.parquet"))
    }
    time("read+schema access lineitem x10") {
      (1 to 10).foreach(_ => spark.read.parquet(s"$sfDir/lineitem.parquet").schema)
    }

    // 3. warm forcer wall times, one by one (layouts already built)
    val t0 = System.nanoTime()
    Layouts.buildAll(spark, sfDir) // first pass: includes any one-time session costs
    println(f"[probe] buildAll warm pass 1 total ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    // second pass: per-forcer wall timing
    val t1 = System.nanoTime()
    Layouts.forcers(spark, sfDir).foreach { case (name, force) =>
      val f0 = System.nanoTime()
      force()
      println(f"[probe] forcer $name%-32s ${(System.nanoTime() - f0) / 1e9}%8.3f s")
    }
    println(f"[probe] buildAll warm pass 2 total ${(System.nanoTime() - t1) / 1e9}%8.3f s")

    // 4. per-query plan-construction vs execution for a sample
    val sample = Seq(
      "q1_total_count", "q9_star_join", "q22_salted_join_count", "s4_ann_ivf",
      "s14_knn_join_ivf", "n2_minhash_lsh_pairs", "t1_bm25_topk", "m9_image_dhash",
      "dq3b_profile_events_bound", "d26_source_affinity", "q51_supplier_busy_days",
      "v1_token_counts", "n19_longest_shared_substring"
    )
    sample.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        // warm both paths once
        fn(spark, sfDir).collect()
        val c0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val construct = (System.nanoTime() - c0) / 1e9
        val e0 = System.nanoTime()
        df.collect()
        val exec = (System.nanoTime() - e0) / 1e9
        // re-construct and re-execute to see rep-to-rep steady state
        val r0 = System.nanoTime()
        fn(spark, sfDir).collect()
        val rep = (System.nanoTime() - r0) / 1e9
        println(f"[probe] q $name%-34s construct=$construct%7.3f exec=$exec%7.3f rep=$rep%7.3f")
      }
    }
    spark.stop()
  }
}
