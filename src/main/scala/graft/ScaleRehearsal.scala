package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: replicate the sf0.1 corpus `reps`× with perturbed keys
  * into a MULTI-FILE folder-of-parquet layout (one file per replica — so
  * scans actually parallelize across tasks, unlike the single-file
  * testdata), then time the headline queries on it.
  *
  * Replication rules keep semantics realistic rather than degenerate:
  *   - events: ids offset, ts shifted +i days (distinct time range per
  *     replica → row-group pruning stays meaningful)
  *   - lineitem/orders: order keys offset by the same stride so the join
  *     fan-out per key is unchanged; customer keys untouched so the
  *     customer join gains multiplicity (a realistic hot-dimension)
  *   - documents: ids offset, a unique replica token appended so replicas
  *     are NEAR-dups of each other (~0.97 Jaccard), exercising the dedup
  *     rungs with a 100× bigger pair structure, not exact-dup degenerate
  *
  * Usage: runMain graft.ScaleRehearsal [srcSfDir] [dstDir] [reps]
  * (writes are skipped when dst already exists — delete to rebuild)
  */
object ScaleRehearsal {
  private val Stride = 1000000000L

  def build(spark: SparkSession, src: String, dst: String, reps: Int): Unit = {
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    val fs      = dstPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dst/_built"))) {
      println(s"[rehearsal] $dst already built, reusing"); return
    }
    // no _built marker => any existing data is a partial/failed build; the
    // append-mode writes below would silently stack duplicate replicas on
    // top of it, so wipe first (crash-idempotent rebuild)
    if (fs.exists(dstPath)) {
      println(s"[rehearsal] removing partial build at $dst")
      fs.delete(dstPath, true)
    }
    def replicate(table: String)(xform: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until reps).foreach { i =>
        xform(base, i).coalesce(1).write.mode("append").parquet(s"$dst/$table.parquet")
      }
      println(s"[rehearsal] $table x$reps written")
    }
    replicate("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * Stride))
        .withColumn("ts", col("ts") + lit(i * 86400L * 1000000000L)) // +i days in ns
    }
    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * Stride))
    }
    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * Stride))
    }
    replicate("documents") { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * Stride))
        .withColumn("text", concat(col("text"), lit(s" replica${i}tok")))
    }
    replicate("embeddings") { (df, i) =>
      // ids offset; replicas i>0 get deterministic per-component noise
      // (~±1% of a unit gaussian) so each base vector's replicas are
      // near-dups of each other at cosine ≥~0.99 — n4's positive path at
      // scale, with pair structure reps²× the base corpus's
      df.withColumn("vec_id", col("vec_id") + lit(i * Stride))
        .withColumn(
          "embedding",
          if (i == 0) col("embedding")
          else expr(s"transform(embedding, (x, j) -> float(x + (pmod(hash(vec_id, j, $i), 1000) - 500) / 50000.0))")
        )
    }
    // dimensions pass through unreplicated
    Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    fs.create(new org.apache.hadoop.fs.Path(s"$dst/_built")).close()
  }

  def main(args: Array[String]): Unit = {
    val src  = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst  = args.lift(1).getOrElse("/tmp/graft_sf1ish")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.getOrCreate()
    build(spark, src, dst, reps)

    val headline = Seq(
      "q1_total_count", "q2_time_filter_count", "q4_min_max", "q5_max_by",
      "q9_star_join", "q11_pricing_summary", "n1_ngram_jaccard_pairs",
      "n2_minhash_lsh_pairs", "n3_simhash_pairs", "n4_embedding_dup_pairs",
      "c1_clean_corpus", "s1_ann_bruteforce", "s3_ann_batch_topk",
      "s6_ann_ivf_partitioned", "w2_sessionize", "p1_partitioned_time_count",
      "x3_approx_percentiles", "d6_token_stats", "q21_part_brand_revenue",
      "a3_asof_tolerance", "q22_salted_join_count", "n5_incremental_dedup"
    )
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    headline.foreach { name =>
      val t0 = System.nanoTime()
      val n  = SparkEntry.queries(name)(spark, dst).collect().length
      println(f"[rehearsal] $name%-24s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
