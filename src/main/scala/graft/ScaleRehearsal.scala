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
      // the raw ts column is LongType nanos OR a native (µs) timestamp
      // depending on the source file's logical type — same dual contract
      // as Tables.events
      val shifted = df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => col("ts") + lit(i * 86400L * 1000000000L) // +i days in ns
        case _                                   => col("ts") + expr(s"INTERVAL $i DAYS")
      }
      df.withColumn("event_id", col("event_id") + lit(i * Stride))
        .withColumn("ts", shifted)
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

  /** Hot-key skew rehearsal — the corpus q22's salting exists for: ~30% of
    * the (already 10×-replicated) lineitem rows rewritten onto ONE
    * orderkey (the `< 3` of 10 hash buckets below), then the q22
    * aggregation timed three ways with broadcast disabled (orders is never
    * broadcastable at real scale):
    *   - plain sort-merge with AQE skew-split OFF — the naive plan, one
    *     reducer absorbs the hot key;
    *   - plain with AQE skew-split ON — Spark's built-in runtime answer;
    *   - [[graft.operators.Skew.saltedJoin]] with skew-split off — the
    *     manual fallback when a hot key outgrows AQE's split thresholds.
    * Numbers land in BASELINE.md beside the other rehearsal evidence.
    */
  def skewRehearsal(spark: SparkSession, src: String, dst: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dst/_built"))) {
      val hotKey = spark.read.parquet(s"$src/orders.parquet").agg(min("o_orderkey")).head().getLong(0)
      spark.read
        .parquet(s"$src/lineitem.parquet")
        .withColumn(
          "l_orderkey",
          when(pmod(xxhash64(col("l_orderkey"), col("l_partkey"), col("l_quantity")), lit(10)) < 3, lit(hotKey))
            .otherwise(col("l_orderkey"))
        )
        .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
      spark.read.parquet(s"$src/orders.parquet").write.mode("overwrite").parquet(s"$dst/orders.parquet")
      fs.create(new org.apache.hadoop.fs.Path(s"$dst/_built")).close()
      println(s"[skew] built hot-key corpus at $dst (hot orderkey = $hotKey)")
    }
    val li  = spark.read.parquet(s"$dst/lineitem.parquet")
    val ord = spark.read.parquet(s"$dst/orders.parquet")
    def agg(j: DataFrame): Long = {
      val t0 = System.nanoTime()
      j.groupBy("o_orderpriority").agg(count(lit(1)).as("cnt")).collect()
      (System.nanoTime() - t0) / 1000000L
    }
    // Deterministic evidence first: max rows landing on ONE reducer of the
    // join, plain vs salted — the straggler that wall-clock jitter hides at
    // toy scale but that decides completion time on a 1000-executor cluster
    // (reducer load is the quantity salting exists to flatten).
    def maxReducerRows(j: DataFrame): Long =
      j.select(spark_partition_id().as("p"))
        .groupBy("p").agg(count(lit(1)).as("n"))
        .agg(max("n")).head().getLong(0)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      // balance must be measured with AQE partition COALESCING off too: a
      // well-balanced salted join produces many small post-shuffle
      // partitions that AQE merges below its advisory size, so
      // spark_partition_id() would count merged partitions and overstate
      // the per-reducer max relative to the fixed 32-reducer ideal. The
      // wall-clock rounds below re-enable it (coalescing is part of the
      // plan a real run executes).
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val rows      = li.count()
      val plainMax  = maxReducerRows(li.join(ord, col("l_orderkey") === col("o_orderkey")))
      val saltedMax = maxReducerRows(graft.operators.Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey"))
      val salted32  = maxReducerRows(graft.operators.Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey", saltFactor = 32))
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      println(
        f"[skew] balance over $rows%d joined rows, 32 reducers (ideal ${rows / 32}%d/reducer): " +
          f"plain max=$plainMax%d (${plainMax * 32.0 / rows}%.1fx ideal)  " +
          f"salt=8 max=$saltedMax%d (${saltedMax * 32.0 / rows}%.1fx)  " +
          f"salt=32 max=$salted32%d (${salted32 * 32.0 / rows}%.1fx)"
      )
      for (round <- 1 to 3) { // round 1 warms JIT/page cache
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        val plain  = agg(li.join(ord, col("l_orderkey") === col("o_orderkey")))
        val salted = agg(graft.operators.Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey"))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        val aqe = agg(li.join(ord, col("l_orderkey") === col("o_orderkey")))
        println(f"[skew] round $round: plain(no-AQE-split)=$plain%d ms  salted=$salted%d ms  plain+AQE-split=$aqe%d ms")
      }
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
  }

  /** Per-task shuffle-read balance across a measured phase: max vs mean
    * bytes over tasks that read any shuffle — the straggler factor that
    * decides completion time on a real cluster (a stage is as slow as its
    * fattest reducer, which wall-clock totals hide at local scale).
    */
  private class TaskBalance extends org.apache.spark.scheduler.SparkListener {
    private val lock          = new Object
    private var mx            = 0L
    private var sum           = 0L
    private var n             = 0L
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        val r = m.shuffleReadMetrics.totalBytesRead
        if (r > 0) lock.synchronized { mx = math.max(mx, r); sum += r; n += 1 }
      }
    }
    def reset(): Unit = lock.synchronized { mx = 0; sum = 0; n = 0 }
    /** (max, mean, taskCount) over shuffle-reading tasks since reset. */
    def stats: (Long, Long, Long) = lock.synchronized { (mx, if (n > 0) sum / n else 0L, n) }
  }

  /** No-broadcast TPC-H join rehearsal (verdict r9 #7): the multi-table
    * join chains on the 10× corpus with BOTH broadcast paths disabled —
    * the planner threshold and AQE's runtime sort-merge→broadcast
    * conversion — i.e. the pure sort-merge world a 100 TB deployment hits
    * when dimension tables outgrow executor memory. Run under
    * `SPARK_DRIVER_MEM=4g` for the constrained-heap variant (the skew/
    * pressure precedent). Records per query: wall, shuffle bytes, spill,
    * and per-task reducer balance ([[TaskBalance]]). The claim to check:
    * every chain completes with bounded spill and near-ideal reducer
    * balance (the join keys are unskewed, so sort-merge partitions
    * evenly) — the plans degrade from broadcast to exchange+sort, never
    * to failure.
    */
  def tpchNoBroadcastRehearsal(spark: SparkSession, src: String, dst: String): Unit = {
    build(spark, src, dst, 10)
    val heapMb = Runtime.getRuntime.maxMemory() / 1048576
    println(s"[tpchnb] heap=${heapMb}MiB corpus=$dst (broadcast disabled: planner + AQE conversion)")
    val pm = new PhaseMetrics
    val tb = new TaskBalance
    spark.sparkContext.addSparkListener(pm)
    spark.sparkContext.addSparkListener(tb)
    val names = Seq(
      "q9_star_join", "q10_rollup", "q21_part_brand_revenue",
      "q23_bucketed_star", "q24_shipping_priority",
      "q25_local_supplier_volume", "q26_monthly_order_trend",
      "q28_above_nation_avg"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      spark.range(1000000).selectExpr("sum(id)").collect() // warmup
      for (round <- 1 to 2) { // round 1 warms page cache/JIT; round 2 is the record
        names.foreach { name =>
          tb.reset()
          val (w0, m0, d0) = pm.snapshot
          val t0           = System.nanoTime()
          val rows         = SparkEntry.queries(name)(spark, dst).collect().length
          val secs         = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200) // let the listeners drain this phase's events
          val (w1, m1, d1)   = pm.snapshot
          val (mx, mean, nt) = tb.stats
          println(
            f"[tpchnb] round $round $name%-26s rows=$rows%-7d $secs%7.1f s  " +
              f"shuffle=${(w1 - w0) / 1048576.0}%8.1f MiB  spill_mem=${(m1 - m0) / 1048576}%d MiB  spill_disk=${(d1 - d0) / 1048576}%d MiB  " +
              f"reducer max/mean=${if (mean > 0) mx.toDouble / mean else 0.0}%.1fx over $nt%d tasks"
          )
        }
      }
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  /** 100× dedup-family rehearsal: the n-family's collision bounds (band
    * width, stop-shingle cap, star-contraction rounds) checked one order of
    * magnitude past the 10× corpus, on a corpus whose DUPLICATE STRUCTURE
    * is realistic at scale — a constant dup RATE, not reps-sized clusters.
    * Replica i of doc d is a NEAR-dup of its base only when (d + i) mod 50
    * = 0 (≈2% of replicas, forming ~2-member clusters per base doc);
    * every other replica gets each token suffixed with its replica index,
    * which rewrites every shingle and makes it similar to nothing. A
    * degenerate alternative (all replicas near-dups, the 10× corpus's
    * rule) would manufacture reps²-sized cliques — C(100,2) ≈ 5k pairs per
    * base doc, ~2.5e8 candidates — which no real corpus exhibits and no
    * candidate-bounded design should be judged on.
    *
    * Records (→ BASELINE.md): max shingle df vs the 1000 stop-shingle cap,
    * band-bucket collision profile (max bucket size, candidate count),
    * verified-pair count (collision efficiency = candidates/verified),
    * star-contraction rounds with per-round edge counts, cluster count and
    * max cluster size, wall time per stage.
    */
  /** Constant-dup-rate replicated documents corpus shared by the dedup100
    * and spans100 rehearsals: replica i of doc d is a near-dup of its base
    * only when (d + i) mod 50 = 0 (≈2%); every other replica has each token
    * suffixed with the replica index, so its shingles/spans are similar to
    * nothing outside its own replica — the span-share and duplicate RATES
    * stay constant as the corpus grows, the realistic 100 TB shape.
    */
  private def ensureReplicatedDocs(spark: SparkSession, src: String, dst: String, reps: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dst/_built"))) return
    if (fs.exists(new org.apache.hadoop.fs.Path(dst))) fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    val base = spark.read.parquet(s"$src/documents.parquet")
    (0 until reps).foreach { i =>
      base
        .withColumn("doc_id", col("doc_id") + lit(i * Stride))
        .withColumn(
          "text",
          when(pmod(col("doc_id") + lit(i), lit(50)) === 0, concat(col("text"), lit(s" rep$i")))
            .otherwise(expr(s"array_join(transform(split(text, ' '), t -> concat(t, '_$i')), ' ')"))
        )
        .coalesce(1)
        .write.mode("append").parquet(s"$dst/documents.parquet")
    }
    fs.create(new org.apache.hadoop.fs.Path(s"$dst/_built")).close()
    println(s"[rehearsal] built ${reps}x documents at $dst")
  }

  def dedupRehearsal(spark: SparkSession, src: String, dst: String, reps: Int): Unit = {
    import graft.operators.Dedup
    val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    ensureReplicatedDocs(spark, src, dst, reps)
    val docs  = spark.read.parquet(s"$dst/documents.parquet")
    val nDocs = docs.count()
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val a = body
      println(f"[dedup100] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); a
    }
    val maxDf = timed("shingle df profile") {
      Dedup.shingles(docs).groupBy("s").agg(count(lit(1)).as("df")).agg(max("df")).head().getLong(0)
    }
    println(f"[dedup100] n_docs=$nDocs%d max_shingle_df=$maxDf%d (stop-shingle cap 1000, margin ${1000.0 / maxDf}%.1fx)")
    // signatures once to parquet (the persisted-index shape), stages read back
    val art = s"$dst/_artifacts"
    timed("minhash signatures") {
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$art/_SUCCESS_ART"))) {
        val (ds, bk) = Dedup.minhashArtifacts(docs)
        ds.write.mode("overwrite").parquet(s"$art/docsets.parquet")
        bk.write.mode("overwrite").parquet(s"$art/buckets.parquet")
        fs.create(new org.apache.hadoop.fs.Path(s"$art/_SUCCESS_ART")).close()
      }
    }
    val buckets = spark.read.parquet(s"$art/buckets.parquet")
    val docSets = spark.read.parquet(s"$art/docsets.parquet")
    val maxBucket = timed("bucket profile") {
      buckets.groupBy("band", "bv").agg(count(lit(1)).as("n")).agg(max("n")).head().getLong(0)
    }
    val cand = buckets
      .as("a")
      .join(buckets.as("b"), col("a.band") === col("b.band") && col("a.bv") === col("b.bv") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .localCheckpoint()
    val nCand     = timed("candidate generation")(cand.count())
    val verified  = Dedup.verifyPairs(docSets, cand).localCheckpoint()
    val nVerified = timed("exact verification")(verified.count())
    println(
      f"[dedup100] max_bucket=$maxBucket%d candidates=$nCand%d verified=$nVerified%d " +
        f"(collision efficiency ${nVerified * 100.0 / math.max(nCand, 1)}%.1f%%)"
    )
    val clusters = timed("star contraction") {
      Dedup
        .clustersFromPairsStar(
          verified.select("doc_a", "doc_b"),
          onRound = Some((r, e) => println(s"[dedup100]   round $r: $e edges"))
        )
        .localCheckpoint()
    }
    val nClusters = clusters.select("cluster_id").distinct().count()
    val maxCluster =
      clusters.groupBy("cluster_id").agg(count(lit(1)).as("n")).agg(max("n")).head().getLong(0)
    println(s"[dedup100] clusters=$nClusters max_cluster_size=$maxCluster")
  }

  /** Aggregated shuffle/spill bytes across completed stages — the metrics
    * a rehearsal records as scale evidence (wall time alone doesn't show
    * WHERE the bytes went or whether memory pressure forced spills).
    */
  private class PhaseMetrics extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new AtomicLong
    val spillMem     = new AtomicLong
    val spillDisk    = new AtomicLong
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted
    ): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
        ()
      }
    }
    def snapshot: (Long, Long, Long) = (shuffleWrite.get, spillMem.get, spillDisk.get)
  }

  /** 100× SPAN-family rehearsal (verdict r7 #6): the explode path
    * (n7/n8/d16/n11) on the constant-rate replicated corpus, recording
    * span-stream volume, per-stage shuffle bytes, and wall time. The span
    * stream is token-linear, so the expectation to check is ~reps× volume
    * and ~reps× shuffle with no superlinear blowup (the island/groupBy
    * machinery is span-stream-linear by design).
    */
  def spansRehearsal(spark: SparkSession, src: String, dst: String, reps: Int): Unit = {
    import graft.operators.Dedup
    ensureReplicatedDocs(spark, src, dst, reps)
    val docs   = spark.read.parquet(s"$dst/documents.parquet")
    val nDocs  = docs.count()
    val tokens = docs.agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    println(f"[spans100] n_docs=$nDocs%d token_stream=$tokens%d (span stream ≈ tokens - 7·docs)")
    val pm = new PhaseMetrics
    spark.sparkContext.addSparkListener(pm)
    def timed(label: String)(body: => Long): Unit = {
      val (w0, s0, d0) = pm.snapshot
      val t0           = System.nanoTime()
      val rows         = body
      val secs         = (System.nanoTime() - t0) / 1e9
      // brief settle so the listener has drained this phase's stage events
      Thread.sleep(200)
      val (w1, _, _) = pm.snapshot
      println(
        f"[spans100] $label%-24s rows=$rows%-9d $secs%7.1f s  shuffle=${(w1 - w0) / 1048576.0}%9.1f MiB" +
          (if (s0 != pm.snapshot._2) " SPILLED" else "")
      )
    }
    timed("n7_shared_spans")(Dedup.sharedSpans(spark, dst).count())
    // n8: a bare count() lets Catalyst prune the flags/md5 projection (and
    // with it most of the redaction work) — aggregate over the OUTPUT
    // columns so the measured time is the redaction, not a row count
    timed("n8_redact_shared_spans") {
      Dedup
        .redactSharedSpans(spark, dst)
        .agg(sum(col("n_masked")).as("m"), count(col("fp_redacted")).as("c"))
        .head()
        .getLong(1)
    }
    timed("d16_span_share")(Dedup.spanShareStats(spark, dst).count())
    timed("n11_max_shared_segments")(Dedup.maxSharedSegments(spark, dst).count())
  }

  /** Memory-pressure rehearsal (verdict r7 #3): the span family + the plain
    * decimal aggregates on the 10× corpus under a CONSTRAINED heap (run
    * with SPARK_DRIVER_MEM=4g — build.sbt passes it to -Xmx), recording
    * wall time and spill bytes. The claim to check: bounded degradation
    * and zero OOM when the working set outgrows memory, because every
    * operator in the set is spillable (sort/hash-agg/window), never
    * driver-materializing.
    */
  def pressureRehearsal(spark: SparkSession, dir: String): Unit = {
    val heapMb = Runtime.getRuntime.maxMemory() / 1048576
    println(s"[pressure] heap=${heapMb}MiB corpus=$dir")
    val pm = new PhaseMetrics
    spark.sparkContext.addSparkListener(pm)
    val names = Seq(
      "n7_shared_spans", "n8_redact_shared_spans", "d16_span_share",
      "n11_max_shared_segments", "q10_rollup", "q11_pricing_summary",
      // round 9: the kNN family's memory profile — s13's scored stream
      // through the bounded TopK buffers, s14's per-cluster hash join
      "s13_knn_join", "s14_knn_join_ivf",
      // round 11 second wave: the widest new shuffles — d31's (doc, gram)
      // window + anti join, d32's gram-keyed candidate join, g3's three
      // propagation rounds, and the PRODUCTION dedup rung n2 (banded
      // LSH). The exact pair rungs (n1/n16) stay out by design: on this
      // rehearsal corpus every replica is a 0.97-Jaccard near-dup of 9
      // others, so the exact candidate stream is ~10× a natural corpus's
      // and OOMs a 4 GiB heap (measured — the banded rung exists for
      // precisely this density; the exact rungs are the oracle rungs).
      "d31_trim_repeated_ngrams", "n2_minhash_lsh_pairs",
      "d32_substring_decontaminate", "g3_label_propagation"
    )
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    for (round <- 1 to 2) { // round 1 warms page cache/JIT; round 2 is the record
      names.foreach { name =>
        val (_, m0, d0) = pm.snapshot
        val t0          = System.nanoTime()
        val rows        = SparkEntry.queries(name)(spark, dir).collect().length
        val secs        = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        val (_, m1, d1) = pm.snapshot
        println(
          f"[pressure] round $round $name%-24s rows=$rows%-8d $secs%7.1f s  " +
            f"spill_mem=${(m1 - m0) / 1048576}%d MiB spill_disk=${(d1 - d0) / 1048576}%d MiB"
        )
      }
    }
  }

  /** Round-8 index-layout rehearsal: ingest (layout build) vs query cost
    * for the postings / maintained-postings / LM-score families at the 10×
    * corpus, with t4's corpus scan as the un-indexed comparator. Layouts
    * are content-keyed, so the first timing of each family is its COLD
    * build+query and the second its warm query.
    */
  def indexRehearsal(spark: SparkSession, dir: String): Unit = {
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[index10] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    import operators.TextAnalysis
    time("t4 corpus-scan BM25 (un-indexed comparator)")(TextAnalysis.bm25Rank(spark, dir).collect())
    time("t6 cold: postings build + query")(TextAnalysis.bm25RankIndexed(spark, dir).collect())
    time("t6 warm query")(TextAnalysis.bm25RankIndexed(spark, dir).collect())
    time("t7 cold: base+delta build + query")(TextAnalysis.bm25RankIncremental(spark, dir).collect())
    time("t7 warm query")(TextAnalysis.bm25RankIncremental(spark, dir).collect())
    time("v3 cold: score layout build + read")(TextAnalysis.bigramLmScore(spark, dir).collect())
    time("v3 warm read")(TextAnalysis.bigramLmScore(spark, dir).collect())
    time("d21 quartile gate (warm layout)")(TextAnalysis.lmQualityKeep(spark, dir).collect())
  }

  /** 100× TEXT-index rehearsal: the postings/BM25/LM-score families on the
    * constant-dup-rate replicated corpus (the same 500k-doc corpus dedup100
    * and spans100 use). The claims to check at this scale: (a) the postings
    * BUILD is one tokenize pass, token-linear like the span family; (b) the
    * warm indexed query reads posting lists + corpus stats, so its cost
    * tracks the query terms' document frequency, NOT the corpus (the
    * replicated corpus suffixes replica tokens, so the query terms' df
    * stays near the base corpus's — exactly the selective-term shape a real
    * query has); (c) the corpus-scan comparator t4 pays the full 100×
    * tokenize every run. Reports df so (b) is measurable, plus per-phase
    * shuffle and spill.
    */
  def textRehearsal(spark: SparkSession, src: String, dst: String, reps: Int): Unit = {
    import graft.operators.TextAnalysis
    ensureReplicatedDocs(spark, src, dst, reps)
    val docs   = spark.read.parquet(s"$dst/documents.parquet")
    val nDocs  = docs.count()
    val tokens = docs.agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    val df = docs
      .select(explode(array_distinct(split(col("text"), " "))).as("t"))
      .where(col("t").isin(TextAnalysis.KeywordTerms: _*))
      .groupBy("t").agg(count(lit(1)).as("df"))
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    println(f"[text100] n_docs=$nDocs%d token_stream=$tokens%d query_term_df: $df")
    val pm = new PhaseMetrics
    spark.sparkContext.addSparkListener(pm)
    def timed(label: String)(body: => Long): Unit = {
      val (w0, _, d0) = pm.snapshot
      val t0          = System.nanoTime()
      val rows        = body
      val secs        = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val (w1, _, d1) = pm.snapshot
      println(
        f"[text100] $label%-40s rows=$rows%-7d $secs%7.1f s  " +
          f"shuffle=${(w1 - w0) / 1048576.0}%9.1f MiB  spill_disk=${(d1 - d0) / 1048576}%d MiB"
      )
    }
    timed("t4 corpus-scan BM25 (un-indexed)")(TextAnalysis.bm25Rank(spark, dst).count())
    timed("t6 cold: postings build + query")(TextAnalysis.bm25RankIndexed(spark, dst).count())
    timed("t6 warm indexed query")(TextAnalysis.bm25RankIndexed(spark, dst).count())
    timed("t7 cold: base+delta build + query")(TextAnalysis.bm25RankIncremental(spark, dst).count())
    timed("t7 warm incremental query")(TextAnalysis.bm25RankIncremental(spark, dst).count())
    timed("v3 cold: LM train + score layout")(TextAnalysis.bigramLmScore(spark, dst).count())
    timed("v3 warm score read")(TextAnalysis.bigramLmScore(spark, dst).count())
    timed("d21 quartile gate (warm layout)")(TextAnalysis.lmQualityKeep(spark, dst).count())
  }

  /** kNN-join rehearsal: the s13/s14 family at 10× vectors (20k × 64d —
    * 4·10⁸ scored pairs on the brute rung). Records the three numbers that
    * matter for the family's scale story: the brute rung's quadratic cost,
    * the IVF rung's cold (layout build + query) and warm costs, and
    * recall@3 of the probe-bounded candidates against the brute truth at
    * the default 4/16 operating point — evidence the nProbe/nClusters
    * knobs, not corpus size, set the recall/cost trade. Numbers land in
    * BASELINE.md beside the other rehearsal evidence.
    */
  def knnRehearsal(spark: SparkSession, dir: String): Unit = {
    import operators.Similarity
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[knn10] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val brute = time("s13 brute kNN join (quadratic comparator)")(
      Similarity.knnJoin(spark, dir).collect()
    )
    val cold = time("s14 IVF kNN join cold (layout build + query)")(
      Similarity.knnJoinIvf(spark, dir).collect()
    )
    time("s14 IVF kNN join warm")(Similarity.knnJoinIvf(spark, dir).collect())
    val truth = brute.groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    val got   = cold.groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    val hits  = got.map { case (id, nbrs) => (truth.getOrElse(id, Set.empty[Long]) & nbrs).size }.sum
    val total = truth.valuesIterator.map(_.size).sum
    println(f"[knn10] s14 recall@3 vs brute: $hits/$total = ${hits.toDouble / total}%.3f over ${truth.size} vectors")
  }

  /** Embeddings-only replicated corpus for [[knn100Rehearsal]] — build()'s
    * embeddings rule (ids offset, replicas i>0 jittered ±1% so each base
    * vector's family is mutually near-dup) without paying for the other
    * tables at 100×.
    */
  private def ensureReplicatedVecs(spark: SparkSession, src: String, dst: String, reps: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dst/_built"))) return
    if (fs.exists(new org.apache.hadoop.fs.Path(dst))) fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    val base = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until reps).foreach { i =>
      base
        .withColumn("vec_id", col("vec_id") + lit(i * Stride))
        .withColumn(
          "embedding",
          if (i == 0) col("embedding")
          else expr(s"transform(embedding, (x, j) -> float(x + (pmod(hash(vec_id, j, $i), 1000) - 500) / 50000.0))")
        )
        .coalesce(1)
        .write.mode("append").parquet(s"$dst/embeddings.parquet")
    }
    fs.create(new org.apache.hadoop.fs.Path(s"$dst/_built")).close()
    println(s"[rehearsal] built ${reps}x embeddings at $dst")
  }

  /** 100× kNN rehearsal (verdict r9 #2): s14 corpus-wide at 200k vectors,
    * ground truth from a SAMPLED brute pass — the full brute rung would be
    * ~4·10¹⁰ scored pairs, the quadratic this family exists to avoid, so
    * ~500 base-replica queries give the recall denominator at 1/400th the
    * cost. Records wall/shuffle/spill per phase, recall@3 of the
    * corpus-wide IVF pass against the sample, and the per-vector
    * s14 : brute cost ratio (the structural number that widens linearly
    * with corpus size). Knobs encode the scale lesson: clusters grow ~√n
    * (256 at 200k, vs the 16 default at 2k), keeping per-cluster width —
    * and with it both probe cost and the cl-join's per-task width — at
    * O(√n), so total scoring is n^1.5, never n².
    */
  def knn100Rehearsal(spark: SparkSession, src: String, dst: String, reps: Int): Unit = {
    import operators.Similarity
    ensureReplicatedVecs(spark, src, dst, reps)
    graft.functions.VectorFunctions.register(spark)
    val pm = new PhaseMetrics
    spark.sparkContext.addSparkListener(pm)
    val e = graft.sources.Tables.embeddings(spark, dst)
    val n = e.count()
    val k  = 3
    val nc = 256
    val np = 8
    println(s"[knn100] n_vectors=$n k=$k nClusters=$nc nProbe=$np")
    def timed[A](label: String)(body: => A): (A, Double) = {
      val (w0, _, d0) = pm.snapshot
      val t0          = System.nanoTime()
      val r           = body
      val secs        = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let the listener drain this phase's stage events
      val (w1, _, d1) = pm.snapshot
      println(
        f"[knn100] $label%-44s $secs%8.1f s  shuffle=${(w1 - w0) / 1048576.0}%9.1f MiB  spill_disk=${(d1 - d0) / 1048576}%d MiB"
      )
      (r, secs)
    }
    // 500 queries from the unjittered base replica, spread across families
    val queries = e
      .where(col("vec_id") < 2000 && col("vec_id") % 4 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val nQueries = queries.count()
    val topk     = graft.functions.TopK.topKIds(k)
    val (truthRows, bruteSecs) = timed(s"brute SAMPLE ($nQueries queries x corpus)") {
      e.crossJoin(broadcast(queries))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), expr("cosine_sim(embedding, qv)").as("cos"))
        .where(col("cos").isNotNull)
        .groupBy("query_id")
        .agg(topk(col("vec_id"), col("cos")).as("ids"))
        .collect()
    }
    val (cold, _) = timed("s14 COLD (layout build + corpus-wide query)") {
      Similarity.knnJoinIvf(spark, dst, k, nClusters = nc, nProbe = np).collect()
    }
    val (_, warmSecs) = timed("s14 WARM (corpus-wide query)") {
      Similarity.knnJoinIvf(spark, dst, k, nClusters = nc, nProbe = np).collect()
    }
    val truth = truthRows.map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val got = cold
      .groupBy(_.getLong(0))
      .collect { case (id, rs) if truth.contains(id) => id -> rs.map(_.getLong(2)).toSet }
    val hits        = got.map { case (id, nbrs) => (truth(id) & nbrs).size }.sum
    val total       = truth.valuesIterator.map(_.size).sum
    val perVecBrute = bruteSecs / math.max(nQueries, 1)
    val perVecS14   = warmSecs / math.max(n, 1)
    println(
      f"[knn100] recall@$k vs sample: $hits/$total = ${hits.toDouble / total}%.3f over ${truth.size} queries"
    )
    println(
      f"[knn100] per-vector cost: brute=${perVecBrute * 1000}%.2f ms  s14=${perVecS14 * 1000}%.2f ms  " +
        f"ratio=${perVecBrute / perVecS14}%.1fx  (full-brute extrapolation ${perVecBrute * n}%.0f s vs s14 warm $warmSecs%.1f s)"
    )
  }

  /** Measured b1/b2 bitext crossover (VERDICT r17 item 5): sf0.1's 2k
    * vectors sit BELOW the crossover (2.27 vs 2.34 s — no measured
    * separation), so the 10⁹×10⁹ feasibility claim rested on the
    * candidate-volume arithmetic alone. This rehearsal measures the
    * separation at the 10× embedding corpus (~20k vectors): b1's exact
    * |S|×|T| scorer vs b2 at the registered (16/4) and the √n-scaled
    * (64/8) knobs, with the SCORED-ROW counts of each path printed beside
    * the wall times — the arithmetic, measured. The IVF layout build is
    * timed apart (the bench cold/warm discipline), and b2's pair
    * agreement vs b1 rides along so the speed row carries its recall
    * cost.
    */
  def bitextRehearsal(spark: SparkSession, src: String, dst: String): Unit = {
    import operators.Similarity
    ensureReplicatedVecs(spark, src, dst, 10)
    graft.functions.VectorFunctions.register(spark)
    val pm = new PhaseMetrics
    spark.sparkContext.addSparkListener(pm)
    def timed[A](label: String)(body: => A): (A, Double) = {
      val (w0, _, d0) = pm.snapshot
      val t0          = System.nanoTime()
      val r           = body
      val secs        = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val (w1, _, d1) = pm.snapshot
      println(
        f"[bitext] $label%-52s $secs%8.1f s  shuffle=${(w1 - w0) / 1048576.0}%9.1f MiB  spill_disk=${(d1 - d0) / 1048576}%d MiB"
      )
      (r, secs)
    }
    val e  = graft.sources.Tables.embeddings(spark, dst)
    val nS = e.where(pmod(col("label"), lit(2)) === 0).count()
    val nT = e.where(pmod(col("label"), lit(2)) === 1).count()
    println(s"[bitext] n=${nS + nT} |S|=$nS |T|=$nT exact_scored=${nS * nT}")
    val (exact, b1Secs) = timed(s"b1 exact (|S|x|T| = ${nS * nT} scored)") {
      Similarity.bitextMarginPairs(spark, dst).collect()
    }
    val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    // rows: the registered fixed point, the hand-scaled r18 point, and
    // the AUTO point resolveIvfKnobs derives for this corpus size
    // (graft.ann.nclusters=auto) — the default a 100 TB deployment runs
    val autoPoint = Similarity.autoIvfKnobs(nS + nT)
    (Seq((16, 4), (64, 8)) :+ autoPoint).distinct.foreach { case (nc, np) =>
      // first counts call forces the layout build (timed apart from the
      // query, the bench discipline); the repeat is the warm count
      val ((fwd, bwd), _) = timed(s"ivf layout build + scored counts nc=$nc np=$np") {
        Similarity.bitextIvfScoredCounts(spark, dst, nc, np)
      }
      val (got, b2Secs) = timed(s"b2 ivf warm nc=$nc np=$np") {
        Similarity.bitextMarginPairsIvf(spark, dst, nClusters = nc, nProbe = np).collect()
      }
      val gotSet = got.map(r => (r.getLong(0), r.getLong(1))).toSet
      val agree  = (gotSet & exactSet).size
      // PER-DIRECTION accounting (round 20): b2 must score the forward
      // and backward kNN lists SEPARATELY (their probe sets differ), so
      // its candidate volume is fwd+bwd, while b1 derives both directions
      // from ONE |S|×|T| matrix — comparing fwd+bwd against that single
      // matrix is what produced the r18/r19 "effective ≈ nominal/2"
      // rows, which read as probe-selection bias toward big clusters but
      // is pure double-counting: per direction the measured pruning
      // tracks nominal to <1%, i.e. probed occupancy is already uniform.
      println(
        f"[bitext] ROW nc=$nc np=$np: b1=$b1Secs%.2f s b2=$b2Secs%.2f s speedup=${b1Secs / b2Secs}%.1fx  " +
          f"per-direction ${nS * nT} -> fwd=$fwd (${(nS * nT).toDouble / fwd}%.2fx) " +
          f"bwd=$bwd (${(nS * nT).toDouble / bwd}%.2fx) vs nominal ${nc.toDouble / np}%.2fx; " +
          f"bidirectional total ${fwd + bwd}  " +
          f"pairs b1=${exactSet.size} b2=${gotSet.size} agree=$agree"
      )
    }
  }

  /** Margin-robustness / pair-YIELD rehearsal at 10× (VERDICT r18 item 8):
    * the r18 crossover corpus is margin-ADVERSARIAL by construction (every
    * vector's davg saturates with its ±1% replica siblings, so b1 emits 0
    * pairs — hub normalization working as designed), which demonstrates
    * wall-time separation but not end-to-end pair YIELD at scale. This
    * rehearsal plants K NON-hubby translated pairs into the same 10×
    * corpus — fresh 64-dim gaussian bases (near-orthogonal to every
    * replica family) with a 0.005-jittered partner on the opposite label
    * parity, the bitextplant recipe at scale — and requires BOTH b1
    * (exact) and b2 (IVF at the AUTO operating point) to mine exactly
    * those K pairs out of 20k vectors: planted partners are mutual
    * nearest across halves at cosine ≈ 0.99998 while their neighborhoods
    * are background (davg ≈ 0.3–0.5), so margin ≈ 2 clears 1.05 with a
    * decade of headroom, and every replica-family vector still yields
    * nothing. A planted pair missing from b2 would be the auto point
    * trading recall away; an extra pair would be hub leakage.
    */
  def bitextYieldRehearsal(spark: SparkSession, src: String, dst: String): Unit = {
    import operators.Similarity
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val fs      = new org.apache.hadoop.fs.Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val planted = new org.apache.hadoop.fs.Path(s"$dst/_planted")
    val K       = 5
    val baseId  = 4100000L
    // `_planted` seals corpus+plant TOGETHER: if it is missing, the dir is
    // either absent or possibly half-planted (a crash between the append
    // and the marker would otherwise duplicate the planted vec_ids on the
    // next run) — rebuild the whole corpus from scratch rather than trust
    // partial state (the ensureReplicatedVecs delete-and-rebuild rule,
    // applied at this rehearsal's outermost marker).
    if (!fs.exists(planted) && fs.exists(new org.apache.hadoop.fs.Path(dst)))
      fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    ensureReplicatedVecs(spark, src, dst, 10)
    if (!fs.exists(planted)) {
      val rnd = new scala.util.Random(20260817)
      def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
      // label stays Int — the corpus column is INT32, and a mixed
      // int/long fan makes the read depend on which footer Spark samples
      // for the schema (worked-by-luck on the first build, failed on the
      // rebuild path)
      val rows = (0 until K).flatMap { p =>
        val b = vec()
        Seq(
          (baseId + 2 * p, b, 2 * p),
          (baseId + 2 * p + 1, b.map(x => x + 0.005f * rnd.nextGaussian().toFloat), 2 * p + 1)
        )
      }
      rows.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("append").parquet(s"$dst/embeddings.parquet")
      fs.create(planted).close()
      println(s"[bitextyield] planted $K translated pairs at ids $baseId+")
    }
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a  = body
      println(f"[bitextyield] $label%-48s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      a
    }
    val expected = (0 until K).map(p => (baseId + 2 * p, baseId + 2 * p + 1)).toSet
    def grade(name: String, got: Set[(Long, Long)]): Unit = {
      val ok = got == expected
      println(
        s"[bitextyield] $name pairs=${got.size} planted_recovered=${(got & expected).size}/$K " +
          s"extras=${(got -- expected).size} ${if (ok) "EXACT-YIELD" else s"DIVERGED ${got -- expected} missing ${expected -- got}"}"
      )
    }
    grade("b1 exact", timed("b1 exact (1e8 scored, planted corpus)") {
      Similarity.bitextMarginPairs(spark, dst).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    })
    val (anc, anp) = Similarity.autoIvfKnobs(
      graft.sources.Tables.embeddings(spark, dst).count())
    grade(s"b2 ivf auto nc=$anc np=$anp", timed(s"b2 ivf auto nc=$anc np=$anp") {
      Similarity.bitextMarginPairsIvf(spark, dst, nClusters = anc, nProbe = anp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    })
  }

  /** kNN-graph takedown at 10× (round 18): the claim under test is the
    * s15t/s16t shape — takedown cost = two anti-joins + a window over the
    * doc×8 edge LEDGER (+ a recompute proportional to the overflow set,
    * normally empty), never the corpus-wide scoring pass. Three timed
    * rows at the 10× embedding corpus: the ledger build (the once-per-
    * corpus-version cost the walk amortizes), the survivor walk itself,
    * and the from-scratch survivor REBUILD it replaces; plus the overflow
    * row count (expected 0 — the ~3e-5 measure needs ≥6 of a vector's
    * top-8 tombstoned).
    */
  def knnTakedownRehearsal(spark: SparkSession, src: String, dst: String): Unit = {
    import operators.Similarity
    ensureReplicatedVecs(spark, src, dst, 10)
    graft.functions.VectorFunctions.register(spark)
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a  = body
      println(f"[knnt] $label%-52s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      a
    }
    val n = graft.sources.Tables.embeddings(spark, dst).count()
    println(s"[knnt] n_vectors=$n ledger_depth=${Similarity.KnnGraphLedgerDepth}")
    timed("edge-ledger build (once per corpus version)") {
      Similarity.knnGraphLayoutCache(spark, dst, 3)
    }
    // since r19 the rungs serve from the persisted knntd layout: the first
    // call PAYS the walk (mask + ledger window + recompute + contraction)
    // as the layout build — the once-per-takedown-version cost — and the
    // repeat rows are what every subsequent query pays (parquet reads)
    val pairs = timed("takedown layout BUILD + first read (s15t cold)") {
      Similarity.mutualKnnPairsTombstoned(spark, dst).count()
    }
    val clusters = timed("takedown clusters first read (s16t, shares the build)") {
      Similarity.mutualKnnClustersTombstoned(spark, dst).count()
    }
    timed("s15t WARM (persisted serve — the per-query cost)") {
      Similarity.mutualKnnPairsTombstoned(spark, dst).count()
    }
    timed("s16t WARM (persisted serve — the per-query cost)") {
      Similarity.mutualKnnClustersTombstoned(spark, dst).count()
    }
    timed("from-scratch survivor REBUILD (the shape the walk replaces)") {
      val surv = graft.sources.Tables
        .embeddings(spark, dst)
        .join(Similarity.knnTombstones(spark, dst), Seq("vec_id"), "left_anti")
        .select("vec_id", "embedding")
      // the real brute core, not a re-implementation — the timed row must
      // measure exactly the shape s13/the layout build pays
      Similarity.knnJoinOver(surv, 3).count()
    }
    println(s"[knnt] ROW pairs=$pairs clusters=$clusters")
  }

  /** Streaming-maintenance throughput rehearsal: [[graft.streaming.DedupStream]]'s
    * per-batch unit driven over the 10× documents corpus in `nBatches`
    * equal hash-slices, recording per-batch wall, discovered pairs, and
    * shuffle — the claim to check is that per-batch cost tracks the BATCH
    * (plus the bounded bucket join against the growing stored index), not
    * the cumulative corpus: the curve should be near-flat while the index
    * grows `nBatches`×, because no document is ever re-shingled after its
    * own batch and cross-candidates come only from band-bucket collisions.
    */
  /** Streaming-novelty rehearsal: feed the replicated corpus to
    * [[graft.streaming.NoveltyStream]] in micro-batches and record, per
    * batch, wall/shuffle AND the first-seen index growth. The claim under
    * test is the operator's core scale property: the index grows by the
    * NOVEL fraction only — on a replicated corpus the later batches are
    * mostly stale, so index appends should collapse toward zero while
    * per-batch scoring cost stays flat (the redundant bulk a crawl stream
    * carries is exactly what must not accrete state).
    */
  def noveltyStreamRehearsal(spark: SparkSession, src: String, dst: String, reps: Int, nBatches: Int = 5): Unit = {
    // VERBATIM replication (not ensureReplicatedDocs, whose per-replica
    // token suffixes deliberately make replicas lexically novel for the
    // dedup rehearsals): replica i keeps the text and shifts the id, so
    // later arrivals are pure content repetition — the crawl-recrawl shape
    // this operator exists for.
    val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dst/_built"))) {
      if (fs.exists(new org.apache.hadoop.fs.Path(dst))) fs.delete(new org.apache.hadoop.fs.Path(dst), true)
      val baseDocs = spark.read.parquet(s"$src/documents.parquet")
      (0 until reps).foreach { i =>
        baseDocs
          .withColumn("doc_id", col("doc_id") + lit(i * Stride))
          .coalesce(1)
          .write.mode("append").parquet(s"$dst/documents.parquet")
      }
      fs.create(new org.apache.hadoop.fs.Path(s"$dst/_built")).close()
    }
    val pm = new PhaseMetrics
    spark.sparkContext.addSparkListener(pm)
    val docs  = spark.read.parquet(s"$dst/documents.parquet")
    val base  = java.nio.file.Files.createTempDirectory("graft_novelty10").toString
    val total = docs.count()
    println(s"[novelty10] n_docs=$total in $nBatches replica-sliced micro-batches (ids stride-encoded)")
    (0 until nBatches).foreach { i =>
      // replica-ordered slices: arrival order = replication order
      val slice = docs.where(expr(s"((doc_id div $Stride) * $nBatches) div $reps") === i)
      val (w0, _, _) = pm.snapshot
      val t0         = System.nanoTime()
      graft.streaming.NoveltyStream.processBatch(slice, s"$base/idx", s"$base/novelty", i.toLong)
      val secs       = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val (w1, _, _) = pm.snapshot
      val appended   = spark.read.parquet(s"$base/idx/firsts/batch_id=$i").count()
      val scored     = spark.read.parquet(s"$base/novelty/batch_id=$i").count()
      println(
        f"[novelty10] batch $i%d: docs=${slice.count()}%-7d scored=$scored%-7d index_appends=$appended%-8d $secs%6.1f s  shuffle=${(w1 - w0) / 1048576.0}%8.1f MiB"
      )
    }
    val idx = spark.read.parquet(s"$base/idx/firsts").count()
    println(s"[novelty10] final index rows=$idx (= distinct shingles of the whole corpus — each stored once)")
  }

  def streamRehearsal(spark: SparkSession, src: String, dst: String, reps: Int, nBatches: Int = 5): Unit = {
    ensureReplicatedDocs(spark, src, dst, reps)
    val pm = new PhaseMetrics
    spark.sparkContext.addSparkListener(pm)
    val docs  = spark.read.parquet(s"$dst/documents.parquet")
    val base  = java.nio.file.Files.createTempDirectory("graft_stream10").toString
    val total = docs.count()
    println(s"[stream10] n_docs=$total in $nBatches hash-sliced micro-batches (index grows, batches don't)")
    (0 until nBatches).foreach { i =>
      val slice        = docs.where(pmod(xxhash64(col("doc_id")), lit(nBatches)) === i)
      val (w0, _, _)   = pm.snapshot
      val t0           = System.nanoTime()
      graft.streaming.DedupStream.processBatch(slice, s"$base/idx", s"$base/pairs", i.toLong)
      val secs         = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val (w1, _, _) = pm.snapshot
      val pairs      = spark.read.parquet(s"$base/pairs/batch_id=$i").count()
      println(
        f"[stream10] batch $i%d: docs=${slice.count()}%-7d pairs=$pairs%-6d $secs%6.1f s  shuffle=${(w1 - w0) / 1048576.0}%8.1f MiB"
      )
    }
  }

  /** Round-11-wave rehearsal (verdict r11 #8): the operators the r11 waves
    * added, at the scales their docstrings claim — d31's (doc, gram)
    * windows, t15's positional postings and the m6–m8 decode maps on the
    * 100× replicated documents corpus; q51's per-supplier interval islands
    * on 10× lineitem (the corpus build()'s replication supports). Each
    * family runs at 1× first so the printed pair IS the measured ratio.
    * The claims to check: d31 and t15 stay token-linear (windows keyed by
    * (doc, gram) / token — no global order anywhere); the decode family is
    * a shuffle-free map pass whose cost is the payload scan; q51's keyed
    * windows hold one supplier's intervals, so 10× rows cost ~10× wall
    * with no spill cliff.
    */
  def wave100Rehearsal(spark: SparkSession, src: String, dstDocs: String, reps: Int, dstTenX: String): Unit = {
    import graft.operators.{CoreQueries, Multimodal, TextAnalysis}
    ensureReplicatedDocs(spark, src, dstDocs, reps)
    val nDocs = spark.read.parquet(s"$dstDocs/documents.parquet").count()
    println(s"[wave100] n_docs=$nDocs (${reps}x) — d31/t15/m6-m8; q51 at 10x lineitem")
    val pm = new PhaseMetrics
    spark.sparkContext.addSparkListener(pm)
    def timed(label: String)(body: => Long): Unit = {
      val (w0, _, d0) = pm.snapshot
      val t0          = System.nanoTime()
      val rows        = body
      val secs        = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val (w1, _, d1) = pm.snapshot
      println(
        f"[wave100] $label%-44s rows=$rows%-8d $secs%7.1f s  " +
          f"shuffle=${(w1 - w0) / 1048576.0}%9.1f MiB  spill_disk=${(d1 - d0) / 1048576}%d MiB"
      )
    }
    timed("d31 trim repeated ngrams 1x")(TextAnalysis.trimRepeatedNgrams(spark, src).count())
    timed(s"d31 trim repeated ngrams ${reps}x")(TextAnalysis.trimRepeatedNgrams(spark, dstDocs).count())
    timed("t15 phrase 1x (cold: positions build)")(TextAnalysis.phraseSearchIndexed(spark, src).count())
    timed(s"t15 phrase ${reps}x cold: positions build")(TextAnalysis.phraseSearchIndexed(spark, dstDocs).count())
    timed(s"t15 phrase ${reps}x warm over positions")(TextAnalysis.phraseSearchIndexed(spark, dstDocs).count())
    timed("m6 audio frame energy 1x")(Multimodal.audioFrameEnergyQuery(spark, src).count())
    timed(s"m6 audio frame energy ${reps}x")(Multimodal.audioFrameEnergyQuery(spark, dstDocs).count())
    timed("m7 activity segments 1x")(Multimodal.audioActivitySegments(spark, src).count())
    timed(s"m7 activity segments ${reps}x")(Multimodal.audioActivitySegments(spark, dstDocs).count())
    timed("m8 image histogram 1x")(Multimodal.imageHistogramQuery(spark, src).count())
    timed(s"m8 image histogram ${reps}x")(Multimodal.imageHistogramQuery(spark, dstDocs).count())
    build(spark, src, dstTenX, 10)
    timed("q51 supplier busy days 1x")(CoreQueries.q51SupplierBusyDays(spark, src).count())
    timed("q51 supplier busy days 10x")(CoreQueries.q51SupplierBusyDays(spark, dstTenX).count())
  }

  /** Deletion-lifecycle + sequence-export rehearsal (round 12): t16's
    * compaction fold and t17's tombstone mask on the 100× documents
    * corpus; u4's per-user sequences on 10× events. Claims: the fold is
    * one token-keyed shuffle (cost ≈ one segment build, not N); the mask
    * adds a broadcast anti join + one stats row to the query (≈ free);
    * u4's per-key state is one user's events — 10× rows ⇒ ~10× wall, no
    * cliff.
    */
  def lifecycleRehearsal(spark: SparkSession, src: String, dstDocs: String, reps: Int, dstTenX: String): Unit = {
    import graft.operators.{Retention, TextAnalysis}
    ensureReplicatedDocs(spark, src, dstDocs, reps)
    build(spark, src, dstTenX, 10)
    val pm = new PhaseMetrics
    spark.sparkContext.addSparkListener(pm)
    def timed(label: String)(body: => Long): Unit = {
      val (w0, _, d0) = pm.snapshot
      val t0          = System.nanoTime()
      val rows        = body
      val secs        = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val (w1, _, d1) = pm.snapshot
      println(
        f"[lifecycle] $label%-44s rows=$rows%-8d $secs%7.1f s  " +
          f"shuffle=${(w1 - w0) / 1048576.0}%9.1f MiB  spill_disk=${(d1 - d0) / 1048576}%d MiB"
      )
    }
    timed("t7 maintained (base+delta) build+query 100x")(TextAnalysis.bm25RankIncremental(spark, dstDocs).count())
    timed("t16 compaction fold + query 100x (cold)")(TextAnalysis.bm25RankCompacted(spark, dstDocs).count())
    timed("t16 compacted query 100x (warm)")(TextAnalysis.bm25RankCompacted(spark, dstDocs).count())
    timed("t17 tombstone-masked query 100x")(TextAnalysis.bm25RankTombstoned(spark, dstDocs).count())
    timed("u4 user sequences 1x")(Retention.userEventSequences(spark, src).count())
    timed("u4 user sequences 10x events")(Retention.userEventSequences(spark, dstTenX).count())
  }

  /** Round-13 rehearsal: the perceptual-dedup pair join (n17) on the 100×
    * documents corpus — the synthetic rasters are the DEGENERATE case
    * (tiny images ⇒ few distinct dHashes ⇒ hot band buckets growing
    * linearly, candidate pairs quadratically), so this measures the
    * documented worst case, not the photo-corpus typical case; the dHash
    * ledger itself (m9, map-only) beside it; the bloom-manifest point
    * lookup (z2) against its own full scan on 10× events at 64 files; and
    * t18's pruned regex search at 100× docs (index build cold, query
    * warm).
    */
  def round13Rehearsal(spark: SparkSession, src: String, dstDocs: String, reps: Int, dstTenX: String): Unit = {
    import graft.operators.{Dedup, Multimodal, TextAnalysis}
    import graft.sources.BloomManifest
    ensureReplicatedDocs(spark, src, dstDocs, reps)
    build(spark, src, dstTenX, 10)
    val pm = new PhaseMetrics
    spark.sparkContext.addSparkListener(pm)
    def timed(label: String)(body: => Long): Unit = {
      val (w0, _, d0) = pm.snapshot
      val t0          = System.nanoTime()
      val rows        = body
      val secs        = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val (w1, _, d1) = pm.snapshot
      println(
        f"[round13] $label%-44s rows=$rows%-8d $secs%7.1f s  " +
          f"shuffle=${(w1 - w0) / 1048576.0}%9.1f MiB  spill_disk=${(d1 - d0) / 1048576}%d MiB"
      )
    }
    timed("m9 dHash ledger 1x")(Multimodal.imageDhashQuery(spark, src).count())
    timed(s"m9 dHash ledger ${reps}x")(Multimodal.imageDhashQuery(spark, dstDocs).count())
    timed("n17 dHash pairs 1x")(Dedup.imageDhashPairs(spark, src).count())
    timed(s"n17 dHash pairs ${reps}x (degenerate hashes)")(Dedup.imageDhashPairs(spark, dstDocs).count())
    timed("t18 regex search 1x (cold: trigram build)")(TextAnalysis.regexSearch(spark, src).count())
    timed(s"t18 regex search ${reps}x cold: trigram build")(TextAnalysis.regexSearch(spark, dstDocs).count())
    timed(s"t18 regex search ${reps}x warm over index")(TextAnalysis.regexSearch(spark, dstDocs).count())
    // z2 at 10x events, 64 files: manifest build (cold), then probe+read
    // vs the full scan over the same rewritten data
    val layout = {
      val t0 = System.nanoTime()
      val l  = BloomManifest.eventsManifestCache(spark, dstTenX, nFiles = 64)
      println(f"[round13] z2 manifest build 10x events / 64 files          ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      l
    }
    val probeKey = spark.read.parquet(s"$layout/data").select("event_id").head().getLong(0)
    val nCand    = BloomManifest.candidateFiles(spark, s"$layout/manifest.parquet", probeKey).size
    println(s"[round13] z2 candidate files for present key: $nCand of 64")
    timed("z2 bloom-pruned point lookup 10x")(
      BloomManifest.pointLookupBloomPruned(spark, dstTenX, probeKey, nFiles = 64).count()
    )
    timed("z2 full-scan point filter 10x (same data)")(
      spark.read.parquet(s"$layout/data").where(org.apache.spark.sql.functions.col("event_id") === probeKey).count()
    )
  }

  /** Round-14 rehearsal: the four new rungs at scale.
    *
    *   - n21 on the SAME degenerate 100× image corpus whose uncapped n17
    *     expansion is 1.46B pairs — the cap's whole point: the capped
    *     ledger must come back in seconds with hash-cardinality output.
    *   - m10/n20 (audio hash + pairs) at 1× and 100× — the n17 shape on
    *     the WAV quarter.
    *   - n19 (longest shared substring) live computation at 1× and 10× —
    *     the `cap×`-token generate + long-key candidate aggregation whose
    *     cost the layout build absorbs in production; replicas are
    *     near-dups of their base, so the 10× corpus exercises a dense
    *     shared-substring structure, not a disjoint one.
    */
  /** Stamp the executor geometry (cores, max heap) into the pressure
    * record the same way the bench stamps its host sentinel — VERDICT r18
    * item 2: a pressure row is only evidence at a KNOWN geometry (the
    * 10⁶-hash band walk is flaky at 128 MiB/core and clean at 512), so
    * the record must carry the geometry it ran at, not leave it to be
    * reconstructed from shell history.
    */
  private def geometryStamp(spark: SparkSession, tag: String): Unit =
    println(
      f"[$tag] geometry: cpus=${spark.sparkContext.defaultParallelism} " +
        f"heap_gib=${Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)}%.1f"
    )

  def round14Rehearsal(spark: SparkSession, src: String, dstDocs: String, reps: Int, dstTenX: String): Unit = {
    import graft.operators.{Dedup, Multimodal}
    geometryStamp(spark, "round14")
    ensureReplicatedDocs(spark, src, dstDocs, reps)
    build(spark, src, dstTenX, 10)
    val pm = new PhaseMetrics
    spark.sparkContext.addSparkListener(pm)
    def timed(label: String)(body: => Long): Unit = {
      val (w0, _, d0) = pm.snapshot
      val t0          = System.nanoTime()
      val rows        = body
      val secs        = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val (w1, _, d1) = pm.snapshot
      println(
        f"[round14] $label%-44s rows=$rows%-10d $secs%7.1f s  " +
          f"shuffle=${(w1 - w0) / 1048576.0}%9.1f MiB  spill_disk=${(d1 - d0) / 1048576}%d MiB"
      )
    }
    timed("n21 capped pairs 1x")(Dedup.imageDhashPairsCapped(spark, src).count())
    timed(s"n21 capped pairs ${reps}x (n17 here: 1.46B)")(Dedup.imageDhashPairsCapped(spark, dstDocs).count())
    timed("m10 audio hash ledger 1x")(Multimodal.audioEnvelopeHashQuery(spark, src).count())
    timed(s"m10 audio hash ledger ${reps}x")(Multimodal.audioEnvelopeHashQuery(spark, dstDocs).count())
    timed("n20 audio pairs 1x")(Dedup.audioHashPairs(spark, src).count())
    timed(s"n20 audio pairs ${reps}x")(Dedup.audioHashPairs(spark, dstDocs).count())
    timed("n22 capped audio pairs 1x")(Dedup.audioHashPairsCapped(spark, src).count())
    timed(s"n22 capped audio pairs ${reps}x (n20: 939M)")(Dedup.audioHashPairsCapped(spark, dstDocs).count())
    timed("n19 LSS live 1x")(
      Dedup.longestSharedSubstringFrom(graft.sources.Tables.documents(spark, src), 16).count()
    )
    timed("n19 LSS live 10x")(
      Dedup.longestSharedSubstringFrom(graft.sources.Tables.documents(spark, dstTenX), 16).count()
    )
  }

  /** Round-15 rehearsal: the band-walk occupancy cap on the NEAR-UNIQUE
    * hash corpus the round-14 verdict flagged as the family's untested
    * shape — `n` (default 10⁶) distinct uniform 64-bit hashes (xxhash64
    * of the row id), where the synthetic image/audio corpora are
    * degenerate (few distinct hashes) and real photo corpora live. The
    * old single-level plan's candidate volume is computed ARITHMETICALLY
    * from level-0 bucket occupancies (Σ occ·(occ−1)/2 — it is never
    * executed: at 10⁶ hashes it is ~1.5×10¹⁰ candidate pairs); the
    * walk's actual candidate volume, per-level occupancy profile, pair
    * count, and the capped rung are measured live.
    */
  def bandWalkRehearsal(spark: SparkSession, n: Long): Unit = {
    import graft.operators.Dedup
    geometryStamp(spark, "round15")
    val v = xxhash64(col("id"))
    val h = spark
      .range(n)
      .select(
        col("id").as("media_id"),
        shiftrightunsigned(v, 32).as("hash_hi"),
        v.bitwiseAND(lit(0xffffffffL)).as("hash_lo")
      )
      .persist()
    val hu = h.select("hash_hi", "hash_lo").distinct()
    println(s"[round15] distinct hashes: ${hu.count()} of $n media")
    val bands0 = hu.select(explode(array((0 until 8).map { k =>
      val src = if (k < 4) col("hash_lo") else col("hash_hi")
      concat_ws(":", lit(k), shiftright(src, (k % 4) * 8).bitwiseAND(lit(255L)))
    }: _*)).as("b"))
    val oldCand = bands0
      .groupBy("b").agg(count(lit(1)).as("occ"))
      .agg(sum(expr("occ * (occ - 1) div 2"))).head().getLong(0)
    println(f"[round15] OLD single-level candidate volume (arithmetic): $oldCand%,d pairs")
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a  = body
      println(f"[round15] $label%-52s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      a
    }
    val stats = scala.collection.mutable.ListBuffer.empty[Dedup.DhashBandLevelStats]
    val (cands, residual) = timed("band walk (control flow, per-level occupancy)")(
      Dedup.dhashBandWalk(h, Some(stats))
    )
    stats.foreach { s =>
      println(
        f"[round15]   level ${s.level}: rows_in=${s.rowsIn}%,d buckets=${s.nBuckets}%,d " +
          f"hot=${s.nHot}%,d max_occ=${s.maxOcc}%,d"
      )
    }
    val nCand = timed("walk candidate volume (executed)")(cands.count())
    val nRes  = residual.count()
    println(f"[round15] walk candidates: $nCand%,d (${oldCand.toDouble / math.max(1, nCand)}%.0fx below old plan); residual rows: $nRes%,d")
    timed("n17-shape verified pairs (full rung)")(
      println(s"[round15]   pairs=${Dedup.dhashPairsFromHashes(h).count()}")
    )
    timed("n21-shape capped ledger (full rung)")(
      println(s"[round15]   rows=${Dedup.dhashPairsCappedFromHashes(h, 16L).count()}")
    )
    h.unpersist()
  }

  /** Round-17 rehearsal: the LSS v3 top-K span ledger trade, measured.
    * The ledger exists so a takedown-set version costs ledger-cardinality
    * joins instead of a full survivors recompute (the v2 cost shape paid
    * per (corpus, takedown-set) version). Three numbers per corpus size:
    *   - INGEST: the v3 layout build (lss + partners + topk written, the
    *     real `lssLayoutCache` shape) — and at 1× also the v2-shape build
    *     (lss + partners only), so the ledger's ingest overhead is an
    *     isolated delta, not an inference;
    *   - WALK: `lssTakedownFromLedger` under the registered t17 rule,
    *     decided/overflow split printed — the per-version cost the ledger
    *     reduces takedowns to;
    *   - OLD SHAPE: the survivors recompute the v2 path paid for every
    *     version, timed live for the ratio.
    * Tombstones derive from the ledger's own doc_ids so the walk's plan
    * touches ledger-cardinality data only (prod hands it a small list).
    */
  def lssTakedownRehearsal(spark: SparkSession, src: String, dstTenX: String): Unit = {
    import graft.operators.Dedup
    build(spark, src, dstTenX, 10)
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a  = body
      println(f"[round17] $label%-52s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      a
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_lss_rehearsal").toString
    for ((label, dir) <- Seq("1x" -> src, "10x" -> dstTenX)) {
      val docs = graft.sources.Tables.documents(spark, dir)
      if (label == "1x") timed(s"$label standalone n19 fold (single-output pass)") {
        Dedup
          .longestSharedSubstringFrom(docs, 16)
          .write.mode("overwrite").parquet(s"$tmp/v2_$label/lss.parquet")
      }
      timed(s"$label ingest, production shape (topk once + projections)") {
        val (_, _, topk) = Dedup.longestSharedSubstringArtifacts(docs, 16, 4)
        topk.write.mode("overwrite").parquet(s"$tmp/v3_$label/topk.parquet")
        val t = docs.sparkSession.read.parquet(s"$tmp/v3_$label/topk.parquet")
        Dedup.lssFromTopk(t).write.mode("overwrite").parquet(s"$tmp/v3_$label/lss.parquet")
        Dedup.lssPartnersFromTopk(t).write.mode("overwrite").parquet(s"$tmp/v3_$label/partners.parquet")
      }
      val topk = spark.read.parquet(s"$tmp/v3_$label/topk.parquet")
      // same rule as the OLD-shape row below (ADVICE r17: the walk used
      // to tombstone only LEDGER-RESIDENT pmod-3 docs while the rebuild
      // removed pmod-3 from the whole corpus — two slightly different
      // takedown sets under one printed ratio). Deriving both from the
      // corpus rule keeps the comparison apples-to-apples; the walk's
      // plan stays ledger-cardinality either way because tombstones
      // arrive as a small relation joined into the ledger.
      val tomb = docs.where(pmod(col("doc_id"), lit(10)) === 3).select("doc_id")
      timed(s"$label takedown walk (ledger-cardinality)") {
        val (decided, recompute) = Dedup.lssTakedownFromLedger(topk, tomb)
        val d = decided.count()
        val r = recompute.count()
        println(f"[round17]   decided=$d%,d overflow_recompute=$r%,d")
      }
      timed(s"$label OLD shape: survivors recompute") {
        Dedup
          .longestSharedSubstringFrom(docs.where(pmod(col("doc_id"), lit(10)) =!= 3), 16)
          .count()
      }
      // the overflow fix, measured against the OLD shape above on the
      // same survivor corpus: a synthetic 2% target set (the registered
      // rule's real overflow is 43 docs at 1x and empty at 10x — too
      // small/absent to time), so the ratio is the conservative one
      val survivors = docs.where(pmod(col("doc_id"), lit(10)) =!= 3)
      timed(s"$label TARGETED recompute, 2%% synthetic target set") {
        val targets = survivors.where(pmod(col("doc_id"), lit(50)) === 7).select("doc_id")
        val n = Dedup.longestSharedSubstringTargeted(survivors, targets, 16).count()
        println(f"[round17]   targeted rows=$n%,d")
      }
    }
  }

  /** Round-17 rehearsal #2: streaming LSS maintenance at 10× — one
    * replica of the sf0.1 documents per micro-batch, so the measured
    * question is the one that matters at 100 TB: what does the MARGINAL
    * batch cost as history grows, vs re-paying the full rebuild per
    * arrival (the lsstakedown rehearsal's 10× ingest row, 230–286 s)?
    * Prints per-batch seconds (batch explode + narrow key-segment scan +
    * snapshot fold) and closes with a row-count reconciliation against
    * the snapshot chain's final state.
    */
  def lssStreamRehearsal(spark: SparkSession, src: String, dstTenX: String): Unit = {
    build(spark, src, dstTenX, 10)
    val docs = graft.sources.Tables.documents(spark, dstTenX)
    val dir  = java.nio.file.Files.createTempDirectory("graft_lss_stream_rehearsal").toString
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a  = body
      println(f"[round17] $label%-52s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      a
    }
    (0 until 10).foreach { i =>
      val b = docs.where(expr(s"doc_id div $Stride") === i)
      timed(s"stream batch $i (one sf0.1 replica)")(
        graft.streaming.LssStream.processBatch(b, dir, i.toLong)
      )
    }
    val n = graft.streaming.LssStream.longestSharedSubstringStreamed(spark, dir).count()
    println(f"[round17] final streamed snapshot rows: $n%,d")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("lssstream")) {
      val spark = GraftSession.getOrCreate()
      val src   = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val tenX  = args.lift(2).getOrElse("/tmp/graft_sf1ish")
      require(tenX != src && !src.startsWith(tenX), s"dst $tenX would clobber src $src")
      lssStreamRehearsal(spark, src, tenX)
      spark.stop()
      return
    }
    if (args.headOption.contains("lsstakedown")) {
      val spark = GraftSession.getOrCreate()
      val src   = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val tenX  = args.lift(2).getOrElse("/tmp/graft_sf1ish")
      require(tenX != src && !src.startsWith(tenX), s"dst $tenX would clobber src $src")
      lssTakedownRehearsal(spark, src, tenX)
      spark.stop()
      return
    }
    if (args.headOption.contains("bandwalk")) {
      val spark = GraftSession.getOrCreate()
      bandWalkRehearsal(spark, args.lift(1).map(_.toLong).getOrElse(1000000L))
      spark.stop()
      return
    }
    if (args.headOption.contains("round14")) {
      val spark = GraftSession.getOrCreate()
      val src   = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val dst   = args.lift(2).getOrElse("/tmp/graft_docs100")
      val tenX  = args.lift(4).getOrElse("/tmp/graft_sf1ish")
      require(dst != src && !src.startsWith(dst), s"dst $dst would clobber src $src")
      require(tenX != src && !src.startsWith(tenX), s"dst $tenX would clobber src $src")
      // and not each other: same path would overwrite the 100x corpus
      // with the 10x build and silently mislabel every "100x" row
      require(dst != tenX, s"dst $dst and tenX dst must differ")
      round14Rehearsal(spark, src, dst, args.lift(3).map(_.toInt).getOrElse(100), tenX)
      spark.stop()
      return
    }
    if (args.headOption.contains("round13")) {
      val spark = GraftSession.getOrCreate()
      val src   = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val dst   = args.lift(2).getOrElse("/tmp/graft_docs100")
      val tenX  = args.lift(4).getOrElse("/tmp/graft_sf1ish")
      require(dst != src && !src.startsWith(dst), s"dst $dst would clobber src $src")
      require(tenX != src && !src.startsWith(tenX), s"dst $tenX would clobber src $src")
      round13Rehearsal(spark, src, dst, args.lift(3).map(_.toInt).getOrElse(100), tenX)
      spark.stop()
      return
    }
    if (args.headOption.contains("lifecycle100")) {
      val spark = GraftSession.getOrCreate()
      val src   = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val dst   = args.lift(2).getOrElse("/tmp/graft_docs100")
      val tenX  = args.lift(4).getOrElse("/tmp/graft_sf1ish")
      require(dst != src && !src.startsWith(dst), s"dst $dst would clobber src $src")
      require(tenX != src && !src.startsWith(tenX), s"dst $tenX would clobber src $src")
      lifecycleRehearsal(spark, src, dst, args.lift(3).map(_.toInt).getOrElse(100), tenX)
      spark.stop()
      return
    }
    if (args.headOption.contains("wave100")) {
      val spark = GraftSession.getOrCreate()
      val src   = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val dst   = args.lift(2).getOrElse("/tmp/graft_docs100")
      val tenX  = args.lift(4).getOrElse("/tmp/graft_sf1ish")
      require(dst != src && !src.startsWith(dst), s"dst $dst would clobber src $src")
      require(tenX != src && !src.startsWith(tenX), s"dst $tenX would clobber src $src")
      wave100Rehearsal(spark, src, dst, args.lift(3).map(_.toInt).getOrElse(100), tenX)
      spark.stop()
      return
    }
    if (args.headOption.contains("stream10")) {
      val spark = GraftSession.getOrCreate()
      streamRehearsal(
        spark,
        args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).getOrElse("/tmp/graft_stream_docs"),
        args.lift(3).map(_.toInt).getOrElse(10)
      )
      spark.stop()
      return
    }
    if (args.headOption.contains("novelty10")) {
      val spark = GraftSession.getOrCreate()
      noveltyStreamRehearsal(
        spark,
        args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).getOrElse("/tmp/graft_stream_docs"),
        args.lift(3).map(_.toInt).getOrElse(10)
      )
      spark.stop()
      return
    }
    if (args.headOption.contains("knntakedown")) {
      val spark = GraftSession.getOrCreate()
      val src   = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val dst   = args.lift(2).getOrElse("/tmp/graft_vec10_bitext") // shares the bitext 10x vec corpus
      require(dst != src && !src.startsWith(dst), s"dst $dst would clobber src $src")
      knnTakedownRehearsal(spark, src, dst)
      spark.stop()
      return
    }
    if (args.headOption.contains("bitextyield")) {
      val spark = GraftSession.getOrCreate()
      val src   = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val dst   = args.lift(2).getOrElse("/tmp/graft_vec10_yield") // own dir: the plant appends rows
      require(dst != src && !src.startsWith(dst), s"dst $dst would clobber src $src")
      bitextYieldRehearsal(spark, src, dst)
      spark.stop()
      return
    }
    if (args.headOption.contains("bitext")) {
      val spark = GraftSession.getOrCreate()
      val src   = args.lift(1).getOrElse("/root/testdata/sf0.1")
      // dedicated dst: ensureReplicatedVecs trusts an existing _built
      // marker regardless of reps, so sharing a dir with a different-reps
      // rehearsal would silently mislabel the corpus size
      val dst = args.lift(2).getOrElse("/tmp/graft_vec10_bitext")
      require(dst != src && !src.startsWith(dst), s"dst $dst would clobber src $src")
      bitextRehearsal(spark, src, dst)
      spark.stop()
      return
    }
    if (args.headOption.contains("knn100")) {
      val spark = GraftSession.getOrCreate()
      knn100Rehearsal(
        spark,
        args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).getOrElse("/tmp/graft_knn100"),
        args.lift(3).map(_.toInt).getOrElse(100)
      )
      spark.stop()
      return
    }
    if (args.headOption.contains("knn10")) {
      val spark = GraftSession.getOrCreate()
      val src   = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val dst   = args.lift(2).getOrElse("/tmp/graft_sf1ish")
      require(dst != src && !src.startsWith(dst), s"dst $dst would clobber src $src")
      build(spark, src, dst, 10)
      knnRehearsal(spark, dst)
      spark.stop()
      return
    }
    if (args.headOption.contains("index10")) {
      // arg order matches every other two-dir subcommand: [srcSfDir] [dstDir]
      val spark = GraftSession.getOrCreate()
      val src   = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val dst   = args.lift(2).getOrElse("/tmp/graft_sf1ish")
      // build() wipes a markerless dst — a swapped invocation must fail
      // loudly, never delete the source corpus
      require(dst != src && !src.startsWith(dst), s"dst $dst would clobber src $src")
      build(spark, src, dst, 10)
      indexRehearsal(spark, dst)
      spark.stop()
      return
    }
    if (args.headOption.contains("text100")) {
      val spark = GraftSession.getOrCreate()
      textRehearsal(
        spark,
        args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).getOrElse("/tmp/graft_dedup100"),
        args.lift(3).map(_.toInt).getOrElse(100)
      )
      spark.stop()
      return
    }
    if (args.headOption.contains("spans100")) {
      val spark = GraftSession.getOrCreate()
      spansRehearsal(
        spark,
        args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).getOrElse("/tmp/graft_dedup100"),
        args.lift(3).map(_.toInt).getOrElse(100)
      )
      spark.stop()
      return
    }
    if (args.headOption.contains("tpchnb")) {
      val spark = GraftSession.getOrCreate()
      val src   = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val dst   = args.lift(2).getOrElse("/tmp/graft_sf1ish")
      require(dst != src && !src.startsWith(dst), s"dst $dst would clobber src $src")
      tpchNoBroadcastRehearsal(spark, src, dst)
      spark.stop()
      return
    }
    if (args.headOption.contains("pressure")) {
      val spark = GraftSession.getOrCreate()
      pressureRehearsal(spark, args.lift(1).getOrElse("/tmp/graft_sf1ish"))
      spark.stop()
      return
    }
    if (args.headOption.contains("dedup100")) {
      val spark = GraftSession.getOrCreate()
      dedupRehearsal(
        spark,
        args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).getOrElse("/tmp/graft_dedup100"),
        args.lift(3).map(_.toInt).getOrElse(100)
      )
      spark.stop()
      return
    }
    if (args.headOption.contains("skew")) {
      val spark = GraftSession.getOrCreate()
      skewRehearsal(
        spark,
        args.lift(1).getOrElse("/tmp/graft_sf1ish"),
        args.lift(2).getOrElse("/tmp/graft_skew")
      )
      spark.stop()
      return
    }
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
      "a3_asof_tolerance", "q22_salted_join_count", "n5_incremental_dedup",
      "q24_shipping_priority", "q25_local_supplier_volume", "g1_global_ids",
      "p2_sequence_pack", "d8_decontaminate", "d11_vocab_topk",
      "t1_keyword_search", "x5_approx_distinct_rollup", "s7_ann_with_metadata",
      "d14_repetition_stats", "d15_top_salient_term", "n7_shared_spans",
      "d16_span_share", "f1_fuzzy_token_pairs",
      "w3_funnel_stages", "w4_hopping_counts", "s8_ann_quantized",
      "q28_above_nation_avg", "q29_discount_revenue", "a4_asof_forward",
      "s9_ann_ivf_quantized",
      // round 6: cluster materialization + the new analytics/curation ops
      "n6_dup_clusters", "n8_redact_shared_spans", "n9_cluster_keep",
      "u1_retention_cohorts", "p4_pack_spans", "t2_tfidf_rank", "s10_norm_stats",
      "t3_phrase_search", "p5_shuffle_order", "q30_value_band_join",
      "w7_rolling_active_users", "w8_event_transitions", "d17_size_histogram",
      "d18_source_lang_mix", "dq2_profile_documents", "dq3_profile_events_approx",
      "c2_stage_counts", "v1_bpe_merges", "v2_bpe_token_count",
      "d19_dedup_rate_by_source", "u2_new_vs_returning", "a5_nearest_join",
      "w9_gap_histogram",
      // round 7: segments, bucketed as-of, incremental clusters, anomalies, BM25
      "n11_max_shared_segments", "a6_asof_bucketed", "n12_incremental_clusters",
      "w10_hourly_anomalies", "t4_bm25_rank",
      // round 8: indexed/incremental retrieval, gates, mixture machinery
      "t5_hybrid_rrf", "t6_bm25_indexed", "t7_bm25_incremental",
      "v4_bpe_merges_incremental", "d20_decontaminate_bloom",
      "d21_lm_quality_keep", "d22_decontaminate_semantic",
      "d23_split_by_cluster", "d24_mixture_epochs", "d25_contamination_gate",
      "s11_ann_ivf_filtered", "s12_ann_ivf_incremental", "m2_media_demux",
      "dq4_modality_coverage", "n13_frequent_ngrams", "v3_bigram_lm_score",
      // round 9: kNN-join family (s13's quadratic rung lives in `knn10`,
      // not here), BPE encode, curriculum order
      "s14_knn_join_ivf", "s15_mutual_knn_pairs", "v5_bpe_encode",
      "p6_curriculum_order",
      // round 10: semantic clusters, planted-positive ANN twins, MP4 frames
      "s16_mutual_knn_clusters", "s2p_ann_lsh_planted",
      "s11p_ann_ivf_filtered_planted", "m4_mp4_frames",
      // round 10 extensions: TPC-H decorrelation family, novelty/affinity,
      // trigram substring search, vocab growth, novelty gate
      "q31_customer_order_distribution", "q32_small_qty_revenue",
      "q33_large_orders", "q34_waiting_suppliers", "q35_excess_shipments",
      "q36_late_shipment_priority", "q37_dormant_rich_customers",
      "q38_priority_late_orders", "q39_market_share",
      "n15_novelty_scores", "d26_source_affinity", "d27_vocab_growth",
      "d28_novelty_gate", "t8_substring_search",
      // round 11: the fourth-wave TPC-H close (q40–q44), the partsupp
      // canon (q45–q49), pruned/indexed retrieval rungs, the PQ ladder,
      // the planted-twin matrix, and the dup-graph PageRank
      "q40_returned_item_revenue", "q41_supplier_diversity",
      "q42_trade_volume", "q43_disjunctive_revenue", "q44_promo_revenue",
      "q45_min_cost_supplier", "q46_important_stock", "q47_top_supplier",
      "q48_product_profit", "q49_excess_availability",
      "t9_bm25_pruned", "t10_substring_incremental", "t11_ql_rank",
      "s17_ann_pq", "s17p_ann_pq_planted", "s18_ann_ivf_pq",
      "s4p_ann_ivf_planted", "s6p_ann_ivf_partitioned_planted",
      "s9p_ann_ivf_quantized_planted", "s12p_ann_ivf_incremental_planted",
      "s14p_knn_join_ivf_planted", "s18p_ann_ivf_pq_planted",
      "s19_ann_ivf_pq_filtered", "s19p_ann_ivf_pq_filtered_planted",
      "g2_dup_pagerank", "d30_token_budget_mixture", "p7_length_bucketed_batches",
      "t12_proximity_rank", "m5_patch_grid",
      // round 11 second wave: audio pair, retrieval surfaces, repetition
      // trim, RFM, block shuffle, bloom-prefiltered join, image histograms
      "m6_audio_frame_energy", "m7_audio_activity_segments",
      "m8_image_histogram", "t13_kwic_snippet", "t14_term_cooccurrence",
      "t15_phrase_indexed", "d31_trim_repeated_ngrams", "u3_rfm_segments",
      "p8_block_shuffle_order", "q50_bloom_prefilter_join",
      // round 11 third wave
      "dq5_drift_profile", "n16_containment_pairs", "g3_label_propagation",
      "p9_source_interleave", "c3_token_yield", "d32_substring_decontaminate",
      "d33_drop_reasons", "q51_supplier_busy_days"
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
