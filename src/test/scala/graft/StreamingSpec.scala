package graft

import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streaming windowed counts == batch windowed counts") {
    // file stream sources watch a directory: stage the single-file table
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet")
    )
    val q = EventStream.windowedCountsStream(spark, dir.toString, "stream_w1")
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark
      .table("stream_w1")
      .orderBy("ws", "event_type")
      .collect()
      .map(_.toSeq)
      .toSeq
    val batch = EventStream
      .windowedCountsBatch(spark, sf0001)
      .collect()
      .map(_.toSeq)
      .toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("append mode: windows emit once on watermark pass; late events drop") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir     = java.nio.file.Files.createTempDirectory("graft_late")
    val staging = java.nio.file.Files.createTempDirectory("graft_late_stage")
    val events  = graft.sources.Tables.events(spark, sf0001)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$staging/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"$name.parquet")
      )
    }
    val mid = "2024-01-16 00:00:00"
    stage(events.where(col("ts") < mid), "b1")
    val q = graft.streaming.EventStream.windowedCountsAppendStream(spark, dir.toString, "late_sink")
    try {
      q.processAllAvailable() // watermark ≈ max(day15) − 1h
      // batch 2: the rest of the month PLUS one event 13 days late (day 2) —
      // far behind the watermark, so it must be dropped from its window
      val late = Seq((999999L, java.time.LocalDateTime.parse("2024-01-02T12:00:00"), 1L, "error", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
      stage(events.where(col("ts") >= mid).unionByName(late), "b2")
      q.processAllAvailable()
    } finally q.stop()

    val sink = spark.table("late_sink")
    // every emitted (window, type) appears exactly once (append = emit-once)
    assert(sink.groupBy("ws", "event_type").count().where(col("count") > 1).count() == 0)
    // emitted counts equal the batch result WITHOUT the late event: its
    // window (day 2) had already been finalized when the late row arrived
    val emitted = sink.collect().map(r => (r.getAs[java.time.LocalDateTime]("ws"), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.streaming.EventStream
      .windowedCountsBatch(spark, sf0001)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("ws"), r.getString(1)) -> r.getLong(2))
      .toMap
    emitted.foreach { case (k, v) => assert(batch(k) == v, s"window $k: emitted $v vs batch ${batch(k)}") }
    // the day-2 error window must have emitted and must NOT include the late row
    val day2 = (java.time.LocalDateTime.parse("2024-01-02T00:00:00"), "error")
    assert(emitted.contains(day2) && emitted(day2) == batch(day2))
  }

  test("streaming dedup suppresses cross-batch replays within the watermark") {
    import org.apache.spark.sql.functions._
    val dir     = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    val staging = java.nio.file.Files.createTempDirectory("graft_dedup_stage")
    val events  = graft.sources.Tables.events(spark, sf0001)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$staging/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(staging.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"$name.parquet")
      )
    }
    // batch 1: the last day of the month; batch 2: an at-least-once delivery
    // REPLAY of the same rows (same event_ids, same timestamps — within the
    // watermark horizon, so the dedup state must still remember them)
    val day = "2024-01-30 00:00:00"
    stage(events.where(col("ts") >= day), "b1")
    val q = EventStream.dedupedEventStream(spark, dir.toString, "dedup_sink")
    try {
      q.processAllAvailable()
      stage(events.where(col("ts") >= day), "b2_replay")
      q.processAllAvailable()
    } finally q.stop()
    val sink     = spark.table("dedup_sink")
    val expected = events.where(col("ts") >= day).count()
    assert(expected > 0)
    assert(sink.count() == expected, "replayed rows must be suppressed, originals kept")
    assert(sink.groupBy("event_id").count().where(col("count") > 1).count() == 0)
  }

  test("stream-stream time-bounded join == batch join on the same data") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_ssjoin")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet")
    )
    val q = EventStream.purchaseClickJoinStream(spark, dir.toString, "ssjoin_sink")
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark
      .table("ssjoin_sink")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val events = graft.sources.Tables.events(spark, sf0001)
    val p = events.where(col("event_type") === "purchase").select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val c = events.where(col("event_type") === "click").select(col("event_id").as("click_id"), col("user_id").as("cuser"), col("ts").as("cts"))
    val batch = p
      .join(c, col("user_id") === col("cuser") && col("cts") <= col("pts") && col("cts") >= col("pts") - expr("interval 1 hour"))
      .select("purchase_id", "click_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("foreachBatch parquet sink lands a readable folder-of-parquet table") {
    import org.apache.spark.sql.functions._
    val in  = java.nio.file.Files.createTempDirectory("graft_sink_in")
    val out = java.nio.file.Files.createTempDirectory("graft_sink_out")
    val ckp = java.nio.file.Files.createTempDirectory("graft_sink_ckp")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      in.resolve("part-0.parquet")
    )
    val q = graft.streaming.EventStream
      .windowedCountsToParquet(spark, in.toString, out.toString, ckp.toString)
    try q.processAllAvailable()
    finally q.stop()
    // batch_id is a partition dir (idempotent replay target) — drop it
    val landed = spark.read.parquet(out.toString).select("ws", "event_type", "cnt")
    val batch = graft.streaming.EventStream.windowedCountsBatch(spark, sf0001)
    // append mode: landed windows are the watermark-finalized subset, and
    // every landed row must agree exactly with the batch computation
    assert(landed.count() > 0)
    assert(landed.join(batch, Seq("ws", "event_type")).where(landed("cnt") =!= batch("cnt")).count() == 0)
    assert(landed.exceptAll(batch).count() == 0)
  }

  test("dedup index scheme guard: first batch stamps the tag; a mismatched index fails fast; equal tag is idempotent") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_scheme")
    val tag  = graft.operators.Dedup.minhashSchemeTag(spark)
    // first use stamps
    graft.streaming.DedupStream.assertOrStampScheme(spark, s"$base/idx", tag)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/idx/_scheme")))
    // equal tag: no-op (replay path)
    graft.streaming.DedupStream.assertOrStampScheme(spark, s"$base/idx", tag)
    // a batch against a FOREIGN-scheme index must refuse, not corrupt
    // (rewrite through the Hadoop FS so its .crc sidecar stays coherent):
    val mp  = new org.apache.hadoop.fs.Path(s"$base/idx/_scheme")
    val mfs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = mfs.create(mp, true)
    out.write("mh-v2#h64#b16#n3".getBytes("UTF-8")); out.close()
    val docs = graft.sources.Tables.documents(spark, sf0001).where(col("doc_id") < 10)
    val e = intercept[IllegalStateException] {
      graft.streaming.DedupStream.processBatch(docs, s"$base/idx", s"$base/pairs", 1L)
    }
    assert(e.getMessage.contains("mh-v2") && e.getMessage.contains(tag))
    // and nothing was appended to the foreign index
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/idx/docsets/batch_id=1")))
  }

  test("perceptual-hash catalog scheme guard: a ledger-scheme bump refuses an old streamed catalog") {
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    val base  = java.nio.file.Files.createTempDirectory("graft_dhscheme")
    val media = Multimodal.syntheticMediaWhere(spark, sf0001, col("doc_id") % 4 === 0).toDF()
      .where(col("media_id") < 10)
    // first batch stamps the image-catalog tag
    graft.streaming.DhashStream.processBatch(
      media, s"$base/cat", 0L, graft.streaming.DhashStream.dhashSchemeTag)(m =>
      Multimodal.imageDhash(m).toDF())
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/cat/_scheme")))
    // replay (same tag): idempotent
    graft.streaming.DhashStream.processBatch(
      media, s"$base/cat", 0L, graft.streaming.DhashStream.dhashSchemeTag)(m =>
      Multimodal.imageDhash(m).toDF())
    // a future scheme bump (simulated foreign tag) must fail fast, not
    // mix old- and new-scheme segments in one catalog
    val e = intercept[IllegalStateException] {
      graft.streaming.DhashStream.processBatch(
        media, s"$base/cat", 1L, "dhash-ledger-v999")(m => Multimodal.imageDhash(m).toDF())
    }
    assert(e.getMessage.contains("dhash-ledger-v999") &&
      e.getMessage.contains(graft.streaming.DhashStream.dhashSchemeTag))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/cat/batch_id=1")))
    // the audio tag is a distinct scheme namespace: an audio stream can
    // never silently append to an image catalog
    val e2 = intercept[IllegalStateException] {
      graft.streaming.DhashStream.processBatch(
        media, s"$base/cat", 1L, graft.streaming.DhashStream.audioHashSchemeTag)(m =>
        Multimodal.audioEnvelopeHash(m).toDF())
    }
    assert(e2.getMessage.contains("audio-hash-ledger"))
  }

  test("streaming incremental dedup == batch n5 pairs; batch-1 artifacts never rewritten") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_sdedup")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stagingDir = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stagingDir/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(stagingDir.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        src.resolve(s"$name.parquet")
      )
    }
    val docs = graft.sources.Tables.documents(spark, sf0001)
    stage(docs.where(col("doc_id") < 250), "b1") // n5's corpus half (k = 250 at sf0.001)
    val q = graft.streaming.DedupStream.incrementalPairsStream(
      spark, src.toString, s"$base/idx", s"$base/pairs", s"$base/ckpt"
    )
    val b0Docsets = java.nio.file.Paths.get(s"$base/idx/docsets/batch_id=0")
    val mtime0 =
      try {
        q.processAllAvailable()
        java.nio.file.Files.list(b0Docsets)
          .filter(_.toString.endsWith(".parquet")).findFirst.get
          .toFile.lastModified()
      } finally {
        stage(docs.where(col("doc_id") >= 250), "b2") // the "new day" batch
        q.processAllAvailable()
        q.stop()
      }
    // batch 1's processing found exactly what batch-mode n5 reports for the
    // same split: cross pairs against the stored index + batch-internal ones
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "inter", "un").collect().map(_.toSeq).toSet
    val streamed = rows(spark.read.parquet(s"$base/pairs").where(col("batch_id") === 1))
    assert(streamed == rows(graft.operators.Dedup.incrementalNearDupPairs(spark, sf0001)))
    // union over all micro-batches = the full exact pair set, no dup reports
    val all = spark.read.parquet(s"$base/pairs").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(all.length == all.distinct.length)
    assert(all.toSet == graft.operators.Dedup.ngramJaccardPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // batch 1 was never re-shingled/rewritten: its stored artifacts are
    // byte-identical (same file, same mtime) after batch 2 ran
    val mtimeAfter = java.nio.file.Files.list(b0Docsets)
      .filter(_.toString.endsWith(".parquet")).findFirst.get
      .toFile.lastModified()
    assert(mtimeAfter == mtime0, "batch-0 index artifacts were rewritten by batch 1")
  }

  test("dedup index compaction: stream == batch across the boundary; segment fan collapses to one; replay-safe cutoff") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_sdedup_cmp")
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val cuts = Seq(0L, 167L, 333L, Long.MaxValue)
    def slice(i: Int) = docs.where(col("doc_id") >= cuts(i) && col("doc_id") < cuts(i + 1))
    // drive two maintained indexes batch-by-batch through processBatch —
    // one compacted after every batch, one never — and require identical
    // pair reports from both, plus the exact-Jaccard full set at the end
    for (i <- 0 until 3) {
      graft.streaming.DedupStream.processBatch(slice(i), s"$base/idxC", s"$base/pairsC", i.toLong)
      graft.streaming.DedupStream.processBatch(slice(i), s"$base/idxU", s"$base/pairsU", i.toLong)
      graft.streaming.DedupStream.compactIndex(spark, s"$base/idxC")
    }
    def pairSet(dir: String) = spark.read.parquet(dir)
      .select("doc_a", "doc_b", "inter", "un").collect().map(_.toSeq).toSet
    assert(pairSet(s"$base/pairsC") == pairSet(s"$base/pairsU"),
      "compacted-index stream diverged from the uncompacted twin")
    assert(pairSet(s"$base/pairsC").map(r => (r(0), r(1))) ==
      graft.operators.Dedup.ngramJaccardPairs(spark, sf0001)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // the segment fan is bounded: exactly ONE live segment remains (the
    // newest — never folded, because it is the one a checkpoint replay
    // rewrites) and the committed generation holds everything older
    def fanIds(t: String) = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$base/idxC/$t"))
        .iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("batch_id=")).toSeq
    }
    assert(fanIds("docsets") == Seq("batch_id=2"), s"fan not compacted: ${fanIds("docsets")}")
    assert(fanIds("buckets") == Seq("batch_id=2"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/idxC/gen=2/docsets.parquet/_SUCCESS")))
    // the logical table is unchanged by compaction: same rows both sides
    def tbl(idx: String, t: String) = graft.streaming.DedupStream.indexTable(spark, s"$base/$idx", t)
      .collect().map(_.toSeq).toSet
    assert(tbl("idxC", "docsets") == tbl("idxU", "docsets"))
    assert(tbl("idxC", "buckets") == tbl("idxU", "buckets"))
    // a replay of the NEWEST batch after compaction is still idempotent
    // (its segment was deliberately left out of the fold): same pair set
    graft.streaming.DedupStream.processBatch(slice(2), s"$base/idxC", s"$base/pairsC", 2L)
    assert(pairSet(s"$base/pairsC") == pairSet(s"$base/pairsU"))
    assert(tbl("idxC", "docsets") == tbl("idxU", "docsets"))
  }

  test("streaming vector-index maintenance == batch s12 delta; sealed segments never rewritten; idempotent replay") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft_svec")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stagingDir = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stagingDir/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(stagingDir.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        src.resolve(s"$name.parquet")
      )
    }
    // s12's maintenance split at sf0.001: base = vec_id < 250, batch = rest
    val split      = 250L
    val vecs       = graft.sources.Tables.embeddings(spark, sf0001)
    val baseLayout = Similarity.ivfBaseLayoutCache(spark, sf0001, 16, split)
    val deltaDir   = s"$base/delta"
    // the batch half arrives as TWO staged micro-batches at an arbitrary cut
    stage(vecs.where(col("vec_id") >= split && col("vec_id") < 375), "b1")
    val q = graft.streaming.VectorIndexStream.deltaSegmentsStream(
      spark, src.toString, baseLayout, deltaDir, s"$base/ckpt"
    )
    val b0Seg = java.nio.file.Paths.get(s"$deltaDir/batch_id=0")
    def firstParquetMtime(p: java.nio.file.Path): Long = {
      val it = java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet")).findFirst.get
      it.toFile.lastModified()
    }
    val mtime0 =
      try {
        q.processAllAvailable()
        firstParquetMtime(b0Seg)
      } finally {
        stage(vecs.where(col("vec_id") >= 375), "b2")
        q.processAllAvailable()
        q.stop()
      }
    // streamed segments carry exactly the assignments the frozen centroids
    // dictate — the batch-mode s12 delta over the same half, bit-equal on
    // (vec_id, cl)
    def asg(df: org.apache.spark.sql.DataFrame): Set[(Long, Int)] =
      df.select(col("vec_id"), col("cl").cast("int")).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val streamed   = asg(spark.read.parquet(deltaDir))
    val batchDelta = asg(
      spark.read.parquet(s"${Similarity.ivfDeltaLayoutCache(spark, sf0001, 16, split)}/vectors.parquet")
    )
    assert(streamed == batchDelta && streamed.nonEmpty)
    // batch 0's segment is sealed: byte-identical (same file, same mtime)
    // after batch 1 ran
    assert(firstParquetMtime(b0Seg) == mtime0, "batch-0 delta segment was rewritten by batch 1")
    // checkpoint-replay idempotence: re-processing batch 0's input under the
    // same batch_id rewrites the same directory — no duplicated vectors
    graft.streaming.VectorIndexStream.processBatch(
      vecs.where(col("vec_id") >= split && col("vec_id") < 375), baseLayout, deltaDir, 0L
    )
    assert(asg(spark.read.parquet(deltaDir)) == streamed)
    // query side: with every cluster probed, base + streamed delta is
    // exhaustive — must equal s1's brute-force ranking exactly
    val qv = vecs.where(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)
    val got = Similarity
      .probeSearchStreamed(spark, baseLayout, deltaDir, qv, queryId = 0L, k = 10, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val brute = Similarity.annBruteForce(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == brute)
  }

  test("streaming media catalog == batch m2 recompute; sealed segments never rewritten; idempotent replay") {
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    val base = java.nio.file.Files.createTempDirectory("graft_smedia")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stagingDir = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stagingDir/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(stagingDir.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        src.resolve(s"$name.parquet")
      )
    }
    val media  = Multimodal.syntheticMedia(spark, sf0001).toDF()
    val catDir = s"$base/cat"
    stage(media.where(col("media_id") < 250), "b1")
    val q = graft.streaming.MediaCatalogStream.catalogStream(spark, src.toString, catDir, s"$base/ckpt")
    val b0Seg = java.nio.file.Paths.get(s"$catDir/batch_id=0")
    def firstParquetMtime(p: java.nio.file.Path): Long =
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet")).findFirst.get.toFile.lastModified()
    val mtime0 =
      try {
        q.processAllAvailable()
        firstParquetMtime(b0Seg)
      } finally {
        stage(media.where(col("media_id") >= 250), "b2")
        q.processAllAvailable()
        q.stop()
      }
    // union over segments == the batch m2 recompute, row for row (catalog
    // rows are per-payload and disjoint across segments — maintenance is
    // exact by construction, and the stream must inherit that)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "kind", "ok", "width", "height", "sample_rate", "duration_ms", "n_frames", "n_tracks")
        .collect().map(_.toSeq).toSet
    val streamed = rows(spark.read.parquet(catDir))
    assert(streamed == rows(Multimodal.mediaDemuxQuery(spark, sf0001)) && streamed.nonEmpty)
    // batch 0's segment is sealed: no payload in it was re-parsed by batch 1
    assert(firstParquetMtime(b0Seg) == mtime0, "batch-0 catalog segment was rewritten by batch 1")
    // checkpoint-replay idempotence: re-processing batch 0's input under the
    // same batch_id rewrites the same directory — no duplicated rows
    graft.streaming.MediaCatalogStream.processBatch(media.where(col("media_id") < 250), catDir, 0L)
    assert(rows(spark.read.parquet(catDir)) == streamed)
  }

  test("hasCommittedSegments: absent/empty/_temporary-only dirs degrade; flat and segmented committed files count") {
    import graft.streaming.StreamSource.hasCommittedSegments
    val base = java.nio.file.Files.createTempDirectory("graft_segguard")
    assert(!hasCommittedSegments(spark, s"$base/absent"))
    java.nio.file.Files.createDirectories(base.resolve("empty"))
    assert(!hasCommittedSegments(spark, s"$base/empty"))
    // crash mid-first-write: only _temporary, at top level or inside a segment
    java.nio.file.Files.createDirectories(base.resolve("crash1/_temporary"))
    assert(!hasCommittedSegments(spark, s"$base/crash1"))
    java.nio.file.Files.createDirectories(base.resolve("crash2/batch_id=0/_temporary"))
    assert(!hasCommittedSegments(spark, s"$base/crash2"))
    // committed data counts in both manifest shapes: flat parquet dir...
    import spark.implicits._
    Seq((1L, 2L)).toDF("a", "b").coalesce(1).write.mode("overwrite").parquet(s"$base/flat")
    assert(hasCommittedSegments(spark, s"$base/flat"))
    // ...and a batch_id= segment dir
    Seq((1L, 2L)).toDF("a", "b").coalesce(1).write.mode("overwrite").parquet(s"$base/seg/batch_id=0")
    assert(hasCommittedSegments(spark, s"$base/seg"))
    // the three consumers degrade through it: takedown ledger, dHash
    // catalog, manifest probe — all on the crash-shaped dir, none throw
    assert(graft.streaming.TakedownStream.ledger(spark, s"$base/crash2").collect().isEmpty)
    assert(graft.streaming.DhashStream.ledger(spark, s"$base/crash2").collect().isEmpty)
    assert(graft.sources.BloomManifest.candidateFiles(spark, s"$base/crash2", 1L).isEmpty)
  }

  test("streaming dHash catalog == batch m9; pairs over the streamed ledger == batch n17; sealed; idempotent") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Multimodal}
    val base = java.nio.file.Files.createTempDirectory("graft_sdhash")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stagingDir = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stagingDir/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(stagingDir.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        src.resolve(s"$name.parquet")
      )
    }
    // the PGM quarter only — the decodable rasters m9 hashes
    val media  = Multimodal.syntheticMediaWhere(spark, sf0001, col("doc_id") % 4 === 0).toDF()
    val catDir = s"$base/cat"
    // pre-first-batch: an absent catalog answers "no pairs", never throws
    assert(graft.streaming.DhashStream.dhashPairsStreamed(spark, catDir).collect().isEmpty)
    stage(media.where(col("media_id") < 250), "b1")
    val q = graft.streaming.DhashStream.dhashStream(spark, src.toString, catDir, s"$base/ckpt")
    val b0Seg = java.nio.file.Paths.get(s"$catDir/batch_id=0")
    def firstParquetMtime(p: java.nio.file.Path): Long =
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet")).findFirst.get.toFile.lastModified()
    val mtime0 =
      try {
        q.processAllAvailable()
        firstParquetMtime(b0Seg)
      } finally {
        stage(media.where(col("media_id") >= 250), "b2")
        q.processAllAvailable()
        q.stop()
      }
    // ledger union == batch m9 recompute (hash rows per-payload, disjoint
    // across segments)
    def hrows(df: org.apache.spark.sql.DataFrame) =
      df.select("media_id", "hash_hi", "hash_lo").collect().map(_.toSeq).toSet
    val streamed = hrows(graft.streaming.DhashStream.ledger(spark, catDir))
    assert(streamed == hrows(Multimodal.imageDhashQuery(spark, sf0001)) && streamed.nonEmpty)
    // pair query over the streamed ledger == batch n17, row for row
    def prows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(
      prows(graft.streaming.DhashStream.dhashPairsStreamed(spark, catDir)) ==
        prows(Dedup.imageDhashPairs(spark, sf0001))
    )
    // batch 0's segment is sealed; replay rewrites, never duplicates
    assert(firstParquetMtime(b0Seg) == mtime0, "batch-0 dHash segment was rewritten by batch 1")
    graft.streaming.DhashStream.processBatch(
      media.where(col("media_id") < 250), catDir, 0L, graft.streaming.DhashStream.dhashSchemeTag)(m =>
      Multimodal.imageDhash(m).toDF())
    assert(hrows(graft.streaming.DhashStream.ledger(spark, catDir)) == streamed)
  }

  test("streaming audio-hash catalog == batch m10; pairs over the streamed ledger == batch n20; sealed; idempotent") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Multimodal}
    val base = java.nio.file.Files.createTempDirectory("graft_sahash")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stagingDir = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stagingDir/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(stagingDir.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        src.resolve(s"$name.parquet")
      )
    }
    // the WAV quarter only — the decodable recordings m10 hashes
    val media  = Multimodal.syntheticMediaWhere(spark, sf0001, col("doc_id") % 4 === 1).toDF()
    val catDir = s"$base/cat"
    assert(graft.streaming.DhashStream.dhashPairsStreamed(spark, catDir).collect().isEmpty)
    stage(media.where(col("media_id") < 250), "b1")
    val q = graft.streaming.DhashStream.audioHashStream(spark, src.toString, catDir, s"$base/ckpt")
    val b0Seg = java.nio.file.Paths.get(s"$catDir/batch_id=0")
    def firstParquetMtime(p: java.nio.file.Path): Long =
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet")).findFirst.get.toFile.lastModified()
    val mtime0 =
      try {
        q.processAllAvailable()
        firstParquetMtime(b0Seg)
      } finally {
        stage(media.where(col("media_id") >= 250), "b2")
        q.processAllAvailable()
        q.stop()
      }
    def hrows(df: org.apache.spark.sql.DataFrame) =
      df.select("media_id", "hash_hi", "hash_lo").collect().map(_.toSeq).toSet
    val streamed = hrows(graft.streaming.DhashStream.ledger(spark, catDir))
    assert(streamed == hrows(Multimodal.audioEnvelopeHashQuery(spark, sf0001)) && streamed.nonEmpty)
    // the SAME pair query serves the audio catalog (shared ledger shape)
    def prows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(
      prows(graft.streaming.DhashStream.dhashPairsStreamed(spark, catDir)) ==
        prows(Dedup.audioHashPairs(spark, sf0001))
    )
    assert(firstParquetMtime(b0Seg) == mtime0, "batch-0 audio segment was rewritten by batch 1")
    graft.streaming.DhashStream.processBatch(
      media.where(col("media_id") < 250), catDir, 0L, graft.streaming.DhashStream.audioHashSchemeTag)(m =>
      Multimodal.audioEnvelopeHash(m).toDF())
    assert(hrows(graft.streaming.DhashStream.ledger(spark, catDir)) == streamed)
  }

  test("streaming video-hash catalog == batch simhash ledger; pairs over it == batch n24; sealed; idempotent") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Multimodal}
    val base = java.nio.file.Files.createTempDirectory("graft_svhash")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stagingDir = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stagingDir/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(stagingDir.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        src.resolve(s"$name.parquet")
      )
    }
    // the MP4 quarter only — the containers m11 demuxes
    val media  = Multimodal.syntheticMediaWhere(spark, sf0001, col("doc_id") % 4 === 3).toDF()
    val catDir = s"$base/cat"
    assert(graft.streaming.DhashStream.dhashPairsStreamed(spark, catDir).collect().isEmpty)
    stage(media.where(col("media_id") < 250), "b1")
    val q = graft.streaming.DhashStream.videoHashStream(spark, src.toString, catDir, s"$base/ckpt")
    val b0Seg = java.nio.file.Paths.get(s"$catDir/batch_id=0")
    def firstParquetMtime(p: java.nio.file.Path): Long =
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet")).findFirst.get.toFile.lastModified()
    val mtime0 =
      try {
        q.processAllAvailable()
        firstParquetMtime(b0Seg)
      } finally {
        stage(media.where(col("media_id") >= 250), "b2")
        q.processAllAvailable()
        q.stop()
      }
    def hrows(df: org.apache.spark.sql.DataFrame) =
      df.select("media_id", "hash_hi", "hash_lo").collect().map(_.toSeq).toSet
    val streamed = hrows(graft.streaming.DhashStream.ledger(spark, catDir))
    assert(streamed == hrows(Multimodal.videoHashLedger(spark, sf0001)) && streamed.nonEmpty)
    // the SAME pair query serves the video catalog (shared ledger shape)
    def prows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(
      prows(graft.streaming.DhashStream.dhashPairsStreamed(spark, catDir)) ==
        prows(Dedup.videoHashPairs(spark, sf0001))
    )
    assert(firstParquetMtime(b0Seg) == mtime0, "batch-0 video segment was rewritten by batch 1")
    graft.streaming.DhashStream.processBatch(
      media.where(col("media_id") < 250), catDir, 0L, graft.streaming.DhashStream.videoHashSchemeTag)(m =>
      Multimodal.videoSimhashOf(Multimodal.videoKeyframeHash(m)))
    assert(hrows(graft.streaming.DhashStream.ledger(spark, catDir)) == streamed)
  }

  test("streaming postings maintenance: bm25 over streamed segments == t4 corpus scan; sealed; idempotent") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val base = java.nio.file.Files.createTempDirectory("graft_spost")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stagingDir = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stagingDir/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(stagingDir.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        src.resolve(s"$name.parquet")
      )
    }
    val docs     = graft.sources.Tables.documents(spark, sf0001)
    val indexDir = s"$base/idx"
    stage(docs.where(col("doc_id") < 250), "b1")
    val q = graft.streaming.PostingsStream.postingsStream(spark, src.toString, indexDir, s"$base/ckpt")
    val b0Seg = java.nio.file.Paths.get(s"$indexDir/postings/batch_id=0")
    def firstParquetMtime(p: java.nio.file.Path): Long =
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet")).findFirst.get.toFile.lastModified()
    val mtime0 =
      try {
        q.processAllAvailable()
        firstParquetMtime(b0Seg)
      } finally {
        stage(docs.where(col("doc_id") >= 250), "b2")
        q.processAllAvailable()
        q.stop()
      }
    // ranking over the streamed index is BIT-EQUAL to t4's corpus scan —
    // the t7 exactness contract carried to N streamed segments
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val streamed = pairs(graft.streaming.PostingsStream.bm25RankStreamed(spark, indexDir))
    assert(streamed == pairs(TextAnalysis.bm25Rank(spark, sf0001)) && streamed.nonEmpty)
    // batch 0's segment is sealed: no document in it was re-tokenized
    assert(firstParquetMtime(b0Seg) == mtime0, "batch-0 postings segment was rewritten by batch 1")
    // checkpoint-replay idempotence: same batch_id rewrites, never doubles
    graft.streaming.PostingsStream.processBatch(docs.where(col("doc_id") < 250), indexDir, 0L)
    assert(pairs(graft.streaming.PostingsStream.bm25RankStreamed(spark, indexDir)) == streamed)
  }

  test("streaming positions maintenance: phrase over streamed segments == t3 corpus scan; sealed; idempotent") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val base = java.nio.file.Files.createTempDirectory("graft_spos")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stagingDir = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stagingDir/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(stagingDir.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        src.resolve(s"$name.parquet")
      )
    }
    val docs     = graft.sources.Tables.documents(spark, sf0001)
    val indexDir = s"$base/idx"
    stage(docs.where(col("doc_id") < 250), "b1")
    val q = graft.streaming.PositionsStream.positionsStream(spark, src.toString, indexDir, s"$base/ckpt")
    val b0Seg = java.nio.file.Paths.get(s"$indexDir/positions/batch_id=0")
    def firstParquetMtime(p: java.nio.file.Path): Long =
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet")).findFirst.get.toFile.lastModified()
    val mtime0 =
      try {
        q.processAllAvailable()
        firstParquetMtime(b0Seg)
      } finally {
        stage(docs.where(col("doc_id") >= 250), "b2")
        q.processAllAvailable()
        q.stop()
      }
    // phrase search over the streamed index == the t3 corpus scan (the
    // disjoint-segment argument: each doc's position rows live once)
    def ids(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.getLong(0)).toSeq
    val streamed = ids(graft.streaming.PositionsStream.phraseSearchStreamed(spark, indexDir))
    assert(streamed == ids(TextAnalysis.phraseSearch(spark, sf0001)) && streamed.nonEmpty)
    // batch 0's segment is sealed: batch 1 never re-indexed it
    assert(firstParquetMtime(b0Seg) == mtime0, "batch-0 positions segment was rewritten by batch 1")
    // checkpoint-replay idempotence: same batch_id rewrites, never doubles
    graft.streaming.PositionsStream.processBatch(docs.where(col("doc_id") < 250), indexDir, 0L)
    assert(ids(graft.streaming.PositionsStream.phraseSearchStreamed(spark, indexDir)) == streamed)
  }

  test("streaming tokenizer counts: retrain from streamed segments == v1 full retrain; sealed; idempotent") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_stok")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stagingDir = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stagingDir/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(stagingDir.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        src.resolve(s"$name.parquet")
      )
    }
    val docs      = graft.sources.Tables.documents(spark, sf0001)
    val countsDir = s"$base/counts"
    stage(docs.where(col("doc_id") < 250), "b1")
    val q = graft.streaming.TokenizerStream.wordCountStream(spark, src.toString, countsDir, s"$base/ckpt")
    val b0Seg = java.nio.file.Paths.get(s"$countsDir/counts/batch_id=0")
    def firstParquetMtime(p: java.nio.file.Path): Long =
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet")).findFirst.get.toFile.lastModified()
    val mtime0 =
      try {
        q.processAllAvailable()
        firstParquetMtime(b0Seg)
      } finally {
        stage(docs.where(col("doc_id") >= 250), "b2")
        q.processAllAvailable()
        q.stop()
      }
    // counts are additive longs, so the retrain over streamed segments is
    // BIT-EQUAL to v1's full retrain on the same corpus — v4's exactness
    // argument carried to N streamed segments
    def table(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val streamed = table(graft.streaming.TokenizerStream.mergesFromStream(spark, countsDir))
    assert(streamed == table(graft.operators.Bpe.bpeMerges(spark, sf0001)) && streamed.nonEmpty)
    // batch 0's segment is sealed: no document in it was re-tokenized
    assert(firstParquetMtime(b0Seg) == mtime0, "batch-0 count segment was rewritten by batch 1")
    // checkpoint-replay idempotence: same batch_id rewrites, never doubles
    graft.streaming.TokenizerStream.processBatch(docs.where(col("doc_id") < 250), countsDir, 0L)
    assert(table(graft.streaming.TokenizerStream.mergesFromStream(spark, countsDir)) == streamed)
    // COMPACTION boundary (re-aggregating fold): batch 0 folds into the
    // generation (summed rows — bit-identical retrain by long-addition
    // associativity), batch 1 stays live, and a third batch lands beside
    // the generation with the retrain still equal to the full one
    assert(graft.streaming.TokenizerStream.compactStreamedCounts(spark, countsDir) == 1L)
    def fanCount = java.nio.file.Files.list(java.nio.file.Paths.get(s"$countsDir/counts"))
      .filter(_.getFileName.toString.startsWith("batch_id=")).count()
    assert(fanCount == 1, s"fan not compacted: $fanCount segments")
    assert(table(graft.streaming.TokenizerStream.mergesFromStream(spark, countsDir)) == streamed)
    graft.streaming.TokenizerStream.processBatch(docs.where(col("doc_id") >= 250), countsDir, 2L)
    assert(table(graft.streaming.TokenizerStream.mergesFromStream(spark, countsDir)) ==
      table(graft.operators.Bpe.trainFromCounts(spark,
        graft.operators.Bpe.wordCounts(docs.unionByName(docs.where(col("doc_id") >= 250))),
        graft.operators.Bpe.resolveMergesKnob(spark, -1)).orderBy("merge_rank")))
  }

  test("streaming cluster maintenance: final snapshot == n6 full recompute; idempotent replay") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_sclus")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stagingDir = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stagingDir/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(stagingDir.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        src.resolve(s"$name.parquet")
      )
    }
    val docs = graft.sources.Tables.documents(spark, sf0001)
    stage(docs.where(col("doc_id") < 250), "b1")
    val q = graft.streaming.ClusterStream.clustersStream(
      spark, src.toString, s"$base/idx", s"$base/pairs", s"$base/clusters", s"$base/ckpt"
    )
    try {
      q.processAllAvailable()
      stage(docs.where(col("doc_id") >= 250), "b2")
      q.processAllAvailable()
    } finally q.stop()
    // snapshot N = components over every pair discovered through batch N;
    // the final snapshot must equal the from-scratch n6 recompute (the
    // n12 ≡ n6 exactness argument, one snapshot per micro-batch)
    def table(df: org.apache.spark.sql.DataFrame) =
      df.select("cluster_id", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = table(spark.read.parquet(s"$base/clusters/batch_id=1"))
    assert(streamed == table(graft.operators.Dedup.dupClusters(spark, sf0001)) && streamed.nonEmpty)
    // checkpoint-replay idempotence: re-processing batch 1 from the
    // persisted prior snapshot + idempotently-rewritten pairs reproduces
    // the same snapshot
    graft.streaming.ClusterStream.processBatch(
      docs.where(col("doc_id") >= 250), s"$base/idx", s"$base/pairs", s"$base/clusters", 1L
    )
    assert(table(spark.read.parquet(s"$base/clusters/batch_id=1")) == streamed)
  }

  test("w4 hopping windows: planted events land in exactly their 2 covering 12h-grid windows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hop").toString
    Seq(
      (1L, 1L, "click", java.sql.Timestamp.valueOf("2024-01-01 00:30:00")),
      (2L, 1L, "click", java.sql.Timestamp.valueOf("2024-01-01 13:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.streaming.EventStream
      .hoppingCountsBatch(spark, dir)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toString, r.getString(1), r.getLong(2)))
      .toSeq
    assert(
      got == Seq(
        ("2023-12-31T12:00", "click", 1L), // covers 00:30 only
        ("2024-01-01T00:00", "click", 2L), // covers both events
        ("2024-01-01T12:00", "click", 1L)  // covers 13:00 only
      )
    )
  }

  test("w4 streaming hopping counts == batch hopping counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hopstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet")
    )
    val q = graft.streaming.EventStream.hoppingCountsStream(spark, dir.toString, "hop_sink")
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark
      .table("hop_sink")
      .collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    val batch = graft.streaming.EventStream
      .hoppingCountsBatch(spark, sf0001)
      .collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("w4 on the real corpus: every event is counted exactly twice (size/slide = 2)") {
    val total  = graft.sources.Tables.events(spark, sf0001).count()
    val summed = graft.streaming.EventStream
      .hoppingCountsBatch(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("cnt"))
      .head().getLong(0)
    assert(summed == 2 * total)
  }

  test("streaming trigram maintenance: substring search over streamed segments == t8; sealed; idempotent") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_strig")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stagingDir = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stagingDir/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(stagingDir.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        src.resolve(s"$name.parquet")
      )
    }
    val docs     = graft.sources.Tables.documents(spark, sf0001)
    val indexDir = s"$base/idx"
    stage(docs.where(col("doc_id") < 250), "b1")
    val q = graft.streaming.TrigramStream.trigramStream(spark, src.toString, indexDir, s"$base/ckpt")
    val b0Seg = java.nio.file.Paths.get(s"$indexDir/trigrams/batch_id=0")
    def firstParquetMtime(p: java.nio.file.Path): Long =
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet")).findFirst.get.toFile.lastModified()
    val mtime0 =
      try {
        q.processAllAvailable()
        firstParquetMtime(b0Seg)
      } finally {
        stage(docs.where(col("doc_id") >= 250), "b2")
        q.processAllAvailable()
        q.stop()
      }
    def ids(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.getLong(0)).toSeq
    val streamed = ids(graft.streaming.TrigramStream.substringSearchStreamed(spark, sf0001, indexDir))
    assert(streamed == ids(graft.operators.TextAnalysis.substringSearch(spark, sf0001)) && streamed.nonEmpty)
    // batch 0's segment is sealed after batch 1 ran
    assert(firstParquetMtime(b0Seg) == mtime0, "batch-0 trigram segment was rewritten")
    // checkpoint-replay idempotence — load-bearing here: a duplicated gram
    // row would inflate ng past the all-grams bar and DROP matches
    graft.streaming.TrigramStream.processBatch(docs.where(col("doc_id") < 250), indexDir, 0L)
    assert(ids(graft.streaming.TrigramStream.substringSearchStreamed(spark, sf0001, indexDir)) == streamed)
    // COMPACTION boundary (pure row-move fold): batch 0 folds into the
    // generation, search answers are unchanged, exactly one live segment
    // remains, and a later batch lands beside the generation still exact
    assert(graft.streaming.TrigramStream.compactStreamedTrigrams(spark, indexDir) == 1L)
    def fanCount = java.nio.file.Files.list(java.nio.file.Paths.get(s"$indexDir/trigrams"))
      .filter(_.getFileName.toString.startsWith("batch_id=")).count()
    assert(fanCount == 1, s"fan not compacted: $fanCount segments")
    assert(ids(graft.streaming.TrigramStream.substringSearchStreamed(spark, sf0001, indexDir)) == streamed)
    // replay of the NEWEST batch after compaction (deliberately unfolded)
    graft.streaming.TrigramStream.processBatch(docs.where(col("doc_id") >= 250), indexDir, 1L)
    assert(ids(graft.streaming.TrigramStream.substringSearchStreamed(spark, sf0001, indexDir)) == streamed)
  }

  test("streaming novelty gate == batch n15; first-seen index sealed; idempotent replay") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_snovel")
    val src  = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stagingDir = base.resolve("stage")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$stagingDir/$name")
      java.nio.file.Files.move(
        java.nio.file.Files.list(stagingDir.resolve(name)).filter(_.toString.endsWith(".parquet")).findFirst.get,
        src.resolve(s"$name.parquet")
      )
    }
    val docs     = graft.sources.Tables.documents(spark, sf0001)
    val indexDir = s"$base/idx"
    val outDir   = s"$base/novelty"
    // doc_id-ordered cuts: stream arrival order == the batch operator's
    // doc_id order, the precondition for bit-equality with n15
    stage(docs.where(col("doc_id") < 200), "b1")
    val q = graft.streaming.NoveltyStream.noveltyStream(spark, src.toString, indexDir, outDir, s"$base/ckpt")
    val b0Seg = java.nio.file.Paths.get(s"$indexDir/firsts/batch_id=0")
    def firstParquetMtime(p: java.nio.file.Path): Long =
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet")).findFirst.get.toFile.lastModified()
    val mtime0 =
      try {
        q.processAllAvailable()
        firstParquetMtime(b0Seg)
      } finally {
        stage(docs.where(col("doc_id") >= 200 && col("doc_id") < 350), "b2")
        q.processAllAvailable()
        stage(docs.where(col("doc_id") >= 350), "b3")
        q.processAllAvailable()
        q.stop()
      }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getAs[Long]("n_shingles"), r.getAs[Long]("n_seen_before"))).toSeq
    val streamed = rows(graft.streaming.NoveltyStream.noveltyFromStream(spark, outDir))
    val batch    = rows(graft.operators.Dedup.noveltyScores(spark, sf0001))
    assert(streamed == batch && streamed.nonEmpty)
    // stale shingles never re-enter the index: the stored first-seen rows
    // are exactly the distinct-shingle census of the whole corpus
    val indexed = spark.read.parquet(s"$indexDir/firsts").count()
    val census  = graft.operators.Dedup.shingles(docs).select("s").distinct().count()
    assert(indexed == census, "index must hold each shingle exactly once")
    // batch 0's segment is sealed after later batches ran
    assert(firstParquetMtime(b0Seg) == mtime0, "batch-0 first-seen segment was rewritten")
    // checkpoint-replay idempotence: same batch_id rewrites, never doubles
    graft.streaming.NoveltyStream.processBatch(docs.where(col("doc_id") < 200), indexDir, outDir, 0L)
    assert(rows(graft.streaming.NoveltyStream.noveltyFromStream(spark, outDir)) == streamed)
    assert(spark.read.parquet(s"$indexDir/firsts").count() == indexed)
  }
}
