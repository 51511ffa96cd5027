package graft

import graft.functions.VectorFunctions
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  // Planted near-dup pairs at sf0.001, computed independently by DuckDB
  // (tools/oracle_check.py pipeline) — threshold Jaccard >= 0.8 on 3-gram
  // shingles. The corpus gap is wide (next natural pair ~0.14).
  private val plantedPairs = Set(
    (0L, 50L), (0L, 82L), (5L, 450L), (8L, 12L), (8L, 120L), (8L, 360L), (12L, 120L),
    (12L, 360L), (16L, 369L), (26L, 176L), (33L, 436L), (45L, 487L), (50L, 82L),
    (56L, 157L), (77L, 459L), (89L, 114L), (99L, 174L), (110L, 467L), (119L, 425L),
    (120L, 360L), (144L, 161L), (211L, 404L), (229L, 263L), (260L, 391L), (270L, 329L),
    (328L, 428L), (349L, 411L), (474L, 498L)
  )

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("n1 exact n-gram jaccard finds exactly the planted pairs") {
    assert(pairSet(Dedup.ngramJaccardPairs(spark, sf0001)) == plantedPairs)
  }

  test("n16: subset-dup (short doc inside long) is a containment hit that Jaccard structurally misses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_contain").toString
    // doc 1 = 6 tokens (4 shingles), doc 2 = doc 1 verbatim inside 30
    // tokens (28 shingles): containment = 4/4 = 1.0, Jaccard = 4/28 ≈ 0.14
    val short0 = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 24).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, short0, "en", "t", 1L),
      (2L, short0 + " " + filler, "en", "t", 1L),
      (3L, "totally unrelated content here now", "en", "t", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cont = Dedup.ngramContainmentPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(cont == Seq((1L, 2L, 4L, 4L)))
    assert(Dedup.ngramJaccardPairs(spark, dir).count() == 0L, "Jaccard must miss the subset dup")
  }

  test("g3: min-label propagation — 3 rounds reach exactly 3 hops on a chain; labels refine n6 components") {
    import spark.implicits._
    // path 0-1-2-3-4-5: after 3 synchronized rounds node k holds
    // max(0, k-3) — the designed partial convergence at the contract's k
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (path ++ path.map(_.swap)).toDF("src", "dst")
    val got = Dedup.propagateLabels(edges, Dedup.LabelPropIters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 2L)))
    // real corpus: equal g3 labels never straddle two n6 components (a
    // label reaches only nodes connected to its origin)
    val labels = Dedup.labelPropagation(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val comp = Dedup.dupClusters(spark, sf0001)
      .select("doc_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty)
    labels.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(comp).toSet.size == 1, "one label across two components")
    }
  }

  test("n2 minhash-lsh reproduces the exact result at planted similarity levels") {
    val n1 = Dedup.ngramJaccardPairs(spark, sf0001).collect().map(_.toSeq).toSeq
    val n2 = Dedup.minhashLshPairs(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(n1 == n2)
  }

  test("n3 simhash recalls >=80% of planted near-dup pairs") {
    // Measured on this corpus: planted pairs sit at simhash distance 0-11;
    // the designed operating point (Hamming <= 7) catches 25 of 28. Simhash
    // trades the tail for a banded-join plan with no pairwise verify step.
    val n3 = Dedup.simhashPairs(spark, sf0001)
    val found = n3.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (plantedPairs & found).size.toDouble / plantedPairs.size
    assert(recall >= 0.8, s"simhash recall $recall; missed ${plantedPairs -- found}")
  }

  test("n3p planted simhash: exactly the fixture's identical-text pairs, all at distance 0") {
    val expected = Set(
      (3000000L, 3000001L),                                           // group 0 (size 2)
      (3000002L, 3000003L), (3000002L, 3000004L), (3000003L, 3000004L), // group 1 (size 3)
      (3000005L, 3000006L)                                            // group 2 (size 2)
    )
    val got = Dedup.simhashPairsPlanted(spark, sf0001).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    assert(got.forall(_.getLong(2) == 0L), "identical text must hash to identical signatures")
  }

  test("n3p separation: fixture signatures sit >= 16 bits from each other and from the corpus") {
    // The oracle's validity argument: the planted pair set is deterministic
    // because every NON-identical-text distance involving a fixture doc is
    // far above the <=7 threshold (disjoint synthetic vocabularies =>
    // independent signatures => background Hamming ~32; realized min 19
    // at sf0.001, asserted with margin).
    val fx = spark.read.parquet("/root/repo/fixtures/simdup/documents.parquet")
    val union = graft.sources.Tables
      .documents(spark, sf0001)
      .select("doc_id", "text")
      .unionByName(fx.select("doc_id", "text"))
    val tok  = Dedup.shingles(union).select(col("doc_id"), Dedup.shingleHash64(col("s")).as("h")).distinct()
    val sigs = Dedup.simhashSignaturesFromHashes(tok)
    val fxSigs = sigs.where(col("doc_id") >= 3000000L).as("a")
    val minCross = fxSigs
      .crossJoin(sigs.as("b"))
      .where(col("a.doc_id") =!= col("b.doc_id")) // fixture-vs-ANY, either orientation
      .join(
        union.select(col("doc_id").as("a_id"), col("text").as("ta")),
        col("a.doc_id") === col("a_id")
      )
      .join(
        union.select(col("doc_id").as("b_id"), col("text").as("tb")),
        col("b.doc_id") === col("b_id")
      )
      .where(col("ta") =!= col("tb"))
      .agg(min(expr("bit_count(a.sig ^ b.sig)")))
      .head()
      .getInt(0)
    assert(minCross >= 16, s"min non-identical distance involving a fixture doc = $minCross")
  }

  test("n6 clustersFromPairs: min-id labels to fixpoint, multi-hop chains converge") {
    import spark.implicits._
    // two components: a 5-node chain (min label needs 4 propagation rounds)
    // and a triangle; singletons never appear (no pairs -> no rows)
    val pairs = Seq(
      (21L, 22L), (22L, 23L), (23L, 24L), (20L, 21L), // chain 20-21-22-23-24
      (40L, 41L), (41L, 42L), (40L, 42L)              // triangle
    ).toDF("doc_a", "doc_b")
    val got = Dedup.clustersFromPairs(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (20L, 20L), (20L, 21L), (20L, 22L), (20L, 23L), (20L, 24L),
      (40L, 40L), (40L, 41L), (40L, 42L)
    ))
    // a diameter beyond maxIter must fail LOUDLY — truncated labels split
    // one component into several cluster_ids, which must never publish as
    // a clean-looking report
    val ex = intercept[IllegalStateException] {
      Dedup.clustersFromPairs(pairs, maxIter = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("n6 star contraction == label propagation on chains, triangles, and seeded random graphs") {
    import spark.implicits._
    val fixed = Seq(
      (21L, 22L), (22L, 23L), (23L, 24L), (20L, 21L), // chain 20-21-22-23-24
      (40L, 41L), (41L, 42L), (40L, 42L)              // triangle
    )
    val rnd = new scala.util.Random(13)
    val randomGraphs = (0 until 3).map { g =>
      // ~60 edges over 40 nodes: mixes multi-node components and stragglers
      (0 until 60).map { _ =>
        val a = rnd.nextInt(40).toLong + 100L * g
        val b = rnd.nextInt(40).toLong + 100L * g
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2)
    }
    for (pairs <- randomGraphs :+ fixed) {
      val df   = pairs.toDF("doc_a", "doc_b")
      val star = Dedup.clustersFromPairsStar(df).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val prop = Dedup.clustersFromPairs(df).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(star == prop, s"star != label-prop on $pairs")
    }
  }

  test("n6 star contraction converges on a 100-hop chain where label propagation cannot") {
    import spark.implicits._
    // serial near-copies: each generation pairs only with the previous one.
    // Label propagation moves the min label ONE hop per round → needs 100
    // rounds and must throw at the 25-round guard; star contraction rewires
    // exponentially and must finish well inside it.
    val chain = (0L until 100L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ex    = intercept[IllegalStateException](Dedup.clustersFromPairs(chain).collect())
    assert(ex.getMessage.contains("did not converge"))
    val star = Dedup.clustersFromPairsStar(chain).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(star.toSet == (0L to 100L).map(i => (0L, i)).toSet)
  }

  test("n6 end-to-end: a~b~c chain with a,c dissimilar is ONE cluster, rep = min id") {
    import spark.implicits._
    val words = (0 until 40).map(i => s"w$i")
    def doc(from: Int) = words.slice(from, from + 30).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_chain").toString
    // J(a,b) = J(b,c) = 26/30 ≈ 0.87 ≥ 0.8; J(a,c) = 24/32 = 0.75 < 0.8
    Seq((7L, doc(0)), (8L, doc(2)), (9L, doc(4)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the chain link (7,9) must NOT be a pair — clustering, not the pair
    // rung, is what closes the transitive group
    val pairs = pairSet(Dedup.minhashLshPairs(spark, dir))
    assert(pairs == Set((7L, 8L), (8L, 9L)), pairs)
    val clusters = Dedup.dupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clusters == Set((7L, 7L), (7L, 8L), (7L, 9L)))
  }

  test("n4 LSH-bucketed dedup == brute force on planted duplicate vectors") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // planted fixture: 40 random 64-dim base vectors (seeded), plus a
    // slightly-perturbed copy of each of the first 10 (cosine ≥ ~0.99 —
    // where real duplicate embeddings live); the other 30 stay singletons.
    val rnd  = new scala.util.Random(7)
    val base = (0L until 40L).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val dups = base.take(10).map { case (i, v) =>
      (i + 1000L, v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    val e = (base ++ dups).toDF("vec_id", "embedding")

    val lsh   = Dedup.embeddingDupPairsOn(e).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.embeddingDupPairsBrute(e).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty && brute.forall { case (a, b) => b == a + 1000L })
    assert(lsh == brute, s"LSH missed ${brute -- lsh}, extra ${lsh -- brute}")
  }

  test("n4 plan has no broadcast nested-loop join (candidates come from the band equi-join)") {
    val plan = Dedup
      .embeddingDupPairs(spark, sf0001)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("n4 on real embeddings is empty (no planted dups, max cosine ~0.51)") {
    assert(Dedup.embeddingDupPairs(spark, sf0001).count() == 0L)
  }

  test("n13 mines planted sub-span catchphrases; minDf excludes rare grams") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_n13").toString
    // "buy gold now" planted in 3 docs (df 3); "sell it later" in only 2
    // (below minDf 3); filler tokens unique per doc so nothing else repeats
    Seq(
      (0L, "a0 b0 buy gold now c0 d0"),
      (1L, "a1 buy gold now b1 sell it later c1"),
      (2L, "buy gold now a2 sell it later b2"),
      (3L, "a3 b3 c3 d3 e3 f3 g3")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Dedup
      .frequentNgrams(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSet == Set((2L, "buy gold", 3L), (2L, "gold now", 3L), (3L, "buy gold now", 3L)), s"got ${got.toSeq}")
    // the df-2 phrase appears once minDf is lowered, and nothing wider than
    // the phrase itself ever qualifies
    val loose = graft.operators.Dedup
      .frequentNgrams(spark, dir, minDf = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(loose.contains((3L, "sell it later", 2L)) && !loose.exists(_._1 > 3L))
  }

  test("n4p surfaces exactly the committed fixture's 6 planted pairs over the real corpus") {
    val pairs = Dedup
      .embeddingDupPairsPlanted(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // FixtureGen plants consecutive-id pairs (1000000,1000001) .. (1000010,1000011)
    assert(pairs == (0 until 6).map(i => (1000000L + 2 * i, 1000001L + 2 * i)).toSet, s"got $pairs")
  }

  test("n5 incremental dedup finds exactly the planted pairs touching the batch half") {
    // k = (499+1)/2 = 250 at sf0.001: the index holds docs 0..249, docs
    // 250..499 arrive as the batch; expected = planted pairs with doc_b >= 250
    val expected = plantedPairs.filter { case (_, b) => b >= 250L }
    assert(expected.nonEmpty && expected.size < plantedPairs.size) // both cross and dropped pairs exist
    val got = pairSet(Dedup.incrementalNearDupPairs(spark, sf0001))
    assert(got == expected, s"missing ${expected -- got}, extra ${got -- expected}")
  }

  test("n1 stop-shingle cap kills hot-shingle fan-out, keeps true near-dup pairs") {
    import spark.implicits._
    // 40 docs share ONE boilerplate shingle (a 40-doc clique = 780 candidate
    // pairs from that shingle alone — the hot-shingle skew shape); docs
    // 100/101 are genuine near-dups (Jaccard 8/9).
    val docs = (0L until 40L).map(i => (i, s"common header line unique$i fill${i}a fill${i}b")) ++ Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa extra")
    )
    val df     = docs.toDF("doc_id", "text")
    val raw    = Dedup.shingles(df)
    val capped = Dedup.cappedShingles(df, maxDf = 10)
    assert(raw.where(col("s") === "common header line").count() == 40L)
    assert(capped.where(col("s") === "common header line").count() == 0L)
    def candPairs(sh: org.apache.spark.sql.DataFrame): Long =
      sh.as("a")
        .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"))
        .distinct()
        .count()
    assert(candPairs(raw) >= 780L + 1L)  // the clique dominates
    assert(candPairs(capped) == 1L, "only the true near-dup pair survives the cap")
  }

  test("s5 range search == brute-force threshold filter") {
    VectorFunctions.register(spark)
    val s5 = graft.operators.Similarity.rangeSearch(spark, sf0001).collect().map(_.getLong(0)).toSet
    val e  = graft.sources.Tables.embeddings(spark, sf0001)
    val brute = e
      .where(col("vec_id") =!= 0L)
      .crossJoin(e.where(col("vec_id") === 0L).select(col("embedding").as("qv")))
      .where(expr("cosine_sim(embedding, qv)") >= 0.30)
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(s5 == brute && s5.nonEmpty)
  }

  test("exact dup groups: empty on the real corpus, correct on planted dups") {
    assert(Dedup.exactDupRows(spark, sf0001).count() == 0L)
    // planted: docs 2 and 5 share text with 1 and 4 respectively
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dups").toString
    Seq(
      (1L, "same text", "en", "t", 9L),
      (2L, "same text", "en", "t", 9L),
      (3L, "unique text", "en", "t", 11L),
      (4L, "other dup", "en", "t", 9L),
      (5L, "other dup", "en", "t", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val groups = Dedup.exactDupRows(spark, dir).collect()
    assert(groups.length == 2)
    assert(groups.map(r => (r.getLong(1), r.getLong(2))).toSet == Set((2L, 1L), (2L, 4L)))
  }

  test("n14 quality keep: argmax-token representative (not min id); ties break to min id") {
    import spark.implicits._
    val dir  = java.nio.file.Files.createTempDirectory("graft_n14").toString
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val dbl  = base + " " + base // same shingle set + 2 seam shingles: J = 38/40 = 0.95, but 80 tokens
    val tie  = (1 to 30).map(i => s"t$i").mkString(" ")
    val solo = (1 to 25).map(i => s"u$i").mkString(" ")
    Seq(
      (10L, base, "en", "t", 1L),
      (11L, dbl, "en", "t", 1L),
      (20L, tie, "en", "t", 1L),
      (21L, tie, "en", "t", 1L),
      (30L, solo, "en", "t", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup
      .qualityClusterRepresentatives(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // cluster {10,11}: 11 wins on tokens despite the higher id;
    // cluster {20,21}: tie on tokens -> min id 20; 30 is untouched.
    assert(got == Set((11L, 2L, 80L), (20L, 2L, 30L), (30L, 1L, 25L)))
    // n9's min-id rule keeps 10 on the same corpus — the rules genuinely differ
    val n9 = Dedup
      .clusterRepresentatives(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(n9 == Set((10L, 2L), (20L, 2L), (30L, 1L)))
  }

  test("span layout: cached n7/d16/n8/n11/n13 ≡ their live computations; reuse skips the build") {
    import graft.sources.LayoutCache
    LayoutCache.drainBuildLog()
    val pairs: Seq[(String, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = Seq(
      ("n7", Dedup.sharedSpans(spark, sf0001), Dedup.sharedSpansLive(spark, sf0001)),
      ("d16", Dedup.spanShareStats(spark, sf0001), Dedup.spanShareStatsLive(spark, sf0001)),
      ("n8", Dedup.redactSharedSpans(spark, sf0001), Dedup.redactSharedSpansLive(spark, sf0001)),
      ("n11", Dedup.maxSharedSegments(spark, sf0001), Dedup.maxSharedSegmentsLive(spark, sf0001)),
      ("d34", Dedup.exciseSharedSpans(spark, sf0001),
        Dedup.exciseSharedSpansLive(graft.sources.Tables.documents(spark, sf0001), Dedup.SpanTokens)),
      ("n13", Dedup.frequentNgrams(spark, sf0001), Dedup.frequentNgramsLive(spark, sf0001)),
      ("n3", Dedup.simhashPairs(spark, sf0001), Dedup.simhashPairsLive(spark, sf0001))
    )
    for ((name, cached, live) <- pairs) {
      assert(cached.columns.sameElements(live.columns), s"$name schema drift")
      assert(
        cached.exceptAll(live).isEmpty && live.exceptAll(cached).isEmpty,
        s"$name cached ≠ live"
      )
    }
    // every layout now warm: re-running the cached entries must build nothing
    LayoutCache.drainBuildLog()
    pairs.foreach { case (_, _, _) => () }
    Dedup.sharedSpans(spark, sf0001).collect()
    Dedup.frequentNgrams(spark, sf0001).collect()
    val rebuilt = LayoutCache.drainBuildLog()
    assert(rebuilt.isEmpty, s"warm layouts rebuilt: $rebuilt")
  }

  test("n7 shared spans: exactly the windows inside the common run; internal self-repeats excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_spans").toString
    val run = (1 to 9).map(i => s"c$i").mkString(" ") // 9 common tokens → 2 shared 8-windows
    Seq(
      (1L, s"p1 p2 $run s1", "en", "t", 1L),
      (2L, s"q1 $run r1 r2", "en", "t", 1L),
      // one 8-token span repeated WITHIN a single doc — df counts documents,
      // not occurrences, so this must not surface
      (3L, ((1 to 8).map(i => s"x$i") ++ (1 to 8).map(i => s"x$i")).mkString(" "), "en", "t", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = Set(
      md5hex((1 to 8).map(i => s"c$i").mkString(" ")),
      md5hex((2 to 9).map(i => s"c$i").mkString(" "))
    )
    val got = Dedup.sharedSpans(spark, dir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == expected)
    assert(got.values.forall(_ == 2L))
    // d16 turns the same span stream into per-doc density: docs 1/2 have 5
    // distinct spans each (12 tokens), 2 of them shared; doc 3's 9 windows
    // collapse to 8 distinct (its halves repeat), none shared
    val stats = Dedup
      .spanShareStats(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(stats(1L) == ((5L, 2L, 0.4)))
    assert(stats(2L) == ((5L, 2L, 0.4)))
    assert(stats(3L) == ((8L, 0L, 0.0)))
  }

  test("n8 redaction masks exactly the union of shared-span windows; clean and short docs pass through") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_redact").toString
    val run = (1 to 9).map(i => s"c$i").mkString(" ") // 9-token verbatim overlap
    val d3  = ((1 to 8).map(i => s"x$i") ++ (1 to 8).map(i => s"x$i")).mkString(" ")
    Seq(
      (1L, s"p1 p2 $run s1", "en", "t", 1L),
      (2L, s"q1 $run r1 r2", "en", "t", 1L),
      // in-doc self-repeat only → never shared → untouched
      (3L, d3, "en", "t", 1L),
      // shorter than the span width → no spans at all → untouched
      (4L, "short doc only", "en", "t", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dup = "[DUP]"
    val got = Dedup
      .redactSharedSpans(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    // doc 1: shared 8-windows start at 3 and 4 → coverage 3..11 = the 9 run
    // tokens; the flanks p1 p2 s1 survive
    assert(got(1L) == ((9L, md5hex((Seq("p1", "p2") ++ Seq.fill(9)(dup) :+ "s1").mkString(" ")))))
    // doc 2: starts 2,3 → coverage 2..10
    assert(got(2L) == ((9L, md5hex((Seq("q1") ++ Seq.fill(9)(dup) ++ Seq("r1", "r2")).mkString(" ")))))
    assert(got(3L) == ((0L, md5hex(d3))))
    assert(got(4L) == ((0L, md5hex("short doc only"))))
  }

  test("d34 excision: shared spans drop everywhere EXCEPT the min-id carrier; a verbatim copy excises to empty; intra-doc repeats and short docs untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_excise").toString
    val run = (1 to 9).map(i => s"c$i").mkString(" ") // 9-token verbatim overlap across docs 1,2,3
    val d5  = ((1 to 8).map(i => s"x$i") ++ (1 to 8).map(i => s"x$i")).mkString(" ")
    Seq(
      (1L, s"p1 p2 $run s1", "en", "t", 1L),  // keeper of the c-run spans (min id)
      (2L, s"q1 $run r1 r2", "en", "t", 1L),  // loses the c-run, keeps its flanks
      (3L, s"q1 $run r1 r2", "en", "t", 1L),  // verbatim copy of doc 2 → fully excised
      (4L, "short doc only", "en", "t", 1L),  // shorter than the span width → untouched
      (5L, d5, "en", "t", 1L)                 // intra-doc self-repeat only → never shared → untouched
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = Dedup
      .exciseSharedSpans(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // doc 1 is every c-span's smallest carrier: nothing excised
    assert(got(1L) == ((12L, 12L, 0L, md5hex(s"p1 p2 $run s1"))))
    // doc 2: c-run windows (keeper 1) cover tokens 2..10; the q1/r1/r2
    // windows it shares with doc 3 keep doc 2 as THEIR keeper
    assert(got(2L) == ((12L, 3L, 9L, md5hex("q1 r1 r2"))))
    // doc 3: every window's keeper is a smaller doc → zero survivors, and
    // the ledger row still exists with the empty-text fingerprint
    assert(got(3L) == ((12L, 0L, 12L, md5hex(""))))
    assert(got(4L) == ((3L, 3L, 0L, md5hex("short doc only"))))
    assert(got(5L) == ((16L, 16L, 0L, md5hex(d5))))
  }

  test("n11 maximal segments: one row per repeat (not k windows), disjoint repeats split") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_maxseg").toString
    val a12 = (1 to 12).map(i => s"a$i").mkString(" ") // 12-token copied run
    val b8  = (1 to 8).map(i => s"b$i").mkString(" ")
    val c8  = (1 to 8).map(i => s"c$i").mkString(" ")
    Seq(
      // 12-token shared prefix → 5 overlapping shared windows → ONE segment
      (1L, s"$a12 u1 u2", "en", "t", 1L),
      (2L, s"$a12 v1 v2", "en", "t", 1L),
      // two disjoint 8-token repeats separated by differing gaps → TWO segments
      (3L, s"$b8 g1 g2 g3 $c8", "en", "t", 1L),
      (4L, s"$b8 h1 h2 h3 $c8", "en", "t", 1L),
      // unique long doc → absent
      (5L, (1 to 20).map(i => s"z$i").mkString(" "), "en", "t", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = Dedup
      .maxSharedSegments(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == Seq(
      (1L, 1L, 12L, md5hex(a12)),
      (2L, 1L, 12L, md5hex(a12)),
      (3L, 1L, 8L, md5hex(b8)),
      (3L, 12L, 8L, md5hex(c8)),
      (4L, 1L, 8L, md5hex(b8)),
      (4L, 12L, 8L, md5hex(c8))
    ))
  }

  test("n11 reconciles with n8: per-doc segment lengths sum to the masked token count") {
    import org.apache.spark.sql.functions._
    val segSum = Dedup
      .maxSharedSegments(spark, sf0001)
      .groupBy("doc_id")
      .agg(sum("n_tokens").as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val masked = Dedup
      .redactSharedSpans(spark, sf0001)
      .where(col("n_masked") > 0)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(segSum == masked)
    assert(segSum.nonEmpty, "real corpus should contain at least one shared segment")
  }

  test("minhash index cache ≡ inline artifacts, bit for bit") {
    val inline = Dedup.minhashArtifacts(graft.sources.Tables.documents(spark, sf0001))
    val cached = Dedup.minhashArtifactsCached(spark, sf0001)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), Option(r.getSeq[Long](1)).map(_.sorted.toSeq), r.getLong(2)))
        .sortBy(_._1)
        .toSeq
    assert(canon(cached._1) == canon(inline._1))
    def canonB(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(canonB(cached._2) == canonB(inline._2))
    assert(canonB(cached._2).nonEmpty)
  }

  test("n10: semantic keep-list — planted vector dups collapse to min-id reps, real corpus all singletons") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_n10").toString
    // same planted shape as n4's fixture: 20 seeded base vectors, the
    // first 5 with a near-copy (cosine ≥ ~0.99) at id+1000, plus labels
    val rnd  = new scala.util.Random(11)
    val base = (0L until 20L).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat), 0))
    val dups = base.take(5).map { case (i, v, _) =>
      (i + 1000L, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat), 0)
    }
    (base ++ dups)
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val kept = Dedup
      .embeddingClusterRepresentatives(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // each planted pair keeps its min id with size 2; the copy is dropped
    (0L until 5L).foreach { i =>
      assert(kept.get(i).contains(2L), s"rep $i")
      assert(!kept.contains(i + 1000L), s"dropped copy ${i + 1000L}")
    }
    (5L until 20L).foreach(i => assert(kept.get(i).contains(1L), s"singleton $i"))
    assert(kept.values.sum == 25L)
    // real corpus: no cosine-0.95 pairs exist → everything survives as a
    // singleton, and the keep-list is exactly the vector id set
    val real  = Dedup.embeddingClusterRepresentatives(spark, sf0001).collect()
    val total = graft.sources.Tables.embeddings(spark, sf0001).count()
    assert(real.length.toLong == total && real.forall(_.getLong(1) == 1L))
  }

  test("pair layouts ≡ the live computation, and rebuild when the corpus changes in place") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_pairs_stale").toString
    // 20-token shared run + one differing tail token → Jaccard 18/20 = 0.9
    val run = (1 to 20).map(i => s"t$i").mkString(" ")
    def writeDocs(suffix: String): Unit =
      Seq((0L, s"$run a$suffix"), (1L, s"$run b$suffix"), (2L, (1 to 14).map(i => s"u$i$suffix").mkString(" ")))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    writeDocs("v1")
    val cached = Dedup.minhashLshPairs(spark, dir).collect().map(_.toSeq).toSeq
    val live = Dedup
      .minhashLshPairsLive(spark, dir)
      .orderBy("doc_a", "doc_b")
      .collect().map(_.toSeq).toSeq
    assert(cached == live && cached.nonEmpty, "persisted pair table must equal the live derivation")
    // regenerate UNDER THE SAME PATH with no near-dups: a stale layout
    // would still report the old pair
    Seq((0L, (1 to 14).map(i => s"x$i").mkString(" ")), (1L, (1 to 14).map(i => s"y$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(Dedup.minhashLshPairs(spark, dir).count() == 0L)
    // n4's layout: planted identical vectors pair up; perturbing the table
    // in place rebuilds (pair disappears), never serves the stale layout
    graft.functions.VectorFunctions.register(spark)
    val edir = java.nio.file.Files.createTempDirectory("graft_embpairs_stale").toString
    val rnd  = new scala.util.Random(7)
    val v    = Array.fill(64)(rnd.nextGaussian().toFloat)
    val w    = Array.fill(64)(rnd.nextGaussian().toFloat)
    def writeVecs(second: Array[Float]): Unit =
      Seq((0L, v, 0), (1L, second, 0))
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$edir/embeddings.parquet")
    writeVecs(v.map(x => x + 0.001f))
    val p1 = Dedup.embeddingDupPairs(spark, edir).collect()
    assert(p1.length == 1 && p1.head.getLong(0) == 0L && p1.head.getLong(1) == 1L)
    writeVecs(w) // unrelated vector: cosine ~0 → no pair in a FRESH layout
    assert(Dedup.embeddingDupPairs(spark, edir).where(col("vec_a") === 0L).count() == 0L)
  }

  test("n12 incremental clusters == n6 full recompute; cross-half chains merge") {
    import spark.implicits._
    // real corpus: the incremental derivation must be indistinguishable
    // from the from-scratch contraction
    val full = Dedup.dupClusters(spark, sf0001).collect().map(_.toSeq).toSeq
    val incr = Dedup.incrementalDupClusters(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(incr == full && full.nonEmpty)
    // planted: a near-dup CHAIN spanning the index/batch split (0 ~ 1 in
    // the index half; 1 ~ 10 crosses; 10 ~ 11 batch-internal) must come
    // out as ONE cluster labeled by the index-half minimum — the case a
    // per-batch fold without the prior cluster table gets wrong
    val dir = java.nio.file.Files.createTempDirectory("graft_n12").toString
    val run = (1 to 20).map(i => s"c$i").mkString(" ")
    Seq(
      (0L, s"$run a0"), (1L, s"$run a1"),            // index half (k = 6)
      (2L, (1 to 22).map(i => s"x$i").mkString(" ")), // unrelated filler
      (10L, s"$run a2"), (11L, s"$run a3")            // batch half
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup
      .incrementalDupClusters(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((0L, 0L), (0L, 1L), (0L, 10L), (0L, 11L)))
  }

  test("n9: kept set = cluster minima + untouched docs; sizes partition the corpus") {
    val kept = Dedup
      .clusterRepresentatives(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val clusters = Dedup
      .dupClusters(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docIds = graft.sources.Tables
      .documents(spark, sf0001)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    val clustered = clusters.map(_._2).toSet
    // exactly the representatives survive from clusters, with their size...
    clusters.groupBy(_._1).foreach { case (cid, members) =>
      assert(kept.get(cid).contains(members.length.toLong), s"cluster $cid")
      assert(cid == members.map(_._2).min, s"cluster $cid labeled by min member")
      members.map(_._2).filter(_ != cid).foreach(m => assert(!kept.contains(m), s"dropped member $m"))
    }
    // ...every untouched doc survives as a singleton...
    (docIds -- clustered).foreach(d => assert(kept.get(d).contains(1L), s"singleton $d"))
    // ...and the sizes partition the corpus: nothing lost, nothing counted twice
    assert(kept.values.sum == docIds.size.toLong)
    assert(clusters.nonEmpty, "fixture corpus must actually contain near-dup clusters")
  }

  test("n17: banded dHash pairs == brute force over the same hash set; non-empty at sf0.001") {
    val banded = Dedup
      .imageDhashPairs(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val h = graft.operators.Multimodal
      .imageDhash(graft.operators.Multimodal.syntheticMediaWhere(
        spark, sf0001, org.apache.spark.sql.functions.col("doc_id") % 4 === 0))
      .collect()
      .map(r => (r.media_id, r.hash_hi, r.hash_lo))
    val brute = (for {
      a <- h; b <- h if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= Dedup.DhashHammingMax
    } yield (a._1, b._1, d.toLong)).toSet
    assert(banded == brute, "band pigeonhole must be exact-complete at Hamming <= 7")
    assert(banded.nonEmpty, "the synthetic corpus must contain dHash near-dups")
    assert(banded.exists(_._3 == 0L), "and exact perceptual dups")
  }

  test("n20: banded audio-hash pairs == brute force over the same envelope hashes; dist-0 mass present") {
    val banded = Dedup
      .audioHashPairs(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val h = graft.operators.Multimodal
      .audioEnvelopeHash(graft.operators.Multimodal.syntheticMediaWhere(
        spark, sf0001, org.apache.spark.sql.functions.col("doc_id") % 4 === 1))
      .collect()
      .map(r => (r.media_id, r.hash_hi, r.hash_lo))
    val brute = (for {
      a <- h; b <- h if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= Dedup.DhashHammingMax
    } yield (a._1, b._1, d.toLong)).toSet
    assert(banded == brute, "band pigeonhole must be exact-complete at Hamming <= 7")
    assert(banded.nonEmpty, "the synthetic corpus must contain audio near-dups")
    assert(banded.exists(_._3 == 0L), "identical envelope patterns (ids 256 apart, same length) must collapse to dist 0")
    // hash halves never carry a sign bit (the banding >> & 255 portability contract)
    assert(h.forall(x => x._2 >= 0 && x._2 < (1L << 32) && x._3 >= 0 && x._3 < (1L << 32)))
  }

  test("m10: loudness-scaling invariance — doubling all amplitudes preserves the envelope hash bits") {
    // the monotone-compare robustness claim, checked directly on the
    // slice-energy definition: E_k > E_{k+1} is invariant under any
    // strictly positive uniform gain (integer doubling here)
    val h = graft.operators.Multimodal
      .audioEnvelopeHash(graft.operators.Multimodal.syntheticMediaWhere(
        spark, sf0001, org.apache.spark.sql.functions.col("doc_id") % 4 === 1))
      .collect()
    assert(h.nonEmpty)
    // for a sample of ledger rows, recompute the hash from the decoded
    // samples at 1x (replay pins the definition) and 2x gain (invariance)
    val media = graft.operators.Multimodal
      .syntheticMediaWhere(spark, sf0001, org.apache.spark.sql.functions.col("doc_id") % 4 === 1)
      .collect()
    val byId = h.map(r => r.media_id -> (r.hash_hi, r.hash_lo)).toMap
    media.take(30).foreach { m =>
      graft.operators.Multimodal.decodeWav(m.payload).foreach { a =>
        val slices = graft.operators.Multimodal.AudioHashSlices
        def hashOf(gain: Long): (Long, Long) = {
          val e = new Array[Long](slices)
          a.samples.zipWithIndex.foreach { case (s, i) =>
            e((i.toLong * slices / a.samples.length).toInt) += gain * math.abs(math.round(s * 128f)).toLong
          }
          var hi = 0L; var lo = 0L
          (0 until slices - 1).foreach { k =>
            if (e(k) > e(k + 1)) { if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32) }
          }
          (hi, lo)
        }
        assert(hashOf(1L) == byId(m.media_id), s"spec replay must match the ledger for ${m.media_id}")
        assert(hashOf(2L) == byId(m.media_id), s"2x gain must not move the hash for ${m.media_id}")
      }
    }
  }

  test("n23: audio group ledger reconciles with n20's dist-0 pairs; keepers are minima") {
    val groups = Dedup.audioHashGroups(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(groups.nonEmpty, "the synthetic corpus must contain perceptual-exact audio dup groups")
    val pairSum = groups.map { case (_, _, n, _) => n * (n - 1) / 2 }.sum
    val zeroPairs = Dedup.audioHashPairs(spark, sf0001)
      .where(org.apache.spark.sql.functions.col("dist") === 0L).count()
    assert(pairSum == zeroPairs, s"group arithmetic $pairSum must equal dist-0 pair count $zeroPairs")
    val byHash = graft.operators.Multimodal
      .audioEnvelopeHash(graft.operators.Multimodal.syntheticMediaWhere(
        spark, sf0001, org.apache.spark.sql.functions.col("doc_id") % 4 === 1))
      .collect().groupBy(r => (r.hash_hi, r.hash_lo))
    groups.foreach { case (hi, lo, n, keeper) =>
      val members = byHash((hi, lo)).map(_.media_id)
      assert(members.length.toLong == n && members.min == keeper, s"group ($hi,$lo)")
    }
  }

  test("n22: capped audio pairs == n20 exactly when every unit is under the cap; conservation holds") {
    // at test SF the audio masses are all small (groups of 2, cross
    // products <= 4), so the capped rung must reproduce n20's pair set
    // verbatim with kind='pair'/n_pairs=1 — the degrade shapes are pinned
    // by the shared core's all-collide fixture test above
    val capped = Dedup.audioHashPairsCapped(spark, sf0001).collect()
    assert(capped.forall(r => r.getString(0) == "pair" && r.getLong(4) == 1L),
      "every audio unit at sf0.001 sits under the default cap")
    val pairs = capped.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val n20 = Dedup.audioHashPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == n20, "capped == uncapped when nothing degrades")
  }

  test("n18: group ledger reconciles with n17's dist-0 pairs — sum n(n-1)/2 == exact-dup pair count; keepers are minima") {
    val groups = Dedup
      .imageDhashGroups(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(groups.nonEmpty, "the synthetic corpus must contain perceptual-exact dup groups")
    val pairSum = groups.map { case (_, _, n, _) => n * (n - 1) / 2 }.sum
    val zeroPairs = Dedup
      .imageDhashPairs(spark, sf0001)
      .where(org.apache.spark.sql.functions.col("dist") === 0L)
      .count()
    assert(pairSum == zeroPairs, s"group arithmetic $pairSum must equal dist-0 pair count $zeroPairs")
    // each keeper really is its group's minimum member
    val h = graft.operators.Multimodal
      .imageDhash(graft.operators.Multimodal.syntheticMediaWhere(
        spark, sf0001, org.apache.spark.sql.functions.col("doc_id") % 4 === 0))
      .collect()
      .groupBy(r => (r.hash_hi, r.hash_lo))
    groups.foreach { case (hi, lo, n, keeper) =>
      val members = h((hi, lo)).map(_.media_id)
      assert(members.length.toLong == n && members.min == keeper, s"group ($hi,$lo)")
    }
  }

  test("n19: longest shared substring — exact length with no floor, internal repeats excluded, cap saturates") {
    import spark.implicits._
    val mk = (id: Long, text: String) => (id, text)
    // doc 1/2 share EXACTLY the 5-token run "v w x y z" (6-token match
    // impossible: different neighbors); doc 3 repeats a 7-token run only
    // WITHIN itself (cross-doc df = 1 — must not count beyond the "q q"
    // bigram it shares with nobody); docs 4/5 share a 20-token run that
    // must SATURATE at the 16-token cap; doc 6 shares nothing.
    val docs = Seq(
      mk(1L, "a1 b1 v w x y z c1 d1"),
      mk(2L, "a2 b2 c2 v w x y z d2"),
      mk(3L, "p q r s t u p2 p q r s t u p3"),
      mk(4L, "s1 " + (1 to 20).map(i => s"t$i").mkString(" ") + " e1"),
      mk(5L, "s2 " + (1 to 20).map(i => s"t$i").mkString(" ") + " e2"),
      mk(6L, "zz1 zz2 zz3")
    ).toDF("doc_id", "text")
    val got = Dedup.longestSharedSubstringFrom(docs, cap = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.get(1L).contains(5L) && got.get(2L).contains(5L), s"planted 5-token run: $got")
    assert(!got.contains(3L), "a doc whose repeats are all internal shares nothing cross-doc")
    assert(got.get(4L).contains(16L) && got.get(5L).contains(16L), s"20-token run saturates at the cap: $got")
    assert(!got.contains(6L), "no shared token, no row")
    // the shared max-length fingerprints agree across the sharing pair
    val fps = Dedup.longestSharedSubstringFrom(docs, cap = 16)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(fps(1L) == fps(2L) && fps(4L) == fps(5L))
    // and an uncapped-enough run reports its true length
    val full = Dedup.longestSharedSubstringFrom(docs, cap = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full.get(4L).contains(20L), s"cap 32 must recover the true 20: $full")
    // n19b: partner attribution — each sharer names the other; rows,
    // lengths and fingerprints agree with n19's table exactly
    val (lss, partners, _) = Dedup.longestSharedSubstringArtifacts(docs, cap = 16)
    val p = partners.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    assert(p(1L)._3 == 2L && p(2L)._3 == 1L, s"5-token sharers must name each other: $p")
    assert(p(4L)._3 == 5L && p(5L)._3 == 4L)
    val l = lss.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(p.keySet == l.keySet && p.forall { case (d, (len, fp, _)) => l(d) == (len, fp) },
      "partner table must carry n19's exact (len, fp) per doc")
  }

  test("n21: capped expansion — degenerate all-collide mass degrades to ONE group row; n_pairs conserves the uncapped count") {
    import spark.implicits._
    // the adversarial corpus n17's doc warns about: 100 images on ONE
    // hash (4950 latent pairs — today's uncapped expansion materializes
    // every one), plus a 3-member hash within Hamming 1 of it (300
    // latent cross pairs) and a 2-member hash far away (1 tractable pair)
    val h = (
      (0L until 100L).map(i => (i, 0L, 255L)) ++          // mass: hash (0, 255)
        (100L until 103L).map(i => (i, 0L, 254L)) ++      // near mass: dist 1
        Seq((200L, 4095L, 0L), (201L, 4095L, 0L))         // far small group
    ).toDF("media_id", "hash_hi", "hash_lo")
    val capped = Dedup.dhashPairsCappedFromHashes(h, cap = 16L).collect()
    val byKind = capped.groupBy(_.getString(0))
    // the 4950-pair mass is ONE 'group' row; the 300-pair cross mass ONE
    // 'xgroup' row; expanded 'pair' rows are the 2-member group's 1 pair
    // plus the near-mass group's 3 internal pairs
    assert(byKind("group").map(r => (r.getLong(1), r.getLong(4))).toSeq == Seq((0L, 4950L)))
    assert(byKind("xgroup").map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      == Seq((0L, 100L, 1L, 300L)))
    assert(byKind("pair").length == 1 + 3, s"expanded pairs: ${byKind("pair").mkString(",")}")
    // conservation: sum(n_pairs) == the uncapped rung's total pair count
    val uncapped = Dedup.dhashPairsFromHashes(h).count()
    assert(capped.map(_.getLong(4)).sum == uncapped,
      s"capped ledger must account for every latent pair ($uncapped)")
    // and the capped plan's output is bounded: rows <= images + hash-pair units
    assert(capped.length.toLong <= 105L + 3L)
  }

  test("n21 on the real corpus: expanded pairs are exactly n17's pairs from small units; ledger rows cover the rest") {
    val capped = Dedup.imageDhashPairsCapped(spark, sf0001).collect()
    val pairs  = capped.filter(_.getString(0) == "pair").map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val n17    = Dedup.imageDhashPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.subsetOf(n17), "every expanded pair must be an n17 pair")
    assert(capped.exists(_.getString(0) == "group") && capped.exists(_.getString(0) == "xgroup"),
      "the default cap must exercise both degrade shapes on the synthetic corpus")
    val total = capped.map(_.getLong(4)).sum
    assert(total == n17.size.toLong, s"n_pairs total $total must equal n17's ${n17.size}")
  }

  test("n17 pigeonhole: any 64-bit pair within Hamming 7 shares an 8-bit band (randomized)") {
    val rnd = new scala.util.Random(13)
    (0 until 2000).foreach { _ =>
      val a    = rnd.nextLong()
      val nBit = rnd.nextInt(8) // 0..7 flips
      val b    = (0 until nBit).foldLeft(a)((v, _) => v ^ (1L << rnd.nextInt(64)))
      val ham  = java.lang.Long.bitCount(a ^ b)
      if (ham <= 7) {
        val shares = (0 until 8).exists(k => ((a >>> (8 * k)) & 255L) == ((b >>> (8 * k)) & 255L))
        assert(shares, s"pair at Hamming $ham must share a band: $a $b")
      }
    }
  }

  test("m11/n24/n25/n26: video keyframe fingerprints, majority simhash, and the shared core on the third modality") {
    import graft.operators.Multimodal
    import spark.implicits._
    // majority vote on a hand fixture: 3 keyframes, bitwise 2-of-3
    val kf = Seq(
      (1L, 1L, 12L, 10L), // hi 1100, lo 1010
      (1L, 2L, 12L, 2L),  // hi 1100, lo 0010
      (1L, 3L, 0L, 3L)    // hi 0000, lo 0011
    ).toDF("media_id", "frame_no", "hash_hi", "hash_lo")
    val mh = Multimodal.videoSimhashOf(kf).collect()
    assert(mh.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 12L, 2L)),
      s"strict per-bit majority: ${mh.mkString(",")}")
    // keyframe ledger: one row per sync sample (every 4th of min(n_chars, 50))
    val nchars = graft.sources.Tables.documents(spark, sf0001)
      .where(col("doc_id") % 4 === 3)
      .select("doc_id", "n_chars").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perMedia = Multimodal.videoKeyframeLedger(spark, sf0001)
      .groupBy("media_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    nchars.foreach { case (id, nc) =>
      val samples  = math.min(nc, 50L)
      val expected = if (samples <= 0) 0L else (samples + 3) / 4
      assert(perMedia.getOrElse(id, 0L) == expected, s"media $id: samples=$samples")
    }
    // n24 == brute-force Hamming over the media ledger; twins (id, id+256)
    // with equal keyframe sets collide at dist 0
    val ledger = Multimodal.videoHashLedger(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (a, ahi, alo) <- ledger
      (b, bhi, blo) <- ledger
      if a < b
      d = java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo)
      if d <= Dedup.DhashHammingMax
    } yield (a, b, d.toLong)).toSet
    val pairs = Dedup.videoHashPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == brute && pairs.nonEmpty)
    assert(pairs.exists { case (a, b, d) => b == a + 256 && d == 0L },
      "payload-formula twins must collide at dist 0")
    // n25 groups are exactly the dist-0 connected masses' hash keys
    val groups = Dedup.videoHashGroups(spark, sf0001).collect()
    assert(groups.nonEmpty && groups.forall(_.getLong(2) >= 2))
    // n26 at the default cap on this corpus: every unit under cap, so the
    // capped ledger IS the pair list and n_pairs conserves the n24 count
    val capped = Dedup.videoHashPairsCapped(spark, sf0001).collect()
    assert(capped.map(_.getLong(4)).sum == pairs.size.toLong)
    assert(capped.filter(_.getString(0) == "pair").map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      subsetOf pairs)
  }

  test("takedown masks every perceptual ledger: tombstoned media on neither pair side; equals from-scratch over survivors") {
    import graft.operators.Multimodal
    def pairSet3(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // image (rem 0): the registered n17t rung
    val masked = pairSet3(Dedup.imageDhashPairsTombstoned(spark, sf0001))
    val dead   = Dedup.mediaTombstones(spark, sf0001, 0).collect().map(_.getLong(0)).toSet
    assert(dead.nonEmpty)
    assert(masked.forall { case (a, b, _) => !dead(a) && !dead(b) })
    val scratch = pairSet3(Dedup.dhashPairsFromHashes(
      Multimodal.imageDhashLedger(spark, sf0001).where(!col("media_id").isin(dead.toSeq: _*))))
    assert(masked == scratch && masked.nonEmpty)
    // audio (rem 1) and video (rem 3): the same shared machinery
    Seq(
      (Multimodal.audioHashLedger(spark, sf0001), 1),
      (Multimodal.videoHashLedger(spark, sf0001), 3)
    ).foreach { case (ledger, rem) =>
      val ts = Dedup.mediaTombstones(spark, sf0001, rem)
      val deadIds = ts.collect().map(_.getLong(0)).toSet
      assert(deadIds.nonEmpty, s"rem $rem must tombstone real media")
      val m = pairSet3(Dedup.dhashPairsFromHashes(Dedup.maskedHashLedger(ledger, ts)))
      assert(m.forall { case (a, b, _) => !deadIds(a) && !deadIds(b) })
      assert(m == pairSet3(Dedup.dhashPairsFromHashes(
        ledger.where(!col("media_id").isin(deadIds.toSeq: _*)))))
    }
    // purge: the physically-rewritten ledger needs no mask and answers
    // identically; no tombstoned row survives in the layout
    val out = java.nio.file.Files.createTempDirectory("graft_purge").toString + "/ledger.parquet"
    Dedup.purgeHashLedger(Multimodal.imageDhashLedger(spark, sf0001),
      Dedup.mediaTombstones(spark, sf0001, 0), out)
    val purged = spark.read.parquet(out)
    assert(purged.where(col("media_id").isin(dead.toSeq: _*)).isEmpty)
    assert(pairSet3(Dedup.dhashPairsFromHashes(purged)) == masked)
  }

  test("registered audio/video takedown rungs equal the masked machinery; purge answers identically per modality") {
    import graft.operators.Multimodal
    def pairSet3(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cases = Seq[(String, org.apache.spark.sql.DataFrame, Int, () => org.apache.spark.sql.DataFrame)](
      ("audio", Multimodal.audioHashLedger(spark, sf0001), 1, () => Dedup.audioHashPairsTombstoned(spark, sf0001)),
      ("video", Multimodal.videoHashLedger(spark, sf0001), 3, () => Dedup.videoHashPairsTombstoned(spark, sf0001))
    )
    for ((name, ledger, rem, rung) <- cases) {
      val ts        = Dedup.mediaTombstones(spark, sf0001, rem)
      val dead      = ts.collect().map(_.getLong(0)).toSet
      val registered = pairSet3(rung())
      assert(registered.nonEmpty, s"$name takedown rung must keep real pairs")
      assert(registered.forall { case (a, b, _) => !dead(a) && !dead(b) }, name)
      assert(registered == pairSet3(Dedup.dhashPairsFromHashes(Dedup.maskedHashLedger(ledger, ts))), name)
      // purge: the physically-rewritten ledger needs no mask and answers
      // identically; no tombstoned row survives in the layout
      val out = java.nio.file.Files.createTempDirectory(s"graft_purge_$name").toString + "/ledger.parquet"
      Dedup.purgeHashLedger(ledger, ts, out)
      val purged = spark.read.parquet(out)
      assert(purged.where(col("media_id").isin(dead.toSeq: _*)).isEmpty, name)
      assert(pairSet3(Dedup.dhashPairsFromHashes(purged)) == registered, name)
    }
  }

  test("n19t: a surviving doc whose ONLY partner was taken down recomputes; clean rows read the layout unchanged") {
    import spark.implicits._
    def mk(id: Long, text: String) = (id, text, "en", "t", text.length.toLong)
    val dir = java.nio.file.Files.createTempDirectory("graft_lsstd").toString
    // doc 1's best run (5 tokens) is shared ONLY with doc 13 (13 % 10 == 3
    // -> tombstoned); 1 also shares a 3-token run with doc 2. Docs 21/22
    // share 4 tokens and are untouched. Doc 43 (tombstoned) shares with 44.
    Seq(
      mk(1L, "p q r s t zz1 a b c"),
      mk(13L, "p q r s t zz2"),
      mk(2L, "a b c zz3"),
      mk(21L, "w x y z zz4"),
      mk(22L, "w x y z zz5"),
      mk(43L, "m n o zz6"),
      mk(44L, "m n o zz7")
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val before = Dedup.longestSharedSubstring(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before(1L) == 5L && before(21L) == 4L && before(44L) == 3L)
    val after = Dedup.longestSharedSubstringTombstoned(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!after.contains(13L) && !after.contains(43L), "tombstoned docs must vanish")
    assert(after.get(1L).contains(3L), s"doc 1 must RECOMPUTE down to its surviving 3-token run: $after")
    assert(after.get(2L).contains(3L))
    assert(after.get(21L).contains(4L) && after.get(22L).contains(4L), "untouched rows read the layout")
    assert(!after.contains(44L), "a doc whose only sharer died loses its row entirely")
    // and the masked read equals a from-scratch build over the survivors
    val scratch = Dedup.longestSharedSubstringFrom(
      graft.sources.Tables.documents(spark, dir).where(col("doc_id") % 10 =!= 3), 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == scratch)
  }

  // ---- round-15 band-walk coverage: occupancy caps, refinement, degrade ----

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  /** Brute-force media pairs at Hamming <= 7 over a (media_id, hi, lo) seq. */
  private def bruteDhashPairs(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    (for {
      (a, ahi, alo) <- rows
      (b, bhi, blo) <- rows
      if a < b
      d = java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo)
      if d <= Dedup.DhashHammingMax
    } yield (a, b, d.toLong)).toSet

  /** 300 near-unique hashes with 60 planted near partners (seeded). */
  private def nearUniqueFixture: Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(47)
    val base = (0 until 300).map { i =>
      val v = rnd.nextLong()
      (i.toLong, (v >>> 32) & 0xffffffffL, v & 0xffffffffL)
    }
    val partners = (0 until 60).map { i =>
      val (_, hi, lo) = base(i)
      val v0 = (hi << 32) | lo
      val v = (0 until (1 + rnd.nextInt(7))).foldLeft(v0)((v, _) => v ^ (1L << rnd.nextInt(64)))
      (1000L + i, (v >>> 32) & 0xffffffffL, v & 0xffffffffL)
    }
    base ++ partners
  }

  test("band walk: near-unique fixture at default knobs matches brute force exactly") {
    import spark.implicits._
    val rows = nearUniqueFixture
    val got = Dedup
      .dhashPairsFromHashes(rows.toDF("media_id", "hash_hi", "hash_lo"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == bruteDhashPairs(rows), "default-knob pairs must equal brute force")
  }

  test("band walk: a tiny band_cap forces multi-level refinement and pairs are UNCHANGED") {
    import spark.implicits._
    val rows = nearUniqueFixture
    withConf("graft.dhash.band_cap" -> "4") {
      val stats = scala.collection.mutable.ListBuffer.empty[Dedup.DhashBandLevelStats]
      val (_, _) = Dedup.dhashBandWalk(rows.toDF("media_id", "hash_hi", "hash_lo"), Some(stats))
      assert(stats.head.nHot > 0, s"cap 4 must make level-0 buckets hot: $stats")
      assert(stats.size > 1, s"hot buckets must descend at least one level: $stats")
      val got = Dedup
        .dhashPairsFromHashes(rows.toDF("media_id", "hash_hi", "hash_lo"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == bruteDhashPairs(rows), "refinement must not lose or invent pairs")
    }
  }

  test("band walk: band_depth=1 residual fallback keeps the exact rung exact") {
    import spark.implicits._
    val rows = nearUniqueFixture
    withConf("graft.dhash.band_cap" -> "4", "graft.dhash.band_depth" -> "1") {
      val (_, residual) = Dedup.dhashBandWalk(rows.toDF("media_id", "hash_hi", "hash_lo"))
      assert(!residual.isEmpty, "depth 1 at cap 4 must leave residual hot buckets")
      val got = Dedup
        .dhashPairsFromHashes(rows.toDF("media_id", "hash_hi", "hash_lo"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == bruteDhashPairs(rows), "residual join must preserve exactness")
    }
  }

  test("n21 band degrade: residual hot buckets become explicit 'band' disclosure rows") {
    import spark.implicits._
    // 10 distinct hashes i<<8: bands over bits 8-15 split them (occ 1),
    // every other band bucket holds all 10 — hot at cap 4. All 45 media
    // pairs are true pairs (Hamming <= 4) but every witnessing bucket is
    // hot, so at depth 1 the capped rung's only honest answer is the
    // band-disclosure rows.
    val rows = (0L until 10L).map(i => (i, (i << 8 >>> 32) & 0xffffffffL, (i << 8) & 0xffffffffL))
    val h = rows.toDF("media_id", "hash_hi", "hash_lo")
    withConf("graft.dhash.band_cap" -> "4", "graft.dhash.band_depth" -> "1") {
      val out = Dedup.dhashPairsCappedFromHashes(h, cap = 16L).collect()
      val band = out.filter(_.getString(0) == "band")
      assert(band.nonEmpty, "hot buckets past max depth must surface as 'band' rows")
      assert(band.forall(_.getLong(4) == 45L), s"each residual bucket holds all 10 hashes: ${band.mkString(",")}")
      assert(band.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L), "keeper is the min media id")
      assert(out.forall(r => Set("pair", "group", "xgroup", "band")(r.getString(0))))
      // bounded: one row per residual bucket, never a quadratic expansion
      assert(out.length <= 8, s"output must stay bucket-bounded: ${out.length}")
    }
    // at default knobs the same fixture expands fully and conserves n_pairs
    val dflt = Dedup.dhashPairsCappedFromHashes(h, cap = 100L).collect()
    assert(!dflt.exists(_.getString(0) == "band"), "no band rows at default knobs")
    assert(dflt.map(_.getLong(4)).sum == 45L, "n_pairs conservation holds when no band rows")
  }
}
