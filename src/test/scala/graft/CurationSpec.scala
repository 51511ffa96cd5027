package graft

import graft.operators.Curation
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation operators: global ids, sequence packing, decontamination,
  * mixture sampling. Each case pins the operator against an independent
  * formulation (window-based ids, per-group replay of the packing rule,
  * string-shingle overlap, exact hash-threshold recount) on sf0.001.
  */
class CurationSpec extends SparkSpec {

  test("g1: ids are a permutation of 0..n-1 in (source, doc_id) order") {
    val got = Curation.globalIds(spark, sf0001).collect()
    val n   = got.length
    assert(n > 0)
    assert(got.map(_.getLong(0)).toSeq == (0L until n.toLong))
    // the id order must agree with the lexicographic (source, doc_id) order
    val keys = got.map(r => (r.getString(2), r.getLong(1)))
    assert(keys.toSeq == keys.toSeq.sorted)
    // and agree with the single-partition window formulation it replaces
    val windowed = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .select(
        (row_number().over(Window.orderBy("source", "doc_id")) - 1).cast("long").as("global_id"),
        col("doc_id"),
        col("source")
      )
      .orderBy("global_id")
      .collect()
    assert(got.toSeq == windowed.toSeq)
  }

  test("p2: pack assignment replays the concat-and-chunk rule per source") {
    val rows = Curation.sequencePack(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_.getLong(1)).foreach { r =>
        val expected = cum / Curation.PackBudget
        assert(r.getLong(3) == expected, s"doc ${r.getLong(1)}")
        cum += r.getLong(2)
      }
    }
    // budget chosen so the test corpus actually produces multiple packs
    assert(rows.map(_.getLong(3)).max >= 2)
  }

  test("d8: hashed-index counts equal string-shingle overlap counts") {
    val got = Curation
      .decontaminate(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // independent recount over shingle STRINGS (no xxhash64 in the loop)
    val sh = graft.operators.Dedup
      .shingles(spark.read.parquet(s"$sf0001/documents.parquet"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bench = sh.filter(_._1 % 50 == 0)
    val byShingle = bench.groupBy(_._2).map { case (s, rs) => (s, rs.map(_._1).toSet) }
    val want = sh
      .filter(_._1 % 50 != 0)
      .groupBy(_._1)
      .flatMap { case (id, rs) =>
        val hits = rs.map(_._2).filter(byShingle.contains)
        if (hits.isEmpty) None
        else Some((id, hits.flatMap(byShingle).toSet.size.toLong, hits.toSet.size.toLong))
      }
      .toSeq
      .sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("d9: kept counts match an exact recount and land near target rates") {
    val got = Curation.mixtureSample(spark, sf0001).collect()
    assert(got.length == 20)
    val docs = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val thr = Curation.MixtureRates.toMap
    got.foreach { r =>
      val (src, total, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      val ids  = docs.filter(_._2 == src)
      val want = ids.count { case (id, _) =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString).substring(0, 4) < thr(src)
      }
      assert(total == ids.length)
      assert(kept == want, s"source $src")
    }
    // 100%-rate sources keep everything; 6.25% sources keep strictly less
    val full = got.filter(r => (0 until 5).map(i => s"src$i").contains(r.getString(0)))
    assert(full.forall(r => r.getLong(1) == r.getLong(2)))
    val sparse = got.filter(r => (15 until 20).map(i => s"src$i").contains(r.getString(0)))
    assert(sparse.forall(r => r.getLong(2) < r.getLong(1) / 2))
  }

  test("d10: exactly k docs per source, deterministic, hash-rank verified") {
    val got = Curation.stratifiedSample(spark, sf0001, k = 5).collect()
    val bySource = got.groupBy(_.getString(0))
    assert(bySource.size == 20 && bySource.values.forall(_.length == 5))
    // the selected ids are exactly the 5 smallest md5-hex per source
    val docs = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    bySource.foreach { case (src, rows) =>
      val want = docs
        .filter(_._2 == src)
        .map(_._1)
        .sortBy(id => (org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString), id))
        .take(5)
      assert(rows.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq == want.toSeq, s"source $src")
    }
  }

  test("d11: vocab top-k matches a local token recount") {
    // the synthetic corpus has a deliberately tiny vocabulary (~31 tokens) —
    // sample INSIDE it so the k cut is actually exercised
    val got = graft.operators.TextAnalysis.vocabTopK(spark, sf0001, k = 20).collect()
    assert(got.length == 20)
    val counts = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .select("text")
      .collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }
    val want = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == want)
  }

  test("p3: chunking replays the sliding-window rule; overlap and clamping correct") {
    val rows = Curation
      .chunkDocuments(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    val texts = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == texts.keySet, "every doc chunks")
    byDoc.foreach { case (id, cs) =>
      val toks = texts(id).split(" ", -1)
      val want = (0 until toks.length by Curation.ChunkStride).zipWithIndex.map { case (s, i) =>
        (i.toLong, toks.slice(s, s + Curation.ChunkTokens).mkString(" "))
      }
      assert(cs.sortBy(_._2).map(c => (c._2, c._3)).toSeq == want, s"doc $id")
    }
    // overlap: consecutive chunks share chunk−stride tokens when full-width
    val full = rows.filter(_._3.split(" ", -1).length == Curation.ChunkTokens)
    assert(full.nonEmpty, "corpus has full-width chunks")
  }

  test("d12: decile assignment matches a local ntile replay per source") {
    val got = Curation.lengthDeciles(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val n      = rows.length
      val sorted = rows.sortBy(r => (-r.getLong(2), r.getLong(1)))
      // ntile semantics: first (n % 10) tiles get ceil(n/10), rest floor
      val base = n / 10
      val big  = n % 10
      var idx  = 0
      (1 to 10).foreach { tile =>
        val size = base + (if (tile <= big) 1 else 0)
        (0 until size).foreach { _ =>
          assert(sorted(idx).getLong(3) == tile.toLong, s"row $idx expected tile $tile")
          idx += 1
        }
      }
      assert(idx == n)
    }
  }

  test("s7: ann hits enriched with the matching document's metadata") {
    val s3 = graft.operators.Similarity
      .annBatchTopK(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val s7 = graft.operators.Similarity.annWithMetadata(spark, sf0001).collect()
    assert(s7.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == s3.toSeq)
    val docs = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "n_chars")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    s7.foreach { r =>
      val (src, nc) = docs(r.getLong(2))
      assert(r.getString(3) == src && r.getLong(4) == nc)
    }
  }

  test("t1: posting intersection equals the scan-and-filter baseline") {
    import org.apache.spark.sql.functions.{array_contains, split => fsplit, col => fcol}
    val terms = graft.operators.TextAnalysis.KeywordTerms
    val got = graft.operators.TextAnalysis
      .keywordSearch(spark, sf0001, terms)
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(got.nonEmpty)
    val scan = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .where(terms.map(t => array_contains(fsplit(fcol("text"), " "), t)).reduce(_ && _))
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .sorted
      .toSeq
    assert(got == scan)
    // a term absent from the corpus empties the result (AND semantics)
    val none = graft.operators.TextAnalysis
      .keywordSearch(spark, sf0001, terms :+ "zzz_not_a_token")
      .collect()
    assert(none.isEmpty)
    // a repeated term must not change the answer (postings are distinct)
    val dup = graft.operators.TextAnalysis
      .keywordSearch(spark, sf0001, terms :+ terms.head)
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(dup == got)
  }

  test("d9 rows: kept set is deterministic across runs and matches summary") {
    val a = Curation.mixtureSampleRows(spark, sf0001).collect().toSeq
    val b = Curation.mixtureSampleRows(spark, sf0001).collect().toSeq
    assert(a == b)
    val perSource = a.groupBy(_.getString(1)).map { case (s, rs) => (s, rs.length.toLong) }
    val summary = Curation
      .mixtureSample(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .toMap
    summary.foreach { case (s, kept) => assert(perSource.getOrElse(s, 0L) == kept) }
  }

  test("p4: span rows conserve tokens, fill packs exactly, and agree with p2's start pack") {
    val spans = Curation.packSpans(spark, sf0001).collect()
    val p2 = Curation
      .sequencePack(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // per-document conservation: the span rows sum back to n_tokens, and
    // the doc's FIRST pack is exactly p2's start-pack assignment
    val bySrcDoc = spans.groupBy(r => (r.getString(0), r.getLong(1)))
    bySrcDoc.foreach { case (key, rows) =>
      val (nTokens, startPack) = p2(key)
      assert(rows.map(_.getLong(3)).sum == nTokens, s"$key token conservation")
      assert(rows.map(_.getLong(2)).min == startPack, s"$key start pack")
      // a doc's packs are contiguous
      val packs = rows.map(_.getLong(2)).sorted
      assert(packs.zip(packs.tail).forall { case (a, b) => b == a + 1 }, s"$key contiguity")
    }
    // per-(source, pack) fill: every pack except the last of its source
    // carries exactly PackBudget tokens — the "concat and chunk" invariant
    spans.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val fill = rows
        .groupBy(_.getLong(2))
        .map { case (p, rs) => (p, rs.map(_.getLong(3)).sum) }
      val last = fill.keys.max
      fill.foreach { case (p, tot) =>
        if (p != last) assert(tot == Curation.PackBudget, s"$src pack $p fill")
        else assert(tot >= 1 && tot <= Curation.PackBudget, s"$src last pack fill")
      }
    }
    assert(spans.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= Curation.PackBudget))
  }

  test("p5: a true permutation, deterministic across runs, matching a local md5 replay") {
    val a = Curation.shuffleOrder(spark, sf0001).collect().map(r => (r.getLong(0), r.getLong(1)))
    // positions are exactly 0..n−1, each id exactly once
    assert(a.map(_._1).sorted.toSeq == (0L until a.length.toLong))
    assert(a.map(_._2).distinct.length == a.length)
    // retry/rerun stability — the property rand() cannot give
    val b = Curation.shuffleOrder(spark, sf0001).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
    // the order is the md5 order, replayed test-side
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = a.map(_._2).sortBy(id => (md5hex(id.toString), id)).toSeq
    assert(a.sortBy(_._1).map(_._2).toSeq == expect)
    // and it actually shuffles: not the identity order
    assert(a.sortBy(_._1).map(_._2).toSeq != a.map(_._2).sorted.toSeq)
  }

  test("p8: a within-block permutation — displacement bounded, blocks dense, order is the md5 order per block") {
    val b = Curation.ShuffleBlockDocs
    val rows = Curation.blockShuffleOrder(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // every doc stays inside its own block: pos div B == id div B == block_id
    assert(rows.forall { case (pos, blk, id) => pos / b == blk && id / b == blk })
    // positions are a permutation (dense ids ⇒ dense positions)
    assert(rows.map(_._1).sorted.toSeq == rows.map(_._3).sorted.toSeq)
    // per-block order replays the md5 rule locally
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.groupBy(_._2).foreach { case (_, blockRows) =>
      val gotOrder = blockRows.sortBy(_._1).map(_._3).toSeq
      assert(gotOrder == blockRows.map(_._3).sortBy(id => (md5hex(id.toString), id)).toSeq)
    }
    // it shuffles within at least one block (not the identity)
    assert(rows.sortBy(_._1).map(_._3).toSeq != rows.map(_._3).sorted.toSeq)
  }

  test("d32: verbatim inclusion flags; all-trigrams-but-scrambled passes the pre-filter yet fails verify") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_subdecon").toString
    // bench doc 0's needle = its 24-char prefix: "the quick brown fox jump"
    val needle = "the quick brown fox jump"
    assert(needle.length == Curation.NeedleChars)
    // doc 2 carries EVERY trigram of the needle (two overlapping halves,
    // reordered) but never the contiguous needle — the candidate the
    // trigram pre-filter admits and the exact contains verify must reject
    val scrambled = needle.substring(12) + "ZZZ" + needle.substring(0, 14)
    Seq(
      (0L, needle + "s over the lazy dog", "en", "bench", 1L),
      (1L, "PRE " + needle + "s END", "en", "t", 1L),
      (2L, scrambled, "en", "t", 1L),
      (3L, "nothing related here at all", "en", "t", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.substringDecontaminate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L)))
  }

  test("p9: round-robin across live sources; per-source order is the md5 rank; permutation") {
    val rows = Curation.sourceInterleaveOrder(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    // permutation of the corpus
    assert(rows.map(_._3).distinct.length == rows.length)
    // while every source is live, each window of n_sources positions
    // carries each source exactly once (round-robin batch diversity)
    val bySource = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val nSources = bySource.size
    val liveRounds = bySource.values.min
    rows.take(liveRounds * nSources).grouped(nSources).foreach { w =>
      assert(w.map(_._2).toSet.size == nSources, s"window not diverse: ${w.map(_._2).toSeq}")
    }
    // per-source relative order replays the p5 md5 rule
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.groupBy(_._2).values.foreach { src =>
      val inEpoch = src.sortBy(_._1).map(_._3).toSeq
      assert(inEpoch == src.map(_._3).sortBy(id => (md5hex(id.toString), id)).toSeq)
    }
  }

  test("d20 bloom decontamination == d8 exactly; plan probes the bloom before joining") {
    val d8 = graft.operators.Curation.decontaminate(spark, sf0001).collect().map(_.toSeq).toSeq
    val d20 = graft.operators.Curation.decontaminateBloom(spark, sf0001)
    val plan = d20.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n${plan.take(1500)}")
    assert(d20.collect().map(_.toSeq).toSeq == d8)
    assert(d8.nonEmpty)
  }

  test("d22: planted geometry — identical vector wins argmax, count honors the threshold, ties break low") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_semdecon").toString
    // bench = ids 0, 50 (the %50 rule); 4-dim hand-checkable geometry
    val v0 = Array(1f, 0f, 0f, 0f)
    val v50 = Array(0f, 1f, 0f, 0f)
    Seq(
      (0L, v0, 0), (50L, v50, 0),
      (1L, Array(0f, 1f, 0f, 0f), 0),   // = v50: cos(b50)=1, cos(b0)=0 → nearest 50, n_close 1
      (2L, Array(0f, 0f, 1f, 0f), 0),   // ⊥ both: cos 0 each → tie at 0 → nearest = min id 0, n_close 0
      (3L, Array(1f, 1f, 0f, 0f), 0),   // cos 1/√2 ≈ .707 to both → tie above τ → nearest 0, n_close 2
      (4L, Array(-1f, 0f, 0f, 0f), 0)   // cos(b0) = −1, cos(b50) = 0 → nearest 50, n_close 0
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.Curation.decontaminateSemantic(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> (50L, 1L), 2L -> (0L, 0L), 3L -> (0L, 2L), 4L -> (50L, 0L)))
  }

  test("d22: full plain-Scala replay on the real corpus (same fold order, same tie rule)") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1 }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val bench = vecs.filter(_._1 % 50 == 0)
    val expect = vecs.filter(_._1 % 50 != 0).map { case (id, v) =>
      val scored = bench.toSeq.map { case (bid, bv) => (bid, cos(v, bv)) }
      val nearest = scored.minBy { case (bid, c) => (-c, bid) }._1
      (id, nearest, scored.count(_._2 >= 0.5).toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.operators.Curation.decontaminateSemantic(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == expect)
  }

  test("d23: no near-dup cluster straddles the split; rule replays; full doc coverage") {
    val rows = Curation.splitByCluster(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.length.toLong == docs) // a verdict for EVERY document
    // the point of the op: each cluster key maps to exactly one split
    rows.groupBy(_.getLong(1)).foreach { case (key, members) =>
      assert(members.map(_.getString(2)).distinct.length == 1, s"cluster $key straddles")
    }
    // the split rule is the committed md5-prefix threshold, exactly
    rows.foreach { r =>
      val want = if (md5Hex(r.getLong(1).toString).substring(0, 1) < "4") "holdout" else "train"
      assert(r.getString(2) == want, s"doc ${r.getLong(0)}")
    }
    // clustered docs inherit the representative's hash, NOT their own:
    // some non-representative member must differ from its id-hash split
    // (otherwise this test could pass with split-by-doc_id)
    val clustered = rows.filter(r => r.getLong(0) != r.getLong(1))
    assert(clustered.nonEmpty, "corpus has no near-dup clusters; planted dups missing")
    val splits = rows.map(_.getString(2)).distinct
    assert(splits.toSet == Set("train", "holdout"))
  }

  test("d23: splitting by doc_id WOULD leak on this corpus; cluster split never does") {
    val rows = Curation.splitByCluster(spark, sf0001).collect()
    val byDocId = rows.map(r => r.getLong(0) -> (md5Hex(r.getLong(0).toString).substring(0, 1) < "4"))
      .toMap
    // at least one cluster whose members' OWN id-hashes disagree — the
    // leak d23 exists to prevent is real on this corpus, not hypothetical
    val leakyClusters = rows
      .groupBy(_.getLong(1))
      .filter { case (_, ms) => ms.length > 1 && ms.map(m => byDocId(m.getLong(0))).distinct.length > 1 }
    assert(leakyClusters.nonEmpty, "no cluster would leak under id-hash; weaken of the test corpus")
  }

  test("d24: counts follow the factor table; keys unique; copies scatter") {
    val rows = Curation.mixtureEpochs(spark, sf0001).collect()
    val factors = Curation.EpochFactors.toMap
    val docs = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    // exact expansion: every doc appears exactly reps(source) times, with
    // epochs 0..reps-1 each exactly once
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, copies) =>
      val reps = factors(docs(id))
      assert(copies.map(_.getLong(2)).sorted.toSeq == (0L until reps.toLong), s"doc $id")
    }
    // shuffle keys are unique (a permutation key, not a bucket) and replay
    // the committed md5 rule
    assert(rows.map(_.getString(3)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getString(3) == md5Hex(s"${r.getLong(0)}:${r.getLong(2)}"))
    }
    // copies of one doc scatter: for some doc the sort-order neighbors of
    // its copies differ (keys aren't clustered by doc)
    val sorted = rows.sortBy(_.getString(3)).map(_.getLong(0))
    val adjacentSameDoc = sorted.sliding(2).count { case Array(a, b) => a == b; case _ => false }
    assert(adjacentSameDoc < rows.length / 10, "epoch copies cluster together in key order")
  }

  test("p6: phases quarter the scored corpus best-first; intra-phase order replays the md5 rule") {
    val rows = Curation.curriculumOrder(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    // exactly the scored docs appear (d21's contract: < 2 tokens → no score)
    val scored = graft.operators.TextAnalysis.bigramLmScore(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_._2).toSet == scored.keySet)
    // phases partition into (near-)quarters, phase 1 holds the best scores:
    // every phase-1 score >= every phase-4 score, monotone across phases
    val byPhase = rows.groupBy(_._1).view.mapValues(_.map(v => scored(v._2))).toMap
    assert(byPhase.keySet == Set(1, 2, 3, 4))
    for (p <- 1 to 3)
      assert(byPhase(p).min >= byPhase(p + 1).max,
        s"phase $p scores must dominate phase ${p + 1}")
    val sizes = byPhase.view.mapValues(_.size).toMap
    val n     = rows.length
    sizes.values.foreach(s => assert(math.abs(s - n / 4.0) <= n / 8.0 + 2, s"lopsided phases: $sizes"))
    // intra-phase order is exactly the md5(doc_id#curriculum) permutation
    rows.groupBy(_._1).foreach { case (_, ph) =>
      val got = ph.map(_._2).toSeq
      val expect = ph.sortBy(v => (v._3, v._2)).map(_._2).toSeq
      assert(got == expect, "output order must follow (order_key, doc_id) within a phase")
    }
    // and the key column replays Scala-side md5
    rows.take(20).foreach { case (_, id, key) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#curriculum".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(key == md)
    }
  }

  test("d30: each source keeps exactly the longest doc_id-prefix within budget, nothing else") {
    val got = Curation.tokenBudgetMixture(spark, sf0001).collect()
    assert(got.nonEmpty)
    // independent replay: per-source driver-side greedy prefix over d1's
    // token counts in doc_id order
    val toks = graft.sources.Tables
      .documents(spark, sf0001)
      .select(col("source"), col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = toks
      .groupBy(_._1)
      .toSeq
      .flatMap { case (src, rows) =>
        var cum = 0L
        rows.sortBy(_._2).takeWhile { case (_, _, n) => cum += n; cum <= Curation.MixtureBudgetTokens }
          .map { case (_, id, _) => (src, id) }
      }
      .toSet
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSet == want)
    // the cut genuinely bites: at least one source dropped at least one doc
    assert(got.length < toks.length)
    // cum_tokens is the true running sum (spot-check via per-row n_tokens)
    val bySrc = got.groupBy(_.getString(0))
    for ((_, rows) <- bySrc) {
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(2)).sum == sorted.last.getLong(3))
    }
  }

  test("p7: batches cut every 8 docs per band, padding ledger recounts, corpus fully accounted") {
    val got = Curation.lengthBucketedBatches(spark, sf0001).collect()
    assert(got.nonEmpty)
    val nDocs = graft.sources.Tables.documents(spark, sf0001).count()
    assert(got.map(_.getLong(2)).sum == nDocs, "every document lands in exactly one batch")
    // every batch is full (8) except possibly the last of each band
    for ((_, rows) <- got.groupBy(_.getLong(0))) {
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.init.forall(_.getLong(2) == Curation.BatchDocs))
      assert(sorted.last.getLong(2) <= Curation.BatchDocs)
      // batch ids are consecutive from 0
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length.toLong))
    }
    // the band invariant: a batch's longest member still lies in its band,
    // so intra-batch padding is bounded by the band width
    assert(got.forall(r => r.getLong(3) / Curation.BucketTokens == r.getLong(0)))
    assert(got.forall(r => r.getLong(4) >= 0 && r.getLong(4) < Curation.BatchDocs * Curation.BucketTokens))
  }

  test("d25: verdicts replay from d8-consistent counts over string shingles") {
    val rows = Curation.contaminationGate(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // independent recount over shingle STRINGS
    val sh = graft.operators.Dedup
      .shingles(spark.read.parquet(s"$sf0001/documents.parquet"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bench = sh.filter(_._1 % 50 == 0).map(_._2).toSet
    val expect = sh
      .filter(_._1 % 50 != 0)
      .groupBy(_._1)
      .map { case (id, ss) =>
        val n   = ss.length.toLong
        val hit = ss.count(s => bench.contains(s._2)).toLong
        (id, (n, hit, if (hit * Curation.ContaminationShareDen >= n * Curation.ContaminationShareNum) "drop" else "keep"))
      }
    val got = rows.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expect)
    // the gate must produce BOTH verdicts on the planted corpus: near-dups
    // of bench docs drop, the background keeps
    assert(rows.map(_.getString(3)).toSet == Set("keep", "drop"))
    // consistency with d8's report: every doc d8 lists has n_hit > 0 here
    val d8docs = Curation.decontaminate(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(d8docs.subsetOf(got.filter(_._2._2 > 0).keySet))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
}
