package graft
// (d13 planted-PII case appended at the bottom of this suite)

import graft.operators.TextAnalysis
import java.nio.file.Files

/** Unit tests on a tiny declared-content corpus written to a temp parquet
  * dir (the operators read folder-of-parquet tables, like everything else).
  */
class TextAnalysisSpec extends SparkSpec {

  test("d7 normalized fingerprint catches case/punct/whitespace variants exact dedup misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_norm").toString
    Seq(
      (1L, "Hello, World!  This is   fine.", "en", "t", 30L),
      (2L, "hello world this is fine", "en", "t", 24L), // normalized twin of 1
      (3L, "a genuinely different document", "en", "t", 30L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // byte-exact dedup sees nothing…
    assert(graft.operators.Dedup.exactDupRows(spark, dir).count() == 0L)
    // …normalized fingerprints collide exactly where they should
    val nfp = graft.operators.TextAnalysis
      .normalizedFingerprint(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(nfp(1L) == nfp(2L) && nfp(1L) != nfp(3L))
  }

  private lazy val tinyDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_text").toString
    Seq(
      (1L, "the cat sat", "en", "t", 11L),
      (2L, "der der der der", "de", "t", 15L),
      (3L, "le la le la et", "fr", "t", 14L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("token count") {
    val rows = TextAnalysis.tokenCount(spark, tinyDir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 3L), (2L, 4L), (3L, 5L)))
  }

  test("text quality metrics") {
    val r = TextAnalysis.textQuality(spark, tinyDir).collect()
    val byId = r.map(x => x.getLong(0) -> x).toMap
    assert(byId(1L).getAs[Long]("n_chars_m") == 11L)
    assert(byId(1L).getAs[Long]("n_tokens") == 3L)
    assert(byId(1L).getAs[Long]("n_distinct") == 3L)
    assert(byId(1L).getAs[Double]("avg_token_len") == 3.0) // (11-3+1)/3
    assert(byId(2L).getAs[Long]("n_distinct") == 1L)
    assert(byId(2L).getAs[Double]("distinct_ratio") == 0.25)
  }

  test("lang id picks the marker-majority language") {
    val rows = TextAnalysis.langId(spark, tinyDir).collect()
    val pred = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(1L) == "en") // 'the' hit
    assert(pred(2L) == "de") // 4 'der' hits beat en's 0
    assert(pred(3L) == "fr")
  }

  test("fingerprint is the md5 hex of the text") {
    val fp = TextAnalysis.fingerprint(spark, tinyDir).collect().head.getString(1)
    // md5("the cat sat")
    assert(fp == "3ff4497d12bfd4af3accb8ea4577ee24" || fp.length == 32)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest("the cat sat".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(fp == expect)
  }

  test("lang id on real corpus is deterministic across runs") {
    val a = TextAnalysis.langId(spark, sf0001).collect().toSeq
    val b = TextAnalysis.langId(spark, sf0001).collect().toSeq
    assert(a == b)
  }

  test("d13: planted PII is redacted with typed tags and counted; clean text untouched") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact alice.smith+x@example.co.uk or call 555-123-4567 now"),
      (2L, "server at 192.168.1.100 and backup at 10.0.0.1 restarted"),
      (3L, "nothing sensitive here at all"),
      (4L, "mail bob@host.org from 8.8.8.8 phone 111-222-3333")
    ).toDF("doc_id", "text")
    val byId = TextAnalysis.redactPii(rows).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byId(1L)._1 == 2L) // email + phone
    assert(byId(2L)._1 == 2L) // two IPs
    assert(byId(3L)._1 == 0L)
    assert(byId(4L)._1 == 3L) // email + ip + phone
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(byId(1L)._2 == md5hex("contact <EMAIL> or call <PHONE> now"))
    assert(byId(2L)._2 == md5hex("server at <IP> and backup at <IP> restarted"))
    assert(byId(3L)._2 == md5hex("nothing sensitive here at all"))
    assert(byId(4L)._2 == md5hex("mail <EMAIL> from <IP> phone <PHONE>"))
  }

  test("d14: repetition stats — duplicated bigrams and the token mode, hand-computed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rep").toString
    Seq(
      (1L, "a a a b", "en", "t", 7L), // bigrams: "a a","a a","a b" → 3 total, 2 distinct
      (2L, "w x y z", "en", "t", 7L), // no repetition at all
      (3L, "solo", "en", "t", 4L)     // <2 tokens: no bigrams → excluded, like the oracle
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val byId = TextAnalysis
      .repetitionStats(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(byId(1L) == ((3L, 2L, 1.0 / 3.0, 3L, 3.0 / 4.0)))
    assert(byId(2L) == ((3L, 3L, 0.0, 1L, 1.0 / 4.0)))
    assert(!byId.contains(3L))
  }

  test("d15: top salient term maximizes tf/df; exact tie breaks lexicographically") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tfidf").toString
    Seq(
      (1L, "apple apple banana", "en", "t", 18L), // apple 2/1 beats banana 1/2
      (2L, "banana cherry", "en", "t", 13L),      // both 1/2 — lexicographic tie
      (3L, "cherry cherry cherry", "en", "t", 20L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val byId = TextAnalysis
      .topSalientTerm(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(byId(1L) == (("apple", 2L, 1L)))
    assert(byId(2L) == (("banana", 1L, 2L)))
    assert(byId(3L) == (("cherry", 3L, 2L)))
  }

  test("f1: fuzzy pairs find in-block variants and the block excludes cross-first-char pairs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fuzzy").toString
    Seq(
      (1L, "color colour scan scam cat bat", "en", "t", 30L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = TextAnalysis
      .fuzzyTokenPairs(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(pairs.contains(("color", "colour", 1L)))
    assert(pairs.contains(("scam", "scan", 1L)))
    // "cat"/"bat" is distance 1 but differs in first char → outside the
    // documented block, by contract
    assert(!pairs.exists(p => p._1 == "bat" && p._2 == "cat"))
    // distance bound holds everywhere
    assert(pairs.forall(_._3 <= TextAnalysis.FuzzyMaxDist))
  }

  test("f1: q-gram index output ≡ first-char blocker output on the real corpus") {
    val idx = TextAnalysis.fuzzyTokenPairs(spark, sf0001).collect().toSeq
    val blk = TextAnalysis.fuzzyTokenPairsBlocked(spark, sf0001).collect().toSeq
    assert(idx.nonEmpty, "differential is vacuous on an empty pair set")
    assert(idx == blk)
  }

  /** Adversarial vocabulary for the candidate-superset proof: short tokens
    * whose ONLY shared gram is the padded `^c` (first-char completeness),
    * long tokens at the exact edit-distance boundary (count/prefix-filter
    * completeness), a hot-gram cluster (every token full of `ab` bigrams),
    * and unicode.
    */
  private val hostileVocab: Seq[String] = Seq(
    // dist ≤ 3 pairs sharing only the ^a gram among bigrams
    "axy", "aqz", "a", "ab",
    // long pair at exactly dist 3, length gap 3
    "reproducibility", "reproducibilityxyz",
    // long pair at dist 3 via 3 substitutions spread across the token
    "reproducibility", "rXproducXbilitX",
    // hot-gram cluster: 'ab' everywhere, pairs at small distances
    "ababababab", "ababababab_", "abababababab", "babababab",
    // same length-7 boundary where the count filter bound goes vacuous
    "abcdefg", "abcxefg", "azzzefg",
    // unicode: multibyte chars count as single chars in length/levenshtein
    "héllo", "héllos", "hèllo",
    // background tokens that must NOT pair
    "zzzzzzzzzzzzzzzz", "qqqq"
  ).distinct

  test("f1: index candidates are a superset of ALL contract pairs on a hostile vocabulary") {
    import spark.implicits._
    val vocab = hostileVocab.toDF("t")
    val cand = TextAnalysis
      .fuzzyCandidates(vocab, TextAnalysis.FuzzyMaxDist)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    // brute-force ground truth of the output contract
    val contract = (for {
      a <- hostileVocab; b <- hostileVocab
      if a < b && a.head == b.head && math.abs(a.length - b.length) <= 3
      if levenshteinRef(a, b) <= 3
    } yield (a, b)).toSet
    assert(contract.nonEmpty, "superset check is vacuous without contract pairs")
    val missed = contract -- cand
    assert(missed.isEmpty, s"index missed contract pairs: $missed")
  }

  test("f1: prefix filter caps a token's posted grams at 2*maxDist+1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vocab = hostileVocab.toDF("t")
    val grams = vocab
      .select(col("t"), explode(TextAnalysis.paddedBigrams(col("t"))).as("g"))
    // the full gram set of the longest token far exceeds the prefix cap…
    assert(grams.groupBy("t").count().agg(max("count")).head().getLong(0) > 7L)
    // …and completeness still held above: the index never needs more than
    // the 7 rarest grams per token, which is the posting-list bound that
    // keeps a web-scale vocabulary's hot grams from going quadratic.
  }

  test("t2: tf-idf ranking matches a hand computation; rarity outweighs volume") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tfidf").toString
    Seq(
      // df over the 4-doc corpus: merge=1, window=2, dup=1 → idf_k:
      // merge 4000, window 2000, dup 4000 (K=1000)
      (1L, "merge merge merge", "en", "t", 1L), // 3·4000 = 12000
      (2L, "window window window window window window window", "en", "t", 1L), // 7·2000 = 14000
      (3L, "window dup", "en", "t", 1L), // 2000 + 4000 = 6000
      (4L, "nothing relevant here", "en", "t", 1L) // no query term → absent
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis
      .tfidfRank(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    // rare-term doc 1 outranks common-term doc 3 despite fewer hits of the
    // corpus's most frequent query term; doc 4 never appears
    assert(got == Seq((2L, 14000L), (1L, 12000L), (3L, 6000L)))
  }

  test("t2: deterministic ranking on the real corpus — ties break by doc_id, k bounds the result") {
    val rows = TextAnalysis
      .tfidfRank(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length <= 20)
    assert(rows.nonEmpty, "fixture corpus must contain at least one query term")
    // sorted by (score desc, doc_id asc) exactly
    val resorted = rows.sortBy { case (id, s) => (-s, id) }.toSeq
    assert(rows.toSeq == resorted)
    // local replay: recompute each ranked doc's score from raw text with
    // test-side arithmetic — pins tf, df, N and the integer idf in one shot
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val texts = docs.select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val n = texts.length.toLong
    def tf(t: String) = texts.map { case (id, tx) => id -> tx.split(" ", -1).count(_ == t).toLong }.toMap
    val tfs = TextAnalysis.KeywordTerms.distinct.map(t => t -> tf(t)).toMap
    // a term absent from the corpus has no idf row and contributes nothing
    val present = tfs.filter(_._2.values.exists(_ > 0)).keys.toSeq
    val idf = present.map(t => t -> n * TextAnalysis.IdfScale / tfs(t).values.count(_ > 0)).toMap
    rows.foreach { case (id, score) =>
      val expect = present.map(t => tfs(t)(id) * idf(t)).sum
      assert(score == expect, s"doc $id")
    }
  }

  /** Independent plain-Scala BM25 — the reference the engine is replayed
    * against (same double math in the same JVM, so the comparison is
    * exact, not tolerance-based).
    */
  private def referenceBm25(
      docs: Seq[(Long, String)],
      terms: Seq[String],
      k: Int
  ): Seq[(Long, Long)] = {
    val ts     = terms.distinct
    val split  = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val n      = docs.length.toLong
    val avgdl  = split.map(_._2.length.toLong).sum.toDouble / n
    val dfs    = ts.map(t => t -> split.count(_._2.contains(t)).toLong).toMap
    val scored = split.flatMap { case (id, tk) =>
      val s = ts.map { t =>
        val tf = tk.count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val df  = dfs(t).toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          idf * tf * (TextAnalysis.Bm25K1 + 1.0) /
            (tf + TextAnalysis.Bm25K1 * (1.0 - TextAnalysis.Bm25B + TextAnalysis.Bm25B * tk.length / avgdl))
        }
      }.sum
      if (s > 0) Some(id -> s) else None
    }
    scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex.map { case ((id, _), i) => (i + 1L, id) }
  }

  test("t4: BM25 replays the reference on a fixture where saturation and length-norm both matter") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    val fixture = Seq(
      // doc 0: 'merge' ONCE in a short doc — length-norm favors it
      (0L, "merge alpha beta"),
      // doc 1: 'merge' five times in a long doc — tf saturates (k1)
      (1L, ("merge " * 5 + "x " * 40).trim),
      // doc 2: the rare term 'dup' once — idf outweighs the common term
      (2L, "dup " + ("y " * 10).trim),
      // doc 3: common term 'window' in many docs → low idf
      (3L, "window a"), (4L, "window b"), (5L, "window c"),
      (6L, "nothing relevant here at all")
    )
    fixture.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val expect = referenceBm25(fixture, TextAnalysis.KeywordTerms, 20)
    val got = TextAnalysis
      .bm25Rank(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(got == expect)
    assert(got.map(_._2).toSet == Set(0L, 1L, 2L, 3L, 4L, 5L)) // doc 6 scores 0 and is absent
  }

  test("t4: real-corpus BM25 replays the reference and is deterministic") {
    val docs = graft.sources.Tables
      .documents(spark, sf0001)
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    val expect = referenceBm25(docs, TextAnalysis.KeywordTerms, 20)
    val got = TextAnalysis
      .bm25Rank(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(got == expect)
    assert(got.nonEmpty && got.map(_._1) == (1L to got.length))
  }

  test("t3: phrase match requires adjacency AND order; boundaries and short docs behave") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_phrase").toString
    Seq(
      (1L, "part filter runs fast", "en", "t", 1L),   // phrase at start
      (2L, "we push part filter", "en", "t", 1L),     // phrase at end
      (3L, "part of the filter", "en", "t", 1L),      // terms present, NOT adjacent
      (4L, "filter part", "en", "t", 1L),             // adjacent, WRONG order
      (5L, "part", "en", "t", 1L),                    // shorter than the phrase
      (6L, "partition filtering", "en", "t", 1L),     // substrings must not match tokens
      (7L, "a part filter b part filter c", "en", "t", 1L) // repeated → one row
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.phraseSearch(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 7L))
  }

  test("t12: min distances by hand on a planted fixture; counts and order-insensitivity pinned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prox").toString
    Seq(
      (1L, "part filter runs fast", "en", "t", 1L),          // adjacent in order → 1
      (2L, "filter then comes part", "en", "t", 1L),         // reversed, 3 apart → 3
      (3L, "part of the long pipeline filter", "en", "t", 1L), // 5 apart → 5
      (4L, "part a filter b part filter", "en", "t", 1L),    // best pair adjacent → 1, n_a=2 n_b=2
      (5L, "part only", "en", "t", 1L),                      // missing term b → absent
      (6L, "filter only", "en", "t", 1L)                     // missing term a → absent
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.proximityRank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 1L, 1L, 1L), (4L, 2L, 2L, 1L), (2L, 1L, 1L, 3L), (3L, 1L, 1L, 5L)))
  }

  test("d31: repeated-3-gram trim by hand — dup span dropped, short doc untouched, run-of-one-token collapses") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val dir = java.nio.file.Files.createTempDirectory("graft_trim").toString
    Seq(
      // grams: 0:"a b c" 1:"b c a" 2:"c a b" 3:"a b c"(dup) 4:"b c d" →
      // covered {3,4,5}, kept (a b c, d)
      (1L, "a b c a b c d", "en", "t", 13L),
      (2L, "x y", "en", "t", 3L), // no 3-grams → everything survives
      // grams 0..2 all "r r r": dups {1,2} cover {1,2,3,4}; only pos 0 survives
      (3L, "r r r r r", "en", "t", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.trimRepeatedNgrams(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
    assert(got == Seq(
      (1L, 7L, 4L, 3L, md5hex("a b c d")),
      (2L, 2L, 2L, 0L, md5hex("x y")),
      (3L, 5L, 1L, 4L, md5hex("r"))
    ))
  }

  test("t15: positional-index phrase search — adjacency in order only, and t15 == t3 on the real corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_posidx").toString
    Seq(
      (1L, "part filter runs", "en", "t", 1L),       // adjacent in order → hit
      (2L, "filter part", "en", "t", 1L),            // reversed → miss
      (3L, "part x filter", "en", "t", 1L),          // gap → miss
      (4L, "a part filter b part filter", "en", "t", 1L), // multiple hits, one row
      (5L, "part only", "en", "t", 1L)               // missing term → miss
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.phraseSearchIndexed(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 4L))
    // index path ≡ corpus scan on the real corpus
    val viaIndex = TextAnalysis.phraseSearchIndexed(spark, sf0001).collect().map(_.getLong(0)).toSeq
    val viaScan  = TextAnalysis.phraseSearch(spark, sf0001).collect().map(_.getLong(0)).toSeq
    assert(viaIndex == viaScan && viaIndex.nonEmpty)
  }

  test("t14: co-occurrence counts by hand — doc-level dedup, seed excluded, df covers non-seed docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cooc").toString
    Seq(
      (1L, "window scan scan fast", "en", "t", 1L),  // scan counted once per doc
      (2L, "window fast", "en", "t", 1L),
      (3L, "scan fast", "en", "t", 1L),              // no seed: df only
      (4L, "window window slow", "en", "t", 1L)      // repeated seed still one doc
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.termCooccurrence(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // order: n_docs_both desc, then token asc
    assert(got == Seq(("fast", 2L, 3L), ("scan", 1L, 2L), ("slow", 1L, 1L)))
  }

  test("t13: KWIC windows by hand — head hit, mid hit, tail hit, first-of-many, absent term") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kwic").toString
    Seq(
      (1L, "part starts this document here", "en", "t", 1L),  // pos 1: left edge truncates
      (2L, "a b part c d e", "en", "t", 1L),                   // pos 3: full ±2 window
      (3L, "tail words end in part", "en", "t", 1L),           // pos 5: right edge truncates
      (4L, "x part y part z", "en", "t", 1L),                  // two hits: FIRST occurrence wins
      (5L, "no match here", "en", "t", 1L)                     // absent → no row
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.kwicSnippet(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, 1L, "part starts this"),
      (2L, 3L, "a b part c d"),
      (3L, 5L, "end in part"),
      (4L, 2L, "x part y part")
    ))
  }

  test("t12: on the real corpus, phrase matches rank at distance 1 and the match set is exactly t1's AND set") {
    val prox = TextAnalysis.proximityRank(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val phraseDocs = TextAnalysis.phraseSearch(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(phraseDocs.nonEmpty && phraseDocs.forall(d => prox(d) == 1L))
    val andDocs = TextAnalysis
      .keywordSearch(spark, sf0001, TextAnalysis.PhraseTerms)
      .collect().map(_.getLong(0)).toSet
    assert(prox.keySet == andDocs, "proximity match set must equal the boolean AND set")
  }

  test("d18: mix matrix is d3's predictions regrouped by source — same classifier, same counts") {
    import org.apache.spark.sql.functions.col
    val mix = TextAnalysis
      .sourceLangMix(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // recount from d3's per-doc predictions joined to the source column —
    // an independent path to the same matrix
    val preds = TextAnalysis
      .langId(spark, sf0001)
      .select("doc_id", "lang_pred")
      .join(graft.sources.Tables.documents(spark, sf0001).select("doc_id", "source"), "doc_id")
      .collect()
      .map(r => (r.getString(2), r.getString(1)))
    val recount = preds.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(mix == recount)
    assert(mix.values.sum == graft.sources.Tables.documents(spark, sf0001).count())
  }

  test("t3: on the real corpus, phrase matches are a subset of the AND-match set") {
    val phraseDocs = TextAnalysis.phraseSearch(spark, sf0001).collect().map(_.getLong(0)).toSet
    val andDocs = TextAnalysis
      .keywordSearch(spark, sf0001, TextAnalysis.PhraseTerms)
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(phraseDocs.nonEmpty, "fixture corpus must contain the default phrase")
    assert(phraseDocs.subsetOf(andDocs))
    assert((andDocs -- phraseDocs).nonEmpty, "adjacency must actually constrain beyond AND-match")
  }

  /** Reference Levenshtein (classic DP) — test-side ground truth, so the
    * superset check does not depend on the engine under test.
    */
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      )
    d(a.length)(b.length)
  }

  test("v3 bigram LM: hand-computed smoothed log-probs; fluent beats unseen transitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_v3").toString
    // corpus: "a b" x3 establishes a->b as the dominant transition;
    // doc 3 repeats it, doc 4 uses transitions never seen elsewhere
    Seq(
      (0L, "a b"),
      (1L, "a b"),
      (2L, "a b"),
      (3L, "a b"),
      (4L, "x y")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis
      .bigramLmScore(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // V = 4 distinct tokens {a,b,x,y}; c(a,b)=4, c(a)=4 -> ln(5/8)
    // c(x,y)=1, c(x)=1 -> ln(2/5)
    def q(d: Double): Long = math.round(d * 1e6)
    assert(got(0L) == q(math.log(5.0 / 8.0)), s"got ${got(0L)}")
    assert(got(4L) == q(math.log(2.0 / 5.0)))
    assert(got(0L) > got(4L), "corpus-typical transitions must outscore unseen ones")
    assert(got.size == 5)
  }

  test("t5: RRF fusion replays plain-Scala fusion of its two (independently verified) sub-rankings") {
    val depth = TextAnalysis.RrfDepth
    val lex = TextAnalysis
      .bm25Rank(spark, sf0001, TextAnalysis.KeywordTerms, depth, excludeId = 0L)
      .collect()
      .map(r => r.getLong(1) -> r.getLong(0))
      .toMap
    val sem = graft.operators.Similarity
      .annBruteForce(spark, sf0001, 0L, depth)
      .collect()
      .map(r => r.getLong(1) -> r.getLong(0))
      .toMap
    assert(lex.nonEmpty && sem.nonEmpty)
    val expect = (lex.keySet ++ sem.keySet).toSeq
      .map { id =>
        val s = lex.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
          sem.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
        (math.round(s * 1e9), id)
      }
      .sortBy { case (qs, id) => (-qs, id) }
      .take(20)
      .zipWithIndex
      .map { case ((_, id), i) => (i + 1L, id) }
    val got = TextAnalysis
      .hybridRrfRank(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(got == expect)
    // a doc on BOTH lists must outrank one whose single-list rank matches
    // its worse list rank (the reason RRF exists); guaranteed by the math,
    // asserted here as a semantic guard against list-wiring regressions
    val both = got.map(_._2).filter(id => lex.contains(id) && sem.contains(id))
    assert(both.nonEmpty, "sf0.001 corpus should have at least one doc on both lists")
    assert(got.head._1 == 1L && got.map(_._1) == (1L to got.length))
  }

  test("t6: indexed BM25 equals t4's corpus-scan BM25 on fixture and real corpus") {
    // the saturation/length-norm fixture from the t4 replay test
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_t6").toString
    Seq(
      (0L, "merge alpha beta"),
      (1L, ("merge " * 5 + "x " * 40).trim),
      (2L, "dup " + ("y " * 10).trim),
      (3L, "window a"), (4L, "window b"), (5L, "window c"),
      (6L, "nothing relevant here at all")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (d <- Seq(dir, sf0001)) {
      val scan    = TextAnalysis.bm25Rank(spark, d).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val indexed = TextAnalysis.bm25RankIndexed(spark, d).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(indexed == scan, s"indexed/scan divergence on $d")
      assert(indexed.nonEmpty)
    }
  }

  test("t7: maintained (base+delta) index equals the corpus scan; segments partition the postings") {
    for (d <- Seq(sf0001)) {
      val scan = TextAnalysis.bm25Rank(spark, d).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val incr = TextAnalysis.bm25RankIncremental(spark, d).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(incr == scan, s"maintained-index/scan divergence on $d")
      assert(incr.nonEmpty)
    }
    // segment partition property: base holds only ids < split, delta only
    // ids >= split, and together they cover every posting exactly once
    import org.apache.spark.sql.functions.col
    val docs  = graft.sources.Tables.documents(spark, sf0001)
    val split = docs.agg(org.apache.spark.sql.functions.expr("(max(doc_id) + 1) div 2")).head().getLong(0)
    val base  = spark.read.parquet(s"${TextAnalysis.postingsBaseLayoutCache(spark, sf0001, split)}/postings.parquet")
    val delta = spark.read.parquet(s"${TextAnalysis.postingsDeltaLayoutCache(spark, sf0001, split)}/postings.parquet")
    assert(base.where(col("doc_id") >= split).isEmpty && delta.where(col("doc_id") < split).isEmpty)
    assert(base.count() + delta.count() ==
      base.unionByName(delta).select("doc_id", "token").distinct().count())
  }

  test("t16: compaction preserves the ranking and collapses the fan to one segment") {
    import org.apache.spark.sql.functions.col
    // ranking: compacted == maintained == corpus scan, row for row
    val scan = TextAnalysis.bm25Rank(spark, sf0001).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val comp = TextAnalysis.bm25RankCompacted(spark, sf0001).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(comp == scan && comp.nonEmpty, "compacted/scan divergence")
    // physical: the compacted layout is ONE segment pair — the posting row
    // set is the base+delta union exactly, the stats fold to one row whose
    // sums are the corpus totals
    val layout = TextAnalysis.postingsCompactedLayoutCache(spark, sf0001)
    val docs   = graft.sources.Tables.documents(spark, sf0001)
    val split  = docs.agg(org.apache.spark.sql.functions.expr("(max(doc_id) + 1) div 2")).head().getLong(0)
    val fanRows = spark.read
      .parquet(s"${TextAnalysis.postingsBaseLayoutCache(spark, sf0001, split)}/postings.parquet")
      .unionByName(spark.read.parquet(s"${TextAnalysis.postingsDeltaLayoutCache(spark, sf0001, split)}/postings.parquet"))
    val compRows = spark.read.parquet(s"$layout/postings.parquet")
    assert(compRows.count() == fanRows.count())
    assert(compRows.exceptAll(fanRows).isEmpty && fanRows.exceptAll(compRows).isEmpty)
    val st = spark.read.parquet(s"$layout/stats.parquet").collect()
    assert(st.length == 1)
    assert(st(0).getLong(0) == docs.count(), "n_docs must fold to the corpus count")
  }

  test("t16 streamed: compacting the batch_id fan leaves the streamed ranking bit-equal") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_compact")
    val docs = graft.sources.Tables.documents(spark, sf0001)
    // three hash-sliced micro-batches through the streaming segment builder
    (0 until 3).foreach { i =>
      graft.streaming.PostingsStream.processBatch(
        docs.where(org.apache.spark.sql.functions.pmod(org.apache.spark.sql.functions.xxhash64(col("doc_id")), org.apache.spark.sql.functions.lit(3)) === i),
        s"$base/idx",
        i.toLong
      )
    }
    val fan = graft.streaming.PostingsStream
      .bm25RankStreamed(spark, s"$base/idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    graft.streaming.PostingsStream.compactStreamedIndex(spark, s"$base/idx", s"$base/compact")
    val compacted = TextAnalysis.bm25OverSegments(
      spark.read.parquet(s"$base/compact/postings.parquet")
        .where(col("token").isInCollection(TextAnalysis.KeywordTerms)),
      spark.read.parquet(s"$base/compact/stats.parquet"),
      20
    ).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(compacted == fan && fan.nonEmpty)
    // and the fan genuinely had 3 segments while the compacted pair has none
    assert(new java.io.File(s"$base/idx/postings").listFiles().count(_.getName.startsWith("batch_id=")) == 3)
    assert(!new java.io.File(s"$base/compact/postings.parquet").listFiles().exists(_.getName.startsWith("batch_id=")))
  }

  test("t17: tombstone mask == from-scratch index over the survivors; purge retires the ledger") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    // ground truth: bm25 over a physical copy of the corpus with the
    // tombstoned docs actually absent
    val survivorsDir = java.nio.file.Files.createTempDirectory("graft_tomb_truth").toString
    graft.sources.Tables.documents(spark, sf0001)
      .where(pmod(col("doc_id"), lit(10)) =!= 3)
      .write.mode("overwrite").parquet(s"$survivorsDir/documents.parquet")
    def ranks(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val truth  = ranks(TextAnalysis.bm25Rank(spark, survivorsDir))
    val masked = ranks(TextAnalysis.bm25RankTombstoned(spark, sf0001))
    assert(masked == truth && truth.nonEmpty, "tombstone mask must equal the survivor-corpus index")
    // the mask genuinely changed the answer vs the undeleted index
    assert(masked != ranks(TextAnalysis.bm25Rank(spark, sf0001)), "fixture must tombstone at least one ranked doc")
    // purge: compaction drops the rows physically and the un-masked query
    // over the purged generation answers identically — ledger retired
    val docs  = graft.sources.Tables.documents(spark, sf0001)
    val split = docs.agg(org.apache.spark.sql.functions.expr("(max(doc_id) + 1) div 2")).head().getLong(0)
    val base  = TextAnalysis.postingsBaseLayoutCache(spark, sf0001, split)
    val delta = TextAnalysis.postingsDeltaLayoutCache(spark, sf0001, split)
    val out   = java.nio.file.Files.createTempDirectory("graft_tomb_purge").toString
    TextAnalysis.compactSegmentsPurged(
      spark.read.parquet(s"$base/postings.parquet").unionByName(spark.read.parquet(s"$delta/postings.parquet")),
      spark.read.parquet(s"$base/stats.parquet").unionByName(spark.read.parquet(s"$delta/stats.parquet")),
      TextAnalysis.tombstoneLedger(spark, sf0001),
      out
    )
    val purged = ranks(
      TextAnalysis.bm25OverSegments(
        spark.read.parquet(s"$out/postings.parquet").where(col("token").isInCollection(TextAnalysis.KeywordTerms)),
        spark.read.parquet(s"$out/stats.parquet"),
        20
      )
    )
    assert(purged == truth, "purged generation must answer without any mask")
    assert(
      spark.read.parquet(s"$out/postings.parquet").where(pmod(col("doc_id"), lit(10)) === 3).isEmpty,
      "purge must physically drop tombstoned postings"
    )
    // an empty ledger makes the purge the plain t16 fold (exact zero row)
    val out2 = java.nio.file.Files.createTempDirectory("graft_tomb_empty").toString
    TextAnalysis.compactSegmentsPurged(
      spark.read.parquet(s"$base/postings.parquet").unionByName(spark.read.parquet(s"$delta/postings.parquet")),
      spark.read.parquet(s"$base/stats.parquet").unionByName(spark.read.parquet(s"$delta/stats.parquet")),
      TextAnalysis.tombstoneLedger(spark, sf0001).where(lit(false)),
      out2
    )
    assert(
      spark.read.parquet(s"$out2/stats.parquet").collect()(0).getLong(0) == docs.count(),
      "empty ledger must subtract exactly zero"
    )
  }

  test("streamed positions compaction: phrase over the compacted segment == fan == corpus scan") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val base = java.nio.file.Files.createTempDirectory("graft_poscompact")
    val docs = graft.sources.Tables.documents(spark, sf0001)
    (0 until 3).foreach { i =>
      graft.streaming.PositionsStream.processBatch(
        docs.where(pmod(xxhash64(col("doc_id")), lit(3)) === i),
        s"$base/idx",
        i.toLong
      )
    }
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] = df.collect().map(_.getLong(0)).toSeq
    val fan = ids(graft.streaming.PositionsStream.phraseSearchStreamed(spark, s"$base/idx"))
    graft.streaming.PositionsStream.compactStreamedPositions(spark, s"$base/idx", s"$base/compact")
    val compacted = ids(
      TextAnalysis.phraseOverPositions(
        spark.read.parquet(s"$base/compact/positions.parquet"),
        TextAnalysis.PhraseTerms
      )
    )
    val scan = ids(TextAnalysis.phraseSearch(spark, sf0001))
    assert(compacted == fan && fan == scan && scan.nonEmpty)
    assert(!new java.io.File(s"$base/compact/positions.parquet").listFiles().exists(_.getName.startsWith("batch_id=")))
  }

  test("t6: the term filter is PUSHED into the postings scan (no corpus table in the plan)") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan =
      try {
        val df = TextAnalysis.bm25RankIndexed(spark, sf0001)
        df.collect()
        df.queryExecution.executedPlan.toString
      } finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert(plan.contains("PushedFilters") && plan.contains("In(token, ["), plan)
    assert(!plan.contains("documents.parquet"), s"query must not touch the corpus:\n$plan")
  }

  test("t16: the term filter is PUSHED into the compacted-segment scan too") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan =
      try {
        val df = TextAnalysis.bm25RankCompacted(spark, sf0001)
        df.collect()
        df.queryExecution.executedPlan.toString
      } finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert(plan.contains("PushedFilters") && plan.contains("In(token, ["), plan)
    assert(!plan.contains("documents.parquet"), s"query must not touch the corpus:\n$plan")
  }

  test("d21: quartile cut replays plain-Scala interpolated percentile over v3's scores") {
    for (d <- Seq(sf0001)) {
      val scores = TextAnalysis.bigramLmScore(spark, d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(scores.size >= 8)
      // Spark `percentile`: linear interpolation at rank 0.25*(n-1)
      val sorted = scores.values.toSeq.sorted
      val pos    = 0.25 * (sorted.length - 1)
      val (lo, f) = (pos.toInt, pos - pos.toInt)
      val cut = sorted(lo) + f * (sorted(math.min(lo + 1, sorted.length - 1)) - sorted(lo))
      val expect = scores.filter { case (_, q) => q >= cut }.keySet
      val got = TextAnalysis.lmQualityKeep(spark, d).collect().map(_.getLong(0)).toSet
      assert(got == expect, s"missing ${expect -- got}, extra ${got -- expect}")
      // the gate has teeth: it drops SOMETHING and keeps at least 3/4
      assert(got.size < scores.size && got.size * 4 >= scores.size * 3)
      val dropped = scores.keySet -- got
      assert(dropped.forall(id => scores(id) < cut))
    }
  }

  test("t8: substring search == plain contains scan; second query reuses the trigram layout") {
    import org.apache.spark.sql.functions._
    val got = TextAnalysis.substringSearch(spark, sf0001).collect().map(_.getLong(0)).toSeq
    val scan = graft.sources.Tables
      .documents(spark, sf0001)
      .where(col("text").contains(TextAnalysis.SubstringPattern))
      .select("doc_id")
      .orderBy("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(got == scan && got.nonEmpty)
    graft.sources.LayoutCache.drainBuildLog()
    TextAnalysis.substringSearch(spark, sf0001).collect()
    assert(graft.sources.LayoutCache.drainBuildLog().isEmpty, "second query must reuse the trigram layout")
  }

  test("t9: MaxScore-pruned BM25 == t4 corpus scan and t6 indexed form on the real corpus") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pruned = pairs(TextAnalysis.bm25RankPruned(spark, sf0001))
    assert(pruned == pairs(TextAnalysis.bm25Rank(spark, sf0001)) && pruned.nonEmpty)
    assert(pruned == pairs(TextAnalysis.bm25RankIndexed(spark, sf0001)))
  }

  test("t9: on a skewed fixture the stopword term goes non-essential and only-stopword docs are pruned") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_t9").toString
    // 5 docs carry the rare term 'aardvark' (high idf); 40 docs carry only
    // the ubiquitous 'the'. With k=3, θ = 3rd-best aardvark contribution,
    // and ub('the') cannot reach it → 'the'-only docs never aggregate.
    val docs =
      (0L until 5L).map(i => (i, "aardvark aardvark the filler" + i)) ++
        (5L until 45L).map(i => (i, s"the just the usual the stuff$i"))
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ts = Seq("aardvark", "the")
    val layout   = TextAnalysis.postingsLayoutCache(spark, dir)
    val p        = spark.read.parquet(s"$layout/postings.parquet").where(col("token").isInCollection(ts))
    val stats    = spark.read.parquet(s"$layout/stats.parquet")
    val contribs = p
      .crossJoin(broadcast(stats))
      .withColumn("contrib", expr(TextAnalysis.Bm25ContribSql))
      .select("token", "doc_id", "contrib")
    val (cand, essential, theta) = TextAnalysis.maxScorePlan(contribs, ts, 3)
    assert(essential == Seq("aardvark"), s"'the' must be non-essential (θ=$theta)")
    assert(cand.count() == 5, "only the rare-term docs survive as candidates")
    // and the pruned ranking still equals the unpruned scan exactly
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(
      pairs(TextAnalysis.bm25RankPruned(spark, dir, ts, k = 3)) ==
        pairs(TextAnalysis.bm25Rank(spark, dir, ts, k = 3))
    )
  }

  test("t10: maintained (base+delta) trigram index == t8; segments partition the grams; base reused") {
    import org.apache.spark.sql.functions._
    def ids(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.getLong(0)).toSeq
    val incr = ids(TextAnalysis.substringSearchIncremental(spark, sf0001))
    assert(incr == ids(TextAnalysis.substringSearch(spark, sf0001)) && incr.nonEmpty)
    // segments split cleanly on the id boundary — no doc's grams straddle
    val split = graft.sources.Tables
      .documents(spark, sf0001)
      .agg(expr("(max(doc_id) + 1) div 2")).head().getLong(0)
    val base  = TextAnalysis.trigramBaseLayoutCache(spark, sf0001, split)
    val delta = TextAnalysis.trigramDeltaLayoutCache(spark, sf0001, split)
    assert(spark.read.parquet(s"$base/trigrams.parquet").where(col("doc_id") >= split).count() == 0)
    assert(spark.read.parquet(s"$delta/trigrams.parquet").where(col("doc_id") < split).count() == 0)
    // warm path: a second query builds nothing
    graft.sources.LayoutCache.drainBuildLog()
    TextAnalysis.substringSearchIncremental(spark, sf0001).collect()
    assert(graft.sources.LayoutCache.drainBuildLog().isEmpty, "second t10 query must reuse both segments")
  }

  test("t8: verify phase rejects a doc carrying every trigram but not the contiguous pattern") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_t8").toString
    // "abc dx def" contains all five 3-grams of "abc def"
    // ({abc, 'bc ', 'c d', ' de', def}) yet NOT the pattern itself — only
    // the exact-verify phase can exclude it. Doc 2 matches mid-token
    // (substring semantics are boundary-free). Doc 3 is an exact hit.
    Seq(
      (1L, "zz abc dx def zz"),
      (2L, "xxabc defyy"),
      (3L, "abc def")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.substringSearch(spark, dir, "abc def").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 3L))
  }

  test("t18: required literal runs extracted conservatively from the restricted regex subset") {
    assert(TextAnalysis.requiredLiteralRuns("scan [a-z]+ fast") == Seq("scan ", " fast"))
    // '*' and '?' make the preceding char optional — it is popped
    assert(TextAnalysis.requiredLiteralRuns("ab*c d") == Seq("a", "c d"))
    assert(TextAnalysis.requiredLiteralRuns("[abc]def?g") == Seq("de", "g"))
    // '+' keeps its atom (guaranteed at least once) but still breaks the run
    assert(TextAnalysis.requiredLiteralRuns("x+yz") == Seq("x", "yz"))
    // '.' breaks; class with leading ^ (negation) or ] (literal member) handled
    assert(TextAnalysis.requiredLiteralRuns("abc.def") == Seq("abc", "def"))
    assert(TextAnalysis.requiredLiteralRuns("a[^x]b[]x]c") == Seq("a", "b", "c"))
    // out-of-subset metacharacters are rejected, not mis-planned — including
    // the anchors, where Java regex and RE2 disagree on '$' before a
    // trailing newline
    intercept[IllegalArgumentException](TextAnalysis.regexSearch(spark, sf0001, "a|b"))
    intercept[IllegalArgumentException](TextAnalysis.regexSearch(spark, sf0001, "(abc)+"))
    intercept[IllegalArgumentException](TextAnalysis.regexSearch(spark, sf0001, "fast$"))
    intercept[IllegalArgumentException](TextAnalysis.regexSearch(spark, sf0001, "^scan"))
    // no literal run long enough to probe the index with
    intercept[IllegalArgumentException](TextAnalysis.regexSearch(spark, sf0001, "ab[0-9]*"))
  }

  test("t18: trigram-pruned regex search == full rlike scan; non-empty; index layout reused") {
    val got = TextAnalysis.regexSearch(spark, sf0001).collect().map(_.getLong(0)).toSeq
    val want = graft.sources.Tables
      .documents(spark, sf0001)
      .where(org.apache.spark.sql.functions.col("text").rlike(TextAnalysis.RegexPattern))
      .select("doc_id")
      .orderBy("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(got == want && got.nonEmpty, "pruned search must equal the scan-and-filter form")
    // a quantifier-popped pattern still answers correctly (the popped char
    // keeps the gram set a strict under-approximation — never wrong, only
    // more candidates)
    val p    = "scan[a-z ]*fast"
    val got2 = TextAnalysis.regexSearch(spark, sf0001, p).collect().map(_.getLong(0)).toSeq
    val want2 = graft.sources.Tables
      .documents(spark, sf0001)
      .where(org.apache.spark.sql.functions.col("text").rlike(p))
      .select("doc_id")
      .orderBy("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(got2 == want2 && got2.nonEmpty)
    // a pattern with more grams than the probe budget exercises the
    // rarest-K selection path — still exactly the scan's answer
    val p3 = "table [a-z]+ window"
    assert(TextAnalysis.requiredLiteralRuns(p3).flatMap(_.sliding(3)).distinct.size > TextAnalysis.RegexProbeGrams)
    val got3 = TextAnalysis.regexSearch(spark, sf0001, p3).collect().map(_.getLong(0)).toSeq
    val want3 = graft.sources.Tables
      .documents(spark, sf0001)
      .where(org.apache.spark.sql.functions.col("text").rlike(p3))
      .select("doc_id")
      .orderBy("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(got3 == want3 && got3.nonEmpty)
  }

  test("t19: symmetric-delete fuzzy search == brute levenshtein scan; hand fixture covers all four edit kinds") {
    import org.apache.spark.sql.functions.{col, countDistinct, explode, levenshtein, lit, split}
    // real corpus: pruned == brute over the vocabulary, multi-match
    val got = TextAnalysis.fuzzyTermSearch(spark, sf0001).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val vocab = graft.sources.Tables
      .documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(countDistinct("doc_id").as("df"))
    val want = vocab
      .where(levenshtein(col("token"), lit(TextAnalysis.FuzzyProbe)) <= 1)
      .select(col("token"), levenshtein(col("token"), lit(TextAnalysis.FuzzyProbe)).cast("long").as("dist"), col("df"))
      .orderBy("token")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == want && got.size >= 2, s"expected a multi-match correction, got $got")

    // hand fixture: exact match, deletion, insertion, substitution all
    // found; distance-2 lookalikes excluded even when they share a variant
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_t19").toString
    Seq(
      (1L, "word"),   // exact (dist 0)
      (2L, "wod"),    // probe deletes 'r' (dist 1)
      (3L, "worde"),  // probe + insertion (dist 1)
      (4L, "wird"),   // substitution (dist 1)
      (5L, "wi"),     // dist 2 — must not appear
      (6L, "wordes")  // dist 2 — shares no variant anyway
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fx = TextAnalysis.fuzzyTermSearch(spark, dir, "word").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(fx == Seq(("wird", 1L), ("wod", 1L), ("word", 0L), ("worde", 1L)), s"got $fx")
  }
}
