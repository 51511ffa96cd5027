package graft

import graft.operators.Bpe

/** BPE merge induction against an independent test-side reference: same
  * greedy argmax (corpus-frequency-weighted, (left, right) tie-break) and
  * the same left-to-right non-overlapping apply step.
  */
class BpeSpec extends SparkSpec {

  /** Reference BPE: plain-Scala replay, no Spark. */
  private def referenceMerges(words: Seq[String], numMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab = words
      .filter(_.nonEmpty)
      .groupBy(identity)
      .map { case (w, ws) => (w.map(_.toString).toVector, ws.length.toLong) }
      .toVector
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var k = 0
    var stop = false
    while (k < numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (s, f) =>
        s.zip(s.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), cnt) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        k += 1
        out += ((k, l, r, cnt))
        vocab = vocab.map { case (s, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += (l + r); i += 2 }
            else { b += s(i); i += 1 }
          }
          (b.result(), f)
        }
      }
    }
    out.result()
  }

  private def plantCorpus(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "t", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("v1: merges replay the reference on a corpus with overlap and tie cases") {
    // "aaaa" exercises the non-overlap rule ((aa)(aa), never a cascade);
    // equal-count pairs exercise the lexicographic tie-break
    val texts = Seq(
      "aaaa aaaa banana banana banana",
      "low lower lowest low low",
      "aaaa banana low"
    )
    val words = texts.flatMap(_.split(" ").toSeq)
    val expect = referenceMerges(words, 20)
    val got = Bpe
      .bpeMerges(spark, plantCorpus(texts), numMerges = 20)
      .collect()
      .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("v1: terminates early when every word is fully merged") {
    val got = Bpe
      .bpeMerges(spark, plantCorpus(Seq("ab ab ab")), numMerges = 50)
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq
    // one merge exhausts the corpus: after (a,b) → "ab", no pairs remain
    assert(got == Seq(("a", "b")))
  }

  test("v2: per-doc token counts replay the reference segmentation") {
    val texts = Seq("aaaa banana low", "banana banana", "lowest lower aaaa")
    val dir = plantCorpus(texts)
    val words = texts.flatMap(_.split(" ").toSeq)
    val merges = referenceMerges(words, 20).map { case (_, l, r, _) => (l, r) }
    // reference apply: segment each word under the merge list, in order
    def segment(w: String): Long = {
      var s = w.map(_.toString).toVector
      merges.foreach { case (l, r) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += (l + r); i += 2 }
          else { b += s(i); i += 1 }
        }
        s = b.result()
      }
      s.length.toLong
    }
    val expect = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.split(" ").filter(_.nonEmpty).map(segment).sum
    }.toMap
    val got = Bpe
      .bpeTokenCount(spark, dir, numMerges = 20)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == expect)
    // and BPE actually compresses: fewer tokens than characters, more than words
    val chars = texts.map(_.replace(" ", "").length).sum.toLong
    assert(got.values.sum < chars)
    assert(got.values.sum >= texts.map(_.split(" ").length).sum.toLong)
  }

  test("v5: per-doc encode replays the reference segmentation, in word order") {
    val texts = Seq("aaaa banana low", "banana banana", "lowest lower aaaa")
    val dir   = plantCorpus(texts)
    val words = texts.flatMap(_.split(" ").toSeq)
    val merges = referenceMerges(words, 20).map { case (_, l, r, _) => (l, r) }
    def segment(w: String): Vector[String] = {
      var s = w.map(_.toString).toVector
      merges.foreach { case (l, r) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += (l + r); i += 2 }
          else { b += s(i); i += 1 }
        }
        s = b.result()
      }
      s
    }
    val expect = texts.zipWithIndex.map { case (t, i) =>
      val toks = t.split(" ").filter(_.nonEmpty).toVector.flatMap(segment)
      i.toLong -> ((toks.length.toLong, toks.mkString(" ")))
    }.toMap
    val got = Bpe
      .bpeEncode(spark, dir, numMerges = 20)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got == expect)
    // internal consistency: v5's count column is exactly v2's token count
    val v2 = Bpe.bpeTokenCount(spark, dir, numMerges = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._1).toMap == v2)
  }

  test("v1 property: merges replay the reference on random small corpora") {
    import org.scalacheck.Gen
    // tiny alphabet + short words force dense pair collisions and ties —
    // the regime where argmax ordering and the apply step can diverge
    val wordGen   = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val corpusGen = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, wordGen))
    (0 until 6).foreach { seed =>
      val words = corpusGen(Gen.Parameters.default, org.scalacheck.rng.Seed(seed.toLong)).get
      val texts = words.grouped(4).map(_.mkString(" ")).toSeq
      val expect = referenceMerges(texts.flatMap(_.split(" ").toSeq).filter(_.nonEmpty), 8)
      val got = Bpe
        .bpeMerges(spark, plantCorpus(texts), numMerges = 8)
        .collect()
        .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(got == expect, s"seed $seed corpus $words")
    }
  }

  test("bpe layout persists once and rebuilds when the corpus changes in place") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_stale").toString
    def writeDocs(texts: Seq[String]): Unit =
      texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    writeDocs(Seq("aaaa aaaa", "aaaa"))
    val p1 = Bpe.bpeLayoutCache(spark, dir, 5)
    // unchanged corpus -> same layout path, no re-learn
    assert(Bpe.bpeLayoutCache(spark, dir, 5) == p1)
    // merge count is part of the key — a differently-sized vocabulary is a
    // different artifact, never a truncation of the old one
    assert(Bpe.bpeLayoutCache(spark, dir, 7) != p1)
    // regenerate UNDER THE SAME PATH with a different corpus: a stale
    // layout would still merge (a,a); the fresh one must learn (b,b)
    writeDocs(Seq("bbbb bbbb", "bbbb"))
    val p2 = Bpe.bpeLayoutCache(spark, dir, 5)
    assert(p2 != p1, "regenerated corpus must not reuse the old vocabulary")
    val top = Bpe.bpeMerges(spark, dir, 5).head()
    assert((top.getString(1), top.getString(2)) == (("b", "b")))
    // and v2 consumes the SAME artifact: token counts reflect the new corpus
    val counts = Bpe.bpeTokenCount(spark, dir, 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(0L -> 2L, 1L -> 1L)) // "bbbb" -> 1 symbol after (b,b),(bb,bb)
  }

  test("v1: real-corpus merges are deterministic and build on earlier merges") {
    val a = Bpe.bpeMerges(spark, sf0001, numMerges = 10).collect().map(_.toSeq).toSeq
    val b = Bpe.bpeMerges(spark, sf0001, numMerges = 10).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.length == 10)
    // at least one later merge consumes an earlier merge's output symbol —
    // the "byte pair" actually grows
    val produced = a.map(r => r(1).toString + r(2).toString).toSet
    assert(a.exists(r => produced.contains(r(1).toString) || produced.contains(r(2).toString)))
  }

  test("v4: incremental retrain from maintained word counts is bit-equal to v1's full retrain") {
    // corpus where the batch half SHIFTS the argmax: base is banana-heavy,
    // the batch floods 'low'-family words, so training on base counts alone
    // would produce a different first merge than base+batch — the
    // incremental path must reflect the batch, not just replay the base
    val texts = Seq(
      "banana banana banana aaaa", // doc 0 (base: ids < (max+1)/2 = 2)
      "banana aaaa",               // doc 1 (base)
      "low lower lowest low",      // doc 2 (batch)
      "low low lowest lower low"   // doc 3 (batch)
    )
    val dir = plantCorpus(texts)
    val full = Bpe.bpeMerges(spark, dir, numMerges = 12).collect().map(_.toSeq).toSeq
    val incr = Bpe.bpeMergesIncremental(spark, dir, numMerges = 12).collect().map(_.toSeq).toSeq
    assert(incr == full, "additive word counts must make the retrain exact")
    // and both equal the independent reference
    val expect = referenceMerges(texts.flatMap(_.split(" ").toSeq).filter(_.nonEmpty), 12)
    assert(incr.map(r => (r(0).toString.toInt, r(1), r(2), r(3))) == expect.map(t => (t._1, t._2, t._3, t._4)))
    // base-only training really would differ (the planted shift is real)
    val baseOnly = referenceMerges(
      texts.take(2).flatMap(_.split(" ").toSeq).filter(_.nonEmpty), 12)
    assert(baseOnly.map(t => (t._2, t._3)) != expect.map(t => (t._2, t._3)),
      "fixture must make the batch half matter")
  }

  test("v4: real-corpus incremental merges equal v1 and are deterministic") {
    val full = Bpe.bpeMerges(spark, sf0001, numMerges = 10).collect().map(_.toSeq).toSeq
    val incr = Bpe.bpeMergesIncremental(spark, sf0001, numMerges = 10).collect().map(_.toSeq).toSeq
    assert(incr == full)
    assert(incr.length == 10)
  }
}
