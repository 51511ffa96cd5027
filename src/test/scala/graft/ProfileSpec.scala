package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {

  test("dq1: nulls, duplicates, and row counts land in the right profile cells") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")),
      (Some(1L), None),
      (Some(2L), Some("b")),
      (None, Some("b"))
    ).toDF("id", "tag")
    val rows = Profile
      .profile(df)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows("id") == ((4L, 3L, 2L)))  // 4 rows, 1 null, distinct {1, 2}
    assert(rows("tag") == ((4L, 3L, 2L))) // 4 rows, 1 null, distinct {a, b}
  }

  test("dq1 tolerates hostile column names (spaces, dots, quotes, backticks)") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("a b", "it's.`odd`")
    val rows = Profile
      .profile(df)
      .collect()
      .map(r => r.getString(0) -> r.getLong(3))
      .toMap
    assert(rows == Map("a b" -> 2L, "it's.`odd`" -> 2L))
  }

  test("dq1 on real events: keys are unique, types are the known five") {
    val rows = Profile
      .profileEvents(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val (n, nnId, ndId) = rows("event_id")
    assert(nnId == n && ndId == n) // event_id is a dense unique key
    assert(rows("event_type")._3 == 5L)
    assert(rows.keySet == Set("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  test("dq2 on real documents: doc_id unique, text dup count consistent with q8") {
    val rows = Profile
      .profileDocuments(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet == Set("doc_id", "text", "lang", "source", "n_chars"))
    val (n, nnId, ndId) = rows("doc_id")
    assert(nnId == n && ndId == n)
    // the profile's text distinct-count restates q8's exact-dup diagnosis:
    // n_rows − n_distinct(text) IS the dup_rows the dedup op reports
    val dupRows = graft.operators.CoreQueries.q8DedupExact(spark, sf0001).head().getLong(0)
    assert(n - rows("text")._3 == dupRows)
  }

  test("dq3: approx profile keeps counts exact and lands distincts within 5% of dq1") {
    val exact = Profile
      .profileEvents(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val approx = Profile
      .profileEventsApprox(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (c, (n, nn, ndApprox)) =>
      val (en, enn, end) = exact(c)
      // row and non-null counts are NOT sketched — they must be identical
      assert(n == en && nn == enn, c)
      assert(math.abs(ndApprox - end) <= math.max(1L, (end * 0.05).toLong), s"$c: $ndApprox vs $end")
    }
  }

  test("d19: planted dups land on the right source; the clean real corpus reports all zeros") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_duprate").toString
    Seq(
      (1L, "same text", "en", "feedA", 9L),
      (2L, "same text", "en", "feedA", 9L), // dup within feedA
      (3L, "same text", "en", "feedB", 9L), // same text in ANOTHER source is
      (4L, "other", "en", "feedB", 5L),     //   NOT feedB's dup — rates are per source
      (5L, "third third", "en", "feedC", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Profile
      .dedupRateBySource(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map("feedA" -> ((2L, 1L)), "feedB" -> ((2L, 0L)), "feedC" -> ((1L, 0L))))
    // real corpus: no exact dups exist (near-dups only) — the report must
    // say so for every source, and mass must reconcile
    val real = Profile.dedupRateBySource(spark, sf001).collect()
    assert(real.forall(_.getLong(2) == 0L))
    assert(real.map(_.getLong(1)).sum == graft.sources.Tables.documents(spark, sf001).count())
  }

  test("d17: size classes are exact binary-length buckets; counts partition the corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sizehist").toString
    // boundary pairs around powers of two — the values a float log2 could
    // misbucket: 1→1, 2,3→2, 4,7→3, 8→4, 1024→11
    Seq(
      (1L, "x", "en", "a", 1L),
      (2L, "x", "en", "a", 2L),
      (3L, "x", "en", "a", 3L),
      (4L, "x", "en", "a", 4L),
      (5L, "x", "en", "a", 7L),
      (6L, "x", "en", "b", 8L),
      (7L, "x", "en", "b", 1024L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Profile
      .sizeHistogram(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("a", 1L) -> 1L, ("a", 2L) -> 2L, ("a", 3L) -> 2L, ("b", 4L) -> 1L, ("b", 11L) -> 1L))
    // real corpus: histogram mass equals the corpus
    val real  = Profile.sizeHistogram(spark, sf0001).collect()
    val total = graft.sources.Tables.documents(spark, sf0001).count()
    assert(real.map(_.getLong(2)).sum == total)
  }

  test("dq4: planted orphans on both sides land in the right coverage cells") {
    import spark.implicits._
    import org.apache.spark.sql.functions.typedLit
    val dir = java.nio.file.Files.createTempDirectory("graft_dq4").toString
    // docs 1..4; embeddings for 1,2,9,10 -> two docs uncovered, two vectors orphaned
    Seq(
      (1L, "a", "en", "t", 1L), (2L, "b", "en", "t", 1L),
      (3L, "c", "en", "t", 1L), (4L, "d", "en", "t", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq(1L, 2L, 9L, 10L)
      .toDF("vec_id")
      .withColumn("embedding", typedLit(Seq(1.0f, 0.0f)))
      .withColumn("label", org.apache.spark.sql.functions.lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Profile.modalityCoverage(spark, dir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 4L, 2L, 2L)))
    // real corpus: counts reconcile with the tables and orphans are complements
    val real = Profile.modalityCoverage(spark, sf0001).head()
    val nd   = graft.sources.Tables.documents(spark, sf0001).count()
    val nv   = graft.sources.Tables.embeddings(spark, sf0001).count()
    assert(real.getLong(0) == nd && real.getLong(1) == nv)
    assert(real.getLong(2) <= nd && real.getLong(3) <= nv)
  }

  test("d27: planted growth curve — new-token counts per decile by hand") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d27").toString
    // 10 docs → deciles are single docs. Doc k carries token "shared"
    // (new only at doc 0) plus k-specific fresh tokens: doc 0 also brings
    // 'a'; doc 5 brings 'f1 f2'; everything else repeats doc 0.
    val texts = (0L until 10L).map { k =>
      val extra = k match {
        case 0 => "a"
        case 5 => "f1 f2"
        case _ => "a"
      }
      (k, s"shared $extra")
    }
    texts.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Profile
      .vocabGrowth(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_docs"), r.getAs[Long]("n_new_tokens"), r.getAs[Long]("cum_vocab")))
      .toSeq
    val expected = (0L until 10L).map { d =>
      val nw = d match { case 0 => 2L; case 5 => 2L; case _ => 0L }
      val cum = if (d < 5) 2L else 4L
      (d, 1L, nw, cum)
    }
    assert(got == expected)
  }

  test("d27: corpus run — totals reconcile with the distinct-token census") {
    import org.apache.spark.sql.functions._
    val rows = Profile.vocabGrowth(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 10L), "all ten deciles present")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == graft.sources.Tables.documents(spark, sf0001).count())
    val vocab = graft.sources.Tables
      .documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct("t"))
      .head()
      .getLong(0)
    assert(rows.map(_.getAs[Long]("n_new_tokens")).sum == vocab)
    assert(rows.last.getAs[Long]("cum_vocab") == vocab)
    // growth is monotone and decile 0 dominates (everything is new there)
    val news = rows.map(_.getAs[Long]("n_new_tokens"))
    assert(news.head == news.max)
  }

  test("dq5: drift ledger by hand — migrated tokens are not new, new vocab counts once per source") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    Seq(
      // old half (ids < (3+1) div 2 = 2)
      (0L, "alpha beta", "en", "A", 1L),
      (1L, "gamma", "en", "B", 1L),
      // new half: delta/epsilon genuinely new; alpha repeats in-source,
      // beta migrates A→B (present in the OLD corpus, so not new)
      (2L, "alpha delta", "en", "A", 1L),
      (3L, "beta epsilon epsilon", "en", "B", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Profile.driftProfile(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == Seq(
      ("A", 1L, 1L, 2L, 2L, 1L), // delta
      ("B", 1L, 1L, 1L, 3L, 1L)  // epsilon (twice in text, once in vocab)
    ))
  }
}
