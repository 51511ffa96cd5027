package graft.operators

import graft.sources.{LayoutCache, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction over the corpus — the tokenizer
  * -training step of an LLM data pipeline (d6's regex is a BPE-*shaped*
  * counter; this LEARNS the merges). Classic algorithm: start from
  * characters, repeatedly merge the most frequent adjacent symbol pair.
  *
  * The 100 TB shape is decided in step one: the corpus collapses to the
  * `(word, freq)` VOCABULARY — the only corpus-wide operation — and every
  * merge iteration runs on that vocabulary frame, whose size is bounded by
  * distinct words, not corpus tokens (the same corpus→vocab collapse f1
  * rides). Each iteration is one explode+groupBy over the vocab plus a
  * 1-row argmax to the driver; the vocab's symbol arrays are rewritten by a
  * narrow fold and `localCheckpoint` truncates the growing lineage (the
  * frame is tiny — vocab rows × symbols). Nothing in the loop ever touches
  * the corpus again.
  */
object Bpe {

  /** Default number of merges — small enough to keep the registered query
    * sub-second, large enough that late merges build on earlier ones.
    */
  val DefaultMerges = 20

  /** Greedy left-to-right application of ONE merge rule (l, r) to a symbol
    * array: scan the array once, replacing each non-overlapping adjacent
    * (l, r) with l+r — exactly the textbook BPE apply step ("aaa" under
    * (a,a) → ["aa","a"], never ["a","aa"] or a cascade). Expressed as a
    * Catalyst `aggregate` fold so it stays a narrow in-plan expression:
    * append x unless the accumulator's last element is `l` AND x is `r`
    * AND that last element was not itself just produced by this rule
    * (tracked by carrying the previous raw symbol alongside).
    */
  private def applyMerge(s: Column, l: String, r: String): Column = {
    // acc: struct(out: array<string>, justMerged: boolean). justMerged
    // guards the overlap case l == r ("aaa": after [aa], the trailing "a"
    // must NOT see last==l and fuse again into "aaa").
    val zero = struct(
      array().cast("array<string>").as("out"),
      lit(false).as("justMerged")
    )
    val step = (acc: Column, x: Column) => {
      val out = acc.getField("out")
      // size guard FIRST: && short-circuits left-to-right in codegen, and
      // element_at(out, -1) on an empty array is an ANSI error
      val canMerge = size(out) > 0 && !acc.getField("justMerged") &&
        element_at(out, -1) === lit(l) && x === lit(r)
      when(
        canMerge,
        struct(
          concat(slice(out, lit(1), size(out) - 1), array(lit(l + r))).as("out"),
          lit(true).as("justMerged")
        )
      ).otherwise(
        struct(concat(out, array(x)).as("out"), lit(false).as("justMerged"))
      )
    }
    aggregate(s, zero, step, acc => acc.getField("out"))
  }

  /** A document frame collapsed to `(word, freq)` — the ONLY
    * corpus-proportional step of BPE training, and the quantity that makes
    * the training INCREMENTALLY MAINTAINABLE: word counts are additive
    * (count(base ∪ batch) = count(base) + count(batch), exactly), so a
    * persisted base table plus a batch scan reproduces the full-corpus
    * counts bit-for-bit — unlike merge tables themselves, which are a
    * greedy sequential function of the counts and never compose.
    */
  private[graft] def wordCounts(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Adds the symbol column `s`: the word split into single-character
    * symbols, the state each merge iteration rewrites.
    */
  private def symbolize(vocab: DataFrame): DataFrame =
    // char split can emit a trailing "" (Java split semantics at limit
    // -1); an empty symbol would fabricate pairs — strip it
    vocab.withColumn("s", expr("filter(split(word, ''), x -> x != '')"))

  /** The corpus collapsed to `(word, freq, s)` where `s` is the word split
    * into single-character symbols — the frame every merge iteration runs
    * on.
    */
  private[graft] def vocabFrame(spark: SparkSession, dir: String): DataFrame =
    symbolize(wordCounts(Tables.documents(spark, dir)))

  /** V1 — the learned merge table `(merge_rank, left, right, pair_cnt)`:
    * rank-k row is the k-th most frequent adjacent pair at the time it was
    * merged (corpus-frequency-weighted), ties broken by (left, right)
    * lexicographic order so the table is deterministic. Oracle-checked:
    * the fixed-depth induction unrolls into DuckDB SQL (one materialized
    * CTE round per merge — `SparkEntry.bpeMergesOracle`), giving a true
    * cross-engine differential on top of BpeSpec's replay against the
    * independent plain-Scala reference.
    */
  /** The induction loop itself: returns the merge table AND the vocabulary
    * in its final segmented state (each word as its post-merge symbols) —
    * [[bpeMerges]] publishes the former, [[bpeTokenCount]] consumes the
    * latter.
    */
  private def learn(
      spark: SparkSession,
      dir: String,
      numMerges: Int
  ): (Seq[(Int, String, String, Long)], DataFrame) =
    learnFromVocab(vocabFrame(spark, dir), numMerges)

  /** The induction loop over an arbitrary `(word, freq, s)` frame —
    * [[learn]] feeds it the full-corpus collapse, [[bpeIncrementalCache]]
    * the maintained-counts merge.
    */
  private def learnFromVocab(
      vocab0: DataFrame,
      numMerges: Int
  ): (Seq[(Int, String, String, Long)], DataFrame) = {
    var vocab  = vocab0.localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var k      = 0
    var done   = false
    while (k < numMerges && !done) {
      val top = vocab
        // single-symbol words have no pairs — and sequence(1, 0) is a
        // DESCENDING ramp, not empty, so they must not reach the transform
        .where(size(col("s")) >= 2)
        .select(
          col("freq"),
          explode(expr("transform(sequence(1, size(s) - 1), i -> struct(s[i-1] AS l, s[i] AS r))")).as("p")
        )
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .head(1)
      if (top.isEmpty) done = true // every word is a single symbol
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        k += 1
        merges += ((k, l, r, cnt))
        vocab = vocab.withColumn("s", applyMerge(col("s"), l, r)).localCheckpoint()
      }
    }
    (merges.result(), vocab)
  }

  /** Bump whenever the persisted layout or the induction itself changes:
    * the version folds into the cache key so an artifact trained under an
    * older scheme can never be silently reused by newer readers.
    */
  private[graft] val BpeSchemeVersion = 2 // v2: vocab.parquet gains `subs`, the word's post-merge symbols

  /** The trained tokenizer as a PERSISTED layout — `merges.parquet`
    * (merge_rank, left, right, pair_cnt) and `vocab.parquet`
    * (word, subs: the word's post-merge symbol array — v5's encode source —
    * and n_sub, its length) under a
    * content-fingerprinted [[graft.sources.LayoutCache]] key. A tokenizer
    * is trained ONCE and consumed everywhere — exactly the MinHash-index /
    * sq8 contract: v1 was the only registered component that re-ran a
    * trainable induction (~2 jobs × 20 merges) on every invocation, and v2
    * re-ran it AGAIN. Now the induction runs once per (corpus content,
    * merge count, scheme version); v1 is a layout read, v2 a broadcast
    * join against it, and regenerating the corpus in place rebuilds the
    * artifact instead of silently serving a stale vocabulary (the
    * staleness contract RobustnessSpec pins for every layout).
    */
  private[graft] def bpeLayoutCache(spark: SparkSession, dir: String, numMerges: Int): String = {
    val key = LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"bpe-v$BpeSchemeVersion#$numMerges"
    )
    LayoutCache.getOrBuild(spark, "graft_bpe", key) { out =>
      import spark.implicits._
      val (merges, vocab) = learn(spark, dir, numMerges)
      merges
        .toDF("merge_rank", "left", "right", "pair_cnt")
        .select(col("merge_rank").cast("long"), col("left"), col("right"), col("pair_cnt"))
        .write.mode("overwrite").parquet(s"$out/merges.parquet")
      vocab
        .select(col("word"), col("s").as("subs"), size(col("s")).cast("long").as("n_sub"))
        .write.mode("overwrite").parquet(s"$out/vocab.parquet")
    }
  }

  /** V1 — see object scaladoc; the registered merge-table surface. Reads
    * the persisted layout ([[bpeLayoutCache]]); the induction itself runs
    * only on a cache miss.
    */
  def bpeMerges(spark: SparkSession, dir: String,
      numMerges: Int = -1 // -1 = the graft.bpe.merges session knob (DefaultMerges unset)
  ): DataFrame =
    Tables.cachedRead(spark, s"${bpeLayoutCache(spark, dir, resolveMerges(spark, numMerges))}/merges.parquet")
      .orderBy("merge_rank")

  /** -1 → the `graft.bpe.merges` session knob ([[DefaultMerges]] unset). */
  private def resolveMerges(spark: SparkSession, m: Int): Int =
    if (m > 0) m else graft.GraftConf.int(spark, "bpe.merges", DefaultMerges)

  /** V2 — per-document BPE token count under the learned vocabulary
    * `(doc_id, n_bpe_tokens)`: the number the data loader actually budgets
    * by (d1's whitespace count is the pre-tokenizer proxy). The corpus is
    * NOT re-segmented word by word: the final vocabulary already carries
    * each word's post-merge symbol count, so the corpus token stream
    * equi-joins the BROADCAST `(word → n_subtokens)` table — vocabulary
    * size is bounded and corpus-independent, the same broadcast-dimension
    * shape as d8's benchmark index — and sums per document.
    */
  def bpeTokenCount(spark: SparkSession, dir: String,
      numMerges: Int = -1 // -1 = the graft.bpe.merges session knob
  ): DataFrame = {
    val perWord = Tables.cachedRead(spark, s"${bpeLayoutCache(spark, dir, resolveMerges(spark, numMerges))}/vocab.parquet")
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .join(broadcast(perWord), "word")
      .groupBy("doc_id")
      .agg(sum("n_sub").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** V5 — per-document BPE ENCODE `(doc_id, n_bpe_tokens, bpe_text)`: each
    * document re-expressed as its subtoken sequence under the learned
    * vocabulary — the corpus-wide operation a training pipeline actually
    * runs after induction (v1 learns, v5 applies). Same scale shape as v2:
    * the corpus is never re-segmented word by word — the persisted
    * vocabulary carries each word's post-merge SYMBOLS (`subs`), so the
    * token stream equi-joins the broadcast `(word → subs)` table and each
    * document's sequence reassembles in word order via an in-group sort of
    * `(pos, subs)` structs (distinct positions ⇒ the struct sort is total;
    * no ranking window, no corpus shuffle beyond the one doc_id exchange).
    * `bpe_text` joins subtokens with spaces — a deterministic, hash-friendly
    * serialization of the sequence. Oracle-checked via the unrolled
    * induction SQL (`SparkEntry.bpeEncodeOracle` re-encodes the corpus from
    * the final CTE round's segmentation state); BpeSpec additionally
    * replays the reference segmentation and pins v5's count column ≡ v2.
    */
  def bpeEncode(spark: SparkSession, dir: String,
      numMerges: Int = -1 // -1 = the graft.bpe.merges session knob
  ): DataFrame = {
    val perWord = Tables.cachedRead(spark, s"${bpeLayoutCache(spark, dir, resolveMerges(spark, numMerges))}/vocab.parquet")
      .select("word", "subs")
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
      .join(broadcast(perWord), "word")
      .groupBy("doc_id")
      .agg(flatten(expr("transform(array_sort(collect_list(struct(pos, subs))), x -> x.subs)")).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_bpe_tokens"),
        concat_ws(" ", col("toks")).as("bpe_text")
      )
      .orderBy("doc_id")
  }

  /** The maintained word-count table for the base slice
    * `doc_id < batchStartId` — v4's persisted rung, exactly the n5/n12
    * maintenance contract applied to tokenizer training: the artifact a
    * daily pipeline keeps current so re-training after a batch never
    * re-tokenizes the historical corpus.
    */
  private[graft] def wordCountCache(spark: SparkSession, dir: String, batchStartId: Long): String = {
    val key = LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"bpewords-v$BpeSchemeVersion#$batchStartId"
    )
    LayoutCache.getOrBuild(spark, "graft_bpewords", key) { out =>
      wordCounts(Tables.documents(spark, dir).where(col("doc_id") < batchStartId))
        .write.mode("overwrite").parquet(s"$out/words.parquet")
    }
  }

  /** V4's trained-from-maintained-counts merge table as a persisted layout
    * (so the registered query is a layout read, like v1).
    */
  private[graft] def bpeIncrementalCache(spark: SparkSession, dir: String, numMerges: Int): String = {
    val all = Tables.documents(spark, dir)
    // n5's batch convention: ids < k are the historical corpus, ids ≥ k
    // the arriving batch (coalesce: empty corpus → both halves empty)
    val k = all.agg(expr("coalesce((max(doc_id) + 1) div 2, 0)").as("k")).head().getLong(0)
    val key = LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"bpei-v$BpeSchemeVersion#$numMerges#$k"
    )
    LayoutCache.getOrBuild(spark, "graft_bpei", key) { out =>
      val base  = Tables.cachedRead(spark, s"${wordCountCache(spark, dir, k)}/words.parquet")
      val batch = wordCounts(all.where(col("doc_id") >= k))
      // additive count merge — bit-exact vs a full-corpus recount, which
      // is what makes the retrain ≡ v1 (BpeSpec pins the equality)
      trainFromCounts(spark, base.unionByName(batch), numMerges)
        .write.mode("overwrite").parquet(s"$out/merges.parquet")
    }
  }

  /** Retrain the merge table from an arbitrary (word, freq) frame — words
    * may repeat across count segments (summed here, which is exactly why
    * segment maintenance is bit-exact: counts are additive longs). Shared
    * by [[bpeIncrementalCache]] (base + one batch) and the streaming twin
    * ([[graft.streaming.TokenizerStream]], N streamed segments) — one
    * definition so no maintained tokenizer can train differently from the
    * full recompute.
    */
  private[graft] def trainFromCounts(spark: SparkSession, counts: DataFrame, numMerges: Int): DataFrame = {
    import spark.implicits._
    val merged      = symbolize(counts.groupBy("word").agg(sum("freq").as("freq")))
    val (merges, _) = learnFromVocab(merged, numMerges)
    merges
      .toDF("merge_rank", "left", "right", "pair_cnt")
      .select(col("merge_rank").cast("long"), col("left"), col("right"), col("pair_cnt"))
  }

  private[graft] def resolveMergesKnob(spark: SparkSession, m: Int): Int = resolveMerges(spark, m)

  /** V4 — INCREMENTAL tokenizer training: the merge table re-derived after
    * the daily batch (n5's split: docs ≥ (max+1)/2) from the MAINTAINED
    * word-count table plus a batch-only scan. Because BPE's induction
    * consumes only `(word, freq)` and counts are additive, the result is
    * BIT-IDENTICAL to v1's full retrain on the grown corpus — but the
    * historical corpus is never re-tokenized: per-day cost is one batch
    * scan plus the induction over the (bounded, distinct-word-sized)
    * vocabulary frame. The same shape real tokenizer trainers use at scale
    * (train on a word-frequency dictionary, not the raw corpus).
    * Oracle-checked: shares v1's unrolled-induction SQL string — the
    * additive-counts argument above says the answers are bit-identical, so
    * one oracle serves both; BpeSpec additionally pins exact equality with
    * v1's merge table and with the plain-Scala reference.
    */
  def bpeMergesIncremental(spark: SparkSession, dir: String,
      numMerges: Int = -1 // -1 = the graft.bpe.merges session knob
  ): DataFrame =
    Tables.cachedRead(spark, s"${bpeIncrementalCache(spark, dir, resolveMerges(spark, numMerges))}/merges.parquet")
      .orderBy("merge_rank")
}
