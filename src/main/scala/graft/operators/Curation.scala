package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Corpus-curation operators for a training-data pipeline: stable global ids,
  * sequence packing, benchmark decontamination, and mixture sampling. These
  * are the steps that sit between cleaning/dedup ([[Pipeline]], [[Dedup]])
  * and the trainer's data loader, and each is written in the only shape that
  * survives 100 TB:
  *
  *   - global ids ([[globalIds]]): range-partitioned sort + per-partition
  *     offsets — never a single-partition `row_number() OVER (ORDER BY …)`.
  *   - packing ([[sequencePack]]): windowed cumulative sums partitioned by
  *     source, so no partition ever holds the whole corpus.
  *   - decontamination ([[decontaminate]]): inverted-index join of 8-byte
  *     shingle hashes against a BROADCAST benchmark index — eval suites are
  *     tiny next to the corpus, so the corpus never shuffles at all.
  *   - mixture sampling ([[mixtureSample]]): a deterministic per-row hash
  *     threshold — no `rand()`, so retries/recomputations of a partition
  *     reproduce the same sample (rand() under task retry silently changes
  *     the output), and the sample is reproducible across runs by anyone
  *     holding the rate table.
  *
  * The reference engine stops at scan/filter/aggregate (`Config/QueryType
  * .cs:3-12`); everything here is the training-pipeline extension layer the
  * builder brief asks for on top of that surface.
  */
object Curation {

  /** G1 — stable global row ids 0..n−1 in (source, doc_id) order.
    *
    * The naive form — `row_number() OVER (ORDER BY source, doc_id)` — is a
    * single-partition window: the whole corpus funnels through one task, the
    * definition of a scale-killer. The scalable equivalent is the two-pass
    * layout Spark's `zipWithIndex` implements over a range-sorted RDD:
    * `orderBy` range-partitions so partition i's keys all precede partition
    * i+1's, a count-per-partition pass (one tiny job, O(partitions) driver
    * state) yields each partition's starting offset, and a narrow map adds
    * offset + local position. Total cost: one sort shuffle + one narrow
    * pass — no step ever sees more than one partition of data. This is the
    * one registered operator that drops to the RDD API, precisely because
    * "my global position" is per-partition imperative state that no
    * DataFrame operator expresses without the single-partition window.
    */
  def globalIds(spark: SparkSession, dir: String): DataFrame =
    zipIndexedByOrder(
      Tables
        .documents(spark, dir)
        .select(col("doc_id"), col("source"))
        .orderBy("source", "doc_id"),
      "global_id"
    )

  /** Prepend a 0-based global position to an ALREADY range-sorted frame via
    * `zipWithIndex` — the two-pass scalable substitute for a
    * single-partition `row_number() OVER (ORDER BY …)` that [[globalIds]]'s
    * scaladoc derives. The result is already globally ordered by
    * construction: orderBy range-partitions so partition i's rows all
    * precede partition i+1's, zipWithIndex numbers in that same order, and
    * no exchange follows — an explicit orderBy here would re-shuffle and
    * re-sort the corpus a second time just to restate an ordering the
    * narrow plan already guarantees.
    */
  private[operators] def zipIndexedByOrder(sorted: DataFrame, posName: String): DataFrame = {
    val schema = StructType(
      StructField(posName, LongType, nullable = false) +: sorted.schema.fields.toSeq
    )
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(i +: r.toSeq) }
    sorted.sparkSession.createDataFrame(indexed, schema)
  }

  /** Context-window token budget for [[sequencePack]] — small enough that
    * every source yields several packs on the test corpora.
    */
  val PackBudget = 512L

  /** P2 — sequence packing: assign each document to the training context
    * window in which it STARTS when documents are concatenated in
    * (doc_id) order within each source and chunked every [[PackBudget]]
    * tokens — the standard "concat and chunk" packing LLM data loaders run.
    * `pack_id = floor(tokens_before_doc / budget)`, where tokens_before is
    * a running sum over a window PARTITIONED BY source: each source packs
    * independently, so the window shuffle spreads across sources and no
    * partition needs the global corpus order (a global pack stream would be
    * the same single-partition funnel [[globalIds]] avoids; per-source —
    * or per-(source, day) at real scale — is how packing parallelizes).
    * Integer arithmetic only: token counts and the running sum are longs,
    * `div` is floor division on non-negatives, so the oracle matches bit
    * for bit.
    */
  def sequencePack(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")
      )
    val w = Window
      .partitionBy("source")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum("n_tokens").over(w))
      .withColumn("pack_id", expr(s"(cum - n_tokens) div $PackBudget"))
      .select("source", "doc_id", "n_tokens", "pack_id")
      .orderBy("source", "doc_id")
  }

  /** Per-source token budget for [[tokenBudgetMixture]] — below every test
    * source's total (~1.3–14k tokens), so the cut bites at every SF.
    */
  val MixtureBudgetTokens = 800L

  /** D30 — token-budget mixture selection: keep each source's doc_id-prefix
    * whose RUNNING token total stays within the per-source budget — the
    * "mix by tokens, not documents" rule an actual pre-training recipe
    * specifies (a source's contribution is measured in tokens a model will
    * see; doc-count sampling like d9/d10 over-weights short-doc sources).
    * Greedy prefix in doc_id order is the deterministic contract: the
    * selection is a pure function of (corpus, budget) with no RNG, so the
    * DuckDB oracle replays it bit-for-bit from the same cumulative-sum
    * window. Same scale shape as [[sequencePack]]: the window is
    * PARTITIONED BY source (per-source budgets are independent), so the
    * one shuffle spreads across sources and nothing ever needs the global
    * corpus order. Integer arithmetic only.
    */
  def tokenBudgetMixture(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")
      )
    val w = Window
      .partitionBy("source")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum_tokens", sum("n_tokens").over(w))
      .where(col("cum_tokens") <= MixtureBudgetTokens)
      .select("source", "doc_id", "n_tokens", "cum_tokens")
      .orderBy("source", "doc_id")
  }

  /** Token band width and batch size for [[lengthBucketedBatches]]. */
  val BucketTokens = 16L
  val BatchDocs    = 8L

  /** P7 — length-bucketed batching with padding-waste accounting: assign
    * each document to a token-length band (`n_tokens div 16`), order each
    * band by doc_id, and cut fixed [[BatchDocs]]-document batches — the
    * batching rule serving/training loaders use so a batch pads every
    * member only up to its LONGEST member instead of the corpus maximum.
    * The output is the per-batch ledger `(bucket, batch_id, n_docs,
    * max_tokens, pad_waste)` where `pad_waste = n_docs·max − Σtokens` is
    * exactly the padding the bucketing exists to minimize — the number a
    * pipeline inspects to pick the band width. In-band position comes from
    * a window PARTITIONED BY bucket (bounded band count × independent
    * shuffles — never the [[globalIds]] single-partition funnel; at real
    * scale the band key would extend to (bucket, day) exactly like p2's
    * source). All integers → the oracle replays the cut bit-for-bit.
    */
  def lengthBucketedBatches(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables
      .documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"n_tokens div $BucketTokens"))
    t.withColumn("batch_id", expr(s"(row_number() over (partition by bucket order by doc_id) - 1) div $BatchDocs"))
      .groupBy("bucket", "batch_id")
      .agg(
        count(lit(1)).as("n_docs"),
        max("n_tokens").as("max_tokens"),
        (count(lit(1)) * max("n_tokens") - sum("n_tokens")).as("pad_waste")
      )
      .orderBy("bucket", "batch_id")
  }

  /** Benchmark membership rule for [[decontaminate]]: every 50th document
    * stands in for the held-out eval suite. Deterministic and
    * oracle-expressible; in production this is "the benchmark table".
    */
  private def isBench = col("doc_id") % 50 === 0

  /** Needle width (characters) for [[substringDecontaminate]]. */
  val NeedleChars = 24

  /** Rarest grams probed per needle by [[substringDecontaminate]]'s
    * candidate join — any subset of a needle's grams admits a superset
    * of true matches, so this bounds join volume without touching
    * exactness (the contains verify is the truth source).
    */
  val NeedleProbeGrams = 4

  /** D32 — SUBSTRING-level decontamination: the stricter, character-exact
    * contamination check next to d8's token-shingle overlap (the
    * distinction eval-suite reports draw between "n-gram overlap" and
    * "verbatim inclusion"). Each benchmark document contributes one
    * [[NeedleChars]]-char needle (its prefix); a training document is
    * flagged per benchmark needle it contains VERBATIM.
    *
    * The engine side is t8's trigram index generalized from one pattern
    * to a pattern TABLE: every needle's distinct character trigrams join
    * the gram-keyed postings in ONE batched join (cost = Σ posting
    * lengths of the needles' grams — never needles × corpus), a
    * per-(doc, needle) gram-count check keeps only docs carrying ALL of
    * a needle's grams, and the exact `contains` verify touches candidate
    * text only. At a benchmark suite of 10⁵ needles against 100 TB this
    * is the difference between a scan per needle and one indexed join —
    * the same argument that makes t8 viable, amortized across the suite.
    * The trigram filter is a PRE-FILTER, never a truth source (d20's
    * discipline): the oracle is the direct contains join.
    */
  def substringDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val needles = docs
      .where(isBench)
      .select(col("doc_id").as("bench_id"), substring(col("text"), 1, NeedleChars).as("needle"))
      .where(length(col("needle")) >= 3)
    val ngrams = needles.select(
      col("bench_id"),
      explode(
        expr("array_distinct(transform(sequence(0, length(needle) - 3), i -> substring(needle, i + 1, 3)))")
      ).as("g")
    )
    val layout = TextAnalysis.trigramLayoutCache(spark, dir)
    val tri = Tables.cachedRead(spark, s"$layout/trigrams.parquet")
      .where(col("doc_id") % 50 =!= 0)
    // Rarest-K gram selection (classic multi-pattern optimization): the
    // candidate join need not use EVERY gram of a needle — any subset
    // still yields a superset of true matches (the contains verify keeps
    // exactness), so probe only each needle's [[NeedleProbeGrams]]
    // lowest-df grams. Join volume drops from Σ df(all grams) to
    // Σ df(rarest K): on real text rare trigrams have tiny df and the
    // batched join stays near-linear in the needle count. (Grams absent
    // from the corpus keep df = 0 — cheapest possible probes, correctly
    // yielding zero candidates.) df comes from the layout's PERSISTED
    // (g, df) table — the build pays the aggregation once per corpus
    // version instead of every query re-scanning the full posting index
    // (the r14 bench's only flagged regression). The persisted df counts
    // ALL docs (including the bench split this query filters out of the
    // postings); ranking by the slightly-larger corpus-wide df can only
    // reorder WHICH grams probe, never the final answer — any probe
    // subset yields a candidate superset and the contains verify is the
    // truth source.
    val dfByGram = Tables.cachedRead(spark, s"$layout/gramdf.parquet")
    val rarest = ngrams
      .join(dfByGram, Seq("g"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn(
        "rk",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("bench_id")
            .orderBy(col("df"), col("g"))
        )
      )
      .where(col("rk") <= NeedleProbeGrams)
      .select("bench_id", "g")
    val probeCount = rarest.groupBy("bench_id").agg(count(lit(1)).as("n_g"))
    val cand = tri
      .join(rarest, "g")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("ng"))
      .join(broadcast(probeCount), "bench_id")
      .where(col("ng") === col("n_g"))
      .select("doc_id", "bench_id")
    cand
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .join(broadcast(needles), "bench_id")
      .where(col("text").contains(col("needle")))
      .groupBy("doc_id")
      .agg(countDistinct("bench_id").as("n_bench_needles"))
      .orderBy("doc_id")
  }

  /** D8 — train/eval decontamination: for every training document, count the
    * benchmark documents and distinct shingles it shares a 3-gram with —
    * the contamination report a pipeline runs before shipping a corpus that
    * might contain its own eval set. Same inverted-index shape as
    * [[Dedup.ngramJaccardPairs]], with the asymmetry that makes it cheap at
    * 100 TB: the benchmark side is an eval suite (thousands of docs), so its
    * hashed shingle index is BROADCAST and the corpus-side shingle stream is
    * probed in place — a map-side join, zero shuffle of the corpus, with
    * only the (rare) matching rows aggregated per doc. Join keys are
    * xxhash64 longs (8 bytes, not ~25-byte shingle text); exact up to
    * hash collisions (~n²/2⁶⁴ — see [[Dedup.verifyPairs]]).
    */
  /** The distinct per-doc shingle-hash stream `(doc_id, h)`, exploded from
    * the persisted MinHash artifact's shingle sets
    * ([[Dedup.minhashArtifactsCached]] stores `ss = collect_set(xxhash64(s))`)
    * — the same one-tokenize-for-the-family move n3 makes. d8/d20 only see
    * `h` through a join plus `countDistinct`, so the distinct stream is
    * output-equivalent to re-shingling the corpus and skips the dominant
    * tokenize+shingle scan: at 100 TB the contamination report reads the
    * dedup family's ingest artifact instead of the corpus text.
    */
  private def shingleHashes(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .minhashArtifactsCached(spark, dir)
      ._1
      .select(col("doc_id"), explode(col("ss")).as("h"))

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val sh    = shingleHashes(spark, dir)
    val bench = sh.where(isBench).select(col("h"), col("doc_id").as("bench_id"))
    sh.where(!isBench)
      .join(broadcast(bench), "h")
      .groupBy("doc_id")
      .agg(
        countDistinct("bench_id").as("n_bench_docs"),
        countDistinct("h").as("n_shared_shingles")
      )
      .orderBy("doc_id")
  }

  /** D20 — [[decontaminate]]'s Bloom-pruned twin, the shape the exact
    * report takes when the corpus is 100 TB: the benchmark shingle set is
    * aggregated into a Bloom filter (Spark's own `bloom_filter_agg`,
    * registered by [[graft.functions.SketchFunctions]] — a few BITS per
    * entry instead of an 8-byte join key), and the corpus shingle stream is
    * pruned by a codegen'd `might_contain` probe BEFORE any join machinery
    * runs — the ~all-clean token stream drops map-side with zero state,
    * and only bloom survivors (true matches + the fpp tail) reach the
    * broadcast join that confirms exactly and attributes bench_ids.
    * OUTPUT IS IDENTICAL TO d8 — the bloom is a pre-filter, never a
    * truth source, so false positives cost a probe and change nothing —
    * and d20 shares d8's oracle. Bloom sizing: `graft.bloom.bits_per_item`
    * (default 20 ≈ 0.01% fpp) over the counted bench stream; the filter
    * rides into the plan as a literal binary (one driver pull, bounded by
    * the bench suite's size like the ANN centroid pulls).
    */
  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SketchFunctions.register(spark)
    val sh          = shingleHashes(spark, dir)
    val bench       = sh.where(isBench).select(col("h"), col("doc_id").as("bench_id"))
    val bitsPerItem = graft.GraftConf.int(spark, "bloom.bits_per_item", 20)
    val nItems      = math.max(bench.count(), 1L)
    val nBits       = math.max(1024L, nItems * bitsPerItem)
    val bf = bench
      .agg(call_function("bloom_filter_agg", col("h"), lit(nItems), lit(nBits)).as("bf"))
      .head()
      .getAs[Array[Byte]](0)
    sh.where(!isBench)
      .where(call_function("might_contain", lit(bf), col("h")))
      .join(broadcast(bench), "h")
      .groupBy("doc_id")
      .agg(
        countDistinct("bench_id").as("n_bench_docs"),
        countDistinct("h").as("n_shared_shingles")
      )
      .orderBy("doc_id")
  }

  /** D22 — SEMANTIC decontamination: d8/d20 catch verbatim n-gram overlap;
    * this catches the paraphrased leak those cannot see — for every
    * training vector, the nearest BENCHMARK vector by cosine and how many
    * benchmark vectors sit at/above `threshold`. A training doc whose
    * embedding is close to an eval item is contaminated even when no
    * 3-gram survives the paraphrase.
    *
    * Same asymmetry as d8, in vector space: the benchmark side is an eval
    * suite (thousands of vectors), so it BROADCASTS and the corpus is
    * scored in place by the codegen'd `cosine_sim` — a map-side nested
    * loop, zero shuffle of the corpus. The per-doc reduction is a plain
    * partial-aggregable struct-max + conditional count: each training
    * row's |bench| scored copies collapse map-side to ONE skinny row
    * (vec_id, argmax, n_close) before the exchange. When an eval suite
    * outgrows broadcast, the n4 banded-LSH pair join is the documented
    * escape hatch (candidates-only scoring, same verification math).
    *
    * Output is integer-only (ids and a count — floats never reach the
    * hash); the argmax tie breaks to the smallest bench id via the
    * struct's lexicographic max over `(c, -bench_id)`.
    */
  def decontaminateSemantic(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
    val bench = e
      .where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("bench_id"), col("embedding").as("bv"))
    e.where(col("vec_id") % 50 =!= 0)
      .crossJoin(broadcast(bench))
      .select(col("vec_id"), col("bench_id"), expr("cosine_sim(embedding, bv)").as("c"))
      .groupBy("vec_id")
      .agg(
        max(struct(col("c"), (-col("bench_id")).as("nb"))).as("m"),
        sum(when(col("c") >= threshold, 1L).otherwise(0L)).as("n_close")
      )
      .select(col("vec_id"), (-col("m.nb")).as("nearest_bench_id"), col("n_close"))
      .orderBy("vec_id")
  }

  /** Per-source sampling rates for [[mixtureSample]] as 4-hex-digit
    * threshold strings: a row is kept iff the first 4 hex chars of
    * `md5(doc_id)` sort strictly below the threshold, so rate =
    * threshold/65536 ("zzzz" sorts above every hex digit → keep all).
    * Thresholds live in a TABLE, not a CASE expression — mixture configs
    * are data (reweighted per experiment), and a 20-row (or 20k-row) rate
    * table broadcast-joins for free.
    */
  val MixtureRates: Seq[(String, String)] =
    (0 until 20).map { i =>
      val thr =
        if (i < 5) "zzzz" // 100%
        else if (i < 10) "8000" // 50%
        else if (i < 15) "4000" // 25%
        else "1000" // 6.25%
      (s"src$i", thr)
    }

  /** The d9 keep rule — THE single definition shared by the summary and
    * row-level variants (and mirrored verbatim by the oracle SQL): keep iff
    * the doc's md5 prefix sorts below the source's threshold column.
    */
  private def mixtureKeep: org.apache.spark.sql.Column =
    substring(md5(col("doc_id").cast("string")), 1, 4) < col("thr")

  /** D9 — deterministic mixture sampling: downsample each source to its
    * target rate from [[MixtureRates]] and report achieved counts. The keep
    * rule hashes the STABLE doc id (`md5`, shared verbatim by the oracle)
    * against the source's threshold, which buys three properties `rand()`
    * cannot give at scale: the sample is (1) reproducible across runs and
    * engines, (2) invariant under task retry and partition recomputation —
    * Spark WILL recompute partitions after executor loss, and a rand()
    * sample silently changes under it — and (3) consistent across derived
    * datasets (any downstream join sees the same kept set). Per-row hash +
    * broadcast rate join: narrow, zero corpus shuffle before the tiny
    * per-source aggregate.
    */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val rates = mixtureRatesDf(spark)
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(broadcast(rates), "source")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(mixtureKeep, 1L).otherwise(0L)).as("n_kept")
      )
      .orderBy("source")
  }

  private[graft] def mixtureRatesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    MixtureRates.toDF("source", "thr")
  }

  /** Row-level variant of [[mixtureSample]]: the kept documents themselves —
    * what downstream stages consume. Same keep rule, same determinism.
    */
  def mixtureSampleRows(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .join(broadcast(mixtureRatesDf(spark)), "source")
      .where(mixtureKeep)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")

  /** D10 — stratified FIXED-SIZE sampling: exactly `k` documents per source
    * (eval holdouts, human-review batches, per-domain probes want counts,
    * not rates — [[mixtureSample]]'s complement). The keep rule is "the k
    * smallest `md5(doc_id)` per source": a deterministic uniform draw with
    * the same retry/reproducibility properties as d9, expressed as a ranking
    * window PARTITIONED BY source — parallelism = source count, and the
    * partial TakeOrdered inside each partition never materializes more than
    * its own group. (A true reservoir sample is the streaming analogue; over
    * a static corpus the hash-rank formulation is equivalent and joins/
    * reruns reproduce it exactly.)
    */
  def stratifiedSample(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val ranked = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        row_number()
          .over(
            Window.partitionBy("source").orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
          )
          .cast("long") // driver gate compares against DuckDB's BIGINT row_number
          .as("rk")
      )
    ranked.where(col("rk") <= k).select("source", "doc_id", "rk").orderBy("source", "rk")
  }

  /** Chunk geometry for [[chunkDocuments]]: window of `ChunkTokens` tokens
    * starting every `ChunkStride` (overlap = 32 − 24 = 8) — the sliding
    * window an embedding/RAG pipeline feeds its encoder.
    */
  val ChunkTokens = 32
  val ChunkStride = 24

  /** P3 — document chunking: split each document into overlapping
    * fixed-token windows (start every [[ChunkStride]] tokens, take
    * [[ChunkTokens]], final windows clamp short) — the step between
    * cleaning and embedding in a retrieval pipeline, and the p2 packer's
    * complement (packing concatenates small docs UP to a budget; chunking
    * cuts large docs DOWN to one). Pure narrow transformation — tokenize,
    * windowed slices via `transform(sequence(...))`, `posexplode` — zero
    * shuffles before the presentation sort, so it scales with input splits
    * like the rest of the text layer.
    */
  def chunkDocuments(
      spark: SparkSession,
      dir: String,
      chunk: Int = ChunkTokens,
      stride: Int = ChunkStride
  ): DataFrame = {
    require(chunk > 0 && stride > 0)
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        posexplode(
          expr(
            s"transform(sequence(0, size(toks) - 1, $stride), s -> concat_ws(' ', slice(toks, s + 1, $chunk)))"
          )
        ).as(Seq("chunk_id", "chunk_text"))
      )
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"), col("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** D12 — per-source length deciles: `ntile(10)` over document length
    * within each source (tie-broken by doc_id so the cut is deterministic) —
    * the binning step behind "drop the bottom decile per domain" quality
    * policies, where a GLOBAL decile would let one verbose domain crowd out
    * every short-form domain. Window partitioned by source, like p2/d10:
    * parallelism = source count, nothing global.
    */
  def lengthDeciles(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("source"),
        col("doc_id"),
        col("n_chars"),
        ntile(10)
          .over(Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id")))
          .cast("long") // driver gate compares against DuckDB's BIGINT ntile
          .as("decile")
      )
      .orderBy("source", "doc_id")

  /** P4 — boundary-spanning packing: the "concat and chunk" stream that
    * [[sequencePack]] summarizes by start-pack, fully materialized — one
    * row per (document, pack) with the token count the document contributes
    * to that pack. A long document crossing pack boundaries yields one row
    * per pack it touches (`tokens_in_pack` sums back to `n_tokens`); this
    * is the exact segment layout an LLM loader needs to build attention
    * masks across packed-document boundaries.
    *
    * Same scale shape as p2: the cumulative sum windows per source (no
    * partition holds the corpus), and the pack-span explode is narrow —
    * a document spans `⌈n_tokens / budget⌉ + 1` packs at most, so the
    * fan-out is bounded by corpus tokens / budget, the same cardinality as
    * the training stream itself. Integer arithmetic throughout (floor
    * division on non-negative longs), so the oracle matches bit for bit.
    */
  def packSpans(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")
      )
    val w = Window
      .partitionBy("source")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum("n_tokens").over(w))
      .withColumn("begin", col("cum") - col("n_tokens"))
      .select(
        col("source"),
        col("doc_id"),
        col("begin"),
        col("cum"),
        explode(expr(s"sequence(begin div $PackBudget, (cum - 1) div $PackBudget)")).as("pack_id")
      )
      .withColumn(
        "tokens_in_pack",
        least(col("cum"), (col("pack_id") + lit(1L)) * PackBudget) -
          greatest(col("begin"), col("pack_id") * PackBudget)
      )
      .select("source", "doc_id", "pack_id", "tokens_in_pack")
      .orderBy("source", "doc_id", "pack_id")
  }

  /** P5 — deterministic global corpus shuffle: every document's position in
    * a pseudo-random permutation, keyed by `md5(doc_id)`. Training runs
    * shuffle the corpus exactly once before packing; doing it with `rand()`
    * makes the epoch unreproducible (and task retries silently reorder —
    * the same failure mode [[mixtureSample]]'s scaladoc pins), so the
    * permutation key is a content hash: anyone holding the ids can replay
    * the exact epoch order. Same two-pass [[zipIndexedByOrder]] layout as
    * g1 — a range-sort on the hash key spreads uniformly across partitions
    * (hash keys have no skew by construction), then a narrow zipWithIndex;
    * no single-partition window anywhere.
    */
  /** Block width for [[blockShuffleOrder]] — the loader's shuffle-buffer
    * size in documents.
    */
  val ShuffleBlockDocs = 64L

  /** P8 — BLOCK-LOCAL shuffle order: p5's epoch permutation with
    * displacement bounded to [[ShuffleBlockDocs]], the semantics of a
    * streaming loader's fixed shuffle buffer (each doc moves only within
    * its block). Same retry-stable content-hash rule as p5 — `rand()`
    * would unreproduce the epoch — but where p5's global order is a full
    * range-partition sort of the corpus EVERY epoch, p8's window is
    * partitioned by block: per-key state is ≤ block docs, and on a
    * doc_id-partitioned layout whose files align with block boundaries
    * the whole permutation is map-side — no cross-block movement at all.
    * That is the 100 TB trade a real data loader makes: bounded-memory
    * approximate shuffling instead of a corpus-wide sort.
    */
  def blockShuffleOrder(spark: SparkSession, dir: String): DataFrame = {
    val b = ShuffleBlockDocs
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        expr(s"doc_id div $b").as("block_id"),
        md5(col("doc_id").cast("string")).as("hk")
      )
      .withColumn(
        "epoch_pos",
        col("block_id") * b +
          row_number().over(Window.partitionBy("block_id").orderBy("hk", "doc_id")).cast("long") - 1L
      )
      .select("epoch_pos", "block_id", "doc_id")
      .orderBy("epoch_pos")
  }

  /** P9 — SOURCE-INTERLEAVED epoch order: documents ranked within their
    * source by the p5 content-hash rule, then emitted round-robin across
    * sources (global order = (rank, source)) — the batch-diversity
    * guarantee a mixture trainer wants: consecutive loader positions
    * cycle through every still-live source instead of running a hot
    * source dry first. Deterministic and retry-stable like p5/p8 (no
    * `rand()`), and the mixture proportions over any prefix track d9's
    * targets as closely as a deterministic order can.
    *
    * Scale shape: the per-source rank window is source-keyed (skew bound
    * = the largest single source); the dense `epoch_pos` then costs one
    * range-partition sort on (rank, source) — the same total-order cost
    * p5 pays, inherent to emitting a dense ordinal. A consumer that can
    * accept the (rank, source) composite key as its order skips that
    * final sort entirely.
    */
  def sourceInterleaveOrder(spark: SparkSession, dir: String): DataFrame = {
    val ranked = Tables
      .documents(spark, dir)
      .select(col("source"), col("doc_id"), md5(col("doc_id").cast("string")).as("hk"))
      .withColumn(
        "rk",
        row_number().over(Window.partitionBy("source").orderBy("hk", "doc_id")).cast("long")
      )
    zipIndexedByOrder(ranked.orderBy("rk", "source"), "epoch_pos")
      .select("epoch_pos", "source", "doc_id")
  }

  def shuffleOrder(spark: SparkSession, dir: String): DataFrame =
    zipIndexedByOrder(
      Tables
        .documents(spark, dir)
        // doc_id breaks md5 ties; with 128-bit keys a tie never fires, but
        // determinism must not rest on "collisions are unlikely"
        .select(md5(col("doc_id").cast("string")).as("hk"), col("doc_id"))
        .orderBy("hk", "doc_id"),
      "shuffle_pos"
    ).select("shuffle_pos", "doc_id")

  /** P6 — CURRICULUM order: the epoch order a staged ("easy/clean first")
    * training run feeds the loader — documents bucketed into quality
    * quartiles by their LM score (phase 1 = best quarter), then
    * pseudo-randomly shuffled WITHIN each phase by a content hash (p5's
    * retry-stable rule — `rand()` would unreproduce the epoch). Composes
    * two proven pieces: the persisted v3 score layout (the corpus is never
    * re-tokenized; the score table is doc-count-sized) and d21's
    * `percentile` ≡ `quantile_cont` cross-engine parity, extended to three
    * cutoffs. Phase assignment is a narrow map against three broadcast
    * cutoffs — no global ranking window, no single-partition anything; the
    * only wide op is the final order-by, which range-partitions on
    * (phase, hash) like every sorted output. Docs with < 2 tokens carry no
    * LM score and are absent, the d21 contract.
    */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    val scores = Tables.cachedRead(spark, s"${TextAnalysis.lmScoreLayoutCache(spark, dir)}/scores.parquet")
    val cuts = scores.agg(
      expr("percentile(lm_q, 0.75)").as("c75"),
      expr("percentile(lm_q, 0.5)").as("c50"),
      expr("percentile(lm_q, 0.25)").as("c25")
    )
    scores
      .crossJoin(broadcast(cuts))
      .select(
        when(col("lm_q") >= col("c75"), 1)
          .when(col("lm_q") >= col("c50"), 2)
          .when(col("lm_q") >= col("c25"), 3)
          .otherwise(4)
          .as("phase"),
        col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit("#curriculum"))).as("order_key")
      )
      .orderBy("phase", "order_key", "doc_id")
  }

  /** D23 — LEAKAGE-SAFE holdout split: assign every document to
    * train/holdout by hashing its near-dup CLUSTER key, not its own id.
    *
    * Splitting by `md5(doc_id)` — the obvious rule, and what d9/d10 do for
    * *sampling* — is wrong for a train/eval split: two near-duplicate
    * documents hash independently, land on opposite sides, and the eval set
    * silently contains paraphrases of training rows (the leak d22 exists to
    * detect, created by the splitter itself). The fix is to hash one key
    * per near-dup cluster: `cluster_key = min-id representative` from the
    * persisted n6 cluster table for clustered docs, the doc's own id for
    * untouched docs. Every member of a cluster shares the key, so the whole
    * cluster lands on one side — by construction, not by audit.
    *
    * Split rule: first hex char of `md5(cluster_key)` < '4' → holdout
    * (4/16 = 25% expected mass), shared verbatim with the oracle like d9's
    * threshold rule, with the same retry/rerun determinism.
    *
    * Scale shape: the cluster table is a layout read bounded by
    * pair-touched docs (collision-bounded, not corpus-bounded); the only
    * corpus-wide work is one 8-byte left join against it plus a narrow
    * hash projection. Nothing new shuffles the corpus: this is a read +
    * one equi-join, the floor cost of any per-doc derivation.
    */
  def splitByCluster(spark: SparkSession, dir: String): DataFrame = {
    val clusters = Dedup
      .dupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    Tables
      .documents(spark, dir)
      .select("doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn(
        "split",
        when(substring(md5(col("cluster_key").cast("string")), 1, 1) < "4", "holdout")
          .otherwise("train")
      )
      .select("doc_id", "cluster_key", "split")
      .orderBy("doc_id")
  }

  /** Contamination-share policy threshold for [[contaminationGate]]: drop a
    * document when at least half of its distinct shingles appear in the
    * benchmark (2·hits ≥ total). Integer arithmetic — no float ratio ever
    * reaches the output or the decision.
    */
  val ContaminationShareNum = 1
  val ContaminationShareDen = 2

  /** D25 — contamination-FRACTION gate: the per-document keep/drop decision
    * d8's report feeds. d8 lists contaminated docs and what they matched;
    * the shipping pipeline needs a verdict for EVERY training document —
    * "what fraction of this doc's distinct 3-grams appear anywhere in the
    * benchmark, and does that cross the removal threshold?" (the n-gram
    * overlap-share policy used for eval decontamination, cf. the GPT-3/PaLM
    * appendix methodology — applied here at [[ContaminationShareNum]]/
    * [[ContaminationShareDen]]).
    *
    * Same 100 TB asymmetry as d8: the benchmark shingle-hash set BROADCASTS
    * (deduped to bare 8-byte hashes — attribution is d8's job, membership is
    * enough here), the corpus shingle stream probes it in place via a
    * left broadcast join, and one per-doc aggregate produces
    * `(n_shingles, n_hit)`. The verdict is integer cross-multiplication, so
    * the oracle matches bit for bit; exact up to xxhash64 collisions like
    * the whole shingle family ([[Dedup.verifyPairs]]).
    */
  def contaminationGate(spark: SparkSession, dir: String): DataFrame = {
    // shingles are already distinct per doc (array_distinct inside
    // Dedup.shingles) — no extra exchange needed on the corpus side
    val sh = Dedup
      .shingles(Tables.documents(spark, dir))
      .withColumn("h", xxhash64(col("s")))
      .select("doc_id", "h")
    gateAgainst(sh.where(!isBench), benchShingleHashes(spark, dir)).orderBy("doc_id")
  }

  /** The frozen benchmark-side artifact of the contamination gate: the
    * distinct 8-byte shingle hashes of the eval suite. Resolved once and
    * shared by batch d25 and [[graft.streaming.DecontaminationStream]]
    * (one definition, zero drift).
    */
  private[graft] def benchShingleHashes(spark: SparkSession, dir: String): DataFrame =
    Dedup
      .shingles(Tables.documents(spark, dir).where(isBench))
      .withColumn("h", xxhash64(col("s")))
      .select("h")
      .distinct()
      .withColumn("hit", lit(1L))

  /** The d25 verdict rule over a `(doc_id, h)` shingle-hash stream and a
    * `(h, hit)` benchmark set — THE single definition batch and stream
    * share. Broadcast membership probe + one per-doc aggregate + integer
    * cross-multiplication; no float ratio anywhere.
    */
  private[graft] def gateAgainst(docShingles: DataFrame, benchHashes: DataFrame): DataFrame =
    docShingles
      .join(broadcast(benchHashes), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit")
      )
      .withColumn(
        "verdict",
        when(
          col("n_hit") * ContaminationShareDen >= col("n_shingles") * ContaminationShareNum,
          "drop"
        ).otherwise("keep")
      )

  /** Per-source epoch repeat factors for [[mixtureEpochs]]: how many times
    * each source's documents appear per training epoch. Like
    * [[MixtureRates]] this is DATA (a broadcastable table, reweighted per
    * experiment), not code. All factors ≥ 1 — `sequence(0, r-1)` with r=0
    * would produce a DESCENDING ramp, not an empty array (Spark semantics),
    * so a source dropped from the mixture is expressed by omitting its row,
    * never by a zero factor (enforced in [[mixtureEpochsDf]]).
    */
  val EpochFactors: Seq[(String, Int)] =
    (0 until 20).map { i =>
      val reps =
        if (i < 5) 4 // high-quality sources oversampled 4×
        else if (i < 10) 2
        else 1
      (s"src$i", reps)
    }

  /** D24 — epoch-weighted mixture EXPANSION: the up-sampling half of
    * mixture construction ([[mixtureSample]] is the down-sampling half).
    * Data-mixture recipes repeat high-quality sources several times per
    * epoch (e.g. Wikipedia at 3–5× web weight in published LLM mixtures);
    * this op materializes that recipe as the actual training stream: one
    * row per (document, epoch-copy), each with a deterministic shuffle key
    * so copies of the same document scatter across the epoch instead of
    * training back-to-back.
    *
    * Scale shape: broadcast join against the factor table, then a narrow
    * `explode(sequence(...))` whose fan-out IS the output cardinality (the
    * training stream itself) — no shuffle beyond the final presentation
    * sort, which a real pipeline replaces with [[shuffleOrder]]'s
    * range-sort + zipWithIndex to get positions without a single-partition
    * window. The shuffle key hashes (doc_id, epoch) so it is retry-stable
    * and replayable by anyone holding the ids, like every sampling rule in
    * this file.
    */
  def mixtureEpochs(spark: SparkSession, dir: String): DataFrame = {
    val factors = mixtureEpochsDf(spark)
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(broadcast(factors), "source")
      .select(
        col("doc_id"),
        col("source"),
        explode(expr("sequence(0L, cast(reps as long) - 1)")).as("epoch")
      )
      .withColumn(
        "shuffle_key",
        md5(concat(col("doc_id").cast("string"), lit(":"), col("epoch").cast("string")))
      )
      .orderBy("doc_id", "epoch")
  }

  private[graft] def mixtureEpochsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(
      EpochFactors.forall(_._2 >= 1),
      "epoch repeat factors must be >= 1 (omit a source to drop it; sequence(0, -1) is a descending ramp, not empty)"
    )
    EpochFactors.toDF("source", "reps")
  }
}
