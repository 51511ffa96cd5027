package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality summary an ingest pipeline publishes
  * beside every landed table: per column, row count, non-null count, and
  * exact distinct count.
  */
object Profile {

  /** Per-column profile of `df` as rows (col_name, n_rows, n_nonnull,
    * n_distinct). ONE pass over the data: all per-column aggregates ride a
    * single global aggregation, then a `stack` unpivot reshapes the 1-row
    * result — the table itself is never unpivoted (exploding every cell
    * into (column, value) rows before aggregating would shuffle
    * columns× the table). Multiple exact COUNT(DISTINCT)s make Catalyst
    * plan an Expand (one duplicated stream per distinct aggregate) — the
    * price of exactness; at 100 TB the drop-in relaxation is
    * `approx_count_distinct` per column (HLL, no Expand), with this exact
    * form as its oracle at test scale.
    */
  def profile(df: DataFrame): DataFrame = {
    // generic entry point ⇒ column names are data, not identifiers: every
    // reference is backtick-quoted (backticks doubled) so names with
    // spaces/dots/quotes profile too — bare col("a.b") would resolve as a
    // struct field access, and bare interpolation into stack() would not
    // parse; string literals escape quotes/backslashes
    def strLit(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def ident(s: String)  = "`" + s.replace("`", "``") + "`"
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(count(col(ident(c))).as(s"__nn_$c"), countDistinct(col(ident(c))).as(s"__nd_$c"))
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"${strLit(c)}, ${ident(s"__nn_$c")}, ${ident(s"__nd_$c")}")
      .mkString(", ")
    wide
      .select(
        expr(s"stack(${cols.length}, $stackArgs) as (col_name, n_nonnull, n_distinct)"),
        col("__n").as("n_rows")
      )
      .select("col_name", "n_rows", "n_nonnull", "n_distinct")
      .orderBy("col_name")
  }

  /** DQ1 — the registered surface: profile of the `events` table, read RAW
    * ([[Tables.eventsRaw]]): the nanos long is bijective with the file's
    * TIMESTAMP(NANOS) values, so `n_distinct(ts)` counts at the SAME
    * precision as the DuckDB oracle's ns timestamps — profiling the
    * µs-normalized view would undercount whenever two events share a µs
    * but differ at ns.
    */
  def profileEvents(spark: SparkSession, dir: String): DataFrame =
    // fanOut tried and REVERTED (r22): the fan shuffles every column
    // (text included) to parallelize an aggregation whose single-task CPU
    // is ~0.4 s — measured 0.53 -> 0.74 s. The scan-fused Expand wins here.
    profile(Tables.eventsRaw(spark, dir))

  /** DQ2 — [[profile]] of the `documents` table: the corpus-side twin of
    * dq1, published before a corpus enters the training pipeline (a
    * distinct-count collapse on `text` is mass duplication; nulls in
    * `source` break the mixture sampler's rate join). Same one-pass shape.
    */
  def profileDocuments(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.documents(spark, dir))

  /** DQ4 — cross-modality coverage: the docs↔embeddings referential audit
    * a multimodal pipeline publishes before training (a doc without an
    * embedding silently drops out of every semantic stage — n4, n10, the
    * s-family, t5;
    * an embedding without a doc is a stale or mis-keyed vector that would
    * resurface deleted content in retrieval). One row:
    * `(n_docs, n_vecs, n_docs_no_vec, n_vecs_no_doc)`.
    *
    * Scale shape: ONE full-outer hash join on the 8-byte id — both sides
    * column-pruned to their key, neither text nor vector payloads ever
    * move — then all four counts ride a single partial-aggregable pass
    * over the joined id stream (two anti-joins + two counts would read
    * both tables twice and join twice). Exact SQL oracle.
    */
  def modalityCoverage(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id")).withColumn("d", lit(1))
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id")).withColumn("v", lit(1))
    docs
      .join(vecs, docs("doc_id") === vecs("vec_id"), "full_outer")
      .agg(
        count("d").as("n_docs"),
        count("v").as("n_vecs"),
        // count(when), not sum(when): sum over ZERO rows (both tables
        // empty) is NULL, which breaks the four-counts contract and the
        // oracle's 0s; count is never null
        count(when(col("v").isNull, lit(1))).as("n_docs_no_vec"),
        count(when(col("d").isNull, lit(1))).as("n_vecs_no_doc")
      )
  }

  /** DQ3 — [[profile]]'s 100 TB form: `approx_count_distinct` (HLL++)
    * instead of exact COUNT(DISTINCT). The exact form plans a Catalyst
    * Expand — one duplicated input stream per distinct aggregate, so
    * profiling k columns exactly re-streams the table k times through the
    * exchange; HLL sketches are mergeable partial aggregates, so all k
    * ride ONE pass with no Expand and the shuffle carries fixed-size
    * sketch bytes. dq1/dq2 stay the exact oracle rungs at test scale; this
    * is the rung a 100 TB table actually runs (same rsd=0.02 the x1
    * operator pins). No SQL oracle — sketch state is engine-internal — so
    * its gate is the spec bound against the exact twin.
    */
  def profileApprox(df: DataFrame): DataFrame = {
    def strLit(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def ident(s: String)  = "`" + s.replace("`", "``") + "`"
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(ident(c))).as(s"__nn_$c"),
        approx_count_distinct(col(ident(c)), 0.02).as(s"__nd_$c")
      )
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"${strLit(c)}, ${ident(s"__nn_$c")}, ${ident(s"__nd_$c")}")
      .mkString(", ")
    wide
      .select(
        expr(s"stack(${cols.length}, $stackArgs) as (col_name, n_nonnull, n_distinct_approx)"),
        col("__n").as("n_rows")
      )
      .select("col_name", "n_rows", "n_nonnull", "n_distinct_approx")
      .orderBy("col_name")
  }

  /** The registered dq3 surface: approx profile of `events` (raw, like dq1
    * — same ns-precision distinct semantics to bound against).
    */
  def profileEventsApprox(spark: SparkSession, dir: String): DataFrame =
    // fanOut tried and REVERTED (r22): the imperative HLL partial pass
    // measured ~13x MORE total CPU consuming shuffled rows than fused
    // with the vectorized scan (20 vs 1.5 cpu-sec) — wall 1.35 -> 2.6 s.
    profileApprox(Tables.eventsRaw(spark, dir))


  /** D17 — log₂-bucketed document-size histogram per source `(source,
    * size_class, n_docs)`: the shape report behind length-based curation
    * decisions (a source whose mass sits in 2⁴-char docs is boilerplate; a
    * fat 2²⁰ tail is concatenation junk). `size_class = ⌊log₂ n_chars⌋ + 1`
    * — computed as `length(bin(n_chars))`, the binary-representation
    * length, because both engines define `bin` identically on integers and
    * integer string length is EXACT: a float `log2` would hash-differ at
    * powers of two on rounding direction. Single partial-aggregable
    * groupBy, ~60 distinct keys per source, no meaningful shuffle.
    */
  def sizeHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .groupBy(col("source"), length(bin(col("n_chars"))).cast("long").as("size_class"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "size_class")

  /** D19 — exact-duplicate rate per source `(source, n_docs, n_exact_dups)`:
    * q8's corpus-wide dup diagnosis broken out by provenance — the number
    * that tells a curation run WHICH feed is resubmitting content.
    * Duplicate keys are md5 fingerprints (d4's definition), so the shuffle
    * carries 16-byte hashes, never text; one partial-aggregable pass.
    */
  def dedupRateBySource(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("source"), md5(col("text")).as("fp"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups")
      )
      .orderBy("source")

  /** D27 — vocabulary growth curve `(decile, n_docs, n_new_tokens,
    * cum_vocab)`: how many NEVER-BEFORE-SEEN tokens each tenth of the
    * corpus (in doc_id order) contributes, plus the running vocabulary
    * size — the Heaps-law diagnostic that tells a tokenizer-training run
    * whether more data still buys vocabulary (sub-linear growth flattens
    * when a feed goes stale or repetitive).
    *
    * Scale shape: the decile boundary is RANK-based, computed with the
    * [[Curation.globalIds]] machinery — range-sort + `zipWithIndex`, never
    * a single-partition `row_number` window over the corpus; the bucket is
    * then pure integer arithmetic `(ordinal·10) div n` (n arrives as a
    * 1-row broadcast). First-seen per token is one `min(bucket)`
    * aggregation over the token stream (the n15 inverted-index exchange
    * at token granularity), the per-decile rollup is 10 rows, and the
    * cumulative sum is a 10-row window — nothing wider than the token
    * stream's one shuffle ever moves.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val ordered = Curation
      .zipIndexedByOrder(docs.orderBy("doc_id"), "ordinal")
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
      .select(expr("(ordinal * 10) div n").as("decile"), col("doc_id"), col("text"))
    val toks = ordered.select(col("decile"), explode(split(col("text"), " ")).as("token"))
    val newPerDecile = toks
      .groupBy("token")
      .agg(min("decile").as("first_decile"))
      .groupBy("first_decile")
      .agg(count(lit(1)).as("n_new_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("decile")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ordered
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"))
      .join(newPerDecile, col("decile") === col("first_decile"), "left")
      .select(
        col("decile"),
        col("n_docs"),
        coalesce(col("n_new_tokens"), lit(0L)).as("n_new_tokens")
      )
      .withColumn("cum_vocab", sum("n_new_tokens").over(w))
      .orderBy("decile")
  }

  /** D26 — source-affinity matrix `(src_a, src_b, inter, n_a, n_b)`: for
    * every pair of document sources that share at least one shingle, the
    * exact shingle-set intersection size plus both set sizes — the
    * cross-feed overlap audit that tells a mixture designer WHICH corpora
    * are rebottling each other's content (Jaccard = inter/(n_a+n_b−inter),
    * left to the consumer so the output stays integer-only and
    * hash-comparable).
    *
    * Scale shape: per-shingle source SET first (`collect_set` over one
    * shingle-key shuffle — the same inverted-index exchange as n1/n15,
    * bounded per row by |sources|), then pairs are emitted MAP-SIDE from
    * each set by an index-windowed double `transform` and count-collapsed.
    * Never a shingle-level self-join: that plan squares every hot
    * shingle's row count before aggregating, while this one's output is
    * exactly Σ_s C(|sources(s)|, 2) ≤ C(|S|, 2) per shingle — with
    * source counts in the tens to hundreds the pair stream is at most a
    * small constant times the shingle stream. (If |S| itself were huge,
    * the right rung is per-source MinHash signatures — the n2-over-n1
    * argument applied one level up.) Set sizes fall out of the SAME
    * per-shingle aggregate (explode + count), so the corpus is tokenized
    * exactly once.
    */
  /** DQ5 — corpus DRIFT profile between the old and new halves of the
    * corpus (split at `(max(doc_id)+1) div 2`, the same seal point every
    * incremental twin uses): per source, document and token volumes on
    * each side plus `n_new_tokens` — distinct tokens this source's new
    * half introduces that the ENTIRE old corpus (all sources) never
    * contained. The crawl-over-crawl monitoring table a pipeline alerts
    * on: volume collapse, length drift and vocabulary churn are the three
    * canonical drift signals, and the cross-source old-vocab reference
    * distinguishes genuinely new language from tokens merely migrating
    * between sources.
    *
    * Scale shape: two source-keyed aggregates over the doc stream plus
    * one token-keyed anti join (new half's (source, token) distinct set
    * against the old vocabulary — linear in the token stream, map-side
    * combinable); the old-vocab side is the corpus vocabulary, a
    * token-cardinality table, never the token stream itself.
    */
  def driftProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("source"), col("doc_id"), split(col("text"), " ").as("w"))
    val split0 = Tables
      .documents(spark, dir)
      .agg(expr("coalesce((max(doc_id) + 1) div 2, 0)").as("k"))
      .head()
      .getLong(0)
    val tagged = docs.withColumn("is_new", col("doc_id") >= split0)
    val volumes = tagged
      .groupBy("source")
      .agg(
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_docs_old"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_docs_new"),
        sum(when(!col("is_new"), size(col("w")).cast("long")).otherwise(0L)).as("n_tokens_old"),
        sum(when(col("is_new"), size(col("w")).cast("long")).otherwise(0L)).as("n_tokens_new")
      )
    val oldVocab = tagged
      .where(!col("is_new"))
      .select(explode(array_distinct(col("w"))).as("token"))
      .distinct()
    val newTokens = tagged
      .where(col("is_new"))
      .select(col("source"), explode(array_distinct(col("w"))).as("token"))
      .distinct()
      .join(oldVocab, Seq("token"), "left_anti")
      .groupBy("source")
      .agg(count(lit(1)).as("n_new_tokens"))
    volumes
      .join(newTokens, Seq("source"), "left")
      .select(
        col("source"),
        col("n_docs_old"),
        col("n_docs_new"),
        col("n_tokens_old"),
        col("n_tokens_new"),
        coalesce(col("n_new_tokens"), lit(0L)).as("n_new_tokens")
      )
      .orderBy("source")
  }

  def sourceAffinity(spark: SparkSession, dir: String): DataFrame = {
    // r22 shape: fan the shingle pass + DISTINCT-FIRST aggregation. A
    // plain fan was tried and reverted (wall flat, CPU 2.0 -> 4.4 s: the
    // collect_set partial agg loses scan fusion after the exchange); the
    // keeper splits the work so each piece stays on its fast path — the
    // shingle explosion runs fanned, a codegen HashAggregate dedups
    // (source, shingle) pairs map-side, and the imperative collect_set
    // only ever sees the deduped pairs. sort_array(collect_set(source))
    // over raw rows == sort_array(collect_list(source)) over distinct
    // pairs, bit for bit.
    val docs = Tables.fanOut(
      Tables.documents(spark, dir),
      Seq(s"$dir/documents.parquet"),
      Seq(col("doc_id"))
    )
    val perShingle = Dedup
      .shinglesKeyed(docs.select("source", "text"), "source")
      .select("source", "s")
      .distinct()
      .groupBy("s")
      .agg(sort_array(collect_list(col("source"))).as("srcs"))
    val sizes = perShingle
      .select(explode(col("srcs")).as("source"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"))
    val inter = perShingle
      .where(size(col("srcs")) > 1)
      .select(
        explode(
          expr(
            "flatten(transform(srcs, (a, i) -> " +
              "transform(slice(srcs, i + 2, size(srcs)), b -> named_struct('src_a', a, 'src_b', b))))"
          )
        ).as("p")
      )
      .select(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .select("src_a", "src_b", "inter", "n_a", "n_b")
      .orderBy("src_a", "src_b")
  }
}
