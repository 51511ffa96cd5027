package graft.operators

import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` — the core of a
  * training-data pipeline at 100 TB.
  *
  * Strategy ladder (each rung trades exactness for scale):
  *   - exact: group on a 128-bit fingerprint (16-byte shuffle keys).
  *   - n-gram Jaccard ([[ngramJaccardPairs]]): exact pairwise via a
  *     shingle-inverted-index join — the *oracle* for the approximate rungs;
  *     cost grows with shared-shingle pair count, so it is the small/medium
  *     rung.
  *   - MinHash + LSH ([[minhashLshPairs]]): 64 min-hashes → 16 bands × 4
  *     rows → candidates only from band-bucket collisions, then exact
  *     verification *restricted to candidates*. This is the 100 TB rung: the
  *     all-pairs space never materializes; the only wide ops are a 64-agg
  *     groupBy and a self-join on (band, bucket) whose fan-out is the
  *     collision count, with P(miss) = (1−s⁴)¹⁶ ≈ 1e-18 at s=0.98.
  *   - SimHash ([[simhashPairs]]): 64-bit signature, Hamming ≤ 7 via 8×8-bit
  *     band pigeonhole (≤7 differing bits ⇒ ≥1 identical band) — candidate
  *     generation is exact-complete, not probabilistic.
  *   - embedding cosine ([[embeddingDupPairs]]): random-hyperplane LSH bands
  *     → candidate equi-join → exact cosine verification of candidates only —
  *     the same plan family as [[Similarity.annLsh]], in pairwise form. The
  *     all-pairs brute force survives only as the spec-level equivalence
  *     oracle ([[embeddingDupPairsBrute]]).
  */
object Dedup {

  /** Tokenize → distinct `n`-word shingles, one row per (doc_id, shingle).
    * This is the inverted-index base for both exact Jaccard and MinHash.
    * `n` defaults to the `graft.shingle.n` session knob (3 unset).
    */
  def shingles(
      docs: DataFrame,
      n: Int = -1 // -1 = the graft.shingle.n session knob (3 unset)
  ): DataFrame = shinglesKeyed(docs, "doc_id", n)

  /** [[shingles]] with a caller-chosen key column — the SAME tokenization
    * contract (split on single space, width-`n` word windows,
    * within-row distinct) keyed by e.g. `source` instead of `doc_id`, so
    * corpus-level set operators ([[Profile.sourceAffinity]]) never
    * re-derive the shingle definition. The key rides the explode — no
    * join back to the document table to recover it.
    */
  def shinglesKeyed(
      docs: DataFrame,
      key: String,
      n: Int = -1
  ): DataFrame = {
    val nn = if (n > 0) n else graft.GraftConf.int(docs.sparkSession, "shingle.n", 3)
    require(nn >= 1, s"graft.shingle.n=$nn must be >= 1")
    val withToks = docs.withColumn("toks", split(col("text"), " "))
    withToks
      .where(size(col("toks")) >= nn)
      .select(
        col(key),
        explode(
          expr(
            s"array_distinct(transform(sequence(0, size(toks)-$nn), " +
              s"i -> concat_ws(' ', ${(0 until nn).map(j => s"toks[i+$j]").mkString(", ")})))"
          )
        ).as("s")
      )
  }

  /** The resolved shingle width — what [[shingles]] will actually use; the
    * value the persisted minhash layouts fold into their cache keys.
    */
  private def shingleN(spark: SparkSession): Int =
    graft.GraftConf.int(spark, "shingle.n", 3)

  /** Cross-engine 64-bit shingle hash: the first 16 hex digits of
    * `md5(s)`, assembled as two 32-bit halves — `hi` = hex digits 1-8,
    * `lo` = digits 9-16 — into `(hi << 32) | lo` (signed wrap is
    * intentional; the VALUE is just a 64-bit bit pattern, never
    * arithmetic). This replaced `xxhash64` as the dedup payload hash
    * (scheme v3): md5 is a published algorithm every engine computes
    * byte-identically over UTF-8, so any derivation whose OUTPUT depends
    * on hash bits — SimHash signatures above all — becomes directly
    * checkable against a DuckDB oracle (`('0x' || substr(md5(s), 1, 8))
    * ::BIGINT` on the other side), instead of riding an engine-private
    * hash that forces planted-twin proxies. Uniformity is cryptographic
    * (better than xxhash64's), so MinHash/SimHash statistics only
    * improve; the cost — md5 is ~2-3× xxhash64 per byte — lands in the
    * once-per-corpus-version ingest pass that builds the signature
    * layouts, not in any query.
    */
  private[graft] def shingleHash64(s: Column): Column = {
    val hex = md5(s)
    val hi  = conv(substring(hex, 1, 8), 16, 10).cast("long")
    val lo  = conv(substring(hex, 9, 8), 16, 10).cast("long")
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  /** The DuckDB rendering of [[shingleHash64]]'s two halves — the oracle
    * side of the cross-engine contract, shared by every oracle that
    * recomputes shingle-hash bits (n3's signature SQL). `col` must be a
    * VARCHAR expression; yields `(hi_sql, lo_sql)`.
    */
  private[graft] def shingleHash64Sql(col: String): (String, String) =
    (s"('0x' || substr(md5($col), 1, 8))::BIGINT", s"('0x' || substr(md5($col), 9, 8))::BIGINT")

  /** Exact duplicate groups: fingerprint → group → keep groups of size > 1.
    * The scale-correct form of Q8: the exchange carries (16-byte fp, id),
    * never document bodies.
    */
  def exactDupRows(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(md5(col("text")).as("fp"), col("doc_id"))
      .groupBy("fp")
      .agg(count(lit(1)).as("cnt"), min("doc_id").as("keep_id"))
      .where(col("cnt") > 1)
      .orderBy("fp")

  /** Span width for [[sharedSpans]] — long enough that cross-document
    * collisions mean real copied text on a natural corpus, short enough that
    * every planted near-dup pair shares spans.
    */
  val SpanTokens = 8

  /** -1 → the `graft.span.tokens` session knob ([[SpanTokens]] unset). */
  private def resolveSpan(spark: SparkSession, span: Int): Int = {
    val s = if (span > 0) span else graft.GraftConf.int(spark, "span.tokens", SpanTokens)
    require(s >= 1, s"graft.span.tokens=$s must be >= 1")
    s
  }

  /** Per-document DISTINCT span fingerprints — one row per (doc_id,
    * span_fp), the shared base of [[sharedSpans]] and [[spanShareStats]].
    */
  private def docSpans(docs: DataFrame, span: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= span)
      .select(
        col("doc_id"),
        explode(
          expr(
            s"array_distinct(transform(sequence(0, size(toks) - $span), " +
              s"s -> md5(concat_ws(' ', slice(toks, s + 1, $span)))))"
          )
        ).as("span_fp")
      )

  /** N7 — cross-document repeated spans: every [[SpanTokens]]-token window
    * (stride 1) that appears verbatim in ≥ 2 distinct documents, with its
    * document frequency. This is the scalable stand-in for suffix-array
    * exact-substring dedup (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better"): a suffix array finds maximal repeats globally
    * but needs the corpus resident per node; the windowed form ships each
    * span once as a 16-byte md5 through a single groupBy — shuffle volume =
    * token count × 16 bytes regardless of document size, map-side partials
    * collapse within-partition repeats first, and the grouped row count is
    * bounded by DISTINCT spans, not corpus tokens. `array_distinct` before
    * the explode keeps a document's internal self-repeats from inflating its
    * contribution (df counts documents, not occurrences). Output keys are
    * the md5 fingerprints themselves — at 100 TB the downstream consumer
    * (span-level redaction: probe each doc's spans against this table) wants
    * the fixed-width key, never the span text.
    *
    * The public entry reads the `shared/` table of the persisted
    * [[spanArtifactsCached]] layout (built once per corpus version, shared
    * with d16/n8/n11); [[sharedSpansLive]] is the underlying computation.
    */
  def sharedSpans(spark: SparkSession, dir: String,
      span: Int = -1 // -1 = the graft.span.tokens session knob (SpanTokens unset)
  ): DataFrame = {
    val w = resolveSpan(spark, span)
    Tables.cachedRead(spark, s"${spanArtifactsCached(spark, dir, w)}/shared").orderBy("span_fp")
  }

  /** The live (layout-free) form of [[sharedSpans]] — the computation the
    * span-artifact build runs; kept as the spec-level equivalence oracle.
    */
  private[graft] def sharedSpansLive(spark: SparkSession, dir: String,
      span: Int = -1
  ): DataFrame =
    sharedSpansW(spark, dir, resolveSpan(spark, span))

  private def sharedSpansW(spark: SparkSession, dir: String, span: Int): DataFrame =
    docSpans(Tables.documents(spark, dir), span)
      .groupBy("span_fp")
      .agg(countDistinct("doc_id").as("n_docs"))
      .where(col("n_docs") >= 2)
      .orderBy("span_fp")

  /** D16 — per-document shared-span density: how much of each document is
    * text that appears verbatim elsewhere in the corpus — [[sharedSpans]]
    * turned around into the per-document signal a quality filter actually
    * thresholds on ("drop documents that are mostly boilerplate/copies").
    * Span document-frequency comes from a streaming hash AGGREGATE over the
    * distinct (doc, span) stream, joined back onto it — deliberately NOT a
    * `COUNT OVER (PARTITION BY span_fp)` window, although that would save
    * one shuffle of the stream: WindowExec must buffer and sort each span's
    * whole partition before emitting, and a boilerplate span present in
    * millions of documents — exactly the rows this operator exists to
    * measure — becomes one such partition. The aggregate combines map-side
    * and the join streams hot spans row-by-row against their single df row,
    * so no per-key buffering exists anywhere at any skew. Docs shorter than
    * the span width have no spans and are absent, like the oracle. Ratio is
    * long/long (d2's bit-stable rule).
    */
  def spanShareStats(spark: SparkSession, dir: String,
      span0: Int = -1 // -1 = the graft.span.tokens session knob
  ): DataFrame = {
    val span = resolveSpan(spark, span0)
    Tables.cachedRead(spark, s"${spanArtifactsCached(spark, dir, span)}/docstats")
      .withColumn("shared_ratio", col("n_shared_spans") / col("n_spans"))
      .orderBy("doc_id")
  }

  /** Live (layout-free) form of [[spanShareStats]] — the build-path shape
    * whose one-scan/reused-exchange discipline PlanShapeSpec pins.
    */
  private[graft] def spanShareStatsLive(spark: SparkSession, dir: String,
      span0: Int = -1
  ): DataFrame = {
    val span = resolveSpan(spark, span0)
    // One scan + one explode: the span stream repartitions on span_fp once
    // and BOTH consumers (the df aggregate and the join-back probe) hang
    // off that exchange — without the explicit repartition, Catalyst
    // re-derives the stream per branch and the corpus pays the explode
    // twice (n8's lesson, applied here). count(doc_id) ≡ count(*) on this
    // stream (doc_id is never null) but keeps the aggregate referencing
    // the same columns the probe needs, so the pruner cannot specialize
    // the exchange subtrees apart.
    val spans = docSpans(Tables.documents(spark, dir), span).repartition(col("span_fp"))
    val df    = spans.groupBy("span_fp").agg(count(col("doc_id")).as("nd"))
    spans
      .join(df, "span_fp")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared_spans")
      )
      .withColumn("shared_ratio", col("n_shared_spans") / col("n_spans"))
      .orderBy("doc_id")
  }

  /** N8 — span-level REDACTION, the downstream consumer [[sharedSpans]]'s
    * docstring promises: every token covered by a span that appears
    * verbatim in ≥ 2 distinct documents is masked to `[DUP]`, and each
    * document reports how much of it was boilerplate plus the fingerprint
    * of its redacted text (md5, like d13's PII contract — the driver hashes
    * fingerprints, not megabytes of text). This completes the
    * suffix-array-substitute dedup story end to end: detect shared spans
    * (n7), measure their density (d16), and finally REMOVE them from the
    * training text without dropping whole documents.
    *
    * Plan shape at 100 TB: positioned spans (doc_id, start, 16-byte fp)
    * probe the shared-fp set by fp equi-join — exchange volume is span
    * count × ~24 bytes, never text. Matched starts collapse to one
    * per-document start array whose size is bounded by the DOCUMENT's own
    * length (documents are size-bounded units, so unlike a per-user event
    * history this state cannot grow unboundedly — the w3 lesson applied,
    * not repeated); coverage flags and the masked rebuild are then narrow
    * per-row array ops inside codegen. Docs shorter than the span width
    * carry no spans and pass through with n_masked = 0 and their original
    * (whitespace-normalized) fingerprint, exactly like the oracle.
    *
    * The corpus is read ONCE. Catalyst shares no uncached subtree, so the
    * naive form (probe inline spans against [[sharedSpans]], which
    * re-derives the same stream) paid the dominant tokenize+explode twice
    * — and the rebuild join re-scanned the table a third time. Both
    * exchanges are instead hoisted to where every consumer can reuse them:
    * the (doc_id, toks) frame repartitions on doc_id (the shuffle the
    * final left join needs ANYWAY — hoisting it costs nothing new), the
    * span stream derived from it repartitions on span_fp, and the ≥2-doc
    * fp set (aggregate, d16's deliberately window-free skew-safe shape)
    * and the probe join both hang off that one exchange. Spark's exchange
    * reuse (AQE stage cache) then executes scan, explode, and each
    * shuffle exactly once — PlanShapeSpec pins one documents scan in the
    * final adaptive plan.
    */
  /** The one-scan span machinery shared by [[redactSharedSpans]] and
    * [[maxSharedSegments]]: the repartitioned (doc_id, toks) frame and the
    * stream of 1-based start positions whose span appears in ≥ 2 distinct
    * documents.
    *
    * The explicit isNotNull mirrors the constraint a downstream join
    * would push onto one branch alone; declared here it reaches every
    * branch's scan identically, keeping the subtrees reusable. The size
    * guard lives INSIDE the explode expression (short docs emit an empty
    * array, which explode drops) rather than as a `where`: a Filter would
    * be pushed below the doc_id exchange on the span branch only, making
    * the two exchange subtrees non-identical and defeating stage reuse.
    * Spans are 1-based, mirroring DuckDB list slicing. ≥2 distinct docs ⟺
    * min(doc_id) ≠ max(doc_id): two plain min/max partials instead of
    * countDistinct's extra dedup aggregate pair; s_pin (and its
    * tautological s_pin ≥ 1 — starts are 1-based) keeps `s` referenced on
    * the aggregate branch so the column pruner projects the SAME (doc_id,
    * s, span_fp) under both consumers of the span_fp exchange.
    */
  private def docsAndSharedStarts(spark: SparkSession, dir: String, span: Int): (DataFrame, DataFrame) = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(col("doc_id").isNotNull)
      .repartition(col("doc_id"))
    val sp = docs
      .select(
        col("doc_id"),
        explode(
          expr(
            s"if(size(toks) >= $span, transform(sequence(1, size(toks) - ${span - 1}), " +
              s"s -> struct(s AS s, md5(concat_ws(' ', slice(toks, s, $span))) AS span_fp)), array())"
          )
        ).as("p")
      )
      .select(col("doc_id"), col("p.s").as("s"), col("p.span_fp").as("span_fp"))
      .repartition(col("span_fp"))
    val shared = sp
      .groupBy("span_fp")
      .agg(min("doc_id").as("d_min"), max("doc_id").as("d_max"), min("s").as("s_pin"))
      .where(col("d_min") =!= col("d_max") && col("s_pin") >= 1)
      .select("span_fp")
    (docs, sp.join(shared, "span_fp").select("doc_id", "s"))
  }

  /** The persisted span-artifact layout — the span family's rung on the
    * materialization chain (MinHash has signatures → pairs → clusters; spans
    * have this). One ingest-time build runs the tokenize + window-md5 pass
    * the corpus would otherwise pay on EVERY n7/d16/n8/n11 query and stores
    * the three things those queries actually consume, each far smaller than
    * the positioned span stream itself (which stays transient shuffle data,
    * never landed):
    *
    *   - `shared/`   (span_fp, n_docs): spans in ≥ 2 distinct docs — n7's
    *     output table; size ∝ DISTINCT duplicated spans, not corpus tokens.
    *   - `starts/`   (doc_id, s): positioned occurrences of shared spans —
    *     n8's mask set and n11's island input; size ∝ duplicated text.
    *   - `exstarts/` (doc_id, s): the NON-KEEPER subset of `starts/` —
    *     occurrences of shared spans in every doc EXCEPT the span's
    *     smallest-id carrier; d34's excision mask (v2). Strictly smaller
    *     than `starts/` (each span's keeper rows are absent).
    *   - `docstats/` (doc_id, n_spans, n_shared_spans): per-doc distinct
    *     span counts — d16's density input; one row per document.
    *
    * Content-fingerprinted key ([[graft.sources.LayoutCache]]): corpus edits
    * and span-width knob changes force a rebuild; a stale span table can
    * never silently serve fresh data. The build pays one corpus scan — the
    * positioned stream persists across its three consumers (at cluster
    * scale this is the checkpoint a real ingest would write) — and the cost
    * lands in the bench's layout phase, visible per-build, instead of
    * hiding inside whichever span query runs first.
    */
  private[graft] def spanArtifactsCached(spark: SparkSession, dir: String, span: Int): String = {
    val key = graft.sources.LayoutCache
      .contentKey(spark, s"$dir/documents.parquet", s"spans:v2:w=$span")
    graft.sources.LayoutCache.getOrBuild(spark, "graft_spans", key) { out =>
      val sp = Tables
        .documents(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .where(col("doc_id").isNotNull)
        .select(
          col("doc_id"),
          explode(
            expr(
              s"if(size(toks) >= $span, transform(sequence(1, size(toks) - ${span - 1}), " +
                s"s -> struct(s AS s, md5(concat_ws(' ', slice(toks, s, $span))) AS span_fp)), array())"
            )
          ).as("p")
        )
        .select(col("doc_id"), col("p.s").as("s"), col("p.span_fp").as("span_fp"))
        .repartition(col("span_fp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val dfAll = sp
          .groupBy("span_fp")
          .agg(countDistinct("doc_id").as("n_docs"), min("doc_id").as("keeper"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val shared = dfAll.where(col("n_docs") >= 2)
          shared.select("span_fp", "n_docs").write.parquet(s"$out/shared")
          sp.join(shared.select("span_fp"), "span_fp")
            .select("doc_id", "s")
            .write
            .parquet(s"$out/starts")
          // d34's mask: shared-span occurrences MINUS each span's keeper
          // (its smallest-id carrier, the n19b carrier rule) — the rows
          // excision actually removes, precomputed where the positioned
          // stream is already persisted
          sp.join(shared.select("span_fp", "keeper"), "span_fp")
            .where(col("doc_id") =!= col("keeper"))
            .select("doc_id", "s")
            .write
            .parquet(s"$out/exstarts")
          // d16's distinct-per-doc census: n_spans counts DISTINCT spans in
          // the doc; a span is shared iff its corpus df (distinct docs) ≥ 2.
          sp.select("doc_id", "span_fp")
            .distinct()
            .join(dfAll, "span_fp")
            .groupBy("doc_id")
            .agg(
              count(lit(1)).as("n_spans"),
              sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_shared_spans")
            )
            .write
            .parquet(s"$out/docstats")
        } finally { dfAll.unpersist(); () }
      } finally { sp.unpersist(); () }
    }
  }

  /** Force the span-artifact layout at the session's knob operating point —
    * the [[graft.Layouts]] forcer entry.
    */
  def spanArtifacts(spark: SparkSession, dir: String): String =
    spanArtifactsCached(spark, dir, resolveSpan(spark, -1))

  def redactSharedSpans(spark: SparkSession, dir: String,
      span0: Int = -1 // -1 = the graft.span.tokens session knob
  ): DataFrame = {
    val span = resolveSpan(spark, span0)
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(col("doc_id").isNotNull)
    val starts = Tables.cachedRead(spark, s"${spanArtifactsCached(spark, dir, span)}/starts")
      .groupBy("doc_id")
      .agg(collect_set(col("s")).as("ss"))
    redactFrom(docs, starts, span)
  }

  /** Live (layout-free) form of [[redactSharedSpans]] — the one-scan
    * hoisted-exchange build shape; spec-level equivalence oracle.
    */
  private[graft] def redactSharedSpansLive(spark: SparkSession, dir: String,
      span0: Int = -1
  ): DataFrame = {
    val span          = resolveSpan(spark, span0)
    val (docs, hits)  = docsAndSharedStarts(spark, dir, span)
    val starts = hits
      .groupBy("doc_id")
      .agg(collect_set(col("s")).as("ss"))
    redactFrom(docs, starts, span)
  }

  /** D34 — cross-document shared-span EXCISION keeping ONE carrier: the
    * ExactSubstr REMOVAL transform (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better" — their dedup pipeline deletes
    * all-but-one copy of every long enough duplicated substring) that
    * n8's redaction deliberately is not: n8 masks EVERY occurrence of
    * shared text (`[DUP]` in all carriers — the decontamination shape),
    * while a training pipeline wants the text to SURVIVE exactly once.
    * Every token covered by a [[SpanTokens]]-window shared by ≥ 2
    * distinct documents is dropped from every carrier EXCEPT the span's
    * smallest-id one (the n19b carrier rule — `others[0]` there is the
    * smallest other carrier precisely because min-id is the family's
    * keeper convention, and q8/n6 keep `min(doc_id)` too). The keeper
    * keeps ALL its occurrences, including internal repeats — intra-doc
    * repetition is d31's transform, deliberately not re-applied here.
    * Emits d31's audit ledger: tokens in, kept, dropped, md5 of the
    * excised text (md5('') for a fully-excised doc — a verbatim subset
    * of a smaller-id doc keeps zero tokens, and the ledger must say so
    * rather than drop the row).
    *
    * Scale shape: the mask is precomputed at ingest in the span-artifact
    * layout (`exstarts/` — the positioned stream is persisted there
    * anyway, and the keeper is one extra `min` in the df aggregate), so
    * the query pays one layout read + the per-doc rebuild; the live twin
    * recomputes it in one scan ([[exciseSharedSpansLive]]). Every
    * exchange is keyed on span_fp (16-byte md5) or doc_id — never span
    * text, never all-pairs; per-doc work is bounded by the doc's own
    * span count.
    */
  def exciseSharedSpans(spark: SparkSession, dir: String,
      span0: Int = -1 // -1 = the graft.span.tokens session knob
  ): DataFrame = {
    val span = resolveSpan(spark, span0)
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(col("doc_id").isNotNull)
    val starts = Tables.cachedRead(spark, s"${spanArtifactsCached(spark, dir, span)}/exstarts")
      .groupBy("doc_id")
      .agg(collect_set(col("s")).as("ss"))
    exciseFrom(docs, starts, span)
  }

  /** Live (layout-free) form of [[exciseSharedSpans]]; spec-level
    * equivalence oracle, and the entry point for planted-fixture specs
    * (pass any (doc_id, text) frame).
    */
  private[graft] def exciseSharedSpansLive(docs0: DataFrame, span: Int): DataFrame = {
    val docs = docs0
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(col("doc_id").isNotNull)
    val sp = docs
      .select(
        col("doc_id"),
        explode(
          expr(
            s"if(size(toks) >= $span, transform(sequence(1, size(toks) - ${span - 1}), " +
              s"s -> struct(s AS s, md5(concat_ws(' ', slice(toks, s, $span))) AS span_fp)), array())"
          )
        ).as("p")
      )
      .select(col("doc_id"), col("p.s").as("s"), col("p.span_fp").as("span_fp"))
    val keepers = sp
      .groupBy("span_fp")
      .agg(min("doc_id").as("keeper"), max("doc_id").as("d_max"))
      .where(col("keeper") =!= col("d_max"))
      .select("span_fp", "keeper")
    val starts = sp
      .join(keepers, "span_fp")
      .where(col("doc_id") =!= col("keeper"))
      .groupBy("doc_id")
      .agg(collect_set(col("s")).as("ss"))
    exciseFrom(docs, starts, span)
  }

  /** Excised rebuild shared by the layout-backed and live paths: flag
    * covered positions, drop them, fingerprint the survivors in original
    * order (d31's ledger shape).
    */
  private def exciseFrom(docs: DataFrame, starts: DataFrame, span: Int): DataFrame =
    docs
      .join(starts, Seq("doc_id"), "left")
      .withColumn(
        "flags",
        expr(
          s"transform(sequence(1, size(toks)), " +
            s"i -> coalesce(exists(ss, st -> i >= st AND i <= st + ${span - 1}), false))"
        )
      )
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr("size(filter(flags, f -> NOT f))").cast("long").as("n_kept"),
        md5(
          expr(
            "concat_ws(' ', filter(zip_with(toks, flags, (t, f) -> if(f, cast(null as string), t)), " +
              "x -> x IS NOT NULL))"
          )
        ).as("fp_trimmed")
      )
      .withColumn("n_dropped", (col("n_tokens") - col("n_kept")).cast("long"))
      .select("doc_id", "n_tokens", "n_kept", "n_dropped", "fp_trimmed")
      .orderBy("doc_id")

  /** Masked rebuild shared by the layout-backed and live redaction paths:
    * left-join per-doc shared starts onto (doc_id, toks), flag covered
    * positions, count and fingerprint the masked text.
    */
  private def redactFrom(docs: DataFrame, starts: DataFrame, span: Int): DataFrame =
    docs
      .join(starts, Seq("doc_id"), "left")
      .withColumn(
        "flags",
        expr(
          s"transform(sequence(1, size(toks)), " +
            s"i -> coalesce(exists(ss, st -> i >= st AND i <= st + ${span - 1}), false))"
        )
      )
      .select(
        col("doc_id"),
        expr("size(filter(flags, f -> f))").cast("long").as("n_masked"),
        md5(expr("concat_ws(' ', zip_with(toks, flags, (t, f) -> CASE WHEN f THEN '[DUP]' ELSE t END))"))
          .as("fp_redacted")
      )
      .orderBy("doc_id")

  /** N11 — MAXIMAL shared segments: each maximal run of tokens covered by
    * shared [[SpanTokens]]-windows, reported ONCE as `(doc_id, start_pos,
    * n_tokens, seg_fp)` — the repeat-extraction step n7's fixed-width
    * windows cannot express (a 50-token copied paragraph is 43 overlapping
    * n7 rows; here it is one segment of length 50, fingerprinted whole).
    * Precisely: consecutive shared start positions form gaps-and-islands
    * (`s − row_number()` grouping — the classic trick), an island [s₀, s₁]
    * covers tokens [s₀, s₁+span−1], and `seg_fp` is the md5 of that exact
    * token slice. This is the COVERAGE-union semantics, deliberately: two
    * overlapping repeats (against different partner docs) merge into one
    * reported segment, which is what a boilerplate-extraction pipeline
    * wants — the suffix-array notion of per-occurrence-set maximal repeats
    * (Lee et al.) would split them and requires global occurrence lists.
    *
    * Scale shape: [[docsAndSharedStarts]]'s one-scan machinery, then one
    * per-document window whose partitions are bounded by the DOCUMENT's
    * own span count (the w3-approved bound — never corpus-wide), one
    * (doc_id, grp) aggregate that needs no new exchange (doc_id
    * partitioning already clusters it), and a final slice join that reuses
    * the same hoisted docs exchange. Oracle: the same gaps-and-islands in
    * DuckDB SQL.
    */
  def maxSharedSegments(spark: SparkSession, dir: String,
      span0: Int = -1 // -1 = the graft.span.tokens session knob
  ): DataFrame = {
    val span = resolveSpan(spark, span0)
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(col("doc_id").isNotNull)
    val hits =
      Tables.cachedRead(spark, s"${spanArtifactsCached(spark, dir, span)}/starts")
    segmentsFrom(docs, hits, span)
  }

  /** Live (layout-free) form of [[maxSharedSegments]] — the one-scan build
    * shape; spec-level equivalence oracle.
    */
  private[graft] def maxSharedSegmentsLive(spark: SparkSession, dir: String,
      span0: Int = -1
  ): DataFrame = {
    val span         = resolveSpan(spark, span0)
    val (docs, hits) = docsAndSharedStarts(spark, dir, span)
    segmentsFrom(docs, hits, span)
  }

  /** Gaps-and-islands merge shared by the layout-backed and live segment
    * paths: shared starts → maximal islands → whole-segment fingerprints.
    */
  private def segmentsFrom(docs: DataFrame, hits: DataFrame, span: Int): DataFrame = {
    val islands = hits
      .withColumn("grp", col("s") - row_number().over(Window.partitionBy("doc_id").orderBy("s")))
      .groupBy("doc_id", "grp")
      .agg(min("s").as("s0"), max("s").as("s1")) // ints — slice() wants int args
    islands
      .join(docs, "doc_id")
      .select(
        col("doc_id"),
        col("s0").cast("long").as("start_pos"),
        (col("s1") - col("s0") + span).cast("long").as("n_tokens"),
        md5(expr(s"concat_ws(' ', slice(toks, s0, s1 - s0 + $span))")).as("seg_fp")
      )
      .orderBy("doc_id", "start_pos")
  }

  /** N19 — per-document LONGEST cross-document shared substring (token
    * count + fingerprint), the no-fixed-floor exact-substring signal the
    * suffix-array dedup literature wants (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better") that n7/n11 structurally
    * cannot report: their fixed [[SpanTokens]]-token windows see nothing
    * shorter and report longer repeats only at window granularity. Here a
    * 5-token verbatim overlap is found AS length 5, because every width
    * 1..`graft.lss.max_tokens` (default 16) is probed.
    *
    * Correctness identity (why this equals the sorted-suffix-array answer
    * up to the cap): a document's longest shared substring has length ≥ L
    * iff SOME width-L window fingerprint of it appears in ≥ 2 distinct
    * documents — so max-L-with-a-shared-window IS the longest shared
    * substring, exactly (md5 collisions aside), with the single disclosed
    * saturation `lss_len = min(true, cap)`. A true suffix array computes
    * unbounded lengths but needs corpus-resident suffix order; the capped
    * window form is the shuffle-bounded discipline every span-family rung
    * here rides.
    *
    * Scale shape: the generate phase emits (doc_id, width, prefix) for
    * all widths — `cap ×` the n7 token stream — then ONE wide min≠max
    * aggregation on 16-byte long keys finds cross-doc candidates (two
    * longs of partial-aggregable state per key, no distinct sets;
    * within-doc self-repeats never count, n7's contract), an exact
    * string recount over the candidate subset removes hash-collision
    * false positives, and a per-doc argmax finishes. Nothing is pairwise,
    * nothing driver-side. At a cap too large for the `cap×` stream, the
    * production refinement is hierarchical doubling (probe widths
    * 1,2,4,…,cap, then binary-refine the bracket — log passes of 1×
    * volume each); the one-pass form is registered because one exchange
    * beats log exchanges until `cap×` volume dominates. Ties at the max
    * length break to the MIN fingerprint (deterministic, order-free).
    * Docs sharing no token with any other document are absent (d16's
    * absence convention). Like every span-family rung the computation is
    * a once-per-corpus-version ingest artifact: the registered query
    * reads the persisted per-doc table.
    */
  /** Bump when the LSS derivation changes; folds into the layout key with
    * the cap operating point. v2 = the layout gained the partner table
    * (one build produces both per-doc artifacts). v3 = + the top-K span
    * ledger (`topk.parquet`) that lets takedowns resolve from the layout
    * alone (the store-a-little-more-at-ingest trade t17 makes with `dl`).
    * The single-pass build restructure (ledger written once, lss/partners
    * projected from its rank-1 rows) left every artifact byte-identical,
    * so it is NOT a version bump — existing v3 layouts stay valid.
    */
  private[graft] val LssSchemeVersion = 3

  def longestSharedSubstring(spark: SparkSession, dir: String): DataFrame =
    Tables.cachedRead(spark, s"${lssLayoutCache(spark, dir)}/lss.parquet").orderBy("doc_id")

  /** N19B — n19 with PARTNER attribution: alongside each document's
    * longest shared substring, the smallest OTHER doc_id that contains
    * the same (tie-broken) span verbatim — the row a dedup keep-list
    * actually acts on ("drop d, its 14-token run also lives in p"),
    * where n19 alone only scores severity. Partner existence is
    * guaranteed (shared ⇒ ≥ 2 distinct docs), so no NULL columns meet
    * the cross-engine ordering. Same ingest layout, same oracle
    * discipline (the partner join replayed relationally).
    */
  def longestSharedSubstringPartners(spark: SparkSession, dir: String): DataFrame =
    Tables.cachedRead(spark, s"${lssLayoutCache(spark, dir)}/partners.parquet").orderBy("doc_id")

  /** Ingest-once materialization, the span-family contract (n7/n11/d16):
    * the `cap×`-token candidate aggregation is the dominant cost and is a
    * pure function of the corpus version, so it runs inside the layout
    * build — producing BOTH per-doc tables from one shared candidate
    * stream — and every query is a read. Key carries scheme + cap.
    */
  private def lssLayoutCache(spark: SparkSession, dir: String): String = {
    val cap = graft.GraftConf.int(spark, "lss.max_tokens", 16)
    require(cap >= 1, s"graft.lss.max_tokens=$cap must be >= 1")
    val pk = lssPartnerK(spark)
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"lss-v$LssSchemeVersion#c$cap#k$pk"
    )
    graft.sources.LayoutCache.getOrBuild(spark, "graft_lss", key) { out =>
      // ONE execution of the heavy lineage: the ledger is written first,
      // and the lss/partners tables are projections of its rank-1 rows
      // READ BACK from the just-written parquet — the old shape wrote
      // three outputs off the same lineage and re-paid the corpus
      // explode + shared-span aggregation for each (3× the build cost,
      // measured 50.8 s → ~1/3 at sf0.1 cold)
      val (_, _, topk) = longestSharedSubstringArtifacts(Tables.documents(spark, dir), cap, pk)
      topk.write.mode("overwrite").parquet(s"$out/topk.parquet")
      val t = spark.read.parquet(s"$out/topk.parquet")
      lssFromTopk(t).write.mode("overwrite").parquet(s"$out/lss.parquet")
      lssPartnersFromTopk(t).write.mode("overwrite").parquet(s"$out/partners.parquet")
    }
  }

  /** Ledger depth of the top-K span table: how many (span, carriers)
    * entries each document stores at ingest. Governs how much concurrent
    * takedown mass resolves layout-only — see [[lssTakedownFromLedger]].
    */
  private[graft] def lssPartnerK(spark: SparkSession): Int = {
    val k = graft.GraftConf.int(spark, "lss.partner_k", 4)
    require(k >= 1, s"graft.lss.partner_k=$k must be >= 1")
    k
  }

  /** The per-doc top-K span ledger persisted with the LSS layout. */
  private[graft] def lssTopkLedger(spark: SparkSession, dir: String): DataFrame =
    Tables.cachedRead(spark, s"${lssLayoutCache(spark, dir)}/topk.parquet")

  /** The standalone one-output LSS fold — the recompute/differential
    * surface (targeted-overflow oracle side, specs, rehearsals). Kept
    * SEPARATE from the layout build so it never drags the ledger windows
    * in: per-(doc, len) min-md5 tie break, then the per-doc argmax by
    * length — provably the same row rank 1 of the ledger yields
    * (LssTakedownSpec/DedupSpec differentials pin the two paths against
    * each other at every corpus they share).
    */
  private[graft] def longestSharedSubstringFrom(docs: DataFrame, cap: Int): DataFrame =
    lssKept(docs, cap)
      .groupBy("doc_id", "len")
      .agg(min_by(col("s"), md5(col("s"))).as("s"))
      .groupBy("doc_id")
      .agg(max_by(struct(col("len"), col("s")), col("len")).as("m"))
      .select(col("doc_id"), col("m.len").as("lss_len"), md5(col("m.s")).as("lss_fp"))
      .orderBy("doc_id")

  /** The (doc_id, len, s) candidate-prefix stream every LSS pass starts
    * from. Per-position width keys via TWO chained generators and only
    * top-level (codegen'd) expressions — the nested
    * transform/array_distinct lambda form computed the same stream ~6×
    * slower because higher-order functions evaluate interpreted, and each
    * generated row dragged the document's whole token array through the
    * generate. Here explode #1 reduces the carried payload to one
    * `cap`-token window string per position, and explode #2 emits
    * (len, prefix) rows whose prefix is a codegen'd `substring_index`.
    */
  private[graft] def lssPrefixStream(docs: DataFrame, cap: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(col("doc_id"), col("toks"), explode(expr("sequence(1, size(toks))")).as("p"))
      .select(
        col("doc_id"),
        expr(s"concat_ws(' ', slice(toks, p, $cap))").as("win"),
        expr(s"least($cap, size(toks) - p + 1)").as("tc")
      )
      .select(col("doc_id"), explode(expr("sequence(1, tc)")).as("len"), col("win"))
      .select(
        col("doc_id"),
        col("len").cast("long").as("len"),
        expr("substring_index(win, ' ', len)").as("s")
      )

  /** The LSS answer for `targets` ONLY, computed against the full
    * `survivors` corpus WITHOUT the full-corpus wide aggregation — the
    * overflow path's cost fix. The full pass pays a corpus-volume
    * countDistinct over every (len, prefix) group to find shared spans
    * for every doc; here the recompute set is known (typically the
    * handful of truncated-all-dead ledger docs), so the survivor prefix
    * stream is SEMI-JOINED to the targets' span keys first — the wide
    * work shrinks from corpus-cardinality groups to the carriers of the
    * targets' own spans, and AQE broadcasts the (small) key set so the
    * filter runs map-side before any shuffle. Sharedness over the
    * filtered subset is min≠max on doc_id per exact (len, s) — partial-
    * aggregable with no per-key distinct state, so one ubiquitous span
    * (a stop-token every doc carries) costs two longs per partition,
    * not a distinct-set explosion. Exactness: a target's kept rows here
    * are exactly its kept rows in the full pass (its spans, carried by
    * ≥2 distinct survivors — xxhash collisions only widen the candidate
    * pull and are killed by the exact string recount), so the per-doc
    * (max len, min md5) fold returns the identical row
    * (LssTakedownSpec pins targeted ≡ full-filtered on the overflow
    * corpus and at sf0.001).
    */
  private[graft] def longestSharedSubstringTargeted(
      survivors: DataFrame,
      targets: DataFrame,
      cap: Int
  ): DataFrame = {
    val t     = targets.select("doc_id")
    val keyed = lssPrefixStream(survivors, cap).withColumn("xh", xxhash64(col("s")))
    // key derivation explodes the TARGET docs only — the semi join sits
    // below the generator (a join won't push through a Generate, so
    // joining `keyed` here would re-explode the whole corpus just to
    // read off the targets' keys)
    val targetKeys = lssPrefixStream(survivors.join(t, Seq("doc_id"), "left_semi"), cap)
      .select(col("len"), xxhash64(col("s")).as("xh"))
      .distinct()
    val cand = keyed.join(targetKeys, Seq("len", "xh"), "left_semi")
    val sharedExact = cand
      .groupBy("len", "s")
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .where(col("mn") =!= col("mx"))
      .select("len", "s")
    val kept = cand
      .join(t, Seq("doc_id"), "left_semi")
      .join(sharedExact, Seq("len", "s"), "left_semi")
    kept
      .groupBy("doc_id", "len")
      .agg(min_by(col("s"), md5(col("s"))).as("s"))
      .groupBy("doc_id")
      .agg(max_by(struct(col("len"), col("s")), col("len")).as("m"))
      .select(col("doc_id"), col("m.len").as("lss_len"), md5(col("m.s")).as("lss_fp"))
  }

  /** The shared-span stream every LSS pass folds: (doc_id, len, s) rows
    * whose (len, s) is carried by ≥ 2 distinct documents. Candidate
    * detection on LONG keys (xxhash64 of the prefix), exactness restored
    * by a RECOUNT over the candidate subset: df(len, xh) ≥ df(len, s) for
    * every s hashing to xh, so no truly-shared prefix can be missed, and
    * the string-keyed recount — over the candidate rows only, ~30% of the
    * stream here — kills any hash-collision false positive. Sharedness at
    * both levels is min≠max on doc_id, not countDistinct ≥ 2 — the same
    * partial-aggregable trick the targeted pass uses: two longs of state
    * per key instead of a distinct set, and a key all of whose rows come
    * from one doc (repeated positions) still correctly reads unshared.
    * No broadcast() hints anywhere: the key relations are small on
    * ordinary corpora (AQE broadcasts them from runtime stats) but grow
    * toward key/doc cardinality exactly on the duplication-heavy corpora
    * this rung targets — a forced hint would turn the layout build's
    * graceful shuffle-join degrade into a driver/broadcast-ceiling abort.
    */
  private def lssKept(docs: DataFrame, cap: Int): DataFrame = {
    val keyed = lssPrefixStream(docs, cap).withColumn("xh", xxhash64(col("s")))
    val candKeys = keyed
      .groupBy("len", "xh")
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .where(col("mn") =!= col("mx"))
      .select("len", "xh")
    val cand = keyed.join(candKeys, Seq("len", "xh"))
    val sharedExact = cand
      .groupBy("len", "s")
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .where(col("mn") =!= col("mx"))
      .select("len", "s")
    cand.join(sharedExact, Seq("len", "s"), "left_semi")
  }

  /** n19's table projected off the ledger: rank 1 IS the per-doc winner —
    * the ledger's (len desc, fp asc) walk order is exactly the (max len,
    * min md5) rule the standalone fold applies.
    */
  private[graft] def lssFromTopk(topk: DataFrame): DataFrame =
    topk
      .where(col("rank") === 1)
      .select(col("doc_id"), col("len").as("lss_len"), col("fp").as("lss_fp"))
      .orderBy("doc_id")

  /** n19b's table projected off the ledger: the winner's carrier list is
    * sorted ascending and truncated to the K smallest OTHERS, so
    * `others[0]` IS the smallest other doc carrying the winning span.
    */
  private[graft] def lssPartnersFromTopk(topk: DataFrame): DataFrame =
    topk
      .where(col("rank") === 1)
      .select(
        col("doc_id"),
        col("len").as("lss_len"),
        col("fp").as("lss_fp"),
        col("others").getItem(0).as("partner_id")
      )
      .orderBy("doc_id")

  private[graft] def longestSharedSubstringArtifacts(
      docs: DataFrame,
      cap: Int,
      partnerK: Int = 4
  ): (DataFrame, DataFrame, DataFrame) = {
    val topk = lssTopkFrom(docs, cap, partnerK)
    (lssFromTopk(topk), lssPartnersFromTopk(topk), topk)
  }

  private def lssTopkFrom(docs: DataFrame, cap: Int, partnerK: Int): DataFrame = {
    val kept = lssKept(docs, cap)
    // ---- the top-K span ledger (v3): per doc, its K best candidate
    // spans in EXACTLY the priority order a from-scratch recompute would
    // consider them — (len desc, fp asc), the same (max len, min md5)
    // tie rule `win` applies — each with the smallest K other carriers
    // and the true other-carrier count. This is sufficient state to
    // answer ANY takedown from the layout: walking the entries in order,
    // the first one with a surviving stored carrier is provably the
    // from-scratch answer over survivors (every unstored span orders
    // strictly after the K-th entry, so it can never beat a stored
    // survivor), an entry with a COMPLETE all-dead carrier list is
    // provably unusable (skip), and only a TRUNCATED all-stored-dead
    // carrier list is undecidable (→ the overflow recompute). Both
    // per-partition windows are bounded: the doc window by the doc's own
    // span count, the carrier window by the span's df (streaming
    // row_number, no per-group buffering).
    val entries = kept
      .select(col("doc_id"), col("len"), col("s"))
      .distinct()
      .withColumn("fp", md5(col("s")))
    val dw = Window.partitionBy("doc_id").orderBy(col("len").desc, col("fp").asc)
    val top = entries
      .withColumn("rank", row_number().over(dw))
      .withColumn("n_spans", count(lit(1)).over(Window.partitionBy("doc_id")))
      .where(col("rank") <= partnerK)
    val spanKeys = top.select("len", "s").distinct()
    val carrierRows = kept
      .join(spanKeys, Seq("len", "s"), "left_semi")
      .select("len", "s", "doc_id")
      .distinct()
    val cw = Window.partitionBy("len", "s").orderBy("doc_id")
    val carrierAgg = carrierRows
      .withColumn("crn", row_number().over(cw))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("len", "s")))
      .where(col("crn") <= partnerK + 1) // K+1 smallest: self may be among them
      .groupBy("len", "s")
      .agg(sort_array(collect_list("doc_id")).as("cands"), max("df").as("df"))
    top
      .join(carrierAgg, Seq("len", "s"))
      .select(
        col("doc_id"),
        col("rank"),
        col("len"),
        col("fp"),
        expr(s"slice(filter(cands, c -> c != doc_id), 1, $partnerK)").as("others"),
        (col("df") - lit(1L)).cast("long").as("n_others"),
        col("n_spans").cast("long").as("n_spans")
      )
  }

  /** N13 — frequent sub-span n-grams: the repeats n11 is blind to by
    * construction (its maximal segments start at the [[SpanTokens]]-token
    * window width; a 2–7-token catchphrase repeated across documents never
    * forms a shared span). Mines every n-gram of width `minN..maxN`, keeps
    * those appearing in ≥ `minDf` distinct documents, and reports the
    * top-`k` per width by (df desc, gram) — the boilerplate/catchphrase
    * census a curation pipeline reads before deciding redaction width.
    *
    * Scale shape — the span-family fingerprint discipline, kept INSIDE
    * whole-stage codegen: a position explode plus one fixed `xxhash64`
    * column per width (an `array(...)` of plain expressions, exploded) —
    * NOT `flatten(transform(...))` lambdas, which run interpreted
    * (HigherOrderFunction has no codegen) and measured ~6 s/scan at sf0.1
    * where this shape is scan-cost-free. The width tag is hashed INTO the
    * fingerprint, so the counting exchange carries `(h, doc_id)` longs —
    * never gram text — and df is a partial-aggregable distinct-doc count.
    * Text is materialized for df ≥ minDf SURVIVORS only: one occurrence
    * per surviving gram (min (doc_id, pos), deterministic) joins back to
    * its document and slices the token range — O(survivors) string work
    * total. The top-k-per-width window (text tie-break) runs over that
    * small frame. Hash collisions merge gram families with probability
    * ~g²/2⁶⁴ (immaterial beside [[verifyPairs]]'s identical trade).
    * Oracle: the same mining in DuckDB (lateral unnest over widths).
    */
  def frequentNgrams(
      spark: SparkSession,
      dir: String,
      minN: Int = 2,
      maxN: Int = 7,
      minDf: Int = 3,
      k: Int = 10
  ): DataFrame = {
    require(minN >= 2 && maxN >= minN && minDf >= 1 && k >= 1)
    // The census (every df ≥ minDf gram with its recovered text) is a
    // persisted layout — survivors are few, the mining pass is the whole
    // cost, and k is a read-time knob (any k reuses one census).
    val lay = gramCensusCached(spark, dir, minN, maxN, minDf)
    Tables.cachedRead(spark, lay)
      .withColumn("rnk", row_number().over(Window.partitionBy("n").orderBy(col("df").desc, col("gram"))))
      .where(col("rnk") <= k)
      .select(col("n"), col("gram"), col("df"))
      .orderBy(col("n"), col("df").desc, col("gram"))
  }

  /** The persisted gram census behind [[frequentNgrams]]: all grams of
    * width `minN..maxN` in ≥ `minDf` distinct documents, with recovered
    * text — `(n, gram, df)`. Mining parameters are part of the key; `k` is
    * not (top-k is a read-time window over the small survivor set).
    */
  private[graft] def gramCensusCached(
      spark: SparkSession,
      dir: String,
      minN: Int,
      maxN: Int,
      minDf: Int
  ): String = {
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"gramdf:v1:minN=$minN:maxN=$maxN:minDf=$minDf"
    )
    graft.sources.LayoutCache.getOrBuild(spark, "graft_gramdf", key, markSuccess = false) { out =>
      gramCensusLive(spark, dir, minN, maxN, minDf).write.parquet(out)
    }
  }

  /** Live (layout-free) census mining — the build path and the spec-level
    * equivalence oracle for [[frequentNgrams]].
    */
  private[graft] def frequentNgramsLive(
      spark: SparkSession,
      dir: String,
      minN: Int = 2,
      maxN: Int = 7,
      minDf: Int = 3,
      k: Int = 10
  ): DataFrame = {
    require(minN >= 2 && maxN >= minN && minDf >= 1 && k >= 1)
    gramCensusLive(spark, dir, minN, maxN, minDf)
      .withColumn("rnk", row_number().over(Window.partitionBy("n").orderBy(col("df").desc, col("gram"))))
      .where(col("rnk") <= k)
      .select(col("n"), col("gram"), col("df"))
      .orderBy(col("n"), col("df").desc, col("gram"))
  }

  private def gramCensusLive(
      spark: SparkSession,
      dir: String,
      minN: Int,
      maxN: Int,
      minDf: Int
  ): DataFrame = {
    def positions = Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= minN)
      .select(col("doc_id"), col("toks"), explode(expr(s"sequence(0, size(toks) - $minN)")).as("i"))
    def hashOf(n: Int): String = {
      val toks = (0 until n).map(j => s"toks[i + $j]").mkString(", ")
      // width folded into the hash; guard keeps windows inside the doc
      s"IF(i + ${n - 1} < size(toks), named_struct('n', ${n}L, 'h', xxhash64($n, $toks)), NULL)"
    }
    val widths = (minN to maxN).map(hashOf).mkString(", ")
    def occ = positions
      .select(col("doc_id"), col("i"), explode(expr(s"array($widths)")).as("g"))
      .where(col("g").isNotNull)
      .select(col("doc_id"), col("i"), col("g.n").as("n"), col("g.h").as("h"))
    val freq = occ
      .groupBy("h")
      .agg(countDistinct("doc_id").as("df"))
      .where(col("df") >= minDf)
    val firstOcc = occ
      .join(broadcast(freq), "h")
      .groupBy("h", "n", "df")
      .agg(min(struct(col("doc_id"), col("i"))).as("loc"))
    val recovered = Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .join(broadcast(firstOcc), col("doc_id") === col("loc.doc_id"))
      .select(col("n"), expr("concat_ws(' ', slice(toks, loc.i + 1, n))").as("gram"), col("df"))
    recovered
  }

  /** Shared core: given per-doc shingle-HASH sets (doc_id, ss: array<long>,
    * c: count) and a candidate-pair frame (doc_a, doc_b), compute exact
    * intersection/union sizes and keep pairs with Jaccard ≥ 4/5 (integer
    * arithmetic — no float threshold wobble). One narrow intersection count
    * per candidate pair instead of re-exploding shingles into a pair join:
    * candidate count, not shingle count, bounds the work — the property
    * that keeps verification cheap at 100 TB, where candidates are rare but
    * shingles are ~100× the corpus. The payload is xxhash64 fingerprints,
    * not shingle strings: 8 bytes/shingle instead of ~25-byte text through
    * the dominant dedup exchange (~4× less shuffle volume), with a
    * collision risk of ~n²/2⁶⁴ per doc pair — immaterial beside MinHash's
    * own 1e-18 miss probability. The count is the native
    * [[graft.functions.IntersectionSize]] expression — long-specialized
    * hash-probe, no intersection-array materialization
    * (`size(array_intersect)` would allocate and copy the overlap per pair
    * just to measure it).
    */
  private[graft] def verifyPairs(docSets: DataFrame, cand: DataFrame): DataFrame = {
    VectorFunctions.register(docSets.sparkSession)
    cand
      .join(docSets.select(col("doc_id").as("doc_a"), col("ss").as("ssa"), col("c").as("ca")), "doc_a")
      .join(docSets.select(col("doc_id").as("doc_b"), col("ss").as("ssb"), col("c").as("cb")), "doc_b")
      .withColumn("inter", expr("intersection_size(ssa, ssb)"))
      .withColumn("un", col("ca") + col("cb") - col("inter"))
      .where(col("inter") * 5 >= col("un") * 4)
      .select("doc_a", "doc_b", "inter", "un")
      .orderBy("doc_a", "doc_b")
  }

  /** Shingle stream with hot shingles (doc-frequency > `maxDf`) dropped —
    * the stop-shingle cap that bounds the inverted-index join's fan-out. A
    * shingle in d docs contributes C(d,2) candidate pairs, so one boilerplate
    * string shared by 10⁶ documents alone generates ~5·10¹¹ pairs — the
    * hot-shingle skew SCALE.md flags. Such a shingle also carries no
    * near-duplication signal (it is corpus-wide background), so dropping it
    * from BOTH the pair generation and the per-doc set sizes keeps Jaccard
    * honest over the capped shingle space. The hot set is ≤ |shingles|/maxDf
    * rows by construction → broadcast anti-join, no extra shuffle of the
    * stream. Default cap 1000 is ~40× this corpus's max df (25 at sf0.1): at
    * test scale nothing is dropped and n1's oracle is unchanged.
    */
  private[graft] def cappedShingles(docs: DataFrame, n: Int = 3, maxDf: Long = 1000L): DataFrame = {
    val sh  = shingles(docs, n)
    val hot = sh.groupBy("s").agg(count(lit(1)).as("df")).where(col("df") > maxDf).select("s")
    sh.join(broadcast(hot), Seq("s"), "left_anti")
  }

  /** N1 — exact n-gram Jaccard near-dup pairs (threshold 0.8) via the
    * inverted-index self-join: only pairs sharing ≥1 shingle are ever
    * considered, and hot shingles are capped out first ([[cappedShingles]])
    * so no single shingle can explode the join. Each index row carries its
    * doc's shingle-set size, so set sizes ride THROUGH the pair join as
    * grouping keys (ca/cb are functions of doc_a/doc_b) — no separate count
    * aggregation and no post-join count lookups. The join key is the
    * shingle's xxhash64 (8-byte fixed-width) rather than the shingle text:
    * the inverted index is the single largest shuffle in the exact rung and
    * longs hash/compare/ship ~4× cheaper than ~25-byte strings.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
      maxShingleDf: Long = -1L // -1 = the graft.jaccard.max_shingle_df session knob (1000 unset)
  ): DataFrame = {
    val maxDf = if (maxShingleDf >= 0) maxShingleDf
      else graft.GraftConf.int(spark, "jaccard.max_shingle_df", 1000).toLong
    shinglePairCounts(spark, dir, maxDf)
      .withColumn("un", col("ca") + col("cb") - col("inter"))
      .where(col("inter") * 5 >= col("un") * 4)
      .select("doc_a", "doc_b", "inter", "un")
      .orderBy("doc_a", "doc_b")
  }

  /** The shared exact pair-intersection core behind [[ngramJaccardPairs]]
    * and [[ngramContainmentPairs]] — per candidate pair the distinct-
    * shingle intersection plus both documents' shingle cardinalities.
    * Intersection counts are hash-invariant (distinct 64-bit hashes per
    * doc), which is why both consumers stay DuckDB-oracle-checkable.
    */
  private def shinglePairCounts(spark: SparkSession, dir: String, maxDf: Long): DataFrame = {
    // fanOut (guide §2.5): the shingle explosion + per-doc distinct is the
    // rung's serial CPU behind a one-row-group scan; hashing on doc_id
    // keeps each doc's shingles co-located so the partial distinct stays
    // as effective as the scan-fused form. Distinct hashes, counts and the
    // pair intersection are set-functions — placement cannot move a row.
    val sh = cappedShingles(
      Tables.fanOut(
        Tables.documents(spark, dir),
        Seq(s"$dir/documents.parquet"),
        Seq(col("doc_id"))
      ),
      maxDf = maxDf
    ).withColumn("h", xxhash64(col("s")))
    // Flat distinct + count join rather than collect_set + explode: the
    // array form holds every doc's full hash set in ObjectHashAggregate
    // state at once (~2 GiB at the 10× rehearsal — measured OOM at a
    // 4 GiB heap), while this shape is all flat, spillable
    // HashAggregates and one doc-keyed join of a doc-cardinality table.
    val dh  = sh.select("doc_id", "h").distinct()
    val cnt = dh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val idx = dh.join(cnt, "doc_id").select(col("doc_id"), col("c"), col("h"))
    idx
      .as("a")
      .join(idx.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        col("a.c").as("ca"),
        col("b.c").as("cb")
      )
      .agg(count(lit(1)).as("inter"))
  }

  /** N16 — CONTAINMENT near-dup pairs: the asymmetric twin of n1, scoring
    * `|A∩B| / min(|A|, |B|)` instead of Jaccard. The case this catches
    * that Jaccard structurally cannot: a short document embedded verbatim
    * in a much longer one (quotation, concatenation, boilerplate wrapper)
    * has containment ≈ 1 while Jaccard ≈ |A|/|B| → 0 — so a Jaccard-only
    * dedup keeps the duplicate. Threshold 0.8 on the smaller side,
    * integer cross-multiplied like every ratio gate here.
    *
    * Same exact inverted-index core as n1 (one shingle-keyed shuffle,
    * candidate pairs only from co-occurring shingles, hot-shingle df cap)
    * — and the same scale label: this is the exact-oracle rung; at corpus
    * scale the banded-LSH rung (n2) generates candidates and this
    * containment score replaces the Jaccard verify where subset-dups
    * matter.
    */
  def ngramContainmentPairs(spark: SparkSession, dir: String,
      maxShingleDf: Long = -1L
  ): DataFrame = {
    val maxDf = if (maxShingleDf >= 0) maxShingleDf
      else graft.GraftConf.int(spark, "jaccard.max_shingle_df", 1000).toLong
    shinglePairCounts(spark, dir, maxDf)
      .withColumn("c_small", least(col("ca"), col("cb")))
      .where(col("inter") * 5 >= col("c_small") * 4)
      .select("doc_a", "doc_b", "inter", "c_small")
      .orderBy("doc_a", "doc_b")
  }

  val MinhashHashes = 64
  val MinhashBands  = 16 // 4 rows per band

  /** Resolved (nHashes, nBands) from the `graft.minhash.hashes` /
    * `graft.minhash.bands` session knobs — the LSH operating point
    * (P(candidate) = 1−(1−s^rows)^bands). Validated here because an
    * uneven split would silently drop hashes from the last band.
    */
  private def minhashShape(spark: SparkSession): (Int, Int) = {
    val h = graft.GraftConf.int(spark, "minhash.hashes", MinhashHashes)
    val b = graft.GraftConf.int(spark, "minhash.bands", MinhashBands)
    require(h > 0 && b > 0 && h % b == 0, s"graft.minhash.bands=$b must divide graft.minhash.hashes=$h evenly")
    (h, b)
  }

  /** Per-doc MinHash artifacts for any (doc_id, text) frame: the
    * verification payload `(doc_id, ss, c)` and the band-bucket index
    * `(doc_id, band, bv)`. One groupBy produces everything — 64 seeded
    * min-hashes (all partial-aggregable) plus the shingle set + count — a
    * single shuffle over the shingle stream. Each shingle string is hashed
    * ONCE; the 64 minhash functions then hash that FIXED-WIDTH long with a
    * per-function seed (variable-length string hashing once per row, not
    * 64× — affine a·h+b permutations would be cheaper still, but ANSI mode
    * rejects their intentional mod-2⁶⁴ wraparound). Shared by the
    * whole-corpus rung ([[minhashLshPairs]]), the persisted index
    * ([[minhashIndexCache]]), and the incremental-batch rung
    * ([[incrementalNearDupPairs]]) — signatures agree by construction.
    */
  private[graft] def minhashArtifacts(docs: DataFrame): (DataFrame, DataFrame) = {
    val (nHashes, nBands) = minhashShape(docs.sparkSession)
    val sh      = shingles(docs).withColumn("h", shingleHash64(col("s")))
    val rows    = nHashes / nBands
    val minCols = (0 until nHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"h$i"))
    // Verification payload = the shingle HASHES, not the strings: longs ride
    // the exchange at 8 bytes/shingle and IntersectionSize probes them
    // allocation-free. Exactness is preserved up to 64-bit hash collisions
    // (~n²/2⁶⁴ per pair — noise beside the LSH miss probability). The
    // payload hash is the cross-engine [[shingleHash64]] (scheme v3) so
    // every downstream bit-derivation (n3's SimHash signatures) carries a
    // DuckDB oracle; the 64 minhash permutations still seed-hash that
    // FIXED-WIDTH long with engine xxhash64 — their job is candidate
    // generation, whose output is exact-verified, so they need speed, not
    // cross-engine reproducibility.
    val aggCols = minCols ++ Seq(collect_set(col("h")).as("ss"), count(lit(1)).as("c"))
    val perDoc  = sh.groupBy("doc_id").agg(aggCols.head, aggCols.tail: _*)
    // Band signature = hash of its `rows` member hashes; explode to
    // (doc_id, band, bucket).
    val bandCols = (0 until nBands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"h$i")): _*).as("bv")
      )
    }
    val buckets = perDoc
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bv").as("bv"))
    (perDoc.select("doc_id", "ss", "c"), buckets)
  }

  /** N2 — MinHash + LSH near-dup pairs, same output contract as
    * [[ngramJaccardPairs]] (candidates are exact-verified, so at the planted
    * similarity levels the result is identical — that is the oracle).
    */
  /** Full-corpus MinHash artifacts as a PERSISTED layout (content
    * fingerprint + scheme version via [[graft.sources.LayoutCache]], the
    * same staleness contract as n5's batch index and s6/s8's vector
    * layouts). Two reasons this is the production shape, not a benchmark
    * trick: (1) the bucket frame SELF-joins for candidates, and Catalyst
    * does not share uncached subtrees — the inline form therefore
    * re-shingled the whole corpus TWICE inside one n2 run; materialized,
    * both join sides scan one parquet. (2) signatures are per corpus
    * version, and every consumer (n2, n6, n9, c1, c2) reads the same
    * index instead of each re-deriving it — at 100 TB the signature pass
    * is the dominant cost and runs once. Deterministic (xxhash64) ⇒ the
    * cached artifacts are bit-identical to the inline computation, which
    * DedupSpec pins.
    */
  /** The signature-scheme tag a minhash artifact set is valid under —
    * scheme version + the knob operating point. The batch layouts fold
    * this into their cache KEYS (stale artifacts rebuild); the streaming
    * index ([[graft.streaming.DedupStream]]) stamps it into a `_scheme`
    * marker and REFUSES to append segments under a different tag, because
    * a stream cannot rebuild its history (older batches' raw documents
    * may be gone) and mixing hash schemes across segments silently loses
    * cross-batch pairs.
    */
  private[graft] def minhashSchemeTag(spark: SparkSession): String = {
    val (h, b) = minhashShape(spark)
    s"mh-v$MinhashSchemeVersion#h$h#b$b#n${shingleN(spark)}"
  }

  private[graft] def minhashArtifactsCached(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (h, b) = minhashShape(spark)
    // knob values fold into the key: signatures built at one operating
    // point must never be served to a session tuned to another
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"mhfull-v$MinhashSchemeVersion#h$h#b$b#n${shingleN(spark)}"
    )
    val layout = graft.sources.LayoutCache.getOrBuild(spark, "graft_mhfull", key) { out =>
      val (docSets, buckets) = minhashArtifacts(Tables.documents(spark, dir))
      docSets.write.mode("overwrite").parquet(s"$out/docsets.parquet")
      buckets.write.mode("overwrite").parquet(s"$out/buckets.parquet")
    }
    (Tables.cachedRead(spark, s"$layout/docsets.parquet"), Tables.cachedRead(spark, s"$layout/buckets.parquet"))
  }

  /** Bump when the pair derivation (candidate generation or verification
    * rule) changes; folded into the pair layout's cache key alongside the
    * signature scheme version.
    */
  private[graft] val MinhashPairsSchemeVersion = 1

  /** The registered n2 surface reads a PERSISTED pair table: after the
    * signature layout (round 6), this is the second materialization step
    * a production dedup pipeline performs at ingest — the pair/cluster
    * graph is published ONCE and every consumer (n2's listing, n6's
    * clusters, n9's keep-list, c1/c2's pipeline) reads it, instead of
    * each re-running the candidate join + exact verification. Same
    * staleness contract as every layout: corpus content fingerprint +
    * signature & pair scheme versions + the knob operating point, so a
    * regenerated corpus or retuned banding rebuilds rather than serving
    * stale pairs. [[minhashLshPairsLive]] stays as the live path the
    * layout is built from (and the spec's bit-equality differential).
    */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val (h, b) = minhashShape(spark)
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"mhpairs-v$MinhashPairsSchemeVersion#mh-v$MinhashSchemeVersion#h$h#b$b#n${shingleN(spark)}"
    )
    val layout = graft.sources.LayoutCache.getOrBuild(spark, "graft_mhpairs", key) { out =>
      minhashLshPairsLive(spark, dir).write.mode("overwrite").parquet(s"$out/pairs.parquet")
    }
    Tables.cachedRead(spark, s"$layout/pairs.parquet").orderBy("doc_a", "doc_b")
  }

  private[graft] def minhashLshPairsLive(spark: SparkSession, dir: String): DataFrame = {
    val (docSets, buckets) = minhashArtifactsCached(spark, dir)
    val cand = buckets
      .as("a")
      .join(buckets.as("b"), col("a.band") === col("b.band") && col("a.bv") === col("b.bv") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyPairs(docSets, cand)
  }

  /** Persisted MinHash index for the corpus slice `doc_id < batchStartId`:
    * band buckets + verification payloads written once to a `_SUCCESS`-
    * guarded layout cache — the structure a production dedup pipeline
    * maintains at ingest so that DAILY BATCHES join against the index
    * instead of re-shingling the whole corpus. Returns the layout path.
    */
  /** Bump whenever the persisted index layout or signature scheme changes
    * (payload went string→xxhash64 at v2, xxhash64→[[shingleHash64]] at
    * v3): the version is folded into the cache key so an index written
    * under an older scheme can never be silently reused against newer
    * signatures.
    */
  private[graft] val MinhashSchemeVersion = 3

  private[graft] def minhashIndexCache(spark: SparkSession, dir: String, batchStartId: Long): String = {
    // Key = scheme version + knob operating point + batch split + CONTENT
    // fingerprint of the source table — regenerated data under the same
    // path rebuilds the index instead of silently reusing signatures of
    // data that no longer exists.
    val (h, b) = minhashShape(spark)
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"mhidx-v$MinhashSchemeVersion#h$h#b$b#n${shingleN(spark)}#$batchStartId"
    )
    graft.sources.LayoutCache.getOrBuild(spark, "graft_mhidx", key) { out =>
      val corpus             = Tables.documents(spark, dir).where(col("doc_id") < batchStartId)
      val (docSets, buckets) = minhashArtifacts(corpus)
      docSets.write.mode("overwrite").parquet(s"$out/docsets.parquet")
      buckets.write.mode("overwrite").parquet(s"$out/buckets.parquet")
    }
  }

  /** N5 — INCREMENTAL near-dup detection: the second half of the corpus
    * (doc_id ≥ (max+1)/2) arrives as a "new batch" against the persisted
    * index of the first half. Reported pairs are those touching the batch
    * (batch×corpus via an equi-join of fresh batch buckets against the
    * STORED index, plus batch-internal self-pairs), exact-verified as
    * always. The corpus is never re-shingled — per-day work scales with the
    * batch, not corpus size, which is the only shape daily dedup at 100 TB
    * can take. Oracle: the exact-Jaccard SQL restricted to `doc_b ≥ k`
    * (valid because doc_a < doc_b and corpus ids precede batch ids).
    */
  def incrementalNearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.documents(spark, dir)
    // coalesce: max(doc_id) is NULL on an empty corpus — k=0 then makes
    // both halves empty and the operator degrades to an empty pair set
    // instead of throwing on the null scalar
    val k = all.agg(expr("coalesce((max(doc_id) + 1) div 2, 0)").as("k")).head().getLong(0)
    val layout        = minhashIndexCache(spark, dir, k)
    val corpusSets    = Tables.cachedRead(spark, s"$layout/docsets.parquet")
    val corpusBuckets = Tables.cachedRead(spark, s"$layout/buckets.parquet")
    // fanOut of the batch half tried and REVERTED (r22): the 64-way
    // min-aggregation consuming shuffled rows measured ~7x the CPU of the
    // scan-fused form (9.5 vs 1.4 cpu-sec) for a flat-to-worse wall.
    val (batchSets, batchBuckets) = minhashArtifacts(all.where(col("doc_id") >= k))
    // corpus ids < k ≤ batch ids, so cross pairs are (corpus, batch) —
    // already in doc_a < doc_b orientation; batch-internal pairs order as
    // usual. The two candidate sets are disjoint by construction.
    val crossCand = corpusBuckets
      .as("a")
      .join(batchBuckets.as("b"), col("a.band") === col("b.band") && col("a.bv") === col("b.bv"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val selfCand = batchBuckets
      .as("a")
      .join(batchBuckets.as("b"), col("a.band") === col("b.band") && col("a.bv") === col("b.bv") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyPairs(corpusSets.unionByName(batchSets), crossCand.unionByName(selfCand))
  }

  /** N12 — INCREMENTAL cluster maintenance: the full-corpus duplicate
    * cluster table after the daily batch arrives (n5's setting: docs ≥
    * (max+1)/2 are "new"), computed WITHOUT re-pairing the corpus —
    * from the prior half-corpus cluster table (a persisted layout, what
    * a production pipeline maintains at ingest) plus only the
    * batch-touching delta pairs [[incrementalNearDupPairs]] finds
    * against the stored signature index. Star contraction over (prior
    * cluster edges ∪ delta pairs) yields exactly the from-scratch
    * components: a cluster table IS a spanning star of its component,
    * and adding edges to a contracted graph preserves connectivity — so
    * n12 ≡ n6's full recompute, which is the oracle (same recursive-CTE
    * SQL) and the spec differential. Per-day cost scales with the batch
    * and the prior CLUSTER table (collision-bounded), never corpus size.
    * The updated table is itself persisted as the fourth materialization
    * rung (signatures → pairs → clusters → MAINTAINED clusters): the
    * incremental union+contraction runs once per corpus version inside
    * the layout builder, and the registered query reads the result — the
    * same ingest-time contract as n6, because tomorrow's increment starts
    * from today's table.
    */
  def incrementalDupClusters(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.documents(spark, dir)
    val k   = all.agg(expr("coalesce((max(doc_id) + 1) div 2, 0)").as("k")).head().getLong(0)
    // prior cluster table: contraction of the index half's pairs, persisted
    // like every ingest-time artifact (keyed on the same scheme chain as
    // the index it derives from)
    val (h, b) = minhashShape(spark)
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"mhclusters-half-v$ClustersSchemeVersion#p-v$MinhashPairsSchemeVersion#mh-v$MinhashSchemeVersion#h$h#b$b#n${shingleN(spark)}#$k"
    )
    val priorLayout = graft.sources.LayoutCache.getOrBuild(spark, "graft_mhclusters_half", key) { out =>
      val idx           = minhashIndexCache(spark, dir, k)
      val corpusSets    = Tables.cachedRead(spark, s"$idx/docsets.parquet")
      val corpusBuckets = Tables.cachedRead(spark, s"$idx/buckets.parquet")
      val cand = corpusBuckets
        .as("a")
        .join(
          corpusBuckets.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") && col("a.doc_id") < col("b.doc_id")
        )
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      clustersFromPairsStar(verifyPairs(corpusSets, cand))
        .write.mode("overwrite").parquet(s"$out/clusters.parquet")
    }
    // The updated full-corpus cluster table is itself the maintained
    // ingest artifact (the whole point of incremental maintenance is that
    // the NEXT day starts from it), so it lands as a layout like n6's:
    // the builder runs the incremental union+contraction once per corpus
    // version, and the registered query is a read. The key chains the
    // prior-half scheme plus the batch boundary, so regenerating the
    // corpus or retuning any upstream knob rebuilds the whole derivation.
    val incrKey = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"mhclusters-incr-v$ClustersSchemeVersion#p-v$MinhashPairsSchemeVersion#mh-v$MinhashSchemeVersion#h$h#b$b#n${shingleN(spark)}#$k"
    )
    val layout = graft.sources.LayoutCache.getOrBuild(spark, "graft_mhclusters_incr", incrKey) { out =>
      val prior = Tables.cachedRead(spark, s"$priorLayout/clusters.parquet")
        .select(col("cluster_id").as("doc_a"), col("doc_id").as("doc_b"))
      val delta = incrementalNearDupPairs(spark, dir).select("doc_a", "doc_b")
      clustersFromPairsStar(prior.unionByName(delta))
        .write.mode("overwrite").parquet(s"$out/clusters.parquet")
    }
    Tables.cachedRead(spark, s"$layout/clusters.parquet").orderBy("cluster_id", "doc_id")
  }

  /** N3 — SimHash near-dup pairs: 64-bit signature over the *distinct
    * 3-gram shingle set*, Hamming distance ≤ 7. Shingle (not token)
    * signatures matter on low-vocabulary corpora: token frequency profiles
    * collide (background Hamming min ≈ 0), while shingle sets separate
    * cleanly (planted near-dups at distance ≤ 10, random background p1 ≈ 23,
    * median ≈ 32 — measured on this corpus). Band pigeonhole (8 bands × 8
    * bits) makes candidate generation complete: any pair within distance 7
    * shares at least one full band — so the banded output EQUALS the
    * brute-force `dist ≤ 7` pair set, which is exactly what the DuckDB
    * oracle computes: since scheme v2 the shingle hash is the cross-engine
    * [[shingleHash64]], so the oracle rebuilds signatures bit-identically
    * (two 32-bit halves, per-bit majority vote) and brute-forces the
    * Hamming join. n3 was the board's last hash-opaque text rung; the
    * planted twin n3p stays as the fixture-anchored recall witness.
    */
  /** Bump when the signature derivation or banding scheme changes; folds
    * into the simhash pair layout's cache key. The key deliberately
    * EXCLUDES the minhash h/b knobs: the signature depends only on the
    * per-doc shingle-hash sets (scheme + shingle width), so retuning the
    * LSH banding must not rebuild simhash pairs. v2 = payload hash went
    * xxhash64 → [[shingleHash64]] (the flip that gave n3 its oracle).
    */
  private[graft] val SimhashSchemeVersion = 2

  /** The registered n3 surface reads a PERSISTED pair table — the same
    * ingest-once materialization contract as n2's pair layout (pairs are
    * published per corpus version; every query is a read). Built from
    * [[simhashPairsLive]], which DedupSpec pins bit-equal.
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"simhash-v$SimhashSchemeVersion#mh-v$MinhashSchemeVersion#n${shingleN(spark)}"
    )
    val layout = graft.sources.LayoutCache.getOrBuild(spark, "graft_shpairs", key) { out =>
      simhashPairsLive(spark, dir).write.mode("overwrite").parquet(s"$out/pairs.parquet")
    }
    Tables.cachedRead(spark, s"$layout/pairs.parquet").orderBy("doc_a", "doc_b")
  }

  /** First doc_id of the simdup planted fixture — pairs at or above it are
    * fixture-internal (both sides planted, since doc_a < doc_b).
    */
  private[graft] val SimdupPlantedBase = 3000000L

  /** N3P — [[simhashPairs]]'s plan over corpus ∪ the committed
    * identical-text fixture (`fixtures/simdup`, ids ≥ 3,000,000), restricted
    * to the planted pairs. Historically this twin existed because n3's
    * output rode the engine's xxhash64 and had no SQL oracle; since scheme
    * v2 the hash is the cross-engine [[shingleHash64]] and n3 carries a
    * full brute-force DuckDB oracle, so the twin's remaining job is the
    * fixture-anchored RECALL witness: identical text ⇒ identical shingle
    * set ⇒ identical signature ⇒ distance 0 under ANY hash, proving the
    * whole production pipeline (shingle → signature → band pigeonhole →
    * collision join → Hamming verify) emits real matches end-to-end on
    * pairs whose membership is hash-independent. The planted-range
    * restriction is the honest boundary of that independence: fixture
    * vocabularies are disjoint from each other and from every corpus
    * (DedupSpec measures cross distances ≥ 16 ≫ 7), so the planted pair
    * set is exactly the 5 identical-text pairs. Persisted like n3, keyed
    * on BOTH corpus and fixture content.
    */
  def simhashPairsPlanted(spark: SparkSession, dir: String): DataFrame = {
    val fx    = s"${graft.Fixtures.dir}/simdup/documents.parquet"
    val fxKey = graft.sources.LayoutCache.contentKey(spark, fx, "fx")
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"simhashp-v$SimhashSchemeVersion#mh-v$MinhashSchemeVersion#n${shingleN(spark)}#$fxKey"
    )
    val layout = graft.sources.LayoutCache.getOrBuild(spark, "graft_shpairsp", key) { out =>
      val docs = Tables
        .documents(spark, dir)
        .select("doc_id", "text")
        .unionByName(Tables.cachedRead(spark, fx).select("doc_id", "text"))
      val tok = shingles(docs).select(col("doc_id"), shingleHash64(col("s")).as("h")).distinct()
      simhashPairsFromHashes(tok)
        .where(col("doc_a") >= SimdupPlantedBase)
        .write.mode("overwrite").parquet(s"$out/pairs.parquet")
    }
    Tables.cachedRead(spark, s"$layout/pairs.parquet").orderBy("doc_a", "doc_b")
  }

  private[graft] def simhashPairsLive(spark: SparkSession, dir: String): DataFrame = {
    // The per-doc shingle-hash SETS the persisted minhash layout already
    // stores (docsets.ss = collect_set(shingleHash64(shingle))) are exactly
    // simhash's input stream — exploding them back is bit-identical to
    // re-shingling the corpus (both are distinct-per-doc shingleHash64
    // values) and skips the dominant tokenize+shingle pass entirely. n3
    // rides the same ingest-time artifact as n2/n5/n6/n9/c1/c2 instead of
    // being the one rung that re-reads text.
    val tok = minhashArtifactsCached(spark, dir)._1
      .select(col("doc_id"), explode(col("ss")).as("h"))
    simhashPairsFromHashes(tok)
  }

  /** SimHash signature → 8×8 band pigeonhole → Hamming-verified pairs over
    * any `(doc_id, h)` stream of DISTINCT per-doc shingle hashes — the body
    * shared by the corpus surface ([[simhashPairsLive]], which feeds it the
    * persisted docsets) and the planted twin ([[simhashPairsPlanted]], which
    * feeds it corpus ∪ fixture shingles).
    */
  private[graft] def simhashPairsFromHashes(tok: DataFrame): DataFrame = {
    val sig   = simhashSignaturesFromHashes(tok)
    val bands = sig.select(
      col("doc_id"),
      col("sig"),
      explode(
        array((0 until 8).map(k => struct(lit(k).as("band"), expr(s"(sig >> ${8 * k}) & 255").as("bv"))): _*)
      ).as("bk")
    ).select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.bv").as("bv"))
    bands
      .as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") && col("a.bv") === col("b.bv") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("dist", expr("bit_count(sig_a ^ sig_b)").cast("long"))
      .where(col("dist") <= 7)
      .select("doc_a", "doc_b", "dist")
      .orderBy("doc_a", "doc_b")
  }

  /** `(doc_id, sig)` — the 64-bit SimHash signature stage alone, shared by
    * [[simhashPairsFromHashes]] and DedupSpec's separation-margin checks.
    */
  private[graft] def simhashSignaturesFromHashes(tok: DataFrame): DataFrame = {
    val bitCols = (0 until 64).map(i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"b$i")
    )
    val sums = tok.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    sums.select(
      col("doc_id"),
      (0 until 64)
        .map(i => when(col(s"b$i") > 0, expr(s"shiftleft(cast(1 as bigint), $i)")).otherwise(lit(0L)))
        .reduce(_ bitwiseOR _)
        .as("sig")
    )
  }

  /** N6 — duplicate CLUSTERS: connected components over the near-dup pair
    * graph, labeled by min doc_id — the curation report a dedup pipeline
    * actually publishes ("these 7 documents are one group, keep the
    * representative"), where the raw pair list under-reports transitive
    * groups (a~b, b~c with a,c dissimilar is ONE cluster of 3). Pairs come
    * from the MinHash rung, components from [[clustersFromPairsStar]] (the
    * O(log n)-round star-contraction engine; [[clustersFromPairs]] is the
    * diameter-bound label-prop twin kept for the spec differential).
    * Oracle: DuckDB `WITH RECURSIVE` reachability over the exact-Jaccard
    * pair set.
    */
  /** Bump when the component derivation changes; folds into the cluster
    * layout's cache key with the pair scheme it derives from.
    */
  private[graft] val ClustersSchemeVersion = 1

  def dupClusters(spark: SparkSession, dir: String): DataFrame = {
    // The third ingest-time materialization rung (signatures → pairs →
    // CLUSTERS): star contraction runs once per corpus version and the
    // component table lands as a layout — n6 is a read, n9 a read + two
    // narrow joins, instead of each paying the iterative contraction's
    // driver-synchronized rounds per query. Key carries the full
    // derivation chain (signature scheme + knobs + pair scheme + cluster
    // scheme), so retuning any upstream knob rebuilds the chain.
    val (h, b) = minhashShape(spark)
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"mhclusters-v$ClustersSchemeVersion#p-v$MinhashPairsSchemeVersion#mh-v$MinhashSchemeVersion#h$h#b$b#n${shingleN(spark)}"
    )
    val layout = graft.sources.LayoutCache.getOrBuild(spark, "graft_mhclusters", key) { out =>
      clustersFromPairsStar(minhashLshPairs(spark, dir))
        .write.mode("overwrite").parquet(s"$out/clusters.parquet")
    }
    Tables.cachedRead(spark, s"$layout/clusters.parquet").orderBy("cluster_id", "doc_id")
  }

  /** G2 — fixed-point PageRank over the near-duplicate pair graph: which
    * documents are the HUBS of duplicated content (template pages, shared
    * boilerplate anchors) rather than merely members of some cluster. Three
    * power-method iterations with damping 0.85 over the symmetrized
    * verified-pair graph (the n2 production rung, whose pair set is itself
    * oracle-checked), initialized uniform.
    *
    * ALL arithmetic is 1e-12 fixed-point BIGINT: r₀ = S div N, per-edge
    * contribution (r·85) div (100·deg), teleport (0.15·S) div N — integer
    * division at every step, so the result is bit-identical regardless of
    * summation order or engine (the e4-decimal rule applied to an iterative
    * computation; a float PageRank would drift in the ulps across engines
    * and across partitionings of the same engine). That makes an ITERATIVE
    * GRAPH computation fully DuckDB-oracle-checkable.
    *
    * Scale shape: the loop unrolls into a static `iters`-deep join chain —
    * the standard Pregel-as-joins form. Each iteration shuffles the edge
    * table once on src and once on dst (both bounded by the verified pair
    * set, which is collision-bounded — never all-pairs), and the node frame
    * rides along at one row per paired document. No driver-side state: N is
    * a broadcast 1-row aggregate, and iteration count is fixed (rank
    * diagnosis, not convergence detection — the same contract as n13's
    * fixed census depth).
    */
  /** Iteration depth shared by [[dupPagerank]] and the registered DuckDB
    * oracle (`SparkEntry.dupPagerankOracle` unrolls exactly this many CTE
    * steps from the same constant) — the two stay in lock-step by
    * construction rather than by convention.
    */
  val DupPagerankIters: Int = 3

  /** Synchronized rounds for [[labelPropagation]] — part of the CONTRACT
    * (the oracle unrolls exactly this many), like [[DupPagerankIters]].
    */
  val LabelPropIters = 3

  /** G3 — min-label propagation over the near-dup graph: every node
    * starts as its own label; each synchronized round every node takes
    * the minimum of its label and its neighbors' previous-round labels.
    * After k rounds a node's label is the minimum doc_id within ≤ k hops
    * — i.e. n6's connected components RESTRICTED to a fixed frontier,
    * which is precisely the trade a 100 TB dedup graph forces: component
    * chains longer than k are rare in near-dup graphs (they indicate
    * template families, which n6's full closure handles), while k
    * bounded rounds mean k bounded shuffles with no iterate-to-
    * convergence driver loop. Partial convergence at the committed k is
    * the CONTRACT, not an approximation defect — the oracle unrolls the
    * same k rounds (g2's fixed-iteration discipline), and the spec pins
    * a chain where k rounds are insufficient by design.
    */
  def labelPropagation(spark: SparkSession, dir: String, iters: Int = LabelPropIters): DataFrame = {
    val pairs = minhashLshPairs(spark, dir).select("doc_a", "doc_b")
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    propagateLabels(edges, iters)
      .select(col("src").as("doc_id"), col("lbl").as("label"))
      .orderBy("doc_id")
  }

  /** The propagation core over any symmetric (src, dst) edge frame —
    * split out so specs can drive hand-built graphs. Every node in a
    * pair graph has ≥ 1 neighbor, so the per-round join is inner.
    */
  private[graft] def propagateLabels(edges: DataFrame, iters: Int): DataFrame = {
    var labels = edges.select(col("src")).distinct().withColumn("lbl", col("src"))
    for (_ <- 1 to iters) {
      val nbrMin = labels
        .join(edges, "src")
        .groupBy(col("dst"))
        .agg(min("lbl").as("mn"))
      labels = labels
        .join(nbrMin, labels("src") === nbrMin("dst"))
        .select(labels("src"), least(col("lbl"), col("mn")).as("lbl"))
    }
    labels
  }

  def dupPagerank(spark: SparkSession, dir: String, iters: Int = DupPagerankIters): DataFrame = {
    val S = 1000000000000L // 1e12 fixed-point scale
    val T = 150000000000L  // 0.15 * S: total teleport mass per node share
    val pairs = minhashLshPairs(spark, dir).select("doc_a", "doc_b")
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg   = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = deg.crossJoin(broadcast(deg.agg(count(lit(1)).as("n"))))
    var ranks = nodes.withColumn("r", expr(s"${S}L div n")) // (src, deg, n, r)
    for (_ <- 1 to iters) {
      val contrib = ranks
        .withColumn("c", expr("(r * 85L) div (100L * deg)"))
        .select(col("src"), col("c"))
        .join(edges, "src")
        .groupBy(col("dst"))
        .agg(sum("c").as("in_sum"))
      // symmetric graph: every node has in-degree = deg ≥ 1, so inner join
      ranks = nodes
        .join(contrib, nodes("src") === contrib("dst"))
        .select(nodes("src"), nodes("deg"), nodes("n"), (expr(s"${T}L div n") + col("in_sum")).as("r"))
    }
    ranks.select(col("src").as("doc_id"), col("r").as("pr")).orderBy("doc_id")
  }

  /** N9 — the deduplicated corpus as a listing: one row per KEPT document
    * `(doc_id, cluster_size)` — the min-id representative of every near-dup
    * cluster (size = members it stands for) plus every untouched document
    * (size 1). This is the materialization step the cluster table exists
    * for: what a training pipeline actually feeds downstream after n6's
    * diagnosis. Canonical-by-min-id is deterministic and retry-stable
    * (no `first()` under a nondeterministic order).
    *
    * Scale shape: the cluster frame is bounded by documents *touched by a
    * candidate pair* (collision-bounded, corpus-independent), and the only
    * corpus-wide operation is a left-anti join of doc ids against it —
    * 8-byte keys through the exchange, never text. The representative's
    * row is recognized by `doc_id === cluster_id` (star contraction labels
    * components by their min member), so no extra groupBy re-derives it.
    */
  def clusterRepresentatives(spark: SparkSession, dir: String): DataFrame = {
    val clusters = dupClusters(spark, dir).select("cluster_id", "doc_id")
    val sizes    = clusters.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    val reps = clusters
      .where(col("doc_id") === col("cluster_id"))
      .join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_size"))
    val singletons = Tables
      .documents(spark, dir)
      .select("doc_id")
      .join(clusters.select("doc_id"), Seq("doc_id"), "left_anti")
      .withColumn("cluster_size", lit(1L))
    reps.unionByName(singletons).orderBy("doc_id")
  }

  /** N14 — QUALITY-weighted representative selection: for every near-dup
    * cluster keep the member with the most tokens (tie → min doc_id), plus
    * every untouched document — `(doc_id, cluster_size, n_toks)`. n9's
    * min-id rule is deterministic but content-blind; real curation keeps
    * the member that retains the most content (near-dup groups are usually
    * a superset document plus its truncations/mutations), so the keep rule
    * is an argmax over a quality signal. Token count is the signal here
    * because it is SQL-expressible — the DuckDB oracle replays cluster
    * derivation (recursive reachability over exact-Jaccard pairs) AND the
    * argmax, keeping the whole operator hash-checked end-to-end; swapping
    * in another per-doc score (e.g. v3's LM score layout) changes one join.
    *
    * Scale shape: identical to n9 — the argmax is a `max(struct)` partial
    * aggregate over the collision-bounded cluster frame (never a window
    * over the corpus), the token counts it needs ride a narrow projection
    * joined to that bounded frame, and the corpus-wide work is one
    * left-anti join of 8-byte ids.
    */
  def qualityClusterRepresentatives(spark: SparkSession, dir: String): DataFrame = {
    val clusters = dupClusters(spark, dir).select("cluster_id", "doc_id")
    val toks = Tables
      .documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_toks"))
    val best = clusters
      .join(toks, "doc_id")
      .groupBy("cluster_id")
      .agg(
        count(lit(1)).as("cluster_size"),
        // argmax n_toks, tie-break min doc_id: max over (n_toks, -doc_id)
        max(struct(col("n_toks"), (-col("doc_id")).as("neg_id"))).as("m")
      )
      .select(
        (-col("m.neg_id")).as("doc_id"),
        col("cluster_size"),
        col("m.n_toks").as("n_toks")
      )
    val singletons = toks
      .join(clusters.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(1L).as("cluster_size"), col("n_toks"))
    best.unionByName(singletons).orderBy("doc_id")
  }

  /** Min-label propagation to fixpoint over an undirected pair graph:
    * every node starts as its own representative; each round takes the min
    * of its own and its neighbors' labels. Converges in O(component
    * diameter) rounds — near-dup clusters are shallow (members are all
    * mutually similar or chained through few hops), so rounds stay single
    * digits even when the corpus is huge; each round is one equi-join +
    * groupBy over the EDGE set (pair count, not corpus count — the same
    * candidate-bounded quantity that keeps verification cheap).
    * `localCheckpoint` after each round truncates lineage so the plan
    * doesn't grow with iterations (at cluster scale this would be a
    * reliable checkpoint to the DFS); the loop's only driver-side value is
    * the converged-yet count. A pathological million-hop chain would hit
    * `maxIter` — [[clustersFromPairsStar]] is the large-star/small-star
    * upgrade that contracts such chains in O(log n) rounds, and is what n6
    * registers; this form stays as its independent spec differential.
    */
  private[graft] def clustersFromPairs(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val es = pairs.select(col("doc_a").as("s"), col("doc_b").as("d"))
    val edges = es
      .unionByName(es.select(col("d").as("s"), col("s").as("d")))
      .distinct()
      .localCheckpoint()
    var labels  = edges.select(col("s").as("id")).distinct().withColumn("rep", col("id")).localCheckpoint()
    var changed = 1L
    var iter    = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("d"), col("rep").as("drep")), "d")
        .groupBy(col("s").as("id"))
        .agg(min("drep").as("nrep"))
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("rep"), least(col("rep"), coalesce(col("nrep"), col("rep"))).as("newrep"))
        .localCheckpoint()
      changed = next.where(col("newrep") < col("rep")).count()
      labels = next.select(col("id"), col("newrep").as("rep"))
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"label propagation did not converge in $maxIter rounds ($changed labels still moving): " +
          "component diameter exceeds the cap — raise maxIter or switch to pointer-jumping " +
          "(large-star/small-star) for chain-shaped corpora"
      )
    labels
      .select(col("rep").as("cluster_id"), col("id").as("doc_id"))
      .orderBy("cluster_id", "doc_id")
  }

  /** Large-star/small-star connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — the same
    * `(cluster_id = component-min doc_id, doc_id)` contract as
    * [[clustersFromPairs]], with rounds bounded by O(log n) instead of the
    * component DIAMETER. Min-label propagation moves a label one hop per
    * round, so a chain of serial near-copies (each generation copied from
    * the last — a real shape in scraped corpora) needs diameter rounds and
    * trips the maxIter guard; the star operations rewire every node
    * directly to a local minimum each round, contracting chains
    * exponentially. Each round is two phases over the EDGE set (large-star:
    * hang each node's larger neighbors off its local min; small-star: hang
    * the smaller ones), each one join + one groupBy on canonical
    * (hi → lo) edges; `localCheckpoint` truncates lineage per round as in
    * the label-prop rung, and the fixpoint test (edge set unchanged) is an
    * exact symmetric difference, not a hash. This is the registered n6
    * engine; the label-prop twin stays as the spec differential — both
    * produce identical output on every graph, which DedupSpec pins on
    * planted chains, triangles, and seeded random graphs.
    */
  private[graft] def clustersFromPairsStar(
      pairs: DataFrame,
      maxIter: Int = 25,
      onRound: Option[(Int, Long) => Unit] = None // (round, |edges|) — rehearsal instrumentation; None = no extra count job
  ): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    // m(u) = min(Γ(u) ∪ {u}) per node, from a symmetric edge frame
    def mins(s: DataFrame): DataFrame =
      s.groupBy("u").agg(min("v").as("mv")).select(col("u"), least(col("u"), col("mv")).as("m"))
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      s.join(mins(s), "u")
        .where(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val m = mins(s)
      s.join(m, "u")
        .where(col("v") < col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(m.where(col("u") =!= col("m")).select(col("u"), col("m").as("v")))
        .distinct()
    }
    var edges = pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("u"), least(col("doc_a"), col("doc_b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var iter      = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      converged = next.except(edges).unionByName(edges.except(next)).isEmpty
      edges = next
      iter += 1
      onRound.foreach(f => f(iter, edges.count()))
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not converge in $maxIter rounds: " +
          "edge set still changing — raise maxIter (rounds are O(log n), so this indicates " +
          "a pathological graph or a bug, not a deep chain)"
      )
    val s = sym(edges)
    mins(s)
      .select(col("m").as("cluster_id"), col("u").as("doc_id"))
      .orderBy("cluster_id", "doc_id")
  }

  /** N10 — the SEMANTIC keep-list: [[clusterRepresentatives]]'s contract
    * over the EMBEDDING near-dup graph (n4's hyperplane-banded cosine ≥
    * 0.95 pairs) instead of the lexical MinHash graph — one row per kept
    * vector `(vec_id, cluster_size)`. Lexical dedup misses paraphrases
    * and translations; this is the rung that catches them, and its keep
    * rule (min-id representative per component, singletons pass) is
    * deliberately THE SAME as n9's so a pipeline can swap rungs without
    * changing downstream contracts. Same scale shape too: star
    * contraction over the collision-bounded pair set, then one anti-join
    * of 8-byte vec ids.
    */
  def embeddingClusterRepresentatives(spark: SparkSession, dir: String): DataFrame = {
    val clusters = clustersFromPairsStar(
      embeddingDupPairs(spark, dir)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    ).select(col("cluster_id"), col("doc_id").as("vec_id"))
    val sizes = clusters.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    val reps = clusters
      .where(col("vec_id") === col("cluster_id"))
      .join(sizes, "cluster_id")
      .select(col("vec_id"), col("cluster_size"))
    val singletons = Tables
      .embeddings(spark, dir)
      .select("vec_id")
      .join(clusters.select("vec_id"), Seq("vec_id"), "left_anti")
      .withColumn("cluster_size", lit(1L))
    reps.unionByName(singletons).orderBy("vec_id")
  }

  /** User-facing dedup: return `documents` with near-duplicates removed —
    * for every qualifying pair (a, b) with a < b, the higher id is dropped
    * (no surviving pair, provably, without union-find). `exact = false`
    * (default) uses the MinHash+LSH rung — the only one whose cost is
    * bounded by candidates, hence the 100 TB default; `exact = true` swaps
    * in the inverted-index exact pairs for oracle-grade runs.
    */
  def dropNearDuplicates(spark: SparkSession, dir: String, exact: Boolean = false): DataFrame = {
    val pairs = if (exact) ngramJaccardPairs(spark, dir) else minhashLshPairs(spark, dir)
    Tables
      .documents(spark, dir)
      .join(pairs.select(col("doc_b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
  }

  /** Band buckets from random-hyperplane sign bits: one 64-bit signature per
    * vector (`nBands`×`bandBits` seeded hyperplanes, dot-product sign per
    * plane — fused `zip_with`+`aggregate`, all codegen), exploded to one
    * (vec_id, band, bucket) row per band. Shared by [[embeddingDupPairs]];
    * planes come from [[Similarity.planes]] so signatures agree across
    * operators.
    */
  private def hyperplaneBands(df: DataFrame, nBands: Int, bandBits: Int, dim: Int): DataFrame = {
    require(nBands * bandBits <= 64, "signature must fit one long")
    val ps = Similarity.planes(nBands * bandBits, dim)
    val bitCols = ps.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(col("embedding"), typedLit(p.toSeq), (x, y) => x * y),
        lit(0.0),
        (acc, v) => acc + v
      )
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    // dimension guard: a null or wrong-width embedding would dot to null on
    // every plane → signature 0 → EVERY such vector in the same bucket of
    // every band, an all-pairs blowup among them. Drop them from banding
    // instead (observable degrade: they appear in no pair, like cosine_sim's
    // null-on-mismatch stance).
    val sig = df
      .where(size(col("embedding")) === dim)
      .select(col("vec_id"), bitCols.reduce(_ + _).as("sig"))
    val mask = (1L << bandBits) - 1
    sig
      .select(
        col("vec_id"),
        explode(
          array((0 until nBands).map(b => struct(lit(b).as("band"), expr(s"(sig >> ${bandBits * b}) & $mask").as("bv"))): _*)
        ).as("bk")
      )
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.bv").as("bv"))
  }

  /** N4 — embedding near-dup pairs: cosine ≥ `threshold` over `embeddings`,
    * via banded hyperplane LSH. Candidates are pairs sharing ≥1 (band,
    * bucket); only candidates are cosine-scored, so the all-pairs space
    * never materializes — the 100 TB shape (at real scale, bits-per-band
    * grows ~log₂(n) so buckets stay O(1)-sized; 8×8 fits the test corpora).
    * Recall at the default operating point: a cosine-0.95 pair agrees per
    * plane w.p. 1−θ/π ≈ 0.899 → P(miss) = (1−0.899⁸)⁸ ≈ 1.2%, and ≈ 8e-5 at
    * the ≥0.99 similarity where real duplicate embeddings live. Verification
    * is exact, so output ⊆ brute force always; DedupSpec proves equality on
    * a planted fixture and [[embeddingDupPairsBrute]] stays as the oracle.
    */
  /** Bump when the embedding pair derivation changes (plane scheme,
    * verification rule); folded into the pair layout's cache key.
    */
  private[graft] val EmbPairsSchemeVersion = 1

  /** Like [[minhashLshPairs]], the registered n4 surface reads a
    * PERSISTED pair table — the banded-LSH candidate join + exact cosine
    * verification run once per (embeddings content, threshold, banding)
    * and land as a layout every consumer (n4's listing, n10's semantic
    * keep-list) reads. The hyperplane directions are deterministic
    * ([[Similarity.planes]]), so the cached pairs are bit-identical to
    * the live computation, which the spec pins.
    */
  def embeddingDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val t  = graft.GraftConf.double(spark, "embdup.threshold", 0.95)
    val nb = graft.GraftConf.int(spark, "embdup.bands", 8)
    val bb = graft.GraftConf.int(spark, "embdup.band_bits", 8)
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/embeddings.parquet",
      s"embpairs-v$EmbPairsSchemeVersion#t$t#b${nb}x$bb"
    )
    val layout = graft.sources.LayoutCache.getOrBuild(spark, "graft_embpairs", key) { out =>
      VectorFunctions.register(spark)
      embeddingDupPairsOn(Tables.embeddings(spark, dir), threshold = t, nBands = nb, bandBits = bb)
        .write.mode("overwrite").parquet(s"$out/pairs.parquet")
    }
    Tables.cachedRead(spark, s"$layout/pairs.parquet").orderBy("vec_a", "vec_b")
  }

  /** N4P — [[embeddingDupPairs]] with the committed near-dup fixture
    * (`fixtures/embdup`, ids ≥ 1e6) unioned into the corpus. The testdata
    * corpora contain no pair above the threshold at any SF, so plain n4's
    * oracle row is vacuously green (0 rows); this twin makes the
    * hash-checked path prove MATCHES — the DuckDB oracle reads the same
    * fixture file via `read_parquet` and brute-forces the union. Persisted
    * like n4, keyed on BOTH the corpus and fixture content.
    */
  def embeddingDupPairsPlanted(spark: SparkSession, dir: String): DataFrame = {
    val t   = graft.GraftConf.double(spark, "embdup.threshold", 0.95)
    val nb  = graft.GraftConf.int(spark, "embdup.bands", 8)
    val bb  = graft.GraftConf.int(spark, "embdup.band_bits", 8)
    val fx  = s"${graft.Fixtures.dir}/embdup/embeddings.parquet"
    val fxKey = graft.sources.LayoutCache.contentKey(spark, fx, "fx")
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/embeddings.parquet",
      s"embpairsp-v$EmbPairsSchemeVersion#t$t#b${nb}x$bb#$fxKey"
    )
    val layout = graft.sources.LayoutCache.getOrBuild(spark, "graft_embpairsp", key) { out =>
      VectorFunctions.register(spark)
      val e = Tables.embeddings(spark, dir).unionByName(Tables.cachedRead(spark, fx))
      embeddingDupPairsOn(e, threshold = t, nBands = nb, bandBits = bb)
        .write.mode("overwrite").parquet(s"$out/pairs.parquet")
    }
    Tables.cachedRead(spark, s"$layout/pairs.parquet").orderBy("vec_a", "vec_b")
  }

  /** LSH-bucketed pairwise dedup over any (vec_id, embedding) frame —
    * requires `cosine_sim` registered on the active session.
    */
  def embeddingDupPairsOn(
      e: DataFrame,
      threshold: Double = 0.95,
      nBands: Int = 8,
      bandBits: Int = 8,
      dim: Int = 64
  ): DataFrame = {
    val bands = hyperplaneBands(e, nBands, bandBits, dim)
    val cand = bands
      .as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") && col("a.bv") === col("b.bv") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
      .where(expr("cosine_sim(ea, eb)") >= threshold)
      .select("vec_a", "vec_b")
      .orderBy("vec_a", "vec_b")
  }

  /** Hamming radius for [[imageDhashPairs]] — ≤ 7 so the 8×8-bit band
    * pigeonhole (≤ 7 differing bits ⇒ ≥ 1 identical band) makes candidate
    * generation exact-complete, the same bound n3's SimHash rung rides.
    */
  val DhashHammingMax: Int = 7

  /** N17 — image near-dup pairs by perceptual hash: every decodable
    * raster's 64-bit dHash ([[Multimodal.imageDhash]]) banded into 8×8-bit
    * keys, candidates from band-bucket collisions only, exact Hamming
    * verification of candidates — the SimHash plan family applied to the
    * IMAGE modality. This closes the dedup ladder's multimodal gap: n1–n16
    * dedup text and embeddings; n17 dedups rasters through the real decode
    * path (re-encoded or resampled copies collapse to nearby dHashes).
    *
    * Unlike n3 (whose signature rides the engine's xxhash64), the dHash is
    * pure pixel arithmetic — band keys are substrings OF THE HASH ITSELF —
    * so the whole rung carries a full DuckDB oracle: the oracle rebuilds
    * every grid cell relationally from the PGM quarter's pixel formula and
    * brute-forces the pair join at oracle scale. No planted twin needed;
    * the production path IS the hash-checked path.
    *
    * TWO-LEVEL structure, and why: a 64-bit perceptual hash has far fewer
    * distinct values than a corpus has images (identical and tiny rasters
    * collapse), so the banded join runs over the DISTINCT HASHES — hash
    * cardinality, never image cardinality — and image pairs are expanded
    * from the verified hash pairs afterwards (broadcast of the tiny
    * hash-pair set; identical-hash pairs come from one hash-keyed
    * self-join). The naive image-level band join is quadratic in bucket
    * OCCUPANCY with an 8-way duplicated candidate stream feeding a
    * distinct — the round-13 rehearsal measured it wedged at 100× on the
    * degenerate synthetic rasters (≤ 15×10 px upsampled to one of a few
    * hundred grids), while this formulation's wide ops are all
    * hash-cardinality. The OUTPUT is still every qualifying pair — on a
    * corpus where near-everything collides, that answer itself is
    * quadratic; production caps it by emitting exact-dup GROUPS (q8's
    * shape) and keeping pair expansion for the cross-hash tail.
    *
    * The batch rung re-derives the hash ledger once per plan subtree (the
    * decode is the dominant per-row cost), so since round 14 every batch
    * rung reads the decode-once LEDGER LAYOUT
    * ([[graft.operators.Multimodal.imageDhashLedger]] — one build per
    * corpus version serves m9/n17/n18/n21, and the multi-scan capped plan
    * no longer re-decodes per scan); the continuously-maintained twin is
    * the streamed catalog ([[graft.streaming.DhashStream]]), whose sealed
    * segments feed this same pair core without re-touching a payload.
    */
  def imageDhashPairs(spark: SparkSession, dir: String): DataFrame =
    dhashPairsFromHashes(
      graft.operators.Multimodal.imageDhashLedger(spark, dir),
      Some(graft.operators.Multimodal.imageDhashBandBound(spark, dir))
    )

  /** N18 — exact perceptual-dup GROUPS: the production shape n17's doc
    * promises for the identical-hash mass. Where the pair list is
    * quadratic in group size (1.46B rows at the rehearsal's 100× — the
    * honest answer, but not what a curation pipeline materializes), the
    * group ledger is ONE hash-keyed aggregation: per colliding dHash the
    * member count and the min-id representative to keep — q8's exact-dedup
    * shape lifted to the perceptual key. Linear in images at any scale,
    * fully oracled like the rest of the family (the hash is pixel
    * arithmetic). Near-dup pairs across DISTINCT hashes remain n17's
    * cross-hash tail, which is small whenever the corpus is degenerate
    * enough for this ledger to matter.
    */
  def imageDhashGroups(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.imageDhashLedger(spark, dir)
      .groupBy("hash_hi", "hash_lo")
      .agg(count(lit(1)).as("n_images"), min("media_id").as("keeper"))
      .where(col("n_images") >= 2)
      .orderBy("hash_hi", "hash_lo")

  /** The two-level pair core over any `(media_id, hash_hi, hash_lo)`
    * ledger — shared by the batch surface above and the stream-maintained
    * ledger ([[graft.streaming.DhashStream]]), one definition so the
    * streamed catalog can never pair differently from the batch one.
    */
  private[graft] def dhashPairsFromHashes(h: DataFrame, probeBound: Option[Long] = None): DataFrame = {
    val hashPairs = verifiedDhashHashPairs(h, probeBound)
    // level 2a: identical-hash image pairs (dist 0) — one hash-keyed
    // self-join, per-group output generated streamwise, no distinct
    val same = h
      .as("x")
      .join(
        h.as("y"),
        col("x.hash_hi") === col("y.hash_hi") && col("x.hash_lo") === col("y.hash_lo") &&
          col("x.media_id") < col("y.media_id")
      )
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"), lit(0L).as("dist"))
    // level 2b: cross-hash expansion — every unordered image pair appears
    // exactly once because its hash pair is stored once (struct-ordered)
    val cross = hashPairs
      .join(h.select(col("media_id").as("ia"), col("hash_hi").as("ha_hi"), col("hash_lo").as("ha_lo")), Seq("ha_hi", "ha_lo"))
      .join(h.select(col("media_id").as("ib"), col("hash_hi").as("hb_hi"), col("hash_lo").as("hb_lo")), Seq("hb_hi", "hb_lo"))
      .select(least(col("ia"), col("ib")).as("media_a"), greatest(col("ia"), col("ib")).as("media_b"), col("dist"))
    same.unionByName(cross).orderBy("media_a", "media_b")
  }

  /** N20 — AUDIO near-dup pairs by perceptual hash: every decodable WAV's
    * 64-bit temporal-envelope hash ([[Multimodal.audioEnvelopeHash]])
    * through the SAME two-level banded-Hamming pair core as the image
    * rung — [[dhashPairsFromHashes]] is generic over any
    * `(media_id, hash_hi, hash_lo)` ledger, so the audio modality costs
    * one hash definition, not a new join family. Closes the dedup
    * ladder's last modality gap (text n1–n19, embeddings n4/n10, images
    * m9/n17/n18/n21, audio here). Fully DuckDB-oracled: the hash is
    * integer envelope arithmetic over the relationally-rebuildable PCM
    * samples (m6's byte-exactness argument), so the oracle brute-forces
    * the Hamming join over rebuilt hashes — no planted twin needed.
    * Re-encoded or resampled copies of a recording collapse to nearby
    * envelopes, hence nearby hashes; the synthetic corpus's dist-0 mass
    * (ids 256 apart share the sample formula) plays the duplicate role
    * the spec pins.
    */
  def audioHashPairs(spark: SparkSession, dir: String): DataFrame =
    dhashPairsFromHashes(
      graft.operators.Multimodal.audioHashLedger(spark, dir),
      Some(graft.operators.Multimodal.audioHashBandBound(spark, dir))
    )

  /** N23 — exact perceptual-dup GROUPS on the AUDIO key: n18's one
    * hash-keyed aggregation (member count + min-id keeper per colliding
    * envelope hash) over the m10 ledger — completing the per-modality
    * symmetry (images: m9 ledger / n17 pairs / n18 groups / n21 capped;
    * audio: m10 / n20 / here / n22). Linear in recordings at any scale;
    * fully oracled like the whole family.
    */
  def audioHashGroups(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.audioHashLedger(spark, dir)
      .groupBy("hash_hi", "hash_lo")
      .agg(count(lit(1)).as("n_recordings"), min("media_id").as("keeper"))
      .where(col("n_recordings") >= 2)
      .orderBy("hash_hi", "hash_lo")

  /** N22 — n20 with the expansion cap enforced: [[audioHashPairs]]'s
    * ledger through [[dhashPairsCappedFromHashes]], the same
    * `graft.dhash.pair_cap` knob and output contract as n21. The round-14
    * rehearsal measured why this rung must exist: at 100× the audio
    * quarter's hash masses make n20's honest pair list 939M rows (243 s,
    * output-volume-bound, shuffle still 1.1 MiB), while the capped ledger
    * is hash-cardinality at any duplication level. At test SF every unit
    * is under the default cap, so n22 ≡ n20's pairs exactly (spec-pinned)
    * — the degrade shapes are exercised by the shared core's all-collide
    * fixture spec and the rehearsal row.
    */
  def audioHashPairsCapped(spark: SparkSession, dir: String): DataFrame =
    dhashPairsCappedFromHashes(
      graft.operators.Multimodal.audioHashLedger(spark, dir),
      graft.GraftConf.int(spark, "dhash.pair_cap", 16).toLong,
      Some(graft.operators.Multimodal.audioHashBandBound(spark, dir))
    )

  /** N24 — VIDEO near-dup pairs: the media-level keyframe-simhash ledger
    * ([[graft.operators.Multimodal.videoSimhashOf]] over the m11 keyframe
    * fingerprints) through the SAME pair core as images (n17) and audio
    * (n20) — the third modality costs one ledger definition, not a new
    * join family. Two videos sharing most sync frames (re-encoded copies,
    * truncations — the synthetic corpus's id+256 payload-formula twins
    * and its length-truncated variants) land within the Hamming
    * threshold; fully DuckDB-oracled end to end because keyframe
    * extraction is the real ISO-BMFF demux over arithmetic payloads and
    * both hash levels are md5/integer arithmetic.
    */
  def videoHashPairs(spark: SparkSession, dir: String): DataFrame =
    dhashPairsFromHashes(
      graft.operators.Multimodal.videoHashLedger(spark, dir),
      Some(graft.operators.Multimodal.videoHashBandBound(spark, dir))
    )

  /** N25 — exact video-dup GROUPS on the media simhash (n18/n23's one
    * hash-keyed aggregation, video modality).
    */
  def videoHashGroups(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.videoHashLedger(spark, dir)
      .groupBy("hash_hi", "hash_lo")
      .agg(count(lit(1)).as("n_videos"), min("media_id").as("keeper"))
      .where(col("n_videos") >= 2)
      .orderBy("hash_hi", "hash_lo")

  /** N26 — n24 with the expansion cap enforced: the same
    * `graft.dhash.pair_cap` knob and pair/group/xgroup/band output
    * contract as n21/n22, completing the per-modality symmetry
    * (images m9/n17/n18/n21, audio m10/n20/n23/n22, video
    * m11/n24/n25/here).
    */
  def videoHashPairsCapped(spark: SparkSession, dir: String): DataFrame =
    dhashPairsCappedFromHashes(
      graft.operators.Multimodal.videoHashLedger(spark, dir),
      graft.GraftConf.int(spark, "dhash.pair_cap", 16).toLong,
      Some(graft.operators.Multimodal.videoHashBandBound(spark, dir))
    )

  // ---- takedown lifecycle for the perceptual + LSS layouts (round 15:
  // the t17/s21p deletion discipline extended to the last layouts that
  // had no tombstone path — a GDPR takedown against an image-dedup
  // ledger now has somewhere to go) ----------------------------------

  /** Takedown rule for the perceptual-hash ledgers: `media_id ≡ rem
    * (mod 8)`. A fixed rule keeps the masked rungs DuckDB-oracleable
    * (t17's discipline — production passes its own ledger into the same
    * machinery); rem is chosen inside each modality's quarter so every
    * ledger has real tombstone mass (images ≡0 mod 4 → rem 0 tombstones
    * half the rasters; audio rem 1; video rem 3).
    */
  private[graft] def mediaTombstones(spark: SparkSession, dir: String, rem: Int): DataFrame =
    Tables
      .cachedRead(spark, s"$dir/documents.parquet") // corpus dir is immutable; skip re-inference
      .where(pmod(col("doc_id"), lit(8)) === rem)
      .select(col("doc_id").as("media_id"))

  /** A hash ledger with its takedown set masked: an anti join with NO
    * forced broadcast — production takedown sets are tiny and AQE will
    * broadcast them from runtime stats, but the REGISTERED rule
    * tombstones a fixed 1/8 of the corpus (so the rung stays
    * oracleable), and a forced hint on a corpus-fraction set is exactly
    * the broadcast-ceiling abort this round removed from the capped pair
    * core (the n19 review's rule). Ledger rows are per-media
    * independent, so the mask equals a from-scratch ledger over the
    * surviving corpus exactly (unlike postings stats or LSS maxima there
    * is nothing to correct), and masking BEFORE pairing removes every
    * pair touching a tombstoned medium on either side.
    */
  private[graft] def maskedHashLedger(ledger: DataFrame, tombstones: DataFrame): DataFrame =
    ledger.join(tombstones.select("media_id"), Seq("media_id"), "left_anti")

  /** The PURGE stage: physically rewrite a hash-ledger layout without the
    * tombstoned media — after it runs, queries need no mask and the
    * ledger's takedown set retires (t17's compactSegmentsPurged on the
    * perceptual key). At 100 TB this rides the once-per-corpus-version
    * ledger rebuild, so erasure costs no extra decode pass.
    */
  private[graft] def purgeHashLedger(ledger: DataFrame, tombstones: DataFrame, out: String): Unit =
    maskedHashLedger(ledger, tombstones).write.mode("overwrite").parquet(out)

  /** N17T — n17's pair rung WITH TAKEDOWN: the registered proof of the
    * masked read (the s21p pattern on the perceptual key). Tombstoned
    * images appear on neither side of any pair; the result equals a
    * from-scratch pair pass over the surviving corpus (spec-pinned), and
    * the DuckDB oracle rebuilds hashes for the surviving rasters only.
    */
  def imageDhashPairsTombstoned(spark: SparkSession, dir: String): DataFrame =
    dhashPairsFromHashes(
      maskedHashLedger(
        graft.operators.Multimodal.imageDhashLedger(spark, dir),
        mediaTombstones(spark, dir, 0)
      ),
      // masking only removes hashes, so the FULL ledger's persisted bound
      // remains a sound upper bound for the surviving subset
      Some(graft.operators.Multimodal.imageDhashBandBound(spark, dir))
    )

  /** N22T — n20's AUDIO pair rung WITH TAKEDOWN (`media_id ≡ 1 (mod 8)` —
    * inside the WAV quarter, so the ledger loses real mass): the n17t
    * pattern on the audio key, proving [[maskedHashLedger]]'s
    * modality-generic claim with a REGISTERED, DuckDB-oracled rung rather
    * than a doc comment. Same exactness argument: ledger rows are
    * per-media independent, so the mask equals a from-scratch pair pass
    * over the surviving recordings (spec-pinned), and the oracle rebuilds
    * envelopes for survivors only.
    */
  def audioHashPairsTombstoned(spark: SparkSession, dir: String): DataFrame =
    dhashPairsFromHashes(
      maskedHashLedger(
        graft.operators.Multimodal.audioHashLedger(spark, dir),
        mediaTombstones(spark, dir, 1)
      ),
      Some(graft.operators.Multimodal.audioHashBandBound(spark, dir))
    )

  /** N24T — n24's VIDEO pair rung WITH TAKEDOWN (`media_id ≡ 3 (mod 8)`,
    * inside the MP4 quarter): completes the per-modality takedown
    * symmetry (images n17t, audio n22t, video here) — every perceptual
    * hash ledger now has a registered masked read plus the purge path.
    */
  def videoHashPairsTombstoned(spark: SparkSession, dir: String): DataFrame =
    dhashPairsFromHashes(
      maskedHashLedger(
        graft.operators.Multimodal.videoHashLedger(spark, dir),
        mediaTombstones(spark, dir, 3)
      ),
      Some(graft.operators.Multimodal.videoHashBandBound(spark, dir))
    )

  /** N19T — the LSS layout WITH TAKEDOWN (t17's doc rule, `doc_id ≡ 3
    * (mod 10)`). Unlike the per-media hash ledgers, LSS rows are NOT
    * independent: a surviving document's stored maximum may have been
    * witnessed only by a now-tombstoned partner, so a plain mask would
    * keep a stale answer. Since v3 the layout stores the per-doc TOP-K
    * span ledger ([[lssTakedownFromLedger]] — the
    * store-a-little-more-at-ingest trade t17 makes with its delete-time
    * `dl`), so a takedown resolves from ledger-cardinality joins alone:
    * each affected doc walks its stored (len desc, fp asc) entries to
    * the first one with a surviving carrier — provably the from-scratch
    * answer over survivors. Only the undecidable overflow (a doc whose
    * all-stored carriers died on a TRUNCATED carrier list, or whose
    * spans out-number the ledger depth `graft.lss.partner_k`) recomputes
    * — and even that is the TARGETED pass
    * ([[longestSharedSubstringTargeted]]: wide work over the overflow
    * docs' span carriers only), not the full survivors aggregation the
    * v2 path paid (13.5 s at sf0.1, hours at 100 TB) —
    * LssTakedownSpec pins the ledger-only path, the overflow, and
    * targeted ≡ full-filtered.
    */
  def longestSharedSubstringTombstoned(spark: SparkSession, dir: String): DataFrame =
    Tables.cachedRead(spark, s"${lssTombstonedLayoutCache(spark, dir)}/lsstd.parquet")
      .orderBy("doc_id")

  /** The masked LSS persisted per (corpus, takedown-rule) version — the
    * recompute for partner-died documents is real work (one survivors
    * pass when any exist), and a takedown set changes rarely, so the
    * query rung reads a content-keyed layout and the recompute runs ONCE
    * per version, not per query (measured: 11.8 s/rep live at sf0.1 vs a
    * parquet read from here; the build lands itemized in the bench's
    * layout phase like every other ingest artifact).
    */
  private def lssTombstonedLayoutCache(spark: SparkSession, dir: String): String = {
    val cap = graft.GraftConf.int(spark, "lss.max_tokens", 16)
    val key = graft.sources.LayoutCache.contentKey(
      spark,
      s"$dir/documents.parquet",
      s"lsstd-v$LssSchemeVersion#c$cap#mod10eq3"
    )
    graft.sources.LayoutCache.getOrBuild(spark, "graft_lsstd", key) { out =>
      lssTombstonedCompute(spark, dir, cap)
        .write.mode("overwrite").parquet(s"$out/lsstd.parquet")
    }
  }

  /** Resolve a takedown against the top-K span ledger: returns (decided,
    * recompute-doc-set). `decided` is EXACT — for each surviving doc the
    * walk takes the first entry (in the stored (len desc, fp asc) order)
    * with a surviving stored carrier, provided no earlier entry is
    * undecidable. Entry classification:
    *   - usable: ≥ 1 stored carrier survives — by the top-K ordering
    *     argument this entry IS the from-scratch answer over survivors
    *     when it is the first usable one;
    *   - dead: the carrier list is COMPLETE (n_others ≤ K stored) and
    *     every carrier is tombstoned — the span provably has no surviving
    *     sharer, walk on;
    *   - undecidable: all STORED carriers died but the list was truncated
    *     (n_others > stored) — an unstored carrier may survive, so the
    *     doc joins the recompute set (overflow path).
    * A doc that exhausts its stored entries goes to recompute only if it
    * has more spans than the ledger stored (`n_spans > stored entries`);
    * otherwise it provably shares nothing with any survivor and is ABSENT
    * (d16's convention — exactly what a from-scratch pass would emit).
    * Cost shape: ledger-cardinality joins only (doc × K rows, K carriers
    * each); the corpus is never touched unless recompute is non-empty.
    */
  private[graft] def lssTakedownFromLedger(
      topk: DataFrame,
      tombstones: DataFrame
  ): (DataFrame, DataFrame) = {
    val t = tombstones.select("doc_id")
    val e = topk.join(t, Seq("doc_id"), "left_anti")
    val survPerEntry = e
      .select(col("doc_id"), col("rank"), explode(col("others")).as("other_id"))
      .join(t.select(col("doc_id").as("other_id")), Seq("other_id"), "left_anti")
      .groupBy("doc_id", "rank")
      .agg(count(lit(1)).as("n_surv"))
    val classified = e
      .join(survPerEntry, Seq("doc_id", "rank"), "left")
      .withColumn(
        "status",
        when(coalesce(col("n_surv"), lit(0L)) >= 1L, lit("usable"))
          .when(size(col("others")).cast("long") < col("n_others"), lit("undecidable"))
          .otherwise(lit("dead"))
      )
    val perDoc = classified
      .groupBy("doc_id")
      .agg(
        min(when(col("status") === "usable", col("rank"))).as("fu"),
        min(when(col("status") === "undecidable", col("rank"))).as("fd"),
        max("n_spans").as("n_spans"),
        count(lit(1)).as("n_stored")
      )
    val decided = perDoc
      .where(col("fu").isNotNull && (col("fd").isNull || col("fd") > col("fu")))
      .select(col("doc_id"), col("fu").as("rank"))
      .join(classified.select("doc_id", "rank", "len", "fp"), Seq("doc_id", "rank"))
      .select(col("doc_id"), col("len").as("lss_len"), col("fp").as("lss_fp"))
    val recompute = perDoc
      .where(
        (col("fd").isNotNull && (col("fu").isNull || col("fd") < col("fu"))) ||
          (col("fu").isNull && col("fd").isNull && col("n_spans") > col("n_stored"))
      )
      .select("doc_id")
    (decided, recompute)
  }

  private def lssTombstonedCompute(spark: SparkSession, dir: String, cap: Int): DataFrame = {
    // no forced broadcasts anywhere below: the registered rule tombstones
    // a fixed 1/10 of the corpus, so AQE must be free to degrade these
    // joins to shuffles (the maskedHashLedger argument)
    val docs   = Tables.documents(spark, dir)
    val ledger = docs.where(pmod(col("doc_id"), lit(10)) === 3).select("doc_id")
    val (decided, recompute) = lssTakedownFromLedger(lssTopkLedger(spark, dir), ledger)
    // the ONE driver-side action on the common path is this emptiness
    // probe over ledger-cardinality data — the survivors pass (a full
    // n19-core corpus recount) runs ONLY for the undecidable overflow
    if (recompute.isEmpty) decided.orderBy("doc_id")
    else {
      // targeted, not the full survivors pass: the wide aggregation runs
      // over the overflow docs' span carriers only (see
      // longestSharedSubstringTargeted — at 100 TB the difference is a
      // scan-plus-small-agg vs re-paying the whole ingest aggregation)
      val survivors  = docs.join(ledger, Seq("doc_id"), "left_anti")
      val recomputed = longestSharedSubstringTargeted(survivors, recompute, cap)
      decided.unionByName(recomputed).orderBy("doc_id")
    }
  }

  /** Per-level band stats recorded by [[dhashBandWalk]] when profiling:
    * (level, n_buckets, n_hot_buckets, max_occupancy, rows_entering_level).
    */
  /** Disk-persisted level frames of the most recent overflow-path band
    * walk in this JVM — released at the start of the next walk. The ledger
    * is deliberately JVM-global, not per-walk: the overflow path only
    * triggers on a corpus whose level-0 occupancy exceeds the cap, and the
    * registered rungs execute sequentially, so at most one overflow walk
    * is ever live. If two overflow walks DO race (two sessions in one
    * test JVM), the later one unpersists the earlier one's frames — which
    * degrades the earlier walk to lineage recompute (the frames exist to
    * stop plan re-explosion, not for correctness), never to a wrong
    * answer; the cost of that corner is re-execution, and keying the
    * ledger per walk would instead LEAK the loser's disk blocks until JVM
    * exit, a worse failure mode for a long-lived session.
    */
  private val walkPersists = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** The capped query's verified-pairs persist lives in its OWN ledger,
    * not [[walkPersists]] (ADVICE r18): walkPersists is cleared at the
    * start of EVERY subsequent band walk, so a verified-pairs frame parked
    * there would lose its disk blocks as soon as any other dhash query ran
    * in the same JVM — and a caller consuming the returned capped frame
    * after that would recompute the multi-billion-row candidate expansion
    * TWICE (once per crossSmall/crossBig branch), the exact
    * double-expansion the persist exists to prevent. The ledger is a
    * bounded FIFO of [[CappedPersistLedgerMax]] frames (ADVICE r19):
    * starting a new capped query no longer evicts the PREVIOUS query's
    * frame — a caller still consuming the previously returned DataFrame
    * keeps its blocks — only the oldest frame beyond the cap is released.
    * Blocks are DISK_ONLY and output-correlated (tens of rows), so the
    * bounded ledger costs bounded disk, not memory.
    */
  private val CappedPersistLedgerMax = 2
  private val cappedPersists         = scala.collection.mutable.ListBuffer.empty[DataFrame]

  private[graft] final case class DhashBandLevelStats(
      level: Int,
      nBuckets: Long,
      nHot: Long,
      maxOcc: Long,
      rowsIn: Long
  )

  /** Level 1 of the dHash pair core: an ITERATIVE multi-level banded walk
    * over DISTINCT hashes with bucket-occupancy caps — the hot-shingle
    * df-cap discipline (n1's `jaccard.max_shingle_df`) applied to the
    * band buckets the round-14 review flagged as the family's remaining
    * quadratic. Level 0 is the classic 8×8-bit pigeonhole (any pair
    * within Hamming [[DhashHammingMax]]=7 shares one of 8 bands). A
    * bucket whose occupancy exceeds `graft.dhash.band_cap` (default
    * 512) is NOT self-joined; its hashes descend instead to the next
    * level, where the full 64 bits are re-banded at boundaries rotated by
    * 3·level bits and the sub-bucket key extends the parent chain —
    * Norouzi-style multi-index refinement. Pigeonhole re-applies at every
    * level (8 bands always partition all 64 bits, so a ≤7-distance pair
    * shares a band), and a co-located pair stays co-located down a hot
    * chain because equal bands hash to equal child buckets — candidate
    * generation stays exact-complete while per-bucket join fan-out is
    * capped at `band_cap²/2`. Measured on 10⁶ uniform-random hashes
    * (`ScaleRehearsal bandwalk`): level 0's 4.1k-occupancy buckets — a
    * 1.56×10¹⁰-candidate quadratic in the old single-level plan — refine
    * into ≤579-occupancy sub-buckets at level 1 and ≤179 at level 2,
    * 2.6×10⁹ candidates executed end-to-end with zero residual; the cap
    * default (512) is the measured knee — 128 cuts candidates another
    * 1.7× but the two extra walk levels cost more wall clock than the
    * verify they save at every tested size.
    *
    * Termination: after `graft.dhash.band_depth` levels (default 6) the
    * residual hot buckets are returned SEPARATELY so each caller can
    * apply its own contract — the exact rungs (n17/n20) join them anyway
    * (their output on such a corpus is honestly quadratic), the capped
    * rung (n21/n22) degrades them to explicit 'band' ledger rows. At
    * every tested corpus and at the 10⁶-hash rehearsal the residual is
    * empty; it exists for the adversarial shared-prefix corpus that
    * out-packs 4 levels of 8-way refinement.
    *
    * Returns (candidate hash pairs from capped buckets at all levels,
    * residual hot-bucket rows `(bucket, hash_hi, hash_lo)` at max depth).
    * Control flow: ONE small occupancy-probe job (hash-cardinality, two
    * shuffles) decides the shape. If level 0 never overflows — every
    * tested corpus — the function returns the classic single-level lazy
    * pigeonhole join untouched, so the common case pays one ~0.2 s probe
    * and nothing else. Only an overflowing corpus enters the eager
    * per-level walk (evictable MEMORY_AND_DISK persist per level — NOT
    * localCheckpoint, whose pinned blocks starve the occupancy
    * aggregation's execution memory at the 10⁶-hash rehearsal; lineage
    * stays intact so eviction degrades to recompute, never abort). Both
    * shapes were measured against a lazily-unrolled fixed-depth variant,
    * which loses badly: each unrolled level embeds the previous plan
    * twice, so Catalyst pays an exponentially-growing tree (~11 s/query
    * at sf0.01 vs 0.8 s for this shape). Every wide op is
    * hash-cardinality, never image-cardinality, and no side is ever
    * force-broadcast — AQE picks the join strategy from runtime stats
    * (the n19 review's rule, `Dedup.scala` LSS build).
    */
  /** The 8 band-bucket keys of a hash at `level`: 8-bit windows of the
    * 64-bit value at boundaries rotated by 3·level bits, chained onto the
    * parent bucket via xxhash64 (collisions only merge buckets — spurious
    * candidates are Hamming-verified away, never lost). Shared by the
    * walk and the build-time occupancy stat so the persisted stat can
    * never grade a different banding than the query path executes.
    */
  private def dhashBandKeys(level: Int): Column = {
    val v = shiftleft(col("hash_hi"), 32).bitwiseOR(col("hash_lo"))
    array((0 until 8).map { k =>
      val off = (k * 8 + level * 3) % 64
      val bv =
        if (off == 0) v.bitwiseAND(lit(255L))
        else shiftrightunsigned(v, off).bitwiseOR(shiftleft(v, 64 - off)).bitwiseAND(lit(255L))
      xxhash64(lit(level), col("bucket"), lit(k), bv)
    }: _*)
  }

  /** Max level-0 band-bucket occupancy over a ledger's DISTINCT hashes —
    * the ONE number [[dhashBandWalk]]'s shape decision needs. Computed
    * ONCE at ledger-build time and persisted beside the layout (r15
    * review item: the per-query probe job was ~0.2 s × every dhash rung ×
    * every call — pure waste on an immutable content-keyed layout). The
    * stat is knob-independent (the cap comparison happens at query time)
    * and subset-safe: masking a takedown set out of the ledger only
    * LOWERS occupancies, so the stored value stays a sound upper bound
    * for every masked read.
    */
  private[graft] def dhashLevel0MaxOccupancy(h: DataFrame): Long =
    h.select("hash_hi", "hash_lo")
      .distinct()
      .withColumn("bucket", lit(0L))
      .select(explode(dhashBandKeys(0)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("occ"))
      .agg(coalesce(max(col("occ")), lit(0L)))
      .head()
      .getLong(0)

  /** The band-walk occupancy cap — ONE read shared by [[dhashBandWalk]]'s
    * fast-path branch and [[dhashPairsCappedFromHashes]]'s persist gate,
    * whose overflow decisions must agree exactly (a desync either runs an
    * eager job on the zero-job warm-ledger path or silently loses the
    * single-expansion materialization on the overflow path).
    */
  private def dhashBandCap(spark: SparkSession): Long =
    math.max(2L, graft.GraftConf.int(spark, "dhash.band_cap", 512).toLong)

  private[graft] def dhashBandWalk(
      h: DataFrame,
      stats: Option[scala.collection.mutable.ListBuffer[DhashBandLevelStats]] = None,
      probeBound: Option[Long] = None
  ): (DataFrame, DataFrame) = {
    val spark    = h.sparkSession
    val cap      = dhashBandCap(spark)
    val maxDepth = math.min(9, math.max(1, graft.GraftConf.int(spark, "dhash.band_depth", 6)))
    // Overflow-path task sizing (round 18 — the last open pressure corner):
    // at 10⁶ near-unique hashes the capped candidate join expands ~2.6B
    // rows; at the session's 32 shuffle partitions that is ~80M candidate
    // rows per task, whose sort state OOMs a 4 GiB heap (measured — the
    // walk itself finished, the join died). Repartitioning the capped
    // frame by bucket into `graft.dhash.walk_partitions` (512) before the
    // self-join shrinks per-task state — buckets are ≤cap rows each
    // and hash-spread, so the split is even by construction. 512 (16×
    // the session width) measured: 256 left the verify pass flaky at the
    // 4 GiB boundary (one run passed at 68.6 s, the next OOMed — task
    // sort state right at the edge); 512 clears it with headroom.
    // Overflow path only: every real corpus takes the level-0 fast path,
    // where 32 partitions avoid tiny-task overhead on a ~0.5 s rung.
    val walkParts = math.max(32, graft.GraftConf.int(spark, "dhash.walk_partitions", 512))

    def bandKeys(level: Int): Column = dhashBandKeys(level)

    def selfJoin(p: DataFrame): DataFrame =
      p.as("a")
        .join(
          p.as("b"),
          col("a.bucket") === col("b.bucket") &&
            (struct(col("a.hash_hi"), col("a.hash_lo")) < struct(col("b.hash_hi"), col("b.hash_lo")))
        )
        .select(
          col("a.hash_hi").as("ha_hi"),
          col("a.hash_lo").as("ha_lo"),
          col("b.hash_hi").as("hb_hi"),
          col("b.hash_lo").as("hb_lo")
        )

    val hu = h.select("hash_hi", "hash_lo").distinct().withColumn("bucket", lit(0L))
    val b0 = hu.select(col("hash_hi"), col("hash_lo"), explode(bandKeys(0)).as("bucket"))
    // the shape decision: a caller holding a persisted build-time bound
    // (the ledger layouts) pays ZERO jobs here; only ad-hoc ledgers (the
    // streamed catalog, test fixtures) still run the live probe
    val probeMax = probeBound.getOrElse(dhashLevel0MaxOccupancy(h))
    if (probeMax <= cap && stats.isEmpty)
      return (selfJoin(b0), b0.where(lit(false)))

    // release the PREVIOUS overflow walk's level frames before persisting
    // new ones: a returned frame's lineage survives unpersist (recompute),
    // so at most one walk's disk blocks are ever resident per JVM — a
    // long-lived session issuing repeated overflow-path queries no longer
    // accumulates dead block files
    walkPersists.synchronized {
      walkPersists.foreach(df => df.unpersist(blocking = false))
      walkPersists.clear()
    }

    var pending  = hu
    var level    = 0
    var residual: DataFrame = null
    val parts    = scala.collection.mutable.ListBuffer.empty[DataFrame]
    while (residual == null) {
      // DISK_ONLY: the per-level frames exist to stop lineage re-explosion
      // across the 3 consumers (occupancy, capped side, hot side), not to
      // be hot in memory — and at the 4 GiB pressure heap ANY in-heap
      // storage (deserialized or serialized) starved the 2.6B-candidate
      // join into a raw OOM. Disk blocks cost one sequential write/read
      // per level and leave the whole heap to the join.
      val b = pending
        .select(col("hash_hi"), col("hash_lo"), explode(bandKeys(level)).as("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      walkPersists.synchronized { walkPersists += b }
      val occ   = b.groupBy("bucket").agg(count(lit(1)).as("occ"))
      val small = b.join(occ.where(col("occ") <= cap).select("bucket"), "bucket")
      parts += selfJoin(small.repartition(walkParts, col("bucket")))
      val hot = b.join(occ.where(col("occ") > cap).select("bucket"), "bucket")
      stats.foreach { s =>
        val r = occ.agg(
          count(lit(1)).as("nb"),
          coalesce(sum(when(col("occ") > cap, 1L).otherwise(0L)), lit(0L)).as("nh"),
          coalesce(max(col("occ")), lit(0L)).as("mx")
        ).collect()(0)
        if (r.getLong(0) > 0L) // record only levels that saw rows
          s += DhashBandLevelStats(level, r.getLong(0), r.getLong(1), r.getLong(2), b.count())
      }
      if (level == maxDepth - 1) residual = hot
      else {
        pending = hot.select("hash_hi", "hash_lo", "bucket")
        if (hot.isEmpty) residual = pending
      }
      level += 1
    }
    (parts.reduce(_.unionByName(_)), residual)
  }

  /** Exact-complete verified HASH pairs `(ha_hi, ha_lo, hb_hi, hb_lo,
    * dist)`, dist in 1..[[DhashHammingMax]] — [[dhashBandWalk]]'s capped
    * candidates plus the residual hot buckets joined as-is (exactness is
    * this rung's contract; a corpus that defeats 4 levels of refinement
    * has a quadratic TRUE answer, so the residual join is output-
    * correlated, not a plan accident). Every wide op is hash-cardinality.
    */
  /** Verify-then-distinct over a candidate hash-pair stream: bit_count is
    * codegen'd and map-side, so the dedup shuffle carries only VERIFIED
    * pairs (output cardinality), not the full candidate stream — at the
    * 10⁶-hash rehearsal that is ~10 rows instead of ~5×10⁸. ONE
    * definition so the exact and capped rungs can never diverge on the
    * Hamming bound or the verify/distinct ordering.
    */
  private def verifyHashPairs(cands: DataFrame): DataFrame =
    cands
      .withColumn("dist", (expr("bit_count(ha_hi ^ hb_hi)") + expr("bit_count(ha_lo ^ hb_lo)")).cast("long"))
      .where(col("dist") <= DhashHammingMax && col("dist") >= 1L)
      .distinct() // hash-cardinality, not image-cardinality

  private def verifiedDhashHashPairs(h: DataFrame, probeBound: Option[Long]): DataFrame = {
    val (cands, residual) = dhashBandWalk(h, probeBound = probeBound)
    val residualPairs = residual
      .as("a")
      .join(
        residual.as("b"),
        col("a.bucket") === col("b.bucket") &&
          (struct(col("a.hash_hi"), col("a.hash_lo")) < struct(col("b.hash_hi"), col("b.hash_lo")))
      )
      .select(
        col("a.hash_hi").as("ha_hi"),
        col("a.hash_lo").as("ha_lo"),
        col("b.hash_hi").as("hb_hi"),
        col("b.hash_lo").as("hb_lo")
      )
    verifyHashPairs(cands.unionByName(residualPairs))
  }

  /** N21 — n17's pair rung with its documented adversarial cap ENFORCED:
    * on a corpus where near-everything collides, the full pair LIST is
    * quadratic in group occupancy (n17's honest answer — 1.46B rows at the
    * round-13 100× rehearsal), and n17's doc has always said "production
    * caps it by emitting groups for the identical-hash mass". This rung is
    * that advice as behavior. Per expansion unit — an identical-hash group
    * (n·(n−1)/2 latent pairs) or a verified cross-hash pair (n_a·n_b) —
    * if the latent pair count exceeds the `graft.dhash.pair_cap` session
    * knob (default 16), the unit degrades to ONE ledger row instead of
    * expanding:
    *
    *   - `('pair',  media_a, media_b, dist, 1)`       — expanded pair
    *   - `('group', keeper,  keeper,  0,    n(n−1)/2)` — capped same-hash mass
    *   - `('xgroup', keeper_a, keeper_b, dist, n_a·n_b)` — capped cross-hash mass
    *
    * `n_pairs` sums to the SAME total as the uncapped pair count (spec
    * invariant), so nothing is silently dropped — the quadratic mass is
    * reported in group arithmetic, the tractable tail in full. Keepers are
    * min-id representatives (n18's contract). No NULL columns — keeper
    * doubles for both sides of a 'group' row — so cross-engine ordering
    * never meets engine-specific NULL placement. Worst-case output is
    * images + hash-pairs rows (linear + collision-bounded) at ANY
    * duplication level: this is the rung a 100 TB image-dedup pipeline
    * actually materializes. Fully DuckDB-oracled like the rest of the
    * family: the cap rule is integer arithmetic over the rebuilt hash
    * ledger.
    */
  def imageDhashPairsCapped(spark: SparkSession, dir: String): DataFrame =
    dhashPairsCappedFromHashes(
      graft.operators.Multimodal.imageDhashLedger(spark, dir),
      graft.GraftConf.int(spark, "dhash.pair_cap", 16).toLong,
      Some(graft.operators.Multimodal.imageDhashBandBound(spark, dir))
    )

  /** The capped two-level expansion behind [[imageDhashPairsCapped]] —
    * same level-1 hash-pair core as n17, but every expansion join is
    * pre-gated on the latent pair count, so the image-cardinality side of
    * the plan is bounded by `cap × units + units` rows by construction
    * (the degenerate all-collide corpus that wedges the uncapped
    * expansion emits exactly one row per mass here — DedupSpec builds
    * that corpus and asserts it).
    *
    * Bounded one level further down than n17 (round-15): level 1's
    * residual hot band buckets — the [[dhashBandWalk]] chains that
    * out-pack `graft.dhash.band_depth` levels of refinement — are NOT
    * joined here; each degrades to one explicit `'band'` ledger row
    * `('band', keeper, keeper, 0, n_hashes·(n_hashes−1)/2)` disclosing
    * the UNADJUDICATED candidate hash-pair mass of that bucket (an upper
    * bound, not a verified count — hashes in the bucket may still have
    * their true pairs verified via other, capped buckets). So this rung
    * is never quadratic at ANY corpus shape: worst case is
    * `cap × units + units + residual buckets` rows. At default knobs no
    * tested corpus and no rehearsal produces a band row, and the n_pairs
    * conservation invariant (Σ n_pairs over pair/group/xgroup rows =
    * uncapped pair count) is stated for band-row-free outputs; when band
    * rows appear they are additional disclosure, not counted mass.
    *
    * No forced broadcasts anywhere in the expansion (round-15, the n19
    * review's rule): `sameSmallHashes` grows toward duplicated-hash
    * cardinality on exactly the corpora this rung targets, so AQE picks
    * the join strategy from runtime stats instead of a driver-side
    * broadcast that aborts at the ceiling.
    */
  private[graft] def dhashPairsCappedFromHashes(
      h: DataFrame,
      cap: Long,
      probeBound: Option[Long] = None
  ): DataFrame = {
    require(cap >= 0, s"graft.dhash.pair_cap=$cap must be >= 0")
    // per-hash occupancy + representative: hash-cardinality, the only
    // state the cap rule needs
    val counts = h
      .groupBy("hash_hi", "hash_lo")
      .agg(count(lit(1)).as("n"), min("media_id").as("keeper"))
    val sameUnits = counts
      .where(col("n") >= 2)
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division, and the
      // ledger column must stay BIGINT to hash against the oracle
      .withColumn("n_pairs", expr("n * (n - 1) div 2"))
    val sameSmallHashes = sameUnits.where(col("n_pairs") <= cap).select("hash_hi", "hash_lo")
    val sameSmall = h
      .join(sameSmallHashes, Seq("hash_hi", "hash_lo"))
      .as("x")
      .join(
        h.join(sameSmallHashes, Seq("hash_hi", "hash_lo")).as("y"),
        col("x.hash_hi") === col("y.hash_hi") && col("x.hash_lo") === col("y.hash_lo") &&
          col("x.media_id") < col("y.media_id")
      )
      .select(
        lit("pair").as("kind"),
        col("x.media_id").as("media_a"),
        col("y.media_id").as("media_b"),
        lit(0L).as("dist"),
        lit(1L).as("n_pairs")
      )
    val sameBig = sameUnits
      .where(col("n_pairs") > cap)
      .select(
        lit("group").as("kind"),
        col("keeper").as("media_a"),
        col("keeper").as("media_b"),
        lit(0L).as("dist"),
        col("n_pairs")
      )
    // Overflow-path single-expansion rule (round 18, found at the 4 GiB
    // 10⁶-hash pressure row): the verified-pair subtree feeds BOTH the
    // crossSmall and crossBig branches below, so a lazy plan expands the
    // multi-billion-row candidate stream TWICE — the second expansion ran
    // concurrently with the first's retained join state and OOMed where
    // the exact rung (one consumer) passed. When the walk takes the
    // overflow path, materialize the verified pairs once (DISK_ONLY via
    // the walk's own persist ledger — they are output-correlated, tens of
    // rows, not candidate-correlated); the fast path stays fully lazy and
    // zero-job (BandStatSpec's warm-ledger pin).
    val walkCap  = dhashBandCap(h.sparkSession)
    val probeMax = probeBound.getOrElse(dhashLevel0MaxOccupancy(h))
    val (walkCands, walkResidual) = dhashBandWalk(h, probeBound = Some(probeMax))
    val verifiedPairs = {
      val vp = verifyHashPairs(walkCands)
      if (probeMax <= walkCap) vp
      else {
        // bounded-FIFO eviction (not clear-on-next-query — see
        // cappedPersists scaladoc): release only frames beyond the cap
        val p = vp.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        cappedPersists.synchronized {
          cappedPersists += p
          while (cappedPersists.length > CappedPersistLedgerMax)
            cappedPersists.remove(0).unpersist(blocking = false)
        }
        p.count() // force the one expansion; both branches below read blocks
        p
      }
    }
    val crossUnits = verifiedPairs
      .join(
        counts.select(col("hash_hi").as("ha_hi"), col("hash_lo").as("ha_lo"), col("n").as("na"), col("keeper").as("ka")),
        Seq("ha_hi", "ha_lo")
      )
      .join(
        counts.select(col("hash_hi").as("hb_hi"), col("hash_lo").as("hb_lo"), col("n").as("nb"), col("keeper").as("kb")),
        Seq("hb_hi", "hb_lo")
      )
      .withColumn("n_pairs", col("na") * col("nb"))
    val crossSmall = crossUnits
      .where(col("n_pairs") <= cap)
      .join(h.select(col("media_id").as("ia"), col("hash_hi").as("ha_hi"), col("hash_lo").as("ha_lo")), Seq("ha_hi", "ha_lo"))
      .join(h.select(col("media_id").as("ib"), col("hash_hi").as("hb_hi"), col("hash_lo").as("hb_lo")), Seq("hb_hi", "hb_lo"))
      .select(
        lit("pair").as("kind"),
        least(col("ia"), col("ib")).as("media_a"),
        greatest(col("ia"), col("ib")).as("media_b"),
        col("dist"),
        lit(1L).as("n_pairs")
      )
    val crossBig = crossUnits
      .where(col("n_pairs") > cap)
      .select(
        lit("xgroup").as("kind"),
        least(col("ka"), col("kb")).as("media_a"),
        greatest(col("ka"), col("kb")).as("media_b"),
        col("dist"),
        col("n_pairs")
      )
    // residual hot band buckets (past band_depth levels of refinement)
    // degrade to one explicit disclosure row each instead of a join —
    // never produced at default knobs on any tested corpus
    val bandRows = walkResidual
      .join(h, Seq("hash_hi", "hash_lo"))
      .groupBy("bucket")
      .agg(
        min("media_id").as("keeper"),
        countDistinct(col("hash_hi"), col("hash_lo")).as("n_hashes")
      )
      .select(
        lit("band").as("kind"),
        col("keeper").as("media_a"),
        col("keeper").as("media_b"),
        lit(0L).as("dist"),
        expr("n_hashes * (n_hashes - 1) div 2").as("n_pairs")
      )
    sameSmall
      .unionByName(sameBig)
      .unionByName(crossSmall)
      .unionByName(crossBig)
      .unionByName(bandRows)
      .orderBy("kind", "media_a", "media_b", "dist")
  }

  /** All-pairs brute force — O(n²), spec-level equivalence oracle ONLY (the
    * registered n4 is the LSH-bucketed plan above).
    */
  private[graft] def embeddingDupPairsBrute(e: DataFrame, threshold: Double = 0.95): DataFrame =
    e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        expr("cosine_sim(a.embedding, b.embedding)").as("cos")
      )
      .where(col("cos") >= threshold)
      .select("vec_a", "vec_b")
      .orderBy("vec_a", "vec_b")

  /** N15 — per-document novelty profile `(doc_id, n_shingles,
    * n_seen_before)`: of a document's distinct shingles, how many already
    * appeared in an EARLIER document (smaller doc_id — the corpus's
    * arrival order). `n_seen_before / n_shingles` is the redundancy
    * fraction a curation pipeline thresholds to drop documents that add
    * nothing new — the streaming-order generalization of pairwise dedup
    * (a doc can be 90% stale without any single near-duplicate partner,
    * e.g. a mashup of many earlier docs, which no pairwise rung catches).
    *
    * Scale shape: first-seen is `min(doc_id)` OVER the shingle partition —
    * ONE shuffle on the shingle key (the same inverted-index exchange every
    * n-family op pays), with the per-doc rollup reusing nothing heavier
    * than a doc_id aggregation. Counting is `count(when(...))` — integers
    * end to end, and the oracle counts the same CASE. No pair join
    * anywhere: cost is linear in the shingle stream regardless of how
    * duplicated the corpus is — this is the operator to reach for when
    * n1/n2's pair tables are the expensive part.
    */
  def noveltyScores(spark: SparkSession, dir: String): DataFrame = {
    // fanOut: shingling is the CPU behind a one-row-group scan; the
    // window re-keys on the shingle and the aggregate on doc_id, so
    // placement cannot move a count.
    val sh = shingles(
      Tables.fanOut(
        Tables.documents(spark, dir),
        Seq(s"$dir/documents.parquet"),
        Seq(col("doc_id"))
      )
    )
    val byShingle = Window.partitionBy("s")
    sh.withColumn("first_doc", min("doc_id").over(byShingle))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        count(when(col("first_doc") < col("doc_id"), lit(1))).as("n_seen_before")
      )
      .orderBy("doc_id")
  }

  /** D28 drop rule — drop a document when at least `Num/Den` (4/5 = 80%) of
    * its shingles already appeared in earlier documents. Published as
    * integers so the oracle replays the identical cross-multiplication
    * (the [[graft.operators.Curation.ContaminationShareNum]] discipline).
    */
  val NoveltyGateNum = 4L
  val NoveltyGateDen = 5L

  /** D28 — the novelty KEEP/DROP gate: [[noveltyScores]] turned into the
    * shipping curation verdict, one row per document. Drop iff
    * `n_seen_before · Den ≥ n_shingles · Num` — exact integer
    * cross-multiplication, no stale-fraction float. Documents too short to
    * shingle (absent from n15) carry zero evidence of redundancy and KEEP
    * — a gate must never drop what it could not measure (the d25
    * convention). Cost is n15 plus one broadcast join back onto the
    * (doc_id-only) corpus key set; the verdict column is computed
    * map-side.
    */
  def noveltyGate(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select("doc_id")
      .join(noveltyScores(spark, dir), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_seen_before"), lit(0L)).as("n_seen_before")
      )
      .withColumn(
        "verdict",
        when(col("n_seen_before") * NoveltyGateDen >= col("n_shingles") * NoveltyGateNum && col("n_shingles") > 0, "drop")
          .otherwise("keep")
      )
      .orderBy("doc_id")
}
