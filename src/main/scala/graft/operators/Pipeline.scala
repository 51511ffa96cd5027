package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a 100 TB corpus
  * actually runs — quality filter → language filter → near-dup removal —
  * expressed as one declarative plan so Catalyst fuses the narrow filters
  * into the scan and the only wide ops are the dedup machinery's own.
  *
  * Keep-rule for near-dup pairs: drop every `doc_b` (the higher id) of a
  * qualifying pair. For any pair (a,b) with a<b, b is dropped, so no
  * surviving pair exists — a provable guarantee that needs no union-find.
  * Dedup rung: `minhashLshPairs` — the production (LSH-bounded-cost) rung.
  * Its candidates are exact-verified, and on corpora with the planted
  * similarity gap (near-dups ≥0.8, background ≤0.14) its output is
  * *identical* to the exact inverted-index rung (that equivalence is n2's
  * own oracle argument), so c1 keeps its exact-Jaccard SQL oracle while
  * running the plan that survives hot-shingle skew at 100 TB.
  */
object Pipeline {

  /** C1 — surviving doc_ids after cleaning: ≥ minTokens tokens, predicted
    * language in `langs`, not a near-duplicate of a lower-id doc.
    *
    * The quality and language predicates are ONE fused narrow filter on the
    * corpus scan ([[TextAnalysis.langPredCol]] inlined) — no per-signal
    * rescans or doc_id joins; near-dup pairs come from the MinHash rung and
    * are removed with a single anti-join. Wide work = the dedup machinery's
    * own, nothing else.
    */
  def cleanCorpus(
      spark: SparkSession,
      dir: String,
      langs: Set[String] = Set("en"),
      minTokens: Int = 20
  ): DataFrame = {
    val pairs = Dedup.minhashLshPairs(spark, dir) // ≡ exact on this corpus's similarity gap
    Tables
      .documents(spark, dir)
      .where(
        size(split(col("text"), " ")) >= minTokens &&
          TextAnalysis.langPredCol.isin(langs.toSeq: _*)
      )
      .select("doc_id")
      .join(pairs.select(col("doc_b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** C2 — the pipeline's yield report: how many documents survive each
    * stage of [[cleanCorpus]]'s filter chain — `(n_raw, n_quality, n_lang,
    * n_clean)`, one row. This is the observability number a curation run
    * publishes ("dedup dropped 4%") and the first thing to check when a
    * training mix shifts: which stage's yield moved.
    *
    * The three narrow stage counts ride ONE conditional aggregation of a
    * single corpus scan (each stage's predicate nests the previous — the
    * funnel is monotone by construction); only `n_clean` pays for the dedup
    * machinery, and it reuses [[cleanCorpus]] verbatim so the report can
    * never disagree with the pipeline it reports on. The final join of two
    * 1-row aggregates is a broadcast cross of singletons.
    */
  /** C3 — per-source TOKEN yield through the cleaning funnel: documents
    * and tokens raw vs surviving [[cleanCorpus]], by source — the
    * "effective dataset size" table a dataset card publishes (training
    * mixes are budgeted in tokens, not documents, and yield differs per
    * source because quality/dedup losses do). Reuses [[cleanCorpus]]
    * verbatim (one definition — the card can never disagree with the
    * pipeline), adds one left join against the survivor id-list and one
    * source-keyed aggregate; the token counting rides the same corpus
    * scan that funnels the filters.
    */
  def tokenYield(
      spark: SparkSession,
      dir: String,
      langs: Set[String] = Set("en"),
      minTokens: Int = 20
  ): DataFrame = {
    val clean = cleanCorpus(spark, dir, langs, minTokens).withColumn("is_clean", lit(1L))
    Tables
      .documents(spark, dir)
      .select(col("source"), col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
      .join(clean, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs_raw"),
        sum(col("ntok")).as("n_tokens_raw"),
        sum(when(col("is_clean").isNotNull, 1L).otherwise(0L)).as("n_docs_clean"),
        sum(when(col("is_clean").isNotNull, col("ntok")).otherwise(0L)).as("n_tokens_clean")
      )
      .orderBy("source")
  }

  /** D33 — per-document DROP-REASON ledger: for every document, which
    * gates fire — too short, wrong language (c1's rules), near-duplicate
    * of a lower id (c1's keep rule), shares benchmark shingles (d8's
    * contamination definition) — and the resulting extended keep bit
    * (c1's funnel PLUS decontamination). This is the audit table a
    * curation run ships next to its keep-list: "why did my document
    * disappear" answered per doc, and drop-reason marginals answered by
    * one aggregation over it. Reasons are INDEPENDENT bits, not a
    * funnel: a doc can be both short and contaminated, and the marginals
    * only reconcile when every gate is evaluated on every doc.
    *
    * All four gates reuse the single existing definition of their rule
    * (langPredCol, minhashLshPairs, decontaminate) — the ledger can
    * never disagree with the pipeline it explains; the engine side is
    * three left joins of id-lists onto one corpus scan.
    */
  def dropReasons(
      spark: SparkSession,
      dir: String,
      langs: Set[String] = Set("en"),
      minTokens: Int = 20
  ): DataFrame = {
    val dup = Dedup
      .minhashLshPairs(spark, dir)
      .select(col("doc_b").as("doc_id"))
      .distinct()
      .withColumn("is_dup", lit(1L))
    val cont = Curation
      .decontaminate(spark, dir)
      .select("doc_id")
      .distinct()
      .withColumn("is_cont", lit(1L))
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        (size(split(col("text"), " ")) < minTokens).cast("long").as("too_short"),
        (!TextAnalysis.langPredCol.isin(langs.toSeq: _*)).cast("long").as("wrong_lang")
      )
      .join(dup, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("too_short"),
        col("wrong_lang"),
        coalesce(col("is_dup"), lit(0L)).as("near_dup"),
        coalesce(col("is_cont"), lit(0L)).as("contaminated"),
        when(
          col("too_short") === 0L && col("wrong_lang") === 0L &&
            coalesce(col("is_dup"), lit(0L)) === 0L && coalesce(col("is_cont"), lit(0L)) === 0L,
          1L
        ).otherwise(0L).as("kept")
      )
      .orderBy("doc_id")
  }

  def stageCounts(
      spark: SparkSession,
      dir: String,
      langs: Set[String] = Set("en"),
      minTokens: Int = 20
  ): DataFrame = {
    val qual   = size(split(col("text"), " ")) >= minTokens
    val langOk = TextAnalysis.langPredCol.isin(langs.toSeq: _*)
    val narrow = Tables
      .documents(spark, dir)
      .agg(
        count(lit(1)).as("n_raw"),
        sum(when(qual, 1L).otherwise(0L)).as("n_quality"),
        sum(when(qual && langOk, 1L).otherwise(0L)).as("n_lang")
      )
    val clean = cleanCorpus(spark, dir, langs, minTokens).agg(count(lit(1)).as("n_clean"))
    narrow.crossJoin(broadcast(clean))
  }
}
