package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the v3 LSS top-K span ledger and the takedown resolution that
  * reads it ([[Dedup.lssTakedownFromLedger]]) — the store-a-little-more-
  * at-ingest trade that lets n19t answer a takedown from ledger-
  * cardinality joins instead of the old full survivors pass (13.5 s at
  * sf0.1, hours at 100 TB):
  *   - ledger SHAPE: entries per doc in the exact from-scratch priority
  *     order (len desc, fp asc), the K smallest other carriers, the TRUE
  *     other-carrier count, the doc's total span count;
  *   - DECIDED path: a takedown that leaves every walked entry decidable
  *     resolves exactly (== from-scratch over survivors) with an EMPTY
  *     recompute set — and with < K tombstones no stored carrier list of
  *     a truncated entry can go all-dead, so the ledger-only guarantee
  *     for small concurrent takedown mass is structural, not lucky;
  *   - DEAD-COMPLETE entries (every carrier tombstoned on a COMPLETE
  *     list) are skipped, the walk continuing to a later usable entry —
  *     the distinction that keeps a doc out of the recompute set when
  *     the ledger can still prove its answer;
  *   - TRUNCATED overflow: all K stored carriers dead on a list with
  *     n_others > K is undecidable — the doc (and only such docs) joins
  *     the recompute set, and the recompute union reproduces from-scratch;
  *   - ABSENT convention: a doc whose spans are ALL dead-complete and
  *     fully stored provably shares nothing with any survivor — it is
  *     absent from `decided` and NOT sent to recompute;
  *   - the registered n19t read stays ledger-cardinality: the decided
  *     branch's plan scans the topk ledger, never documents.parquet.
  */
class LssTakedownSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "t", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def tomb(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  /** doc_id -> (lss_len, lss_fp) of a from-scratch LSS over `docs` minus
    * the tombstoned ids — the oracle every resolution must match.
    */
  private def scratch(docs: DataFrame, dead: Set[Long], cap: Int = 16): Map[Long, (Long, String)] =
    Dedup
      .longestSharedSubstringFrom(docs.where(!col("doc_id").isInCollection(dead)), cap)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap

  private def resolved(decided: DataFrame): Map[Long, (Long, String)] =
    decided.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  /** Five docs sharing the 4-token run "a b c d" (df=5 > K+1=3, so every
    * carrier list is TRUNCATED at K=2), plus a 2-token run between 1 and 6.
    */
  private def df5Corpus = docsDf(
    1L -> "a b c d x1",
    2L -> "a b c d x2",
    3L -> "a b c d x3",
    4L -> "a b c d x4",
    5L -> "a b c d x5",
    6L -> "zz yy x6",
    7L -> "zz yy x7"
  )

  test("ledger shape: priority order, smallest-K others, true counts") {
    val (_, _, topk) = Dedup.longestSharedSubstringArtifacts(df5Corpus, cap = 16, partnerK = 2)
    val rows = topk.collect().map { r =>
      (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getSeq[Long](4), r.getLong(5), r.getLong(6))
    }.toMap
    // doc 1 shares every contiguous subrange of "a b c d": 4+3+2+1 = 10 spans
    val (len1, others1, nOthers1, nSpans1) = rows((1L, 1))
    assert(len1 == 4L, s"rank-1 must be the longest span: $len1")
    assert(others1 == Seq(2L, 3L), s"smallest-K other carriers: $others1")
    assert(nOthers1 == 4L, "true df-1, not the stored count")
    assert(nSpans1 == 10L, s"all shared spans counted: $nSpans1")
    // rank 2 is one of the len-3 runs (md5 tie-break picks which)
    assert(rows((1L, 2))._1 == 3L)
    // K=2 stores exactly 2 entries per doc here
    assert(topk.where(col("doc_id") === 1L).count() == 2L)
    // the 2-token pair 6/7: complete carrier list (df=2 <= K+1)
    val (len6, others6, nOthers6, nSpans6) = rows((6L, 1))
    assert(len6 == 2L && others6 == Seq(7L) && nOthers6 == 1L && nSpans6 == 3L)
    // entries are ordered (len desc, fp asc): rank-2's fp must not precede
    // rank-1's under that order
    val r1 = topk.where(col("doc_id") === 1L && col("rank") === 1).select("len", "fp").head()
    val r2 = topk.where(col("doc_id") === 1L && col("rank") === 2).select("len", "fp").head()
    assert(r1.getLong(0) > r2.getLong(0) || (r1.getLong(0) == r2.getLong(0) && r1.getString(1) < r2.getString(1)))
  }

  test("decided path: < K carrier deaths resolve ledger-only, == from-scratch") {
    val docs = df5Corpus
    val (_, _, topk) = Dedup.longestSharedSubstringArtifacts(docs, cap = 16, partnerK = 2)
    // one tombstone (< K=2): no truncated entry can lose ALL stored
    // carriers, so recompute must be structurally empty
    val (decided, recompute) = Dedup.lssTakedownFromLedger(topk, tomb(2L))
    assert(recompute.isEmpty, "one death < K must never reach the overflow pass")
    assert(resolved(decided) == scratch(docs, Set(2L)))
  }

  test("dead-complete entries are skipped, walk continues to a usable span") {
    // doc 10's best run (3 tokens) is shared ONLY with doc 11 — a COMPLETE
    // one-carrier list. Killing 11 must walk past rank-1 (and the two
    // dead-complete len-2 subranges) to the surviving "m n" with doc 12,
    // WITHOUT any recompute: K=9 stores all 9 of doc 10's spans.
    val docs = docsDf(
      10L -> "u v w q1 m n q2",
      11L -> "u v w q3",
      12L -> "m n q4"
    )
    val (_, _, topk) = Dedup.longestSharedSubstringArtifacts(docs, cap = 16, partnerK = 9)
    val (decided, recompute) = Dedup.lssTakedownFromLedger(topk, tomb(11L))
    assert(recompute.isEmpty, "all entries decidable: dead-complete or usable")
    val got = resolved(decided)
    assert(got == scratch(docs, Set(11L)))
    assert(got(10L)._1 == 2L, s"doc 10 must fall back to its surviving 2-token run: $got")
  }

  test("truncated all-dead carrier list overflows to recompute — and only then") {
    val docs = df5Corpus
    val (_, _, topk) = Dedup.longestSharedSubstringArtifacts(docs, cap = 16, partnerK = 2)
    // kill BOTH of doc 1's stored carriers (2, 3): its rank-1 list was
    // truncated (n_others=4 > 2 stored), so the ledger cannot prove
    // whether an unstored carrier (4 or 5) survives -> overflow.
    val (decided, recompute) = Dedup.lssTakedownFromLedger(topk, tomb(2L, 3L))
    val re = recompute.collect().map(_.getLong(0)).toSet
    assert(re == Set(1L), s"exactly the truncated-all-dead doc recomputes: $re")
    // docs 4 and 5 stored carrier 1 (survivor) -> decided ledger-only
    val dec = resolved(decided)
    val oracle = scratch(docs, Set(2L, 3L))
    assert(dec.keySet == oracle.keySet - 1L)
    assert(dec.forall { case (k, v) => oracle(k) == v })
    // and the overflow union reproduces from-scratch exactly (doc 1 still
    // shares "a b c d" with the surviving 4 and 5)
    assert(oracle(1L)._1 == 4L)
  }

  test("fully-stored all-dead docs are ABSENT, not recomputed") {
    val docs = docsDf(
      20L -> "r s t5",
      21L -> "r s t6",
      22L -> "aa bb t7",
      23L -> "aa bb t8"
    )
    // K=3 >= doc 20's 3 spans (r, s, "r s") -> every carrier list complete
    val (_, _, topk) = Dedup.longestSharedSubstringArtifacts(docs, cap = 16, partnerK = 3)
    val (decided, recompute) = Dedup.lssTakedownFromLedger(topk, tomb(21L))
    assert(recompute.isEmpty, "a provably-shareless doc must not pay the survivors pass")
    val got = resolved(decided)
    assert(!got.contains(20L), "doc 20's only sharer died on complete lists -> absent (d16 convention)")
    assert(got == scratch(docs, Set(21L)))
  }

  test("targeted recompute equals the full pass filtered — overflow corpus") {
    val docs      = df5Corpus
    val dead      = Set(2L, 3L)
    val survivors = docs.where(!col("doc_id").isInCollection(dead))
    val got = Dedup
      .longestSharedSubstringTargeted(survivors, tomb(1L), cap = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val oracle = scratch(docs, dead)
    assert(got.keySet == Set(1L), s"targeted must answer for the target set only: $got")
    assert(got(1L) == oracle(1L), "and the answer must be the full pass's row exactly")
    // a target sharing nothing with any survivor yields NO row (doc 6's
    // only sharer is doc 7; kill 7 and target 6)
    val s2 = docs.where(col("doc_id") =!= 7L)
    assert(Dedup.longestSharedSubstringTargeted(s2, tomb(6L), 16).collect().isEmpty)
  }

  test("targeted recompute equals the full pass filtered — sf0.001 corpus slice") {
    val docs      = graft.sources.Tables.documents(spark, sf0001)
    val survivors = docs.where(pmod(col("doc_id"), lit(10)) =!= 3)
    // an arbitrary ~2% target slice of the survivors
    val targets = survivors.where(pmod(col("doc_id"), lit(50)) === 7).select("doc_id")
    val got = Dedup
      .longestSharedSubstringTargeted(survivors, targets, cap = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val tset = targets.collect().map(_.getLong(0)).toSet
    val full = Dedup
      .longestSharedSubstringFrom(survivors, 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      .filter { case (k, _) => tset(k) }
    assert(got == full, s"targeted (${got.size} rows) must equal full-filtered (${full.size} rows)")
  }

  test("registered n19t equals from-scratch at sf0.001, ledger reads stay ledger-only") {
    val masked = Dedup.longestSharedSubstringTombstoned(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val oracle = Dedup
      .longestSharedSubstringFrom(docs.where(pmod(col("doc_id"), lit(10)) =!= 3), 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(masked == oracle, "masked layout must equal a from-scratch build over survivors")
    // the decided branch built from the persisted ledger scans topk.parquet
    // and NOTHING corpus-sized — documents.parquet never appears in its plan
    val topk = Dedup.lssTopkLedger(spark, sf0001)
    val (decided, _) = Dedup.lssTakedownFromLedger(topk, tomb(3L, 13L, 23L))
    val inputs = decided.inputFiles
    assert(inputs.nonEmpty && inputs.forall(_.contains("topk.parquet")),
      s"takedown resolution must read the ledger and nothing corpus-sized: ${inputs.mkString(", ")}")
  }
}
