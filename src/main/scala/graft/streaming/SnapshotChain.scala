package graft.streaming

import org.apache.spark.sql.SparkSession

/** Retention for snapshot-CHAIN state directories (`<chain>/batch_id=N`
  * full-table snapshots, the ClusterStream/LssStream maintenance pattern).
  *
  * Why this exists: a snapshot chain writes one FULL table per micro-batch
  * and, before round 18, never deleted any — at daily batches that is 365
  * complete copies of the maintained table per year of dead storage, and
  * (worse than cost) every old snapshot RETAINS rows whose source documents
  * may since have been taken down, so unbounded chains quietly defeat the
  * takedown lifecycle the layouts worked for. The chain's own correctness
  * contract needs almost none of that history: batch N's build reads ONLY
  * snapshot N−1, and an idempotent replay of batch N after a crash also
  * reads N−1 — so retaining the newest `keep ≥ 2` committed snapshots
  * preserves every replay path while bounding storage at `keep` copies.
  *
  * Deletion rules (each load-bearing):
  *   - COMMITTED means the directory carries Spark's `_SUCCESS` marker —
  *     the same definition the latest-snapshot readers use. The cutoff is
  *     the `keep`-th-newest COMMITTED id, so torn/markerless directories
  *     can never shift the window.
  *   - A markerless directory NEWER than the cutoff is left alone: it is
  *     (or may be) an in-flight write racing this call.
  *   - A markerless directory OLDER than the cutoff is deleted with the
  *     rest: its batch was long since replayed or superseded, and a torn
  *     dir is exactly what must not be left for a future bare listing.
  *
  * What retention deliberately does NOT touch: sealed KEY/pair SEGMENT
  * directories (`keys/batch_id=N`, postings segments, …). Those are
  * load-bearing forever — any old document can be the carrier that shares
  * a future document's span — and their FILE growth is bounded by each
  * stream's own [[SegmentFan]] fold ([[LssStream.compactKeySegments]]'s
  * pure row move), never by row deletion here. Only full-table
  * SNAPSHOTS, where batch N strictly supersedes batch N−1, are safe to
  * retire.
  *
  * Time-travel consequence, stated plainly: `batchId = Some(old)` reads
  * older than the retained window fail after retention runs. The window
  * is the knob (`graft.stream.snapshot_keep`, default 4); set it to the
  * audit depth the deployment needs.
  */
object SnapshotChain {

  /** Skipped-dir warnings already emitted (full paths) — a stray dir is
    * never deleted, so without this a continuous stream would re-print
    * the same warning once per micro-batch forever.
    */
  private val warnedUnparsed = scala.collection.mutable.Set.empty[String]

  /** Delete committed-and-superseded snapshots under `chainDir`, keeping
    * the newest `keep` committed ones (and every directory newer than the
    * cutoff, committed or not). Returns the deleted batch ids, oldest
    * first — callers log them; tests pin them.
    */
  private[graft] def retain(spark: SparkSession, chainDir: String, keep: Int): Seq[Long] = {
    require(keep >= 2, s"snapshot_keep=$keep: replay of batch N reads snapshot N-1, so keep >= 2")
    val p  = new org.apache.hadoop.fs.Path(chainDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    // A name whose suffix does not parse as a Long (a stray
    // `batch_id=copy` from manual ops — or an all-digit name too long for
    // a Long, e.g. a pasted nanos timestamp) is NOT this chain's
    // snapshot: skip it with a once-per-name warning rather than let
    // toLong throw inside processBatch and kill the stream (ADVICE r18).
    // It is never deleted either — retention only reasons about ids it
    // can order.
    val (dirs, unparsed) = fs
      .listStatus(p)
      .map(_.getPath)
      .filter(_.getName.startsWith("batch_id="))
      .partition { d =>
        val suffix = d.getName.stripPrefix("batch_id=")
        suffix.nonEmpty && suffix.length <= 18 && suffix.forall(_.isDigit)
      }
    val newlyUnparsed = unparsed.map(_.toString).filterNot(warnedUnparsed.contains)
    if (newlyUnparsed.nonEmpty) {
      warnedUnparsed.synchronized { warnedUnparsed ++= newlyUnparsed }
      System.err.println(
        s"[SnapshotChain] skipping non-numeric snapshot dirs under $chainDir: " +
          unparsed.map(_.getName).mkString(", "))
    }
    def idOf(d: org.apache.hadoop.fs.Path): Long = d.getName.stripPrefix("batch_id=").toLong
    val committed = dirs
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")))
      .map(idOf)
      .sorted
    if (committed.length <= keep) return Nil
    val cutoff = committed(committed.length - keep) // keep-th newest committed id
    val doomed = dirs.filter(d => idOf(d) < cutoff).sortBy(idOf)
    doomed.foreach(d => fs.delete(d, true))
    doomed.map(idOf).toSeq
  }
}
