package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The LSM generation fold shared by the maintained SEGMENT-FAN families
  * (dedup MinHash index, streamed trigram index, streamed tokenizer
  * counts): a foreachBatch stream appends one sealed `batch_id=` segment
  * per micro-batch forever, so reads pay an ever-growing listing +
  * small-file fan at daily cadence. This helper folds everything strictly
  * OLDER than the newest fan segment into a committed generation, in
  * place and crash-safe:
  *
  *   - layout: fan tables at `root/<table>/batch_id=N`, generations at
  *     `root/gen=<cutoff>/<table>.parquet` (BESIDE the fan dirs, never
  *     inside them — partition discovery over the fan must not see
  *     `gen=` names);
  *   - cutoff = the NEWEST fan id. The newest segment itself is never
  *     folded: after a crash it is the segment a checkpoint replay
  *     rewrites, and folding it would double its rows when the replayed
  *     segment lands;
  *   - a generation is COMMITTED only when every table carries
  *     `<table>.parquet/_SUCCESS` — a half-written fold is invisible,
  *     exactly like a markerless snapshot in [[SnapshotChain]];
  *   - readers ([[tableRead]]) take the newest committed generation ∪ fan
  *     segments AT OR ABOVE its cutoff — folded fan dirs are excluded by
  *     FILTER, never by trusting deletion, so a crash between the
  *     generation commit and the fan GC leaves duplicate bytes on disk
  *     but never duplicate rows in a read;
  *   - GC (folded fan dirs + superseded generations) runs relative to the
  *     committed cutoff on EVERY [[compact]] call — including the no-op
  *     path — so crash leftovers are reclaimed even on a low-traffic
  *     stream whose next real fold is far away.
  *
  * `batch_id` is kept as a DATA column in the generation (consumers like
  * the dedup pairing rule order on it) and normalized to long on both
  * sides (the fan side is a discovered partition column whose inferred
  * type can differ). A fold is a pure row move by default; a family whose
  * rows are additive (tokenizer counts) passes a `shape` that
  * re-aggregates — exactness is then the family's own argument, pinned in
  * its spec.
  *
  * Dir names that do not parse as a Long (non-digits, or all-digit names
  * longer than 18 chars — a pasted nanos timestamp would overflow
  * `toLong`) are skipped everywhere, never thrown on.
  */
object SegmentFan {

  private[streaming] def parsedId(name: String, prefix: String): Option[Long] = {
    val s = name.stripPrefix(prefix)
    if (name.startsWith(prefix) && s.nonEmpty && s.length <= 18 && s.forall(_.isDigit))
      Some(s.toLong)
    else None
  }

  private def hadoopFs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[graft] def fanDirs(
      spark: SparkSession,
      root: String,
      table: String
  ): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val fs = hadoopFs(spark, root)
    val p  = new org.apache.hadoop.fs.Path(s"$root/$table")
    if (!fs.exists(p)) Nil
    else
      fs.listStatus(p)
        .map(_.getPath)
        .flatMap(d => parsedId(d.getName, "batch_id=").map(_ -> d))
        .toSeq
  }

  /** The newest COMMITTED generation under `root`: `gen=<cutoff>` whose
    * EVERY table carries `_SUCCESS`. Returns (cutoff, dir).
    */
  private[graft] def latestGen(
      spark: SparkSession,
      root: String,
      tables: Seq[String]
  ): Option[(Long, String)] = {
    val fs = hadoopFs(spark, root)
    val p  = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) return None
    fs.listStatus(p)
      .map(_.getPath)
      .flatMap(d => parsedId(d.getName, "gen=").map(_ -> d))
      .filter { case (_, d) =>
        tables.forall(t => fs.exists(new org.apache.hadoop.fs.Path(d, s"$t.parquet/_SUCCESS")))
      }
      .sortBy(_._1)
      .lastOption
      .map { case (id, d) => (id, d.toString) }
  }

  /** One logical table as the union of the newest committed generation and
    * the live fan at or above its cutoff. `tables` lists EVERY table of
    * the family (the commit marker is all-tables), `table` the one to
    * read.
    */
  def tableRead(spark: SparkSession, root: String, tables: Seq[String], table: String): DataFrame = {
    val fs = hadoopFs(spark, root)
    def read(p: String): Option[DataFrame] = {
      val hp = new org.apache.hadoop.fs.Path(p)
      if (fs.exists(hp) && fs.listStatus(hp).nonEmpty) Some(spark.read.parquet(p)) else None
    }
    val gen = latestGen(spark, root, tables)
    val fan = read(s"$root/$table")
      .map(_.withColumn("batch_id", col("batch_id").cast("long")))
      .map(df => gen.fold(df) { case (cut, _) => df.where(col("batch_id") >= cut) })
    val genRows = gen.flatMap { case (_, dir) => read(s"$dir/$table.parquet") }
      .map(_.withColumn("batch_id", col("batch_id").cast("long")))
    (fan, genRows) match {
      case (Some(f), Some(g)) => f.unionByName(g)
      case (Some(f), None)    => f
      case (None, Some(g))    => g
      case (None, None) =>
        throw new IllegalStateException(s"maintained index at $root has no segments and no generation")
    }
  }

  /** Fold the fan below the newest segment (plus the previous generation)
    * into `gen=<cutoff>`; returns the new cutoff, 0 on the no-op path
    * (fewer than two live segments). `shape(table, df)` post-processes
    * each folded table before the write (clustering, re-aggregation) and
    * defaults to the identity row move.
    */
  def compact(
      spark: SparkSession,
      root: String,
      tables: Seq[String],
      shape: (String, DataFrame) => DataFrame = (_, df) => df
  ): Long = {
    val fs      = hadoopFs(spark, root)
    val prevGen = latestGen(spark, root, tables)
    val prevCut = prevGen.map(_._1).getOrElse(0L)
    def gc(cutoff: Long): Unit = {
      tables.foreach(t => fanDirs(spark, root, t).filter(_._1 < cutoff).foreach(d => fs.delete(d._2, true)))
      fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .map(_.getPath)
        .filter(d => parsedId(d.getName, "gen=").exists(_ < cutoff))
        .foreach(d => fs.delete(d, true))
    }
    gc(prevCut)
    // Cutoff over EVERY table's live ids, not tables.head alone (ADVICE
    // r19): a checkpoint replay rewrites the batch with the GLOBAL newest
    // id, and a crash mid-batch can leave that id present in whichever
    // table processBatch happened to write first. Taking the max across
    // all tables keeps the replay-target segment unfolded regardless of
    // per-family write order — no head-written-first contract required.
    val live = tables.flatMap(t => fanDirs(spark, root, t).map(_._1)).filter(_ >= prevCut).distinct
    if (live.length <= 1) return 0L
    // First-batch crash state (ADVICE r20): another table of the family may
    // have ZERO segments (its write never landed) while this one already
    // carries two — with no committed generation, folding now would make
    // tableRead throw on the empty table where the pre-global-cutoff code
    // no-op'd. Defer to the checkpoint replay that will land the missing
    // segment; the next compact folds normally.
    if (prevGen.isEmpty && tables.exists(t => fanDirs(spark, root, t).isEmpty)) return 0L
    val cutoff = live.max
    tables.foreach { t =>
      shape(t, tableRead(spark, root, tables, t).where(col("batch_id") < cutoff))
        .write.mode("overwrite").parquet(s"$root/gen=$cutoff/$t.parquet")
    }
    gc(cutoff)
    cutoff
  }
}
