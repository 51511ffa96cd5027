package graft.sources

import graft.functions.SketchFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom-filter manifest — file-level data skipping for point
  * lookups on a column the physical layout does NOT cluster.
  *
  * Row-group min/max stats (and their layout-side amplifiers: the sorted,
  * day-partitioned and z-ordered copies) prune RANGE predicates on the
  * clustering columns, but a point probe on a scattered high-cardinality
  * key (`event_id` over a ts-clustered log) matches every file's min/max
  * span and degrades to a full-table scan. The lakehouse answer (Delta/
  * Iceberg bloom indexes, ClickHouse bloom skip indexes) is a side
  * manifest: one Bloom filter of the key column PER DATA FILE, consulted
  * before the scan so only files that might contain the key are read.
  * At 100 TB / 1 GiB files that is ~10⁵ manifest rows of ~100 KiB each —
  * a table 10⁴× smaller than the data it prunes, rebuilt incrementally
  * per ingest batch (the [[graft.streaming.ManifestStream]] family).
  *
  * Two probe paths, chosen by where the bloom can live:
  *   - the MANIFEST probe here runs DISTRIBUTED: blooms stay a binary
  *     column, each partition deserializes its rows and tests the key
  *     (`mapPartitions` — bloom wire-format decode is binary codec work
  *     with no Catalyst expression form, the m-family contract). Only
  *     surviving file NAMES reach the driver: expected 1 + fpp·nFiles,
  *     worst case the file list itself — the same bounded driver pull as
  *     any file-index listing.
  *   - Spark's own `might_contain` expression stays the right tool when
  *     the bloom is a single foldable literal (the q50/d20 row-level
  *     prefilter); it requires a constant bloom and cannot probe a column.
  *
  * No false negatives, by construction: a key's file always survives its
  * own bloom, so the pruned read returns exactly the full scan's rows —
  * which is what z2's oracle (the plain point-filter SQL over the
  * original table) hash-checks, and the spec asserts the pruning itself.
  */
object BloomManifest {

  // v2: bloom sizing derived from the rewritten data (one file-name-only
  // pass) and clamped to Spark's bloom_filter_agg limits — the build
  // recipe changed, so the key must too (cache-key provenance discipline).
  // v3: sizing switched mean→max rows-per-file (skew-proof fpp).
  private[graft] val SchemeVersion = 3

  /** Bits per expected item — ~10 bits/key ≈ 1% false-positive rate, the
    * standard skipping-index operating point (a false positive costs one
    * extra file read, never a wrong answer).
    */
  private val BitsPerItem = 10L

  /** Build (or reuse) the manifest layout for `events`: the table
    * rewritten as `nFiles` ts-range files (the realistic log layout — the
    * probe key `event_id` is scattered, so file min/max cannot prune it)
    * plus `manifest.parquet` = one (file, bloom) row per data file.
    */
  def eventsManifestCache(spark: SparkSession, dir: String, nFiles: Int = 16): String = {
    val key = LayoutCache.contentKey(
      spark,
      s"$dir/events.parquet",
      s"bloommanifest-v$SchemeVersion#f$nFiles#b$BitsPerItem"
    )
    LayoutCache.getOrBuild(spark, "graft_bloommanifest", key) { out =>
      Tables.events(spark, dir)
        .repartitionByRange(nFiles, col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(s"$out/data")
      writeManifestFor(spark, s"$out/data", s"$out/manifest.parquet")
    }
  }

  /** One (file, bloom) row per parquet file under `dataDir` — the shared
    * manifest writer (batch layout build above; per-segment incremental
    * build in [[graft.streaming.ManifestStream]]). Bloom sizing comes from
    * ONE cheap file-name-only pass over the just-written data (max rows
    * per file) — the source table is never re-scanned for it — and is
    * clamped to Spark's `bloom_filter_agg` limits
    * (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`,
    * 4M/64M default): past the cap the fpp degrades gradually instead of
    * the build throwing, and the real lever at that point is file sizing
    * (a 1 GiB parquet file holds well under 4M typical event rows). The
    * aggregation is Spark's own codegen'd `bloom_filter_agg`, grouped by
    * `input_file_name` so each file's keys fold into its own filter
    * without any shuffle wider than #files.
    */
  private[graft] def writeManifestFor(spark: SparkSession, dataDir: String, manifestOut: String): Unit = {
    SketchFunctions.register(spark)
    val maxItems =
      spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").map(_.toLong).getOrElse(4000000L)
    val maxBits =
      spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").map(_.toLong).getOrElse(67108864L)
    // the key column stays hardcoded in step with the read path
    // ([[pointSelect]]/the probe semantics are event_id-shaped): a manifest
    // built on another key would be unreadable through this lookup surface,
    // so offering the parameter would only invite a silently-wrong manifest
    val keyed = spark.read.parquet(dataDir).select(input_file_name().as("file"), col("event_id").as("k"))
    // Size every bloom for the LARGEST file, not the mean: bloom_filter_agg
    // takes foldable size arguments, so one size must fit all files, and
    // under file-size skew a mean-sized bloom undersizes the biggest files
    // — their fpp degrades well past the ~1% operating point (extra file
    // reads; answers stay correct, blooms never false-negative). Max-sizing
    // only over-allocates the small files' blooms, and the manifest is
    // ~10⁴× smaller than the data either way.
    val stats    = keyed.groupBy("file").count().agg(coalesce(max("count"), lit(0L))).head()
    val expected = stats.getLong(0) + 1L
    val items    = math.min(math.max(expected, 64L), maxItems)
    val bits     = math.min(items * BitsPerItem, maxBits)
    keyed
      .groupBy("file")
      .agg(call_function("bloom_filter_agg", col("k"), lit(items), lit(bits)).as("bloom"))
      .write.mode("overwrite").parquet(manifestOut)
  }

  /** Distributed manifest probe: the data files whose bloom might contain
    * `key`. Returns only the surviving names (driver bound documented in
    * the object doc). An absent manifest (nothing ingested yet) yields no
    * candidates — the deployment-ordering degrade, not an error. A
    * candidate whose file no longer exists is dropped (bounded `exists`
    * probes on an already-tiny list): a streamed segment replayed after a
    * crash rewrites its data files under new names before its manifest
    * segment catches up, and a reader in that window must skip the
    * dangling old names rather than throw — the replayed rows reappear
    * the moment the manifest rewrite lands (transient, converges;
    * documented in [[graft.streaming.ManifestStream]]).
    */
  private[graft] def candidateFiles(spark: SparkSession, manifestDir: String, key: Long): Seq[String] = {
    import spark.implicits._
    // the shared committed-segment degrade test covers both manifest
    // shapes: the batch layout's plain parquet dir and the streamed
    // batch_id= segment dir — including the crash-mid-first-write case
    // (only _temporary/, nothing committed), which must probe as empty
    if (!graft.streaming.StreamSource.hasCommittedSegments(spark, manifestDir)) return Seq.empty
    val fs = new org.apache.hadoop.fs.Path(manifestDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ignoreMissingFiles: a concurrent checkpoint replay overwriting a
    // manifest batch_id= segment deletes listed manifest files MID-SCAN,
    // which surfaces as a SparkException(FileNotFoundException) from the
    // eager collect below — outside the caller's AnalysisException retry.
    // Skipping the vanished manifest rows honors the documented window
    // contract (skip, never throw): their replacement segment is read on
    // the next probe.
    spark.read
      .option("ignoreMissingFiles", "true")
      .parquet(manifestDir)
      .select(col("file"), col("bloom"))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.collect {
          case (file, bytes)
              if BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)).mightContainLong(key) =>
            file
        }
      }
      .collect()
      .toSeq
      .sorted
      .filter(f => fs.exists(new org.apache.hadoop.fs.Path(f)))
  }

  /** The point-filter projection both lookup surfaces share — one
    * definition so the batch layout and the streamed index can never
    * project differently.
    */
  private[graft] def pointSelect(df: DataFrame, key: Long): DataFrame =
    df.filter(col("event_id") === key).select("event_id", "user_id", "event_type", "props")

  /** Z2 — the reference's PointFilter (`QueryOrchestration.cs:232`) served
    * through the manifest: probe blooms, read ONLY candidate files, apply
    * the exact predicate. Bit-identical to the full scan (no false
    * negatives); the scan reads ~1 file instead of all `nFiles`.
    */
  def pointLookupBloomPruned(spark: SparkSession, dir: String, key: Long = 4242L, nFiles: Int = 16): DataFrame = {
    val layout = eventsManifestCache(spark, dir, nFiles)
    val cands  = candidateFiles(spark, s"$layout/manifest.parquet", key)
    val data =
      if (cands.isEmpty) Tables.cachedRead(spark, s"$layout/data").where(lit(false))
      else spark.read.parquet(cands: _*)
    pointSelect(data, key)
  }
}
