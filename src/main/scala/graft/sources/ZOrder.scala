package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for two-dimensional pruning — the
  * layout answer when a table is filtered on TWO independent columns and a
  * single-column sort can only serve one of them.
  *
  * A parquet scan prunes row groups whose column min/max miss the
  * predicate. Sorting by `x` makes row-group `x`-ranges tight (great
  * pruning on `x`) but leaves `y` scattered across every row group (zero
  * pruning on `y`). Interleaving the bits of quantized `x` and `y` into one
  * Morton key and sorting by THAT bounds each row group to a small square
  * in (x, y) space — both columns' min/max stay tight, so conjunctive
  * range predicates on either or both columns skip most of the file. This
  * is the standard lakehouse `OPTIMIZE ZORDER BY` idea, built from
  * exactly three Spark primitives: quantize, `repartitionByRange`, sorted
  * write — no engine extension needed.
  *
  * At 100 TB the write is one range shuffle (same cost class as any sorted
  * layout build, amortized across every future scan) and the z-key math is
  * narrow codegen'd arithmetic. Pruning effectiveness is measured, not
  * assumed: PhysicalLayoutSpec compares rows emitted by the scan across
  * unsorted / x-sorted / z-ordered copies of the same data.
  */
object ZOrder {

  /** Morton key: min/max-normalize both columns to `bits`-bit integers and
    * interleave their bits (x in even positions, y in odd). Normalization
    * uses double arithmetic — at 16 bits the quantizer only needs ~5
    * significant digits, far inside double precision, and it avoids the
    * long overflow `(x - min) * 2^16` would hit on nanosecond timestamps.
    */
  def zValue(
      x: Column,
      xMin: Double,
      xMax: Double,
      y: Column,
      yMin: Double,
      yMax: Double,
      bits: Int = 16
  ): Column = {
    // 30 max: levels = 1 << bits must stay a positive Int (1 << 31 wraps
    // negative and would silently quantize every coordinate to 0)
    require(bits >= 1 && bits <= 30, "bits must fit a positive int quantizer")
    val levels = 1 << bits
    def quant(c: Column, lo: Double, hi: Double): Column = {
      val scaled = ((c.cast("double") - lit(lo)) / lit(math.max(hi - lo, 1e-300)) * lit(levels)).cast("int")
      least(greatest(scaled, lit(0)), lit(levels - 1))
    }
    val qx = quant(x, xMin, xMax)
    val qy = quant(y, yMin, yMax)
    (0 until bits)
      .map { i =>
        shiftleft(shiftright(qx, i).bitwiseAND(lit(1)).cast("long"), 2 * i)
          .bitwiseOR(shiftleft(shiftright(qy, i).bitwiseAND(lit(1)).cast("long"), 2 * i + 1))
      }
      .reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` z-ordered on (`xCol`, `yCol`): one stats pass for the
    * normalization bounds (tiny agg, driver holds 4 doubles), one range
    * shuffle on the Morton key, per-file sort, key dropped before the
    * write so the table schema is untouched. `rowGroupBytes` controls
    * pruning granularity — smaller groups prune finer at the price of
    * more footer metadata (production leaves the 128 MB default; specs
    * shrink it so a 100k-row fixture still has ~100 groups to skip).
    */
  def zorderWrite(
      df: DataFrame,
      xCol: String,
      yCol: String,
      outDir: String,
      nFiles: Int = 8,
      rowGroupBytes: Int = 128 << 20
  ): Unit = {
    val stats = df
      .agg(
        min(col(xCol)).cast("double"),
        max(col(xCol)).cast("double"),
        min(col(yCol)).cast("double"),
        max(col(yCol)).cast("double")
      )
      .head()
    if (stats.isNullAt(0) || stats.isNullAt(2)) {
      // empty input (or an all-null cluster column): no meaningful curve —
      // write the data as-is rather than NPE on a null bound. An empty
      // table round-trips; a non-null-free column is the caller's bug and
      // still lands queryable.
      df.write.mode("overwrite").option("compression", "snappy").parquet(outDir)
      return
    }
    val z = zValue(
      col(xCol), stats.getDouble(0), stats.getDouble(1),
      col(yCol), stats.getDouble(2), stats.getDouble(3)
    )
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .option("compression", "snappy")
      .parquet(outDir)
  }
}
