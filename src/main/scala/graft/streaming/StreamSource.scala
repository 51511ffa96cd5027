package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Shared read-schema resolution for the file-watch streams. Structured
  * Streaming's parquet source needs a fixed schema before the first
  * micro-batch, and every maintained-artifact family used to infer it with
  * an eager `spark.read.parquet(dir)` at stream START — which throws when
  * the watched directory is still empty, a real deployment ordering
  * (create the stream first, land files later) that the batch-first specs
  * never exercised. Callers that know the schema (from
  * [[graft.sources.Tables]] or their own catalog) pass it explicitly and
  * the stream starts cleanly against an empty directory; `None` keeps the
  * one-time inference with its precondition now stated in exactly one
  * place: the directory must already contain at least one parquet file.
  */
object StreamSource {

  def schemaFor(spark: SparkSession, dir: String, explicit: Option[StructType]): StructType =
    explicit.getOrElse(spark.read.parquet(dir).schema)

  /** True iff `dir` holds at least one COMMITTED parquet data file —
    * directly, or inside a first-level non-underscore child (a
    * `batch_id=` segment). The ONE degrade test every maintained-artifact
    * reader shares: an absent directory, an empty one, and the
    * crash-mid-first-write case (only `_temporary/`, nothing committed)
    * must all answer "empty artifact", never throw schema inference —
    * three families each hand-rolled a different strictness of this check
    * before it was factored here (round-13 review finding: the two weaker
    * copies were crash-window bugs).
    */
  def hasCommittedSegments(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs   = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def committedIn(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    fs.exists(path) && {
      val children = fs.listStatus(path)
      committedIn(path) || children.exists(c =>
        c.isDirectory && !c.getPath.getName.startsWith("_") && committedIn(c.getPath)
      )
    }
  }
}
