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
}
