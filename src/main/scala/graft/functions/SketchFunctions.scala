package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL registration for Spark's OWN Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`,
  * `sql/catalyst/expressions/BloomFilterMightContain.scala`) — built for
  * the optimizer's runtime row-level filtering (SPARK-32268) and therefore
  * NOT in the public function registry, though both are full codegen'd
  * Catalyst expressions (the probe lazily deserializes a literal bloom
  * once per task, then tests bits per row). Registering them through the
  * same session mechanism as the engine's own custom expressions makes
  * the membership-sketch pattern available to operators
  * ([[graft.operators.Curation.decontaminateBloom]]): aggregate a key
  * column into a compact bitset, then prune a huge probe stream map-side
  * before any join machinery runs.
  */
object SketchFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def registerIfAbsent(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!registry.functionExists(FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    // bare AggregateFunction: the analyzer wraps it (DISTINCT/FILTER aware)
    registerIfAbsent(
      "bloom_filter_agg",
      {
        case Seq(child)             => new BloomFilterAggregate(child)
        case Seq(child, items)      => new BloomFilterAggregate(child, items)
        case Seq(child, items, bits) => new BloomFilterAggregate(child, items, bits)
        case other => throw new IllegalArgumentException(s"bloom_filter_agg takes 1-3 args, got ${other.length}")
      }
    )
    registerIfAbsent(
      "might_contain",
      { case Seq(bf, value) => BloomFilterMightContain(bf, value)
        case other => throw new IllegalArgumentException(s"might_contain takes 2 args, got ${other.length}") }
    )
  }
}
