package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over two `array<float>` embedding columns as a native
  * Catalyst expression.
  *
  * Preference order from the build plan: compose built-ins → custom
  * `Expression` → full plan node. A `zip_with`+`aggregate` composition works
  * but allocates an intermediate array per row and stays outside the tight
  * loop; this expression evaluates in one pass over the two `ArrayData`
  * buffers and participates in whole-stage codegen via `doGenCode`, which is
  * what the 100 TB brute-force scoring path (N·k float muls per row) needs.
  *
  * Accumulation is float-multiply / double-add, final `dot/(√nx·√ny)` —
  * the same shape DuckDB's `list_cosine_similarity` uses, so rank order
  * agrees with the oracle (outputs expose ranks/ids, never raw floats).
  * Zero-norm inputs yield 0.0 rather than NaN; mismatched dimensions yield
  * null rather than a truncated-prefix score.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Both inputs must be array<float>; enforced at bind time rather than via
  // ExpectsInputTypes (whose AbstractDataType is private[sql]). getFloat on
  // a differently-typed ArrayData would reinterpret raw bytes — garbage
  // scores are worse than an analysis error.
  private def isFloatArray(e: Expression): Boolean =
    !e.resolved || e.dataType == ArrayType(FloatType) ||
      e.dataType == ArrayType(FloatType, containsNull = false)
  require(isFloatArray(left), s"cosine_sim expects array<float> left, got ${left.dataType}")
  require(isFloatArray(right), s"cosine_sim expects array<float> right, got ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  // Dimension mismatch → null (observable degradation a filter can catch),
  // never a truncated-prefix score that silently corrupts rankings.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = x.getFloat(i); val yi = y.getFloat(i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        // fresh names: the expression may be instantiated several times in
        // one generated method (and shares scope with sibling expressions).
        val n   = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val nx  = ctx.freshName("nx")
        val ny  = ctx.freshName("ny")
        val i   = ctx.freshName("i")
        val xi  = ctx.freshName("xi")
        val yi  = ctx.freshName("yi")
        s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    float $xi = $a.getFloat($i); float $yi = $b.getFloat($i);
        |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        |  }
        |  ${ev.value} = ($nx == 0.0 || $ny == 0.0)
        |    ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        |}
        |""".stripMargin
      }
    )

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {

  /** Register the engine's custom expressions (`cosine_sim(a, b)`,
    * `intersection_size(a, b)`) in the session's function registry so they
    * are callable from `expr(...)`/SQL — version-stable way to expose a
    * custom Expression as a Column without internal Column constructors.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    // Idempotent: operators call this defensively on every invocation, and
    // re-registering an existing name logs a "replaced a previously
    // registered function" warning per call — noise at bench/driver scale.
    def registerIfAbsent(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    registerIfAbsent("cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)))
    registerIfAbsent("intersection_size", exprs => IntersectionSize(exprs(0), exprs(1)))
    // nearest_centroids(embedding, <matrix literal>, <nProbe literal>): the
    // matrix and probe width are plan-time constants (centroids are a
    // driver-side artifact of C×dim floats by design), destructured from
    // their Literals here so the expression holds them as reference
    // objects rather than a C-wide expression tree (see NearestCentroids).
    registerIfAbsent(
      "nearest_centroids",
      exprs => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.catalyst.util.ArrayData
        import org.apache.spark.sql.types.IntegerType
        val matrix = exprs(1) match {
          case Literal(v: ArrayData, ArrayType(ArrayType(FloatType, _), _)) =>
            v.toObjectArray(ArrayType(FloatType)).map(_.asInstanceOf[ArrayData].toFloatArray())
          case other =>
            throw new IllegalArgumentException(
              s"nearest_centroids: centroid matrix must be an array<array<float>> literal, got $other"
            )
        }
        val np = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other =>
            throw new IllegalArgumentException(s"nearest_centroids: nProbe must be an int literal, got $other")
        }
        NearestCentroids(exprs(0), matrix, np)
      }
    )
  }
}
