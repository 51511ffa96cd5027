package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** The `nProbe` nearest centroid indices for an `array<float>` embedding,
  * ordered by cosine descending with index-ascending tie-break, as ONE
  * compiled loop over a broadcast-referenced `float[][]` centroid matrix.
  *
  * Why this exists (knn100 rehearsal finding): the previous formulation
  * built the centroid scan as an `array(struct(cosine_sim(col, lit(c₀))…))`
  * expression tree — one literal + one cosine call PER centroid. At the
  * 16-cluster default that codegens fine; at the √n-scaled cluster counts a
  * real corpus needs (256 at 200k vectors, thousands beyond) the generated
  * method blows past Janino's 64KB limit, whole-stage codegen fails, and
  * the hottest per-row loop of the IVF family silently runs interpreted.
  * Here the matrix is a single reference object (`ctx.addReferenceObj`), so
  * the generated code is one fixed-size nested loop regardless of C — the
  * expression stays inside codegen at any cluster count, and the per-row
  * cost is C·dim float-multiplies with no per-centroid expression overhead.
  *
  * Float semantics are IDENTICAL to [[CosineSimilarity]] (float multiply,
  * double accumulate, index order, `dot/(√nx·√ny)`, zero-norm → 0.0), so
  * rankings agree with the scoring path; centroid norms are precomputed
  * once per plan, which cannot change the result (`√ny` is the same double
  * either way). Dimension-mismatched centroids → null, the observable
  * degradation contract every vector expression here follows.
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Float]], nProbe: Int)
    extends UnaryExpression {

  require(nProbe > 0, s"nearest_centroids needs nProbe > 0, got $nProbe")
  require(centroids.nonEmpty, "nearest_centroids needs at least one centroid")

  private def isFloatArray(e: Expression): Boolean =
    !e.resolved || e.dataType == ArrayType(FloatType) ||
      e.dataType == ArrayType(FloatType, containsNull = false)
  require(isFloatArray(child), s"nearest_centroids expects array<float>, got ${child.dataType}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean  = true
  override def prettyName: String = "nearest_centroids"

  /** √(Σ c²) per centroid, float-multiply/double-add in index order — the
    * exact accumulation [[CosineSimilarity]] performs for its right side.
    */
  @transient private lazy val cNorms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += (c(i) * c(i)).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Top-k by (cos desc, idx asc): ascending scan with strictly-greater
    * replacement keeps the smallest index among exact ties.
    */
  private def select(cos: Array[Double], k: Int): Array[Int] = {
    val used = new Array[Boolean](cos.length)
    val out  = new Array[Int](k)
    var p = 0
    while (p < k) {
      var best = -1; var bc = Double.NegativeInfinity; var c = 0
      while (c < cos.length) { if (!used(c) && cos(c) > bc) { bc = cos(c); best = c }; c += 1 }
      used(best) = true; out(p) = best; p += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var c = 0
    while (c < centroids.length) { if (centroids(c).length != n) return null; c += 1 }
    var nx = 0.0
    var i  = 0
    while (i < n) { val xi = x.getFloat(i); nx += (xi * xi).toDouble; i += 1 }
    val nxs = math.sqrt(nx)
    val cos = new Array[Double](centroids.length)
    c = 0
    while (c < centroids.length) {
      val cc  = centroids(c)
      var dot = 0.0
      i = 0
      while (i < n) { dot += (x.getFloat(i) * cc(i)).toDouble; i += 1 }
      cos(c) = if (nx == 0.0 || cNorms(c) == 0.0) 0.0 else dot / (nxs * cNorms(c))
      c += 1
    }
    new GenericArrayData(select(cos, math.min(nProbe, centroids.length)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val csRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val cnRef = ctx.addReferenceObj("cnorms", cNorms, "double[]")
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val n    = ctx.freshName("n")
        val bad  = ctx.freshName("bad")
        val nx   = ctx.freshName("nx")
        val nxs  = ctx.freshName("nxs")
        val cos  = ctx.freshName("cos")
        val used = ctx.freshName("used")
        val out  = ctx.freshName("out")
        val np   = ctx.freshName("np")
        val c    = ctx.freshName("c")
        val i    = ctx.freshName("i")
        val xi   = ctx.freshName("xi")
        val dot  = ctx.freshName("dot")
        val cc   = ctx.freshName("cc")
        val p    = ctx.freshName("p")
        val best = ctx.freshName("best")
        val bc   = ctx.freshName("bc")
        s"""
        |int $n = $a.numElements();
        |boolean $bad = false;
        |for (int $c = 0; $c < $csRef.length; $c++) {
        |  if ($csRef[$c].length != $n) { $bad = true; break; }
        |}
        |if ($bad) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $nx = 0.0;
        |  for (int $i = 0; $i < $n; $i++) { float $xi = $a.getFloat($i); $nx += $xi * $xi; }
        |  double $nxs = java.lang.Math.sqrt($nx);
        |  double[] $cos = new double[$csRef.length];
        |  for (int $c = 0; $c < $csRef.length; $c++) {
        |    float[] $cc = $csRef[$c];
        |    double $dot = 0.0;
        |    for (int $i = 0; $i < $n; $i++) { $dot += $a.getFloat($i) * $cc[$i]; }
        |    $cos[$c] = ($nx == 0.0 || $cnRef[$c] == 0.0) ? 0.0 : $dot / ($nxs * $cnRef[$c]);
        |  }
        |  int $np = java.lang.Math.min($nProbe, $csRef.length);
        |  int[] $out = new int[$np];
        |  boolean[] $used = new boolean[$csRef.length];
        |  for (int $p = 0; $p < $np; $p++) {
        |    int $best = -1; double $bc = java.lang.Double.NEGATIVE_INFINITY;
        |    for (int $c = 0; $c < $csRef.length; $c++) {
        |      if (!$used[$c] && $cos[$c] > $bc) { $bc = $cos[$c]; $best = $c; }
        |    }
        |    $used[$best] = true; $out[$p] = $best;
        |  }
        |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |}
        |""".stripMargin
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
