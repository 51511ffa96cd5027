package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| over two `array<string>` columns as a native Catalyst expression.
  *
  * The built-in composition `size(array_intersect(a, b))` MATERIALIZES the
  * intersection array (one allocation + copy per row) only to take its
  * length. Dedup verification ([[graft.operators.Dedup]]) evaluates this
  * per candidate pair over ~100-element shingle sets — at rehearsal scale
  * that is 250k pairs × 2×~100 strings of wasted copying. This expression
  * builds a hash set over the SMALLER side and probes the larger, returning
  * only the count; `doGenCode` stays inside whole-stage codegen via a
  * static helper call (the standard builtin pattern for loops too complex
  * to inline).
  *
  * Semantics match `size(array_intersect)` on null-free DISTINCT arrays —
  * exactly what `collect_set` produces (SetFunctionsSpec pins the
  * equivalence property-style). Mismatched element multiplicity is not a
  * concern here: both sides are sets by construction.
  */
case class IntersectionSize(left: Expression, right: Expression) extends BinaryExpression {

  private def isStringArray(e: Expression): Boolean =
    !e.resolved || (e.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    })
  require(isStringArray(left), s"intersection_size expects array<string> left, got ${left.dataType}")
  require(isStringArray(right), s"intersection_size expects array<string> right, got ${right.dataType}")

  override def dataType: DataType  = LongType
  override def prettyName: String  = "intersection_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOps.intersectionSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SetOps.intersectionSize($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SetOps {

  /** Hash-probe intersection count: set over the smaller array, probe the
    * larger. Called from generated code — keep the signature JVM-simple.
    */
  def intersectionSize(x: ArrayData, y: ArrayData): Long = {
    val (small, big) = if (x.numElements() <= y.numElements()) (x, y) else (y, x)
    val n            = small.numElements()
    val set          = new java.util.HashSet[UTF8String](Math.max(4, n * 2))
    var i            = 0
    while (i < n) { set.add(small.getUTF8String(i)); i += 1 }
    var cnt = 0L
    val m   = big.numElements()
    var j   = 0
    while (j < m) { if (set.contains(big.getUTF8String(j))) cnt += 1; j += 1 }
    cnt
  }
}
