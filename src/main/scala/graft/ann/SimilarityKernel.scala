package graft.ann

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** JVM kernels for embedding math. Fold order matches the declarative
  * formulation exactly (((0 + a₀·b₀) + a₁·b₁) + …, floats widened to double
  * per element) so results are bit-identical to the zip_with/aggregate
  * chain AND to the DuckDB oracle's list_reduce. */
object SimilarityKernel {
  /** Any null element? (zip_with's fold null-poisons; the kernel must too.) */
  def hasNull(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s = s + a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s = s + a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** `dot(a, b)` over array<float>/array<double> as a native codegen'd
  * expression — replaces zip_with + aggregate (interpreted lambda per
  * element, an UnsafeArrayData materialized per row). Null on length
  * mismatch (zip_with's null-pad + null-poisoned fold semantics). */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall { e =>
      e.dataType.isInstanceOf[ArrayType] &&
        (elemType(e) == FloatType || elemType(e) == DoubleType)
    } && elemType(left) == elemType(right)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot expects two arrays of the same float/double element type, got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def kernel: String =
    if (elemType(left) == FloatType) "dotF" else "dotD"

  // null-element scan only when the schema admits nulls (cheap flag check)
  private def mayHaveNulls: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else if (mayHaveNulls && (SimilarityKernel.hasNull(aa) || SimilarityKernel.hasNull(bb))) null
    else if (elemType(left) == FloatType) SimilarityKernel.dotF(aa, bb)
    else SimilarityKernel.dotD(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nullScan =
      if (mayHaveNulls)
        (a: String, b: String) =>
          s" || graft.ann.SimilarityKernel.hasNull($a) || graft.ann.SimilarityKernel.hasNull($b)"
      else (_: String, _: String) => ""
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()${nullScan(a, b)}) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.ann.SimilarityKernel.$kernel($a, $b);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
