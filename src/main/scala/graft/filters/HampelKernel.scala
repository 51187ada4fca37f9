package graft.filters

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType}

/** JVM kernel for the Hampel decision: one scratch sort for the median, an
  * in-place transform to absolute deviations, one more sort for the MAD —
  * no per-row UnsafeArrayData materialization, no interpreted lambdas.
  * Median of a sorted run = mean of the two middle elements (numpy
  * semantics; same elements the expression formulation picked). */
object HampelKernel {
  def isOutlier(arr: ArrayData, value: Double, factor: Double): Boolean = {
    val n = arr.numElements()
    if (n == 0) return false
    val buf = arr.toDoubleArray()
    java.util.Arrays.sort(buf) // Arrays.sort = NaN-last, like Spark's array_sort on doubles
    val med = (buf((n - 1) / 2) + buf(n / 2)) / 2.0
    var i = 0
    while (i < n) { buf(i) = math.abs(buf(i) - med); i += 1 }
    java.util.Arrays.sort(buf)
    val mad = (buf((n - 1) / 2) + buf(n / 2)) / 2.0
    // Spark's SQL double comparison is nan-safe with NaN greatest — a NaN
    // deviation (NaN value or NaN median) compares >= any threshold, so the
    // row IS flagged, matching the declarative chain this kernel replaced
    // (Java's `NaN >= x` being false would silently keep such rows).
    val dev = math.abs(value - med)
    val thr = mad * factor
    if (dev.isNaN) true else if (thr.isNaN) false else dev >= thr
  }
}

/** `hampel_outlier(window_values, value, nSigma·1.4826)` — a native Catalyst
  * expression WITH whole-stage codegen (`doGenCode` emits a direct static
  * call), replacing the 6-expression chain
  * array_sort → element_at×2 → transform(abs) → array_sort → element_at×2
  * that dominated F16's profile (each step materialized an UnsafeArrayData
  * per row). Null semantics: null inputs → null (wrapped in coalesce by the
  * caller); empty window → false. */
case class HampelOutlierExpr(arr: Expression, value: Expression, factor: Expression)
    extends TernaryExpression {

  override def first: Expression = arr
  override def second: Expression = value
  override def third: Expression = factor

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = arr.dataType.isInstanceOf[ArrayType] &&
      arr.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
      value.dataType == DoubleType && factor.dataType == DoubleType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hampel_outlier expects (array<double>, double, double), got " +
        s"(${arr.dataType}, ${value.dataType}, ${factor.dataType})")
  }
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(a: Any, v: Any, f: Any): Any =
    HampelKernel.isOutlier(a.asInstanceOf[ArrayData], v.asInstanceOf[Double], f.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, v, f) => s"graft.filters.HampelKernel.isOutlier($a, $v, $f)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HampelOutlierExpr =
    copy(arr = newFirst, value = newSecond, factor = newThird)
}
