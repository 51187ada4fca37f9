package graft.filters

import graft.core.TrajSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F16 — per-entity Hampel outlier filter (filters.py:672-759; worker
  * preprocessing/helpers.py:351-397). The reference delegates to the
  * `hampel` pypi package (MichaelisTrofficus/hampel_filter, cited at
  * filters.py:700-703) which is not vendored; we pin the documented
  * algorithm and freeze it in golden tests (SURVEY.md §7.4#3):
  *
  *   - centered rolling window of half-width k (default 5 ⇒ 11 rows)
  *   - m = median(window), MAD = median(|x_j − m|)
  *   - row is an outlier iff |x − m| ≥ nSigma · 1.4826 · MAD
  *   - edge rows (incomplete window on either side) are never flagged
  *   - null values: excluded from window stats; null rows never flagged
  *
  * Outlier rows are DROPPED (not imputed), matching the reference
  * (helpers.py:388-391).
  *
  * Execution: the window is a bounded row frame (≤ 2k+1 elements) so
  * `array_sort(collect_list)` + element access is O(w log w) per row with
  * tiny w — and it shares the one entity sort with the kinematic chain. A
  * custom sliding-multiset TypedImperativeAggregate is a perf upgrade path,
  * not a semantics need (SURVEY.md §4.2#3).
  */
object Hampel {

  val MadScale = 1.4826

  /** Flag column variant — appends boolean `_hampel_outlier`.
    *
    * The decision runs through [[HampelOutlierExpr]] — a native codegen'd
    * Catalyst expression (two scratch sorts on a primitive buffer) instead
    * of the 6-step array_sort/transform/element_at chain, which
    * materialized an UnsafeArrayData per step per row (~3× slower measured
    * at sf0.1). Semantics unchanged (same middle-pair medians; the DuckDB
    * oracle still mirrors the declarative formulation). */
  def flagOutliers(df: DataFrame, s: TrajSchema, valueCol: String, k: Int = 5, nSigma: Double = 3.0): DataFrame = {
    require(df.columns.contains(valueCol), s"column $valueCol missing (filters.py raises MissingColumnsException)")
    val frame = s.wRows(-k, k)
    val nBefore = count(lit(1)).over(s.wRows(-k, -1))
    val nAfter = count(lit(1)).over(s.wRows(1, k))
    val arr = collect_list(col(valueCol).cast("double")).over(frame)
    val decide = org.apache.spark.sql.GraftSqlBridge.column(
      HampelOutlierExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(col("_arr")),
        org.apache.spark.sql.GraftSqlBridge.expression(col(valueCol).cast("double")),
        org.apache.spark.sql.GraftSqlBridge.expression(lit(nSigma * MadScale))
      )
    )
    df.withColumn("_arr", arr)
      .withColumn("_full", nBefore === k && nAfter === k)
      .withColumn(
        "_hampel_outlier",
        col("_full") && col(valueCol).isNotNull && coalesce(decide, lit(false))
      )
      .drop("_arr", "_full")
  }

  /** Drop-rows variant, the reference's behavior. */
  def filter(df: DataFrame, s: TrajSchema, valueCol: String, k: Int = 5, nSigma: Double = 3.0): DataFrame =
    flagOutliers(df, s, valueCol, k, nSigma)
      .where(!col("_hampel_outlier"))
      .drop("_hampel_outlier")
}
