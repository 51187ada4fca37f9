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

  /** Median of an already-sorted array column (nulls excluded upstream by
    * collect_list); even sizes average the middle pair (numpy semantics). */
  private def medianOfSorted(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n = size(arr)
    when(n === 0, lit(null).cast("double"))
      .otherwise(
        (element_at(arr, ((n + 1) / 2).cast("int")) + element_at(arr, (n / 2).cast("int") + 1)) / 2.0
      )
  }

  /** Flag column variant — appends boolean `_hampel_outlier`. */
  def flagOutliers(df: DataFrame, s: TrajSchema, valueCol: String, k: Int = 5, nSigma: Double = 3.0): DataFrame = {
    require(df.columns.contains(valueCol), s"column $valueCol missing (filters.py raises MissingColumnsException)")
    val frame = s.wRows(-k, k)
    val nBefore = count(lit(1)).over(s.wRows(-k, -1))
    val nAfter = count(lit(1)).over(s.wRows(1, k))
    val arr = array_sort(collect_list(col(valueCol).cast("double")).over(frame))
    val withMed = df
      .withColumn("_arr", arr)
      .withColumn("_full", nBefore === k && nAfter === k)
      .withColumn("_med", medianOfSorted(col("_arr")))
    val devs = array_sort(transform(col("_arr"), x => abs(x - col("_med"))))
    withMed
      .withColumn("_mad", medianOfSorted(devs))
      .withColumn(
        "_hampel_outlier",
        col("_full") && col(valueCol).isNotNull &&
          abs(col(valueCol) - col("_med")) >= col("_mad") * (nSigma * MadScale)
      )
      .drop("_arr", "_full", "_med", "_mad")
  }

  /** Drop-rows variant, the reference's behavior. */
  def filter(df: DataFrame, s: TrajSchema, valueCol: String, k: Int = 5, nSigma: Double = 3.0): DataFrame =
    flagOutliers(df, s, valueCol, k, nSigma)
      .where(!col("_hampel_outlier"))
      .drop("_hampel_outlier")
}
