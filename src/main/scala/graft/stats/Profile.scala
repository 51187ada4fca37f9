package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column data-quality profile: row count, null count/fraction and
  * distinct cardinality for each requested column — the table-level audit
  * a pipeline runs before AND after every curation stage (null-rate drift
  * and cardinality collapse are the two cheapest detectors of a broken
  * upstream join or a mis-applied filter).
  *
  * Output: one row per column — (col_name, n_rows, n_null, null_frac,
  * n_distinct). Works on any column type (cardinality by equality).
  *
  * Scale shape, by mode:
  *   - `exact = false` (the 100-TB default): ONE single-pass aggregate —
  *     `approx_count_distinct` (HyperLogLog++, `rsd` relative error) is an
  *     ordinary mergeable aggregate, so the whole profile is one map-side-
  *     combined pass with a one-row shuffle, like `dfCounts`.
  *   - `exact = true` (the oracle-checkable mode): Spark plans the
  *     k-distinct aggregate via Expand — the input is replicated k+1 times
  *     before the shuffle. Correct at any scale but k× the scan cost; use
  *     it for verification granularity, not production profiling (same
  *     exact/approx duality as `CorpusStats.qualityGate`).
  *
  * The per-column stats land in ONE result row then unpivot via `stack`
  * (no second aggregation, no join). */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false, rsd: Double = 0.01): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile columns not in the frame: ${missing.mkString(", ")}")
    // names are spliced into a selectExpr stack() — reject the two
    // characters that would corrupt the generated SQL, loudly
    val unsafe = cols.filter(c => c.contains("'") || c.contains("`"))
    require(unsafe.isEmpty,
      s"profile cannot handle quote/backtick column names: ${unsafe.mkString(", ")}")
    val aggs = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"_nd_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c => s"'$c', `_nn_$c`, `_nd_$c`")
      .mkString(s"stack(${cols.size}, ", ", ", ") as (col_name, _nn, n_distinct)")
    row.selectExpr("_n", stackExpr)
      .select(
        col("col_name"),
        col("_n").as("n_rows"),
        (col("_n") - col("_nn")).as("n_null"),
        ((col("_n") - col("_nn")).cast("double") / col("_n").cast("double")).as("null_frac"),
        col("n_distinct"))
  }
}
