package graft.session

import graft.core.TrajSchema
import graft.kernels.Geo
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization / segmentation (ptrail/preprocessing/statistics.py:29-62 +
  * the north rule's gap-based sessionizer). All variants are a window cumsum
  * of boundary flags — one exchange, Tungsten codegen, no RDD.
  */
object Sessionize {

  /** Gap-based sessions: a new session starts when the time since the
    * previous observation exceeds `gapSeconds`. `session_id` is 0-based and
    * dense per entity. Pure cumulative-sum window (north rule: "gap-based
    * window boundaries compiled to Tungsten codegen"). */
  def byGap(df: DataFrame, s: TrajSchema, gapSeconds: Double): DataFrame = {
    val dtMicros = graft.core.Times.micros(s.tsCol) - lag(graft.core.Times.micros(s.tsCol), 1).over(s.w)
    val boundary = when(dtMicros > (gapSeconds * 1e6).toLong, 1L).otherwise(0L)
    df.withColumn(
      "session_id",
      sum(boundary).over(s.wRows(Window.unboundedPreceding, Window.currentRow))
    )
  }

  /** Stay-point / stop sessions: a point is "moving" when it is more than
    * `distM` metres from the previous point OR faster than `speedMs`; a stop
    * segment is a maximal run of non-moving points. `stop_id` increments on
    * each transition into a stop. Complements [[byGap]] for the north rule's
    * stay-point sessionization. */
  def byStayPoint(df: DataFrame, s: TrajSchema, distM: Double, minStopSeconds: Double = 0.0): DataFrame = {
    val d = Geo.haversine(lag(s.latCol, 1).over(s.w), lag(s.lonCol, 1).over(s.w), s.latCol, s.lonCol)
    val moving = coalesce(d > distM, lit(true)) // first row of entity counts as movement
    val cum = s.wRows(Window.unboundedPreceding, Window.currentRow)
    val base = df
      .withColumn("_moving", moving)
      .withColumn("_boundary", when(col("_moving") =!= coalesce(lag(col("_moving"), 1).over(s.w), !col("_moving")), 1L).otherwise(0L))
      .withColumn("_run_id", sum(col("_boundary")).over(cum))
    // a stop qualifies only if its run lasts ≥ minStopSeconds
    val runW = Window.partitionBy(s.idCol, col("_run_id"))
    base
      .withColumn(
        "_run_sec",
        (max(graft.core.Times.micros(s.tsCol)).over(runW) - min(graft.core.Times.micros(s.tsCol)).over(runW)).cast("double") / 1e6
      )
      .withColumn("is_stop", !col("_moving") && col("_run_sec") >= minStopSeconds)
      .withColumn("stop_run_id", col("_run_id"))
      .drop("_moving", "_boundary", "_run_id", "_run_sec")
  }

  /** G1 faithful-intent mode — segment each entity into windows of `numDays`
    * days starting at its first date: `seg_id = floor(datediff(date, d0) /
    * numDays)` (statistics.py:29-62). The reference worker's
    * overlapping-suffix behavior (helpers.py:437-459) is a latent bug
    * (segments pinned to traj max date); we implement the documented intent
    * and note the deviation. */
  def byDays(df: DataFrame, s: TrajSchema, numDays: Int): DataFrame = {
    val d0 = min(to_date(s.tsCol)).over(s.wAll)
    df.withColumn("seg_id", floor(datediff(to_date(s.tsCol), d0) / numDays))
  }

  /** Per-session summary — bounds, duration, point count, distance sum. */
  def sessionStats(df: DataFrame, s: TrajSchema, sessionCol: String = "session_id"): DataFrame =
    df.groupBy(s.idCol, col(sessionCol))
      .agg(
        count(lit(1)).as("n_points"),
        min(s.tsCol).as("session_start"),
        max(s.tsCol).as("session_end"),
        ((max(graft.core.Times.micros(s.tsCol)) - min(graft.core.Times.micros(s.tsCol))).cast("double") / 1e6).as("duration_sec")
      )
}
