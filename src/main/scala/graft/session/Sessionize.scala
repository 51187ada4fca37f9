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
    * (segments pinned to traj max date); this method implements the
    * documented intent, [[byDaysOverlapping]] the observed behavior. */
  def byDays(df: DataFrame, s: TrajSchema, numDays: Int): DataFrame = {
    val d0 = min(to_date(s.tsCol)).over(s.wAll)
    df.withColumn("seg_id", floor(datediff(to_date(s.tsCol), d0) / numDays))
  }

  /** G1 exact-match mode — byte-faithful reproduction of the reference
    * worker's OBSERVED behavior (helpers.py:404-477), overlapping suffixes
    * included: for each entity with span Δ = t_max − t_min, it emits
    * K = ⌊(Δ−1)/D⌋ segments (D = numDays in micros; zero segments when the
    * span fits in one window — the `while t_2 < t_max` gate); segment s
    * (1-based) contains EVERY row whose Date ≥ date(t_min + (s−1)·D) (the
    * end bound is pinned to the entity's max, so rows are duplicated across
    * all suffixes that cover them). Set-based plan: per-entity span agg →
    * explode the segment index → range join back on the date bound. */
  def byDaysOverlapping(df: DataFrame, s: TrajSchema, numDays: Int): DataFrame = {
    val dMicros = numDays.toLong * 86400L * 1000000L
    val spans = df
      .groupBy(s.idCol)
      .agg(
        min(graft.core.Times.micros(s.tsCol)).as("_tmin"),
        max(graft.core.Times.micros(s.tsCol)).as("_tmax")
      )
      .withColumn("_K", greatest(expr(s"(_tmax - _tmin - 1) div $dMicros"), lit(0L)))
      .where(col("_K") >= 1L)
      .select(s.idCol, explode(sequence(lit(1L), col("_K"))).as("seg_id"), col("_tmin"))
      .withColumn("_seg_start", to_date(timestamp_micros(col("_tmin") + (col("seg_id") - 1L) * dMicros)))
      .drop("_tmin")
    df.withColumn("_d", to_date(s.tsCol))
      .join(spans, Seq(s.id))
      .where(col("_d") >= col("_seg_start"))
      .drop("_d", "_seg_start")
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
