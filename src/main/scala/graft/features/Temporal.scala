package graft.features

import graft.core.TrajSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal scalar features (ptrail/features/temporal_features.py) — all
  * stateless column expressions: zero shuffle, pure whole-stage codegen.
  */
object Temporal {

  /** T1 — calendar date (temporal_features.py:32-55). */
  def withDate(df: DataFrame, s: TrajSchema): DataFrame =
    df.withColumn("Date", to_date(s.tsCol))

  /** T2 — time of day. Spark has no TimeType; "HH:mm:ss" string stands in
    * for the reference's datetime.time objects (temporal_features.py:57-80). */
  def withTime(df: DataFrame, s: TrajSchema): DataFrame =
    df.withColumn("Time", date_format(s.tsCol, "HH:mm:ss"))

  /** T3 — English day name (temporal_features.py:82-105). */
  def withDayOfWeek(df: DataFrame, s: TrajSchema): DataFrame =
    df.withColumn("Day_Of_Week", date_format(s.tsCol, "EEEE"))

  /** T4 — weekend indicator, Saturday∨Sunday (temporal_features.py:107-159,
    * constants.py:16). dayofweek: 1=Sunday, 7=Saturday. */
  def withWeekend(df: DataFrame, s: TrajSchema): DataFrame =
    df.withColumn("Weekend", dayofweek(s.tsCol).isin(1, 7))

  /** T5 — time-of-day bucket with the reference's exact closed/open bounds
    * (temporal_features.py:188-198, constants.py:18-25):
    * [0,4] Late Night, (4,8] Early Morning, (8,12] Morning, (12,16] Noon,
    * (16,20] Evening, (20,24] Night. */
  def withTimeOfDay(df: DataFrame, s: TrajSchema): DataFrame = {
    val h = hour(s.tsCol)
    df.withColumn(
      "Time_Of_Day",
      when(h <= 4, "Late Night")
        .when(h <= 8, "Early Morning")
        .when(h <= 12, "Morning")
        .when(h <= 16, "Noon")
        .when(h <= 20, "Evening")
        .otherwise("Night")
    )
  }

  /** T6 — per-entity duration max(ts)−min(ts), reported in fractional
    * seconds (the reference returns pandas Timedelta,
    * temporal_features.py:201-244). */
  def trajDuration(df: DataFrame, s: TrajSchema): DataFrame =
    df.groupBy(s.idCol)
      .agg(((max(graft.core.Times.micros(s.tsCol)) - min(graft.core.Times.micros(s.tsCol))).cast("double") / 1e6).as("duration_sec"))

  /** T7 — per-entity start/end timestamps (temporal_features.py:246-348). */
  def startEndTimes(df: DataFrame, s: TrajSchema): DataFrame =
    df.groupBy(s.idCol).agg(min(s.tsCol).as("start_time"), max(s.tsCol).as("end_time"))

  /** T8 — fused T1..T5 (temporal_features.py:350-370): one projection. */
  def withTemporals(df: DataFrame, s: TrajSchema): DataFrame =
    withTimeOfDay(withWeekend(withDayOfWeek(withTime(withDate(df, s), s), s), s), s)
}
