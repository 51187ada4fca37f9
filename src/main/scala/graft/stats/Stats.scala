package graft.stats

import graft.core.TrajSchema
import graft.features.Kinematic
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-entity descriptive statistics over the kinematic feature vector
  * (ptrail/preprocessing/statistics.py:64-202). The reference runs pandas
  * `describe(percentiles=[.1,.25,.5,.75,.9])` per trajectory in a Pool, then
  * pivots long→wide into the 72 ORDERED_COLS
  * (ptrail/utilities/constants.py:34-43). Here the wide form is ONE
  * shuffle-agg (9 stats × 8 features computed together); the long form is a
  * stack over it — the reference's long→wide pivot is skipped entirely
  * (SURVEY.md §2.6 G3 note).
  *
  * Exact percentiles use Spark's sort-based `percentile`, which matches
  * numpy/pandas linear interpolation; `stddev` is the sample std like pandas.
  */
object Stats {

  val Percentiles: Seq[Double] = Seq(0.10, 0.25, 0.50, 0.75, 0.90)
  val StatNames: Seq[String] = Seq("10%", "25%", "50%", "75%", "90%", "min", "max", "mean", "std")

  private def statsFor(c: String): Seq[Column] = {
    val pcts = percentile(col(c), array(Percentiles.map(lit): _*))
    Seq(pcts.as(s"_p_$c")) ++ Seq(
      min(col(c)).as(s"min_$c"),
      max(col(c)).as(s"max_$c"),
      avg(col(c)).as(s"mean_$c"),
      stddev(col(c)).as(s"std_$c")
    )
  }

  /** G2+G3 fused — one row per (entity[, segment]) with the reference's 72
    * ordered stat columns (`{10,25,50,75,90%} ∪ {min,max,mean,std}` × 8
    * kinematic features). Derives the kinematic chain if absent. */
  def kinematicStatsWide(df: DataFrame, s: TrajSchema, segCol: Option[String] = None): DataFrame = {
    val base =
      if (Kinematic.AllFeatures.forall(df.columns.contains)) df
      else Kinematic.withKinematics(df, s)
    val keys: Seq[Column] = s.idCol +: segCol.map(col).toSeq
    val agged = base.groupBy(keys: _*).agg(
      Kinematic.AllFeatures.flatMap(statsFor).head,
      Kinematic.AllFeatures.flatMap(statsFor).tail: _*
    )
    // explode the percentile arrays into the reference's named columns
    val pctCols = Kinematic.AllFeatures.flatMap { f =>
      Percentiles.zipWithIndex.map { case (p, i) =>
        element_at(col(s"_p_$f"), i + 1).as(s"${(p * 100).toInt}%_$f")
      }
    }
    val keptKeys = (s.id +: segCol.toSeq).map(col)
    val ordered = Kinematic.AllFeatures.flatMap { f =>
      Seq(s"10%_$f", s"25%_$f", s"50%_$f", s"75%_$f", s"90%_$f", s"min_$f", s"max_$f", s"mean_$f", s"std_$f")
    }
    agged
      .select((keptKeys ++ pctCols ++ Kinematic.AllFeatures.flatMap(f =>
        Seq(col(s"min_$f"), col(s"max_$f"), col(s"mean_$f"), col(s"std_$f"))
      )): _*)
      .select((keptKeys ++ ordered.map(col)): _*)
  }

  /** G2 long form — (entity[, seg], feature, stat, value); derived from the
    * wide agg by an unpivot, not by re-aggregating. */
  def kinematicStatsLong(df: DataFrame, s: TrajSchema, segCol: Option[String] = None): DataFrame = {
    val wide = kinematicStatsWide(df, s, segCol)
    val keys = s.id +: segCol.toSeq
    val valueCols = wide.columns.filterNot(keys.contains)
    val stackExpr = valueCols
      .map(c => s"'${c.replace("'", "")}', cast(`$c` as double)")
      .mkString(s"stack(${valueCols.length}, ", ", ", ") as (stat_feature, value)")
    wide.selectExpr(keys.map(k => s"`$k`") :+ stackExpr: _*)
  }
}
