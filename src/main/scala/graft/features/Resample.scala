package graft.features

import graft.core.{Times, TrajSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-frequency downsampling: one output row per (entity, time bin) —
  * the trajectory-compaction step before modeling or storage when raw
  * pings arrive faster than the feature cadence needs (the reference's
  * users reach the same effect through pandas `resample` on the datetime
  * index; here it is a single declarative aggregate).
  *
  * Output per bin: `bin_ts` (bin START, epoch-aligned: ts − ts mod bin),
  * `n_points`, `first_lat`/`first_lon`/`last_lat`/`last_lon` (by the full
  * deterministic per-entity ordering — min_by/max_by over a (micros,
  * orderCols…) struct, so ties are impossible when the schema's ordering
  * is total), and `lat_mean`/`lon_mean` (centroid of the bin).
  *
  * Laws: bins are left-closed right-open [k·bin, (k+1)·bin); the bin key
  * is computed in exact long arithmetic (`m − pmod(m, binMicros)` — no
  * double division, so no boundary drift at epoch magnitudes); empty bins
  * simply don't appear (no row synthesis — [[graft.interp.Interpolation]]
  * is the densifying tool).
  *
  * Scale shape: ONE hash aggregate on (entity, bin) — partial map-side
  * combine makes the shuffle carry one row per (entity, bin) per input
  * partition, not per ping (min_by/max_by/avg are all declarative
  * aggregates); the downsample RATIO is the shuffle compression. No
  * window, no sort, no skew exposure beyond the aggregate's own hash
  * (a whale entity still splits across bins). */
object Resample {

  def downsample(df: DataFrame, s: TrajSchema, binSec: Double): DataFrame = {
    require(binSec > 0, s"resample bin must be positive, got $binSec")
    val binMicros = (binSec * 1e6).toLong
    val m = Times.micros(s.tsCol)
    val binTs = Times.fromMicros(m - pmod(m, lit(binMicros)), df.schema(s.ts).dataType)
    val ordKey = struct(m.as("_m") +: s.orderCols.map(col): _*)
    val point = struct(s.latCol.as("lat"), s.lonCol.as("lon"))
    df.groupBy(s.idCol, binTs.as("bin_ts"))
      .agg(
        count(lit(1)).as("n_points"),
        min_by(point, ordKey).as("_first"),
        max_by(point, ordKey).as("_last"),
        avg(s.latCol).as("_lat_mean"),
        avg(s.lonCol).as("_lon_mean"))
      .select(s.idCol, col("bin_ts"), col("n_points"),
        col("_first.lat").as("first_lat"), col("_first.lon").as("first_lon"),
        col("_last.lat").as("last_lat"), col("_last.lon").as("last_lon"),
        col("_lat_mean").as("lat_mean"), col("_lon_mean").as("lon_mean"))
  }
}
