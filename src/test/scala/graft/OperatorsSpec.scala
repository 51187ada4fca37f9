package graft

import graft.asof.AsOfJoin
import graft.features.{Kinematic, Temporal}
import graft.filters.{Filters, Hampel}
import graft.interp.Interpolation
import graft.session.Sessionize
import graft.stats.Stats
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("T5 time-of-day bucket bounds are the reference's exact closed/open bounds") {
    val hours = Seq(0, 4, 5, 8, 9, 12, 13, 16, 17, 20, 21, 23)
    val df = hours
      .map(h => ("1", f"2024-01-01 $h%02d:30:00"))
      .toDF("traj_id", "ts_s")
      .selectExpr("traj_id", "cast(ts_s as timestamp) as ts", "0.0 as lat", "0.0 as lon")
    val got = Temporal.withTimeOfDay(df, S).orderBy("ts").select("Time_Of_Day").as[String].collect().toSeq
    assert(got == Seq("Late Night", "Late Night", "Early Morning", "Early Morning", "Morning", "Morning",
      "Noon", "Noon", "Evening", "Evening", "Night", "Night"))
  }

  test("T3/T4 weekend and day names") {
    val df = Seq(("1", "2024-01-06 10:00:00"), ("1", "2024-01-07 10:00:00"), ("1", "2024-01-08 10:00:00"))
      .toDF("traj_id", "ts_s")
      .selectExpr("traj_id", "cast(ts_s as timestamp) as ts", "0.0 as lat", "0.0 as lon")
    val got = Temporal.withTemporals(df, S).orderBy("ts")
      .select("Day_Of_Week", "Weekend").collect().toSeq.map(r => (r.getString(0), r.getBoolean(1)))
    assert(got == Seq(("Saturday", true), ("Sunday", true), ("Monday", false)))
  }

  test("T6 duration in seconds") {
    val d = Temporal.trajDuration(fixture, S).where($"traj_id" === "3").first().getDouble(1)
    assert(d == 360.0)
  }
}

class FiltersSpec extends SparkSpec {

  test("F7/F8 null speed rows are dropped (reference fillna-sentinel law)") {
    val t = Kinematic.withSpeed(fixture, S)
    // first row of each entity has null Speed → dropped by both filters
    assert(Filters.byMaxSpeed(t, S, 1e9).where(col(Kinematic.Speed).isNull).count() == 0)
    assert(Filters.byMinSpeed(t, S, -1e9).where(col(Kinematic.Speed).isNull).count() == 0)
    assert(Filters.byMaxSpeed(t, S, 1e9).count() == fixture.count() - 2)
  }

  test("F13 IQR fence keeps interior points, drops the 21 km jump") {
    val one = fixture.where(col("traj_id") === "1")
    val kept = Filters.outliersByConsecutiveDistance(one, S)
    assert(!kept.select(Kinematic.Distance).collect().map(_.getDouble(0)).exists(_ > 21000))
    assert(kept.count() == 3)
  }

  test("F15 removes short trajectories") {
    assert(Filters.removeShortTrajectories(fixture, S, 4).select("traj_id").distinct().count() == 1)
  }

  test("F16 Hampel drops an injected spike, leaves edges untouched") {
    import spark.implicits._
    val n = 30
    val rows = (0 until n).map { i =>
      val v = if (i == 15) 50.0 else 10.0 + 0.001 * i // spike at interior index
      ("1", f"2024-01-01 00:${i}%02d:00", v, 0.0)
    }
    val df = rows.toDF("traj_id", "ts_s", "lat", "lon")
      .selectExpr("traj_id", "cast(ts_s as timestamp) as ts", "lat", "lon")
    val out = Hampel.filter(df, S, "lat", k = 5, nSigma = 3.0)
    assert(out.count() == n - 1)
    assert(out.where(col("lat") === 50.0).count() == 0)
    // edge rows always survive
    assert(out.where(col("ts") === to_timestamp(lit("2024-01-01 00:00:00"))).count() == 1)
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap sessionizer splits exactly at gaps > threshold and is monotone") {
    val rows = Seq(0, 60, 120, 4000, 4060, 9000).map(s => ("1", s))
    val df = rows.toDF("traj_id", "off")
      .selectExpr("traj_id", "timestamp_micros(cast(off as bigint) * 1000000) as ts", "0.0 as lat", "0.0 as lon")
    val got = Sessionize.byGap(df, S, 1800.0).orderBy("ts").select("session_id").as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 0L, 1L, 1L, 2L))
  }

  test("stay-point detection flags a dwell run") {
    val pts = Seq(
      (0, 39.0, 116.0), (60, 39.1, 116.1), // moving
      (120, 39.1000001, 116.1000001), (180, 39.1000002, 116.1), (240, 39.10000015, 116.1000001), // dwell
      (300, 39.3, 116.3) // moving again
    )
    val df = pts.map { case (s, la, lo) => ("1", s, la, lo) }.toDF("traj_id", "off", "lat", "lon")
      .selectExpr("traj_id", "timestamp_micros(cast(off as bigint) * 1000000) as ts", "lat", "lon")
    val out = Sessionize.byStayPoint(df, S, distM = 100.0, minStopSeconds = 60.0)
    assert(out.where(col("is_stop")).count() == 3)
  }
}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mkProbe(rows: Seq[(String, Int)]) =
    rows.toDF("id", "off").selectExpr("id", "timestamp_micros(cast(off as bigint) * 1000000) as ts")
  private def mkBuild(rows: Seq[(String, Int, Double)]) =
    rows.toDF("id", "off", "v").selectExpr("id", "timestamp_micros(cast(off as bigint) * 1000000) as ts", "v")

  test("backward as-of picks most recent ≤ ts, equal-ts visible, none before → null") {
    val probe = mkProbe(Seq(("a", 5), ("a", 10), ("a", 20), ("b", 1)))
    val build = mkBuild(Seq(("a", 5, 1.0), ("a", 15, 2.0), ("b", 3, 9.0)))
    val got = AsOfJoin.backward(probe, build, "id", "ts", Seq("v"))
      .orderBy("id", "ts").select("v").collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got == Seq(Some(1.0), Some(1.0), Some(2.0), None))
  }

  test("zero temporal leakage: deleting future build rows never changes past results") {
    val probe = mkProbe(Seq(("a", 5), ("a", 10)))
    val build = mkBuild(Seq(("a", 4, 1.0), ("a", 11, 99.0), ("a", 50, 100.0)))
    val full = AsOfJoin.backward(probe, build, "id", "ts", Seq("v")).orderBy("ts").select("v").collect().toSeq
    val trimmed = AsOfJoin.backward(probe, build.where(col("ts") <= to_timestamp(lit("1970-01-01 00:00:10"))), "id", "ts", Seq("v"))
      .orderBy("ts").select("v").collect().toSeq
    assert(full == trimmed)
  }

  test("tolerance nulls out stale matches, null build values still match") {
    val probe = mkProbe(Seq(("a", 100)))
    val build = mkBuild(Seq(("a", 10, 1.0)))
    val got = AsOfJoin.backward(probe, build, "id", "ts", Seq("v"), toleranceSec = 30.0).first()
    assert(got.isNullAt(got.fieldIndex("v")) && got.isNullAt(got.fieldIndex("asof_ts")))
    val buildNull = Seq(("a", 90, null.asInstanceOf[java.lang.Double]), ("a", 10, java.lang.Double.valueOf(7.0)))
      .toDF("id", "off", "v")
      .selectExpr("id", "timestamp_micros(cast(off as bigint) * 1000000) as ts", "cast(v as double) as v")
    val got2 = AsOfJoin.backward(probe, buildNull, "id", "ts", Seq("v")).first()
    assert(!got2.isNullAt(got2.fieldIndex("asof_ts")) && got2.isNullAt(got2.fieldIndex("v")))
  }
}

class InterpolationSpec extends SparkSpec {
  import spark.implicits._

  private val gapDf = Seq(
    ("1", 0, 10.0, 20.0), ("1", 100, 11.0, 21.0), ("1", 1100, 16.0, 26.0), ("1", 1200, 17.0, 27.0), ("1", 1300, 18.0, 28.0)
  ).toDF("traj_id", "off", "lat", "lon")
    .selectExpr("traj_id", "timestamp_micros(cast(off as bigint) * 1000000) as ts", "lat", "lon")

  test("I1 linear inserts one lerped point per gap at t_prev + rate") {
    val out = Interpolation.linear(gapDf, S, 500.0).orderBy("ts")
    assert(out.count() == 6 && out.columns.toSeq == Seq("traj_id", "ts", "lat", "lon"))
    val ins = out.where(col("ts") === timestamp_micros(lit(600000000L))).first()
    // t*=600 in [100,1100]: frac=500/1000 → lat = 11 + (16-11)*0.5
    assert(ins.getDouble(2) == 13.5 && ins.getDouble(3) == 23.5)
  }

  test("I3 kinematic inserts only where previous velocity defined; len grows") {
    val out = Interpolation.kinematic(gapDf, S, 500.0)
    assert(out.count() == 6)
    assert(out.columns.length == 4)
  }

  test("I2 cubic interpolates knots exactly and inserts per gap") {
    val out = Interpolation.cubic(gapDf, S, 500.0).orderBy("ts")
    assert(out.count() == 6)
    // original knots unchanged
    val knot = out.where(col("ts") === timestamp_micros(lit(100000000L))).first()
    assert(knot.getDouble(2) == 11.0)
  }

  test("I4 random walk is deterministic under a fixed seed") {
    val a = Interpolation.randomWalk(gapDf, S, 500.0, seed = 7L).orderBy("ts").collect().toSeq
    val b = Interpolation.randomWalk(gapDf, S, 500.0, seed = 7L).orderBy("ts").collect().toSeq
    assert(a == b && a.length == 6)
  }
}

class StatsSpec extends SparkSpec {

  test("wide stats emit the reference's 72 ordered columns and exact percentiles") {
    val wide = Stats.kinematicStatsWide(fixture, S)
    assert(wide.columns.length == 1 + 72)
    assert(wide.columns(1) == "10%_Distance" && wide.columns.last == "std_Rate_of_bearing_rate")
    // numpy-style linear interpolation on entity 1 Distance values
    val row = wide.where(col("traj_id") === "1").first()
    val d = Seq(13.690153134343692, 7.403787866531697, 0.17039986568227478, 21261.806616992468).sorted
    def np(p: Double): Double = { val h = (d.length - 1) * p; val lo = h.toInt; d(lo) + (h - lo) * (d(math.min(lo + 1, d.length - 1)) - d(lo)) }
    assertClose(Some(row.getDouble(row.fieldIndex("50%_Distance"))), Some(np(0.5)))
    assertClose(Some(row.getDouble(row.fieldIndex("25%_Distance"))), Some(np(0.25)))
  }
}

class CubicSplineSpec extends SparkSpec {
  import graft.interp.CubicSpline

  test("spline reproduces a cubic polynomial exactly (not-a-knot ⇒ degree-3 exact)") {
    def f(x: Double) = 2.0 + 3.0 * x - 0.5 * x * x + 0.25 * x * x * x
    val x = Array(0.0, 1.0, 2.5, 4.0, 5.0, 7.0)
    val y = x.map(f)
    val s = CubicSpline.slopes(x, y)
    Seq(0.3, 1.7, 3.9, 6.2).foreach { t =>
      assertClose(Some(CubicSpline.eval(x, y, s, t)), Some(f(t)), 1e-12)
    }
  }

  test("spline interpolates knots and is C1 at interior knots") {
    val x = Array(0.0, 1.0, 2.0, 3.0, 4.0)
    val y = Array(0.0, 1.0, 0.0, 2.0, -1.0)
    val s = CubicSpline.slopes(x, y)
    x.indices.foreach(i => assertClose(Some(CubicSpline.eval(x, y, s, x(i))), Some(y(i)), 1e-12))
    // derivative continuity: finite-diff from both sides of knot 2
    val e = 1e-7
    val dl = (CubicSpline.eval(x, y, s, 2.0 - e) - CubicSpline.eval(x, y, s, 2.0 - 2 * e)) / e
    val dr = (CubicSpline.eval(x, y, s, 2.0 + 2 * e) - CubicSpline.eval(x, y, s, 2.0 + e)) / e
    assert(math.abs(dl - dr) < 1e-4)
  }
}
