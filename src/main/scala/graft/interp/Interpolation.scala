package graft.interp

import graft.core.TrajSchema
import graft.features.Kinematic
import graft.kernels.Geo
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Interpolation backfill (ptrail/preprocessing/interpolation.py:31-131 +
  * preprocessing/helpers.py:43-348).
  *
  * Shared gap rule (all modes): for each consecutive pair with
  * Δt[j] = t[j] − t[j−1] > samplingRate, insert ONE point at
  * t[j−1] + samplingRate (single pass — max gap ≤ rate is NOT guaranteed,
  * interpolation.py:50-57). Output keeps only the 4 mandatory columns
  * (interpolation.py:43-48).
  *
  * Execution: the reference nests Process-per-chunk × Pool-per-trajectory
  * with O(n) `df.loc` inserts (SURVEY.md §3.3); here each mode is lag/lead
  * window math → a filtered projection of inserted rows → `unionByName` —
  * one shuffle, whole-stage codegen, no per-row driver loops. Cubic is the
  * one whole-series op (scipy not-a-knot spline) and uses typed
  * `groupByKey.flatMapGroups` (SURVEY.md §4.2#4).
  */
object Interpolation {

  private def mandatory(df: DataFrame, s: TrajSchema): DataFrame =
    df.select(s.idCol, s.tsCol, s.latCol, s.lonCol)

  private def dtSec(s: TrajSchema): Column =
    (graft.core.Times.micros(s.tsCol) - lag(graft.core.Times.micros(s.tsCol), 1).over(s.w)).cast("double") / 1e6

  /** Insert timestamp t[j−1]+rate, cast back to the input ts flavor
    * (TIMESTAMP vs TIMESTAMP_NTZ) so the union stays well-typed. */
  private def newTs(df: DataFrame, s: TrajSchema, rate: Double): Column =
    graft.core.Times.fromMicros(
      lag(graft.core.Times.micros(s.tsCol), 1).over(s.w) + (rate * 1e6).toLong,
      df.schema(s.ts).dataType
    )

  /** I1 — linear (helpers.py:43-102): the np.interp value at
    * t* = t[j−1] + rate equals the lerp between the bracketing points. */
  def linear(df: DataFrame, s: TrajSchema, rate: Double): DataFrame = {
    val dt = dtSec(s)
    val frac = lit(rate) / dt
    val inserted = df
      .withColumn("_dt", dt)
      .withColumn("_new_ts", newTs(df, s, rate))
      .withColumn("_lat", lag(s.latCol, 1).over(s.w) + (s.latCol - lag(s.latCol, 1).over(s.w)) * frac)
      .withColumn("_lon", lag(s.lonCol, 1).over(s.w) + (s.lonCol - lag(s.lonCol, 1).over(s.w)) * frac)
      .where(col("_dt") > rate)
      .select(s.idCol, col("_new_ts").as(s.ts), col("_lat").as(s.lat), col("_lon").as(s.lon))
    mandatory(df, s).unionByName(inserted)
  }

  /** I3 — kinematic (helpers.py:276-348, Nogueira 2016): closed-form Cramer
    * solve of the 2×2 accel/jerk system from neighbor velocities; position
    * poly `x1 + v1·t + b·t²/2 + c·t³/6` evaluated at the reference's exact
    * `t = epoch_seconds(new_time)/1e10` quirk (helpers.py:339 — replicated
    * deliberately; documented reference bug, SURVEY.md §7.4#2). Requires a
    * defined previous velocity (gap index ≥ 2). */
  def kinematic(df: DataFrame, s: TrajSchema, rate: Double): DataFrame = {
    val dt = dtSec(s)
    def vel(c: Column): Column = (c - lag(c, 1).over(s.w)) / dt
    val base = df
      .withColumn("_dt", dt)
      .withColumn("_v_lat", vel(s.latCol))
      .withColumn("_v_lon", vel(s.lonCol))
    val s2 = s
    val prevVLat = lag(col("_v_lat"), 1).over(s2.w)
    val prevVLon = lag(col("_v_lon"), 1).over(s2.w)
    val prevLat = lag(s.latCol, 1).over(s2.w)
    val prevLon = lag(s.lonCol, 1).over(s2.w)
    // A = [[dt²/2, dt³/6], [dt, dt²/2]]; det = dt⁴/12
    val a11 = col("_dt") * col("_dt") / 2.0
    val a12 = col("_dt") * col("_dt") * col("_dt") / 6.0
    val a21 = col("_dt")
    val det = a11 * a11 - a12 * a21
    def coefs(x: Column, v1: Column, vi: Column, x1: Column): (Column, Column) = {
      val b1 = x - x1 - v1 * col("_dt")
      val b2 = vi - v1
      ((b1 * a11 - b2 * a12) / det, (a11 * b2 - a21 * b1) / det)
    }
    val (bLat, cLat) = coefs(s.latCol, prevVLat, col("_v_lat"), prevLat)
    val (bLon, cLon) = coefs(s.lonCol, prevVLon, col("_v_lon"), prevLon)
    val td = (lag(graft.core.Times.micros(s.tsCol), 1).over(s2.w) + (rate * 1e6).toLong).cast("double") / 1e6 / 1e10
    def pos(x1: Column, v1: Column, b: Column, c: Column): Column =
      x1 + v1 * td + td * td * b / 2.0 + td * td * td * c / 6.0
    val inserted = base
      .withColumn("_new_ts", newTs(df, s2, rate))
      .withColumn("_pv_lat", prevVLat)
      .withColumn("_ip_lat", pos(prevLat, prevVLat, bLat, cLat))
      .withColumn("_ip_lon", pos(prevLon, prevVLon, bLon, cLon))
      .where(col("_dt") > rate && col("_pv_lat").isNotNull)
      .select(s.idCol, col("_new_ts").as(s.ts), col("_ip_lat").as(s.lat), col("_ip_lon").as(s.lon))
    mandatory(df, s).unionByName(inserted)
  }

  /** I4 — random walk (helpers.py:170-274, Etemad 2020): ONE
    * (distance, bearing) draw per entity from N(mean, std) of its step
    * distances/bearings, offsetting every pre-gap point. DETERMINISTIC
    * DEVIATION: np.random.normal is replaced by a seeded Box–Muller draw
    * keyed on ENGINE-PORTABLE integer hashes of the entity id
    * (graft.functions.TextHash poly/affine family, not Spark-internal
    * xxhash64) so results are reproducible across retries/partitions AND
    * bit-recomputable by the DuckDB oracle (SURVEY.md §7.3). Entities with
    * ≤ 3 points are left untouched (helpers.py:263). */
  def randomWalk(df: DataFrame, s: TrajSchema, rate: Double, seed: Long = 42L): DataFrame = {
    val withFeat = Kinematic.withBearing(Kinematic.withDistance(df, s), s)
    val P = graft.functions.TextHash.P
    // base entity hash folded with the seed, then one affine draw per salt;
    // (h + 0.5) / P is strictly inside (0, 1) — no clamping needed
    val base = (graft.functions.TextHash.polyHash(s.idCol.cast("string")) + lit(seed % P) + P) % P
    def unif(salt: Int): Column =
      (graft.functions.TextHash.affine(base, salt) + 0.5) / 2147483647.0
    val z1 = sqrt(lit(-2.0) * log(unif(1))) * cos(lit(2.0 * math.Pi) * unif(2))
    val z2 = sqrt(lit(-2.0) * log(unif(3))) * cos(lit(2.0 * math.Pi) * unif(4))
    val stats = s.wAll
    val dMean = avg(col(Kinematic.Distance)).over(stats)
    val dStd = stddev(col(Kinematic.Distance)).over(stats)
    val bMean = avg(col(Kinematic.Bearing)).over(stats)
    val bStd = stddev(col(Kinematic.Bearing)).over(stats)
    val n = count(lit(1)).over(stats)
    val calcA = (dMean + dStd * z1) / 1000.0
    val calcB = radians(bMean + bStd * z2)
    val dy = calcA * cos(calcB)
    val dx = calcA * sin(calcB)
    val prevLat = lag(s.latCol, 1).over(s.w)
    val prevLon = lag(s.lonCol, 1).over(s.w)
    val inserted = withFeat
      .withColumn("_dt", dtSec(s))
      .withColumn("_new_ts", newTs(df, s, rate))
      .withColumn("_n", n)
      .withColumn("_lat", prevLat + (dy / 6371.0) * (180.0 / math.Pi))
      .withColumn(
        "_lon",
        prevLon + (dx / 6371.0) * (180.0 / math.Pi) / cos(prevLat * (math.Pi / 180.0))
      )
      .where(col("_dt") > rate && col("_n") > 3)
      .select(s.idCol, col("_new_ts").as(s.ts), col("_lat").as(s.lat), col("_lon").as(s.lon))
    mandatory(df, s).unionByName(inserted)
  }

  /** I2 — cubic spline (helpers.py:104-168): scipy `CubicSpline`
    * (bc_type='not-a-knot') over the entity's whole deduped
    * strictly-increasing time series, evaluated at t[j−1]+rate per gap;
    * entities with ≤ 3 points skipped. Whole-series dependency ⇒ typed
    * `groupByKey.flatMapGroups` (Dataset API; SURVEY.md §4.2#4). Spline math
    * in [[CubicSpline]]. */
  def cubic(df: DataFrame, s: TrajSchema, rate: Double): DataFrame = {
    val spark = df.sparkSession
    val rows = mandatory(df, s)
      .select(
        s.idCol.as("traj_id"),
        graft.core.Times.micros(s.tsCol).as("ts_us"),
        s.latCol.as("lat"),
        s.lonCol.as("lon")
      )
      .as(Encoders.product[CubicRow])
    val out: Dataset[CubicRow] = rows
      .groupByKey(_.traj_id)(Encoders.STRING)
      .flatMapGroups { (id: String, it: Iterator[CubicRow]) =>
        CubicSpline.interpolateEntity(id, it.toArray, rate)
      }(Encoders.product[CubicRow])
    out.select(
      col("traj_id").as(s.id),
      graft.core.Times.fromMicros(col("ts_us"), df.schema(s.ts).dataType).as(s.ts),
      col("lat").as(s.lat),
      col("lon").as(s.lon)
    )
  }
}

case class CubicRow(traj_id: String, ts_us: Long, lat: Double, lon: Double)

/** Not-a-knot cubic spline, matching scipy.interpolate.CubicSpline: solve
  * for slopes via a tridiagonal system (Thomas algorithm) with not-a-knot
  * boundary rows; n==3 degenerates to the parabola through the points,
  * n==2 to linear — though the caller gates on n > 3 like the reference. */
object CubicSpline {

  /** Solve for slopes s_i of the interpolating spline.
    * Interior row i: dx[i]·s[i−1] + 2(dx[i−1]+dx[i])·s[i] + dx[i−1]·s[i+1]
    *   = 3(dx[i]·m[i−1] + dx[i−1]·m[i]),  m = slopes of secants.
    * Not-a-knot boundaries per scipy _cubic.py. */
  def slopes(x: Array[Double], y: Array[Double]): Array[Double] = {
    val n = x.length
    require(n >= 3, "not-a-knot needs n >= 3")
    val dx = Array.tabulate(n - 1)(i => x(i + 1) - x(i))
    val m = Array.tabulate(n - 1)(i => (y(i + 1) - y(i)) / dx(i))
    if (n == 3) {
      // single parabola through the 3 points (scipy special case)
      // p(t) = y0 + b(t-x0) + c(t-x0)^2 ; slopes = derivative at knots
      val c = (m(1) - m(0)) / (dx(0) + dx(1))
      val b = m(0) - c * dx(0)
      return Array(b, b + 2 * c * dx(0), b + 2 * c * (dx(0) + dx(1)))
    }
    // tridiagonal (sub, diag, sup) and rhs
    val sub = new Array[Double](n)
    val diag = new Array[Double](n)
    val sup = new Array[Double](n)
    val rhs = new Array[Double](n)
    var i = 1
    while (i < n - 1) {
      sub(i) = dx(i)
      diag(i) = 2.0 * (dx(i - 1) + dx(i))
      sup(i) = dx(i - 1)
      rhs(i) = 3.0 * (dx(i) * m(i - 1) + dx(i - 1) * m(i))
      i += 1
    }
    val d0 = x(2) - x(0)
    diag(0) = dx(1)
    sup(0) = d0
    rhs(0) = ((dx(0) + 2 * d0) * dx(1) * m(0) + dx(0) * dx(0) * m(1)) / d0
    val dn = x(n - 1) - x(n - 3)
    diag(n - 1) = dx(n - 3)
    sub(n - 1) = dn
    rhs(n - 1) = (dx(n - 2) * dx(n - 2) * m(n - 3) + (2 * dn + dx(n - 2)) * dx(n - 3) * m(n - 2)) / dn
    thomas(sub, diag, sup, rhs)
  }

  /** Thomas algorithm for a tridiagonal system (in-place on copies). */
  private def thomas(sub: Array[Double], diag: Array[Double], sup: Array[Double], rhs: Array[Double]): Array[Double] = {
    val n = diag.length
    val c = sup.clone(); val d = rhs.clone(); val b = diag.clone()
    var i = 1
    while (i < n) {
      val w = sub(i) / b(i - 1)
      b(i) = b(i) - w * c(i - 1)
      d(i) = d(i) - w * d(i - 1)
      i += 1
    }
    val out = new Array[Double](n)
    out(n - 1) = d(n - 1) / b(n - 1)
    i = n - 2
    while (i >= 0) {
      out(i) = (d(i) - c(i) * out(i + 1)) / b(i)
      i -= 1
    }
    out
  }

  /** Evaluate the Hermite form of segment i at t ∈ [x_i, x_{i+1}]. */
  def eval(x: Array[Double], y: Array[Double], s: Array[Double], t: Double): Double = {
    var i = java.util.Arrays.binarySearch(x, t)
    if (i >= 0) return y(i)
    i = -i - 2
    if (i < 0) i = 0
    if (i > x.length - 2) i = x.length - 2
    val h = x(i + 1) - x(i)
    val d = (y(i + 1) - y(i)) / h
    val u = t - x(i)
    val c2 = (3 * d - 2 * s(i) - s(i + 1)) / h
    val c3 = (s(i) + s(i + 1) - 2 * d) / (h * h)
    y(i) + s(i) * u + c2 * u * u + c3 * u * u * u
  }

  /** Per-entity driver: sort, find gaps on the ORIGINAL series, spline on the
    * deduped strictly-increasing series (helpers.py:141-147), insert one
    * point per gap. */
  def interpolateEntity(id: String, rowsIn: Array[CubicRow], rate: Double): Iterator[CubicRow] = {
    val rows = rowsIn.sortBy(_.ts_us)
    if (rows.length <= 3) return rows.iterator
    // dedup times keep-first
    val dedup = scala.collection.mutable.ArrayBuffer.empty[CubicRow]
    var lastTs = Long.MinValue
    rows.foreach { r => if (r.ts_us != lastTs) { dedup += r; lastTs = r.ts_us } }
    if (dedup.length < 3) return rows.iterator
    val x = dedup.map(_.ts_us.toDouble / 1e6).toArray
    val yLat = dedup.map(_.lat).toArray
    val yLon = dedup.map(_.lon).toArray
    val sLat = slopes(x, yLat)
    val sLon = slopes(x, yLon)
    val inserted = scala.collection.mutable.ArrayBuffer.empty[CubicRow]
    var j = 1
    while (j < rows.length) {
      val dt = (rows(j).ts_us - rows(j - 1).ts_us).toDouble / 1e6
      if (dt > rate) {
        val tNew = rows(j - 1).ts_us + (rate * 1e6).toLong
        val tSec = tNew.toDouble / 1e6
        inserted += CubicRow(id, tNew, eval(x, yLat, sLat, tSec), eval(x, yLon, sLon, tSec))
      }
      j += 1
    }
    (rows ++ inserted).iterator
  }
}
