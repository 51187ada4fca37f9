package graft.kernels

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic scalar kernels as pure Column expressions (whole-stage codegen;
  * no UDFs). Formulas match the reference exactly:
  * ptrail/utilities/DistanceCalculator.py:17-75, RADIUS_OF_EARTH=6371 km
  * (ptrail/utilities/constants.py:27).
  */
object Geo {

  val EarthRadiusMeters: Double = 6371.0 * 1000.0

  /** Great-circle (haversine) distance in metres.
    * `d = 2·atan2(√a, √(1−a)) · R` with
    * `a = sin²(Δφ/2) + cos φ1 · cos φ2 · sin²(Δλ/2)`
    * (DistanceCalculator.py:36-42 — note the atan2 form, not asin). */
  def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val p1 = radians(lat1); val p2 = radians(lat2)
    val sdLat = sin((radians(lat2) - radians(lat1)) / 2.0)
    val sdLon = sin((radians(lon2) - radians(lon1)) / 2.0)
    val a = sdLat * sdLat + cos(p1) * cos(p2) * sdLon * sdLon
    lit(2.0) * atan2(sqrt(a), sqrt(lit(1.0) - a)) * EarthRadiusMeters
  }

  /** Initial bearing p1→p2 in degrees in [0, 360).
    * `atan2(cos φ2 sin Δλ, cos φ1 sin φ2 − sin φ1 cos φ2 cos Δλ)` then
    * floored-mod 360 (numpy `% 360.0` ⇒ sign of divisor ⇒ Spark pmod)
    * (DistanceCalculator.py:66-75). */
  def bearing(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val p1 = radians(lat1); val p2 = radians(lat2)
    val dLon = radians(lon2) - radians(lon1)
    val y = cos(p2) * sin(dLon)
    val x = cos(p1) * sin(p2) - sin(p1) * cos(p2) * cos(dLon)
    pmod(degrees(atan2(y, x)), lit(360.0))
  }

  /** Driver-side bounding box for a radius around a point:
    * Δlat = r/R, Δlon = asin(sin Δlat / cos lat)
    * (ptrail/preprocessing/filters.py:86-125; golden vector in
    * ptrail/preprocessing/tests/filters_test.py:42-45). Returns
    * (latMin, lonMin, latMax, lonMax); r in metres. */
  def boundingBoxByRadius(lat: Double, lon: Double, radiusM: Double): (Double, Double, Double, Double) = {
    val latRad = math.toRadians(lat)
    val dLat = radiusM / EarthRadiusMeters
    val dLon = math.asin(math.sin(dLat) / math.cos(latRad))
    (
      math.toDegrees(latRad - dLat),
      math.toDegrees(math.toRadians(lon) - dLon),
      math.toDegrees(latRad + dLat),
      math.toDegrees(math.toRadians(lon) + dLon)
    )
  }

  /** ±Infinity → null, mirroring the reference's `replace([inf, -inf], nan)`
    * after every division (ptrail/features/kinematic_features.py:456 etc.).
    * Null-in → null-out (Spark semantics match pandas NaN chains). */
  def infToNull(c: Column): Column =
    when(c === Double.PositiveInfinity || c === Double.NegativeInfinity, lit(null)).otherwise(c)
}
