package graft

import graft.core.TrajSchema
import graft.features.Rolling
import graft.interp.Fill
import org.apache.spark.sql.functions._

/** Fill (LOCF/BFILL) and Rolling laws against brute-force references:
  * carried values are copies of in-entity source rows (zero leakage for
  * LOCF by frame bound), the gap bound masks long carries, and the rolling
  * aggregates equal a per-entity sliding-window fold. */
class WindowFillSpec extends SparkSpec {

  import spark.implicits._

  // (traj_id, event_id, ts seconds, value) — entity "a" has a 3-hour hole
  private def rows = Seq(
    ("a", 1L, 0L, Some(1.5)),
    ("a", 2L, 600L, None),
    ("a", 3L, 1200L, Some(2.5)),
    ("a", 4L, 1200L + 3 * 3600L, None), // 3h after the last non-null
    ("a", 5L, 1200L + 3 * 3600L + 60L, Some(9.0)),
    ("b", 6L, 0L, None), // leading null: LOCF leaves it null
    ("b", 7L, 60L, Some(7.0)),
    ("b", 8L, 120L, None)
  )

  private def df = rows
    .map { case (id, e, sec, v) => (id, e, new java.sql.Timestamp(sec * 1000L), v) }
    .toDF("traj_id", "event_id", "ts", "lat")

  test("locf carries the last non-null forward; leading nulls stay null") {
    val got = Fill.locf(df, S, Seq("lat")).orderBy("event_id")
      .select("event_id", "lat").as[(Long, Option[Double])].collect().toMap
    assert(got(2L) == Some(1.5) && got(4L) == Some(2.5))
    assert(got(6L) == None, "no past observation exists for the first row")
    assert(got(1L) == Some(1.5) && got(3L) == Some(2.5), "non-null rows pass through")
  }

  test("locf maxGapSec masks carries older than the bound") {
    val got = Fill.locf(df, S, Seq("lat"), maxGapSec = 3600.0).orderBy("event_id")
      .select("event_id", "lat").as[(Long, Option[Double])].collect().toMap
    assert(got(2L) == Some(1.5), "10-minute carry is inside the bound")
    assert(got(4L) == None, "3-hour carry exceeds the bound")
  }

  test("bfill is the exact mirror of locf") {
    val got = Fill.bfill(df, S, Seq("lat")).orderBy("event_id")
      .select("event_id", "lat").as[(Long, Option[Double])].collect().toMap
    assert(got(2L) == Some(2.5) && got(4L) == Some(9.0) && got(6L) == Some(7.0))
    assert(got(8L) == None, "no future observation exists for the last row")
  }

  test("rolling aggregates equal the brute-force sliding fold") {
    val n = 200
    val data = (0 until n).map { i =>
      val id = if (i % 3 == 0) "x" else "y"
      (id, i.toLong, new java.sql.Timestamp(1700000000000L + i.toLong * 7013L), math.sin(i * 0.37) * 10.0)
    }
    val k = 5
    val got = Rolling.withRolling(data.toDF("traj_id", "event_id", "ts", "lat"), S, "lat", k)
      .select("traj_id", "event_id", "roll_n", "roll_min", "roll_max", "roll_mean", "roll_rate_hz")
      .collect().map(r => r.getLong(1) -> r).toMap
    // brute force: for each row, the trailing k rows within its entity
    val byEntity = data.groupBy(_._1).view.mapValues(_.sortBy(r => (r._3.getTime, r._2))).toMap
    for ((id, grp) <- byEntity; (row, i) <- grp.zipWithIndex) {
      val frame = grp.slice(math.max(0, i - k + 1), i + 1)
      val r = got(row._2)
      assert(r.getLong(2) == frame.size)
      assert(r.getDouble(3) == frame.map(_._4).min && r.getDouble(4) == frame.map(_._4).max)
      assert(math.abs(r.getDouble(5) - frame.map(_._4).sum / frame.size) < 1e-12)
      if (frame.size > 1) {
        val span = (row._3.getTime - frame.head._3.getTime) / 1000.0
        assert(math.abs(r.getDouble(6) - (frame.size - 1) / span) < 1e-12)
      } else assert(r.isNullAt(6))
    }
  }
}
