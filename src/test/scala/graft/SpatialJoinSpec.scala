package graft

import graft.kernels.{Geo, SpatialJoin}
import org.apache.spark.sql.functions._

/** Grid-banded proximity join vs an exhaustive brute-force reference. */
class SpatialJoinSpec extends SparkSpec {

  import spark.implicits._

  // deterministic scatter around 39°N 116°E, ~±600 m, includes exact
  // duplicates and points straddling cell boundaries
  private def pts = (1 to 60).map { i =>
    val lat = 39.0 + ((i * 37) % 41 - 20) * 0.00025
    val lon = 116.0 + ((i * 53) % 43 - 21) * 0.00030
    (i.toLong, lat, lon)
  }.toDF("event_id", "lat", "lon")

  private def havM(a: (Double, Double), b: (Double, Double)): Double = {
    val r = math.Pi / 180.0
    val sdLat = math.sin((b._1 - a._1) * r / 2); val sdLon = math.sin((b._2 - a._2) * r / 2)
    val h = sdLat * sdLat + math.cos(a._1 * r) * math.cos(b._1 * r) * sdLon * sdLon
    2.0 * math.atan2(math.sqrt(h), math.sqrt(1.0 - h)) * 6371000.0
  }

  test("selfWithinDistance equals brute force, each pair exactly once") {
    val d = 120.0
    val got = SpatialJoin.selfWithinDistance(pts, d, cellLatDeg = 0.0012, cellLonDeg = 0.0016)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "a pair must appear exactly once")
    val raw = pts.as[(Long, Double, Double)].collect()
    val want = (for {
      a <- raw; b <- raw if a._1 < b._1
      if havM((a._2, a._3), (b._2, b._3)) <= d
    } yield (a._1, b._1)).toSet
    assert(want.nonEmpty, "fixture must produce pairs")
    assert(got.toSet == want, s"missing ${want -- got.toSet}, extra ${got.toSet -- want}")
  }

  test("withinDistance two-table form and reported distance") {
    val a = Seq((1L, 39.0, 116.0)).toDF("event_id", "lat", "lon")
    val b = Seq((10L, 39.0, 116.0005), (11L, 39.5, 116.5)).toDF("event_id", "lat", "lon")
    val out = SpatialJoin.withinDistance(a, b, 100.0, 0.001, 0.0015).collect()
    assert(out.length == 1 && out(0).getLong(1) == 10L)
    val want = havM((39.0, 116.0), (39.0, 116.0005))
    assertClose(Some(out(0).getDouble(2)), Some(want))
  }

  test("maxCell valve is symmetric: a hot-cell point pairs with NOTHING, either id order") {
    // 30 points piled in ONE cell; two boundary partners in the ADJACENT
    // cell within 50 m of the pile — one with a smaller id than every pile
    // point, one with a larger (the one-sided-valve trap kept or lost the
    // straddling pair depending on which side carried the smaller id)
    val hot = (1 to 30).map(i => (i.toLong, 39.00090 + i * 1e-8, 116.00001))
    val nearLow = (0L, 39.00110, 116.00001)   // cell above, ~22 m from the pile
    val nearHigh = (200L, 39.00112, 116.00001)
    val far = Seq((100L, 39.2000, 116.2000), (101L, 39.2001, 116.2000))
    val df = (hot ++ Seq(nearLow, nearHigh) ++ far).toDF("event_id", "lat", "lon")
    val out = SpatialJoin.selfWithinDistance(df, 50.0, 0.001, 0.0015, maxCell = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 200L), (100L, 101L)),
      s"hot-cell points must pair with nothing (both id orders), got $out")
    // valve off: pile pairs + pile↔boundary pairs + the two isolated pairs
    val all = SpatialJoin.selfWithinDistance(df, 50.0, 0.001, 0.0015)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(all.size == 30 * 29 / 2 + 2 * 30 + 2, s"got ${all.size}")
  }

  test("cell-size contract is validated") {
    intercept[IllegalArgumentException] {
      SpatialJoin.selfWithinDistance(pts, distM = 500.0, cellLatDeg = 0.001, cellLonDeg = 0.0015)
    }
  }

  test("polar fixture fails LOUDLY: lon cells that under-cover at the data's latitude raise") {
    // cellLonDeg = 0.0015° covers 0.0015·111195·cos(89.5°) ≈ 1.5 m at
    // 89.5°N — far short of distM = 100 m. The old contract was
    // caller-asserted: these in-range pairs were SILENTLY missed (both
    // points land in far-apart lon cells). Now every row carries the
    // coverage check and the job raises, naming the latitude.
    val polar = Seq(
      (1L, 89.5, 116.0000),
      (2L, 89.5, 116.0100) // ~97 m away at 89.5°N, 6+ lon cells apart
    ).toDF("event_id", "lat", "lon")
    val e = intercept[Exception] {
      SpatialJoin.selfWithinDistance(polar, 100.0, cellLatDeg = 0.001, cellLonDeg = 0.0015).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("cannot cover") && m.contains("89.5")),
      s"expected the loud lon-coverage raise, got: ${msgs(e).mkString(" | ")}")
    // widening the lon cell to cover at 89.5° makes the same data succeed
    // and finds the pair (0.0015° / cos(89.5°) ≈ 0.172°; use 0.2°)
    val ok = SpatialJoin.selfWithinDistance(polar, 100.0, cellLatDeg = 0.001, cellLonDeg = 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(ok == Set((1L, 2L)), s"widened cells must find the polar pair, got $ok")
    // a ≥360° cell always covers: guard compiles away, pair still found
    val global = SpatialJoin.selfWithinDistance(polar, 100.0, cellLatDeg = 0.001, cellLonDeg = 360.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(global == Set((1L, 2L)))
  }

  test("plans an equi hash/merge join on the cell key — no nested loop, no cartesian") {
    val plan = SpatialJoin.selfWithinDistance(pts, 100.0, 0.001, 0.0015)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"banded join must stay an equi-join:\n$plan")
    assert(plan.contains("Join"), "join present")
  }
}
