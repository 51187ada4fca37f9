package graft

import graft.asof.IntervalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join laws: cover semantics, half-open boundaries,
  * latest-start winner, align ≡ banded on non-overlapping intervals, the
  * documented align/banded divergence under overlap, and the loud
  * span-fan-out guard. */
class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  // probe: one entity, events on the hour
  private def probe: DataFrame = Seq(
    (1L, "u", "2024-01-01 00:00:00"),
    (2L, "u", "2024-01-01 01:00:00"),
    (3L, "u", "2024-01-01 02:00:00"),
    (4L, "u", "2024-01-01 03:00:00"),
    (5L, "u", "2024-01-01 10:00:00"),
    (6L, "v", "2024-01-01 01:30:00")
  ).toDF("event_id", "entity", "ts_s").selectExpr("event_id", "entity", "cast(ts_s as timestamp) as ts")

  private def iv(rows: (Long, String, String, String)*): DataFrame =
    rows.toDF("iv_id", "entity", "s_s", "e_s")
      .selectExpr("iv_id", "entity", "cast(s_s as timestamp) as s", "cast(e_s as timestamp) as e")

  private def run(f: (DataFrame, DataFrame) => DataFrame, intervals: DataFrame) =
    f(probe, intervals).orderBy("event_id")
      .select("event_id", "interval_start", "iv_id").collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)), if (r.isNullAt(2)) None else Some(r.getLong(2))))

  private val banded = (p: DataFrame, i: DataFrame) =>
    IntervalJoin.banded(p, i, "entity", "ts", "s", "e", Seq("iv_id"),
      probeKey = "event_id", bandSec = 3600.0, buildOrder = Seq("iv_id"))

  private val align = (p: DataFrame, i: DataFrame) =>
    IntervalJoin.align(p, i, "entity", "ts", "s", "e", Seq("iv_id"), buildOrder = Seq("iv_id"))

  test("banded: half-open cover, latest start wins, unmatched survive as nulls") {
    val intervals = iv(
      (10L, "u", "2024-01-01 00:00:00", "2024-01-01 02:00:00"), // covers 00:00, 01:00 (NOT 02:00 — half-open)
      (11L, "u", "2024-01-01 01:00:00", "2024-01-01 04:00:00"), // overlaps; later start wins at 01:00
      (12L, "v", "2024-01-01 01:00:00", "2024-01-01 02:00:00"))
    val got = run(banded, intervals)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val byId = got.map(g => g._1 -> g._3).toMap
    assert(byId(1L) == Some(10L), "start boundary is inclusive")
    assert(byId(2L) == Some(11L), "latest covering start wins under overlap")
    assert(byId(3L) == Some(11L), "end boundary is exclusive (10 closed at 02:00)")
    assert(byId(4L) == Some(11L))
    assert(byId(5L) == None, "probe after all ends matches nothing")
    assert(byId(6L) == Some(12L), "entities do not cross")
  }

  test("align ≡ banded on non-overlapping intervals; equal-start tie = largest buildOrder in both") {
    val intervals = iv(
      (10L, "u", "2024-01-01 00:00:00", "2024-01-01 01:30:00"),
      (11L, "u", "2024-01-01 02:00:00", "2024-01-01 03:30:00"),
      (20L, "u", "2024-01-01 02:00:00", "2024-01-01 03:30:00"), // exact duplicate start/end, bigger id
      (12L, "v", "2024-01-01 01:00:00", "2024-01-01 02:00:00"))
    val a = align(probe, intervals).select("event_id", "interval_start", "interval_end", "iv_id")
    val b = banded(probe, intervals).select("event_id", "interval_start", "interval_end", "iv_id")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "align and banded must agree row-for-row on duplicated-but-identical intervals")
    val winner = b.where(col("event_id") === 3L).select("iv_id").head()
    assert(winner.getLong(0) == 20L, "equal-start tie goes to the largest buildOrder (as-of last-wins)")
  }

  test("documented divergence: latest-started interval closed, earlier one still covering") {
    val intervals = iv(
      (10L, "u", "2024-01-01 00:00:00", "2024-01-01 06:00:00"), // long cover
      (11L, "u", "2024-01-01 01:00:00", "2024-01-01 01:10:00")) // short, closes fast
    val atTwo = (d: DataFrame) => d.where(col("event_id") === 3L).select("iv_id").collect()
    val b = atTwo(banded(probe, intervals))
    val a = atTwo(align(probe, intervals))
    assert(b.head.getLong(0) == 10L, "banded finds the still-open earlier interval")
    assert(a.head.isNullAt(0), "align sees only the latest-started (closed) one — its documented semantics")
  }

  test("null probe ts never matches; empty/invalid intervals never emit") {
    val p = Seq((1L, "u", Option.empty[String])).toDF("event_id", "entity", "ts_s")
      .selectExpr("event_id", "entity", "cast(ts_s as timestamp) as ts")
    val intervals = iv(
      (10L, "u", "2024-01-01 00:00:00", "2024-01-01 00:00:00"), // empty [t, t)
      (11L, "u", "2024-01-01 02:00:00", "2024-01-01 01:00:00")) // inverted
    val b = IntervalJoin.banded(p, intervals, "entity", "ts", "s", "e", Seq("iv_id"),
      probeKey = "event_id", bandSec = 3600.0, buildOrder = Seq("iv_id")).collect()
    assert(b.length == 1 && b.head.isNullAt(b.head.fieldIndex("iv_id")))
    // and a valid probe against only-degenerate intervals also stays null
    val b2 = banded(probe, intervals).where(col("iv_id").isNotNull).count()
    assert(b2 == 0)
  }

  test("property: banded ≡ brute-force reference on random overlapping intervals, across band sizes") {
    val rnd = new scala.util.Random(42)
    val probeRows = (1L to 400L).map { i =>
      (i, s"e${rnd.nextInt(5)}", new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L))
    }
    val ivRows = (1L to 120L).map { i =>
      val s = 1700000000000L + rnd.nextInt(1000000) * 1000L
      (i, s"e${rnd.nextInt(5)}", new java.sql.Timestamp(s),
        new java.sql.Timestamp(s + (rnd.nextInt(200000) - 1000) * 1000L)) // some inverted/empty
    }
    val p = probeRows.toDF("event_id", "entity", "ts")
    val ivs = ivRows.toDF("iv_id", "entity", "s", "e")
    // brute force: inequality join + window pick — the oracle formulation
    val cand = p.join(ivs.withColumnRenamed("entity", "_e"),
      col("entity") === col("_e") && col("s") <= col("ts") && col("ts") < col("e"), "left")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_id"))
      .orderBy(col("s").desc_nulls_last, col("iv_id").desc_nulls_last)
    val brute = cand.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col("event_id"), col("s").as("interval_start"), col("e").as("interval_end"), col("iv_id"))
    for (band <- Seq(3600.0, 86400.0, 1000000.0)) {
      val got = IntervalJoin.banded(p, ivs, "entity", "ts", "s", "e", Seq("iv_id"),
          probeKey = "event_id", bandSec = band, buildOrder = Seq("iv_id"))
        .select("event_id", "interval_start", "interval_end", "iv_id")
      assert(got.exceptAll(brute).count() == 0 && brute.exceptAll(got).count() == 0,
        s"banded diverged from the brute-force reference at bandSec=$band")
    }
  }

  test("span fan-out guard raises instead of silently exploding") {
    val intervals = iv((10L, "u", "2024-01-01 00:00:00", "2024-03-01 00:00:00")) // 60 days
    val e = intercept[Exception] {
      IntervalJoin.banded(probe, intervals, "entity", "ts", "s", "e", Seq("iv_id"),
        probeKey = "event_id", bandSec = 3600.0, buildOrder = Seq("iv_id"),
        maxSpanBands = 100).collect()
    }
    assert(e.getMessage.contains("spans >") || Option(e.getCause).exists(_.getMessage.contains("spans >")),
      s"expected the loud span guard, got: ${e.getMessage}")
  }
}
