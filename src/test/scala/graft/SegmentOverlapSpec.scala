package graft

import graft.core.TrajSchema
import graft.session.Sessionize
import org.apache.spark.sql.functions._

/** G1 exact-match mode must reproduce the reference worker's observed
  * overlapping-suffix behavior (helpers.py:404-477): K = ⌊(Δ−1)/D⌋ suffix
  * segments per entity, rows duplicated across covering suffixes, zero
  * segments when the span fits in one window. */
class SegmentOverlapSpec extends SparkSpec {

  test("overlapping suffixes: counts, duplication, short-span emptiness") {
    import spark.implicits._
    val df = Seq(
      // entity a: spans 16 days → with numDays=7, K = floor((16d−1µs)/7d) = 2
      ("a", "2024-01-01 00:00:00"),
      ("a", "2024-01-05 00:00:00"),
      ("a", "2024-01-09 00:00:00"),
      ("a", "2024-01-17 00:00:00"),
      // entity b: spans 3 days → 0 segments (reference while-gate)
      ("b", "2024-02-01 00:00:00"),
      ("b", "2024-02-04 00:00:00")
    ).toDF("traj_id", "ts_s")
      .select(col("traj_id"), col("ts_s").cast("timestamp").as("ts"),
        lit(0.0).as("lat"), lit(0.0).as("lon"))

    val seg = Sessionize.byDaysOverlapping(df, TrajSchema(orderCols = Nil), 7)
      .select(col("traj_id"), col("ts"), col("seg_id"))

    assert(seg.where(col("traj_id") === "b").count() == 0)
    // seg 1 = suffix from 2024-01-01 → all 4 rows; seg 2 = from 01-08 → 2 rows
    val a = seg.where(col("traj_id") === "a")
      .groupBy(col("seg_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == Map(1L -> 4L, 2L -> 2L), s"got $a")
  }
}
