package graft

import graft.asof.{AsOfBanded, AsOfJoin, AsOfMerge, AsOfMergeExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The banded as-of (whale-entity splitting via (entity, time-band) groups
  * + carry-row replication) must be exactly equal to the unbanded merge on
  * finite event times — including tolerance, tie-breaks, bands with no
  * build rows (carry cascade), and null entities — and must actually bound
  * per-task row traffic where the unbanded exec serializes. */
class AsOfBandedSpec extends SparkSpec {

  /** Deterministic multi-entity frame: entity "w" is the whale (90% of
    * rows), builds are sparse so many probe bands have no in-band build. */
  private def frames: (DataFrame, DataFrame) = {
    val sq = spark
    import sq.implicits._
    val probe = ((0 until 900).map(i => ("w", 10.0 + i * 7.3, i.toLong)) ++
      (0 until 50).map(i => (s"e${i % 7}", 5.0 + i * 11.1, 1000L + i)) ++
      Seq((null.asInstanceOf[String], 100.0, 2000L), (null.asInstanceOf[String], 900.0, 2001L)))
      .toDF("entity", "ts", "pid")
    val build = ((0 until 40).map(i => ("w", 3.0 + i * 160.9, i.toLong, i * 1.5)) ++
      (0 until 12).map(i => (s"e${i % 7}", 2.0 + i * 301.7, 100L + i, i * 2.5)) ++
      Seq((null.asInstanceOf[String], 50.0, 500L, 9.9),
        ("lonely", 1.0, 600L, 1.0))) // build-only entity
      .toDF("entity", "ts", "bid", "v")
    (probe, build)
  }

  private def assertSame(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.count() == b.count(), s"$what: counts differ")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0, s"$what: rows differ")
  }

  test("banded ≡ unbanded merge ≡ v1, with tolerance and tie-breaks, across band sizes") {
    val (probe, build) = frames
    for (bandSec <- Seq(50.0, 500.0, 1e9); tol <- Seq(-1.0, 400.0)) {
      val banded = AsOfBanded.backwardBanded(
        probe, build, "entity", "ts", Seq("bid", "v"), bandSec, tol, Seq("bid"))
      val merge = AsOfMerge.backward(probe, build, "entity", "ts", Seq("bid", "v"), tol, Seq("bid"))
      assertSame(banded, merge, s"band=$bandSec tol=$tol vs merge")
      val v1 = AsOfJoin.backward(probe, build, "entity", "ts", Seq("bid", "v"), tol, Seq("bid"))
      assertSame(banded, v1, s"band=$bandSec tol=$tol vs v1")
    }
  }

  test("forward and nearest banded ≡ their unbanded merges across band sizes") {
    val (probe, build) = frames
    for (bandSec <- Seq(50.0, 500.0, 1e9); tol <- Seq(-1.0, 400.0)) {
      val fwd = AsOfBanded.forwardBanded(
        probe, build, "entity", "ts", Seq("bid", "v"), bandSec, tol, Seq("bid"))
      assertSame(fwd,
        AsOfMerge.forward(probe, build, "entity", "ts", Seq("bid", "v"), tol, Seq("bid")),
        s"forward band=$bandSec tol=$tol vs merge")
      assertSame(fwd,
        AsOfJoin.forward(probe, build, "entity", "ts", Seq("bid", "v"), tol, Seq("bid")),
        s"forward band=$bandSec tol=$tol vs v1")
      val near = AsOfBanded.nearestBanded(
        probe, build, "entity", "ts", Seq("bid", "v"), bandSec, tol, Seq("bid"))
      assertSame(near,
        AsOfMerge.nearest(probe, build, "entity", "ts", Seq("bid", "v"), tol, Seq("bid")),
        s"nearest band=$bandSec tol=$tol vs merge")
      assertSame(near,
        AsOfJoin.nearest(probe, build, "entity", "ts", Seq("bid", "v"), tol, Seq("bid")),
        s"nearest band=$bandSec tol=$tol vs v1")
    }
  }

  test("forward/nearest carries cascade across empty bands in both directions") {
    val sq = spark
    import sq.implicits._
    // builds only at the extremes; probes spread across many empty bands:
    // forward must back-fill from the late build, nearest must pick the
    // closer extreme per probe (backward on ties)
    val probe = (0 until 20).map(i => ("a", 100.0 + i * 100.0, i.toLong)).toDF("entity", "ts", "pid")
    val build = Seq(("a", 5.0, 1L), ("a", 3000.0, 2L)).toDF("entity", "ts", "bid")
    val fwd = AsOfBanded.forwardBanded(probe, build, "entity", "ts", Seq("bid"), bandSeconds = 30.0)
    // probes at ts ≤ 3000 get bid 2; later ones unmatched
    assert(fwd.where(col("bid") === 2L).count() == probe.where(col("ts") <= 3000.0).count())
    assert(fwd.where(col("bid").isNull).count() == probe.where(col("ts") > 3000.0).count())
    val near = AsOfBanded.nearestBanded(probe, build, "entity", "ts", Seq("bid"), bandSeconds = 30.0)
    val exp = AsOfMerge.nearest(probe, build, "entity", "ts", Seq("bid"))
    assertSame(near, exp, "nearest across empty bands")
    // midpoint check: |Δ| to build 1 vs build 2 crosses at ts ≈ 1502.5
    assert(near.where(col("pid") === 13L).select("bid").head().getLong(0) == 1L) // ts=1400
    assert(near.where(col("pid") === 15L).select("bid").head().getLong(0) == 2L) // ts=1600
  }

  test("carry cascades across probe bands with no build rows at all") {
    val sq = spark
    import sq.implicits._
    // single early build; probes far later across many otherwise-empty
    // bands must all still match it (forward fill over band summaries)
    val probe = (0 until 20).map(i => ("a", 1000.0 + i * 100.0, i.toLong)).toDF("entity", "ts", "pid")
    val build = Seq(("a", 5.0, 7L)).toDF("entity", "ts", "bid")
    val banded = AsOfBanded.backwardBanded(probe, build, "entity", "ts", Seq("bid"), bandSeconds = 30.0)
    assert(banded.where(col("bid") === 7L).count() == 20)
  }

  test("banding bounds per-task rows where the unbanded exec trips the skew warning") {
    val (probe, build) = frames
    spark.conf.set(AsOfMergeExec.SkewWarnRowsKey, "600")
    // AQE would coalesce this fixture's few-KB partitions back into one
    // (they are far below the advisory size); at real scale partitions are
    // ~100 MB and never coalesce into a whale, so pin it off for the
    // boundedness assertion
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val before = AsOfMergeExec.skewWarningCount.get()
      AsOfMerge.backward(probe, build, "entity", "ts", Seq("bid", "v")).count()
      assert(AsOfMergeExec.skewWarningCount.get() > before,
        "whale entity should trip the warning unbanded")
      val mid = AsOfMergeExec.skewWarningCount.get()
      // fine bands: ~66 whale bands hash-spread over the test session's 4
      // shuffle partitions keeps every partition well under the threshold
      AsOfBanded.backwardBanded(probe, build, "entity", "ts", Seq("bid", "v"), bandSeconds = 100.0)
        .count()
      assert(AsOfMergeExec.skewWarningCount.get() == mid,
        "banded run must stay under the same per-partition threshold")
    } finally {
      spark.conf.unset(AsOfMergeExec.SkewWarnRowsKey)
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    }
  }
}
