package graft.asof

import graft.core.Times
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whale-entity mitigation for the as-of merge (VERDICT r3 item 3, the
  * strong option): [[AsOfMergeExec]] clusters by entity only, so one hot
  * entity serializes into ONE task and AQE's skew splitting cannot help (it
  * pattern-matches SMJ/SHJ, not custom execs). This wrapper splits every
  * entity into fixed event-time bands and merges on the COMPOSITE key
  * (entity, band) — the same one-retained-row walk, but a whale's rows now
  * spread across ⌈span/bandSeconds⌉ independently-scheduled groups.
  *
  * Exactness (backward): for a probe p in band B, the latest build row with
  * ts ≤ p.ts is either (a) in band B itself — visible in-band because band
  * assignment is monotone in ts — or (b) the globally latest build row from
  * any band < B. Case (b) is materialized as a CARRY row: per (entity,
  * band), the band's last build row (max (ts, buildOrder)) is forward-
  * filled across the entity's band universe with one tiny window (rows =
  * #entity×#bands, not data-sized) and replicated into each later probe
  * band — the lag-k overlap trick `withKinematicsSalted` uses, applied to
  * the join. Carry rows have ts strictly below the band start, so they
  * never collide with in-band tie-breaks.
  *
  * Cost: one extra narrow aggregate + window over band summaries and ~1
  * replicated build row per (entity, probe-band). Semantics caveat
  * (documented, spec-pinned): event times with no TIMESTAMP IMAGE — null;
  * NaN/±Inf doubles; numeric keys whose seconds value overflows the
  * timestamp-representable range (|ts| ≳ 3e11 s) — are banded to -∞ and
  * never match, whereas the unbanded walk orders such keys raw (and gives
  * NaN probes the sort-greatest v1 behavior when NO tolerance is set);
  * use the unbanded form if those extremes matter. Parity with
  * [[AsOfMerge.backward]] is exact for timestamp-representable event
  * times (AsOfBandedSpec asserts exceptAll-equality with tolerance,
  * tie-breaks, empty-band cascades, and null entities).
  */
object AsOfBanded {

  /** [[AsOfMerge.backward]] semantics over (entity, time-band) groups.
    * `bandSeconds` sizes the per-task slice of a whale entity — pick it so
    * one band of your hottest entity fits a task comfortably. */
  def backwardBanded(
      probe: DataFrame,
      build: DataFrame,
      entity: String,
      ts: String,
      valueCols: Seq[String],
      bandSeconds: Double,
      toleranceSec: Double = -1.0,
      buildOrder: Seq[String] = Nil
  ): DataFrame = {
    val bandMicros = (bandSeconds * 1e6).toLong
    require(bandMicros > 0, s"bandSeconds must be positive, got $bandSeconds")
    val helpers = Seq("_band", "_ebd", "_e", "_isP", "_row", "_carry")
    require(!probe.columns.exists(helpers.contains) && !build.columns.exists(helpers.contains),
      s"columns ${helpers.mkString("/")} are reserved by the banded as-of")

    // band assignment: monotone in event time (exactness only needs
    // monotonicity, so double-division boundary rounding is harmless);
    // no-micros rows (null ts, NaN/Inf doubles) band to -∞
    def bandOf(c: Column): Column =
      coalesce(floor(Times.micros(c) / bandMicros).cast("long"), lit(Long.MinValue))

    val probeB = probe.withColumn("_band", bandOf(col(ts)))
    val buildCols = build.columns.toSeq
    // -∞-band build rows can never be a latest-≤ match for a real band and
    // the -∞ probe band never matches anyway — drop them from the build
    val buildB = build.withColumn("_band", bandOf(col(ts)))
      .where(col("_band") =!= Long.MinValue)

    // per (entity, band): the band's last build row under (ts, buildOrder)
    val lastPerBand = buildB.groupBy(col(entity).as("_e"), col("_band"))
      .agg(max_by(
        struct(buildCols.map(col): _*),
        struct((col(ts) +: buildOrder.map(col)): _*)).as("_row"))

    // band universe = probe bands ∪ build bands (build-only bands must sit
    // in the window so the forward fill cascades across EMPTY probe bands);
    // null-safe join keys keep null entities grouped like the merge does
    val probeBands = probeB.select(col(entity).as("_e"), col("_band"))
      .distinct().withColumn("_isP", lit(true))
    val uni = probeBands.join(lastPerBand,
        probeBands("_e") <=> lastPerBand("_e") && probeBands("_band") <=> lastPerBand("_band"),
        "full")
      .select(
        coalesce(probeBands("_e"), lastPerBand("_e")).as("_e"),
        coalesce(probeBands("_band"), lastPerBand("_band")).as("_band"),
        col("_isP"), col("_row"))
    val wCarry = Window.partitionBy(col("_e")).orderBy(col("_band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = uni
      .withColumn("_carry", last(col("_row"), ignoreNulls = true).over(wCarry))
      .where(col("_isP") === true && col("_carry").isNotNull)
      .select(buildCols.map(c => col(s"_carry.`$c`").as(c)) :+ col("_band"): _*)

    val buildAug = buildB.select(buildCols.map(col) :+ col("_band"): _*)
      .unionByName(carries)

    // composite cluster key → the exec co-partitions and walks per
    // (entity, band); struct ordering = (entity, band) lexicographic, so
    // the required child sort stays correct
    val pK = probeB.withColumn("_ebd", struct(col(entity), col("_band")))
    val bK = buildAug.withColumn("_ebd", struct(col(entity), col("_band")))
    AsOfMerge.backward(pK, bK, "_ebd", ts, valueCols, toleranceSec, buildOrder)
      .drop("_ebd", "_band")
  }
}
