package graft.asof

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time / as-of merge (north rule; no PTRAIL analogue — it
  * re-expresses the interpolation-backfill + feature-alignment idea,
  * SURVEY.md §4.2#1).
  *
  * For every probe row (entity, ts) attach the MOST RECENT build-side row of
  * the same entity with build.ts ≤ probe.ts (backward as-of; optional
  * tolerance). Zero temporal leakage BY CONSTRUCTION: the cumulative window
  * frame ends at the current row, so only rows with ts ≤ probe ts are ever
  * visible — a future build row cannot affect a past probe.
  *
  * NOTE — this v1 is the built-ins-only SEMANTICS REFERENCE; the documented
  * DEFAULT for callers is [[AsOfMerge.backward]] (v2): identical output
  * (AsOfMergeSpec asserts exceptAll-equality both directions), ~5× faster at
  * sf0.1, and exchange-FREE over bucketed/pre-clustered inputs, which this
  * union formulation can never be.
  *
  * v1 formulation is pure built-ins: union-tag both sides, one
  * Window.partitionBy(entity).orderBy(ts, side) with
  * `last(value, ignoreNulls=true)` over the cumulative frame, filter back to
  * probe rows. Cost = one hash exchange + one sort over |probe|+|build| —
  * the same lower bound a dedicated sort-merge as-of exec pays when neither
  * side is pre-bucketed.
  *
  * Tie rule: build rows sort BEFORE probe rows at equal ts (side 0 < 1), so
  * an equal-timestamp build row is visible — matching DuckDB/pandas
  * `merge_asof` backward semantics. Multiple build rows at the same
  * (entity, ts): pass `buildOrder` tie-breaks to make "last" deterministic.
  */
object AsOfJoin {

  /** @param probe       left side (entity, ts, …) — all columns kept
    * @param build       right side (entity, ts, value columns)
    * @param entity      join key column name (same name both sides)
    * @param ts          event-time column name (same name both sides)
    * @param valueCols   build columns to attach to each probe row
    * @param toleranceSec match only if probe.ts − build.ts ≤ tolerance (< 0 = unbounded)
    * @param buildOrder  extra build-side tie-break columns at equal ts
    */
  def backward(
      probe: DataFrame,
      build: DataFrame,
      entity: String,
      ts: String,
      valueCols: Seq[String],
      toleranceSec: Double = -1.0,
      buildOrder: Seq[String] = Nil
  ): DataFrame = {
    val probeCols = probe.columns.toSeq
    require(!probeCols.exists(valueCols.contains), "value columns collide with probe columns")

    // Matched build values travel as ONE non-null struct so that a build row
    // with a genuinely-null value column still "matches" (last(ignoreNulls)
    // must not skip past it to an older row).
    val payload = struct(col(ts).as("_m_ts") +: valueCols.map(c => col(c).as(c)): _*)
    val buildTagged = build.select(
      Seq(col(entity), col(ts), lit(0).as("_side"), payload.as("_b")) ++
        buildOrder.map(col): _*
    )
    val probeTagged = probe.select(
      Seq(col(entity), col(ts), lit(1).as("_side"),
        lit(null).cast(buildTagged.schema("_b").dataType).as("_b")) ++
        buildOrder.map(c => lit(null).cast(build.schema(c).dataType).as(c)) ++
        probeCols.filterNot(Set(entity, ts).contains).map(col): _*
    )
    val unioned = probeTagged.unionByName(buildTagged, allowMissingColumns = true)

    val ord: Seq[Column] = col(ts) +: col("_side") +: buildOrder.map(col)
    val w = Window
      .partitionBy(col(entity))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .withColumn("_m", last(col("_b"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)

    val mTs = col("_m").getField("_m_ts")
    val inTol =
      if (toleranceSec < 0) mTs.isNotNull
      else mTs.isNotNull &&
        (graft.core.Times.micros(col(ts)) - graft.core.Times.micros(mTs)) <= (toleranceSec * 1e6).toLong

    filled.select(
      probeCols.map(col) ++
        Seq(when(inTol, mTs).as("asof_ts")) ++
        valueCols.map(c => when(inTol, col("_m").getField(c)).as(c)): _*
    )
  }

  /** FORWARD as-of: for every probe row attach the EARLIEST build row with
    * build.ts ≥ probe.ts (pandas `merge_asof(direction="forward")`).
    * Same one-exchange-one-sort cost as [[backward]], mirrored: probe rows
    * sort BEFORE equal-ts build rows (so exact matches are visible in the
    * following frame) and the match is `first(ignoreNulls)` over
    * [currentRow, unboundedFollowing]. Tie rule at the matched ts: the
    * SMALLEST `buildOrder` wins (sort-adjacent row nearest the probe —
    * the mirror image of backward's largest-wins).
    * `toleranceSec`: match only if build.ts − probe.ts ≤ tolerance. */
  def forward(
      probe: DataFrame,
      build: DataFrame,
      entity: String,
      ts: String,
      valueCols: Seq[String],
      toleranceSec: Double = -1.0,
      buildOrder: Seq[String] = Nil
  ): DataFrame = {
    val probeCols = probe.columns.toSeq
    require(!probeCols.exists(valueCols.contains), "value columns collide with probe columns")
    val payload = struct(col(ts).as("_m_ts") +: valueCols.map(c => col(c).as(c)): _*)
    val buildTagged = build.select(
      Seq(col(entity), col(ts), lit(1).as("_side"), payload.as("_b")) ++
        buildOrder.map(col): _*
    )
    val probeTagged = probe.select(
      Seq(col(entity), col(ts), lit(0).as("_side"),
        lit(null).cast(buildTagged.schema("_b").dataType).as("_b")) ++
        buildOrder.map(c => lit(null).cast(build.schema(c).dataType).as(c)) ++
        probeCols.filterNot(Set(entity, ts).contains).map(col): _*
    )
    val unioned = probeTagged.unionByName(buildTagged, allowMissingColumns = true)
    val ord: Seq[Column] = col(ts) +: col("_side") +: buildOrder.map(col)
    val w = Window
      .partitionBy(col(entity))
      .orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = unioned
      .withColumn("_m", first(col("_b"), ignoreNulls = true).over(w))
      .where(col("_side") === 0)
    val mTs = col("_m").getField("_m_ts")
    val inTol =
      if (toleranceSec < 0) mTs.isNotNull
      else mTs.isNotNull &&
        (graft.core.Times.micros(mTs) - graft.core.Times.micros(col(ts))) <= (toleranceSec * 1e6).toLong
    filled.select(
      probeCols.map(col) ++
        Seq(when(inTol, mTs).as("asof_ts")) ++
        valueCols.map(c => when(inTol, col("_m").getField(c)).as(c)): _*
    )
  }

  /** NEAREST as-of: the build row minimizing |build.ts − probe.ts|
    * (pandas `merge_asof(direction="nearest")`). STILL one exchange + one
    * sort: the backward layout's single WindowExec evaluates BOTH frames
    * (cumulative `last` = backward candidate incl. exact matches;
    * following `first` = strictly-future candidate) and a projection picks
    * the closer. Ties (equal distance) resolve BACKWARD; equal-ts
    * candidates are distance 0 and always win. `toleranceSec` bounds the
    * distance on both sides. */
  def nearest(
      probe: DataFrame,
      build: DataFrame,
      entity: String,
      ts: String,
      valueCols: Seq[String],
      toleranceSec: Double = -1.0,
      buildOrder: Seq[String] = Nil
  ): DataFrame = {
    val probeCols = probe.columns.toSeq
    require(!probeCols.exists(valueCols.contains), "value columns collide with probe columns")
    val payload = struct(col(ts).as("_m_ts") +: valueCols.map(c => col(c).as(c)): _*)
    val buildTagged = build.select(
      Seq(col(entity), col(ts), lit(0).as("_side"), payload.as("_b")) ++
        buildOrder.map(col): _*
    )
    val probeTagged = probe.select(
      Seq(col(entity), col(ts), lit(1).as("_side"),
        lit(null).cast(buildTagged.schema("_b").dataType).as("_b")) ++
        buildOrder.map(c => lit(null).cast(build.schema(c).dataType).as(c)) ++
        probeCols.filterNot(Set(entity, ts).contains).map(col): _*
    )
    val unioned = probeTagged.unionByName(buildTagged, allowMissingColumns = true)
    val ord: Seq[Column] = col(ts) +: col("_side") +: buildOrder.map(col)
    val base = Window.partitionBy(col(entity)).orderBy(ord: _*)
    val wPast = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFut = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = unioned
      .withColumn("_mb", last(col("_b"), ignoreNulls = true).over(wPast))
      .withColumn("_mf", first(col("_b"), ignoreNulls = true).over(wFut))
      .where(col("_side") === 1)
    val tolMicros = (toleranceSec * 1e6).toLong
    val pMic = graft.core.Times.micros(col(ts))
    val bTs = col("_mb").getField("_m_ts")
    val fTs = col("_mf").getField("_m_ts")
    val db = pMic - graft.core.Times.micros(bTs)
    val df = graft.core.Times.micros(fTs) - pMic
    val bOk = bTs.isNotNull && (if (toleranceSec < 0) lit(true) else db <= tolMicros)
    val fOk = fTs.isNotNull && (if (toleranceSec < 0) lit(true) else df <= tolMicros)
    val useB = bOk && (!fOk || db <= df)
    val m = when(useB, col("_mb")).when(fOk, col("_mf"))
    filled.select(
      probeCols.map(col) ++
        Seq(m.getField("_m_ts").as("asof_ts")) ++
        valueCols.map(c => m.getField(c).as(c)): _*
    )
  }
}
