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
  * side is pre-bucketed. EVERY direction below uses only CUMULATIVE
  * ([unboundedPreceding, currentRow]) frames — Spark evaluates those in
  * O(n) per partition, where a [currentRow, unboundedFollowing] frame with
  * an aggregate re-scans the remainder per row (O(n²) per partition; the
  * forward direction is therefore expressed as a MIRRORED sort, not a
  * following frame).
  *
  * Tie rule: build rows sort BEFORE probe rows at equal ts (side 0 < 1), so
  * an equal-timestamp build row is visible — matching DuckDB/pandas
  * `merge_asof` backward semantics. Multiple build rows at the same
  * (entity, ts): pass `buildOrder` tie-breaks to make "last" deterministic.
  *
  * Null event times never match: a probe with a null ts yields null values
  * (guarded explicitly — in the mirrored DESC walks nulls sort LAST, which
  * would otherwise hand a null-ts probe the whole partition as its
  * cumulative frame), and a build row with a null ts is never a candidate
  * (its match timestamp is null, which every direction's match predicate
  * rejects).
  */
object AsOfJoin {

  /** Tag-and-union boilerplate shared by every direction: build rows carry
    * the value payload (ONE non-null struct, so a build row with genuinely
    * null value columns still "matches" — last/ignoreNulls must not skip
    * past it), probe rows carry nulls + their own columns. Tags are fixed
    * (build `_side` = 0, probe = 1); equal-ts visibility per direction is
    * controlled by each window's SORT DIRECTION over `_side`, not by the
    * tag values. */
  private val BuildSide = 0
  private val ProbeSide = 1

  private case class Tagged(unioned: DataFrame, probeCols: Seq[String])

  private def tagAndUnion(
      probe: DataFrame,
      build: DataFrame,
      entity: String,
      ts: String,
      valueCols: Seq[String],
      buildOrder: Seq[String]
  ): Tagged = {
    val probeCols = probe.columns.toSeq
    require(!probeCols.exists(valueCols.contains), "value columns collide with probe columns")
    val payload = struct(col(ts).as("_m_ts") +: valueCols.map(c => col(c).as(c)): _*)
    val buildTagged = build.select(
      Seq(col(entity), col(ts), lit(BuildSide).as("_side"), payload.as("_b")) ++
        buildOrder.map(col): _*
    )
    val probeTagged = probe.select(
      Seq(col(entity), col(ts), lit(ProbeSide).as("_side"),
        lit(null).cast(buildTagged.schema("_b").dataType).as("_b")) ++
        buildOrder.map(c => lit(null).cast(build.schema(c).dataType).as(c)) ++
        probeCols.filterNot(Set(entity, ts).contains).map(col): _*
    )
    Tagged(probeTagged.unionByName(buildTagged, allowMissingColumns = true), probeCols)
  }

  /** Shared output projection: probe columns + the guarded match. */
  private def project(
      filled: DataFrame,
      probeCols: Seq[String],
      matched: Column,
      mTs: Column,
      values: Seq[(String, Column)]
  ): DataFrame =
    filled.select(
      probeCols.map(col) ++
        Seq(when(matched, mTs).as("asof_ts")) ++
        values.map { case (name, c) => when(matched, c).as(name) }: _*)

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
    val t = tagAndUnion(probe, build, entity, ts, valueCols, buildOrder)
    val ord: Seq[Column] = col(ts) +: col("_side") +: buildOrder.map(col)
    val w = Window
      .partitionBy(col(entity))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = t.unioned
      .withColumn("_m", last(col("_b"), ignoreNulls = true).over(w))
      .where(col("_side") === ProbeSide)
    val mTs = col("_m").getField("_m_ts")
    val matched =
      if (toleranceSec < 0) col(ts).isNotNull && mTs.isNotNull
      else col(ts).isNotNull && mTs.isNotNull &&
        (graft.core.Times.micros(col(ts)) - graft.core.Times.micros(mTs)) <= (toleranceSec * 1e6).toLong
    project(filled, t.probeCols, matched, mTs,
      valueCols.map(c => c -> col("_m").getField(c)))
  }

  /** FORWARD as-of: for every probe row attach the EARLIEST build row with
    * build.ts ≥ probe.ts (pandas `merge_asof(direction="forward")`).
    * Expressed as the exact MIRROR of [[backward]] — sort ts DESC (side and
    * buildOrder mirrored too) with the same O(n) cumulative frame, so the
    * one-exchange-one-sort cost bound genuinely holds. Tie rule at the
    * matched ts: the SMALLEST `buildOrder` wins (sort-adjacent row nearest
    * the probe — the mirror image of backward's largest-wins).
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
    val t = tagAndUnion(probe, build, entity, ts, valueCols, buildOrder)
    // DESC walk: builds with larger ts come first; at equal ts build (0)
    // still precedes probe (1) so exact matches are visible; buildOrder
    // DESC makes cumulative `last` = smallest buildOrder at the matched ts
    val ord: Seq[Column] = col(ts).desc +: col("_side") +: buildOrder.map(col(_).desc)
    val w = Window
      .partitionBy(col(entity))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = t.unioned
      .withColumn("_m", last(col("_b"), ignoreNulls = true).over(w))
      .where(col("_side") === ProbeSide)
    val mTs = col("_m").getField("_m_ts")
    val matched =
      if (toleranceSec < 0) col(ts).isNotNull && mTs.isNotNull
      else col(ts).isNotNull && mTs.isNotNull &&
        (graft.core.Times.micros(mTs) - graft.core.Times.micros(col(ts))) <= (toleranceSec * 1e6).toLong
    project(filled, t.probeCols, matched, mTs,
      valueCols.map(c => c -> col("_m").getField(c)))
  }

  /** NEAREST as-of: the build row minimizing |build.ts − probe.ts|
    * (pandas `merge_asof(direction="nearest")`). ONE exchange + two O(n)
    * cumulative window passes over the same hash partitioning (ASC for the
    * backward candidate incl. exact matches, mirrored DESC — probe BEFORE
    * equal-ts builds — for the strictly-future candidate); a projection
    * picks the closer. Ties (equal distance) resolve BACKWARD; equal-ts
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
    val t = tagAndUnion(probe, build, entity, ts, valueCols, buildOrder)
    val ordBack: Seq[Column] = col(ts) +: col("_side") +: buildOrder.map(col)
    // strictly-future walk: probe (side 1) sorts BEFORE equal-ts builds in
    // DESC side order, so an equal-ts build is NOT in its cumulative past
    val ordFwd: Seq[Column] = col(ts).desc +: col("_side").desc +: buildOrder.map(col(_).desc)
    val wBack = Window.partitionBy(col(entity)).orderBy(ordBack: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col(entity)).orderBy(ordFwd: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = t.unioned
      .withColumn("_mb", last(col("_b"), ignoreNulls = true).over(wBack))
      .withColumn("_mf", last(col("_b"), ignoreNulls = true).over(wFwd))
      .where(col("_side") === ProbeSide)
    val tolMicros = (toleranceSec * 1e6).toLong
    val pMic = graft.core.Times.micros(col(ts))
    val bTs = col("_mb").getField("_m_ts")
    val fTs = col("_mf").getField("_m_ts")
    val db = pMic - graft.core.Times.micros(bTs)
    val df = graft.core.Times.micros(fTs) - pMic
    val tsOk = col(ts).isNotNull
    // a candidate needs a USABLE DISTANCE, not merely a non-null ts: for
    // double event-time keys micros() is NULL on NaN/±Inf (try_cast), and
    // a null distance would otherwise null-poison the `db <= df` compare
    // and flip the pick to the other side (ADVICE r3 — the exec kernel
    // applies the same finite-ts guard)
    val bOk = tsOk && bTs.isNotNull && db.isNotNull &&
      (if (toleranceSec < 0) lit(true) else db <= tolMicros)
    val fOk = tsOk && fTs.isNotNull && df.isNotNull &&
      (if (toleranceSec < 0) lit(true) else df <= tolMicros)
    val useB = bOk && (!fOk || db <= df)
    val m = when(useB, col("_mb")).when(fOk, col("_mf"))
    project(filled, t.probeCols, matched = m.isNotNull, mTs = m.getField("_m_ts"),
      valueCols.map(c => c -> m.getField(c)))
  }
}
