package graft.streaming

import graft.core.Times
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming point-in-time enrichment: attach the most recent build-side
  * row (build.ts ≤ event.ts, [[graft.asof.AsOfJoin.backward]] semantics
  * including the equal-ts-visible and largest-buildOrder tie rules) to an
  * UNBOUNDED stream of events — the online half of the as-of family
  * (feature lookup at serving/ingest time against a point-in-time table).
  *
  * Formulation: the build side is compacted to ONE row per entity holding
  * its (ts, payload) history as an array, then a stream-static equi-join
  * on entity + a per-row `filter` → `array_max` picks the latest
  * candidate. Every streaming operator here is STATELESS (projections +
  * stream-static join — no watermark, no state store, append mode), so
  * the operator needs no eviction story and a restart replays cleanly
  * from the checkpoint.
  *
  * Scale shape: the compacted build side is a static aggregate — Spark
  * re-evaluates a static subplan per micro-batch, so PERSIST the build
  * frame (or pre-materialize the histories table) for a long-running
  * stream; per-entity history arrays are bounded
  * LOUDLY by `maxBuildsPerEntity` (a silent giant array would detonate
  * the join row width — the same opt-out-cap law as the dedup bucket
  * valve). Size it to the real contract: a point-in-time feature table
  * holds snapshots per entity, not the raw event firehose. The candidate
  * scan is O(|history|) per event; histories that big want the BATCH
  * banded as-of, not an online lookup.
  *
  * Works identically on a batch DataFrame (all ops are standard) —
  * StreamAsOfSpec asserts exceptAll-equality with AsOfJoin.backward.
  *
  * Output: stream columns + `asof_ts` + `valueCols` (null when no build
  * row at-or-before the event, or the event time is null). */
object StreamAsOf {

  def enrichLatest(
      stream: DataFrame,
      build: DataFrame,
      entity: String,
      ts: String,
      valueCols: Seq[String],
      buildOrder: Seq[String] = Nil,
      toleranceSec: Double = -1.0,
      maxBuildsPerEntity: Int = 100000
  ): DataFrame = {
    require(maxBuildsPerEntity > 0, "maxBuildsPerEntity must be positive")
    val streamCols = stream.columns.toSeq
    // candidate element: (event-time micros, tie-breaks…, payload) — struct
    // ordering is field-lexicographic, so array_max = latest ts, then
    // largest buildOrder: exactly backward's last-wins rule
    val elem = struct(
      Times.micros(col(ts)).as("_m") +:
        buildOrder.map(c => col(c).as(s"_ord_$c")) :+
        struct(col(ts).as("_m_ts") +: valueCols.map(col): _*).as("_p"): _*)
    val histories = build
      .where(Times.micros(col(ts)).isNotNull) // a null-ts build row is never a candidate
      .groupBy(col(entity))
      .agg(collect_list(elem).as("_builds0"))
      // the cap rides the USED column so pruning can never drop it
      .select(col(entity), when(size(col("_builds0")) > maxBuildsPerEntity,
          raise_error(concat(
            lit(s"StreamAsOf: entity "), col(entity).cast("string"),
            lit(s" has > $maxBuildsPerEntity build rows — compact the build side or use the batch as-of"))))
        .otherwise(col("_builds0")).as("_builds"))
    val pMic = Times.micros(col(ts))
    val cand = filter(col("_builds"), b => b.getField("_m") <= pMic)
    val best = array_max(cand)
    val mTs = best.getField("_p").getField("_m_ts")
    val matched =
      if (toleranceSec < 0) pMic.isNotNull && best.isNotNull
      else pMic.isNotNull && best.isNotNull &&
        (pMic - best.getField("_m")) <= (toleranceSec * 1e6).toLong
    stream
      .join(histories, Seq(entity), "left")
      .select(
        streamCols.map(col) ++
          Seq(when(matched, mTs).as("asof_ts")) ++
          valueCols.map(c => when(matched, best.getField("_p").getField(c)).as(c)): _*)
  }
}
