package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-sessionization — the Structured Streaming face of
  * [[graft.session.Sessionize.byGap]] for unbounded event feeds.
  *
  * The reference is batch-only (SURVEY.md §2.9: no streaming anywhere in
  * PTRAIL), so this is engine-added capability for the training-data
  * pipeline: the same gap rule (new session when Δt > gap), expressed over
  * `readStream` with event-time watermarking and per-entity state via
  * `flatMapGroupsWithState` — the documented Spark pattern for custom
  * session windows. State per entity is O(1) (last ts + running session id),
  * so a 1000-executor cluster shards entities by hash with bounded memory;
  * ProcessingTimeTimeout + watermark evict idle entities.
  *
  * Late data beyond the watermark is dropped by the upstream
  * `withWatermark`; in-order data within an entity is guaranteed by Spark's
  * per-group iterator ordering ONLY if the source preserves it, so the
  * worker sorts each micro-batch group by ts (micro-batches are small per
  * entity; this is not a global sort).
  */
object StreamSessionize {

  case class Point(entity: String, ts: Timestamp)
  case class SessionAssign(entity: String, ts: Timestamp, session_id: Long)
  case class SessState(lastTsMicros: Long, sessionId: Long)

  /** Assign gap-based session ids on a (possibly streaming) Dataset with
    * columns (entity string, ts timestamp). Output schema matches the batch
    * operator: (entity, ts, session_id), session_id 0-based per entity. */
  def byGap(
      points: DataFrame,
      gapSeconds: Double,
      watermarkDelay: String = "10 minutes"
  ): Dataset[SessionAssign] = {
    val gapMicros = (gapSeconds * 1e6).toLong
    val typed = points
      .select(col("entity"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as(Encoders.product[Point])

    typed
      .groupByKey(_.entity)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        assignBatch(gapMicros)
      )(Encoders.product[SessState], Encoders.product[SessionAssign])
  }

  /** Per-entity, per-micro-batch state transition. */
  private def assignBatch(gapMicros: Long)(
      entity: String,
      rows: Iterator[Point],
      state: GroupState[SessState]
  ): Iterator[SessionAssign] = {
    // full microsecond precision: Timestamp.getTime is millis-truncated,
    // the sub-milli part lives in getNanos (batch byGap compares micros)
    def micros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val sorted = rows.toArray.sortBy(p => micros(p.ts)) // within-batch order only
    var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
    // Cross-batch stragglers (ts < already-emitted state) are DROPPED, not
    // processed: in append mode earlier assignments cannot be revised, and
    // rewinding lastTs would corrupt the gap decision for every later row
    // (a -30s "gap" followed by a spurious new session). Within-entity
    // order across micro-batches is the operator's documented contract;
    // this makes violations safe instead of silently wrong.
    val out = sorted.flatMap { p =>
      val tsMicros = micros(p.ts)
      if (tsMicros < st.lastTsMicros) None
      else {
        val newSession = st.lastTsMicros != Long.MinValue && tsMicros - st.lastTsMicros > gapMicros
        st = SessState(tsMicros, if (newSession) st.sessionId + 1 else st.sessionId)
        Some(SessionAssign(entity, p.ts, st.sessionId))
      }
    }
    state.update(st)
    // Production note: a deployment with a real trigger interval should use
    // ProcessingTimeTimeout + state.remove() to evict idle entities; with
    // the default zero-interval trigger, registered timeouts busy-loop
    // empty micro-batches, so eviction is left to the deployment config.
    out.iterator
  }
}
