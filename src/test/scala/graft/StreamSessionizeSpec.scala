package graft

import java.sql.Timestamp

import graft.streaming.StreamSessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming gap sessionization must agree with the batch operator
  * (Sessionize.byGap) on the same points, across micro-batch boundaries. */
class StreamSessionizeSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming session ids match the batch operator across micro-batches") {
    val sq = spark
    import sq.implicits._

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val sessions = StreamSessionize.byGap(
      mem.toDF().toDF("entity", "ts"),
      gapSeconds = 120.0
    )
    val query = sessions.writeStream
      .format("memory")
      .queryName("stream_sessions")
      .outputMode("append")
      .start()

    // batch 1: two sessions for e1 (gap 300 s > 120 s), one for e2
    mem.addData(
      ("e1", ts("2024-01-01 00:00:00")),
      ("e1", ts("2024-01-01 00:01:00")),
      ("e1", ts("2024-01-01 00:06:00")),
      ("e2", ts("2024-01-01 00:00:30"))
    )
    query.processAllAvailable()
    // batch 2: e1 continues session 1 (60 s gap), then opens session 2
    mem.addData(
      ("e1", ts("2024-01-01 00:07:00")),
      ("e1", ts("2024-01-01 00:30:00")),
      ("e2", ts("2024-01-01 00:01:30"))
    )
    query.processAllAvailable()
    query.stop()

    // materialize the sink (fresh plan — avoids self-referencing exceptAll)
    val gotRows = spark.table("stream_sessions")
      .select(col("entity"), col("ts"), col("session_id")).collect().toSeq
    val got = spark.createDataFrame(
      spark.sparkContext.parallelize(gotRows),
      spark.table("stream_sessions").schema
    )

    // batch reference on the union of both micro-batches
    val batch = graft.session.Sessionize.byGap(
      got.select(col("entity").as("traj_id"), col("ts")),
      graft.core.TrajSchema(orderCols = Nil),
      gapSeconds = 120.0
    ).select(col("traj_id").as("entity"), col("ts"), col("session_id"))

    assert(got.count() == 7)
    assert(got.exceptAll(batch).count() == 0 && batch.exceptAll(got).count() == 0)
  }

  test("idle entities are evicted once the watermark passes lastTs + idle timeout") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val sessions = StreamSessionize.byGap(
      mem.toDF().toDF("entity", "ts"),
      gapSeconds = 60.0,
      watermarkDelay = "0 seconds",
      idleStateTimeoutSec = Some(60.0)
    )
    val query = sessions.writeStream
      .format("memory")
      .queryName("stream_sessions_evict")
      .outputMode("append")
      .start()

    def stateRows: Long =
      query.recentProgress.flatMap(_.stateOperators).lastOption.map(_.numRowsTotal).getOrElse(-1L)

    // batch 1: two entities, both stateful
    mem.addData(("a", ts("2024-01-01 00:00:00")), ("b", ts("2024-01-01 00:00:00")))
    query.processAllAvailable()
    assert(stateRows == 2, s"expected 2 stateful entities, got $stateRows")

    // batch 2+3: only b keeps flowing; the watermark (0s delay) advances to
    // 01:00 then 02:00, passing a's timeout (00:00 + 60s idle) → a's state
    // is REMOVED by the event-time timeout path
    mem.addData(("b", ts("2024-01-01 01:00:00")))
    query.processAllAvailable()
    mem.addData(("b", ts("2024-01-01 02:00:00")))
    query.processAllAvailable()
    assert(stateRows == 1, s"idle entity 'a' not evicted: state rows = $stateRows")

    // re-appearing-entity contract: a returns after eviction and re-bases
    // its session counter at 0 (the batch rule would have said session 1)
    mem.addData(("a", ts("2024-01-01 03:00:00")))
    query.processAllAvailable()
    query.stop()
    val aRows = spark.table("stream_sessions_evict")
      .where(col("entity") === "a").select(col("ts"), col("session_id")).collect()
    val reappeared = aRows.filter(_.getTimestamp(0) == ts("2024-01-01 03:00:00"))
    assert(reappeared.length == 1 && reappeared.head.getLong(1) == 0L,
      s"re-appearing entity must re-base session_id at 0, got ${reappeared.toSeq}")
    spark.catalog.dropTempView("stream_sessions_evict")
  }
}
