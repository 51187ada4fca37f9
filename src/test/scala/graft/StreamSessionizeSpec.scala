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
}
