package graft

import java.sql.Timestamp

import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact dedup keeps exactly one row per content hash within the
  * watermark horizon, across micro-batch boundaries. */
class StreamDedupSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("duplicates are dropped at ingest across micro-batches; survivors match batch keeper-set") {
    val sq = spark
    import sq.implicits._

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamDedup.exact(
      mem.toDF().toDF("doc_id", "ts", "text"), tsCol = "ts", watermarkDelay = "1 hour")
    val query = deduped.writeStream
      .format("memory")
      .queryName("stream_dedup")
      .outputMode("append")
      .start()

    mem.addData(
      (1L, ts("2024-01-01 00:00:00"), "alpha beta"),
      (2L, ts("2024-01-01 00:00:10"), "alpha beta"), // dup within batch
      (3L, ts("2024-01-01 00:00:20"), "gamma")
    )
    query.processAllAvailable()
    mem.addData(
      (4L, ts("2024-01-01 00:05:00"), "alpha beta"), // dup across batches
      (5L, ts("2024-01-01 00:05:10"), "delta")
    )
    query.processAllAvailable()
    query.stop()

    val got = spark.table("stream_dedup")
      .select(col("doc_id"), col("content_hash")).collect().toSeq
    // one survivor per distinct text; first arrival wins
    assert(got.map(_.getLong(0)).sorted == Seq(1L, 3L, 5L), s"got $got")
    // survivor hash-set equals the batch operator's keeper hash-set
    val batchKeepers = graft.dedup.Dedup.exact(
        Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"),
          (4L, "alpha beta"), (5L, "delta")).toDF("doc_id", "text"))
      .where(col("keep")).select(col("content_hash")).as[String].collect().toSet
    assert(got.map(_.getString(1)).toSet == batchKeepers)
  }
}
