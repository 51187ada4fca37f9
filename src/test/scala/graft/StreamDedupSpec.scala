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
    // EXACTLY one survivor per distinct text, and first arrival wins — doc 2
    // (within-batch dup) and doc 4 (cross-batch dup) must both be dropped
    assert(got.map(_.getLong(0)).sorted == Seq(1L, 3L, 5L), s"got $got")
    assert(got.map(_.getString(1)).distinct.size == got.size, "a hash survived twice")
    // the stream's content hashing is the same function the batch operator
    // keys on (so a batch residue sweep composes with the streamed ingest)
    val batchHash = graft.dedup.Dedup.exact(Seq((1L, "alpha beta")).toDF("doc_id", "text"))
      .select(col("content_hash")).as[String].first()
    assert(got.find(_.getLong(0) == 1L).get.getString(1) == batchHash)
  }
}
