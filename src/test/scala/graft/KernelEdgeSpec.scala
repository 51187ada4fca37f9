package graft

import java.sql.Timestamp

import graft.ann.Similarity
import graft.filters.HampelKernel
import graft.streaming.StreamSessionize
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Edge-case regressions for the codegen kernels (NaN ordering, null
  * elements, sub-millisecond timestamps) — divergences a review pass found
  * between the kernels and the declarative formulations they replaced. */
class KernelEdgeSpec extends SparkSpec {

  test("Hampel kernel: NaN deviation flags the row (Spark nan-safe ordering)") {
    val window = new GenericArrayData(Array(1.0, 1.0, 1.0, 1.0, 1.0))
    // NaN value ⇒ NaN deviation ⇒ outlier (NaN compares greatest)
    assert(HampelKernel.isOutlier(window, Double.NaN, 3.0))
    // NaN inside the window poisons med/mad ⇒ NaN deviation ⇒ outlier
    val poisoned = new GenericArrayData(Array(1.0, Double.NaN, 1.0))
    assert(HampelKernel.isOutlier(poisoned, 1.0, 3.0))
    // sane spread window, interior value ⇒ not an outlier (a constant
    // window has MAD=0 ⇒ everything flagged — real Hampel semantics)
    val spread = new GenericArrayData(Array(1.0, 2.0, 3.0, 4.0, 100.0))
    assert(!HampelKernel.isOutlier(spread, 3.0, 3.0))
  }

  test("dot kernel: a null array element null-poisons (zip_with semantics)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](3.0f, 4.0f)),
      (2L, Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](3.0f, 4.0f))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(11.0))
    assert(out(2L).isEmpty, "null element must null-poison the dot product")
  }

  test("streaming sessionize honors sub-millisecond gaps (micros precision)") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val sessions = StreamSessionize.byGap(mem.toDF().toDF("entity", "ts"), gapSeconds = 1.0)
    val query = sessions.writeStream.format("memory").queryName("micros_sessions")
      .outputMode("append").start()
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 00:00:01.0005") // 1.0005 s later
    mem.addData(("e", t0), ("e", t1))
    query.processAllAvailable()
    query.stop()
    val ids = spark.table("micros_sessions").select(col("session_id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(0L, 1L), s"1.0005s gap must split at gap=1.0s, got $ids")
  }
}
