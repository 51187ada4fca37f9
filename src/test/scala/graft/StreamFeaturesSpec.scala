package graft

import graft.core.SyntheticCorpus
import graft.features.TokenKernel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The grouped feature kernel is stateless per input row (one sequence in →
  * one vector out), so the SAME operator runs unchanged over readStream —
  * feature extraction for a live ingest feed with zero state store. Output
  * must equal the batch run on the same rows. */
class StreamFeaturesSpec extends SparkSpec {

  test("streaming doc vectors ≡ batch doc vectors on the same sequences") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = SyntheticCorpus.generate(spark, nDocs = 40, medianLen = 24).cache()
    val rows = corpus.select(col("doc_id"), col("tokens"))
      .as[(String, Array[Int])].collect().toSeq

    val mem = MemoryStream[(String, Array[Int])]
    val vectors = TokenKernel.docVectors(mem.toDF().toDF("doc_id", "tokens"))
    val query = vectors.writeStream.format("memory").queryName("stream_vectors")
      .outputMode("append").start()
    // two micro-batches to prove statelessness across batch boundaries
    mem.addData(rows.take(rows.size / 2))
    query.processAllAvailable()
    mem.addData(rows.drop(rows.size / 2))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("stream_vectors")
    val batch = TokenKernel.docVectors(corpus).toDF()
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
  }
}
