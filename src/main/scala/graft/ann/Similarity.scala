package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  *  - [[cosineTopK]]: exact brute force — broadcast the (small) query side,
  *    whole-stage-codegen dot products over the corpus scan, per-query top-k
  *    via window rank. The right baseline, and at 100 TB the corpus scan is
  *    embarrassingly parallel with zero shuffle on the big side.
  *  - [[lshBuckets]] / [[lshTopK]]: random-hyperplane LSH — deterministic
  *    hash-derived planes, bucket join instead of cross join; the scale
  *    path (recall < 1, cost ∝ bucket collisions).
  */
object Similarity {

  /** Sequential-fold dot product (deterministic order; floats widened to
    * double) as a native codegen'd expression ([[DotProductExpr]]) — the
    * zip_with + aggregate formulation evaluates an interpreted lambda per
    * element and materializes an intermediate array per row (~5× slower on
    * the sf0.1 pair joins). Bit-identical fold order. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      DotProductExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine for each query vector. Query side is broadcast;
    * ranking orders by (rounded score desc, corpus id) so results are
    * deterministic under float noise. Output:
    * (query_id, corpus_id, cosine, rank). */
  def cosineTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      queryId: String = "query_id",
      corpusId: String = "vec_id",
      vec: String = "embedding",
      roundDigits: Int = 6
  ): DataFrame = {
    // norms once per side (one dot per pair instead of three; same IEEE value)
    val q = queries.select(col(queryId), col(vec).as("_qv"), norm(col(vec)).as("_qn"))
    val c = corpus.select(col(corpusId), col(vec).as("_cv"), norm(col(vec)).as("_cn"))
    val scored = c
      .crossJoin(broadcast(q))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("cosine",
        round(dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")), roundDigits) + 0.0)
    val w = Window.partitionBy(col(queryId)).orderBy(col("cosine").desc, col(corpusId))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rank"))
  }

  /** Deterministic hyperplane weight for (plane p, dim i) in [−0.5, 0.5):
    * hash-derived, no RNG state, identical on every executor. */
  private def planeWeight(p: Int, i: Column): Column =
    xxhash64(lit("graft-lsh"), lit(p), i).cast("double") / 1.8446744073709552e19

  /** LSH bucket id from `planes` sign bits of hash-derived hyperplanes. */
  def lshBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => x.cast("double") * planeWeight(p, i)),
        lit(0.0),
        (acc, v) => acc + v
      )
      when(s > 0.0, 1L << p).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  def lshBuckets(df: DataFrame, planes: Int = 8, id: String = "vec_id", vec: String = "embedding"): DataFrame =
    df.withColumn("bucket", lshBucket(col(vec), planes))

  /** Approximate top-k: candidates only from same-bucket collisions (plus
    * the query's own bucket), exact cosine re-rank inside buckets. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      planes: Int = 8,
      queryId: String = "query_id",
      corpusId: String = "vec_id",
      vec: String = "embedding"
  ): DataFrame = {
    val q = lshBuckets(queries.select(col(queryId), col(vec).as("_qv")), planes, queryId, "_qv")
      .select(col(queryId), col("_qv"), norm(col("_qv")).as("_qn"), col("bucket"))
    val c = lshBuckets(corpus.select(col(corpusId), col(vec).as("_cv")), planes, corpusId, "_cv")
      .select(col(corpusId), col("_cv"), norm(col("_cv")).as("_cn"), col("bucket"))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cosine").desc, col(corpusId))
    c.join(broadcast(q), Seq("bucket"))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("cosine",
        round(dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")), 6) + 0.0)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rank"))
  }
}
