package graft

import graft.core.{SyntheticCorpus, TokenAdapter}
import graft.features.{Kinematic, TokenKernel}
import graft.session.Sessionize
import org.apache.spark.sql.functions._

/** The grouped (shuffle-free typed-kernel) path must equal the declarative
  * window path BIT-FOR-BIT — same xxhash-derived channels, same
  * haversine/bearing op order, same null positions, same session cumsum. */
class TokenKernelSpec extends SparkSpec {

  // synthetic corpus PLUS the degenerate shapes the generator never makes:
  // empty, single-token (all features null), two-token (acc/jerk null),
  // three-token (jerk null), and a null token array
  private lazy val corpus = {
    import spark.implicits._
    val edge = Seq(
      ("edge_empty", Array.empty[Int], "web"),
      ("edge_one", Array(7), "web"),
      ("edge_two", Array(7, 11), "web"),
      ("edge_three", Array(7, 11, 13), "web"),
      ("edge_null", null.asInstanceOf[Array[Int]], "web")
    ).toDF("doc_id", "tokens", "source")
      .withColumn("n_tok", coalesce(size(col("tokens")), lit(0)))
    SyntheticCorpus.generate(spark, nDocs = 80, medianLen = 48, skewEvery = 25, skewFactor = 10)
      .unionByName(edge).cache()
  }

  test("per-token features: kernel == window path bitwise (incl. null masks)") {
    val (grid, ts) = TokenAdapter.explodeTokens(corpus)
    val win = Sessionize
      .byGap(Kinematic.withKinematics(grid, ts), ts, gapSeconds = 1.5)
      .select(
        (Seq("doc_id", "pos", "token", "lat", "lon") ++ Kinematic.AllFeatures :+ "session_id").map(col): _*
      )
    val ker = TokenKernel.tokenRows(corpus, stepSec = 1L, gapSeconds = 1.5).toDF()
      .select(win.columns.toIndexedSeq.map(col): _*)
    // exceptAll is exact binary comparison per row — bit equality or bust
    assert(win.count() == ker.count())
    assert(win.exceptAll(ker).count() == 0, "window-path rows missing from kernel")
    assert(ker.exceptAll(win).count() == 0, "kernel rows missing from window path")
  }

  test("per-doc vectors: kernel sums/sessions == window-path consume-all agg") {
    val (grid, ts) = TokenAdapter.explodeTokens(corpus)
    val ses = Sessionize.byGap(Kinematic.withKinematics(grid, ts), ts, gapSeconds = 1.5)
    val aggs = Kinematic.AllFeatures.map(f => sum(col(f)).as(s"sum_$f")) :+
      max(col("session_id")).as("n_sessions") :+ count(lit(1)).as("n")
    val win = ses.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val ker = TokenKernel.docVectors(corpus).toDF()

    // full outer: docs present on exactly one side are mismatches too
    val joined = win.alias("w").join(ker.alias("k"), Seq("doc_id"), "full")
    // empty/null-token docs appear on NEITHER side
    assert(joined.count() == corpus.count() - 2)
    assert(joined.where(
      col("w.n").isNull || col("k.n").isNull ||
        col("w.n") =!= col("k.n") || col("w.n_sessions") =!= col("k.n_sessions")).count() == 0)
    val mismatches = Kinematic.AllFeatures.map { f =>
      val w = col(s"w.sum_$f"); val k = col(s"k.sum_$f")
      // null-AWARE: null-mask disagreement is a mismatch; both-defined
      // compares with tiny tol (same accumulation order ⇒ near-bit-equal)
      joined.where(
        when(w.isNull || k.isNull, w.isNotNull || k.isNotNull)
          .otherwise(abs(w - k) > abs(w) * 1e-12 + 1e-9)).count()
    }
    assert(mismatches.forall(_ == 0), s"sum mismatches per feature: ${Kinematic.AllFeatures.zip(mismatches)}")
    // the short docs really do exercise the null-sum path
    assert(ker.where(col("doc_id") === "edge_one" && col("sum_Distance").isNotNull).count() == 0)
    assert(ker.where(col("doc_id") === "edge_two" && col("sum_Acceleration").isNotNull).count() == 0)
    assert(ker.where(col("doc_id") === "edge_three" &&
      (col("sum_Jerk").isNotNull || col("sum_Acceleration").isNull)).count() == 0)
  }

  test("gap smaller than step ⇒ every token its own session (closed-form check)") {
    val ker = TokenKernel.docVectors(corpus, stepSec = 2L, gapSeconds = 1.0).toDF()
    assert(ker.where(col("n_sessions") =!= col("n") - 1).count() == 0)
  }
}
