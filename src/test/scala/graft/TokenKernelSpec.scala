package graft

import graft.core.{SyntheticCorpus, TokenAdapter}
import graft.features.{Kinematic, TokenKernel}
import graft.session.Sessionize
import org.apache.spark.sql.functions._

/** The grouped (shuffle-free typed-kernel) path must equal the declarative
  * window path BIT-FOR-BIT — same xxhash-derived channels, same
  * haversine/bearing op order, same null positions, same session cumsum. */
class TokenKernelSpec extends SparkSpec {

  private lazy val corpus =
    SyntheticCorpus.generate(spark, nDocs = 80, medianLen = 48, skewEvery = 25, skewFactor = 10).cache()

  test("per-token features: kernel == window path bitwise (incl. null masks)") {
    val (grid, ts) = TokenAdapter.explodeTokens(corpus)
    val win = Sessionize
      .byGap(Kinematic.withKinematics(grid, ts), ts, gapSeconds = 1.5)
      .select(
        (Seq("doc_id", "pos", "token", "lat", "lon") ++ Kinematic.AllFeatures :+ "session_id").map(col): _*
      )
    val ker = TokenKernel.tokenRows(corpus, stepSec = 1L, gapSeconds = 1.5).toDF()
      .select(win.columns.map(col): _*)
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

    val joined = win.alias("w").join(ker.alias("k"), "doc_id")
    assert(joined.count() == corpus.count())
    assert(joined.where(col("w.n") =!= col("k.n") || col("w.n_sessions") =!= col("k.n_sessions")).count() == 0)
    val mismatches = Kinematic.AllFeatures.map { f =>
      // same accumulation order (pos order within one partition) ⇒ tiny tol
      joined.where(abs(col(s"w.sum_$f") - col(s"k.sum_$f")) > abs(col(s"w.sum_$f")) * 1e-12 + 1e-9).count()
    }
    assert(mismatches.forall(_ == 0), s"sum mismatches per feature: ${Kinematic.AllFeatures.zip(mismatches)}")
  }

  test("gap smaller than step ⇒ every token its own session (closed-form check)") {
    val ker = TokenKernel.docVectors(corpus, stepSec = 2L, gapSeconds = 1.0).toDF()
    assert(ker.where(col("n_sessions") =!= col("n") - 1).count() == 0)
  }
}
