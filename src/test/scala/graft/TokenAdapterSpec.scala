package graft

import graft.core.{SyntheticCorpus, TokenAdapter}
import graft.features.Kinematic
import org.apache.spark.sql.functions._

/** North-rule invariants: per-row token-array equality through the pipeline,
  * zero temporal leakage of windowed features, determinism of the synthetic
  * corpus. */
class TokenAdapterSpec extends SparkSpec {

  private lazy val corpus = SyntheticCorpus.generate(spark, nDocs = 60, medianLen = 32, skewEvery = 20, skewFactor = 10).cache()

  test("explode → feature pipeline → reassemble round-trips token arrays exactly") {
    val (grid, ts) = TokenAdapter.explodeTokens(corpus)
    val featured = Kinematic.withKinematics(grid, ts) // features must not disturb the payload
    assert(TokenAdapter.tokensMatch(corpus, TokenAdapter.reassemble(featured)) == 0L)
  }

  test("n_tok equals size(tokens) and corpus is deterministic") {
    assert(corpus.where(size(col("tokens")) =!= col("n_tok")).count() == 0)
    val again = SyntheticCorpus.generate(spark, nDocs = 60, medianLen = 32, skewEvery = 20, skewFactor = 10)
    assert(corpus.exceptAll(again).count() == 0 && again.exceptAll(corpus).count() == 0)
  }

  test("skewed docs exist (heavy tail for salting tests)") {
    val lens = corpus.agg(max(col("n_tok")), expr("percentile(n_tok, 0.5)")).first()
    assert(lens.getInt(0) > 5 * lens.getDouble(1))
  }

  test("zero temporal leakage: feature at (e, pos) invariant under deleting later rows") {
    val (grid, ts) = TokenAdapter.explodeTokens(corpus)
    val cut = 10
    val full = Kinematic.withKinematics(grid, ts).where(col("pos") < cut)
    val trimmed = Kinematic.withKinematics(grid.where(col("pos") < cut), ts)
    val cols = Seq("doc_id", "pos") ++ Kinematic.AllFeatures
    val a = full.select(cols.map(col): _*)
    val b = trimmed.select(cols.map(col): _*)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
