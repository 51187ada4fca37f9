package graft.pipeline

import graft.core.TokenAdapter
import graft.features.Kinematic
import graft.session.Sessionize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE flagship job, defined once (Bench times it, Explain audits its plan,
  * RunPipeline ships it): tokenized sequences → fused 8-feature kinematic
  * window chain → gap sessionize → consume-all per-doc aggregate (every
  * feature summed so column pruning cannot drop any of the work).
  *
  * `preShuffleCompact` hash-clusters the SEQUENCE rows before the explode
  * (~4 B/token through the exchange instead of ~28 B; GenerateExec
  * preserves the partitioning so the window plans no second exchange) —
  * the cluster-scale default, measured in BENCH.md. */
object FlagshipJob {

  val GapSeconds = 1.5

  def windowConsumeAll(corpus: DataFrame, preShuffleCompact: Boolean = true): DataFrame = {
    val clustered = if (preShuffleCompact) corpus.repartition(col("doc_id")) else corpus
    val (grid, ts) = TokenAdapter.explodeTokens(clustered)
    val ses = Sessionize.byGap(Kinematic.withKinematics(grid, ts), ts, GapSeconds)
    val aggs = Kinematic.AllFeatures.map(f => sum(col(f)).as(s"sum_$f")) :+
      max(col("session_id")).as("n_sessions") :+ count(lit(1)).as("n")
    ses.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Same result through the shuffle-free typed kernel (pre-grouped path;
    * TokenKernelSpec proves equality). */
  def groupedConsumeAll(corpus: DataFrame): DataFrame =
    graft.features.TokenKernel.docVectors(corpus, stepSec = 1L, gapSeconds = GapSeconds).toDF()

  /** Same result over the UNGROUPED grid through the re-group route
    * (VERDICT r4 #1): explode (narrow) → one packed-long collect_list
    * exchange → per-doc kernel. No sort, no window frames — the
    * general-path replacement when the input is not pre-grouped.
    * `preShuffleCompact` mirrors [[windowConsumeAll]]'s A/B knob: cluster
    * the compact SEQUENCE rows first so the explode + re-group aggregate
    * plan NO further exchange (GenerateExec preserves partitioning). */
  def regroupConsumeAll(
      corpus: DataFrame,
      preShuffleCompact: Boolean = false,
      // sort-grouped is the DEFAULT: conf-independent (no
      // objectHashAggregate fallback-threshold sensitivity), measured
      // faster and stabler (BENCH.md §Round 5); the collect_list agg
      // route is the opt-in for network-constrained clusters (37% fewer
      // shuffle bytes via map-side list packing)
      sortImpl: Boolean = true,
      numPartitions: Option[Int] = None): DataFrame = {
    val clustered = if (preShuffleCompact) corpus.repartition(col("doc_id")) else corpus
    val (grid, _) = TokenAdapter.explodeTokens(clustered)
    if (sortImpl)
      graft.features.TokenKernel.regroupDocVectorsSorted(
        grid, stepSec = 1L, gapSeconds = GapSeconds, numPartitions = numPartitions).toDF()
    else
      graft.features.TokenKernel.regroupDocVectors(
        grid, stepSec = 1L, gapSeconds = GapSeconds, numPartitions = numPartitions).toDF()
  }
}
