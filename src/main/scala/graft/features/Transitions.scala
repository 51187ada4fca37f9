package graft.features

import graft.core.TrajSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order state-transition statistics over per-entity event
  * sequences: for a categorical column (event type, mode label, grid
  * cell), count each (state → next state) step across all entities and
  * derive the empirical transition probability — the Markov-chain view of
  * a behavior log, and the standard categorical-sequence feature a
  * training pipeline derives before embedding (next-action priors,
  * anomaly scores against the transition matrix, session-shape features).
  *
  * Laws: steps are consecutive rows of one entity in (ts, tie-break)
  * order — the LAST row of an entity has no successor and contributes no
  * step; `p` is row-count-normalized per SOURCE state (Σ p over next
  * states = 1 for every state with ≥ 1 outgoing step).
  *
  * Scale shape: ONE exchange + sort on the entity for the `lead` (the
  * same clustering every sequence operator here shares — already-bucketed
  * inputs skip it), then ONE map-side-combinable aggregate on (state,
  * next_state) whose output is |states|² rows at most; the per-state
  * normalizer is a window over that TINY aggregate, never over the event
  * grid. */
object Transitions {

  /** One row per observed (state, next_state) with step count `n` and
    * per-source-state probability `p`. */
  def transitionCounts(df: DataFrame, s: TrajSchema, stateCol: String): DataFrame = {
    val w = Window.partitionBy(s.idCol).orderBy(s.ordering: _*)
    val steps = df
      .select(s.idCol, col(stateCol).as("state"),
        lead(col(stateCol), 1).over(w).as("next_state"))
      .where(col("next_state").isNotNull)
    val counts = steps.groupBy("state", "next_state").agg(count(lit(1)).as("n"))
    val norm = Window.partitionBy(col("state"))
    counts.withColumn("p", col("n").cast("double") / sum(col("n")).over(norm).cast("double"))
  }
}
