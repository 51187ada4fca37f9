package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level statistics over tokenized sequences (`tokens array` rows —
  * the north-rule input shape). Engine-added surface: the reference has no
  * token pipeline (SURVEY.md §2.9).
  *
  * [[pairCounts]] is the scoring step of one BPE merge iteration (Sennrich
  * et al., "Neural Machine Translation of Rare Words with Subword Units"):
  * count every ADJACENT token pair across the corpus; the argmax pair is
  * the next merge. Tokenizer training at corpus scale runs exactly this
  * distributed count per iteration (the merge apply is a per-row rewrite;
  * the count is the part that needs the cluster). */
object TokenStats {

  /** Adjacent-pair frequencies over `tokensCol`: one row per (tok_a,
    * tok_b) with count `n`. `topK > 0` keeps the K most frequent pairs
    * (ties broken by (tok_a, tok_b) — fully deterministic).
    *
    * Scale shape: the pair explode is per-row (zip of the array against
    * its own tail — no join, no positional shuffle), then ONE
    * map-side-combinable hash aggregate on (tok_a, tok_b) — the only
    * shuffle, carrying one row per distinct pair per map partition, never
    * per token. `topK` plans TakeOrderedAndProject (per-partition heaps +
    * driver merge of K rows), never a global sort. The zip_with is an
    * interpreted HOF but NOT the bottleneck here: the aggregate hash table
    * dominates; the explode feeds it at scan speed. */
  def pairCounts(df: DataFrame, tokensCol: String = "tokens", topK: Int = 0): DataFrame = {
    val t: Column = col(tokensCol)
    val pairs = df
      .where(size(t) >= 2)
      .select(explode(
        zip_with(
          slice(t, lit(1), size(t) - 1),
          slice(t, lit(2), size(t) - 1),
          (a, b) => struct(a.as("tok_a"), b.as("tok_b")))).as("_p"))
      .select(col("_p.tok_a"), col("_p.tok_b"))
    val counts = pairs.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n"))
    if (topK > 0)
      counts.orderBy(col("n").desc, col("tok_a").asc, col("tok_b").asc).limit(topK)
    else counts
  }

  /** One full BPE merge iteration: score all adjacent pairs, elect the
    * most frequent (ties on (tok_a, tok_b) — deterministic), rewrite every
    * sequence with the greedy left-to-right merge
    * ([[graft.functions.TextHash.applyMerge]] codegen kernel). Returns the
    * rewritten frame plus the elected (a, b, count). Tokenizer training
    * loops this; the driver collects exactly ONE row per iteration (the
    * argmax), never token data. */
  def mergeIteration(
      df: DataFrame,
      newId: Long,
      tokensCol: String = "tokens"
  ): (DataFrame, (Long, Long, Long)) = {
    val top = pairCounts(df, tokensCol, topK = 1).collect()
    require(top.nonEmpty, "no adjacent pairs to merge — every sequence is shorter than 2")
    val (a, b, n) = (top(0).getLong(0), top(0).getLong(1), top(0).getLong(2))
    val merged = df.withColumn(tokensCol,
      graft.functions.TextHash.applyMerge(col(tokensCol), a, b, newId))
    (merged, (a, b, n))
  }
}
