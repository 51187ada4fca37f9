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
}
