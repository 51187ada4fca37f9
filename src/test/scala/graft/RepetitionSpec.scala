package graft

import graft.text.TextFeatures
import org.apache.spark.sql.functions._

/** Hand-computed repetition metrics (Gopher/FineWeb-style quality
  * signals): dup fraction = (slots − distinct)/slots, top fraction =
  * mode count / slots. */
class RepetitionSpec extends SparkSpec {

  test("dup/top n-gram fractions match hand counts") {
    val sq = spark
    import sq.implicits._
    val df = Seq(
      (1L, "a b a b c"), // 2-grams: ab ba ab bc -> n=4 d=3 top=2; 3-grams all distinct
      (2L, "x x x x"),   // 2-grams: xx xx xx -> dup 2/3, top 3/3; 3-grams: xxx xxx -> dup 1/2
      (3L, "solo"),      // no grams -> all 0
      (4L, "")           // no tokens -> all 0
    ).toDF("doc_id", "text")
    val got = TextFeatures.withRepetition(df)
      .select(col("doc_id"), col("dup_2gram_frac"), col("dup_3gram_frac"), col("top_2gram_frac"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L) == ((0.25, 0.0, 0.5)))
    assert(got(2L) == ((2.0 / 3.0, 0.5, 1.0)))
    assert(got(3L) == ((0.0, 0.0, 0.0)))
    assert(got(4L) == ((0.0, 0.0, 0.0)))
  }
}
