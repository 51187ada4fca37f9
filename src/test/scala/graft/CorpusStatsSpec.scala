package graft

import graft.dedup.Dedup
import graft.text.CorpusStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-computed parity for the corpus-level text statistics: the unigram
  * LM score (incl. the vocab cap's OOV path), TF-IDF top-k ranking, and
  * corpus-internal boilerplate spans (df threshold, position emission, hot
  * set cap ordering). */
class CorpusStatsSpec extends SparkSpec {

  private def corpus: DataFrame = {
    val sq = spark
    import sq.implicits._
    // counts: a=5, b=3, c=2, z=1  (total 11)
    Seq(
      (0L, "a a b c"),
      (1L, "a b z"),
      (2L, "a a b c")
    ).toDF("doc_id", "text")
  }

  test("unigramLogProb matches the hand-computed mean -ln(c/T)") {
    val out = CorpusStats.unigramLogProb(corpus).orderBy("doc_id").collect()
    val T = 11.0
    def lp(c: Double) = -math.log(c / T)
    val exp = Seq(
      (0L, 4L, 0L, (lp(5) + lp(5) + lp(3) + lp(2)) / 4.0),
      (1L, 3L, 0L, (lp(5) + lp(3) + lp(1)) / 3.0),
      (2L, 4L, 0L, (lp(5) + lp(5) + lp(3) + lp(2)) / 4.0)
    )
    assert(out.length == 3)
    out.zip(exp).foreach { case (row, (id, n, oov, s)) =>
      assert(row.getLong(0) == id && row.getLong(1) == n && row.getLong(2) == oov)
      assert(math.abs(row.getDouble(3) - s) < 1e-12, s"doc $id: ${row.getDouble(3)} vs $s")
    }
  }

  test("vocab cap marks tail tokens OOV and scores them as count-1 singletons") {
    // cap 2 keeps {a, b}; c (count 2) and z (count 1) both score as count 1
    val out = CorpusStats.unigramLogProb(corpus, vocabCap = 2).orderBy("doc_id").collect()
    val T = 11.0
    def lp(c: Double) = -math.log(c / T)
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L)) // one OOV token each
    val exp0 = (lp(5) + lp(5) + lp(3) + lp(1)) / 4.0 // c scored at count 1
    assert(math.abs(out(0).getDouble(3) - exp0) < 1e-12)
  }

  test("tfidfTopK ranks by tf·idf with the term tie-break") {
    val sq = spark
    import sq.implicits._
    // N = 3; df: x=3 (everywhere), y=2, q=1
    val d = Seq(
      (0L, "x x y q"), // tf: x=2, y=1, q=1
      (1L, "x y"),
      (2L, "x")
    ).toDF("doc_id", "text")
    val out = CorpusStats.tfidfTopK(d, k = 2)
      .orderBy("doc_id", "rank").collect()
    def idf(dfq: Double) = math.log(4.0 / (dfq + 1.0)) + 1.0
    // doc 0: x = 2·idf(3) = 2·1.0 = 2.0, q = 1·idf(1) = 1.693…,
    //        y = 1·idf(2) = 1.287… → top2 = x, q
    val d0 = out.filter(_.getLong(0) == 0L)
    assert(d0.map(_.getString(1)).toSeq == Seq("x", "q"))
    assert(math.abs(d0(0).getDouble(4) - 2 * idf(3)) < 1e-12)
    assert(math.abs(d0(1).getDouble(4) - idf(1)) < 1e-12)
    assert(d0.map(_.getInt(5)).toSeq == Seq(1, 2))
    // doc 2 has a single term → a single row even though k = 2
    assert(out.count(_.getLong(0) == 2L) == 1)
    // equal (tf, df) ⇒ exact score tie ⇒ term asc breaks it: doc 1 x vs y
    // differ in df, but y(df=2) idf 1.287 > x(df=3) 0.712 → y first
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getString(1)).toSeq == Seq("y", "x"))
  }

  test("boilerplateSpans finds df>=minDf shingles at their token positions") {
    val sq = spark
    import sq.implicits._
    // "p q r" appears in docs 0,1,2 (df=3); "u v w" only in doc 0 (df=1)
    val d = Seq(
      (0L, "p q r u v w"),
      (1L, "z p q r z"),
      (2L, "p q r"),
      (3L, "m n o")
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateSpans(d, minDf = 3)
      .select("doc_id", "tok_pos", "df").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0, 3L), (1L, 1, 3L), (2L, 0, 3L)))
  }

  test("boilerplateSpans maxSetSize overflow raises LOUDLY (no silent top-cap)") {
    val sq = spark
    import sq.implicits._
    // both "a b c" (df 3) and "d e f" (df 2) clear minDf = 2; cap 1 must
    // RAISE with sizing advice — the old behavior silently kept only the
    // hottest shingle, under-reporting boilerplate with no signal
    val d = Seq(
      (0L, "a b c d e f"),
      (1L, "a b c d e f"),
      (2L, "a b c"),
      (3L, "x y z")
    ).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.boilerplateSpans(d, minDf = 2, maxSetSize = 1)
    }
    assert(e.getMessage.contains("maxSetSize") && e.getMessage.contains("minDf"),
      s"expected sizing advice, got: ${e.getMessage}")
    // a cap that FITS the whole hot set (4 shingles clear minDf = 2:
    // "a b c" df 3, "b c d"/"c d e"/"d e f" df 2) changes nothing
    val out = Dedup.boilerplateSpans(d, minDf = 2, maxSetSize = 4)
      .select("doc_id", "tok_pos", "df").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set(
      (0L, 0, 3L), (0L, 1, 2L), (0L, 2, 2L), (0L, 3, 2L),
      (1L, 0, 3L), (1L, 1, 2L), (1L, 2, 2L), (1L, 3, 2L),
      (2L, 0, 3L)))
  }
}
