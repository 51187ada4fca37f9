package graft

import graft.dedup.Dedup

/** Substring-level dedup laws on planted repeats: within-doc repeats count,
  * cross-doc repeats merge overlapping slots into one maximal span,
  * touching (end-to-start) spans stay distinct, unique docs are untouched,
  * and every input doc gets exactly one output row. */
class SubstrScrubSpec extends SparkSpec {

  import spark.implicits._

  test("planted repeats: within-doc, cross-doc merge, touching spans, unique doc") {
    val docs = Seq(
      // A: "x y z" planted twice IN ONE DOC with a gap token q between —
      // slots {0, 4} → two spans [0,3) [4,7), token q survives
      (1L, "x y z q x y z"),
      // B & C share the 5-token phrase — slots {1,2,3} / {2,3,4} overlap
      // and must merge into ONE maximal span of 5 tokens each
      (2L, "hb one two three four five tb"),
      (3L, "hc1 hc2 one two three four five"),
      // D: all-unique → zero spans, nothing removed
      (4L, "u1 u2 u3 u4"),
      // E: touching repeat "p q r p q r" — slots {0, 3}: slot 3 lands
      // exactly AT the running end → distinct spans, full coverage
      (5L, "p q r p q r")
    ).toDF("doc_id", "text")
    val got = Dedup.scrubRepeatedSpans(docs, k = 3, minOcc = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got.size == 5, "one output row per input doc")
    assert(got(1L) == ((7, 2, 6, 1)), s"within-doc repeat: got ${got(1L)}")
    assert(got(2L) == ((7, 1, 5, 2)), s"cross-doc merged span: got ${got(2L)}")
    assert(got(3L) == ((7, 1, 5, 2)), s"cross-doc merged span: got ${got(3L)}")
    assert(got(4L) == ((4, 0, 0, 4)), s"unique doc untouched: got ${got(4L)}")
    assert(got(5L) == ((6, 2, 6, 0)), s"touching spans stay distinct: got ${got(5L)}")
  }

  test("guards: minOcc >= 2, k >= 1") {
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Dedup.scrubRepeatedSpans(d, minOcc = 1) }
    intercept[IllegalArgumentException] { Dedup.scrubRepeatedSpans(d, k = 0) }
  }

  test("all-unique corpus: EMPTY hot set broadcasts cleanly, every doc kept whole") {
    val d = Seq((1L, "a b c d"), (2L, "e f g"), (3L, "h i j k l")).toDF("doc_id", "text")
    val got = Dedup.scrubRepeatedSpans(d, k = 3, minOcc = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got == Map(
      1L -> ((4, 0, 0, 4)), 2L -> ((3, 0, 0, 3)), 3L -> ((5, 0, 0, 5))))
  }

  test("hot-set overflow raises LOUDLY with sizing advice, never silently under-scrubs") {
    // 3 distinct repeated shingles ("x y z", "y z q", "z q x" … from the
    // doubled phrase) against maxSetSize = 1: the old orderBy.limit form
    // would silently keep the hottest shingle and miss coverage
    val d = Seq((1L, "x y z q w x y z q w")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.scrubRepeatedSpans(d, k = 3, minOcc = 2, maxSetSize = 1)
    }
    assert(e.getMessage.contains("maxSetSize") && e.getMessage.contains("minDf/minOcc"),
      s"expected sizing advice, got: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.boilerplateSpans(
        Seq((1L, "x y z w"), (2L, "x y z w")).toDF("doc_id", "text"), minDf = 2, maxSetSize = 1)
    }
    assert(e2.getMessage.contains("maxSetSize"))
  }
}
