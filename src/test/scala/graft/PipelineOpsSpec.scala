package graft

import graft.ann.Similarity
import graft.dedup.Dedup
import graft.functions.TextHash
import graft.multimodal.Multimodal
import graft.text.TextFeatures
import org.apache.spark.sql.functions._

class TextFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "der Hund ist nicht da und das ist gut"),
    (3L, "1234 5678 !!!"),
    (4L, "x"),
    (5L, "the cat sat on the mat") // exact dup of 1
  ).toDF("doc_id", "text")

  test("polyHash matches the portable reference value") {
    // duckdb: list_reduce 'hello' → 99162322
    val got = spark.range(1).select(TextHash.polyHash(lit("hello"))).first().getLong(0)
    assert(got == 99162322L)
  }

  test("quality ratios are exact and bounded") {
    val q = TextFeatures.withQuality(docs).where($"doc_id" === 3).first()
    assert(q.getAs[Double]("digit_ratio") == 8.0 / 13.0)
    assert(q.getAs[Double]("punct_ratio") == 3.0 / 13.0)
    val q4 = TextFeatures.withQuality(docs).where($"doc_id" === 4).first()
    assert(q4.getAs[Int]("n_tokens") == 1 && q4.getAs[Double]("mean_token_len") == 1.0)
  }

  test("langid picks the dominant stopword profile") {
    val out = TextFeatures.withLangId(docs).select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(2L) == "de" && out(3L) == "und")
  }

  test("shingles: short docs yield empty set, no failure") {
    val sh = Dedup.shingles(docs).where($"doc_id" === 4).first()
    assert(sh.getAs[Int]("n_shingles") == 0)
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c d e f g h"),
    (2L, "a b c d e f g h"),          // exact dup of 1
    (3L, "a b c d e f g z"),          // near dup of 1
    (4L, "q w e r t y u i")           // unrelated
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per content hash") {
    val out = Dedup.exact(docs).orderBy("doc_id").select("keep").as[Boolean].collect().toSeq
    assert(out == Seq(true, false, true, true))
  }

  test("ngram jaccard finds the near-dup pair, not the unrelated one") {
    val pairs = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    val j12 = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.3)
      .where($"id_a" === 1 && $"id_b" === 2).first().getDouble(2)
    assert(j12 == 1.0)
  }

  test("minhash LSH surfaces exact dup with est 1.0; simhash of dup is equal") {
    val lsh = Dedup.minhashLshPairs(docs, estThreshold = 0.2)
    val est12 = lsh.where($"id_a" === 1 && $"id_b" === 2).first().getDouble(2)
    assert(est12 == 1.0)
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    // near-dup hamming distance is small, unrelated is large
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("brute-force cosine top-k ranks by similarity") {
    val q = vecs.where($"vec_id" === 0).select($"vec_id".as("query_id"), $"embedding")
    val top = Similarity.cosineTopK(q, vecs, k = 3).orderBy("rank")
      .select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L, 3L))
  }

  test("LSH top-1 finds the true nearest neighbor (same-bucket recall)") {
    val q = vecs.where($"vec_id" === 0).select($"vec_id".as("query_id"), $"embedding")
    val top = Similarity.lshTopK(q, vecs, k = 1, planes = 2).select("vec_id").as[Long].collect()
    // bucket of 0 and 1 coincide under any hyperplane set (tiny angle) w.h.p.
    assert(top.isEmpty || top.head == 1L)
  }

  test("IVF top-k: probing every list equals brute force; results deterministic") {
    val q = vecs.where($"vec_id" < 3).select($"vec_id".as("query_id"), $"embedding")
    // nProbe == nCentroids ⇒ exhaustive ⇒ must equal the brute-force ranks
    val ivf = Similarity.ivfTopK(q, vecs, k = 3, nCentroids = 2, nProbe = 2)
    val bf = Similarity.cosineTopK(q, vecs, k = 3)
    assert(ivf.exceptAll(bf).count() == 0 && bf.exceptAll(ivf).count() == 0)
    // determinism: same call twice, identical output
    val again = Similarity.ivfTopK(q, vecs, k = 3, nCentroids = 2, nProbe = 2)
    assert(ivf.exceptAll(again).count() == 0 && again.exceptAll(ivf).count() == 0)
  }
}

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, 30, payloadBytes = 64).cache()

  test("binary payload plumbing: schema, size, determinism") {
    assert(media.schema("media").dataType.typeName == "binary")
    val again = Multimodal.syntheticMedia(spark, 30, payloadBytes = 64)
    assert(media.exceptAll(again).count() == 0)
    assert(media.where(length(col("media")) =!= 64).count() == 0)
  }

  test("batch decode emits features for every row without shuffle") {
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.count() == 30)
    assert(feats.where(col("mean_luma") < 0 || col("mean_luma") > 255).count() == 0)
    assert(feats.where(col("n_bytes") =!= 64).count() == 0)
  }

  test("resize plan preserves aspect and bounds") {
    val planned = Multimodal.withResizePlan(media, 64, 64)
    assert(planned.where(col("target_width") > 64 || col("target_height") > 64).count() == 0)
  }

  test("frame sampler explodes video rows at the requested cadence") {
    val frames = Multimodal.sampleFrames(media, everyMs = 5000)
    val perVid = frames.groupBy("id").count()
    val meta = media.where(col("modality") === "video").select(col("id"), col("meta.duration_ms"))
    val joined = perVid.join(meta, "id")
      .where(col("count") =!= floor((col("duration_ms") - 1) / 5000) + 1)
    assert(joined.count() == 0)
  }
}
