package graft

import graft.functions.TextHash
import org.apache.spark.sql.functions._

/** The codegen'd text-hash kernels must agree EXACTLY with the declarative
  * HOF formulations (which the DuckDB oracles mirror) on real driver data,
  * including edge cases (leading/trailing/multiple whitespace, short docs
  * below the shingle width, empty shingle sets). */
class TextKernelParitySpec extends SparkSpec {

  test("polyHash / tokenHashes / shingles / minhash kernels == HOF on driver docs") {
    import spark.implicits._
    val extra = Seq("", "  ", "one", "one two", " padded  words\t here ").toDF("text")
    val t = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).unionByName(extra)

    val cmp = t.select(
      (TextHash.polyHash(col("text")) <=> TextHash.polyHashHof(col("text"))).as("ph"),
      (TextHash.tokenHashes(col("text")) <=> TextHash.tokenHashesHof(col("text"))).as("th"),
      (TextHash.shingleHashes(TextHash.tokenHashes(col("text")), 3) <=>
        TextHash.shingleHashesHof(TextHash.tokenHashesHof(col("text")), 3)).as("sh"),
      (TextHash.minhash(TextHash.shingleHashes(TextHash.tokenHashes(col("text")), 3), 16) <=>
        TextHash.minhashHof(TextHash.shingleHashesHof(TextHash.tokenHashesHof(col("text")), 3), 16)).as("mh")
    )
    val bad = cmp.where(!col("ph") || !col("th") || !col("sh") || !col("mh")).count()
    assert(bad == 0, s"$bad rows diverge between kernel and HOF formulations")
  }
}
