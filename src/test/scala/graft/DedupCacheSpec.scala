package graft

import graft.dedup.Dedup

/** The banded dedup operators must not leave their (corpus-sized)
  * signature caches pinned in executor storage after the pairs are
  * computed: with the eager default, the only persisted blocks that may
  * survive the call are the materialized (small) pair result itself. */
class DedupCacheSpec extends SparkSpec {

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("minhashLshPairs releases the signature cache; eager == lazy result") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val eager = Dedup.minhashLshPairs(docs, k = 3, numHashes = 16, bands = 4, estThreshold = 0.25)
    eager.count()
    val extra = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(extra.size <= 1, s"signature cache survived the operator: $extra")

    val lazyOut = Dedup.minhashLshPairs(
      docs, k = 3, numHashes = 16, bands = 4, estThreshold = 0.25, eager = false)
    assert(eager.exceptAll(lazyOut).isEmpty && lazyOut.exceptAll(eager).isEmpty)
    spark.sparkContext.getPersistentRDDs.keys.foreach(id =>
      if (!before.contains(id)) spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
  }

  test("simhashHammingPairs releases the simhash cache") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Dedup.simhashHammingPairs(docs, maxHamming = 2)
    out.count()
    val extra = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(extra.size <= 1, s"simhash cache survived the operator: $extra")
  }
}
