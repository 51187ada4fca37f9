package graft

import graft.core.{SyntheticCorpus, TokenAdapter}
import graft.features.Kinematic
import graft.session.Sessionize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main.
  *
  * Headline metric (BASELINE.md): feature-vector THROUGHPUT in tokens/sec
  * for the full kinematic + session feature set over the tokenized-sequence
  * table (doc_id, tokens array<int32>, n_tok, source) — deterministic
  * synthetic corpus, seed 42, heavy-tailed lengths. The scaling protocol
  * (local[8] vs local[32] on identical input) is driven by
  * SPARK_GRAFT_CPUS; tools/run_scaling.sh sweeps it and writes BENCH.md.
  *
  * Prints ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},
  *    "sf":"...","cpus":N,"tokens":T,"flagship_sec":s,"tokens_per_sec":r}
  */
object Bench {

  /** The flagship pipeline: scan → explode → fused 8-feature window →
    * gap sessionize → consume EVERY feature (so column pruning cannot drop
    * any of the work). One shuffle for the window chain + one for the agg. */
  def flagship(spark: SparkSession, corpusPath: String): (Long, DataFrame) = {
    val corpus = spark.read.parquet(corpusPath)
    val (grid, ts) = TokenAdapter.explodeTokens(corpus)
    val kin = Kinematic.withKinematics(grid, ts)
    val ses = Sessionize.byGap(kin, ts, gapSeconds = 1.5)
    val aggs = Kinematic.AllFeatures.map(f => sum(col(f)).as(s"sum_$f")) :+
      max(col("session_id")).as("n_sessions") :+ count(lit(1)).as("n")
    val out = ses.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val tokens = corpus.agg(sum(col("n_tok"))).first().getLong(0)
    (tokens, out)
  }

  private def ensureCorpus(spark: SparkSession, nDocs: Long): String = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_corpus_$nDocs"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      SyntheticCorpus.generate(spark, nDocs)
        .repartition(64)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "200000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- per-operator queries on the driver-provided SF dir ---
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // --- flagship token-throughput (1 warmup + reps, median) ---
    val corpusPath = ensureCorpus(spark, nDocs)
    val (tokens, _) = flagship(spark, corpusPath)
    def once(): Double = {
      val t0 = System.nanoTime()
      flagship(spark, corpusPath)._2.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup
    val times = (1 to reps).map(_ => once()).sorted
    val flagshipSec = times(times.length / 2)
    val tps = tokens / flagshipSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + flagshipSec
    val totalS = f"$total%.3f"
    val flagS = f"$flagshipSec%.3f"
    println(
      s"""{"metric":"total","value":$totalS,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"tokens":$tokens,"flagship_sec":$flagS,"tokens_per_sec":${tps.toLong}}"""
    )
    spark.stop()
  }
}
