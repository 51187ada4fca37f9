package graft.sample

import graft.functions.TextHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines (engine-added;
  * the reference has no sampling surface — SURVEY.md §2.9).
  *
  * All selection is PURE HASH ARITHMETIC over the row key (the portable
  * [[TextHash]] affine family, not `rand()`/`sample()`), which buys the
  * three properties production pipelines actually need:
  *
  *   - REPEATABLE: the same (key, seed, fraction) keeps the same rows on
  *     every run, every executor count, every retry — no RNG state;
  *   - CONSISTENT ACROSS TABLES: any table keyed by the same id samples the
  *     SAME entities, so features/labels/metadata stay joinable;
  *   - MONOTONE IN FRACTION: the 10% sample is a superset of the 1% sample
  *     (selection is `bucket < fraction·M`), so sweeps nest.
  *
  * And it is oracle-able bit-for-bit in any engine (plain integer SQL). */
object Sampling {

  /** Number of hash buckets the unit interval is quantized to. */
  val Buckets: Long = 1000000L

  /** The key column as a hashable long, resolved against `df`'s schema:
    * integral keys by value, string keys via the portable polyHash — any
    * other type is rejected LOUDLY (a silent `cast("long")` on e.g. a UUID
    * would null out and sample ZERO rows with no error). */
  private[sample] def keyed(df: DataFrame, key: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType => col(key).cast("long")
      case StringType                                    => TextHash.polyHash(col(key))
      case other =>
        throw new IllegalArgumentException(s"sampling key '$key' must be integral or string, got $other")
    }
  }

  /** Uniform sample bucket in [0, [[Buckets]]) for an already-long key
    * expression: affine(pmod(key, P), seed-salt) mod Buckets. */
  def bucket(key: Column, seed: Int = 0): Column =
    TextHash.affine(pmod(key.cast("long"), lit(TextHash.P)), seed) % Buckets

  /** Keep ~`fraction` of rows, decided by the key hash alone. */
  def byHash(df: DataFrame, fraction: Double, key: String, seed: Int = 0): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    df.where(bucket(keyed(df, key), seed) < (fraction * Buckets).toLong)
  }

  /** Per-stratum fractions (e.g. per-language corpus mixing): rows in a
    * stratum listed in `fractions` keep its rate; unlisted strata keep
    * `defaultFraction`. One scan, no shuffle — the mixing weights of a
    * 100-TB pretraining corpus as a WHERE clause. */
  def stratified(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      key: String,
      defaultFraction: Double = 0.0,
      seed: Int = 0
  ): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val threshold = fractions.foldLeft(lit((defaultFraction * Buckets).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.where(bucket(keyed(df, key), seed) < threshold)
  }
}

/** Sequence packing: assign documents to fixed token-budget bins — the
  * standard pretraining step that concatenates documents up to a context
  * window. The distributed formulation is CONTIGUOUS packing: within each
  * (partition key, deterministic order), bin id = ⌊(cumulative tokens −
  * n_tok) / budget⌋ — one window cumsum, no sequential packer, documents
  * larger than the budget get their own bin(s). Greedy first-fit packs
  * marginally tighter but is inherently sequential; contiguous packing is
  * the shape that parallelizes (and what large pipelines actually run). */
object TokenPacking {

  /** Adds `bin_id` (0-based per packing stream) and `bin_offset` (the doc's
    * first-token offset inside its stream). Deterministic order: orderCol
    * ascending within a stream.
    *
    * SCALE KNOB: the cumsum is sequential WITHIN a window partition, so one
    * giant source would serialize on a single task. `shards > 1` splits each
    * source into `shards` independent packing streams by the portable hash
    * of `orderCol` (each stream packs separately — exactly how production
    * packers parallelize; bins never span shards). The output gains the
    * `shard` column; shards = 1 keeps the single-stream layout. */
  def contiguous(
      df: DataFrame,
      budget: Int,
      nTokCol: String = "n_tok",
      partCol: String = "source",
      orderCol: String = "doc_id",
      shards: Int = 1
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards >= 1, "shards must be >= 1")
    val base = if (shards == 1) df.withColumn("_shard", lit(0L))
      else df.withColumn("_shard", Sampling.bucket(Sampling.keyed(df, orderCol)) % shards)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol), col("_shard")).orderBy(col(orderCol))
    val cum = sum(col(nTokCol)).over(w)
    val out = base.withColumn("_cum", cum)
      .withColumn("bin_id", floor((col("_cum") - col(nTokCol)).cast("double") / budget).cast("long"))
      .withColumn("bin_offset", col("_cum") - col(nTokCol))
      .drop("_cum")
    if (shards == 1) out.drop("_shard") else out.withColumnRenamed("_shard", "shard")
  }
}
