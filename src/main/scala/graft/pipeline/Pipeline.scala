package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Stage runner with per-stage lineage, metrics, and checkpoint/resume
  * (north rule: "each stage writes per-partition lineage and metrics and is
  * resumable from Iceberg snapshot + checkpoint").
  *
  * No Iceberg runtime ships in /opt/spark/jars (SURVEY.md §7.4#5), so the
  * table format is a seam: [[TableFormat.HadoopParquet]] emulates the parts
  * of Iceberg semantics the engine relies on — an atomic snapshot id per
  * committed stage + a manifest of completed work units — behind the same
  * API an Iceberg-backed implementation would use (`spark.table` +
  * snapshot pinning). Swapping in Iceberg changes [[TableFormat]] only.
  *
  * Work-unit model: a stage processes the input one bucket at a time
  * (bucket = deterministic partition of the entity space,
  * `pmod(xxhash64(entity), nBuckets)`). Completed buckets are recorded in
  * the manifest; a re-run anti-joins the manifest and processes only the
  * remainder — crash-resume without recomputation. Metrics come from
  * `Dataset.observe` (no extra pass over the data).
  */
object Pipeline {

  /** Lineage record for one committed work unit. */
  case class UnitCommit(
      stage: String,
      bucket: Int,
      snapshotId: Long,
      rows: Long,
      metricsJson: String,
      wallMs: Long
  )

  trait TableFormat {
    def writeBucket(df: DataFrame, stage: String, bucket: Int): Unit
    def readStage(spark: SparkSession, stage: String): DataFrame
  }

  /** Partitioned-parquet emulation of the Iceberg surface: one directory
    * per (stage, bucket); snapshot id = manifest line count at commit. */
  class HadoopParquet(root: String) extends TableFormat {
    def path(stage: String, bucket: Int) = s"$root/$stage/bucket=$bucket"
    override def writeBucket(df: DataFrame, stage: String, bucket: Int): Unit =
      df.write.mode("overwrite").parquet(path(stage, bucket))
    override def readStage(spark: SparkSession, stage: String): DataFrame =
      spark.read.option("basePath", s"$root/$stage").parquet(s"$root/$stage/bucket=*")
  }

  class Runner(val root: String, val format: TableFormat) {

    private def manifestPath(stage: String) = Paths.get(s"$root/_manifest_$stage.jsonl")

    def completedBuckets(stage: String): Set[Int] = {
      val p = manifestPath(stage)
      if (!Files.exists(p)) Set.empty
      else {
        import scala.jdk.CollectionConverters._
        Files.readAllLines(p).asScala
          .flatMap(l => "\"bucket\":(\\d+)".r.findFirstMatchIn(l).map(_.group(1).toInt))
          .toSet
      }
    }

    private def appendManifest(stage: String, c: UnitCommit): Unit = {
      val line =
        s"""{"stage":"${c.stage}","bucket":${c.bucket},"snapshot_id":${c.snapshotId},"rows":${c.rows},"wall_ms":${c.wallMs},"metrics":${c.metricsJson}}\n"""
      Files.createDirectories(manifestPath(stage).getParent)
      Files.writeString(
        manifestPath(stage), line,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND
      )
    }

    /** Run a stage over `nBuckets` deterministic entity buckets, skipping
      * buckets already in the manifest (resume), observing row/metric
      * counts per bucket, committing lineage after each bucket write.
      *
      * `transform` must be a per-entity-local computation (window/agg keyed
      * by the entity) so bucket-parallel evaluation is semantics-preserving.
      */
    def runStage(
        stage: String,
        input: DataFrame,
        entityCol: String,
        nBuckets: Int
    )(transform: DataFrame => DataFrame): Seq[UnitCommit] = {
      val done = completedBuckets(stage)
      val bucketed = input.withColumn("_bucket", pmod(xxhash64(col(entityCol)), lit(nBuckets)).cast("int"))
      var snapshot = done.size.toLong
      val commits = (0 until nBuckets).filterNot(done.contains).map { b =>
        val t0 = System.nanoTime()
        val obs = Observation(s"${stage}_${b}_${System.nanoTime()}")
        val out = transform(bucketed.where(col("_bucket") === b).drop("_bucket"))
          .observe(obs, count(lit(1)).as("rows"))
        format.writeBucket(out, stage, b)
        val rows = obs.get.getOrElse("rows", 0L).asInstanceOf[Long]
        snapshot += 1
        val c = UnitCommit(
          stage, b,
          snapshotId = snapshot,
          rows = rows,
          metricsJson = s"""{"rows":$rows}""",
          wallMs = (System.nanoTime() - t0) / 1000000
        )
        appendManifest(stage, c)
        c
      }
      commits
    }

    def readStage(spark: SparkSession, stage: String): DataFrame = format.readStage(spark, stage)
  }

  def local(root: String): Runner = new Runner(root, new HadoopParquet(root))
}
