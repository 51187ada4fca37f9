package graft

import org.apache.spark.sql.SparkSession

/** Extra measurement main (guide §1.4): isolate named declared queries with
  * the noop sink, per-rep wall + task-time + per-stage log, and job labels.
  * Does NOT replace graft.Bench (frozen) — numbers cited in
  * OPTIMIZATION_r06.md only. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchExtra <reps> <q1> <q2> ..."
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.windowExec.buffer.in.memory.threshold", "1048576")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val taskRun = new java.util.concurrent.atomic.AtomicLong(0L)
    val stageLog = sys.env.get("SPARK_GRAFT_STAGE_LOG").contains("1")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        taskRun.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        if (stageLog) {
          val si = sc.stageInfo
          val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
          System.err.println(
            f"[stage ${si.stageId}%4d] tasks=${si.numTasks}%4d wall=$wall%7.2fs taskTime=${si.taskMetrics.executorRunTime / 1e3}%8.2fs gc=${si.taskMetrics.jvmGCTime / 1e3}%6.2fs shufR=${si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB shufW=${si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB ${si.name.takeWhile(_ != '\n')}")
        }
      }
    })

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        spark.sparkContext.setJobDescription(s"$name rep $i")
        val r0 = taskRun.get()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400)
        val alu = Controls.aluControl(cpus.toInt)
        println(f"[benchextra] $name rep $i wall=$wall%.3f s task=${(taskRun.get() - r0) / 1e3}%.2f s alu=$alu%.3f")
      }
    }
    Controls.release()
    spark.stop()
  }
}
