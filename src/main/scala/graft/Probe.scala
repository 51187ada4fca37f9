package graft

/** Host-weather probe main (no Spark session): prints the four Controls
  * probes as one JSON line. Used to GATE benchmark legs on the documented
  * good band (BENCH.md §Host weather — ALU ≤ ~0.85 s on this VM) without
  * paying an sbt/Spark startup: `bash tools/bench_java.sh graft.Probe`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.flatMap(_.toIntOption).getOrElse(16)
    val alu = Controls.aluControl(threads)
    val membw = Controls.membwControl(threads)
    val chase = Controls.chaseControl(threads)
    val disk = Controls.diskControl()
    Controls.release()
    val regime = if (alu <= 0.85) "good" else "degraded"
    println(f"""{"alu":$alu%.3f,"membw":$membw%.3f,"chase":$chase%.3f,"disk":$disk%.3f,"threads":$threads,"regime":"$regime"}""")
  }
}
