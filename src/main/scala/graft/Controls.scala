package graft

/** Host-weather control probes for the benchmark (BENCH.md §weather).
  *
  * This VM's Spark wall times swing up to 8x between IDENTICAL reps in one
  * JVM (round-2 postmortem: the same window stage measured 14.5s and 119s
  * minutes apart on a byte-identical plan). The probes separate "the code
  * got slower" from "the box got slower": fixed pure-JVM work, no Spark,
  * measured in the same process right after the timed legs.
  *
  *  - [[aluControl]]: register-resident xorshift64 — no memory traffic;
  *    slow ⇒ CPU steal / frequency throttling.
  *  - [[membwControl]]: every thread streams a shared 512 MiB long array —
  *    pure read bandwidth; slow with normal ALU ⇒ memory-bandwidth
  *    contention (the signature that hits the sort/UnsafeRow-heavy window
  *    stage while leaving the cache-resident grouped kernel untouched).
  */
object Controls {

  @volatile private var sink: Long = 0L // defeats dead-code elimination

  private def parallel(threads: Int)(work: Int => Long): Unit = {
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => { sink ^= work(i) })
      t.start(); t
    }
    ts.foreach(_.join())
  }

  /** Wall seconds for `threads` x 2^28 xorshift64 steps (one per core). */
  def aluControl(threads: Int): Double = {
    val t0 = System.nanoTime()
    parallel(threads) { i =>
      var x = 0x9E3779B97F4A7C15L + i
      var s = 0L
      var n = 0L
      val iters = 1L << 28
      while (n < iters) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        s += x; n += 1
      }
      s
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** Wall seconds for `threads` full streaming passes over one shared
    * 512 MiB long array (total traffic = threads x 512 MiB reads). */
  def membwControl(threads: Int): Double = {
    val n = 64 * 1024 * 1024 // longs = 512 MiB
    val arr = new Array[Long](n)
    java.util.Arrays.fill(arr, 0x0123456789ABCDEFL)
    val t0 = System.nanoTime()
    parallel(threads) { i =>
      var s = 0L
      var j = 0
      while (j < n) { s += arr(j); j += 1 }
      s + i
    }
    (System.nanoTime() - t0) / 1e9
  }
}
