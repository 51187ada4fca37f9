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

  // probe working sets are built ONCE (untimed setup either way, but the
  // per-call rebuild — a 512 MiB fill and a 32M-step Sattolo shuffle —
  // would inject minutes of allocation/GC churn between the very reps the
  // bench is measuring); contents are deterministic, so cached probes are
  // byte-identical to rebuilt ones
  @volatile private var membwArrRef: Array[Long] = null
  private def membwArr: Array[Long] = {
    var arr = membwArrRef
    if (arr == null) {
      arr = new Array[Long](64 * 1024 * 1024) // 512 MiB
      java.util.Arrays.fill(arr, 0x0123456789ABCDEFL)
      membwArrRef = arr
    }
    arr
  }

  /** Drop the cached probe working sets (768 MiB total) — call after the
    * last timed leg so a long-lived JVM does not keep them pinned. */
  def release(): Unit = { membwArrRef = null; chaseCycleRef = null }

  /** Wall seconds for `threads` full streaming passes over one shared
    * 512 MiB long array (total traffic = threads x 512 MiB reads). */
  def membwControl(threads: Int): Double = {
    val arr = membwArr
    val n = arr.length
    val t0 = System.nanoTime()
    parallel(threads) { i =>
      var s = 0L
      var j = 0
      while (j < n) { s += arr(j); j += 1 }
      s + i
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** Wall seconds for `threads` concurrent pointer-chase walks (4 M steps
    * each) over one shared 256 MiB random-cycle array — DRAM/LLC LATENCY
    * under load, the access pattern of the sort/UnsafeRow-heavy window
    * stage (sequential-bandwidth and ALU probes measured healthy next to
    * 7x-degraded window legs; this is the probe that should move if the
    * host contends on memory latency). */
  @volatile private var chaseCycleRef: Array[Int] = null
  private def chaseCycle: Array[Int] = {
    val cached = chaseCycleRef
    if (cached != null) return cached
    val n = 32 * 1024 * 1024 // ints = 256 MiB working set as a cycle
    val next = new Array[Int](n)
    // Sattolo's algorithm with a fixed xorshift stream: one full cycle
    var i = 0
    while (i < n) { next(i) = i; i += 1 }
    var x = 0x9E3779B97F4A7C15L
    i = n - 1
    while (i > 0) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      val j = ((x & Long.MaxValue) % i).toInt // 0 <= j < i: stays one cycle
      val t = next(i); next(i) = next(j); next(j) = t
      i -= 1
    }
    chaseCycleRef = next
    next
  }

  def chaseControl(threads: Int): Double = {
    val next = chaseCycle
    val n = next.length
    val t0 = System.nanoTime()
    parallel(threads) { tid =>
      var p = (tid * 2654435761L % n).toInt
      if (p < 0) p += n
      var s = 0L
      var k = 0
      while (k < (1 << 22)) { p = next(p); s += p; k += 1 }
      s
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** Wall seconds to write 128 MiB to the shuffle-local tmp dir, fsync,
    * read it back, delete — the disk-weather probe (shuffle write/read
    * stalls land in executorRunTime and would mimic a slow window stage). */
  def diskControl(): Double = {
    val f = java.io.File.createTempFile("graft_diskprobe_", ".bin")
    val buf = new Array[Byte](1 << 20)
    java.util.Arrays.fill(buf, 0x5A.toByte)
    val t0 = System.nanoTime()
    val out = new java.io.FileOutputStream(f)
    var i = 0
    while (i < 128) { out.write(buf); i += 1 }
    out.getFD.sync()
    out.close()
    val in = new java.io.FileInputStream(f)
    var s = 0L
    var r = in.read(buf)
    while (r > 0) { s += buf(0); r = in.read(buf) }
    in.close()
    sink ^= s
    f.delete()
    (System.nanoTime() - t0) / 1e9
  }
}
