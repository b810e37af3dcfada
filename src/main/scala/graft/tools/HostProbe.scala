package graft.tools

/** Pre-timing host hygiene in one command — the round-17 forensics
  * distilled: before trusting any measurement on this box, check (in
  * order of how often each has actually contaminated a round)
  *
  *   1. the 1-min load average (live co-tenant JVMs — the r15
  *      orphaned-sweep incident),
  *   2. the 15-min load average (the decay tail of recent heavy work
  *      — the r16 BENCH artifact incident),
  *   3. hypervisor steal measured over a live window (a noisy
  *      co-tenant VM — the r17 102→132 s drift, invisible to BOTH
  *      load windows), and
  *   4. a fixed single-thread CPU microbenchmark (absolute
  *      calibration: the same spin loop should cost the same
  *      milliseconds on a healthy box, whatever /proc claims).
  *
  * Prints one line per signal plus a PASS/WAIT verdict against the
  * bench gate's thresholds. No Spark session — this must be cheap
  * enough to run before every timing session without becoming the
  * contamination it screens for.
  *
  * Run: sbt "runMain graft.tools.HostProbe"
  */
object HostProbe {

  private def spin(ms: Long): Double = {
    // fixed work unit: 20M multiply-adds per rep, reps until `ms`
    // elapsed; returns ns per rep (lower = healthier)
    val t0 = System.nanoTime()
    var reps = 0L
    var sink = 0.0
    while ((System.nanoTime() - t0) < ms * 1000000L) {
      var i = 0
      var x = 1.000000001
      while (i < 20000000) { x = x * 1.000000001 + 1e-12; i += 1 }
      sink += x
      reps += 1
    }
    val out = (System.nanoTime() - t0).toDouble / math.max(1L, reps)
    if (sink == Double.MinValue) println(sink) // keep the loop live
    out
  }

  def main(args: Array[String]): Unit = {
    val l1 = graft.Bench.loadAvg1m()
    val l15 = graft.Bench.loadAvg15m()
    println(f"load 1m=$l1%.2f 15m=$l15%.2f (gate: 1m<=2.0 and 15m<=2.5)")
    val (s0, t0) = graft.Bench.cpuStealTotal()
    val spinNs = spin(3000)
    val (s1, t1) = graft.Bench.cpuStealTotal()
    val stealPct =
      if (s0 < 0 || s1 < 0 || t1 <= t0) -1.0
      else 100.0 * (s1 - s0) / (t1 - t0)
    println(f"steal over 3s busy window: $stealPct%.2f%% (healthy: ~0; r17 drift showed as run-window steal)")
    println(f"cpu microbench: ${spinNs / 1e6}%.1f ms per 20M-flop rep " +
      "(calibrate against this host's healthy baseline, ~55-70 ms)")
    val blocked = graft.Bench.idleGateBlocked(l1, l15) || stealPct > 2.0
    println(if (blocked) "WAIT — host not timing-grade" else "PASS — timing-grade")
    if (blocked) sys.exit(1)
  }
}
