package graft

import org.scalatest.funsuite.AnyFunSuite

/** The self-defending bench guard (VERDICT r5 task 2): a synthetic
  * contaminated run — every query uniformly >2x slower — must be flagged
  * at run time, sub-noise-floor queries must not, and the history file
  * must roundtrip at full precision.
  */
class BenchGuardSpec extends AnyFunSuite {

  private val prev = Map(
    "q_join_broadcast" -> 0.4,
    "q_agg_groupby"    -> 0.3,
    "q_stream_join"    -> 3.2,
    "q_tiny"           -> 0.1,
    "q_new_this_round" -> 0.0) // zero guard: never divides by it

  test("uniform 2.2x slowdown (the r4->r5 artifact) fires the guard") {
    val cur = prev.map { case (k, v) => k -> v * 2.2 }
    val regs = Bench.regressions(prev, cur)
    // q_tiny lands at 0.22s — under the 0.5s noise floor, not flagged;
    // q_new_this_round has prev 0.0 — no ratio, not flagged.
    assert(regs.map(_._1).toSet === Set("q_join_broadcast", "q_agg_groupby", "q_stream_join"))
    // worst-ratio-first ordering is stable for a uniform slowdown
    assert(regs.forall { case (_, p, v) => v > 2 * p && v >= 0.5 })
  }

  test("steady-state run (within 2x) stays quiet") {
    val cur = prev.map { case (k, v) => k -> v * 1.3 }
    assert(Bench.regressions(prev, cur).isEmpty)
  }

  test("a single genuine regression is flagged alone, worst first") {
    val cur = prev ++ Map("q_stream_join" -> 8.0, "q_agg_groupby" -> 0.9)
    val regs = Bench.regressions(prev, cur)
    assert(regs.map(_._1) === Seq("q_agg_groupby", "q_stream_join")) // 3.0x then 2.5x
  }

  test("vs_prev is the shared-surface ratio; empty history yields None") {
    val cur = Map("q_join_broadcast" -> 0.8, "q_agg_groupby" -> 0.6, "q_only_cur" -> 9.9)
    val r = Bench.vsPrev(prev, cur).get
    assert(math.abs(r - (0.8 + 0.6) / (0.4 + 0.3)) < 1e-9) // q_only_cur excluded
    assert(Bench.vsPrev(Map.empty, cur).isEmpty)
  }

  test("median-of-passes discards a single contention spike") {
    // r6 task 1: one pass hit by a burst (8.1s vs the steady ~1.2s) must
    // not become the artifact; the median is the steady-state draw
    assert(Bench.median(Seq(1.2, 8.1, 1.3)) === 1.3)
    assert(Bench.median(Seq(8.1, 1.2, 1.1)) === 1.2)
    assert(Bench.median(Seq(2.0)) === 2.0)
    // even count: conservative lower middle (contention only inflates)
    assert(Bench.median(Seq(1.0, 9.0)) === 1.0)
  }

  test("history file roundtrips full-precision timings") {
    val p = java.nio.file.Files.createTempFile("bench_hist", ".json")
    try {
      val timings = Map("q_a" -> 1.234, "q_b" -> 0.056, "q_c" -> 12.5)
      Bench.writeHistory(p, timings)
      assert(Bench.readHistory(p) === timings)
      assert(Bench.readHistory(p.resolveSibling("absent.json")) === Map.empty)
    } finally java.nio.file.Files.deleteIfExists(p)
  }
}
