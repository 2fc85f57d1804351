package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-17 re-arm of the bench regression detector (r16 verdict
  * #1). The failure it guards against is CONCRETE and happened: the
  * driver's r16 run (49/118 queries contended) appended floors 2-3x
  * elevated to BENCH_FLOORS.jsonl, and the detector compared only against
  * that LAST line — so a genuine 2x plan regression on q_scalar_math
  * (idle floor 2.25 s -> 4.5 s) would not have flagged, because
  * prev = 5.39. The numbers below are those real ones. */
class BenchGuardSpec extends AnyFunSuite {

  test("planted 2x slowdown flags even against a poisoned prev floor") {
    // r16 history: best honest floor 2.25 (line 5), poisoned prev 5.39
    // (line 6, the contended driver run). A genuine regression to 4.5 s:
    val ref = Bench.driftRef(prev = Some(5.39), best = Some(2.25))
    assert(ref.contains(2.25), "reference must be the best-ever floor")
    assert(Bench.drifted(ref.get, 4.5),
      "2x regression must flag against min(prev, best)")
    // Under the OLD rule (prev only) it silently passed:
    assert(!Bench.drifted(5.39, 4.5),
      "sanity: prev-only comparison is exactly the masking the fix removes")
  }

  test("idle jitter below the triage bar does not flag") {
    // 2.25 -> 2.41 is the measured same-day idle spread (BENCH_FLOORS
    // lines 4-6); 30%+0.2s must tolerate it.
    assert(!Bench.drifted(2.25, 2.41))
    // Sub-5ms queries never flag on absolute jitter even at huge ratios.
    assert(!Bench.drifted(0.005, 0.15))
  }

  test("reference degrades gracefully when history is one-sided") {
    assert(Bench.driftRef(Some(2.0), None).contains(2.0))
    assert(Bench.driftRef(None, Some(2.0)).contains(2.0))
    assert(Bench.driftRef(None, None).isEmpty)
  }

  test("contended runs do not enter the floor history") {
    assert(!Bench.historyGate(nContended = 49, nQueries = 118),
      "the r16 driver run (49/118) must be refused")
    assert(Bench.historyGate(nContended = 12, nQueries = 118),
      "the worst observed idle run (12 flagged) must still append")
    assert(Bench.historyGate(nContended = 3, nQueries = 10),
      "floor of 3 keeps small suites appendable under ordinary jitter")
    assert(!Bench.historyGate(nContended = 4, nQueries = 10))
  }
}
