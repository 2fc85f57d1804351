package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench regression detector's reference rule. Both failure
  * modes it guards against are CONCRETE and happened:
  *  - r16: the driver's contended run (49/118 queries contended)
  *    appended floors 2-3x elevated to BENCH_FLOORS.jsonl, and a
  *    prev-only comparison would have hidden a genuine 2x regression on
  *    q_scalar_math (2.25 s -> 4.5 s) behind the poisoned prev of 5.39.
  *  - r17: an all-time-best comparison resurrected dead eras — six
  *    r13-era floors (q_bigram_pmi 0.748 s vs the 0.97-1.07 s band every
  *    2026-08 idle run lands in) flagged every round, each demanding a
  *    triage row for a "regression" no current build can un-regress.
  * The r18 era rule (Bench.eraRef): reference = window MIN over the last
  * EraK appended runs. The numbers below are the real committed ones. */
class BenchGuardSpec extends AnyFunSuite {

  // q_bigram_pmi's full committed same-config history (BENCH_FLOORS.jsonl
  // lines 1-10): three r13-era floors no 2026-08 run reproduces, then the
  // current 0.86-1.07 band.
  private val bigramPmiHist =
    Vector(0.871, 0.764, 0.748, 1.07, 1.06, 1.03, 0.86, 1.01, 1.01, 0.978)

  test("dead r13-era floors do not flag the current idle band") {
    val ref = Bench.eraRef(bigramPmiHist).get
    assert(ref == 0.86, "era reference must be the last-K window min, " +
      "not the all-time best 0.748")
    // Every floor the 2026-08 idle runs actually produced must pass:
    Seq(0.97, 1.01, 1.03, 1.06, 1.07).foreach { cur =>
      assert(!Bench.drifted(ref, cur),
        f"current-band floor $cur%.2f flagged against era ref $ref%.2f — " +
          "the dead-era false positive the rule exists to retire")
    }
    // Under the OLD rule (all-time best) the whole band flagged:
    assert(Bench.drifted(bigramPmiHist.min, 1.07),
      "sanity: vs the r13-era 0.748 the current band IS a >30% 'drift' — " +
        "exactly the standing false positive being removed")
  }

  test("a genuine 2x slowdown from the current band still flags") {
    val ref = Bench.eraRef(bigramPmiHist).get
    assert(Bench.drifted(ref, 2.0),
      "2x over the current band must flag against the era reference")
  }

  test("one poisoned line inside the window cannot mask (window MIN)") {
    // r16's shape: an honest 2.25 floor followed by the contended 5.39 —
    // the window min keeps 2.25 as reference, so a regression to 4.5
    // flags. (The >15%-contended history gate refuses such lines now;
    // this pins the defense-in-depth if one ever lands.)
    val ref = Bench.eraRef(Vector(2.31, 2.25, 5.39)).get
    assert(ref == 2.25)
    assert(Bench.drifted(ref, 4.5),
      "2x regression must flag even with a poisoned line in the window")
    assert(!Bench.drifted(5.39, 4.5),
      "sanity: prev-only comparison is exactly the masking this removes")
  }

  test("idle jitter below the triage bar does not flag") {
    // 2.25 -> 2.41 is the measured same-day idle spread (BENCH_FLOORS
    // r16-era lines); 30%+0.2s must tolerate it.
    assert(!Bench.drifted(2.25, 2.41))
    // Sub-5ms queries never flag on absolute jitter even at huge ratios.
    assert(!Bench.drifted(0.005, 0.15))
  }

  test("era reference degrades gracefully on short history") {
    assert(Bench.eraRef(Vector(2.0)).contains(2.0))
    assert(Bench.eraRef(Vector.empty).isEmpty)
    // Shorter than EraK: whole history is the window.
    assert(Bench.eraRef(Vector(3.0, 2.0, 2.5)).contains(2.0))
    // Longer: entries beyond the window are invisible.
    val h = Vector.fill(Bench.EraK)(2.0)
    assert(Bench.eraRef(0.5 +: h).contains(2.0))
  }

  test("box-era gate: cross-era floors are invisible, same-era compare") {
    // r21 verdict #4: floors from a ~1.3x-slower box era made drift
    // flags uninterpretable. Same era = single-core calibration within
    // ±25%; uncalibrated (pre-r22) lines never match — the requested
    // re-base.
    assert(Bench.sameEra(Some(0.100), 0.100))
    assert(Bench.sameEra(Some(0.100), 0.110), "few-% jitter is same era")
    assert(Bench.sameEra(Some(0.100), 0.124))
    assert(!Bench.sameEra(Some(0.100), 0.130),
      "the observed ~1.3x inter-era gap must separate eras")
    assert(!Bench.sameEra(Some(0.130), 0.100), "symmetric")
    assert(!Bench.sameEra(None, 0.100),
      "uncalibrated history lines must not calibrate the detector")
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
