package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench probe-gate policy (Bench.gateSkip) is pure: a dirty
  * pre-control bracket skips the ~13-minute dataflow pair while budget
  * remains, and a budget reserve forces the minimum ungated fallback
  * pairs when the window never cleans up.
  */
class BenchPolicySpec extends AnyFunSuite {

  private val ctrlMin = 0.93

  test("dirty probe early in the budget skips the pair") {
    assert(Bench.gateSkip(Some(0.85), ctrlMin, bufSize = 0, minPairs = 3,
      elapsedSec = 100, budgetSec = 4500, estPairSec = 850))
  }

  test("clean probe never skips") {
    assert(!Bench.gateSkip(Some(0.95), ctrlMin, bufSize = 0, minPairs = 3,
      elapsedSec = 100, budgetSec = 4500, estPairSec = 850))
  }

  test("missing control (cluster mode / ctrlRuns=0) never gates") {
    assert(!Bench.gateSkip(None, ctrlMin, bufSize = 0, minPairs = 3,
      elapsedSec = 100, budgetSec = 4500, estPairSec = 850))
  }

  test("budget reserve forces ungated pairs: dirty probe runs anyway once " +
      "remaining budget only fits the missing fallback pairs") {
    // 3 pairs still needed × 850 s = 2550 s reserve; budget 4500 s →
    // the gate drops at elapsed > 1950 s
    assert(Bench.gateSkip(Some(0.5), ctrlMin, bufSize = 0, minPairs = 3,
      elapsedSec = 1950, budgetSec = 4500, estPairSec = 850))
    assert(!Bench.gateSkip(Some(0.5), ctrlMin, bufSize = 0, minPairs = 3,
      elapsedSec = 1951, budgetSec = 4500, estPairSec = 850))
  }

  test("reserve shrinks as fallback pairs land") {
    // with 2 of 3 pairs on the record only one 850 s slot is reserved
    assert(Bench.gateSkip(Some(0.5), ctrlMin, bufSize = 2, minPairs = 3,
      elapsedSec = 3000, budgetSec = 4500, estPairSec = 850))
    assert(!Bench.gateSkip(Some(0.5), ctrlMin, bufSize = 2, minPairs = 3,
      elapsedSec = 3700, budgetSec = 4500, estPairSec = 850))
  }

  test("past the minimum, dirty probes keep gating for the whole budget " +
      "(the outer loop's elapsed check owns termination)") {
    assert(Bench.gateSkip(Some(0.5), ctrlMin, bufSize = 3, minPairs = 3,
      elapsedSec = 4400, budgetSec = 4500, estPairSec = 850))
  }

  test("boundary: control exactly at the threshold qualifies (no skip)") {
    assert(!Bench.gateSkip(Some(ctrlMin), ctrlMin, bufSize = 0, minPairs = 3,
      elapsedSec = 100, budgetSec = 4500, estPairSec = 850))
  }

  // --- SMT-topology parsing for the clock-equalization no-sibling assert ---

  test("parseCpuList handles singletons, ranges and comma lists") {
    assert(Bench.parseCpuList("3") == Seq(3))
    assert(Bench.parseCpuList("0-3") == Seq(0, 1, 2, 3))
    assert(Bench.parseCpuList("0,16") == Seq(0, 16))
    assert(Bench.parseCpuList("0-1,16-17") == Seq(0, 1, 16, 17))
    assert(Bench.parseCpuList(" 5 \n") == Seq(5))
    assert(Bench.parseCpuList("") == Nil)
  }

  test("this host reports no SMT siblings (the activity-matching spinner's " +
      "no-port-contention claim is asserted, not assumed)") {
    // on an SMT host equalizeClock self-disables; this box is 32 physical
    // cores, so the assertion must hold here and the protocol stays active
    assert(!Bench.smtSiblingsPresent)
  }

  // --- burst-abort threshold (round 5): identical code measured 336 s and
  // 74.9 s forty minutes apart on this host — a side over mult × floor is
  // inside a burst that floor-tol would disqualify, so sampling it further
  // only burns pair budget ---

  test("burst-abort disabled until the minimum fallback pairs exist") {
    assert(Bench.abortThreshold(Seq(70.0, 80.0), mult = 3.0,
      haveMinPairs = false) == 0.0)
  }

  test("burst-abort threshold is mult x the run's own floor") {
    assert(Bench.abortThreshold(Seq(80.0, 70.0, 75.0), mult = 3.0,
      haveMinPairs = true) == 210.0)
  }

  test("burst-abort disabled with no floors or non-positive multiplier") {
    assert(Bench.abortThreshold(Nil, mult = 3.0, haveMinPairs = true) == 0.0)
    assert(Bench.abortThreshold(Seq(70.0), mult = 0.0,
      haveMinPairs = true) == 0.0)
  }
}
