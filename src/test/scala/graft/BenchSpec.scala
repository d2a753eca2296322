package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Bench harness's budget/contention decision logic — pure
  * functions, testable without a Spark session. The budget machinery
  * exists because BENCH_r13 was lost to the driver's timeout
  * (rc 124, `parsed: null`): a degraded-but-parsed record must
  * always beat a missing one. */
class BenchSpec extends AnyFunSuite {

  test("disagree: >20% split, degenerate totals, and the NaN trapdoor") {
    assert(!Bench.disagree(100.0, 110.0)) // 10% apart: agree
    assert(!Bench.disagree(100.0, 120.0)) // exactly 20%: agree (<=)
    assert(Bench.disagree(100.0, 121.0))  // past the gate
    assert(Bench.disagree(300.0, 1064.0)) // the r12 third-pass blowup
    // degenerate totals must read as disagreement, not agreement
    assert(Bench.disagree(0.0, 100.0))
    assert(Bench.disagree(-1.0, 100.0))
    assert(Bench.disagree(Double.NaN, 100.0))
    assert(Bench.disagree(100.0, Double.NaN))
  }

  test("passFits: contingency and reserve arithmetic") {
    // 300 s estimate: needs > 1.15*300 + 60 = 405 s remaining
    assert(Bench.passFits(remaining = 406.0, estimate = 300.0, reserve = 60.0))
    assert(!Bench.passFits(remaining = 405.0, estimate = 300.0, reserve = 60.0))
    assert(!Bench.passFits(remaining = 100.0, estimate = 300.0, reserve = 60.0))
    // a clean ~260 s pass with half the default 1700 s budget left fits
    assert(Bench.passFits(remaining = 850.0, estimate = 260.0, reserve = 60.0))
  }
}
