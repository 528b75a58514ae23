package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench calibration floor ([[Bench.plateauFloor]]) — the
  * round-15 verdict found `calib.ok:true` vacuous because the floor was
  * measured before the JIT plateau (1.6× the true idle floor, so
  * `med ≤ 1.2 × floor` could never fail). These cases fix the contract:
  * the floor must chase a monotone JIT decline to its flat, a loaded
  * machine must yield a HIGH floor (so `ok` still answers "no noisier
  * than the baseline"), and the pollution gate must be demonstrably
  * able to fail — a co-tenant-inflated med against an idle floor. */
class BenchCalibSpec extends AnyFunSuite {

  private def scripted(xs: Double*): () => Double = {
    val it = Iterator(xs: _*) ++ Iterator.continually(xs.last)
    () => it.next()
  }

  test("a slow monotone JIT decline is chased to its flat") {
    // each step improves ~5% — "last 3 within 10% of each other" would
    // stop at 0.18 (the round-16 observed false floor); the min-anchored
    // test keeps going until the decline flattens at 0.09
    val floor = Bench.plateauFloor(scripted(
      0.20, 0.19, 0.18, 0.17, 0.16, 0.15, 0.14, 0.13, 0.12, 0.11,
      0.10, 0.095, 0.091, 0.090, 0.090, 0.090))
    assert(floor <= 0.095, s"floor $floor stuck above the JIT knee")
  }

  test("a loaded machine plateaus high - the floor is the baseline") {
    val floor = Bench.plateauFloor(scripted(0.32, 0.30, 0.31, 0.30, 0.31))
    assert(floor >= 0.30)
  }

  test("an early spike never lifts the floor") {
    val floor = Bench.plateauFloor(scripted(
      0.50, 0.09, 0.40, 0.091, 0.090, 0.089))
    assert(floor <= 0.09)
  }

  test("the maxRuns cap bounds a never-plateauing series") {
    var n = 0
    val floor = Bench.plateauFloor(
      () => { n += 1; 1.0 / n }, maxRuns = 10) // strictly improving
    assert(n === 10 && floor === 0.1)
  }

  test("the pollution gate can FAIL: co-tenant load vs an idle floor") {
    // the gate arithmetic Bench.main applies: ok = med <= 1.2 * floor.
    // An idle-window floor of 0.09 against a capture whose calib med
    // reads 0.15 (1.7x co-tenant inflation) must stamp ok:false ...
    val floor = Bench.plateauFloor(scripted(0.12, 0.092, 0.090, 0.091, 0.090))
    assert(!(0.15 <= floor * 1.2), "a 1.7x-inflated med must fail the gate")
    // ... and an honest med within the noise band must pass
    assert(0.095 <= floor * 1.2)
  }
}
