package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.HoltWinters

/** Math-level tests for the Holt-Winters port. Expected vectors were
  * computed with an independent re-implementation of the reference
  * semantics (`series/holtwinters.go:28-134`) and are pinned exactly
  * (same IEEE op sequence → bit-identical doubles). */
class HoltWintersSpec extends AnyFunSuite {

  private val data = Array[Double](10, 20, 30, 40, 12, 22, 32, 42, 14, 24, 34, 44)
  private val slen = 4

  test("initial trend factor — NIST pmc435") {
    assert(HoltWinters.initialTrend(data, slen) == 0.5)
    assertThrows[IllegalArgumentException](
      HoltWinters.initialTrend(Array(1.0, 2.0), 4))
  }

  test("initial seasonal indices — NIST pmc435") {
    val s = HoltWinters.initialSeasonal(data, slen)
    assert(s.toSeq == Seq(0.4424010217113665, 0.8141336739037888,
      1.1858663260962112, 1.5575989782886335))
  }

  test("triple exponential smoothing matches the reference recursion") {
    val trend = HoltWinters.initialTrend(data, slen)
    val seasonal = HoltWinters.initialSeasonal(data, slen)
    val (r, d, sse) = HoltWinters.smooth(
      data, slen, trend, seasonal, 4, 0.5, 0.4, 0.6)

    assert(r.length == data.length + 4)
    assert(r(0) == 10.0)
    assert(r(1) == 21.056266933563208)
    assert(r(5) == 25.13194346892758)
    assert(r(11) == 44.209364701978636)
    // forecast region
    assert(r(12) == 12.95971084622551)
    assert(r(15) == 44.55385589324146)
    // deviations: zero until i > 2, then γ-smoothed
    assert(d(2) == 0.0)
    assert(d(3) == 0.08318298525950209)
    assert(d(15) == 0.02197436619156138)
    assert(sse == 59.89464784028109)
  }

  test("out-of-range α/β/γ returns the huge-SSE sentinel") {
    val (r, _, sse) = HoltWinters.smooth(
      data, slen, 0.5, Array(1.0, 1, 1, 1), 0, 1.5, 0.5, 0.5)
    assert(r.isEmpty)
    assert(sse == HoltWinters.HugeSse)
  }

  test("Nelder-Mead converges on a smooth quadratic") {
    // min at (0.3, 0.6); start simplex spans it
    val f = (x: Array[Double]) =>
      (x(0) - 0.3) * (x(0) - 0.3) + (x(1) - 0.6) * (x(1) - 0.6)
    val r = HoltWinters.nelderMead(f,
      Array(Array(0.1, 0.1), Array(0.9, 0.1), Array(0.5, 0.9)))
    assert(math.abs(r(0) - 0.3) < 1e-3)
    assert(math.abs(r(1) - 0.6) < 1e-3)
  }

  test("SSE auto-fit beats a bad fixed parameterization") {
    val trend = HoltWinters.initialTrend(data, slen)
    val seasonal = HoltWinters.initialSeasonal(data, slen)
    val (_, _, badSse) = HoltWinters.smooth(
      data, slen, trend, seasonal.clone(), 0, 0.99, 0.99, 0.99)
    val (sm, _, a, b, g) = HoltWinters.minimizeSse(
      data, slen, trend, seasonal, 0)
    val (_, _, fitSse) = HoltWinters.smooth(
      data, slen, trend, seasonal.clone(), 0, a, b, g)
    assert(a > 0 && a < 1 && b > 0 && b < 1 && g > 0 && g < 1)
    assert(fitSse < badSse)
    assert(sm.length == data.length)
  }
}
