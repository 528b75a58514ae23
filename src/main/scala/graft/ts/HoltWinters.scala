package graft.ts

/** Multiplicative triple-exponential (Holt-Winters) smoothing with
  * Nelder-Mead SSE auto-fit — the reference's one genuinely algorithmic
  * family, ported math-for-math from `series/holtwinters.go:28-162` and
  * `series/neldermead.go:31-242` (itself the public-domain nmoptim
  * variant of Nelder-Mead 1965). Pure driver-free Scala: runs per series
  * inside `flatMapGroups` (see [[HwOps]]), one bounded array per task.
  */
object HoltWinters {

  /** NIST initial trend factor (`series/holtwinters.go:28-37`):
    * mean over one season of (second-season − first-season)/slen. */
  def initialTrend(data: Array[Double], slen: Int): Double = {
    require(data.length >= slen * 2,
      "need at least two seasons for the initial trend factor")
    var tot = 0.0
    var i = 0
    while (i < slen) { tot += (data(i + slen) - data(i)) / slen; i += 1 }
    tot / slen
  }

  /** NIST initial seasonal indices (`series/holtwinters.go:44-71`):
    * per-offset mean of value/season-average. */
  def initialSeasonal(data: Array[Double], slen: Int): Array[Double] = {
    val nSeasons = data.length / slen
    require(nSeasons > 0, "need at least one full season")
    val seasonAvg = Array.tabulate(nSeasons) { j =>
      var sum = 0.0
      var i = 0
      while (i < slen) { sum += data(j * slen + i); i += 1 }
      sum / slen
    }
    Array.tabulate(slen) { i =>
      var s = 0.0
      var j = 0
      while (j < nSeasons) { s += data(j * slen + i) / seasonAvg(j); j += 1 }
      s / nSeasons
    }
  }

  /** Out-of-range (α,β,γ) sentinel SSE — the reference returns
    * float64(max int) to repel Nelder-Mead (`series/holtwinters.go:95-98`). */
  val HugeSse: Double = Long.MaxValue.toDouble

  /** Triple exponential smoothing (`series/holtwinters.go:85-134`).
    * MUTATES `seasonal` in place, exactly like the reference (callers
    * that re-evaluate must pass a copy — `series/holtwinters.go:146-148`).
    *
    * @return (smoothed+forecast values, deviations for confidence bands, SSE)
    */
  def smooth(data: Array[Double], slen: Int, trend0: Double,
      seasonal: Array[Double], nPredictions: Int,
      a: Double, b: Double, g: Double): (Array[Double], Array[Double], Double) = {
    if (a <= 0 || a >= 1 || b <= 0 || b >= 1 || g <= 0 || g >= 1)
      return (Array.empty, Array.empty, HugeSse)

    val n = data.length + nPredictions
    val result = new Array[Double](n)
    val dev = new Array[Double](n)
    val seasonalDev = new Array[Double](slen)
    var level = 0.0
    var trend = trend0
    var sse = 0.0
    var i = 0
    while (i < n) {
      if (i == 0) {
        level = data(0)
        result(0) = data(0)
        // dev(0) stays 0 — the reference `continue`s before the dev write
      } else {
        if (i >= data.length) { // forecasting
          val m = i - data.length + 1
          result(i) = (level + m * trend) * seasonal(i % slen)
        } else {
          val v = data(i)
          val lastLevel = level
          level = a * v / seasonal(i % slen) + (1 - a) * (level + trend)
          trend = b * (level - lastLevel) + (1 - b) * trend
          seasonal(i % slen) = g * v / level + (1 - g) * seasonal(i % slen)
          result(i) = (level + trend) * seasonal(i % slen)
          if (i > 2) {
            var factor = result(i) / v
            if (factor > 1) factor = 1 / factor
            seasonalDev(i % slen) = g * (1 - factor) + (1 - g) * seasonalDev(i % slen)
            val diff = result(i) - v
            sse += diff * diff
          }
        }
        dev(i) = seasonalDev(i % slen)
      }
      i += 1
    }
    (result, dev, sse)
  }

  /** Nelder-Mead auto-fit of (α,β,γ) minimizing SSE
    * (`series/holtwinters.go:143-162`), using the reference's starting
    * simplex verbatim. */
  def minimizeSse(data: Array[Double], slen: Int, trend: Double,
      seasonal: Array[Double], nPred: Int)
      : (Array[Double], Array[Double], Double, Double, Double) = {
    val f = (x: Array[Double]) =>
      smooth(data, slen, trend, seasonal.clone(), nPred, x(0), x(1), x(2))._3
    val start = Array(
      Array(0.1, 0.01, 0.9), Array(0.9, 0.1, 0.1),
      Array(0.5, 0.2, 0.5), Array(0.1, 0.9, 0.1))
    val r = nelderMead(f, start)
    // the reference returns the smooth/dev of the LAST evaluation (its
    // closure overwrite) — re-run at the optimum for a deterministic pair
    val (s, d, _) = smooth(data, slen, trend, seasonal.clone(), nPred,
      r(0), r(1), r(2))
    (s, d, r(0), r(1), r(2))
  }

  /** Nelder-Mead downhill simplex (`series/neldermead.go:32-242`).
    * Same constants (kMax 1000, ε 1e-6, α 1, β 0.5, γ 2) and same
    * reflection / expansion / contraction / shrink sequencing. */
  def nelderMead(f: Array[Double] => Double,
      start: Array[Array[Double]]): Array[Double] = {
    val kMax = 1000
    val eps = 0.000001
    val alpha = 1.0
    val beta = 0.5
    val gamma = 2.0

    val n = start.length
    require(n == start(0).length + 1, "simplex needs dim+1 points")
    val sx = start.map(_.clone())
    val fv = sx.map(f)

    def sub(x: Array[Double], y: Array[Double]) =
      Array.tabulate(x.length)(i => x(i) - y(i))
    def add(x: Array[Double], y: Array[Double]) =
      Array.tabulate(x.length)(i => x(i) + y(i))
    def scale(p: Array[Double], s: Double) = p.map(_ * s)
    def centroid(omit: Int) = Array.tabulate(sx(0).length) { i =>
      var c = 0.0
      var j = 0
      while (j < n) { if (j != omit) c += sx(j)(i); j += 1 }
      c / (n - 1)
    }

    var k = 0
    var stop = false
    while (k < kMax && !stop) {
      var vg = 0 // largest
      for (i <- fv.indices) if (fv(i) > fv(vg)) vg = i
      var vs = 0 // smallest
      for (i <- fv.indices) if (fv(i) < fv(vs)) vs = i
      var vh = vs // second largest
      for (i <- fv.indices) if (fv(i) > fv(vh) && fv(i) < fv(vg)) vh = i

      val vm = centroid(vg)
      val vr = add(vm, scale(sub(vm, sx(vg)), alpha))
      val fr = f(vr)

      if (fr < fv(vh) && fr >= fv(vs)) { fv(vg) = fr; sx(vg) = vr }

      if (fr < fv(vs)) { // expansion
        val ve = add(vm, scale(sub(vr, vm), gamma))
        val fe = f(ve)
        if (fe < fr) { sx(vg) = ve; fv(vg) = fe }
        else { sx(vg) = vr; fv(vg) = fr }
      }

      if (fr >= fv(vh)) { // contraction
        val vc =
          if (fr < fv(vg) && fr >= fv(vh)) add(vm, scale(sub(vr, vm), beta))
          else sub(vm, scale(sub(vm, sx(vg)), beta))
        val fc = f(vc)
        if (fc < fv(vg)) { sx(vg) = vc; fv(vg) = fc }
        else { // shrink toward best
          for (i <- sx.indices if i != vs)
            sx(i) = add(sx(vs), scale(sub(sx(i), sx(vs)), beta))
          fv(vg) = f(sx(vg))
          fv(vh) = f(sx(vh))
        }
      }

      val favg = fv.sum / fv.length
      var s = 0.0
      for (v <- fv) s += (v - favg) * (v - favg)
      s = math.sqrt(s * (1.0 / (fv.length + 1.0)))
      if (s < eps) stop = true
      k += 1
    }

    var vs = 0
    for (i <- fv.indices) if (fv(i) < fv(vs)) vs = i
    sx(vs)
  }
}
