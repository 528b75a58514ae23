package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The tgres DSL function inventory (SURVEY §2.3), re-expressed as pure
  * DataFrame transforms over the canonical series frame
  * `(name: String, t: Long, value: Double|NULL)`.
  *
  * Every function here is declarative (Catalyst expressions / window
  * specs only — no UDFs, no collect), so all of them stay inside
  * whole-stage codegen and scale by partitioning on `name` (window ops)
  * or `t` (cross-series aggregation). NULL ≡ the reference's NaN.
  */
object SeriesOps {

  /** Per-series time order — every windowed op partitions by series so the
    * work distributes across executors one series (or less) per task. */
  private def w = Window.partitionBy("name").orderBy("t")
  private def wAll = Window.partitionBy("name")

  private val v = col("value")

  /** Hard per-series point ceiling for the SEQUENTIAL op family (LTTB,
    * EMA, Holt-Winters fits) — the ops that pull one series into one
    * task-local array via `flatMapGroups`. The render path bounds the
    * fetch upstream (a viewport resolves to one RRA's span/step, ≤ a
    * few thousand points), so the bound is a loud guard against a
    * caller feeding an unconsolidated raw firehose into a per-series
    * array, not a working limit: 4 M points ≈ 64 MB of (Long, Double)
    * per task, safely inside an executor's task budget, while a 5-year
    * 10 s-step series (~15.8 M points) fails with a message naming the
    * series instead of silently ballooning the executor heap. */
  val SeqOpMaxPoints: Int = 4 * 1024 * 1024

  /** Materialize one series' iterator under [[SeqOpMaxPoints]],
    * failing loudly (op + series name + bound) on overflow. */
  private[graft] def boundedSeries[T: scala.reflect.ClassTag](op: String,
      name: String, it: Iterator[T],
      maxPoints: Int = SeqOpMaxPoints): Array[T] = {
    val buf = new scala.collection.mutable.ArrayBuffer[T]()
    while (it.hasNext) {
      if (buf.length >= maxPoints)
        throw new IllegalStateException(
          s"$op: series '$name' exceeds the $maxPoints-point " +
            "per-series bound of the sequential-op family; consolidate " +
            "(summarize/consolidateBy/BestRRA) before calling")
      buf += it.next()
    }
    buf.toArray
  }

  // ===== per-point scalar transforms (reference wraps AliasSeries and
  // ===== overrides CurrentValue(); here: one withColumn each) =====

  /** scale(f) — `dsl/funcs.go:1128-1150` */
  def scale(df: DataFrame, f: Double): DataFrame = df.withColumn("value", v * f)

  /** absolute() — `dsl/funcs.go:1107-1126` */
  def absolute(df: DataFrame): DataFrame = df.withColumn("value", abs(v))

  /** offset(o) — `dsl/funcs.go:1287-1306` */
  def offset(df: DataFrame, o: Double): DataFrame = df.withColumn("value", v + o)

  /** invert ~ logarithm(base) — `dsl/funcs.go:1233-1252` */
  def logarithm(df: DataFrame, base: Double = 10.0): DataFrame =
    df.withColumn("value", log(base, v))

  /** offsetToZero() — subtract the series min — `dsl/funcs.go:1308-1334` */
  def offsetToZero(df: DataFrame): DataFrame =
    df.withColumn("value", v - min(v).over(wAll))

  /** transformNull(default) — NaN→default — `dsl/funcs.go:1385-1408` */
  def transformNull(df: DataFrame, dflt: Double): DataFrame =
    df.withColumn("value", coalesce(v, lit(dflt)))

  // ----- graphite-web per-point transforms (extensions; the engine's
  // ----- NULL≡NaN model maps graphite's NaN/Inf outputs to NULL) -----

  /** invert() — 1/v; 0 → NULL (the ±Inf stand-in, the
    * [[divideSeries]] convention). */
  def invert(df: DataFrame): DataFrame =
    df.withColumn("value",
      when(v === 0.0, lit(null)).otherwise(lit(1.0) / v))

  /** pow(n) — vⁿ; a NaN result (negative base, fractional exponent)
    * maps to NULL. */
  def powSeries(df: DataFrame, n: Double): DataFrame = {
    val p = pow(v, lit(n))
    df.withColumn("value", when(isnan(p), lit(null)).otherwise(p))
  }

  /** squareRoot() — √v; negative values map to NULL. */
  def squareRoot(df: DataFrame): DataFrame = {
    val p = sqrt(v)
    df.withColumn("value", when(isnan(p), lit(null)).otherwise(p))
  }

  /** sigmoid() — 1/(1+e^(−v)) (graphite-web; extension). `exp` is not
    * correctly-rounded-guaranteed across engines, so this family is
    * vector-pinned (the pow rule), not hash-oracled. An e^(−v)
    * overflow saturates to +Inf → 0.0, the mathematically-correct
    * limit (graphite raises to None there — documented divergence in
    * favor of the honest value). */
  def sigmoidSeries(df: DataFrame): DataFrame =
    df.withColumn("value", lit(1.0) / (lit(1.0) + exp(-v)))

  /** logit() — ln(v/(1−v)) (graphite-web; extension): inputs outside
    * (0, 1) map to NULL (graphite's ValueError/ZeroDivision → None),
    * including the ±∞ endpoints. Vector-pinned like [[sigmoidSeries]]. */
  def logitSeries(df: DataFrame): DataFrame = {
    val p = log(v / (lit(1.0) - v))
    df.withColumn("value",
      when(isnan(p) || p === Double.PositiveInfinity ||
        p === Double.NegativeInfinity, lit(null)).otherwise(p))
  }

  /** exp() — e^v (graphite-web; extension); an overflow (+Inf) maps
    * to NULL (graphite's OverflowError → None). Vector-pinned like
    * [[sigmoidSeries]]. */
  def expSeries(df: DataFrame): DataFrame = {
    val p = exp(v)
    df.withColumn("value",
      when(p === Double.PositiveInfinity, lit(null)).otherwise(p))
  }

  /** round(precision) — graphite-web's roundFunction: python 3
    * `round` is banker's (half-to-even), so this is `bround`.
    * Vector-pinned (cross-engine tie-rounding differs; the pow rule). */
  def roundSeries(df: DataFrame, precision: Int = 0): DataFrame =
    df.withColumn("value", bround(v, precision))

  /** minMax() — per-series min-max normalization to [0, 1]; a
    * constant series (zero range) maps to 0, as graphite-web does. */
  def minMax(df: DataFrame): DataFrame = {
    val mn = min(v).over(wAll)
    val mx = max(v).over(wAll)
    df.withColumn("value",
      when(v.isNull, lit(null))
        .when(mx === mn, lit(0.0))
        .otherwise((v - mn) / (mx - mn)))
  }

  /** delay(steps) — shift values by `steps` grid points (positive =
    * into the future, the counter-ramp alignment trick; negative
    * peeks ahead). Timestamps keep their grid; vacated points are
    * NULL. */
  def delay(df: DataFrame, steps: Int): DataFrame =
    df.withColumn("value",
      if (steps >= 0) lag(v, steps).over(w) else lead(v, -steps).over(w))

  /** timeSlice(startSec, endSec) — values outside the window become
    * NULL; the grid itself survives (graphite-web's timeSlice). */
  def timeSlice(df: DataFrame, startSec: Long, endSec: Long): DataFrame =
    df.withColumn("value",
      when(col("t") >= startSec && col("t") <= endSec, v))

  /** scaleToSeconds(n) — v*n (values are already per-second rates) —
    * `dsl/funcs.go:2213-2235` */
  def scaleToSeconds(df: DataFrame, n: Double): DataFrame = scale(df, n)

  /** hitcount(interval) — rate→count: v * interval_seconds —
    * `dsl/funcs.go:2133-2161` */
  def hitcount(df: DataFrame, intervalSec: Long): DataFrame =
    df.withColumn("value", v * intervalSec.toDouble)

  /** timeShift(shift) — reported time shifted by `shiftSec` —
    * `dsl/funcs.go:1336-1383` */
  def timeShift(df: DataFrame, shiftSec: Long): DataFrame =
    df.withColumn("t", col("t") + shiftSec)

  /** removeAboveValue(n) / removeBelowValue(n) — clamp to NULL —
    * `dsl/funcs.go:1868-1917` */
  def removeAboveValue(df: DataFrame, n: Double): DataFrame =
    df.withColumn("value", when(v > n, lit(null)).otherwise(v))
  def removeBelowValue(df: DataFrame, n: Double): DataFrame =
    df.withColumn("value", when(v < n, lit(null)).otherwise(v))

  /** changed() — 1 if value differs from previous point else 0 —
    * `dsl/funcs.go:2064-2091`. The reference compares raw Go floats, and
    * `NaN != x` (including `NaN != NaN`) is true, so ANY pair involving a
    * gap — first point included (last starts as NaN) — yields 1. */
  def changed(df: DataFrame): DataFrame =
    df.withColumn("value",
      when(v.isNull || lag(v, 1).over(w).isNull, 1.0)
        .when(v =!= lag(v, 1).over(w), 1.0).otherwise(0.0))

  /** derivative() — v − prev, NULL for the first point —
    * `dsl/funcs.go:1180-1203` */
  def derivative(df: DataFrame): DataFrame =
    df.withColumn("value", v - lag(v, 1).over(w))

  /** nonNegativeDerivative(maxValue) — counter-wrap aware diff —
    * `dsl/funcs.go:1254-1285`: `diff > 0` is the only positive case; a
    * zero or negative diff applies the counter-wrap formula
    * `(max − prev) + v + 1` only when `maxValue > current`, else NaN. */
  def nonNegativeDerivative(df: DataFrame, maxValue: Option[Double]): DataFrame = {
    val prev = lag(v, 1).over(w)
    val diff = v - prev
    val out = maxValue match {
      case Some(m) => when(diff > 0, diff)
        .when(lit(m) > v, (lit(m) - prev) + v + 1.0) // else NULL
      case None    => when(diff > 0, diff) // else NULL
    }
    df.withColumn("value", out)
  }

  /** perSecond(maxValue) — counter rate (graphite-web's `perSecond`;
    * extension: the reference OMITS it because its stored values are
    * already rates, `dsl/funcs.go:279` "everything here is perSecond()
    * already" — this engine also ingests raw counters, where the
    * dominant dashboard idiom is perSecond). graphite-web semantics
    * per point: a reading above `maxValue` is a bogus sample (null —
    * AND it invalidates itself as the next point's prev, graphite's
    * `return None, None`); a non-negative delta emits `delta / dt`; a
    * negative delta with `maxValue` known applies the wrap formula
    * `(maxValue − prev + v + 1) / dt`; otherwise null. `dt` is the
    * actual t-gap to the previous point (graphite-web divides by the
    * fixed series step; on a sparse frame the t-delta is that step).
    * graphite's `minValue` kwarg is not bound (rarely used; the
    * maxValue counter form is the dashboard idiom). */
  def perSecond(df: DataFrame, maxValue: Option[Double]): DataFrame = {
    val prev = lag(v, 1).over(w)
    val dt = (col("t") - lag(col("t"), 1).over(w)).cast("double")
    val diff = v - prev
    val out = maxValue match {
      case Some(m) =>
        // a null/bogus prev fails both guarded branches → null
        when(v > m, lit(null).cast("double"))
          .when(prev <= m && diff >= 0, diff / dt)
          .when(prev <= m, ((lit(m) - prev) + v + 1.0) / dt)
      case None => when(diff >= 0, diff / dt) // else NULL
    }
    df.withColumn("value", out)
  }

  /** integral() — *exclusive* prefix sum, NaN-skipping, 0 at the first
    * point. The reference accumulates in Next() before advancing, so the
    * emitted total excludes the current point (`dsl/funcs.go:1205-1231`,
    * pinned by `dsl/funcs_test.go:295-315`). */
  def integral(df: DataFrame): DataFrame =
    df.withColumn("value",
      coalesce(sum(v).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))

  /** keepLastValue(limit) — forward-fill NULL up to `limit` consecutive
    * slots; limit<=0 fills nothing (`dsl/funcs.go:2163-2195`: the fill
    * branch requires maxCnt>0). */
  def keepLastValue(df: DataFrame, limit: Int): DataFrame = {
    val rn = row_number().over(w)
    val lastV = last(v, ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, 0))
    val lastRn = max(when(v.isNotNull, rn)).over(w.rowsBetween(Window.unboundedPreceding, 0))
    val gap = rn - lastRn
    df.withColumn("value",
      if (limit <= 0) v
      else when(v.isNull && gap <= limit, lastV).otherwise(v))
  }

  /** nPercentile(p) — constant line at the series' p-th percentile
    * (reference Quantile, pos = p(n+1)) — `dsl/funcs.go:1410-1445` */
  def nPercentile(df: DataFrame, p: Double): DataFrame =
    df.withColumn("value", refQuantile(sort_array(collect_list(v).over(wAll)), p))

  /** removeAbovePercentile(p) / removeBelowPercentile(p) —
    * `dsl/funcs.go:1783-1866` */
  def removeAbovePercentile(df: DataFrame, p: Double): DataFrame = {
    val q = refQuantile(sort_array(collect_list(v).over(wAll)), p)
    df.withColumn("value", when(v > q, lit(null)).otherwise(v))
  }
  def removeBelowPercentile(df: DataFrame, p: Double): DataFrame = {
    val q = refQuantile(sort_array(collect_list(v).over(wAll)), p)
    df.withColumn("value", when(v < q, lit(null)).otherwise(v))
  }

  /** summarize(intervalSec, cf) — TRUE re-bucketing semantics (the
    * reference's `dsl/funcs.go:2288-2324` is a scaling hack; SURVEY §2.3
    * directs the honest implementation). Slot = floor(t / interval). */
  def summarize(df: DataFrame, intervalSec: Long, cf: String): DataFrame = {
    // floor, not cast-truncation: pre-1970 (negative) slots must round down
    // like the oracle's integer floor-division
    val bucket = (floor(col("t").divide(lit(intervalSec))).cast("long") * intervalSec).as("t")
    val aggV = cf match {
      case "sum"  => sum(v)
      case "avg"  => avg(v)
      case "max"  => max(v)
      case "min"  => min(v)
      case "last" => max_by(v, when(v.isNotNull, col("t")))
      case other  => throw new IllegalArgumentException(s"summarize cf: $other")
    }
    df.groupBy(col("name"), bucket).agg(aggV.as("value"))
  }

  /** consolidateBy(cf) — selects the consolidation function for
    * re-bucketing (`dsl/funcs.go:2255-2286`, honest semantics). */
  def consolidateBy(df: DataFrame, intervalSec: Long, cf: String): DataFrame =
    summarize(df, intervalSec, cf)

  /** smartSummarize(interval, cf) — graphite-web's aligned re-bucket
    * (extension; the reference has only the summarize scaling hack):
    * buckets anchor at the QUERY's from-time instead of the epoch, so
    * a "1d" summary of a dashboard window starts at the window's left
    * edge, not midnight UTC. Points before the anchor are outside the
    * window by construction and drop, as graphite's pre-fetch window
    * does. Same shuffle shape as [[summarize]] — one groupBy on
    * (name, bucket). */
  def smartSummarize(df: DataFrame, intervalSec: Long, cf: String,
      anchorSec: Long): DataFrame = {
    val bucket = (lit(anchorSec) +
      floor((col("t") - anchorSec).divide(lit(intervalSec))).cast("long") *
        intervalSec).as("t")
    val aggV = cf match {
      case "sum"  => sum(v)
      case "avg"  => avg(v)
      case "max"  => max(v)
      case "min"  => min(v)
      case "last" => max_by(v, when(v.isNotNull, col("t")))
      case other  => throw new IllegalArgumentException(s"smartSummarize cf: $other")
    }
    df.filter(col("t") >= anchorSec)
      .groupBy(col("name"), bucket).agg(aggV.as("value"))
  }

  /** interpolate([limit]) — graphite-web's linear gap fill (extension):
    * an INTERIOR run of unknowns between two known points fills along
    * the line joining them; leading/trailing unknowns stay unknown
    * (nothing to anchor the line). `limit` bounds the run length that
    * fills (graphite's `limit` arg); None fills every interior run.
    * Columnar: the bracketing known points come from two ignore-nulls
    * window scans, so the op stays in whole-stage codegen. */
  def interpolate(df: DataFrame, limit: Option[Int] = None): DataFrame = {
    val back = w.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = w.rowsBetween(0, Window.unboundedFollowing)
    // rn materializes first: window functions cannot nest
    val staged = df.withColumn("__rn", row_number().over(w))
    val pv = last(v, ignoreNulls = true).over(back)
    val pt = last(when(v.isNotNull, col("t")), ignoreNulls = true).over(back)
    val pr = last(when(v.isNotNull, col("__rn")), ignoreNulls = true).over(back)
    val nv = first(v, ignoreNulls = true).over(fwd)
    val nt = first(when(v.isNotNull, col("t")), ignoreNulls = true).over(fwd)
    val nr = first(when(v.isNotNull, col("__rn")), ignoreNulls = true).over(fwd)
    val runLen = nr - pr - 1 // consecutive unknowns in this gap
    val interior = v.isNull && pt.isNotNull && nt.isNotNull
    val fill = pv + (nv - pv) * (col("t") - pt).cast("double") /
      (nt - pt).cast("double")
    val bounded = limit.map(l => interior && runLen <= l).getOrElse(interior)
    staged.withColumn("value", when(bounded, fill).otherwise(v)).drop("__rn")
  }

  // ===== moving-window functions — ring buffer over trailing N points;
  // ===== the reference emits only once the buffer is full =====

  private def emitFromNth(df: DataFrame, cols: Seq[(String, Column)], n: Int): DataFrame = {
    val rn = row_number().over(w)
    val out = cols.foldLeft(df.withColumn("__rn", rn)) {
      case (d, (cn, c)) => d.withColumn(cn, c)
    }
    out.filter(col("__rn") >= n).drop("__rn")
  }

  /** movingAverage(points) — NaN-propagating mean of the trailing window
    * (the reference sums raw NaNs: `dsl/funcs.go:1699-1705`); first N−1
    * points are consumed silently (`dsl/funcs.go:1653-1680`). */
  def movingAverage(df: DataFrame, n: Int): DataFrame = {
    val frame = w.rowsBetween(-(n - 1), 0)
    val mean = when(count(v).over(frame) < n, lit(null))
      .otherwise(avg(v).over(frame))
    emitFromNth(df, Seq("value" -> mean), n)
  }

  /** movingMedian(points) — reference Quantile(0.5) over the trailing
    * window — `dsl/funcs.go:1709-1781` */
  def movingMedian(df: DataFrame, n: Int): DataFrame = {
    val frame = w.rowsBetween(-(n - 1), 0)
    val med = refQuantile(sort_array(collect_list(v).over(frame)), 0.5)
    emitFromNth(df, Seq("value" -> med), n)
  }

  /** stdev(points) — trailing sample standard deviation —
    * `dsl/funcs.go:1919-1991` */
  def stdev(df: DataFrame, n: Int): DataFrame = {
    val frame = w.rowsBetween(-(n - 1), 0)
    emitFromNth(df, Seq("value" -> stddev_samp(v).over(frame)), n)
  }

  /** movingSum / movingMin / movingMax — graphite-web's remaining
    * trailing-window members (extensions; same window contract as
    * [[movingAverage]]: emitted from the n-th point, null until the
    * window holds n known values for sum — min/max are NaN-skipping
    * like their cross-series twins). */
  def movingSum(df: DataFrame, n: Int): DataFrame = {
    val frame = w.rowsBetween(-(n - 1), 0)
    val s = when(count(v).over(frame) < n, lit(null))
      .otherwise(sum(v).over(frame))
    emitFromNth(df, Seq("value" -> s), n)
  }
  def movingMin(df: DataFrame, n: Int): DataFrame =
    emitFromNth(df, Seq("value" -> min(v).over(w.rowsBetween(-(n - 1), 0))), n)
  def movingMax(df: DataFrame, n: Int): DataFrame =
    emitFromNth(df, Seq("value" -> max(v).over(w.rowsBetween(-(n - 1), 0))), n)

  /** integralByInterval(intervalSec) — running NaN-skipping sum that
    * RESETS at each interval boundary (graphite-web; extension): the
    * per-day odometer form of [[integral]]. Same exclusive-prefix
    * semantics as [[integral]] (the reference accumulates before
    * advancing), per (series, interval bucket). */
  def integralByInterval(df: DataFrame, intervalSec: Long): DataFrame = {
    val bucket = floor(col("t").cast("double") / intervalSec).cast("long")
    val wb = Window.partitionBy(col("name"), bucket).orderBy(col("t"))
    df.withColumn("value",
      coalesce(sum(v).over(wb.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0.0)))
  }

  // ===== cross-series combines (vertical aggregation on the aligned
  // ===== grid) — reference reducers in series/seriesslice.go =====

  /** Constant output-series name that survives as a Window partition key.
    * A bare `lit(outName)` gets constant-folded by Catalyst, so any
    * windowed function downstream of a combine (movingAverage, stdev,
    * derivative, …) would see an empty partition spec — `WindowExec: No
    * Partition Defined` — and serialize ALL combined series onto one
    * task. Tying the literal to `t` keeps the expression non-foldable,
    * so the hash partitioning on `name` still distributes distinct
    * combined series. (`t` is never NULL in the canonical frame.) */
  private def constName(outName: String): Column =
    when(col("t").isNotNull, lit(outName))

  private def combine(df: DataFrame, outName: String, aggV: Column): DataFrame =
    df.groupBy(col("t")).agg(aggV.as("value"))
      .select(constName(outName).as("name"), col("t"), col("value"))

  /** sumSeries — NaN treated as 0 (`series/seriesslice.go:176-183`) */
  def sumSeries(df: DataFrame, outName: String = "sumSeries"): DataFrame =
    combine(df, outName, sum(coalesce(v, lit(0.0))))

  /** averageSeries — Sum()/len: NaNs count in the denominator
    * (`series/seriesslice.go:200-202`) */
  def averageSeries(df: DataFrame, outName: String = "averageSeries"): DataFrame =
    combine(df, outName, sum(coalesce(v, lit(0.0))) / count(lit(1)))

  /** maxSeries / minSeries — NaN-skipping (`series/seriesslice.go:206-228`) */
  def maxSeries(df: DataFrame, outName: String = "maxSeries"): DataFrame =
    combine(df, outName, max(v))
  def minSeries(df: DataFrame, outName: String = "minSeries"): DataFrame =
    combine(df, outName, min(v))

  /** multiplySeries — NaN propagates (`series/seriesslice.go:187-196`) */
  def multiplySeries(df: DataFrame, outName: String = "multiplySeries"): DataFrame =
    combine(df, outName,
      when(count(v) < count(lit(1)), lit(null))
        .otherwise(aggregate(collect_list(v), lit(1.0), (acc, x) => acc * x)))

  /** rangeOfSeries — max − min (`series/seriesslice.go:275-277`) */
  def rangeOfSeries(df: DataFrame, outName: String = "rangeOfSeries"): DataFrame =
    combine(df, outName, max(v) - min(v))

  /** isNonNull — count of non-NaN inputs (`dsl/funcs.go:1085-1105`) */
  def isNonNull(df: DataFrame, outName: String = "isNonNull"): DataFrame =
    combine(df, outName, count(v).cast("double"))

  /** countSeries — constant series = number of input series
    * (`dsl/funcs.go:2116-2131`) */
  def countSeries(df: DataFrame, outName: String = "countSeries"): DataFrame =
    combine(df, outName, countDistinct(col("name")).cast("double"))

  /** percentileOfSeries(p) — reference Quantile across the series' values
    * at each timestamp (`dsl/funcs.go:882-899`, `series/seriesslice.go:241-271`) */
  def percentileOfSeries(df: DataFrame, p: Double,
      outName: String = "percentileOfSeries"): DataFrame =
    combine(df, outName, refQuantile(sort_array(collect_list(v)), p))

  /** stddevSeries — per-timestamp POPULATION stddev across the series'
    * non-null values (graphite-web's `stddevSeries`; extension — the
    * reference's combine family stops at range). Determinism contract:
    * BOTH engines square-then-fold the SAME value-sorted list
    * left-to-right (a built-in stddev aggregate accumulates in
    * engine-specific order — Welford vs naive — and would diverge in
    * the last ulp), then evaluate the one fixed expression
    * `sqrt(max(Σv²/n − (Σv/n)², 0))`. */
  def stddevSeries(df: DataFrame, outName: String = "stddevSeries"): DataFrame = {
    val sorted = sort_array(collect_list(v)) // collect_list skips nulls
    val n = size(sorted).cast("double")
    val sm = aggregate(sorted, lit(0.0), (a, x) => a + x)
    val sq = aggregate(transform(sorted, x => x * x), lit(0.0), (a, x) => a + x)
    combine(df, outName,
      when(size(sorted) === 0, lit(null))
        .otherwise(sqrt(greatest(sq / n - (sm / n) * (sm / n), lit(0.0)))))
  }

  /** lastSeries — per-timestamp value of the LAST series in name order,
    * nulls skipped (the `aggregate(…, 'last')` member; documented
    * semantics — graphite takes the last non-None of the value list,
    * whose order is its series order; name order is this engine's). */
  def lastSeries(df: DataFrame, outName: String = "lastSeries"): DataFrame =
    combine(df, outName, max_by(v, when(v.isNotNull, col("name"))))

  /** powSeries — graphite-web's per-timestamp power FOLD (extension):
    * v₁ ^ v₂ ^ … in NAME order. pow is non-commutative, so the fold
    * order is part of the contract: graphite folds in fetch order,
    * and name order is this engine's deterministic spelling (the
    * [[pairwiseSeriesLists]] convention). Any unknown member ⇒ unknown
    * slot (graphite's in-loop None check). Named `powSeriesList` in
    * Scala — `powSeries(df, exponent)` is the scalar `pow()` binder's
    * operator. Like pow/exp, cross-engine float-print of x^y is exact
    * only to the last ulp, so oracle rows pre-normalize inputs into
    * [0, 1] where round-6 absorbs it; the spec pins exact vectors. */
  def powSeriesList(df: DataFrame, outName: String = "powSeries"): DataFrame = {
    val sorted = array_sort(collect_list(struct(col("name"), v.as("value"))))
    val vals = transform(sorted, s => s.getField("value"))
    combine(df, outName,
      when(count(v) < count(lit(1)), lit(null))
        .otherwise(aggregate(
          slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
          element_at(vals, 1),
          (acc, x) => pow(acc, x))))
  }

  /** diffSeries — first (by name) minus the rest; NaN propagates through
    * Go float arithmetic (`dsl/funcs.go:614-647`, `series/seriesslice.go:281-291`) */
  def diffSeries(df: DataFrame, outName: String = "diffSeries"): DataFrame =
    combine(df, outName,
      when(count(v) < count(lit(1)), lit(null))
        .otherwise(lit(2.0) * min_by(v, col("name")) - sum(v)))

  /** diffSeries with an explicit minuend — the reference preserves
    * ARGUMENT order via `_args_` (`dsl/funcs.go:614-647`), so
    * `diffSeries(a, b, c)` is a − (b+c) regardless of name sort; the
    * merged-frame [[diffSeries]] (name-order first) covers the
    * single-pattern form whose iteration order IS name order. NaN
    * propagates: an unknown on either side yields unknown. */
  def diffSeriesOrdered(first: DataFrame, rest: DataFrame,
      outName: String = "diffSeries"): DataFrame = {
    val f = first.select(col("t"), v.as("fv"))
    val r = rest.groupBy(col("t")).agg(
      when(count(v) < count(lit(1)), lit(null)).otherwise(sum(v)).as("rv"))
    f.join(r, Seq("t"), "inner")
      .select(constName(outName).as("name"), col("t"),
        (col("fv") - col("rv")).as("value"))
  }

  /** divideSeries(num, den) — series[0] / series[1], same shape as
    * `dsl/funcs.go:649-682`. DELIBERATE DIVERGENCE on zero denominators:
    * the reference does raw Go float division (x/0 = ±Inf, 0/0 = NaN);
    * ±Inf has no representation in this engine's NULL≡NaN model, so both
    * cases map to NULL here. */
  def divideSeries(num: DataFrame, den: DataFrame,
      outName: String = "divideSeries"): DataFrame = {
    val n = num.select(col("t"), v.as("num"))
    val d = den.select(col("t"), v.as("den"))
    n.join(d, Seq("t"), "inner")
      .select(constName(outName).as("name"), col("t"),
        when(col("den") === 0.0, lit(null))
          .otherwise(col("num") / col("den")).as("value"))
  }

  /** group(...) — merge series sets (`dsl/funcs.go:933-937`) */
  def group(dfs: DataFrame*): DataFrame = dfs.reduce(_.unionByName(_))

  /** asPercent(total?) — each series as a percentage of: a scalar
    * `total`; a total series set's per-timestamp sum; or (default) the
    * per-timestamp sum of the input set itself — NaN counted as 0 in
    * the denominator, matching `SeriesSlice.Sum`
    * (`dsl/funcs.go:1020-1083`, `series/seriesslice.go:176-183`).
    * Zero denominators → NULL (the engine's ±Inf stand-in, as in
    * [[divideSeries]]). */
  def asPercent(df: DataFrame, totalNum: Option[Double] = None,
      totalSet: Option[DataFrame] = None): DataFrame = (totalNum, totalSet) match {
    case (Some(x), _) =>
      df.withColumn("value",
        if (x == 0.0) lit(null) else v / x * 100.0)
    case (None, Some(ts)) =>
      val tot = ts.groupBy(col("t"))
        .agg(sum(coalesce(v, lit(0.0))).as("__tot"))
      df.join(tot, Seq("t"), "left")
        .select(col("name"), col("t"), // canonical column order
          when(col("__tot") === 0.0, lit(null))
            .otherwise(v / col("__tot") * 100.0).as("value"))
    case (None, None) =>
      val tot = sum(coalesce(v, lit(0.0))).over(Window.partitionBy(col("t")))
      df.withColumn("value",
        when(tot === 0.0, lit(null)).otherwise(v / tot * 100.0))
  }

  // ===== name-node family (dotted names) =====

  private def nameParts = split(col("name"), "\\.")

  /** Shared aggregator dispatch for the name-keyed grouping family
    * ([[groupByNodes]], [[aggregateWithWildcards]]): the reference's
    * sum/avg set extended with max/min, median (reference quantile)
    * and last (name order). This family advertises GRAPHITE-WEB
    * semantics, whose safe-aggregators SKIP Nones (`functions.py
    * safeAvg/safeSum`): `avg` divides by the KNOWN count only and
    * `sum` of an all-gap slot is a gap, not 0 — unlike the older
    * [[groupByNode]]/[[seriesWithWildcards]], which keep the
    * reference's gap-as-zero fold deliberately (tgres sums NaN-poison;
    * its NaN≡NULL re-expression zero-fills — documented there). */
  private def nodeAggOf(cf: String): Column = cf match {
    case "sum"    => sum(v)
    case "avg"    => avg(v)
    case "max"    => max(v)
    case "min"    => min(v)
    case "median" => refQuantile(sort_array(collect_list(v)), 0.5)
    case "last"   => max_by(v, when(v.isNotNull, col("name")))
    // graphite-web safeMul: ANY unknown member ⇒ unknown slot. The
    // fold runs over the VALUE-SORTED list (double multiplication is
    // order-dependent; sorting pins one order on both engines — the
    // stddevSeries idiom)
    case "multiply" => when(count(v) < count(lit(1)), lit(null))
      .otherwise(aggregate(sort_array(collect_list(v)), lit(1.0),
        (acc, x) => acc * x))
    case other => throw new IllegalArgumentException(
      s"unknown aggregator '$other'")
  }

  /** aggregateWithWildcards(cf, positions…) — the generic-cf form of
    * the wildcard collapse (graphite-web; extension): series whose
    * names agree outside the wildcarded positions merge under
    * [[nodeAggOf]]'s aggregator set. */
  def aggregateWithWildcards(df: DataFrame, cf: String,
      positions: Seq[Int]): DataFrame = {
    val collapsed = array_join(
      transform(nameParts, (p, i) =>
        when(positions.foldLeft(lit(false))((acc, n) => acc || i === n),
          lit("*")).otherwise(p)),
      ".")
    df.groupBy(collapsed.as("name"), col("t")).agg(nodeAggOf(cf).as("value"))
  }

  /** reduceSeries(mapped, reduceFunction, reduceNode, matchers…) —
    * graphite-web's map/reduce pair's reduce side (extension). Groups
    * series by the name prefix `nodes[0:reduceNode]`, extracts per
    * group the series whose node[reduceNode] equals each matcher, and
    * applies the reduce function across the matcher slots; output name
    * `<prefix>.reduce.<fn>` — graphite's exact `reduceSeriesName`
    * (`functions.py reduceSeries`). mapSeries is the identity on the
    * relational frame: graphite's list-of-lists grouping is re-derived
    * here from the prefix, which is precisely how reduceSeries itself
    * regroups, so the composition is semantics-preserving. One hash
    * shuffle (groupBy prefix,t + an explicit-values pivot — no
    * distinct-scan). Binary fns: asPercent (a/b·100), divideSeries,
    * diffSeries (both the repo's divide/diff conventions: zero-or-
    * unknown denominator ⇒ unknown; diff null-propagates); n-ary:
    * sumSeries (gap-as-zero), averageSeries (known-count mean). A
    * matcher slot with no series in a group is unknown. */
  def reduceSeries(df: DataFrame, fn: String, reduceNode: Int,
      matchers: Seq[String]): DataFrame = {
    require(matchers.nonEmpty, "reduceSeries needs at least one matcher")
    require(reduceNode >= 1, "reduceSeries: reduceNode must be >= 1")
    val parts = split(col("name"), "\\.")
    val nodeV = element_at(parts, reduceNode + 1)
    val prefix = array_join(slice(parts, 1, reduceNode), ".")
    val wide = df.filter(nodeV.isin(matchers: _*))
      .select(concat(prefix, lit(s".reduce.$fn")).as("name"), col("t"),
        nodeV.as("__m"), v)
      .groupBy(col("name"), col("t"))
      .pivot("__m", matchers)
      .agg(first(v, ignoreNulls = false))
    val cs = matchers.map(m => wide(s"`$m`"))
    def binary(f: (Column, Column) => Column): Column = {
      require(matchers.size == 2,
        s"reduceSeries: '$fn' takes exactly 2 matchers")
      f(cs(0), cs(1))
    }
    val value = fn match {
      case "asPercent" => binary((a, b) =>
        when(b === 0.0, lit(null)).otherwise(a / b * 100.0))
      case "divideSeries" => binary((a, b) =>
        when(b === 0.0, lit(null)).otherwise(a / b))
      case "diffSeries" => binary((a, b) => a - b)
      case "sumSeries" =>
        cs.map(c => coalesce(c, lit(0.0))).reduce(_ + _)
      case "averageSeries" =>
        cs.map(c => coalesce(c, lit(0.0))).reduce(_ + _) /
          cs.map(_.isNotNull.cast("int")).reduce(_ + _).cast("double")
      case other => throw new IllegalArgumentException(
        s"reduceSeries: unsupported reduce function '$other'")
    }
    wide.select(col("name"), col("t"), value.as("value"))
  }

  /** sumSeriesWithWildcards(pos...) / averageSeriesWithWildcards —
    * collapse name node(s) to `*`, combine per collapsed name
    * (`dsl/funcs.go:684-798`) */
  def seriesWithWildcards(df: DataFrame, positions: Seq[Int], cf: String): DataFrame = {
    val collapsed = array_join(
      transform(nameParts, (p, i) =>
        when(positions.foldLeft(lit(false))((acc, n) => acc || i === n), lit("*"))
          .otherwise(p)),
      ".")
    val aggV = cf match {
      case "sum" => sum(coalesce(v, lit(0.0)))
      case "avg" => sum(coalesce(v, lit(0.0))) / count(lit(1))
    }
    df.groupBy(collapsed.as("name"), col("t")).agg(aggV.as("value"))
  }

  /** groupByNode(n, cf) — group by the n-th name node —
    * `dsl/funcs.go:800-880` */
  def groupByNode(df: DataFrame, node: Int, cf: String): DataFrame = {
    val key = element_at(nameParts, node + 1) // reference nodes are 0-based
    val aggV = cf match {
      case "sum" => sum(coalesce(v, lit(0.0)))
      case "avg" => sum(coalesce(v, lit(0.0))) / count(lit(1))
      case "max" => max(v)
      case "min" => min(v)
    }
    df.groupBy(key.as("name"), col("t")).agg(aggV.as("value"))
  }

  /** groupByNodes(cf, nodes…) — the multi-node generalization
    * (graphite-web; extension): output name = the '.'-joined selected
    * nodes, aggregator from the [[groupByNode]] set plus median (the
    * reference quantile) and last (name-order, the `aggregate` member). */
  def groupByNodes(df: DataFrame, cf: String, nodes: Seq[Int]): DataFrame = {
    require(nodes.nonEmpty, "groupByNodes needs at least one node")
    val key = array_join(
      array(nodes.map(n => element_at(nameParts, n + 1)): _*), ".")
    df.groupBy(key.as("name"), col("t")).agg(nodeAggOf(cf).as("value"))
  }

  /** weightedAverage(avgSet, weightSet, node) — pair the two sets by name
    * node, Σ(a·w)/Σ(w) per timestamp (`dsl/funcs.go:1993-2062`).
    * NOTE on gaps: the reference's Go sums propagate NaN, so one unknown
    * pair poisons the whole timestamp; here SQL sums skip NULL pairs —
    * the weighted mean of the known pairs (deliberate, NaN≡NULL model). */
  def weightedAverage(avgS: DataFrame, weightS: DataFrame, node: Int,
      outName: String = "weightedAverage"): DataFrame = {
    val key = element_at(nameParts, node + 1)
    val a = avgS.select(key.as("k"), col("t"), v.as("a"))
    val ww = weightS.select(key.as("k"), col("t"), v.as("w"))
    a.join(ww, Seq("k", "t"), "inner")
      .groupBy(col("t"))
      .agg((sum(col("a") * col("w")) / sum(col("w"))).as("value"))
      .select(constName(outName).as("name"), col("t"), col("value"))
  }

  // ===== aliasing (metadata-only) =====

  /** alias(s) — `dsl/funcs.go:945-954` */
  def aliasAll(df: DataFrame, s: String): DataFrame = df.withColumn("name", lit(s))

  /** aliasByMetric() — keep last dot-part (`dsl/funcs.go:956-965`) */
  def aliasByMetric(df: DataFrame): DataFrame =
    df.withColumn("name", element_at(nameParts, -1))

  /** aliasByNode(n...) — selected parts, 0-based (`dsl/funcs.go:967-993`) */
  def aliasByNode(df: DataFrame, nodes: Seq[Int]): DataFrame = {
    val parts = nodes.map(n => element_at(nameParts, if (n >= 0) n + 1 else n))
    df.withColumn("name", concat_ws(".", parts: _*))
  }

  /** aliasSub(search, replace) — regex rename (`dsl/funcs.go:995-1016`);
    * `replace` uses Java `$1` group syntax. */
  def aliasSub(df: DataFrame, search: String, replace: String): DataFrame =
    df.withColumn("name", regexp_replace(col("name"), search, replace))

  /** aliasByTags(tag...) — the tag twin of [[aliasByNode]]
    * (graphite-web's function over tagged paths; extension — the
    * reference's DSL never sees idents): rename each series to the
    * '.'-joined VALUES of the listed tags, read from the canonical
    * tagged name via [[graft.streaming.Find.identFromName]]. A tag a
    * series lacks contributes an empty segment (kept, so arity stays
    * fixed across the set). */
  def aliasByTags(df: DataFrame, tags: Seq[String]): DataFrame = {
    val ident = graft.streaming.Find.identFromName(col("name"))
    df.withColumn("name", concat_ws(".",
      tags.map(t => coalesce(element_at(ident, lit(t)), lit(""))): _*))
  }

  /** groupByTags(cf, tag...) — the tag twin of [[groupByNode]]:
    * aggregate all series sharing the listed tags' values, per
    * timestamp. Output names render canonically as
    * `cf;tag1=v1;...` (base = the aggregator, tags sorted by the
    * caller's list order here since the keys are fixed), so results
    * remain valid tagged paths. Missing tags group under the empty
    * value. */
  def groupByTags(df: DataFrame, cf: String, tags: Seq[String]): DataFrame = {
    val ident = graft.streaming.Find.identFromName(col("name"))
    val aggV = cf match {
      case "sum" => sum(coalesce(v, lit(0.0)))
      case "avg" => sum(coalesce(v, lit(0.0))) / count(lit(1))
      case "max" => max(v)
      case "min" => min(v)
    }
    val name = concat(lit(cf), concat_ws("", tags.map(t =>
      concat(lit(";" + t + "="),
        coalesce(element_at(ident, lit(t)), lit("")))): _*))
    df.groupBy(name.as("name"), col("t")).agg(aggV.as("value"))
  }

  // ===== series-set filters / top-k (rank by whole-series summary —
  // ===== series/summaryseries.go reducers) =====

  /** Per-series summary frame: (name, savg, smax, smin, sstd, slast).
    *
    * Max/Min match the reference exactly (non-NaN extremes,
    * `series/summaryseries.go:29-52`). DELIBERATE DIVERGENCE for gappy
    * series: the reference's Avg/StdDev accumulate raw NaNs
    * (`summaryseries.go:55-76`) and Last keeps a trailing NaN
    * (`summaryseries.go:79-85`), so one gap poisons the summary and the
    * subsequent top-k ranking compares NaNs — ill-defined order. Here
    * summaries skip unknowns (avg/stddev over known points, last known
    * value), which keeps ranking total and deterministic. */
  def summaries(df: DataFrame): DataFrame =
    df.groupBy(col("name")).agg(
      avg(v).as("savg"),
      max(v).as("smax"),
      min(v).as("smin"),
      sum(v).as("ssum"),
      stddev_samp(v).as("sstd"),
      max_by(v, when(v.isNotNull, col("t"))).as("slast"),
      (count(v).cast("double") / count(lit(1))).as("sfrac"))

  /** [[summaries]] plus the series rows themselves, packed as a
    * `(t, value)` struct array — ONE aggregation pass, so the
    * rank/filter-by-summary functions below consume their (possibly
    * expensive — a live consolidation chain) input exactly once. The
    * previous summarize-then-semi-join-back form evaluated the input
    * twice: Spark pushes the LeftSemi below the consolidation's
    * aggregates (PushDownLeftSemiAntiJoin), which also makes the two
    * subtrees non-identical, defeating exchange reuse — measured 2×
    * the one-pass cost on a 100M-point Blaster corpus.
    *
    * Memory contract: per-series array ≈ the series' slot count. These
    * are render-path functions — input is viewport-bounded (the
    * reference likewise materializes each whole series in memory,
    * `series/summaryseries.go`), so the pack is bounded per executor. */
  private def packedSummaries(df: DataFrame): DataFrame =
    df.groupBy(col("name")).agg(
      avg(v).as("savg"),
      max(v).as("smax"),
      min(v).as("smin"),
      sum(v).as("ssum"),
      stddev_samp(v).as("sstd"),
      // the POPULATION stddev twin: graphite's safeStdDev divides by
      // n, so the graphite-advertised generic names (sortBy, highest/
      // lowest, filterSeries) rank/filter by sstdp; mostDeviant keeps
      // the sample form its reference oracle pins (sstd)
      sqrt(var_pop(v)).as("sstdp"),
      max_by(v, when(v.isNotNull, col("t"))).as("slast"),
      (count(v).cast("double") / count(lit(1))).as("sfrac"),
      collect_list(struct(col("t"), v.as("value"))).as("__pts"))

  /** Re-explode a [[packedSummaries]] selection back to series rows.
    * collect_list keeps `struct(t, null)` elements (the struct itself
    * is non-null), so unknown points survive the round-trip. */
  private def unpack(packed: DataFrame): DataFrame =
    packed.select(col("name"), explode(col("__pts")).as("__p"))
      .select(col("name"), col("__p.t").as("t"), col("__p.value").as("value"))

  private def keepTop(df: DataFrame, metric: Column, n: Int, asc: Boolean): DataFrame = {
    val ord = if (asc) Seq(metric.asc, col("name").asc) else Seq(metric.desc, col("name").asc)
    // orderBy+limit, NOT row_number over an unpartitioned window: Spark
    // plans this as a distributed TakeOrdered (per-partition top-n +
    // driver merge) instead of shuffling every summary row into one task
    unpack(packedSummaries(df).orderBy(ord: _*).limit(n))
  }

  /** highestAverage(n) — graphite-web's missing member of the highest
    * family (extension); the savg twin of [[lowestAverage]]. */
  def highestAverage(df: DataFrame, n: Int): DataFrame =
    keepTop(df, col("savg"), n, asc = false)

  /** aggregateLine(cf) — per input series, a two-point constant line
    * over the viewport at the series' summary value (graphite-web;
    * extension). cf ∈ avg/average, max, min, sum/total, last/current
    * — the [[summaries]] columns, null-skipping by the house summary
    * rule. Output name `aggregateLine(<name>, <cf>)` — graphite embeds
    * the VALUE via %g; a cross-engine float print is not portable, so
    * the cf spells the name instead (documented divergence). A series
    * whose summary is null (no known points) emits null points. */
  def aggregateLine(df: DataFrame, cf: String, fromSec: Long,
      toSec: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val metric = cf match {
      case "avg" | "average" => col("savg")
      case "max"             => col("smax")
      case "min"             => col("smin")
      case "sum" | "total"   => col("ssum")
      case "last" | "current" => col("slast")
      case other => throw new IllegalArgumentException(
        s"unknown aggregator '$other'")
    }
    summaries(df)
      .select(concat(lit("aggregateLine("), col("name"), lit(s", $cf)"))
        .as("name"), metric.as("value"))
      .crossJoin(Seq(fromSec, toSec).toDF("t"))
      .select(col("name"), col("t"), col("value"))
  }

  /** highestCurrent(n) — `dsl/funcs.go:1480-1497` */
  def highestCurrent(df: DataFrame, n: Int): DataFrame = keepTop(df, col("slast"), n, asc = false)
  /** highestMax(n) — `dsl/funcs.go:1499-1516` */
  def highestMax(df: DataFrame, n: Int): DataFrame = keepTop(df, col("smax"), n, asc = false)
  /** lowestAverage(n) — `dsl/funcs.go:1533-1550` */
  def lowestAverage(df: DataFrame, n: Int): DataFrame = keepTop(df, col("savg"), n, asc = true)
  /** lowestCurrent(n) — `dsl/funcs.go:1552-1567` */
  def lowestCurrent(df: DataFrame, n: Int): DataFrame = keepTop(df, col("slast"), n, asc = true)
  /** mostDeviant(n) — `dsl/funcs.go:1625-1642` */
  def mostDeviant(df: DataFrame, n: Int): DataFrame = keepTop(df, col("sstd"), n, asc = false)

  private def keepWhere(df: DataFrame, pred: Column): DataFrame =
    unpack(packedSummaries(df).filter(pred))

  /** maximumAbove/Below, minimumAbove/Below — `dsl/funcs.go:1569-1623` */
  def maximumAbove(df: DataFrame, x: Double): DataFrame = keepWhere(df, col("smax") > x)
  def maximumBelow(df: DataFrame, x: Double): DataFrame = keepWhere(df, col("smax") < x)
  def minimumAbove(df: DataFrame, x: Double): DataFrame = keepWhere(df, col("smin") > x)
  def minimumBelow(df: DataFrame, x: Double): DataFrame = keepWhere(df, col("smin") < x)

  /** averageAbove/Below — graphite-web's missing members of the
    * summary-filter family (the reference stops at max/min/current,
    * `dsl/funcs.go:1569-1623`; extension): keep series whose viewport
    * AVERAGE clears the threshold. Same one-pass packed machinery. */
  def averageAbove(df: DataFrame, x: Double): DataFrame = keepWhere(df, col("savg") > x)
  def averageBelow(df: DataFrame, x: Double): DataFrame = keepWhere(df, col("savg") < x)

  /** currentAbove/Below — the summary-filter family on the LAST known
    * value (graphite-web; extension): keep series whose most recent
    * non-null reading clears the threshold — the "alert view" filter.
    * Same one-pass packed machinery (slast). */
  def currentAbove(df: DataFrame, x: Double): DataFrame = keepWhere(df, col("slast") > x)
  def currentBelow(df: DataFrame, x: Double): DataFrame = keepWhere(df, col("slast") < x)

  /** removeEmptySeries(xff) — graphite-web's dashboard-hygiene filter
    * (extension): drop series the viewport knows nothing about.
    * `xff ≤ 0` keeps any series with at least ONE known point (the
    * graphite default); `xff > 0` requires the known fraction of the
    * series' grid rows to reach it. Same one-pass packed machinery. */
  def removeEmptySeries(df: DataFrame, xff: Double = 0.0): DataFrame =
    keepWhere(df,
      if (xff <= 0.0) col("sfrac") > 0.0 else col("sfrac") >= xff)

  /** setXFilesFactor(xff) — graphite-web 1.1 (extension): identity on
    * the data; attaches the `__xff` channel (a per-row constant column,
    * like the sortBy family's `__ord`) that downstream xff-honoring
    * functions read as their default — [[removeEmptySeriesDefault]].
    * Scope: the channel applies to this subtree; merging a tagged
    * frame with an untagged one in a var-arg set is a schema mismatch
    * (loud), the same contract as `__ord`. */
  def setXFilesFactor(df: DataFrame, xff: Double): DataFrame =
    df.withColumn("__xff", lit(xff))

  /** removeEmptySeries with NO explicit bar: honors an upstream
    * [[setXFilesFactor]] `__xff` channel when present (graphite 1.1's
    * series.xFilesFactor default chain), else the keep-any-known-point
    * graphite default. The channel rides the same one-pass summary
    * aggregation; the output drops it (consumed). */
  def removeEmptySeriesDefault(df: DataFrame): DataFrame =
    if (!df.columns.contains("__xff")) removeEmptySeries(df, 0.0)
    else df.groupBy(col("name")).agg(
        (count(v).cast("double") / count(lit(1))).as("sfrac"),
        max(col("__xff")).as("__xff"),
        collect_list(struct(col("t"), v.as("value"))).as("__pts"))
      .filter(when(col("__xff") <= 0.0, col("sfrac") > 0.0)
        .otherwise(col("sfrac") >= col("__xff")))
      .select(col("name"), explode(col("__pts")).as("__p"))
      .select(col("name"), col("__p.t").as("t"), col("__p.value").as("value"))

  /** cactiStyle(units?) — graphite-web's legend-in-the-name function
    * (extension): every series renamed to the column-aligned
    * `<name> Current:<last> Max:<max> Min:<min> ` layout (graphite's
    * exact shape including the trailing space, `functions.py
    * cactiStyle`); column widths are the set-wide maxima, computed
    * with windows over the ONE-ROW-PER-SERIES packed frame (the
    * [[sortSeries]] render-response bound). Numbers print as %.2f of
    * the half-even-prerounded value (`bround` / DuckDB `round_even` —
    * pre-rounding removes the tie cases where Java's HALF_UP %.2f and
    * C's half-even printf would disagree); an unknown summary prints
    * "nan" (graphite formats float('nan')). The si/binary unit SYSTEMS
    * are not supported (loud) — `units` is the plain suffix form. */
  def cactiStyle(df: DataFrame, units: Option[String] = None): DataFrame = {
    val u = units.map(" " + _).getOrElse("")
    def f(c: Column) = when(c.isNull, lit("nan"))
      .otherwise(concat(format_string("%.2f", bround(c, 2)), lit(u)))
    val wGlob = Window.partitionBy()
    val p = packedSummaries(df)
      .withColumn("__l", f(col("slast")))
      .withColumn("__mx", f(col("smax")))
      .withColumn("__mn", f(col("smin")))
      .withColumn("__nw", max(length(col("name"))).over(wGlob))
      .withColumn("__lw", max(length(col("__l"))).over(wGlob))
      .withColumn("__xw", max(length(col("__mx"))).over(wGlob))
      .withColumn("__mw", max(length(col("__mn"))).over(wGlob))
      .withColumn("name", concat(
        expr("rpad(name, __nw, ' ')"), lit(" Current:"),
        expr("rpad(__l, __lw, ' ')"), lit(" Max:"),
        expr("rpad(__mx, __xw, ' ')"), lit(" Min:"),
        expr("rpad(__mn, __mw, ' ')"), lit(" ")))
    unpack(p)
  }

  /** legendValue(valueTypes…) — graphite-web's name-suffix legend
    * (extension): appends " (type: value)" per requested type, in
    * argument order; types from the summary set (avg/average,
    * total/sum, min, max, last/current). Numbers print by the same
    * cross-engine rule as [[cactiStyle]] (%.2f of the half-even-
    * prerounded double — graphite prints python str(); documented
    * divergence); an unknown summary prints "None" (graphite's
    * literal). The si/binary system args are not supported (loud). */
  def legendValue(df: DataFrame, valueTypes: Seq[String]): DataFrame = {
    require(valueTypes.nonEmpty, "legendValue needs a value type")
    def f(c: Column) = when(c.isNull, lit("None"))
      .otherwise(format_string("%.2f", bround(c, 2)))
    val suffixes = valueTypes.map { vt =>
      val c = vt match {
        case "avg" | "average"  => col("savg")
        case "total" | "sum"    => col("ssum")
        case "min"              => col("smin")
        case "max"              => col("smax")
        case "last" | "current" => col("slast")
        case other => throw new IllegalArgumentException(
          s"legendValue: unknown value type '$other' " +
            "(si/binary systems unsupported)")
      }
      concat(lit(s" ($vt: "), f(c), lit(")"))
    }
    unpack(packedSummaries(df)
      .withColumn("name", concat(col("name") +: suffixes: _*)))
  }

  /** averageOutsidePercentile(n) — graphite-web's band filter on the
    * per-series AVERAGES (extension): keep the series whose viewport
    * average lies OUTSIDE the [100−n, n] percentile band of all the
    * series' averages (n < 50 mirrors to 100−n, as graphite does).
    * Band edges use the repo-wide reference Quantile ([[refQuantile]];
    * graphite's own step-quantile differs on small sets — same
    * documented house rule as nPercentile). The band is computed with
    * one window over the ONE-ROW-PER-SERIES packed frame
    * (render-response bound — the [[sortSeries]] argument); averages
    * skip unknowns (house summary rule), and a series with NO known
    * points has a null average and is KEPT (it cannot lie strictly
    * inside the band — graphite's comparison is false for None too). */
  def averageOutsidePercentile(df: DataFrame, n: Double): DataFrame = {
    val nn = if (n < 50) 100.0 - n else n
    val wGlob = Window.partitionBy()
    val avgs = sort_array(collect_list(col("savg")).over(wGlob))
    val lo = refQuantile(avgs, (100.0 - nn) / 100.0)
    val hi = refQuantile(avgs, nn / 100.0)
    unpack(packedSummaries(df)
      .withColumn("__in", col("savg") > lo && col("savg") < hi)
      .filter(!coalesce(col("__in"), lit(false)))
      .drop("__in"))
  }

  /** removeBetweenPercentile(n) — graphite-web's per-TIMESTAMP band
    * filter (extension): at each t, the [100−n, n] percentile band of
    * all series' values (n < 50 mirrors); a series survives if ANY of
    * its known points escapes its slot's band (the graphite rule —
    * unknown points never count as outside). Band edges per slot via
    * [[refQuantile]] over one t-partitioned window; the survivor pick
    * is the one-pass pack/filter/unpack shape of the summary filters. */
  def removeBetweenPercentile(df: DataFrame, n: Double): DataFrame = {
    val nn = if (n < 50) 100.0 - n else n
    val wT = Window.partitionBy(col("t"))
    val sortedAtT = sort_array(collect_list(v).over(wT))
    val lo = refQuantile(sortedAtT, (100.0 - nn) / 100.0)
    val hi = refQuantile(sortedAtT, nn / 100.0)
    df.withColumn("__out", coalesce(v > hi || v < lo, lit(false)))
      .groupBy(col("name"))
      .agg(collect_list(struct(col("t"), v.as("value"))).as("__pts"),
        max(col("__out")).as("__any"))
      .filter(col("__any"))
      .select(col("name"), explode(col("__pts")).as("__p"))
      .select(col("name"), col("__p.t").as("t"), col("__p.value").as("value"))
  }

  /** useSeriesAbove(value, search, replace) — `dsl/funcs.go:2237-2253` */
  def useSeriesAbove(df: DataFrame, x: Double, search: String, replace: String): DataFrame =
    aliasSub(keepWhere(df, col("smax") > x), search, replace)

  /** limit(n) — first n by sorted name (`dsl/funcs.go:1518-1531`).
    * orderBy+limit → distributed TakeOrdered, no single-partition
    * window; one packed pass over the input (see [[packedSummaries]]). */
  def limitSeries(df: DataFrame, n: Int): DataFrame =
    unpack(packedSummaries(df).orderBy(col("name")).limit(n))

  /** exclude(regex) — `dsl/funcs.go:2197-2211` */
  def exclude(df: DataFrame, pattern: String): DataFrame =
    df.filter(!col("name").rlike(pattern))

  /** grep(regex) — [[exclude]]'s keep-side dual (graphite-web;
    * extension — the reference has only exclude): keep the series
    * whose names match. A name-only predicate, so Catalyst pushes it
    * into the archive scan like exclude's. */
  def grep(df: DataFrame, pattern: String): DataFrame =
    df.filter(col("name").rlike(pattern))

  /** substr(start[, stop]) — graphite-web's name-node slice
    * (extension): rename each series to the '.'-joined nodes
    * `[start, stop)` of its dotted name; negative indices count from
    * the end, stop=0 means "to the end" (graphite's defaults). Pure
    * rename — rows, values and timestamps pass through, and two series
    * may legitimately collapse onto one display name (graphite renders
    * both). */
  def substrName(df: DataFrame, start: Int, stop: Int = 0): DataFrame = {
    val parts = split(col("name"), "\\.")
    val n = size(parts)
    val s0 = if (start < 0) greatest(n + start, lit(0)) else least(lit(start), n)
    val e0 = if (stop == 0) n
      else if (stop < 0) greatest(n + stop, lit(0))
      else least(lit(stop), n)
    val len = greatest(e0 - s0, lit(0))
    df.withColumn("name",
      when(len > 0, array_join(slice(parts, s0 + 1, len), "."))
        .otherwise(lit("")))
  }

  /** fallbackSeries(fallback) — graphite-web's empty-set fallback
    * (extension): the primary set if it matched ANY series, else the
    * fallback set. The emptiness probe is a metadata-scale action (the
    * planner answers it with a 1-row limit over the pruned scan), run
    * once at plan time — the returned frame is whichever side won,
    * with no runtime union or join. */
  def fallbackSeries(primary: DataFrame, fallback: DataFrame): DataFrame =
    if (primary.isEmpty) fallback else primary

  /** The sortBy* family (graphite-web's dashboard-ordering functions;
    * extension — the reference renders map-ordered,
    * `dsl/funcs.go:339-341` "?? sortByMaxima / sortByName"): a
    * `(name, t, value)` frame has no series order of its own, so these
    * attach `__ord` — the series' 1-based position in the requested
    * order — which the render boundary honors ([[graft.Render]]
    * orders by `__ord` before name) and `Eval.render`'s maxPoints
    * re-bucket preserves. The rank window is a global orderBy over the
    * PACKED summary frame — ONE ROW PER SERIES, the render-response
    * bound of [[packedSummaries]], never over point rows — and the
    * points ride the same single pass. */
  private def sortSeries(df: DataFrame, key: String, asc: Boolean): DataFrame = {
    val k = col(key)
    val ord =
      if (asc) Seq(k.asc_nulls_last, col("name").asc)
      else Seq(k.desc_nulls_last, col("name").asc)
    packedSummaries(df)
      .withColumn("__ord", row_number().over(Window.orderBy(ord: _*)))
      .select(col("name"), col("__ord"), explode(col("__pts")).as("__p"))
      .select(col("name"), col("__p.t").as("t"),
        col("__p.value").as("value"), col("__ord"))
  }

  /** Summary-column key for a graphite aggregator name — shared by
    * [[sortBy]], the generic [[highest]]/[[lowest]] pair and
    * [[filterSeries]] (all ride the one-pass [[packedSummaries]]
    * columns). */
  private def summaryKey(cf: String): String = cf match {
    case "average" | "avg"  => "savg"
    case "max" | "maximum"  => "smax"
    case "min" | "minimum"  => "smin"
    case "sum" | "total"    => "ssum"
    case "current" | "last" => "slast"
    // population, graphite's safeStdDev (divides by n) — the sample
    // column sstd stays for mostDeviant's reference-pinned ranking
    case "stddev"           => "sstdp"
    case "name"             => "name"
    case other => throw new IllegalArgumentException(
      s"unknown aggregator '$other'")
  }

  /** sortBy(func, reverse) — the generic member of the family
    * (graphite-web; extension): ASCENDING by the chosen summary
    * (graphite's default), descending under `reverse`. */
  def sortBy(df: DataFrame, cf: String, reverse: Boolean): DataFrame =
    sortSeries(df, summaryKey(cf), asc = !reverse)

  /** highest(n, func) / lowest(n, func) — graphite-web 1.1's generic
    * spelling of the highestX / lowestX family (extension): top/bottom-n
    * series by ANY summary aggregator, over the same one-pass
    * [[packedSummaries]] + distributed-TakeOrdered machinery as the
    * named members. */
  def highest(df: DataFrame, n: Int, cf: String): DataFrame =
    keepTop(df, col(summaryKey(cf)), n, asc = false)
  def lowest(df: DataFrame, n: Int, cf: String): DataFrame =
    keepTop(df, col(summaryKey(cf)), n, asc = true)

  /** filterSeries(func, operator, threshold) — graphite-web 1.1's
    * generic summary filter (extension): keep series whose `func`
    * summary satisfies `operator threshold`; the named members
    * (averageAbove, maximumBelow, currentAbove, …) are its fixed
    * instances, and it rides their one-pass packed machinery. A series
    * whose summary is unknown (no known points) is dropped — SQL
    * three-valued logic, matching graphite, where a None summary fails
    * every comparison. */
  def filterSeries(df: DataFrame, cf: String, operator: String,
      x: Double): DataFrame = {
    val m = col(summaryKey(cf))
    val pred = operator match {
      case "=" | "==" => m === x
      case "!="       => m =!= x
      case ">"        => m > x
      case ">="       => m >= x
      case "<"        => m < x
      case "<="       => m <= x
      case other => throw new IllegalArgumentException(
        s"filterSeries: unknown operator '$other'")
    }
    keepWhere(df, pred)
  }

  /** divideSeriesLists / diffSeriesLists / sumSeriesLists /
    * multiplySeriesLists — pairwise combine of two series LISTS by
    * position (graphite-web; extensions). A relational frame has no
    * list order, so position = the NAME-SORTED rank on each side
    * (graphite's own pairing is its fetch order — this is the
    * deterministic spelling; documented convention). Unequal list
    * lengths fail LOUDLY at execution (graphite raises) — the check
    * rides the output-name expression so pruning can't drop it. Per
    * pair, the value formula is the corresponding 2-series combine's:
    * divide (zero or unknown denominator ⇒ unknown, [[divideSeries]]),
    * diff (unknown on either side ⇒ unknown, [[diffSeriesOrdered]]),
    * multiply (unknown on either side ⇒ unknown, [[multiplySeries]]),
    * sum (gap-as-zero over the grid union, [[sumSeries]]). Output
    * name `<op>(<aName>,<bName>)`. The rank windows run over
    * one-row-per-series name frames (render-response bound — the
    * [[sortSeries]] argument). */
  def pairwiseSeriesLists(a: DataFrame, b: DataFrame, op: String): DataFrame = {
    require(Set("divideSeries", "diffSeries", "sumSeries",
      "multiplySeries")(op), s"unknown pairwise op '$op'")
    val joinType = if (op == "sumSeries") "full_outer" else "inner"
    val value = op match {
      case "divideSeries" =>
        when(col("__vb") === 0.0, lit(null))
          .otherwise(col("__va") / col("__vb"))
      case "diffSeries" => col("__va") - col("__vb")
      case "sumSeries" =>
        coalesce(col("__va"), lit(0.0)) + coalesce(col("__vb"), lit(0.0))
      case "multiplySeries" => col("__va") * col("__vb")
    }
    pairedPoints(a, b, op, joinType)
      .select(col("__out").as("name"), col("t"), value.as("value"))
  }

  /** Name-rank pairing of two series lists: a `(__out, t, __va, __vb)`
    * frame, one row per pair and grid slot, under output name
    * `<label>(<a>,<b>)` — raising loudly on a length mismatch. The
    * shared substrate of [[pairwiseSeriesLists]] and
    * [[aggregateSeriesLists]]; the rank windows run over one-row-per-
    * series name frames (render-response bound — the [[sortSeries]]
    * argument). */
  private def pairedPoints(a: DataFrame, b: DataFrame, label: String,
      joinType: String): DataFrame = {
    def ranked(df: DataFrame, side: String) =
      df.select(col("name")).distinct()
        .withColumn("__r", row_number().over(Window.orderBy(col("name"))))
        .select(col("name").as(s"__n$side"), col("__r"))
    val pairs = ranked(a, "a").join(ranked(b, "b"), Seq("__r"), "full_outer")
      .select(col("__na"), col("__nb"),
        when(col("__na").isNull || col("__nb").isNull,
          raise_error(concat(lit(s"$label: the two series lists differ " +
            "in length at rank "), col("__r").cast("string"))))
          .otherwise(concat(lit(s"$label("), col("__na"), lit(","),
            col("__nb"), lit(")"))).as("__out"))
    val pa = a.join(pairs.select(col("__na").as("name"), col("__out")),
        Seq("name"))
      .select(col("__out"), col("t"), v.as("__va"))
    val pb = b.join(pairs.select(col("__nb").as("name"), col("__out")),
        Seq("name"))
      .select(col("__out"), col("t"), v.as("__vb"))
    pa.join(pb, Seq("__out", "t"), joinType)
  }

  /** aggregateSeriesLists(listA, listB, func) — graphite-web 1.1's
    * generic pairwise-list combine (extension): series pair by
    * name-sorted rank (the [[pairwiseSeriesLists]] convention; a
    * length mismatch raises), and each pair combines under graphite's
    * SAFE (None-skipping) aggregator semantics — a slot known on only
    * one side aggregates that one known value, both-unknown ⇒ unknown
    * (graphite's per-column `if vals:` gate). Exceptions faithful to
    * graphite's aggregator table: `multiply` is safeMul (ANY unknown ⇒
    * unknown) and `diff` is safeDiff (the first KNOWN value minus the
    * remaining knowns — so an unknown minuend yields the subtrahend,
    * positive). Output name `<func>Series(<a>,<b>)` (graphite embeds
    * its fetch-order name list; documented divergence, same as the
    * fixed quartet). The fixed quartet keeps the reference-derived
    * semantics (gap-as-zero sum, null-propagating diff/multiply,
    * inner-grid join) — this generic form is the graphite-faithful
    * safe family over the full-outer grid, kept separate deliberately. */
  def aggregateSeriesLists(a: DataFrame, b: DataFrame, func: String): DataFrame = {
    val va = col("__va"); val vb = col("__vb")
    val bothNull = va.isNull && vb.isNull
    val known2 = va.isNotNull && vb.isNotNull
    val knownCount =
      (va.isNotNull.cast("int") + vb.isNotNull.cast("int")).cast("double")
    val safeMean = (coalesce(va, lit(0.0)) + coalesce(vb, lit(0.0))) / knownCount
    val value = func match {
      case "sum" | "total" =>
        coalesce(va, lit(0.0)) + coalesce(vb, lit(0.0))
      case "avg" | "average"   => safeMean
      // median of ≤ 2 known values IS their mean
      case "median"            => safeMean
      case "max"               => greatest(va, vb) // greatest/least skip NULLs
      case "min"               => least(va, vb)
      case "range" | "rangeOf" => greatest(va, vb) - least(va, vb)
      case "diff"              => when(known2, va - vb).otherwise(coalesce(va, vb))
      case "multiply"          => va * vb
      case "count"             => knownCount
      case "last" | "current"  => coalesce(vb, va)
      // population stddev of the knowns: one known value → 0
      case "stddev" => when(known2, abs(va - vb) / 2.0).otherwise(lit(0.0))
      case other => throw new IllegalArgumentException(
        s"aggregateSeriesLists: unknown function '$other'")
    }
    pairedPoints(a, b, s"${func}Series", "full_outer")
      .select(col("__out").as("name"), col("t"),
        when(bothNull, lit(null)).otherwise(value).as("value"))
  }

  /** sortByMaxima — highest series max first. */
  def sortByMaxima(df: DataFrame): DataFrame = sortSeries(df, "smax", asc = false)
  /** sortByMinima — lowest series min first. */
  def sortByMinima(df: DataFrame): DataFrame = sortSeries(df, "smin", asc = true)
  /** sortByTotal — highest series sum first. */
  def sortByTotal(df: DataFrame): DataFrame = sortSeries(df, "ssum", asc = false)
  /** sortByName — lexicographic (graphite's default `natural=false`). */
  def sortByName(df: DataFrame): DataFrame = sortSeries(df, "name", asc = true)

  /** Series-similarity search: rank series by Pearson correlation with
    * `target` over their common timestamps — "find series shaped like
    * X" (beyond the reference; the time-series similarity-search
    * extension). The target side is ONE series (viewport-bounded) and
    * broadcasts; the corpus side is a map-side-combinable per-name
    * aggregate followed by a distributed TakeOrdered — no all-pairs
    * stage anywhere. Correlation uses the explicit-sum formula so the
    * oracle states the identical arithmetic (built-in corr()
    * accumulation differs between engines). Returns (name, corr),
    * best first. */
  def mostSimilar(df: DataFrame, target: String, k: Int): DataFrame = {
    val t = broadcast(df.filter(col("name") === target)
      .select(col("t"), col("value").as("__tv")))
    df.filter(col("name") =!= target)
      .join(t, "t")
      .groupBy(col("name"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("value")).as("sx"), sum(col("__tv")).as("sy"),
        sum(col("value") * col("__tv")).as("sxy"),
        sum(col("value") * col("value")).as("sxx"),
        sum(col("__tv") * col("__tv")).as("syy"))
      .select(col("name"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy")))).as("corr"))
      .orderBy(col("corr").desc_nulls_last, col("name"))
      .limit(k)
  }

  // ===== alignment (SeriesSlice.Align — LCM of member steps,
  // ===== re-consolidate by average: series/seriesslice.go:138-172) =====

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
  def lcm(a: Long, b: Long): Long = a / gcd(a, b) * b

  /** Align a set of frames with differing steps onto the LCM step by
    * average re-consolidation, then union. */
  def align(frames: Seq[(DataFrame, Long)]): (DataFrame, Long) = {
    val step = frames.map(_._2).reduce(lcm)
    val out = frames.map { case (df, s) =>
      if (s == step) df
      else df.groupBy(col("name"),
          (floor(col("t").divide(lit(step))).cast("long") * step).as("t"))
        .agg(avg(v).as("value"))
    }.reduce(_.unionByName(_))
    (out, step)
  }

  // ===== generators =====

  /** constantLine(v) — 2-point series spanning the range
    * (`dsl/funcs.go:2093-2114`) */
  def constantLine(spark: org.apache.spark.sql.SparkSession,
      value: Double, fromSec: Long, toSec: Long): DataFrame = {
    import spark.implicits._
    Seq((s"constantLine($value)", fromSec, value),
        (s"constantLine($value)", toSec, value))
      .toDF("name", "t", "value")
  }

  /** The reference's Quantile (`series/seriesslice.go:241-271`):
    * pos = p(n+1), clamped, linear interpolation — over a pre-sorted
    * ascending array column (1-based element_at). */
  def refQuantile(sorted: Column, p: Double): Column = {
    val n = size(sorted)
    val pos = lit(p) * (n.cast("double") + lit(1.0))
    val fp = floor(pos)
    val lower = element_at(sorted, fp.cast("int"))
    val upper = element_at(sorted, fp.cast("int") + 1)
    when(n === 0, lit(null))
      .when(pos < 1.0, element_at(sorted, 1))
      .when(pos >= n.cast("double"), element_at(sorted, n))
      .otherwise(lower + (pos - fp) * (upper - lower))
  }

  /** Exponential moving average per series — graphite-web's
    * `exponentialMovingAverage` (extension beyond the reference's
    * DSL): α = 2/(w+1), seeded the way graphite-web seeds — with the
    * SIMPLE average of the first `w` observed points. The seed EMA is
    * emitted at the w-th observed point's timestamp and the leading
    * w−1 points are consumed as warm-up (graphite-web backfills the
    * warm-up window from pre-viewport history; a viewport-only engine
    * consumes the viewport's leading window instead — that residual
    * divergence is the documented API, see README §DSL extensions).
    * A series with fewer than `w` observed points falls back to the
    * `ema₀ = v₀` seed with every point emitted. After the seed,
    * `emaᵢ = α·vᵢ + (1−α)·emaᵢ₋₁` over the non-null points in t
    * order. A sequential per-series recurrence — `flatMapGroups` over
    * viewport-bounded arrays, the Holt-Winters shape — whose double
    * ops (left-to-right warm-up sum, one division, then the
    * recurrence) run in the exact same order as the oracle's
    * recursive CTE, so results replay bit-identically. Null points
    * are dropped (no EMA at a gap), matching the observed-points
    * contract of [[graft.ts.Lttb]].
    *
    * MEMORY CONTRACT (the [[graft.ts.Lttb]] one): each series is
    * materialized as ONE task-local array, so callers must bound the
    * per-series point count upstream — the render path does (a fetch
    * is viewport-bounded by the RRA's span/step) — and the operator
    * enforces a hard ceiling of [[SeqOpMaxPoints]] points per series,
    * failing loudly rather than silently ballooning an executor. */
  def exponentialMovingAverage(df: DataFrame, windowSize: Int): DataFrame = {
    require(windowSize >= 1, "exponentialMovingAverage window must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val alpha = 2.0 / (windowSize + 1)
    df.filter(col("value").isNotNull)
      .select(col("name"), col("t").cast("long").as("t"),
        col("value").cast("double").as("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (name, it) =>
        val pts = boundedSeries("exponentialMovingAverage", name, it)
          .sortBy(_._2)
        val full = pts.length >= windowSize
        var e = 0.0
        pts.iterator.zipWithIndex.flatMap { case ((_, t, v), i) =>
          if (full && i < windowSize - 1) { // warm-up: running sum
            e = e + v; None
          } else if (full && i == windowSize - 1) { // seed = SMA of window
            e = (e + v) / windowSize; Some((name, t, e))
          } else { // recurrence (and the n<w fallback's v0 seed at i=0)
            e = if (i == 0) v else alpha * v + (1 - alpha) * e
            Some((name, t, e))
          }
        }
      }
      .toDF("name", "t", "value")
  }

  /** DuckDB twin of [[exponentialMovingAverage]] over CTE
    * `src(name, t, value)`: pack per series, recurse index-by-index
    * through the identical warm-up-sum / SMA-seed / `α·v + (1−α)·e`
    * phases. Defines `out(name, t, value)`; compose under
    * `WITH RECURSIVE`. */
  def exponentialMovingAverageSql(windowSize: Int,
      src: String = "series"): String = {
    val w = windowSize
    val a = s"(2.0 / (${w} + 1))"
    s"""epk AS (
       |  SELECT name, CAST(count(*) AS BIGINT) AS n,
       |         list(t ORDER BY t) AS ts,
       |         list(CAST(value AS DOUBLE) ORDER BY t) AS vs
       |  FROM $src WHERE value IS NOT NULL GROUP BY name
       |), ema AS (
       |  SELECT name, CAST(0 AS BIGINT) AS i, vs[1] AS e FROM epk
       |  UNION ALL
       |  SELECT m.name, m.i + 1,
       |    CASE WHEN p.n >= $w AND m.i + 1 < $w - 1
       |           THEN m.e + p.vs[CAST(m.i AS INT) + 2]
       |         WHEN p.n >= $w AND m.i + 1 = $w - 1
       |           THEN (m.e + p.vs[CAST(m.i AS INT) + 2]) / $w
       |         ELSE $a * p.vs[CAST(m.i AS INT) + 2] + (1 - $a) * m.e
       |    END
       |  FROM ema m JOIN epk p USING (name)
       |  WHERE m.i + 1 < p.n
       |), out AS (
       |  SELECT m.name, p.ts[CAST(m.i AS INT) + 1] AS t, m.e AS value
       |  FROM ema m JOIN epk p USING (name)
       |  WHERE p.n < $w OR m.i >= $w - 1
       |)""".stripMargin
  }

  /** Least-squares trend line per series — graphite-web's
    * `linearRegression` (an EXTENSION beyond the reference's DSL, like
    * the tag functions and `lttb`): fit v ≈ A + B·t over the series'
    * non-null points, emit the fitted value at every input timestamp
    * (the line Grafana overlays on the raw series).
    *
    * Determinism contract (the kmeans idiom): the five sufficient
    * statistics (n, Σdt, Σdt², Σq, Σdt·q with q the ×10⁴-quantized
    * value and dt the per-series t offset) accumulate EXACTLY —
    * DECIMAL(38,0) here, HUGEINT in the DuckDB twin — and only the
    * final fit runs in doubles, in ONE fixed expression shape both
    * engines evaluate identically from identical integers. A
    * degenerate fit (constant t, or < 2 observed points ⇒ zero
    * denominator) emits the flat mean line. All window aggregates are
    * series-partitioned — one shuffle, no driver state.
    *
    * DOMAIN BOUND (loudly enforced): the exact statistics live in
    * decimal(38,0) here and HUGEINT (~1.7e38 signed) in the twin, so
    * per-series `n·Σ(dt·q)` and `n·Σdt²` must stay under 1e38 — i.e.
    * t-span × quantized-value products bounded by ~1e38/n. Under
    * ANSI mode (the Spark 4 default) the decimal arithmetic raises on
    * its own; under non-ANSI an overflow is a silent null that
    * unguarded would fall through to a flat/null fit while DuckDB
    * raises — here any overflow null (a sum that is null despite
    * n > 0, or a null product of non-null sums) raises the same loud
    * error, so the engines never silently diverge in either mode. */
  def linearRegression(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("name"))
    val dec = "decimal(38,0)"
    val obs = col("value").isNotNull
    val base = df.select(col("name"), col("t").cast("long").as("t"),
        col("value").cast("double").as("value"))
      .withColumn("__t0", min(when(obs, col("t"))).over(w))
      .withColumn("__dt", (col("t") - col("__t0")).cast(dec))
      .withColumn("__q",
        floor(col("value") * 10000 + lit(0.5)).cast(dec))
    val n = count(when(obs, lit(1))).over(w).cast(dec)
    val zero = lit(0).cast(dec)
    // a decimal overflow surfaces as null (non-ANSI); with n > 0 a
    // null sum can ONLY mean overflow — raise rather than coalesce it
    // into a silently-wrong 0 (the DuckDB twin raises on HUGEINT
    // overflow, so loud-fail keeps the engines in lockstep)
    def guarded(c: Column): Column = {
      val s = sum(when(obs, c)).over(w)
      when(n > zero && s.isNull, raise_error(lit(
        "linearRegression: exact statistic overflowed decimal(38,0) — " +
          "t-span x quantized-value products must stay under 1e38 " +
          "(consolidate or re-baseline t before fitting)")).cast(dec))
        .otherwise(coalesce(s, zero))
    }
    val sx = guarded(col("__dt"))
    val sxx = guarded(col("__dt") * col("__dt"))
    val sy = guarded(col("__q"))
    val sxy = guarded(col("__dt") * col("__q"))
    val bnum = n * sxy - sx * sy
    val bden = n * sxx - sx * sx
    val bb = when((bnum.isNull || bden.isNull) && n > zero, raise_error(lit(
        "linearRegression: n*Sxy - Sx*Sy (or the denominator) " +
          "overflowed decimal(38,0) — see the operator's domain bound"))
        .cast("double"))
      .when(bden === zero, lit(0.0))
      .otherwise(bnum.cast("double") / bden.cast("double"))
    val aa = (sy.cast("double") - bb * sx.cast("double")) / n.cast("double")
    base
      .withColumn("value",
        when(n === lit(0).cast(dec), lit(null).cast("double"))
          .otherwise((aa + bb * col("__dt").cast("double")) / lit(10000.0)))
      .select(col("name"), col("t"), col("value"))
  }

  /** DuckDB twin of [[linearRegression]] over CTE `src(name, t,
    * value)`; defines `out(name, t, value)`. Formula-identical: exact
    * HUGEINT statistics, the same single double expression. */
  def linearRegressionSql(src: String = "series"): String =
    s"""lr0 AS (
       |  SELECT name, min(CASE WHEN value IS NOT NULL THEN t END) AS t0
       |  FROM $src GROUP BY name
       |), lrs AS (
       |  SELECT s.name,
       |    CAST(count(s.value) AS HUGEINT) AS n,
       |    coalesce(sum(CASE WHEN s.value IS NOT NULL
       |      THEN CAST(s.t - l.t0 AS HUGEINT) END), 0) AS sx,
       |    coalesce(sum(CASE WHEN s.value IS NOT NULL
       |      THEN CAST(s.t - l.t0 AS HUGEINT) * CAST(s.t - l.t0 AS HUGEINT) END), 0) AS sxx,
       |    coalesce(sum(CASE WHEN s.value IS NOT NULL
       |      THEN CAST(floor(CAST(s.value AS DOUBLE) * 10000 + 0.5) AS HUGEINT) END), 0) AS sy,
       |    coalesce(sum(CASE WHEN s.value IS NOT NULL
       |      THEN CAST(s.t - l.t0 AS HUGEINT) *
       |           CAST(floor(CAST(s.value AS DOUBLE) * 10000 + 0.5) AS HUGEINT) END), 0) AS sxy
       |  FROM $src s JOIN lr0 l USING (name) GROUP BY s.name
       |), lrf AS (
       |  SELECT name, n,
       |    CASE WHEN n * sxx - sx * sx = 0 THEN CAST(0 AS DOUBLE)
       |         ELSE CAST(n * sxy - sx * sy AS DOUBLE)
       |              / CAST(n * sxx - sx * sx AS DOUBLE) END AS bb,
       |    sx, sy
       |  FROM lrs
       |), out AS (
       |  SELECT s.name, s.t,
       |    CASE WHEN f.n = 0 THEN NULL
       |         ELSE ((CAST(f.sy AS DOUBLE) - f.bb * CAST(f.sx AS DOUBLE))
       |                 / CAST(f.n AS DOUBLE)
       |               + f.bb * CAST(s.t - l.t0 AS DOUBLE)) / 10000.0 END AS value
       |  FROM $src s JOIN lr0 l USING (name) JOIN lrf f USING (name)
       |)""".stripMargin

  /** SQL text of refQuantile for the DuckDB oracle — `s` must be a sorted
    * DuckDB list expression, `p` the quantile. Kept adjacent to
    * [[refQuantile]]; the two must stay formula-identical. */
  def refQuantileSql(s: String, p: Double): String = {
    val pos = s"($p * (len($s) + 1.0))"
    val fp = s"floor($pos)"
    s"""CASE WHEN len($s) = 0 THEN NULL
       | WHEN $pos < 1.0 THEN $s[1]
       | WHEN $pos >= CAST(len($s) AS DOUBLE) THEN $s[len($s)]
       | ELSE $s[CAST($fp AS INT)] + ($pos - $fp) * ($s[CAST($fp AS INT) + 1] - $s[CAST($fp AS INT)])
       | END""".stripMargin.replace("\n", " ")
  }
}
