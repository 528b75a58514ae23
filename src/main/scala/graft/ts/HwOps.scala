package graft.ts

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark operator for the Holt-Winters DSL family
  * (`dsl/funcs.go:2395-2622`). The smoothing recursion needs the whole
  * ordered series in one place — it is inherently sequential per series
  * (`SURVEY §4`: not expressible as a SQL window) — so it runs inside
  * `flatMapGroups`: one series per task, the natural Spark unit for
  * "small per key, many keys". At 100 TB the upstream consolidation has
  * already reduced each series to a bounded viewport grid (maxPoints
  * re-bucketing), so group size is capped regardless of raw data volume;
  * the shuffle is one exchange hash-partitioned by series name.
  */
object HwOps {

  /** Run the forecast over a (possibly gappy) series frame.
    *
    * NaN policy (`dsl/funcs.go:2409-2434` nanlessData): leading unknowns
    * are skipped (the series starts at its first known point), interior
    * unknowns recycle the last known value.
    *
    * Output names follow the reference's aliases
    * (`dsl/funcs.go:2548-2596`): `holtWintersForecast(name)`,
    * `holtWintersConfidenceUpper/Lower(name)`,
    * `holtWintersAberration(name)`.
    *
    * @param slenPoints season length in points (seasonLen / step)
    * @param nPred      number of slots to forecast past the data end
    *                   (0 with `predUntilSec` set derives it per series
    *                   from the viewport end, as the reference does)
    * @param abg        Some((α,β,γ)) fixed, or None → Nelder-Mead SSE fit
    *                   (the reference's α=β=γ=0 convention)
    * @param show       any of "smooth", "conf", "aberr" (comma-combined)
    */
  def holtWintersForecast(spark: SparkSession, df: DataFrame,
      slenPoints: Int, nPred: Int, abg: Option[(Double, Double, Double)],
      devScale: Double, show: String, stepSec: Long,
      predUntilSec: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val showSmooth = show.contains("smooth")
    val showConf = show.contains("conf")
    val showAberr = show.contains("aberr")

    df.select("name", "t", "value")
      .as[(String, Long, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (name: String, it: Iterator[(String, Long, Option[Double])]) =>
        val pts = it.toArray.sortBy(_._2)
        // nanless: drop leading unknowns, forward-fill interior ones
        val fromIdx = pts.indexWhere(_._3.isDefined)
        if (fromIdx < 0) Iterator.empty
        else {
          val known = pts.drop(fromIdx)
          val start = known.head._2
          val endT = known.last._2
          // walk the STEP GRID, not the input rows: an interior slot
          // that is absent entirely (the sparse-frame gap convention)
          // recycles like an explicit null, and — crucially — does not
          // shift every later point's reconstructed timestamp
          // (reference nanlessData reads the dense db grid,
          // `dsl/funcs.go:2409-2434`)
          val byT = known.iterator.map(p => p._2 -> p._3).toMap
          val nGrid = (((endT - start) / stepSec) + 1).toInt
          val data = new Array[Double](nGrid)
          var last = 0.0
          var i = 0
          while (i < nGrid) {
            byT.getOrElse(start + i * stepSec, None) match {
              case Some(v) => last = v
              case None    => // absent or null: recycle previous value
            }
            data(i) = last
            i += 1
          }
          // forecast extension past the data end, per series — the
          // reference's nPreds = (to − Latest()) / GroupBy()
          // (`dsl/funcs.go:2506-2510`); an explicit nPred wins
          val effPred = predUntilSec
            .map(u => math.max(0L, (u - endT) / stepSec).toInt)
            .filter(_ => nPred == 0).getOrElse(nPred)

          val trend = HoltWinters.initialTrend(data, slenPoints)
          val seasonal = HoltWinters.initialSeasonal(data, slenPoints)
          val (sm, dev) = abg match {
            case Some((a, b, g)) =>
              val (s, d, _) = HoltWinters.smooth(
                data, slenPoints, trend, seasonal, effPred, a, b, g)
              (s, d)
            case None =>
              val (s, d, _, _, _) = HoltWinters.minimizeSse(
                data, slenPoints, trend, seasonal, effPred)
              (s, d)
          }

          val out = Iterator.range(0, sm.length).flatMap { i =>
            val t = start + i * stepSec
            val upper = sm(i) + sm(i) * dev(i) * devScale
            val lower = sm(i) - sm(i) * dev(i) * devScale
            val rows = List.newBuilder[(String, Long, Double)]
            if (showSmooth)
              rows += ((s"holtWintersForecast($name)", t, sm(i)))
            if (showConf) {
              rows += ((s"holtWintersConfidenceUpper($name)", t, upper))
              rows += ((s"holtWintersConfidenceLower($name)", t, lower))
            }
            if (showAberr) {
              // reference compares the smooth to its own bands
              // (`dsl/funcs.go:2578-2590`)
              val ab =
                if (sm(i) < lower) sm(i) - lower
                else if (sm(i) > upper) sm(i) - upper
                else 0.0
              rows += ((s"holtWintersAberration($name)", t, ab))
            }
            rows.result()
          }
          out
        }
      }
      .toDF("name", "t", "value")
  }
}
