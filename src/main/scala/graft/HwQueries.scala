package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ts.{HwOps, SeriesModel => M, Round6}

/** Driver-checked queries for the Holt-Winters family
  * (`dsl/funcs.go:2395-2622`). The smoothing recursion is sequential
  * per series — no SQL restatement exists, so these entries have no
  * DuckDB oracle (the driver records a rows-only check); the math is
  * pinned instead by [[graft.HoltWintersSpec]] against independently
  * computed vectors.
  *
  * Season length: 24 points = 1 day at the 1-hour store step, the
  * reference's default seasonLen="1d" (`dsl/funcs.go:239`).
  */
object HwQueries {

  type Q = (SparkSession, String) => DataFrame

  private def fin(df: DataFrame): DataFrame =
    df.select(col("name"), col("t").cast("long").as("t"),
        Round6.r6(col("value").cast("double")).as("value"))
      .orderBy(col("name").asc_nulls_first, col("t").asc_nulls_first,
        col("value").asc_nulls_first)

  private val Slen = 24    // 1d season at 1h step
  private val NPred = 24   // forecast one season past the data

  val entries: Seq[(String, Q)] = Seq(

    // fixed (α,β,γ): deterministic single-pass smoothing + forecast
    ("hw_forecast", (s, d) => fin(HwOps.holtWintersForecast(
      s, M.dense(s, d).filter(col("name") === "click"),
      Slen, NPred, Some((0.5, 0.4, 0.6)), 10.0, "smooth", M.StepSeconds))),

    // confidence bands (upper+lower) with the default devScale=10
    ("hw_confidence", (s, d) => fin(HwOps.holtWintersForecast(
      s, M.dense(s, d).filter(col("name") === "click"),
      Slen, NPred, Some((0.5, 0.4, 0.6)), 10.0, "conf", M.StepSeconds))),

    // aberration series (reference compares smooth to its own bands)
    ("hw_aberration", (s, d) => fin(HwOps.holtWintersForecast(
      s, M.dense(s, d).filter(col("name") === "view"),
      Slen, NPred, Some((0.5, 0.4, 0.6)), 3.0, "aberr", M.StepSeconds))),

    // α=β=γ=0 → Nelder-Mead SSE auto-fit, all series at once
    ("hw_autofit", (s, d) => fin(HwOps.holtWintersForecast(
      s, M.dense(s, d), Slen, NPred, None, 10.0, "smooth", M.StepSeconds)))
  )

  def queries: Map[String, Q] = entries.toMap
}
