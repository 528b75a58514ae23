package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ts.{HwOps, SeriesModel => M, Round6}

/** Driver-checked queries for the Holt-Winters family
  * (`dsl/funcs.go:2395-2622`). The fixed-(α,β,γ) queries are fully
  * oracle-checked by a DuckDB *recursive CTE* restatement of the
  * smoothing recursion (see [[hwSql]]); the Nelder-Mead auto-fit is
  * checked against the committed output of `tools/hw_oracle.py`, an
  * independent JVM-free Python port. The math is additionally pinned by
  * [[graft.HoltWintersSpec]] against independently computed vectors.
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

  /** DuckDB restatement of the fixed-(α,β,γ) smoothing recursion as a
    * recursive CTE: the per-step state (level, trend, 24-slot seasonal
    * and seasonal-deviation lists) is carried row-to-row with list
    * updates, and the NIST initial trend/seasonal factors are sequential
    * `list_reduce` folds so the floating-point addition order matches
    * the per-series loop exactly. One recursion drives all requested
    * series at once (one row per series per step). This makes the three
    * fixed-parameter Holt-Winters queries fully oracle-checked from the
    * base `events` table — no precomputed fixtures.
    */
  private def hwSql(names: Seq[String], a: Double, b: Double, g: Double,
      devScale: Double, show: String): String = {
    val step = M.StepSeconds
    val nameList = names.map(n => s"'$n'").mkString(", ")
    val A = s"CAST($a AS DOUBLE)"
    val B = s"CAST($b AS DOUBLE)"
    val G = s"CAST($g AS DOUBLE)"
    val DS = s"CAST($devScale AS DOUBLE)"
    val bias = "0.500137" // graft.ts.Round6
    def r6(e: String) = s"floor(($e) * 1000000.0 + $bias) / 1000000.0"
    val sel = Seq(
      if (show.contains("smooth")) Seq(
        "SELECT 'holtWintersForecast(' || name || ')' AS name, t, res AS value FROM pts")
      else Nil,
      if (show.contains("conf")) Seq(
        s"SELECT 'holtWintersConfidenceUpper(' || name || ')' AS name, t, res + res * dv * $DS AS value FROM pts",
        s"SELECT 'holtWintersConfidenceLower(' || name || ')' AS name, t, res - res * dv * $DS AS value FROM pts")
      else Nil,
      if (show.contains("aberr")) Seq(
        s"""SELECT 'holtWintersAberration(' || name || ')' AS name, t,
           |  CASE WHEN res < res - res * dv * $DS THEN res - (res - res * dv * $DS)
           |       WHEN res > res + res * dv * $DS THEN res - (res + res * dv * $DS)
           |       ELSE CAST(0 AS DOUBLE) END AS value FROM pts""".stripMargin)
      else Nil).flatten.mkString(" UNION ALL ")
    s"""WITH RECURSIVE bounds AS (
       |  SELECT CAST(floor(epoch(min(ts)) / $step) AS BIGINT) * $step AS lo,
       |         CAST(floor(epoch(max(ts)) / $step) AS BIGINT) * $step AS hi
       |  FROM events
       |), grid AS (
       |  SELECT unnest(generate_series(lo, hi, $step)) AS t FROM bounds
       |), nm AS (
       |  SELECT DISTINCT event_type AS name FROM events WHERE event_type IN ($nameList)
       |), raw AS (
       |  SELECT event_type AS name,
       |         CAST(floor(epoch(ts) / $step) AS BIGINT) * $step AS t,
       |         ${r6("avg(value)")} AS value
       |  FROM events GROUP BY 1, 2
       |), dense AS (
       |  SELECT n.name, g.t, r.value
       |  FROM grid g CROSS JOIN nm n
       |  LEFT JOIN raw r ON r.name = n.name AND r.t = g.t
       |), filled AS (
       |  SELECT name, t,
       |         last_value(value IGNORE NULLS) OVER (
       |           PARTITION BY name ORDER BY t
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
       |  FROM dense
       |  QUALIFY t >= min(t) FILTER (value IS NOT NULL) OVER (PARTITION BY name)
       |), packed AS (
       |  SELECT name, min(t) AS start, CAST(count(*) AS BIGINT) AS len,
       |         list(value ORDER BY t) AS data
       |  FROM filled GROUP BY name
       |), init AS (
       |  SELECT name, start, len, data,
       |         list_reduce(list_transform(generate_series(0, ${Slen - 1}),
       |           i -> (data[i + $Slen + 1] - data[i + 1]) / CAST($Slen AS DOUBLE)),
       |           (x, y) -> x + y) / CAST($Slen AS DOUBLE) AS trend0,
       |         list_transform(generate_series(0, ${Slen - 1}), i ->
       |           list_reduce(list_transform(generate_series(0, CAST(len // $Slen AS INT) - 1),
       |             j -> data[j * $Slen + i + 1] /
       |                  (list_reduce(list_transform(generate_series(0, ${Slen - 1}),
       |                     q -> data[j * $Slen + q + 1]), (x, y) -> x + y) / CAST($Slen AS DOUBLE))),
       |             (x, y) -> x + y) / CAST(len // $Slen AS DOUBLE)) AS seasonal0
       |  FROM packed
       |), hw AS (
       |  SELECT name, CAST(0 AS BIGINT) AS i, data[1] AS level, trend0 AS trend,
       |         seasonal0 AS seasonal,
       |         list_transform(generate_series(1, $Slen), x -> CAST(0 AS DOUBLE)) AS sdev,
       |         data[1] AS res, CAST(0 AS DOUBLE) AS dv
       |  FROM init
       |  UNION ALL
       |  SELECT name, ni,
       |         CASE WHEN fc THEN level ELSE level1 END,
       |         CASE WHEN fc THEN trend ELSE trend1 END,
       |         CASE WHEN fc THEN seasonal
       |              ELSE list_transform(seasonal, (x, ix) -> CASE WHEN ix = k THEN snew ELSE x END) END,
       |         CASE WHEN fc OR ni <= 2 THEN sdev
       |              ELSE list_transform(sdev, (x, ix) -> CASE WHEN ix = k THEN sdnew ELSE x END) END,
       |         CASE WHEN fc THEN (level + (ni - len + 1) * trend) * seasonal[k]
       |              ELSE (level1 + trend1) * snew END,
       |         CASE WHEN fc THEN sdev[k] WHEN ni <= 2 THEN sdev[k] ELSE sdnew END
       |  FROM (
       |    SELECT *, CASE WHEN fc OR ni <= 2 THEN CAST(0 AS DOUBLE)
       |                   WHEN res1 / v > 1 THEN $G * (1 - 1 / (res1 / v)) + (1 - $G) * sdev[k]
       |                   ELSE $G * (1 - res1 / v) + (1 - $G) * sdev[k] END AS sdnew
       |    FROM (
       |      SELECT *, (level1 + trend1) * snew AS res1
       |      FROM (
       |        SELECT *, $B * (level1 - level) + (1 - $B) * trend AS trend1,
       |               $G * v / level1 + (1 - $G) * seasonal[k] AS snew
       |        FROM (
       |          SELECT *, $A * v / seasonal[k] + (1 - $A) * (level + trend) AS level1
       |          FROM (
       |            SELECT h.*, p.len, p.data, h.i + 1 AS ni,
       |                   CAST((h.i + 1) % $Slen AS INT) + 1 AS k,
       |                   p.data[CAST(h.i + 2 AS INT)] AS v,
       |                   h.i + 1 >= p.len AS fc
       |            FROM hw h JOIN packed p USING (name)
       |            WHERE h.i < p.len + $NPred - 1
       |          )
       |        )
       |      )
       |    )
       |  )
       |), pts AS (
       |  SELECT h.name, p.start + h.i * $step AS t, h.res, h.dv
       |  FROM hw h JOIN packed p USING (name)
       |)
       |SELECT name, t, ${r6("value")} AS value
       |FROM ($sel)
       |ORDER BY name ASC, t ASC, value ASC""".stripMargin
  }

  /** hw_autofit's Nelder-Mead parameter search has no tractable SQL
    * restatement, so its oracle is the committed output of
    * `tools/hw_oracle.py` — an independent, JVM-free Python port of the
    * reference smoothing + simplex math (regenerate with
    * `python3 tools/hw_oracle.py /root/testdata/sf0.01 tools/hw_oracle_out/sf0.01`).
    * The three fixed-parameter queries get the live recursive-CTE oracle.
    */
  def oracles: Map[String, String] = Map(
    "hw_forecast" -> hwSql(Seq("click"), 0.5, 0.4, 0.6, 10.0, "smooth"),
    "hw_confidence" -> hwSql(Seq("click"), 0.5, 0.4, 0.6, 10.0, "conf"),
    "hw_aberration" -> hwSql(Seq("view"), 0.5, 0.4, 0.6, 3.0, "aberr"),
    "hw_autofit" ->
      ("SELECT name, t, value FROM read_parquet('/root/repo/tools/hw_oracle_out/sf0.01/hw_autofit.parquet') " +
        "ORDER BY name ASC, t ASC, value ASC"))
}
