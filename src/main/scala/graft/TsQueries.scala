package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ts.{SeriesModel => M, SeriesOps => O}

/** Driver-checked queries for the tgres DSL operator inventory
  * (SURVEY §2.3). Each entry pairs the Spark implementation with a
  * DuckDB oracle that computes the *same formula* over the same parquet
  * tables. Conventions shared by both sides:
  *   - canonical output `(name STRING, t BIGINT epoch-sec, value DOUBLE)`
  *   - final `round(value, 6)`; deterministic ORDER BY name, t, value
  *     (NULLS FIRST) so the driver's hash sees identical row streams.
  */
object TsQueries {

  type Q = (SparkSession, String) => DataFrame

  // Round6: cross-engine-deterministic quantization (see graft.ts.Round6)
  private def fin(df: DataFrame): DataFrame =
    df.select(col("name"), col("t").cast("long").as("t"),
        ts.Round6.r6(col("value").cast("double")).as("value"))
      .orderBy(col("name").asc_nulls_first, col("t").asc_nulls_first,
        col("value").asc_nulls_first)

  /** Oracle tail shared by every ts query. */
  private def tail(expr: String = "SELECT name, t, value FROM out"): String =
    s""" SELECT name, CAST(t AS BIGINT) AS t, ${ts.Round6.r6Sql("CAST(value AS DOUBLE)")} AS value FROM ($expr)
       | ORDER BY name NULLS FIRST, t NULLS FIRST, value NULLS FIRST""".stripMargin

  private def sparseQ(body: String): String =
    M.sparseSql() + s", out AS ($body)" + tail()
  private def denseQ(body: String): String =
    M.denseSql() + s", out AS ($body)" + tail()
  private def multiQ(body: String): String =
    M.multiSql() + s", out AS ($body)" + tail()

  private val summSql =
    """summ AS (
      |  SELECT name, avg(value) AS savg, max(value) AS smax, min(value) AS smin,
      |         stddev_samp(value) AS sstd, arg_max(value, t) AS slast
      |  FROM series GROUP BY name
      |)""".stripMargin

  private def keepTopSql(metric: String, n: Int, asc: Boolean): String = {
    val dir = if (asc) "ASC" else "DESC"
    s"""$summSql, kept AS (
       |  SELECT name FROM (
       |    SELECT name, row_number() OVER (ORDER BY $metric $dir, name) AS r FROM summ)
       |  WHERE r <= $n
       |), out AS (SELECT s.name, s.t, s.value FROM series s JOIN kept USING (name))""".stripMargin
  }
  private def keepWhereSql(pred: String): String =
    s"""$summSql, out AS (
       |  SELECT s.name, s.t, s.value FROM series s
       |  JOIN (SELECT name FROM summ WHERE $pred) k USING (name))""".stripMargin

  private val trail5 = "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW"
  private val byNameT = "PARTITION BY name ORDER BY t"

  /** (name, spark query, oracle SQL or None). */
  val entries: Seq[(String, Q, Option[String])] = Seq(

    // ===== base grids =====
    ("ts_series_sparse",
      ((s: SparkSession, d: String) => fin(M.sparse(s, d))): Q,
      Some(sparseQ("SELECT name, t, value FROM series"))),

    ("ts_series_dense",
      ((s, d) => fin(M.dense(s, d))): Q,
      Some(denseQ("SELECT name, t, value FROM series"))),

    // ===== per-point scalar transforms =====
    ("ts_scale",
      ((s, d) => fin(O.scale(M.sparse(s, d), 2.5))): Q,
      Some(sparseQ("SELECT name, t, value * 2.5 AS value FROM series"))),

    ("ts_absolute",
      ((s, d) => fin(O.absolute(O.offset(M.sparse(s, d), -100.0)))): Q,
      Some(sparseQ("SELECT name, t, abs(value + -100.0) AS value FROM series"))),

    ("ts_offset",
      ((s, d) => fin(O.offset(M.sparse(s, d), 10.0))): Q,
      Some(sparseQ("SELECT name, t, value + 10.0 AS value FROM series"))),

    ("ts_offset_to_zero",
      ((s, d) => fin(O.offsetToZero(M.sparse(s, d)))): Q,
      Some(sparseQ(
        s"SELECT name, t, value - min(value) OVER (PARTITION BY name) AS value FROM series"))),

    ("ts_logarithm",
      ((s, d) => fin(O.logarithm(M.sparse(s, d), 10.0))): Q,
      Some(sparseQ("SELECT name, t, ln(value) / ln(10.0) AS value FROM series"))),

    ("ts_transform_null",
      ((s, d) => fin(O.transformNull(M.dense(s, d), -1.0))): Q,
      Some(denseQ("SELECT name, t, coalesce(value, -1.0) AS value FROM series"))),

    ("ts_scale_to_seconds",
      ((s, d) => fin(O.scaleToSeconds(M.sparse(s, d), 60.0))): Q,
      Some(sparseQ("SELECT name, t, value * 60.0 AS value FROM series"))),

    ("ts_hitcount",
      ((s, d) => fin(O.hitcount(M.sparse(s, d), 3600))): Q,
      Some(sparseQ("SELECT name, t, value * 3600.0 AS value FROM series"))),

    ("ts_time_shift",
      ((s, d) => fin(O.timeShift(M.sparse(s, d), -86400))): Q,
      Some(sparseQ("SELECT name, t - 86400 AS t, value FROM series"))),

    ("ts_remove_above_value",
      ((s, d) => fin(O.removeAboveValue(M.sparse(s, d), 150.0))): Q,
      Some(sparseQ(
        "SELECT name, t, CASE WHEN value > 150.0 THEN NULL ELSE value END AS value FROM series"))),

    ("ts_remove_below_value",
      ((s, d) => fin(O.removeBelowValue(M.sparse(s, d), 50.0))): Q,
      Some(sparseQ(
        "SELECT name, t, CASE WHEN value < 50.0 THEN NULL ELSE value END AS value FROM series"))),

    ("ts_remove_above_percentile",
      ((s, d) => fin(O.removeAbovePercentile(M.sparse(s, d), 0.9))): Q,
      Some(sparseQ(
        s"""SELECT s.name, s.t, CASE WHEN s.value > q.q THEN NULL ELSE s.value END AS value
           | FROM series s JOIN (
           |   SELECT name, ${O.refQuantileSql("list(value ORDER BY value)", 0.9)} AS q
           |   FROM series GROUP BY name) q USING (name)""".stripMargin))),

    ("ts_remove_below_percentile",
      ((s, d) => fin(O.removeBelowPercentile(M.sparse(s, d), 0.1))): Q,
      Some(sparseQ(
        s"""SELECT s.name, s.t, CASE WHEN s.value < q.q THEN NULL ELSE s.value END AS value
           | FROM series s JOIN (
           |   SELECT name, ${O.refQuantileSql("list(value ORDER BY value)", 0.1)} AS q
           |   FROM series GROUP BY name) q USING (name)""".stripMargin))),

    ("ts_n_percentile",
      ((s, d) => fin(O.nPercentile(M.sparse(s, d), 0.5))): Q,
      Some(sparseQ(
        s"""SELECT s.name, s.t, q.q AS value FROM series s JOIN (
           |   SELECT name, ${O.refQuantileSql("list(value ORDER BY value)", 0.5)} AS q
           |   FROM series GROUP BY name) q USING (name)""".stripMargin))),

    ("ts_keep_last_value",
      ((s, d) => fin(O.keepLastValue(M.dense(s, d), 3))): Q,
      Some(denseQ(
        s"""SELECT name, t,
           |   CASE WHEN value IS NULL AND rn - lastrn <= 3 THEN lastv ELSE value END AS value
           | FROM (
           |   SELECT name, t, value, rn,
           |     max(CASE WHEN value IS NOT NULL THEN rn END)
           |       OVER (PARTITION BY name ORDER BY rn) AS lastrn,
           |     last_value(value IGNORE NULLS)
           |       OVER (PARTITION BY name ORDER BY rn
           |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lastv
           |   FROM (SELECT name, t, value,
           |           row_number() OVER ($byNameT) AS rn FROM series))""".stripMargin))),

    ("ts_changed",
      ((s, d) => fin(O.changed(M.dense(s, d)))): Q,
      Some(denseQ(
        s"""SELECT name, t,
           |  CASE WHEN prev IS NULL OR value IS NULL THEN 1.0
           |       WHEN value <> prev THEN 1.0 ELSE 0.0 END AS value
           | FROM (SELECT name, t, value, lag(value) OVER ($byNameT) AS prev FROM series)""".stripMargin))),

    ("ts_derivative",
      ((s, d) => fin(O.derivative(M.sparse(s, d)))): Q,
      Some(sparseQ(
        s"SELECT name, t, value - lag(value) OVER ($byNameT) AS value FROM series"))),

    ("ts_non_negative_derivative",
      ((s, d) => fin(O.nonNegativeDerivative(M.sparse(s, d), None))): Q,
      Some(sparseQ(
        s"""SELECT name, t,
           |  CASE WHEN value - prev > 0 THEN value - prev ELSE NULL END AS value
           | FROM (SELECT name, t, value, lag(value) OVER ($byNameT) AS prev FROM series)""".stripMargin))),

    ("ts_non_negative_derivative_wrap",
      ((s, d) => fin(O.nonNegativeDerivative(M.sparse(s, d), Some(400.0)))): Q,
      Some(sparseQ(
        s"""SELECT name, t,
           |  CASE WHEN value - prev > 0 THEN value - prev
           |       WHEN 400.0 > value THEN (400.0 - prev) + value + 1.0
           |       ELSE NULL END AS value
           | FROM (SELECT name, t, value, lag(value) OVER ($byNameT) AS prev FROM series)""".stripMargin))),

    ("ts_integral",
      ((s, d) => fin(O.integral(M.sparse(s, d)))): Q,
      Some(sparseQ(
        s"""SELECT name, t, coalesce(
           |   sum(value) OVER ($byNameT ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |   0.0) AS value FROM series""".stripMargin))),

    ("ts_summarize_sum",
      ((s, d) => fin(O.summarize(M.sparse(s, d), 86400, "sum"))): Q,
      Some(sparseQ(
        "SELECT name, (t // 86400) * 86400 AS t, sum(value) AS value FROM series GROUP BY 1, 2"))),

    ("ts_summarize_avg",
      ((s, d) => fin(O.summarize(M.sparse(s, d), 86400, "avg"))): Q,
      Some(sparseQ(
        "SELECT name, (t // 86400) * 86400 AS t, avg(value) AS value FROM series GROUP BY 1, 2"))),

    ("ts_consolidate_by_max",
      ((s, d) => fin(O.consolidateBy(M.sparse(s, d), 86400, "max"))): Q,
      Some(sparseQ(
        "SELECT name, (t // 86400) * 86400 AS t, max(value) AS value FROM series GROUP BY 1, 2"))),

    ("ts_consolidate_by_last",
      ((s, d) => fin(O.consolidateBy(M.sparse(s, d), 86400, "last"))): Q,
      Some(sparseQ(
        "SELECT name, (t // 86400) * 86400 AS t, arg_max(value, t) AS value FROM series GROUP BY 1, 2"))),

    // LTTB visual downsampling: where summarize/consolidateBy AVERAGE
    // a bucket (flattening spikes), LTTB keeps the real point per
    // bucket that preserves the most triangle area with its kept
    // neighbours — exact-integer areas so both engines replay the
    // same argmax and tie-breaks
    ("ts_lttb",
      ((s, d) => fin(ts.Lttb.lttb(M.sparse(s, d), 50))): Q,
      Some((M.sparseSql() + s",\n${ts.Lttb.lttbSql(50)}" + tail())
        .replaceFirst("^WITH ", "WITH RECURSIVE "))),

    // least-squares trend line (graphite-web extension): exact-integer
    // sufficient statistics, one fixed double expression both engines
    // evaluate identically
    ("ts_linreg",
      ((s, d) => fin(O.linearRegression(M.sparse(s, d)))): Q,
      Some(M.sparseSql() + s",\n${O.linearRegressionSql()}" + tail())),

    // exponential moving average (graphite-web extension): sequential
    // per-series recurrence, double ops in the oracle's exact order
    ("ts_ema",
      ((s, d) => fin(O.exponentialMovingAverage(M.sparse(s, d), 10))): Q,
      Some((M.sparseSql() + s",\n${O.exponentialMovingAverageSql(10)}" +
        tail()).replaceFirst("^WITH ", "WITH RECURSIVE "))),

    // ===== moving-window =====
    ("ts_moving_average",
      ((s, d) => fin(O.movingAverage(M.dense(s, d), 5))): Q,
      Some(denseQ(
        s"""SELECT name, t, CASE WHEN cnt < 5 THEN NULL ELSE sm / cnt END AS value
           | FROM (SELECT name, t, value,
           |         row_number() OVER ($byNameT) AS rn,
           |         count(value) OVER ($byNameT $trail5) AS cnt,
           |         sum(value) OVER ($byNameT $trail5) AS sm
           |       FROM series)
           | WHERE rn >= 5""".stripMargin))),

    ("ts_moving_median",
      ((s, d) => fin(O.movingMedian(M.sparse(s, d), 5))): Q,
      Some(sparseQ(
        s"""SELECT name, t, ${O.refQuantileSql("ls", 0.5)} AS value
           | FROM (SELECT name, t,
           |         list_sort(list(value) OVER ($byNameT $trail5)) AS ls,
           |         row_number() OVER ($byNameT) AS rn
           |       FROM series)
           | WHERE rn >= 5""".stripMargin))),

    ("ts_stdev",
      ((s, d) => fin(O.stdev(M.sparse(s, d), 5))): Q,
      Some(sparseQ(
        s"""SELECT name, t, sd AS value
           | FROM (SELECT name, t,
           |         stddev_samp(value) OVER ($byNameT $trail5) AS sd,
           |         row_number() OVER ($byNameT) AS rn
           |       FROM series)
           | WHERE rn >= 5""".stripMargin))),

    // ===== cross-series combines (on the dense aligned grid) =====
    ("ts_sum_series",
      ((s, d) => fin(O.sumSeries(M.dense(s, d)))): Q,
      Some(denseQ(
        "SELECT 'sumSeries' AS name, t, sum(coalesce(value, 0.0)) AS value FROM series GROUP BY t"))),

    ("ts_average_series",
      ((s, d) => fin(O.averageSeries(M.dense(s, d)))): Q,
      Some(denseQ(
        "SELECT 'averageSeries' AS name, t, sum(coalesce(value, 0.0)) / count(*) AS value FROM series GROUP BY t"))),

    ("ts_max_series",
      ((s, d) => fin(O.maxSeries(M.dense(s, d)))): Q,
      Some(denseQ("SELECT 'maxSeries' AS name, t, max(value) AS value FROM series GROUP BY t"))),

    ("ts_min_series",
      ((s, d) => fin(O.minSeries(M.dense(s, d)))): Q,
      Some(denseQ("SELECT 'minSeries' AS name, t, min(value) AS value FROM series GROUP BY t"))),

    ("ts_multiply_series",
      // scaled to ~O(1) values so the product's float error stays far
      // below the 1e-6 rounding granularity
      ((s, d) => fin(O.multiplySeries(O.scale(M.dense(s, d), 0.01)))): Q,
      Some(denseQ(
        """SELECT 'multiplySeries' AS name, t,
          |  CASE WHEN count(value * 0.01) < count(*) THEN NULL
          |       ELSE product(value * 0.01) END AS value
          | FROM series GROUP BY t""".stripMargin))),

    ("ts_range_of_series",
      ((s, d) => fin(O.rangeOfSeries(M.dense(s, d)))): Q,
      Some(denseQ(
        "SELECT 'rangeOfSeries' AS name, t, max(value) - min(value) AS value FROM series GROUP BY t"))),

    ("ts_is_non_null",
      ((s, d) => fin(O.isNonNull(M.dense(s, d)))): Q,
      Some(denseQ(
        "SELECT 'isNonNull' AS name, t, CAST(count(value) AS DOUBLE) AS value FROM series GROUP BY t"))),

    ("ts_count_series",
      ((s, d) => fin(O.countSeries(M.dense(s, d)))): Q,
      Some(denseQ(
        "SELECT 'countSeries' AS name, t, CAST(count(DISTINCT name) AS DOUBLE) AS value FROM series GROUP BY t"))),

    ("ts_percentile_of_series",
      ((s, d) => fin(O.percentileOfSeries(M.dense(s, d), 0.9))): Q,
      Some(denseQ(
        s"""SELECT 'percentileOfSeries' AS name, t,
           |  ${O.refQuantileSql("list(value ORDER BY value) FILTER (WHERE value IS NOT NULL)", 0.9)} AS value
           | FROM series GROUP BY t""".stripMargin))),

    ("ts_diff_series",
      ((s, d) => fin(O.diffSeries(
        M.dense(s, d).filter(col("name").isin("click", "error"))))): Q,
      Some(denseQ(
        """SELECT 'diffSeries' AS name, t,
          |  CASE WHEN count(value) < count(*) THEN NULL
          |       ELSE 2.0 * arg_min(value, name) - sum(value) END AS value
          | FROM series WHERE name IN ('click', 'error') GROUP BY t""".stripMargin))),

    ("ts_divide_series",
      ((s, d) => {
        val dd = M.dense(s, d)
        fin(O.divideSeries(dd.filter(col("name") === "click"),
          dd.filter(col("name") === "error")))
      }): Q,
      Some(denseQ(
        """SELECT 'divideSeries' AS name, n.t,
          |  CASE WHEN e.value = 0 THEN NULL ELSE n.value / e.value END AS value
          | FROM (SELECT t, value FROM series WHERE name = 'click') n
          | JOIN (SELECT t, value FROM series WHERE name = 'error') e USING (t)""".stripMargin))),

    // asPercent: share of the per-timestamp set total (NaN-as-0 sum)
    ("ts_as_percent",
      ((s, d) => fin(O.asPercent(M.dense(s, d)))): Q,
      Some(denseQ(
        """SELECT name, t,
          |  CASE WHEN tot = 0.0 THEN NULL ELSE value / tot * 100.0 END AS value
          | FROM (SELECT name, t, value,
          |         sum(coalesce(value, 0.0)) OVER (PARTITION BY t) AS tot
          |       FROM series)""".stripMargin))),

    // asPercent of a fixed scalar total
    ("ts_as_percent_total",
      ((s, d) => fin(O.asPercent(M.sparse(s, d), Some(500.0)))): Q,
      Some(sparseQ("SELECT name, t, value / 500.0 * 100.0 AS value FROM series"))),

    ("ts_group",
      ((s, d) => {
        val sp = M.sparse(s, d)
        fin(O.group(sp.filter(col("name") === "click"),
          sp.filter(col("name") === "purchase")))
      }): Q,
      Some(sparseQ(
        "SELECT name, t, value FROM series WHERE name IN ('click', 'purchase')"))),

    // ===== name-node family (multi set: events.<type>.u<bucket>) =====
    ("ts_sum_wildcards",
      ((s, d) => fin(O.seriesWithWildcards(M.multi(s, d), Seq(2), "sum"))): Q,
      Some(multiQ(
        """SELECT split_part(name, '.', 1) || '.' || split_part(name, '.', 2) || '.*' AS name,
          |  t, sum(coalesce(value, 0.0)) AS value FROM series GROUP BY 1, 2""".stripMargin))),

    ("ts_avg_wildcards",
      ((s, d) => fin(O.seriesWithWildcards(M.multi(s, d), Seq(2), "avg"))): Q,
      Some(multiQ(
        """SELECT split_part(name, '.', 1) || '.' || split_part(name, '.', 2) || '.*' AS name,
          |  t, sum(coalesce(value, 0.0)) / count(*) AS value FROM series GROUP BY 1, 2""".stripMargin))),

    ("ts_group_by_node",
      ((s, d) => fin(O.groupByNode(M.multi(s, d), 1, "sum"))): Q,
      Some(multiQ(
        """SELECT split_part(name, '.', 2) AS name, t,
          |  sum(coalesce(value, 0.0)) AS value FROM series GROUP BY 1, 2""".stripMargin))),

    ("ts_weighted_average",
      ((s, d) => {
        val ev = Tables.events(s, d)
        val slot = (floor(unix_timestamp(col("ts")).divide(lit(3600))).cast("long") * 3600).as("t")
        val a = ev.groupBy(concat(lit("a."), col("event_type")).as("name"), slot)
          .agg(ts.Round6.r6(avg(col("value"))).as("value"))
        val w = ev.groupBy(concat(lit("w."), col("event_type")).as("name"), slot)
          .agg(count(lit(1)).cast("double").as("value"))
        fin(O.weightedAverage(a, w, 1))
      }): Q,
      Some(
        s"""WITH a AS (
          |  SELECT event_type AS k, CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS t,
          |         ${ts.Round6.r6Sql("avg(value)")} AS a
          |  FROM events GROUP BY 1, 2
          |), w AS (
          |  SELECT event_type AS k, CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS t,
          |         CAST(count(*) AS DOUBLE) AS w
          |  FROM events GROUP BY 1, 2
          |), out AS (
          |  SELECT 'weightedAverage' AS name, t, sum(a * w) / sum(w) AS value
          |  FROM a JOIN w USING (k, t) GROUP BY t
          |)""".stripMargin + tail())),

    // ===== aliasing =====
    ("ts_alias",
      ((s, d) => fin(O.aliasAll(O.sumSeries(M.dense(s, d)), "total"))): Q,
      Some(denseQ(
        "SELECT 'total' AS name, t, sum(coalesce(value, 0.0)) AS value FROM series GROUP BY t"))),

    ("ts_alias_by_metric",
      ((s, d) => fin(O.aliasByMetric(M.multi(s, d)))): Q,
      Some(multiQ("SELECT split_part(name, '.', 3) AS name, t, value FROM series"))),

    ("ts_alias_by_node",
      ((s, d) => fin(O.aliasByNode(M.multi(s, d), Seq(1, 2)))): Q,
      Some(multiQ(
        "SELECT split_part(name, '.', 2) || '.' || split_part(name, '.', 3) AS name, t, value FROM series"))),

    ("ts_alias_sub",
      ((s, d) => fin(O.aliasSub(M.multi(s, d),
        "^events\\.([a-z]+)\\.(u[0-9]+)$", "$2.$1"))): Q,
      Some(multiQ(
        """SELECT regexp_replace(name, '^events\.([a-z]+)\.(u[0-9]+)$', '\2.\1') AS name,
          |  t, value FROM series""".stripMargin))),

    // ===== series-set filters / top-k =====
    ("ts_highest_current",
      ((s, d) => fin(O.highestCurrent(M.sparse(s, d), 2))): Q,
      Some(sparseQ2(keepTopSql("slast", 2, asc = false)))),
    ("ts_highest_max",
      ((s, d) => fin(O.highestMax(M.sparse(s, d), 2))): Q,
      Some(sparseQ2(keepTopSql("smax", 2, asc = false)))),
    ("ts_lowest_average",
      ((s, d) => fin(O.lowestAverage(M.sparse(s, d), 2))): Q,
      Some(sparseQ2(keepTopSql("savg", 2, asc = true)))),
    ("ts_lowest_current",
      ((s, d) => fin(O.lowestCurrent(M.sparse(s, d), 2))): Q,
      Some(sparseQ2(keepTopSql("slast", 2, asc = true)))),
    ("ts_most_deviant",
      ((s, d) => fin(O.mostDeviant(M.sparse(s, d), 2))): Q,
      Some(sparseQ2(keepTopSql("sstd", 2, asc = false)))),
    ("ts_maximum_above",
      ((s, d) => fin(O.maximumAbove(M.sparse(s, d), 200.0))): Q,
      Some(sparseQ2(keepWhereSql("smax > 200.0")))),
    ("ts_maximum_below",
      ((s, d) => fin(O.maximumBelow(M.sparse(s, d), 260.0))): Q,
      Some(sparseQ2(keepWhereSql("smax < 260.0")))),
    ("ts_minimum_above",
      ((s, d) => fin(O.minimumAbove(M.sparse(s, d), 2.0))): Q,
      Some(sparseQ2(keepWhereSql("smin > 2.0")))),
    ("ts_minimum_below",
      ((s, d) => fin(O.minimumBelow(M.sparse(s, d), 2.0))): Q,
      Some(sparseQ2(keepWhereSql("smin < 2.0")))),

    ("ts_use_series_above",
      ((s, d) => fin(O.useSeriesAbove(M.sparse(s, d), 200.0, "^(.*)$", "above.$1"))): Q,
      Some(sparseQ2(
        keepWhereSql("smax > 200.0").replace(
          "SELECT s.name, s.t, s.value",
          """SELECT regexp_replace(s.name, '^(.*)$', 'above.\1') AS name, s.t, s.value""")))),

    ("ts_limit",
      ((s, d) => fin(O.limitSeries(M.sparse(s, d), 3))): Q,
      Some(sparseQ2(
        """kept AS (
          |  SELECT name FROM (
          |    SELECT name, row_number() OVER (ORDER BY name) AS r
          |    FROM (SELECT DISTINCT name FROM series))
          |  WHERE r <= 3
          |), out AS (SELECT s.name, s.t, s.value FROM series s JOIN kept USING (name))""".stripMargin))),

    ("ts_exclude",
      ((s, d) => fin(O.exclude(M.sparse(s, d), "^(click|view)$"))): Q,
      Some(sparseQ(
        "SELECT name, t, value FROM series WHERE NOT regexp_matches(name, '^(click|view)$')"))),

    // ===== alignment =====
    ("ts_align_lcm",
      ((s, d) => {
        val a = M.sparse(s, d, 3600).filter(col("name") === "click")
        val b = M.sparse(s, d, 7200).filter(col("name") === "error")
        val (aligned, _) = O.align(Seq((a, 3600L), (b, 7200L)))
        fin(aligned)
      }): Q,
      Some(
        s"""WITH s1 AS (
           |  SELECT event_type AS name, CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS t,
           |         ${ts.Round6.r6Sql("avg(value)")} AS value
           |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
           |), s2 AS (
           |  SELECT event_type AS name, CAST(floor(epoch(ts) / 7200) AS BIGINT) * 7200 AS t,
           |         ${ts.Round6.r6Sql("avg(value)")} AS value
           |  FROM events WHERE event_type = 'error' GROUP BY 1, 2
           |), out AS (
           |  SELECT name, (t // 7200) * 7200 AS t, avg(value) AS value FROM s1 GROUP BY 1, 2
           |  UNION ALL SELECT name, t, value FROM s2
           |)""".stripMargin + tail())),

    // ===== generators =====
    ("ts_constant_line",
      ((s, d) => {
        val ev = Tables.events(s, d)
        val bounds = ev.agg(
          (floor(unix_timestamp(min(col("ts"))).divide(lit(3600))).cast("long") * 3600).as("lo"),
          (floor(unix_timestamp(max(col("ts"))).divide(lit(3600))).cast("long") * 3600).as("hi"))
        fin(bounds.select(explode(array(col("lo"), col("hi"))).as("t"))
          .select(lit("constantLine(42.5)").as("name"), col("t"), lit(42.5).as("value")))
      }): Q,
      Some(
        """WITH bounds AS (
          |  SELECT CAST(floor(epoch(min(ts)) / 3600) AS BIGINT) * 3600 AS lo,
          |         CAST(floor(epoch(max(ts)) / 3600) AS BIGINT) * 3600 AS hi
          |  FROM events
          |), out AS (
          |  SELECT 'constantLine(42.5)' AS name, lo AS t, 42.5 AS value FROM bounds
          |  UNION ALL
          |  SELECT 'constantLine(42.5)' AS name, hi AS t, 42.5 AS value FROM bounds
          |)""".stripMargin + tail())),

    ("ts_sinusoid",
      ((s, d) => {
        val ev = Tables.events(s, d)
        val bounds = ev.agg(
          (floor(unix_timestamp(min(col("ts"))).divide(lit(3600))).cast("long") * 3600).as("lo"),
          (floor(unix_timestamp(max(col("ts"))).divide(lit(3600))).cast("long") * 3600).as("hi"))
        val grid = bounds.select(col("lo"),
          explode(sequence(col("lo"), col("hi"), lit(3600L))).as("t"))
        fin(grid.select(lit("sinusoid").as("name"), col("t"),
          sin(lit(2.0 * math.Pi) * ((col("t") - col("lo")) / lit(3600)).cast("double") / lit(10.0)).as("value")))
      }): Q,
      Some(
        """WITH bounds AS (
          |  SELECT CAST(floor(epoch(min(ts)) / 3600) AS BIGINT) * 3600 AS lo,
          |         CAST(floor(epoch(max(ts)) / 3600) AS BIGINT) * 3600 AS hi
          |  FROM events
          |), grid AS (
          |  SELECT unnest(generate_series(lo, hi, 3600)) AS t, lo FROM bounds
          |), out AS (
          |  SELECT 'sinusoid' AS name, t,
          |         sin(2.0 * pi() * (CAST((t - lo) / 3600 AS DOUBLE)) / 10.0) AS value
          |  FROM grid
          |)""".stripMargin + tail())),

    // reference semantics (`dsl/funcs.go:2366-2390`): copy i = the
    // window [to−(i+1)·p, to−i·p] shifted FORWARD i·p to overlay the
    // most recent period
    ("ts_time_stack",
      ((s, d) => {
        val base = M.sparse(s, d).filter(col("name") === "click")
        val to = 1706659200L
        val p = 86400L
        val shifted = (0 to 2).map { i =>
          base.filter(col("t") >= to - p * (i + 1) && col("t") <= to - p * i)
            .withColumn("t", col("t") + p * i)
            .withColumn("name", lit(s"timeShift(click, -1d, $i)"))
        }
        fin(shifted.reduce(_.unionByName(_)))
      }): Q,
      Some(sparseQ(
        (0 to 2).map { i =>
          val (lo, hi) = (1706659200L - 86400L * (i + 1), 1706659200L - 86400L * i)
          s"""SELECT 'timeShift(click, -1d, $i)' AS name, t + ${86400L * i} AS t, value
             | FROM series WHERE name = 'click' AND t >= $lo AND t <= $hi""".stripMargin
        }.mkString(" UNION ALL ")))),

    // series-similarity search: series ranked by correlation with
    // 'click' over common slots (explicit-sum Pearson both engines)
    ("ts_most_similar",
      ((s, d) => O.mostSimilar(M.sparse(s, d), "click", 3)
        .select(col("name"), ts.Round6.r6(col("corr")).as("corr"))
        .orderBy(col("corr").desc, col("name"))): Q,
      Some(M.sparseSql() +
        s""", tgt AS (SELECT t, value AS tv FROM series WHERE name = 'click'),
           |js AS (
           |  SELECT s.name, s.value AS x, tgt.tv AS y
           |  FROM series s JOIN tgt USING (t) WHERE s.name <> 'click'
           |), ag AS (
           |  SELECT name, CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
           |         sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
           |         sum(y * y) AS syy
           |  FROM js GROUP BY name
           |), co AS (
           |  SELECT name, (n * sxy - sx * sy)
           |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr
           |  FROM ag ORDER BY corr DESC, name LIMIT 3
           |)
           |SELECT name, ${ts.Round6.r6Sql("corr")} AS corr FROM co
           |ORDER BY ${ts.Round6.r6Sql("corr")} DESC, name""".stripMargin)),

    // as-of join (operator Spark lacks, §custom-operators): every
    // purchase event picks up the user's most recent prior view value.
    // Spark side is the one-shuffle union+window form (ts/Asof.scala);
    // the oracle is DuckDB's NATIVE `ASOF LEFT JOIN` — two independent
    // formulations of the same operator.
    ("ts_asof_join",
      ((s, d) => {
        val ev = Tables.events(s, d)
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val vw = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("vval"))
        graft.ts.Asof.join(pur, vw, Seq("user_id"), "ts", Seq("vval"))
          .select(col("event_id").cast("long").as("event_id"),
            col("user_id").cast("long").as("user_id"),
            unix_micros(col("ts")).as("t_us"),
            ts.Round6.r6(col("value")).as("value"),
            ts.Round6.r6(col("asof_vval")).as("asof_vval"),
            unix_micros(col("asof_ts")).as("asof_t_us"))
          .orderBy("event_id")
      }): Q,
      Some(
        s"""WITH pur AS (
           |  SELECT event_id, user_id, ts, value FROM events
           |  WHERE event_type = 'purchase'
           |), vw AS (
           |  SELECT user_id, ts, max(value) AS vval FROM events
           |  WHERE event_type = 'view' GROUP BY 1, 2
           |)
           |SELECT CAST(p.event_id AS BIGINT) AS event_id,
           |  CAST(p.user_id AS BIGINT) AS user_id,
           |  epoch_us(p.ts) AS t_us,
           |  ${ts.Round6.r6Sql("p.value")} AS value,
           |  ${ts.Round6.r6Sql("v.vval")} AS asof_vval,
           |  epoch_us(v.ts) AS asof_t_us
           |FROM pur p ASOF LEFT JOIN vw v
           |  ON p.user_id = v.user_id AND p.ts >= v.ts
           |ORDER BY event_id""".stripMargin))
  )

  /** sparse prefix + caller-supplied CTE chain that must define `out`. */
  private def sparseQ2(ctes: String): String =
    M.sparseSql() + ", " + ctes + tail()

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
