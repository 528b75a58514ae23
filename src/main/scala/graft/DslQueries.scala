package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dsl.{Dsl, Eval, Viewport}
import graft.ts.{SeriesModel => M, SeriesOps => O, Round6}

/** Driver-checked queries exercising the FULL query path of the
  * reference: expression string → parser → evaluator → DataFrame plan
  * (`/render?target=...`, SURVEY §3.1). The oracle SQL re-states each
  * expression's semantics directly, so a pass means parser + evaluator +
  * operator all agree with an independent engine.
  *
  * Store: the multi-node name set `events.<type>.u<bucket>` at step 3600
  * ([[M.multi]]); glob regexes appear verbatim in both the Spark plan
  * (via `Dsl.globToRegex`) and the oracle SQL.
  */
object DslQueries {

  type Q = (SparkSession, String) => DataFrame

  private def fin(df: DataFrame): DataFrame =
    df.select(col("name"), col("t").cast("long").as("t"),
        Round6.r6(col("value").cast("double")).as("value"))
      .orderBy(col("name").asc_nulls_first, col("t").asc_nulls_first,
        col("value").asc_nulls_first)

  private def tail(): String =
    s""" SELECT name, CAST(t AS BIGINT) AS t, ${Round6.r6Sql("CAST(value AS DOUBLE)")} AS value FROM out
       | ORDER BY name NULLS FIRST, t NULLS FIRST, value NULLS FIRST""".stripMargin

  private def multiQ(body: String): String =
    M.multiSql() + s", out AS ($body)" + tail()

  /** Evaluate `expr` against the multi store. */
  private def dq(expr: String): Q = (s, d) => {
    val ctx = Eval.Ctx(s, M.multi(s, d), M.StepSeconds, 0L, 0L)
    fin(Eval.evalExpr(ctx, expr))
  }

  private val byNameT = "PARTITION BY name ORDER BY t"

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // plain glob fetch via group(): `*` must not cross dots
    ("dsl_fetch_glob",
      dq("group(events.*.u1)"),
      Some(multiQ(
        """SELECT name, t, value FROM series
          | WHERE regexp_matches(name, '^events\.[^.]*\.u1$')""".stripMargin))),

    // brace alternation + chained scalar transform (receiver-prepend)
    ("dsl_brace_chain",
      dq("events.{click,view}.u0.scale(2.5)"),
      Some(multiQ(
        """SELECT name, t, value * 2.5 AS value FROM series
          | WHERE regexp_matches(name, '^events\.(click|view)\.u0$')""".stripMargin))),

    // nested call: cross-series sum over one type's buckets
    ("dsl_sum_nested",
      dq("sumSeries(events.click.*)"),
      Some(multiQ(
        """SELECT 'sumSeries' AS name, t, sum(coalesce(value, 0.0)) AS value
          | FROM series WHERE regexp_matches(name, '^events\.click\.[^.]*$')
          | GROUP BY t""".stripMargin))),

    // chain on a call result + string arg
    ("dsl_alias_chain",
      dq("sumSeries(events.purchase.*).alias('revenue')"),
      Some(multiQ(
        """SELECT 'revenue' AS name, t, sum(coalesce(value, 0.0)) AS value
          | FROM series WHERE regexp_matches(name, '^events\.purchase\.[^.]*$')
          | GROUP BY t""".stripMargin))),

    // kwarg coercion: nonNegativeDerivative(..., maxValue=400)
    ("dsl_kwarg_nnd",
      dq("nonNegativeDerivative(events.error.u2, maxValue=400)"),
      Some(multiQ(
        s"""SELECT name, t,
           |  CASE WHEN value - prev > 0 THEN value - prev
           |       WHEN 400.0 > value THEN (400.0 - prev) + value + 1.0
           |       ELSE NULL END AS value
           | FROM (SELECT name, t, value, lag(value) OVER ($byNameT) AS prev
           |       FROM series WHERE name = 'events.error.u2')""".stripMargin))),

    // deep nesting: moving window over a cross-series combine
    ("dsl_deep_nest",
      dq("movingAverage(sumSeries(events.*.u0), 5)"),
      Some(multiQ(
        s"""SELECT name, t, CASE WHEN cnt < 5 THEN NULL ELSE sm / cnt END AS value
           | FROM (SELECT name, t, value,
           |         row_number() OVER ($byNameT) AS rn,
           |         count(value) OVER ($byNameT ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS cnt,
           |         sum(value) OVER ($byNameT ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sm
           |       FROM (SELECT 'sumSeries' AS name, t, sum(coalesce(value, 0.0)) AS value
           |             FROM series WHERE regexp_matches(name, '^events\\.[^.]*\\.u0$$')
           |             GROUP BY t))
           | WHERE rn >= 5""".stripMargin))),

    // var-arg series merge + top-k set filter
    ("dsl_topk",
      dq("highestMax(group(events.click.*, events.error.*), 2)"),
      Some(multiQ(
        """SELECT s.name, s.t, s.value
          | FROM (SELECT * FROM series
          |        WHERE regexp_matches(name, '^events\.(click|error)\.[^.]*$')) s
          | JOIN (SELECT name FROM (
          |         SELECT name, row_number() OVER (ORDER BY smax DESC, name) AS r
          |         FROM (SELECT name, max(value) AS smax
          |               FROM series
          |               WHERE regexp_matches(name, '^events\.(click|error)\.[^.]*$')
          |               GROUP BY name))
          |       WHERE r <= 2) k USING (name)""".stripMargin))),

    // percentile arg is 0-100 at the DSL layer (dsl/funcs.go:1439)
    ("dsl_percentile",
      dq("nPercentile(events.view.u1, 90)"),
      Some(multiQ(
        s"""SELECT s.name, s.t, q.q AS value
           | FROM series s JOIN (
           |   SELECT name, ${O.refQuantileSql("list(value ORDER BY value)", 0.9)} AS q
           |   FROM series WHERE name = 'events.view.u1' GROUP BY name) q USING (name)
           | WHERE s.name = 'events.view.u1'""".stripMargin))),

    // duration-string arg + re-bucketing through the parser
    ("dsl_summarize_1d",
      dq("summarize(events.signup.*, '1d', 'sum')"),
      Some(multiQ(
        """SELECT name, (t // 86400) * 86400 AS t, sum(value) AS value
          | FROM series WHERE regexp_matches(name, '^events\.signup\.[^.]*$')
          | GROUP BY 1, 2""".stripMargin))),

    // LTTB through the render DSL (extension function): spike-
    // preserving visual downsampling callable from a /render target
    ("dsl_lttb",
      dq("lttb(events.view.*, 40)"),
      Some((M.multiSql() +
        """, serflt AS (
          |  SELECT name, t, value FROM series
          |  WHERE regexp_matches(name, '^events\.view\.[^.]*$')
          |)""".stripMargin +
        s",\n${graft.ts.Lttb.lttbSql(40, "serflt")}" + tail())
        .replaceFirst("^WITH ", "WITH RECURSIVE "))),

    // trend line through the render DSL (extension function)
    ("dsl_linreg",
      dq("linearRegression(events.view.u1)"),
      Some(M.multiSql() +
        """, serflt AS (
          |  SELECT name, t, value FROM series WHERE name = 'events.view.u1'
          |)""".stripMargin +
        s",\n${O.linearRegressionSql("serflt")}" + tail())),

    // viewport range pushdown: ctx from/until bounds every fetch
    ("dsl_range_fetch",
      ((s, d) => {
        val ctx = Eval.Ctx(s, M.multi(s, d), M.StepSeconds,
          fromSec = 1704499200L, toSec = 1704585600L) // 1 day mid-range
        fin(Eval.evalExpr(ctx, "group(events.*.u2)"))
      }): Q,
      Some(multiQ(
        """SELECT name, t, value FROM series
          | WHERE regexp_matches(name, '^events\.[^.]*\.u2$')
          |   AND t >= 1704499200 AND t <= 1704585600""".stripMargin))),

    // consolidateBy through the DSL: the reference's seconds-per-point
    // scaling for cf=sum (dsl/funcs.go:2255-2286 — "this is fake"),
    // factor = (to-from)/maxPoints = 86400/240 = 360
    ("dsl_consolidate_by",
      ((s, d) => {
        val ctx = Eval.Ctx(s, M.multi(s, d), M.StepSeconds,
          fromSec = 1704499200L, toSec = 1704585600L, maxPoints = 240)
        fin(Eval.evalExpr(ctx, "consolidateBy(sumSeries(events.*.u1), 'sum')"))
      }): Q,
      Some(multiQ(
        """SELECT 'sumSeries' AS name, t,
          |        sum(coalesce(value, 0.0)) * 360.0 AS value
          | FROM series WHERE regexp_matches(name, '^events\.[^.]*\.u1$')
          |   AND t >= 1704499200 AND t <= 1704585600
          | GROUP BY t""".stripMargin))),

    // cumulative ≡ consolidateBy(..., 'sum') — the graphite-web alias
    // (extension); same mirrored reference scaling hack, same twin
    ("dsl_cumulative",
      ((s, d) => {
        val ctx = Eval.Ctx(s, M.multi(s, d), M.StepSeconds,
          fromSec = 1704499200L, toSec = 1704585600L, maxPoints = 240)
        fin(Eval.evalExpr(ctx, "cumulative(sumSeries(events.*.u1))"))
      }): Q,
      Some(multiQ(
        """SELECT 'sumSeries' AS name, t,
          |        sum(coalesce(value, 0.0)) * 360.0 AS value
          | FROM series WHERE regexp_matches(name, '^events\.[^.]*\.u1$')
          |   AND t >= 1704499200 AND t <= 1704585600
          | GROUP BY t""".stripMargin))),

    // relative-time viewport: from="-1d"&until="now" through the
    // parseTime grammar (http/graphite.go:197-221), clock anchored at
    // 2024-01-07T00:00Z → same window as dsl_range_fetch
    ("dsl_relative_range",
      ((s, d) => {
        val ctx = Viewport.ctx(s, M.multi(s, d), M.StepSeconds,
          from = "-1d", until = "now", nowSec = 1704585600L)
        fin(Eval.evalExpr(ctx, "group(events.*.u2)"))
      }): Q,
      Some(multiQ(
        """SELECT name, t, value FROM series
          | WHERE regexp_matches(name, '^events\.[^.]*\.u2$')
          |   AND t >= 1704499200 AND t <= 1704585600""".stripMargin))),

    // mixed viewport forms: absolute epoch string + long-form relative
    // until ("-6days", BetterParseDuration synonyms), now=2024-01-13T00:00Z
    ("dsl_viewport_mixed",
      ((s, d) => {
        val ctx = Viewport.ctx(s, M.multi(s, d), M.StepSeconds,
          from = "1704499200", until = "-6days", nowSec = 1705104000L)
        fin(Eval.evalExpr(ctx, "group(events.*.u2)"))
      }): Q,
      Some(multiQ(
        """SELECT name, t, value FROM series
          | WHERE regexp_matches(name, '^events\.[^.]*\.u2$')
          |   AND t >= 1704499200 AND t <= 1704585600""".stripMargin))),

    // maxDataPoints re-bucketing as the final render stage
    ("dsl_render_maxpoints",
      ((s, d) => {
        val ctx = Eval.Ctx(s, M.multi(s, d), M.StepSeconds,
          fromSec = 1704067200L, toSec = 1706659200L, maxPoints = 100)
        fin(Eval.render(ctx, "sumSeries(events.click.*)"))
      }): Q,
      Some(multiQ(
        // span 2592000 / 100 pts = 25920 → bucket ceil to 28800 (8 h)
        """SELECT name, (t // 28800) * 28800 AS t, avg(value) AS value
          | FROM (SELECT 'sumSeries' AS name, t, sum(coalesce(value, 0.0)) AS value
          |       FROM series
          |       WHERE regexp_matches(name, '^events\.click\.[^.]*$')
          |         AND t >= 1704067200 AND t <= 1706659200
          |       GROUP BY t)
          | GROUP BY 1, 2""".stripMargin))),

    // overlapping var-arg patterns count each series ONCE — the
    // reference's processArgs merges into a name-keyed SeriesMap
    // (`combined[n] = s`, dsl/funcs.go:470-487), so the u0 series
    // matched by both patterns contributes a single term to the sum
    ("dsl_overlap_sum",
      dq("sumSeries(events.click.*, events.click.u0)"),
      Some(multiQ(
        """SELECT 'sumSeries' AS name, t, sum(coalesce(value, 0.0)) AS value
          | FROM series WHERE regexp_matches(name, '^events\.click\.[^.]*$')
          | GROUP BY t""".stripMargin))),

    // same once-per-name rule through countSeries + group over
    // overlapping globs: distinct names, not pattern matches
    ("dsl_overlap_count",
      dq("countSeries(events.*.u1, events.view.*)"),
      Some(multiQ(
        """SELECT 'countSeries' AS name, t,
          |        CAST(count(DISTINCT name) AS DOUBLE) AS value
          | FROM series
          | WHERE regexp_matches(name, '^events\.[^.]*\.u1$')
          |    OR regexp_matches(name, '^events\.view\.[^.]*$')
          | GROUP BY t""".stripMargin))),

    // name rewriting: aliasByNode picks dotted segments
    ("dsl_alias_by_node",
      dq("aliasByNode(events.*.*, 1, 2)"),
      Some(multiQ(
        """SELECT split_part(name, '.', 2) || '.' || split_part(name, '.', 3) AS name,
          |  t, value FROM series""".stripMargin))),

    // graphite 1.1 seriesByTag over a CANONICAL tagged store (exact +
    // anchored-regex predicates conjoin); the oracle re-parses the tag
    // values out of the stored names
    ("dsl_series_by_tag",
      ((s, d) => {
        val ctx = Eval.Ctx(s, taggedStore(s, d), M.StepSeconds, 0L, 0L)
        fin(Eval.evalExpr(ctx, "seriesByTag('dc=u1', 'type=~cl.*')"))
      }): Q,
      Some(taggedStoreSql +
        s""", out AS (
           |  SELECT name, t, value FROM series2
           |  WHERE regexp_extract(name, ';dc=([^;]*)', 1) = 'u1'
           |    AND regexp_matches(regexp_extract(name, ';type=([^;]*)', 1), '^cl')
           |)""".stripMargin + tail())),

    // negated seriesByTag: `!=~` must ALSO match series carrying no
    // such tag at all (the untagged plain.req row proves it)
    ("dsl_series_by_tag_neg",
      ((s, d) => {
        val ctx = Eval.Ctx(s, taggedStore(s, d), M.StepSeconds, 0L, 0L)
        fin(Eval.evalExpr(ctx, "seriesByTag('type!=~(click|view)')"))
      }): Q,
      Some(taggedStoreSql +
        s""", out AS (
           |  SELECT name, t, value FROM series2
           |  WHERE NOT regexp_matches(
           |    regexp_extract(name, ';type=([^;]*)', 1), '^(click|view)')
           |)""".stripMargin + tail())),

    // aliasByTags: rename to '.'-joined tag VALUES; the untagged
    // plain.req collapses to a lone empty-segment name ('.'-joined
    // empties), proving missing-tag arity is preserved
    ("dsl_alias_by_tags",
      ((s, d) => {
        val ctx = Eval.Ctx(s, taggedStore(s, d), M.StepSeconds, 0L, 0L)
        fin(Eval.evalExpr(ctx, "aliasByTags(seriesByTag('name=~ev'), 'dc', 'type')"))
      }): Q,
      Some(taggedStoreSql +
        s""", out AS (
           |  SELECT regexp_extract(name, ';dc=([^;]*)', 1) || '.' ||
           |         regexp_extract(name, ';type=([^;]*)', 1) AS name,
           |         t, value
           |  FROM series2 WHERE regexp_matches(name, '^ev')
           |)""".stripMargin + tail())),

    // groupByTags: sum across dc per (type, t); output names stay
    // canonical tagged paths (base = the aggregator)
    ("dsl_group_by_tags",
      ((s, d) => {
        val ctx = Eval.Ctx(s, taggedStore(s, d), M.StepSeconds, 0L, 0L)
        fin(Eval.evalExpr(ctx, "groupByTags(seriesByTag('name=~ev'), 'sum', 'type')"))
      }): Q,
      Some(taggedStoreSql +
        s""", out AS (
           |  SELECT 'sum;type=' || regexp_extract(name, ';type=([^;]*)', 1) AS name,
           |         t, sum(coalesce(value, 0)) AS value
           |  FROM series2 WHERE regexp_matches(name, '^ev')
           |  GROUP BY 1, 2
           |)""".stripMargin + tail()))
  ) ++ extensionEntries

  /** graphite-web extension functions 7-10 (round 12): perSecond,
    * averageAbove/Below, the sortBy* ordering family. */
  private def extensionEntries: Seq[(String, Q, Option[String])] = Seq(

    // perSecond with a counter max: rate = delta/dt, wrap-aware —
    // identical CASE order on both engines
    ("dsl_per_second",
      dq("perSecond(events.error.u2, maxValue=400)"),
      Some(multiQ(
        s"""SELECT name, t,
           |  CASE WHEN value > 400.0 THEN NULL
           |       WHEN prev <= 400.0 AND value - prev >= 0
           |         THEN (value - prev) / CAST(t - pt AS DOUBLE)
           |       WHEN prev <= 400.0
           |         THEN ((400.0 - prev) + value + 1.0) / CAST(t - pt AS DOUBLE)
           |       ELSE NULL
           |  END AS value
           | FROM (SELECT name, t, value, lag(value) OVER ($byNameT) AS prev,
           |              lag(t) OVER ($byNameT) AS pt
           |       FROM series WHERE name = 'events.error.u2')""".stripMargin))),

    // averageAbove/Below: the summary filter keyed on the viewport
    // average (threshold sits in a ≥0.04 gap between series averages —
    // far beyond cross-engine sum-order noise)
    ("dsl_average_above",
      dq("averageAbove(group(events.*.*), 50)"),
      Some(multiQ(
        """SELECT s.name, s.t, s.value FROM series s
          | JOIN (SELECT name FROM series GROUP BY name
          |       HAVING avg(value) > 50.0) k USING (name)""".stripMargin))),

    ("dsl_average_below",
      dq("averageBelow(group(events.*.*), 48)"),
      Some(multiQ(
        """SELECT s.name, s.t, s.value FROM series s
          | JOIN (SELECT name FROM series GROUP BY name
          |       HAVING avg(value) < 48.0) k USING (name)""".stripMargin))),

    // the sortBy* family: the attached __ord render-order channel IS
    // the observable — emitted as data so the gate can hash it (series
    // maxes/sums are well-separated; max is order-independent exact)
    ("dsl_sort_by_maxima",
      ((s, d) => {
        val ctx = Eval.Ctx(s, M.multi(s, d), M.StepSeconds, 0L, 0L)
        Eval.evalExpr(ctx, "sortByMaxima(events.click.*)")
          .select(col("name"), col("__ord").cast("long").as("ord"))
          .distinct().orderBy("ord")
      }): Q,
      Some(M.multiSql() +
        """ SELECT name, CAST(row_number() OVER (ORDER BY smax DESC, name) AS BIGINT) AS ord
          | FROM (SELECT name, max(value) AS smax FROM series
          |       WHERE regexp_matches(name, '^events\.click\.[^.]*$')
          |       GROUP BY name)
          | ORDER BY ord""".stripMargin)),

    ("dsl_sort_by_total",
      ((s, d) => {
        val ctx = Eval.Ctx(s, M.multi(s, d), M.StepSeconds, 0L, 0L)
        Eval.evalExpr(ctx, "sortByTotal(events.view.*)")
          .select(col("name"), col("__ord").cast("long").as("ord"))
          .distinct().orderBy("ord")
      }): Q,
      Some(M.multiSql() +
        """ SELECT name, CAST(row_number() OVER (ORDER BY ssum DESC, name) AS BIGINT) AS ord
          | FROM (SELECT name, sum(value) AS ssum FROM series
          |       WHERE regexp_matches(name, '^events\.view\.[^.]*$')
          |       GROUP BY name)
          | ORDER BY ord""".stripMargin)),

    ("dsl_sort_by_name",
      ((s, d) => {
        val ctx = Eval.Ctx(s, M.multi(s, d), M.StepSeconds, 0L, 0L)
        Eval.evalExpr(ctx, "sortByName(group(events.*.u2))")
          .select(col("name"), col("__ord").cast("long").as("ord"))
          .distinct().orderBy("ord")
      }): Q,
      Some(M.multiSql() +
        """ SELECT name, CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS ord
          | FROM (SELECT DISTINCT name FROM series
          |       WHERE regexp_matches(name, '^events\.[^.]*\.u2$'))
          | ORDER BY ord""".stripMargin)),

    // the generic combine (graphite-web 1.1 `aggregate`): median and
    // stddev exercise the two members with no xxxSeries twin —
    // reference-quantile and the square-then-fold stddev whose sums
    // both engines accumulate over the SAME value-sorted list
    ("dsl_aggregate_median",
      dq("aggregate(events.click.*, 'median')"),
      Some(multiQ(
        s"""SELECT 'aggregate' AS name, t,
           |  ${O.refQuantileSql("list(value ORDER BY value)", 0.5)} AS value
           | FROM series WHERE regexp_matches(name, '^events\\.click\\.[^.]*$$')
           | GROUP BY t""".stripMargin))),

    ("dsl_aggregate_stddev",
      dq("aggregate(events.click.*, 'stddev')"),
      Some(multiQ(
        """SELECT 'aggregate' AS name, t,
          |  CASE WHEN n = 0 THEN NULL
          |       ELSE sqrt(greatest(sq / n - (sm / n) * (sm / n), 0.0)) END AS value
          | FROM (SELECT t, CAST(len(ls) AS DOUBLE) AS n,
          |         CASE WHEN len(ls) = 0 THEN 0.0
          |              ELSE list_reduce(ls, (a, x) -> a + x) END AS sm,
          |         CASE WHEN len(ls) = 0 THEN 0.0
          |              ELSE list_reduce(list_transform(ls, x -> x * x),
          |                               (a, x) -> a + x) END AS sq
          |       FROM (SELECT t,
          |               list_sort(list(value) FILTER (WHERE value IS NOT NULL)) AS ls
          |             FROM series
          |             WHERE regexp_matches(name, '^events\.click\.[^.]*$')
          |             GROUP BY t))""".stripMargin))),

    ("dsl_aggregate_last",
      dq("aggregate(events.view.*, 'last')"),
      Some(multiQ(
        """SELECT 'aggregate' AS name, t, arg_max(value, name) AS value
          | FROM series WHERE regexp_matches(name, '^events\.view\.[^.]*$')
          | GROUP BY t""".stripMargin))),

    // last-known-value filter (threshold in the 45.1→54.6 gap of the
    // per-series arg_max(value, t) — exact values, no float noise)
    ("dsl_current_above",
      dq("currentAbove(group(events.*.*), 50)"),
      Some(multiQ(
        """SELECT s.name, s.t, s.value FROM series s
          | JOIN (SELECT name FROM series GROUP BY name
          |       HAVING arg_max(value, t) > 50.0) k USING (name)""".stripMargin))),

    // per-point transforms: invert (0 -> NULL), sqrt (IEEE-exact in
    // both engines), min-max normalization, delay, timeSlice
    ("dsl_invert",
      dq("invert(events.error.u2)"),
      Some(multiQ(
        """SELECT name, t,
          |  CASE WHEN value = 0 THEN NULL ELSE 1.0 / value END AS value
          | FROM series WHERE name = 'events.error.u2'""".stripMargin))),

    ("dsl_square_root",
      dq("squareRoot(events.view.u1)"),
      Some(multiQ(
        """SELECT name, t,
          |  CASE WHEN value < 0 THEN NULL ELSE sqrt(value) END AS value
          | FROM series WHERE name = 'events.view.u1'""".stripMargin))),

    ("dsl_min_max",
      dq("minMax(group(events.signup.*))"),
      Some(multiQ(
        """SELECT name, t,
          |  CASE WHEN value IS NULL THEN NULL
          |       WHEN mx = mn THEN 0.0
          |       ELSE (value - mn) / (mx - mn) END AS value
          | FROM (SELECT name, t, value,
          |         min(value) OVER (PARTITION BY name) AS mn,
          |         max(value) OVER (PARTITION BY name) AS mx
          |       FROM series
          |       WHERE regexp_matches(name, '^events\.signup\.[^.]*$'))""".stripMargin))),

    ("dsl_delay",
      dq("delay(events.click.u0, 3)"),
      Some(multiQ(
        s"""SELECT name, t, lag(value, 3) OVER ($byNameT) AS value
           | FROM series WHERE name = 'events.click.u0'""".stripMargin))),

    ("dsl_time_slice",
      dq("timeSlice(events.purchase.u1, 1704499200, 1704585600)"),
      Some(multiQ(
        """SELECT name, t,
          |  CASE WHEN t >= 1704499200 AND t <= 1704585600
          |       THEN value ELSE NULL END AS value
          | FROM series WHERE name = 'events.purchase.u1'""".stripMargin))),

    // the remaining trailing-window members (same emitted-from-nth
    // contract as movingAverage; min/max are NaN-skipping)
    ("dsl_moving_sum",
      dq("movingSum(events.error.u2, 5)"),
      Some(multiQ(
        s"""SELECT name, t, CASE WHEN cnt < 5 THEN NULL ELSE sm END AS value
           | FROM (SELECT name, t,
           |         row_number() OVER ($byNameT) AS rn,
           |         count(value) OVER ($byNameT ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS cnt,
           |         sum(value) OVER ($byNameT ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sm
           |       FROM series WHERE name = 'events.error.u2')
           | WHERE rn >= 5""".stripMargin))),

    ("dsl_moving_min",
      dq("movingMin(events.view.u0, 5)"),
      Some(multiQ(
        s"""SELECT name, t, mn AS value
           | FROM (SELECT name, t,
           |         row_number() OVER ($byNameT) AS rn,
           |         min(value) OVER ($byNameT ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mn
           |       FROM series WHERE name = 'events.view.u0')
           | WHERE rn >= 5""".stripMargin))),

    ("dsl_moving_max",
      dq("movingMax(events.view.u0, 5)"),
      Some(multiQ(
        s"""SELECT name, t, mx AS value
           | FROM (SELECT name, t,
           |         row_number() OVER ($byNameT) AS rn,
           |         max(value) OVER ($byNameT ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mx
           |       FROM series WHERE name = 'events.view.u0')
           | WHERE rn >= 5""".stripMargin))),

    // per-day odometer: exclusive running sum resetting at the
    // interval boundary
    ("dsl_integral_by_interval",
      dq("integralByInterval(events.click.u1, '1d')"),
      Some(multiQ(
        """SELECT name, t,
          |  coalesce(sum(value) OVER (
          |    PARTITION BY name, t // 86400 ORDER BY t
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS value
          | FROM series WHERE name = 'events.click.u1'""".stripMargin))),

    // multi-node grouping: key = '.'-joined nodes 1,2 (type.bucket);
    // graphite-web safeSum skips Nones (all-gap slot stays a gap)
    ("dsl_group_by_nodes",
      dq("groupByNodes(events.*.*, 'sum', 1, 2)"),
      Some(multiQ(
        """SELECT split_part(name, '.', 2) || '.' || split_part(name, '.', 3) AS name,
          |       t, sum(value) AS value
          | FROM series GROUP BY 1, 2""".stripMargin))),

    // null-skipping avg (graphite-web safeAvg): removeAboveValue gaps
    // the high points first, so slots where some members are gapped
    // pin the divide-by-known-count semantics (gap-as-zero would
    // deflate them)
    ("dsl_group_by_nodes_avg",
      dq("groupByNodes(removeAboveValue(events.*.*, 3), 'avg', 1)"),
      Some(multiQ(
        """SELECT split_part(name, '.', 2) AS name, t,
          |       avg(CASE WHEN value > 3.0 THEN NULL ELSE value END) AS value
          | FROM series GROUP BY 1, 2""".stripMargin))),

    // removeEmptySeries with an xFilesFactor: removeAboveValue(3)
    // leaves each series 1.2-5% known; xff=0.02 drops exactly the
    // view.u2 series (exact count fractions — no float noise)
    ("dsl_remove_empty",
      dq("removeEmptySeries(removeAboveValue(group(events.*.u2), 3), 0.02)"),
      Some(multiQ(
        """SELECT s.name, s.t,
          |  CASE WHEN s.value > 3.0 THEN NULL ELSE s.value END AS value
          | FROM series s JOIN (
          |   SELECT name FROM (
          |     SELECT name,
          |       CAST(count(*) FILTER (WHERE value <= 3.0) AS DOUBLE)
          |         / count(*) AS f
          |     FROM series
          |     WHERE regexp_matches(name, '^events\.[^.]*\.u2$')
          |     GROUP BY name)
          |   WHERE f >= 0.02) k USING (name)
          | WHERE regexp_matches(s.name, '^events\.[^.]*\.u2$')""".stripMargin))),

    // generic-cf wildcard collapse: user bucket wildcarded, max per
    // collapsed (events.<type>.*) name
    ("dsl_aggregate_wildcards",
      dq("aggregateWithWildcards(events.*.*, 'max', 2)"),
      Some(multiQ(
        """SELECT split_part(name, '.', 1) || '.' || split_part(name, '.', 2) || '.*' AS name,
          |       t, max(value) AS value
          | FROM series GROUP BY 1, 2""".stripMargin))),

    // name-surgery pair: grep keeps matching names (exclude's dual)...
    ("dsl_grep",
      dq("grep(events.*.*, 'click')"),
      Some(multiQ(
        """SELECT name, t, value FROM series
          | WHERE regexp_matches(name, 'click')""".stripMargin))),

    // ...and substr slices name nodes (start=1, to the end)
    ("dsl_substr",
      dq("substr(events.*.u0, 1)"),
      Some(multiQ(
        """SELECT split_part(name, '.', 2) || '.' || split_part(name, '.', 3) AS name,
          |       t, value FROM series
          | WHERE regexp_matches(name, '^events\.[^.]*\.u0$')""".stripMargin))),

    // empty primary set falls back to the second expression
    ("dsl_fallback",
      dq("fallbackSeries(events.zzz.*, events.click.u0)"),
      Some(multiQ(
        """SELECT name, t, value FROM series
          | WHERE name = 'events.click.u0'""".stripMargin))),

    // linear interior gap fill: removeAboveValue(3) gaps the high
    // points, interpolate rejoins the known neighbors along the line;
    // leading/trailing unknowns stay unknown in both engines
    ("dsl_interpolate",
      dq("interpolate(removeAboveValue(events.view.u0, 3))"),
      Some(multiQ(
        """SELECT name, t,
          |  CASE WHEN value IS NOT NULL THEN value
          |       WHEN pt IS NOT NULL AND nt IS NOT NULL THEN
          |         pv + (nv - pv) * CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)
          |       ELSE NULL END AS value
          | FROM (
          |  SELECT name, t, value,
          |    last_value(value IGNORE NULLS) OVER (PARTITION BY name ORDER BY t
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
          |    last_value(CASE WHEN value IS NOT NULL THEN t END IGNORE NULLS)
          |      OVER (PARTITION BY name ORDER BY t
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
          |    first_value(value IGNORE NULLS) OVER (PARTITION BY name ORDER BY t
          |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
          |    first_value(CASE WHEN value IS NOT NULL THEN t END IGNORE NULLS)
          |      OVER (PARTITION BY name ORDER BY t
          |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
          |  FROM (SELECT name, t,
          |          CASE WHEN value > 3.0 THEN NULL ELSE value END AS value
          |        FROM series WHERE name = 'events.view.u0'))""".stripMargin))),

    // from-anchored re-bucket: anchor = min(t)+1800 is deliberately
    // NOT slot- or interval-aligned, so the bucket edges straddle the
    // store's 3600s slots and the first slot falls before the window
    ("dsl_smart_summarize",
      ((s, d) => {
        val store = M.multi(s, d)
        val minT = store.agg(min(col("t"))).head.getLong(0)
        val ctx = Eval.Ctx(s, store, M.StepSeconds, minT + 1800L, 0L)
        fin(Eval.evalExpr(ctx, "smartSummarize(events.click.u0, '2h', 'sum')"))
      }): Q,
      Some(multiQ(
        """SELECT name,
          |  (SELECT min(t) + 1800 FROM series)
          |    + ((t - (SELECT min(t) + 1800 FROM series)) // 7200) * 7200 AS t,
          |  sum(value) AS value
          | FROM series
          | WHERE name = 'events.click.u0'
          |   AND t >= (SELECT min(t) + 1800 FROM series)
          | GROUP BY 1, 2""".stripMargin))),

    // safeMul across the type node: any unknown member gaps the slot;
    // the product folds the VALUE-SORTED members on both engines
    // (1.0-init vs first-elem-init is exact: 1.0 * x == x)
    ("dsl_multiply_wildcards",
      dq("multiplySeriesWithWildcards(events.*.u0, 1)"),
      Some(multiQ(
        """SELECT split_part(name, '.', 1) || '.*.' || split_part(name, '.', 3) AS name,
          |       t,
          |       CASE WHEN count(*) FILTER (WHERE value IS NULL) > 0 THEN NULL
          |            ELSE list_reduce(list_sort(list(value)), (a, b) -> a * b)
          |       END AS value
          | FROM series WHERE regexp_matches(name, '^events\.[^.]*\.u0$')
          | GROUP BY 1, 2""".stripMargin))),

    // band filter on the per-series averages: n=80 keeps series whose
    // average escapes the [20th, 80th] reference-quantile band of all
    // the averages
    ("dsl_avg_outside_percentile",
      dq("averageOutsidePercentile(events.*.*, 80)"),
      Some(multiQ(
        s"""SELECT s.name, s.t, s.value FROM series s JOIN (
           |  SELECT name FROM (
           |    SELECT name, avg(value) AS a,
           |      ${O.refQuantileSql("(list_sort(list(avg(value)) OVER ()))", 0.2)} AS lo,
           |      ${O.refQuantileSql("(list_sort(list(avg(value)) OVER ()))", 0.8)} AS hi
           |    FROM series GROUP BY name)
           |  WHERE NOT (a > lo AND a < hi)) k USING (name)""".stripMargin))),

    // per-slot band: a series survives when ANY of its points escapes
    // its timestamp's [20th, 80th] band across the series
    ("dsl_remove_between_percentile",
      dq("removeBetweenPercentile(events.*.*, 80)"),
      Some(multiQ(
        s"""SELECT s.name, s.t, s.value FROM series s JOIN (
           |  SELECT name FROM (
           |    SELECT name, value,
           |      ${O.refQuantileSql("(list_sort(list(value) OVER (PARTITION BY t)))", 0.2)} AS lo,
           |      ${O.refQuantileSql("(list_sort(list(value) OVER (PARTITION BY t)))", 0.8)} AS hi
           |    FROM series)
           |  GROUP BY name
           |  HAVING bool_or(coalesce(value > hi OR value < lo, false))) k
           |  USING (name)""".stripMargin))),

    // threshold = a labeled constantLine over the ctx viewport
    ("dsl_threshold",
      ((s, d) => {
        val store = M.multi(s, d)
        val b = store.agg(min(col("t")), max(col("t"))).head
        val ctx = Eval.Ctx(s, store, M.StepSeconds, b.getLong(0), b.getLong(1))
        fin(Eval.evalExpr(ctx, "threshold(3.5, 'limit')"))
      }): Q,
      Some(multiQ(
        """SELECT 'limit' AS name, min(t) AS t, 3.5 AS value FROM series
          | UNION ALL
          | SELECT 'limit' AS name, max(t) AS t, 3.5 AS value FROM series""".stripMargin))),

    // pairwise list division: name-sorted rank pairs view.uK / click.uK
    ("dsl_divide_lists",
      dq("divideSeriesLists(events.view.*, events.click.*)"),
      Some(multiQ(
        """SELECT pr.outn AS name, a.t,
          |       CASE WHEN b.value = 0.0 THEN NULL
          |            ELSE a.value / b.value END AS value
          | FROM (
          |   SELECT ra.na, rb.nb,
          |          'divideSeries(' || ra.na || ',' || rb.nb || ')' AS outn
          |   FROM (SELECT name AS na,
          |                row_number() OVER (ORDER BY name) AS r
          |         FROM (SELECT DISTINCT name FROM series
          |               WHERE regexp_matches(name, '^events\.view\.[^.]*$'))) ra
          |   JOIN (SELECT name AS nb,
          |                row_number() OVER (ORDER BY name) AS r
          |         FROM (SELECT DISTINCT name FROM series
          |               WHERE regexp_matches(name, '^events\.click\.[^.]*$'))) rb
          |   USING (r)) pr
          | JOIN series a ON a.name = pr.na
          | JOIN series b ON b.name = pr.nb AND b.t = a.t""".stripMargin))),

    // pairwise list sum: gap-as-zero over the pair's GRID UNION (the
    // sumSeries convention — the two members' viewports differ)
    ("dsl_sum_lists",
      dq("sumSeriesLists(events.view.*, events.error.*)"),
      Some(multiQ(
        """SELECT pr.outn AS name, s.t,
          |       sum(coalesce(s.value, 0.0)) AS value
          | FROM (
          |   SELECT ra.na, rb.nb,
          |          'sumSeries(' || ra.na || ',' || rb.nb || ')' AS outn
          |   FROM (SELECT name AS na,
          |                row_number() OVER (ORDER BY name) AS r
          |         FROM (SELECT DISTINCT name FROM series
          |               WHERE regexp_matches(name, '^events\.view\.[^.]*$'))) ra
          |   JOIN (SELECT name AS nb,
          |                row_number() OVER (ORDER BY name) AS r
          |         FROM (SELECT DISTINCT name FROM series
          |               WHERE regexp_matches(name, '^events\.error\.[^.]*$'))) rb
          |   USING (r)) pr
          | JOIN series s ON s.name = pr.na OR s.name = pr.nb
          | GROUP BY 1, 2""".stripMargin))),

    // applyByNode: per-prefix template expansion with '%' substitution
    ("dsl_apply_by_node",
      dq("applyByNode(events.*.*, 1, 'sumSeries(%.*)', '%.total')"),
      Some(multiQ(
        """SELECT split_part(name, '.', 1) || '.' ||
          |       split_part(name, '.', 2) || '.total' AS name,
          |       t, sum(coalesce(value, 0.0)) AS value
          | FROM series GROUP BY 1, 2""".stripMargin))),

    // graphite 1.1's add() spelling of offset
    ("dsl_add",
      dq("add(events.view.u0, 2.5)"),
      Some(multiQ(
        """SELECT name, t, value + 2.5 AS value FROM series
          | WHERE name = 'events.view.u0'""".stripMargin))),

    // time(name, step): value(t) = t on an explicit step grid
    ("dsl_time",
      ((s, d) => {
        val store = M.multi(s, d)
        val b = store.agg(min(col("t")), max(col("t"))).head
        val ctx = Eval.Ctx(s, store, M.StepSeconds, b.getLong(0), b.getLong(1))
        fin(Eval.evalExpr(ctx, "time('clock', 7200)"))
      }): Q,
      Some(multiQ(
        """SELECT 'clock' AS name, t, CAST(t AS DOUBLE) AS value
          | FROM (SELECT unnest(generate_series(
          |         (SELECT min(t) FROM series),
          |         (SELECT max(t) FROM series), 7200)) AS t)""".stripMargin))),

    // the highest family's average member
    ("dsl_highest_average",
      dq("highestAverage(events.*.*, 2)"),
      Some(multiQ(
        """SELECT s.name, s.t, s.value FROM series s JOIN (
          |   SELECT name FROM (
          |     SELECT name, avg(value) AS a FROM series GROUP BY name)
          |   ORDER BY a DESC, name LIMIT 2) k USING (name)""".stripMargin))),

    // unique(): overlapping globs union the same series twice;
    // distinct collapses the exact-duplicate rows
    ("dsl_unique",
      dq("unique(group(events.*.u0, events.view.*))"),
      Some(multiQ(
        """SELECT DISTINCT name, t, value FROM (
          |  SELECT name, t, value FROM series
          |   WHERE regexp_matches(name, '^events\.[^.]*\.u0$')
          |  UNION ALL
          |  SELECT name, t, value FROM series
          |   WHERE regexp_matches(name, '^events\.view\.[^.]*$'))""".stripMargin))),

    // name-case surgery
    ("dsl_name_case",
      dq("toUpperCase(events.view.u0)"),
      Some(multiQ(
        """SELECT upper(name) AS name, t, value FROM series
          | WHERE name = 'events.view.u0'""".stripMargin))),

    // aggregateLine: per-series two-point constant line at the summary
    ("dsl_aggregate_line",
      ((s, d) => {
        val store = M.multi(s, d)
        val b = store.agg(min(col("t")), max(col("t"))).head
        val ctx = Eval.Ctx(s, store, M.StepSeconds, b.getLong(0), b.getLong(1))
        fin(Eval.evalExpr(ctx, "aggregateLine(events.*.u1, 'max')"))
      }): Q,
      Some(multiQ(
        """SELECT 'aggregateLine(' || g.name || ', max)' AS name,
          |        ts.t AS t, g.mx AS value
          | FROM (SELECT name, max(value) AS mx FROM series
          |       WHERE regexp_matches(name, '^events\.[^.]*\.u1$')
          |       GROUP BY name) g
          | CROSS JOIN (SELECT min(t) AS t FROM series
          |             UNION ALL SELECT max(t) FROM series) ts""".stripMargin))),

    // movingWindow dispatches the trailing-window family by name
    ("dsl_moving_window",
      dq("movingWindow(events.view.u0, 5, 'sum')"),
      Some(multiQ(
        s"""SELECT name, t, CASE WHEN cnt < 5 THEN NULL ELSE sm END AS value
           | FROM (SELECT name, t,
           |         row_number() OVER ($byNameT) AS rn,
           |         count(value) OVER ($byNameT ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS cnt,
           |         sum(value) OVER ($byNameT ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sm
           |       FROM series WHERE name = 'events.view.u0')
           | WHERE rn >= 5""".stripMargin))),

    // verticalLine: the render marker — two 1.0 points at [ts, ts+1]
    ("dsl_vertical_line",
      ((s, d) => {
        val store = M.multi(s, d)
        val b = store.agg(min(col("t")), max(col("t"))).head
        val ctx = Eval.Ctx(s, store, M.StepSeconds, b.getLong(0), b.getLong(1))
        fin(Eval.evalExpr(ctx,
          s"verticalLine(${b.getLong(0) + 3600}, 'deploy')"))
      }): Q,
      Some(multiQ(
        """SELECT 'deploy' AS name, min(t) + 3600 AS t, 1.0 AS value
          |   FROM series
          | UNION ALL
          | SELECT 'deploy' AS name, min(t) + 3601 AS t, 1.0 AS value
          |   FROM series""".stripMargin))),

    // identity: value(t) = t on the generator grid (maxPoints=2 pins
    // the two-point endpoints form; ReferenceDslSpec pins a dense grid)
    ("dsl_identity",
      ((s, d) => {
        val store = M.multi(s, d)
        val b = store.agg(min(col("t")), max(col("t"))).head
        val ctx = Eval.Ctx(s, store, M.StepSeconds, b.getLong(0), b.getLong(1),
          maxPoints = 2)
        fin(Eval.evalExpr(ctx, "identity('x')"))
      }): Q,
      Some(multiQ(
        """SELECT 'x' AS name, min(t) AS t, CAST(min(t) AS DOUBLE) AS value
          |   FROM series
          | UNION ALL
          | SELECT 'x' AS name, max(t) AS t, CAST(max(t) AS DOUBLE) AS value
          |   FROM series""".stripMargin))),

    // ----- the closing graphite-web wave: generic top-n / filter,
    // ----- pairwise generic combine, map/reduce, legends, generators -----

    // highest(set, n, func): the generic spelling of highestMax
    ("dsl_highest",
      dq("highest(events.*.*, 2, 'max')"),
      Some(multiQ(
        """SELECT s.name, s.t, s.value FROM series s JOIN (
          |   SELECT name FROM (
          |     SELECT name, row_number() OVER (ORDER BY mx DESC, name) AS r
          |     FROM (SELECT name, max(value) AS mx FROM series GROUP BY name))
          |   WHERE r <= 2) k USING (name)""".stripMargin))),

    // lowest(set, n, func): bottom-2 by viewport total
    ("dsl_lowest",
      dq("lowest(events.*.u1, 2, 'total')"),
      Some(multiQ(
        """SELECT s.name, s.t, s.value FROM series s JOIN (
          |   SELECT name FROM (
          |     SELECT name, row_number() OVER (ORDER BY sm ASC, name) AS r
          |     FROM (SELECT name, sum(value) AS sm FROM series
          |           WHERE regexp_matches(name, '^events\.[^.]*\.u1$')
          |           GROUP BY name))
          |   WHERE r <= 2) k USING (name)""".stripMargin))),

    // filterSeries: the generic summary filter (averageAbove's spelling)
    ("dsl_filter_series",
      dq("filterSeries(events.*.*, 'average', '>', 49)"),
      Some(multiQ(
        """SELECT s.name, s.t, s.value FROM series s
          | JOIN (SELECT name FROM series GROUP BY name
          |       HAVING avg(value) > 49.0) k USING (name)""".stripMargin))),

    // aggregateSeriesLists: name-rank pairing, SAFE 'diff' (an unknown
    // minuend yields the subtrahend — graphite's safeDiff)
    ("dsl_agg_series_lists",
      dq("aggregateSeriesLists(events.click.*, events.view.*, 'diff')"),
      Some(multiQ(
        """SELECT coalesce(va.outn, vb.outn) AS name,
          |       coalesce(va.t, vb.t) AS t,
          |       CASE WHEN va.a IS NOT NULL AND vb.b IS NOT NULL THEN va.a - vb.b
          |            ELSE coalesce(va.a, vb.b) END AS value
          | FROM (SELECT p.outn, s.t, s.value AS a FROM series s JOIN (
          |         SELECT pa.name AS na, pb.name AS nb,
          |                'diffSeries(' || pa.name || ',' || pb.name || ')' AS outn
          |         FROM (SELECT name, row_number() OVER (ORDER BY name) AS r
          |               FROM (SELECT DISTINCT name FROM series
          |                     WHERE regexp_matches(name, '^events\.click\.[^.]*$'))) pa
          |         JOIN (SELECT name, row_number() OVER (ORDER BY name) AS r
          |               FROM (SELECT DISTINCT name FROM series
          |                     WHERE regexp_matches(name, '^events\.view\.[^.]*$'))) pb
          |         USING (r)) p ON s.name = p.na) va
          | FULL OUTER JOIN (SELECT p.outn, s.t, s.value AS b FROM series s JOIN (
          |         SELECT pa.name AS na, pb.name AS nb,
          |                'diffSeries(' || pa.name || ',' || pb.name || ')' AS outn
          |         FROM (SELECT name, row_number() OVER (ORDER BY name) AS r
          |               FROM (SELECT DISTINCT name FROM series
          |                     WHERE regexp_matches(name, '^events\.click\.[^.]*$'))) pa
          |         JOIN (SELECT name, row_number() OVER (ORDER BY name) AS r
          |               FROM (SELECT DISTINCT name FROM series
          |                     WHERE regexp_matches(name, '^events\.view\.[^.]*$'))) pb
          |         USING (r)) p ON s.name = p.nb) vb
          |   ON va.outn = vb.outn AND va.t = vb.t""".stripMargin))),

    // powSeries: name-order power fold; minMax pre-normalizes into
    // [0,1] so the cross-engine pow ulp is absorbed by round-6
    ("dsl_pow_series",
      dq("powSeries(minMax(events.click.u0), minMax(events.click.u2))"),
      Some(multiQ(
        """SELECT 'powSeries' AS name, t,
          |   CASE WHEN a IS NOT NULL AND b IS NOT NULL THEN pow(a, b)
          |        ELSE coalesce(a, b) END AS value
          | FROM (SELECT t,
          |         max(CASE WHEN name = 'events.click.u0' THEN v END) AS a,
          |         max(CASE WHEN name = 'events.click.u2' THEN v END) AS b
          |       FROM (SELECT name, t,
          |               CASE WHEN max(value) OVER (PARTITION BY name)
          |                      = min(value) OVER (PARTITION BY name) THEN 0.0
          |                    ELSE (value - min(value) OVER (PARTITION BY name))
          |                       / (max(value) OVER (PARTITION BY name)
          |                        - min(value) OVER (PARTITION BY name)) END AS v
          |             FROM series
          |             WHERE name IN ('events.click.u0', 'events.click.u2'))
          |       GROUP BY t)""".stripMargin))),

    // reduceSeries(mapSeries(...)): graphite's map/reduce pair —
    // per-prefix asPercent of the click slot over the view slot
    ("dsl_map_reduce",
      dq("reduceSeries(mapSeries(events.*.u0, 1), 'asPercent', 1, 'click', 'view')"),
      Some(multiQ(
        """SELECT 'events.reduce.asPercent' AS name, t,
          |   CASE WHEN b IS NULL OR b = 0 THEN NULL ELSE a / b * 100.0 END AS value
          | FROM (SELECT t,
          |         max(CASE WHEN name = 'events.click.u0' THEN value END) AS a,
          |         max(CASE WHEN name = 'events.view.u0' THEN value END) AS b
          |       FROM series
          |       WHERE name IN ('events.click.u0', 'events.view.u0')
          |       GROUP BY t)""".stripMargin))),

    // cactiStyle: column-aligned Current/Max/Min legend in the name;
    // %.2f of the half-even-prerounded value (round_even ≡ bround)
    ("dsl_cacti_style",
      dq("cactiStyle(events.*.u1)"),
      Some(multiQ(
        """SELECT rpad(g.name, g.nw, ' ') || ' Current:' || rpad(g.l, g.lw, ' ')
          |     || ' Max:' || rpad(g.mx, g.xw, ' ')
          |     || ' Min:' || rpad(g.mn, g.mw, ' ') || ' ' AS name,
          |       s.t, s.value
          | FROM series s JOIN (
          |   SELECT name, l, mx, mn,
          |     CAST(max(length(name)) OVER () AS INTEGER) AS nw,
          |     CAST(max(length(l)) OVER () AS INTEGER) AS lw,
          |     CAST(max(length(mx)) OVER () AS INTEGER) AS xw,
          |     CAST(max(length(mn)) OVER () AS INTEGER) AS mw
          |   FROM (SELECT name,
          |           printf('%.2f', round_even(arg_max(value, t), 2)) AS l,
          |           printf('%.2f', round_even(max(value), 2)) AS mx,
          |           printf('%.2f', round_even(min(value), 2)) AS mn
          |         FROM series
          |         WHERE regexp_matches(name, '^events\.[^.]*\.u1$')
          |         GROUP BY name)) g ON s.name = g.name""".stripMargin))),

    // legendValue: per-type name suffixes in argument order
    ("dsl_legend_value",
      dq("legendValue(events.*.u2, 'avg', 'max')"),
      Some(multiQ(
        """SELECT s.name || ' (avg: ' || printf('%.2f', round_even(g.a, 2))
          |     || ')' || ' (max: ' || printf('%.2f', round_even(g.m, 2))
          |     || ')' AS name, s.t, s.value
          | FROM series s JOIN (
          |   SELECT name, avg(value) AS a, max(value) AS m FROM series
          |   WHERE regexp_matches(name, '^events\.[^.]*\.u2$')
          |   GROUP BY name) g ON s.name = g.name""".stripMargin))),

    // aliasQuery: per-series query rewrite; %d truncates toward zero
    ("dsl_alias_query",
      dq("aliasQuery(events.click.u0, 'events.click.(.*)', " +
        "'events.view.\\1', 'clicks (views last: %d)')"),
      Some(multiQ(
        """SELECT 'clicks (views last: ' ||
          |   CAST(CAST(trunc((SELECT arg_max(value, t) FROM series
          |                    WHERE name = 'events.view.u0')) AS BIGINT)
          |     AS VARCHAR) || ')' AS name, t, value
          | FROM series WHERE name = 'events.click.u0'""".stripMargin))),

    // setXFilesFactor channel honored by a bare removeEmptySeries:
    // series whose ≤50 fraction misses the 0.61 bar drop
    ("dsl_set_xff",
      dq("removeEmptySeries(setXFilesFactor(removeAboveValue(events.*.u0, 50), 0.61))"),
      Some(multiQ(
        """SELECT s.name, s.t,
          |   CASE WHEN s.value > 50 THEN NULL ELSE s.value END AS value
          | FROM series s JOIN (
          |   SELECT name FROM series
          |   WHERE regexp_matches(name, '^events\.[^.]*\.u0$')
          |   GROUP BY name
          |   HAVING avg(CASE WHEN value <= 50 THEN 1.0 ELSE 0.0 END) >= 0.61) k
          |  USING (name)""".stripMargin))),

    // sinFunction: amplitude·sin(t) on an end-exclusive step grid
    ("dsl_sin_function",
      ((s, d) => {
        val store = M.multi(s, d)
        val b = store.agg(min(col("t")), max(col("t"))).head
        val ctx = Eval.Ctx(s, store, M.StepSeconds, b.getLong(0), b.getLong(1))
        fin(Eval.evalExpr(ctx, "sinFunction('sine', 2, 7200)"))
      }): Q,
      Some(multiQ(
        """SELECT 'sine' AS name, t, sin(CAST(t AS DOUBLE)) * 2 AS value
          | FROM (SELECT unnest(generate_series(
          |         (SELECT min(t) FROM series),
          |         (SELECT max(t) FROM series) - 1, 7200)) AS t)""".stripMargin))),

    // events(*tags): annotations-as-a-series — per-step event counts;
    // the ctx events frame here derives from the events TABLE (one
    // tag per row = its type) so the whole function has a real oracle
    ("dsl_events",
      ((s, d) => {
        val ev = Tables.events(s, d).select(
          unix_timestamp(col("ts")).as("when"),
          array(col("event_type")).as("tags"))
        val ctx = Eval.Ctx(s, M.multi(s, d), M.StepSeconds, 0L, 0L,
          events = Some(ev))
        fin(Eval.evalExpr(ctx, "events(click)"))
      }): Q,
      Some(multiQ(
        """SELECT 'events(click)' AS name,
          |   CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS t,
          |   CAST(count(*) AS DOUBLE) AS value
          | FROM events WHERE event_type = 'click' GROUP BY 2""".stripMargin))),

    // randomWalk: the deterministic-LCG variant — exact integer PRN,
    // power-of-two divide, sequential cumulative sum (bit-identical
    // cross-engine; see the Eval binder's contract)
    ("dsl_random_walk",
      ((s, d) => {
        val store = M.multi(s, d)
        val b = store.agg(min(col("t")), max(col("t"))).head
        val ctx = Eval.Ctx(s, store, M.StepSeconds, b.getLong(0), b.getLong(1))
        fin(Eval.evalExpr(ctx, "randomWalk('rw', 7200)"))
      }): Q,
      Some(multiQ(
        """SELECT 'rw' AS name,
          |   (SELECT min(t) FROM series) + i * 7200 AS t,
          |   coalesce(sum(u) OVER (ORDER BY i
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS value
          | FROM (SELECT i,
          |         CAST((1103515245 * i + 12345) % 2147483648 AS DOUBLE)
          |           / 2147483648.0 - 0.5 AS u
          |       FROM (SELECT unnest(generate_series(0,
          |              (SELECT (max(t) - min(t) + 7199) // 7200 - 1
          |               FROM series))) AS i))""".stripMargin)))
  )

  /** Canonical tagged twin of the multi store (`ev.req;dc=uN;type=T`)
    * plus one UNTAGGED series, for the seriesByTag queries. */
  private def taggedStore(s: SparkSession, d: String): DataFrame = {
    val base = M.multi(s, d)
    val parts = split(col("name"), "\\.")
    base.select(
        concat(lit("ev.req;dc="), element_at(parts, 3),
          lit(";type="), element_at(parts, 2)).as("name"),
        col("t"), col("value"))
      .unionByName(base.filter(col("name") === "events.click.u0")
        .select(lit("plain.req").as("name"), col("t"), col("value")))
  }

  /** DuckDB twin of [[taggedStore]]: emits `series` (the multi store)
    * and `series2` (its tagged re-labeling + the untagged row). */
  private def taggedStoreSql: String =
    M.multiSql() +
      """, series2 AS (
        |  SELECT 'ev.req;dc=' || ps[3] || ';type=' || ps[2] AS name, t, value
        |  FROM (SELECT string_split(name, '.') AS ps, t, value FROM series)
        |  UNION ALL
        |  SELECT 'plain.req' AS name, t, value FROM series
        |  WHERE name = 'events.click.u0'
        |)""".stripMargin

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
