package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** StatsD aggregation semantics (`aggregator/aggregator.go:129-212`),
  * re-expressed as batch/micro-batch window aggregation over a sample
  * stream `(name, tsSec: event time, value, seq: tiebreak id)`.
  *
  * Flush cadence becomes a tumbling event-time window of `windowSec`
  * (the reference flushes every `stat-flush-interval`, default 10 s);
  * at 100 TB this is one map-side-combinable hash aggregate keyed on
  * (name, window) — counters/gauges partial-aggregate perfectly, and
  * the timer family's sorted list is bounded by samples-per-window per
  * metric, the same bound the reference's in-memory list has.
  *
  * Kinds (`aggregator/aggregator.go:161-205`):
  *   - counter (CmdAdd): flushed as per-second rate = Σvalue / elapsed
  *   - addgauge (CmdAddGauge): running sum, stored as-is
  *   - setgauge (CmdSetGauge): last write wins (ordered by (ts, seq))
  *   - timer (CmdAppend): sorted-list family `.count .lower .upper
  *     .sum .mean` + per-threshold `.sum_NN .mean_NN .upper_NN` with
  *     idx = round(NN/100·n) − 1.
  *
  * DELIBERATE DIVERGENCE: the reference's `cumul` array is initialized
  * to zeros and written once per slot (`cumul[n] += v` ≡ `= v`,
  * `aggregator/aggregator.go:183-186`), so its `.sum` is accidentally
  * the max sample and `.sum_NN`/`.mean_NN` collapse to
  * `list[idx]`/`list[idx]/(idx+1)`. This engine computes the true
  * cumulative sums (the statsd-documented semantics the code plainly
  * intends); same index math, honest prefix sums.
  */
object StatsdAgg {

  private def win(windowSec: Long): Column =
    (floor(col("tsSec").cast("double") / windowSec).cast("long") * windowSec).as("t")

  /** CmdAdd: per-second rate over the flush window. */
  def counterRate(samples: DataFrame, windowSec: Long): DataFrame =
    samples.groupBy(col("name"), win(windowSec))
      .agg((sum(col("value")) / windowSec.toDouble).as("value"))

  /** CmdAddGauge: sum stored as-is. */
  def gaugeSum(samples: DataFrame, windowSec: Long): DataFrame =
    samples.groupBy(col("name"), win(windowSec))
      .agg(sum(col("value")).as("value"))

  /** CmdSetGauge: last write in the window wins; total order by
    * (event time, seq) so ties are deterministic cross-engine. */
  def gaugeLast(samples: DataFrame, windowSec: Long): DataFrame =
    samples.groupBy(col("name"), win(windowSec))
      .agg(max_by(col("value"), struct(col("tsSec"), col("seq"))).as("value"))

  /** CmdAppend (timers): the full derived-metric family, one output row
    * per (metric, window, suffix). */
  def timers(samples: DataFrame, windowSec: Long,
      thresholds: Seq[Int] = Seq(90)): DataFrame = {
    val sorted = sort_array(collect_list(col("value")))
    val base = samples.groupBy(col("name"), win(windowSec))
      .agg(sorted.as("ls"), sum(col("value")).as("sm"),
        count(lit(1)).as("n"))

    val thresholdCols: Seq[Column] = thresholds.flatMap { th =>
      // idx = round(th/100 * n) - 1, reference's floor(x+0.5) rounding.
      // A low threshold over a tiny window gives idx < 0 — the
      // reference would panic on list[-1] (`aggregator.go:199-203`);
      // etsy-statsd SKIPS the threshold for that flush
      // (numInThreshold == 0 → continue), which is what both engines
      // do here: the guard yields NULL (when() short-circuits, so
      // element_at(ls, 0) is never evaluated) and the post-explode
      // filter drops the row.
      val idx = (floor(lit(th / 100.0) * col("n") + lit(0.5)) - 1).cast("int")
      val prefix = slice(col("ls"), lit(1), idx + 1)
      val sumTh = aggregate(prefix, lit(0.0), (acc, x) => acc + x)
      def guarded(c: Column): Column = when(idx >= 0, c)
      Seq(
        map(lit(f".sum_$th%02d"), guarded(sumTh)),
        map(lit(f".mean_$th%02d"), guarded(sumTh / (idx + 1).cast("double"))),
        map(lit(f".upper_$th%02d"), guarded(element_at(col("ls"), idx + 1))))
    }

    val metrics: Column = map_concat(
      (Seq(
        map(lit(".count"), col("n").cast("double")),
        map(lit(".lower"), element_at(col("ls"), 1)),
        map(lit(".upper"), element_at(col("ls"), -1)),
        map(lit(".sum"), col("sm")),
        map(lit(".mean"), col("sm") / col("n").cast("double"))
      ) ++ thresholdCols): _*)

    base.select(col("name"), col("t"), explode(metrics).as(Seq("suffix", "value")))
      .filter(col("value").isNotNull) // skipped sub-50 thresholds
      .select(concat(col("name"), col("suffix")).as("name"), col("t"), col("value"))
  }

  // ---- DuckDB oracle counterparts (formula-identical; `samples` CTE
  // ---- must provide name, tsSec, value, seq) ----

  private def winSql(w: Long) =
    s"CAST(floor(tsSec / $w) AS BIGINT) * $w"

  def counterRateSql(w: Long): String =
    s"""out AS (
       |  SELECT name, ${winSql(w)} AS t, sum(value) / $w.0 AS value
       |  FROM samples GROUP BY 1, 2
       |)""".stripMargin

  def gaugeSumSql(w: Long): String =
    s"""out AS (
       |  SELECT name, ${winSql(w)} AS t, sum(value) AS value
       |  FROM samples GROUP BY 1, 2
       |)""".stripMargin

  def gaugeLastSql(w: Long): String =
    s"""out AS (
       |  SELECT name, t, value FROM (
       |    SELECT name, ${winSql(w)} AS t, value,
       |           row_number() OVER (PARTITION BY name, ${winSql(w)}
       |                              ORDER BY tsSec DESC, seq DESC) AS rn
       |    FROM samples)
       |  WHERE rn = 1
       |)""".stripMargin

  def timersSql(w: Long, thresholds: Seq[Int] = Seq(90)): String = {
    val thSql = thresholds.flatMap { th =>
      val idx = s"(CAST(floor(${th / 100.0} * n + 0.5) AS INT) - 1)"
      // WHERE idx >= 0: skipped sub-50 thresholds, as the Spark side
      Seq(
        f"SELECT name, t, '.sum_$th%02d' AS suffix, list_sum(ls[1:$idx + 1]) AS value FROM agged WHERE $idx >= 0",
        f"SELECT name, t, '.mean_$th%02d' AS suffix, list_sum(ls[1:$idx + 1]) / ($idx + 1) AS value FROM agged WHERE $idx >= 0",
        f"SELECT name, t, '.upper_$th%02d' AS suffix, ls[$idx + 1] AS value FROM agged WHERE $idx >= 0")
    }.mkString(" UNION ALL ")
    s"""agged AS (
       |  SELECT name, ${winSql(w)} AS t, list(value ORDER BY value) AS ls,
       |         sum(value) AS sm, count(*) AS n
       |  FROM samples GROUP BY 1, 2
       |), fam AS (
       |  SELECT name, t, '.count' AS suffix, CAST(n AS DOUBLE) AS value FROM agged
       |  UNION ALL SELECT name, t, '.lower', ls[1] FROM agged
       |  UNION ALL SELECT name, t, '.upper', ls[-1] FROM agged
       |  UNION ALL SELECT name, t, '.sum', sm FROM agged
       |  UNION ALL SELECT name, t, '.mean', sm / n FROM agged
       |  UNION ALL $thSql
       |), out AS (
       |  SELECT name || suffix AS name, t, value FROM fam
       |)""".stripMargin
  }
}
