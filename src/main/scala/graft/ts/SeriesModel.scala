package graft.ts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical time-series frame: `(name: String, t: Long epoch-seconds, value: Double)`.
  *
  * This is the Spark re-expression of the reference's `SeriesMap`
  * (`dsl/seriesmap.go:20-44`): one *long* DataFrame holds every series,
  * distinguished by `name`, instead of one lazy-iterator object per series.
  * SQL NULL plays the role the reference gives NaN (`rrd/pdp.go:67-68`) —
  * the unknown/gap marker. `t` is the slot START boundary
  * (`floor(ts/step)*step`), kept as epoch seconds (BIGINT) so interval
  * arithmetic is integer math and oracle comparison is timezone-free.
  * (The reference marks slot ENDs — `dsl/funcs.go` constantLine comment;
  * this engine deliberately uses starts, applied consistently on both the
  * Spark and oracle sides, since only grid *consistency* is semantic.)
  *
  * Scale notes (100 TB): the raw `events` scan is the only large input; the
  * per-(name, slot) aggregate is a map-side-combinable hash aggregate whose
  * output cardinality is bounded by series-count x slots — tiny relative to
  * the input. The dense grid (slots x names) is generated, broadcast, and
  * joined with the *aggregated* side, so nothing downstream of consolidation
  * touches raw-event cardinality. Window functions partition by `name`; a
  * 1000-executor cluster spreads series across tasks, and one series' grid
  * (1 point per step) always fits in a task.
  */
object SeriesModel {

  /** Default consolidation step: 1 hour (testdata spans ~30 days → ~720
    * slots/series; dense at every scale factor). */
  val StepSeconds: Long = 3600L

  import graft.Tables

  // floor, not cast-truncation: both engines must round pre-1970
  // (negative-epoch) timestamps down to the same slot
  private def slot(stepSec: Long) =
    (floor(unix_timestamp(col("ts")).divide(lit(stepSec))).cast("long") * stepSec).as("t")

  /** Sparse consolidated series: average of raw values per (series, slot) —
    * the reference's groupBy-average re-consolidation
    * (`serde/dbseries.go:104-127`). Values rounded to 6 dp so the DuckDB
    * oracle lands on bit-identical doubles. No NULL values can occur. */
  def sparse(spark: SparkSession, dir: String, stepSec: Long = StepSeconds): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type").as("name"), slot(stepSec))
      .agg(Round6.r6(avg(col("value"))).as("value"))

  /** Dense series: the reference's grid left-join densification
    * (`serde/postgres.go:169-173` — generate_series LEFT OUTER JOIN actual
    * points). Missing slots carry NULL (reference: NaN). */
  def dense(spark: SparkSession, dir: String, stepSec: Long = StepSeconds): DataFrame = {
    // Round 16: bounds and names derive from the AGGREGATED sparse
    // frame, not the raw events — min/max slot over sparse equals the
    // floored min/max ts (floor is monotone) and every event's name
    // surfaces in sparse (no filters), so values are unchanged, and
    // all three consumers now share ONE identical scan+partial-agg
    // exchange subtree (ReuseExchange collapses them) instead of
    // paying three independent full scans of the raw table.
    val raw = sparse(spark, dir, stepSec)
    val bounds = raw.agg(min(col("t")).as("lo"), max(col("t")).as("hi"))
    val grid = bounds.select(explode(sequence(col("lo"), col("hi"), lit(stepSec))).as("t"))
    val names = raw.select(col("name")).distinct()
    grid.crossJoin(broadcast(names))
      .join(raw, Seq("name", "t"), "left")
      .select(col("name"), col("t"), col("value"))
  }

  /** Multi-node series names (`events.<type>.u<bucket>`), for the
    * name-node family (wildcards / groupByNode / aliasByNode — the
    * reference's dotted-name operators, `dsl/funcs.go:684-880`). */
  def multi(spark: SparkSession, dir: String, stepSec: Long = StepSeconds): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        concat(lit("events."), col("event_type"), lit(".u"), pmod(col("user_id"), lit(3))).as("name"),
        slot(stepSec))
      .agg(Round6.r6(avg(col("value"))).as("value"))

  // ---- DuckDB oracle counterparts (kept textually adjacent so the two
  // ---- definitions can be eyeballed for equivalence) ----

  private def slotSql(stepSec: Long) =
    s"CAST(floor(epoch(ts) / $stepSec) AS BIGINT) * $stepSec"

  def sparseSql(stepSec: Long = StepSeconds): String =
    s"""WITH series AS (
       |  SELECT event_type AS name, ${slotSql(stepSec)} AS t,
       |         ${Round6.r6Sql("avg(value)")} AS value
       |  FROM events GROUP BY 1, 2
       |)""".stripMargin

  def denseSql(stepSec: Long = StepSeconds): String =
    s"""WITH bounds AS (
       |  SELECT CAST(floor(epoch(min(ts)) / $stepSec) AS BIGINT) * $stepSec AS lo,
       |         CAST(floor(epoch(max(ts)) / $stepSec) AS BIGINT) * $stepSec AS hi
       |  FROM events
       |), grid AS (
       |  SELECT unnest(generate_series(lo, hi, $stepSec)) AS t FROM bounds
       |), names AS (
       |  SELECT DISTINCT event_type AS name FROM events
       |), raw AS (
       |  SELECT event_type AS name, ${slotSql(stepSec)} AS t,
       |         ${Round6.r6Sql("avg(value)")} AS value
       |  FROM events GROUP BY 1, 2
       |), series AS (
       |  SELECT n.name, g.t, r.value
       |  FROM grid g CROSS JOIN names n
       |  LEFT JOIN raw r ON r.name = n.name AND r.t = g.t
       |)""".stripMargin

  def multiSql(stepSec: Long = StepSeconds): String =
    s"""WITH series AS (
       |  SELECT 'events.' || event_type || '.u' || CAST(user_id % 3 AS VARCHAR) AS name,
       |         ${slotSql(stepSec)} AS t,
       |         ${Round6.r6Sql("avg(value)")} AS value
       |  FROM events GROUP BY 1, 2
       |)""".stripMargin
}
