package graft.rrd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch re-expression of the reference's write-path consolidation engine
  * (`rrd/ds.go:230-350`, `rrd/pdp.go:96-141`, `rrd/rra.go:179-253`).
  *
  * The reference updates one PDP accumulator per incoming point; the batch
  * equivalent treats the update stream per series as a set of intervals —
  * each point's value spreads over `[lastUpdate, ts]` (`rrd/ds.go:24-31`) —
  * splits every interval across step boundaries, and aggregates per slot:
  *
  *   - WMEAN slot value = Σ(v·overlap) / Σ(overlap)   (`rrd/pdp.go:97-106`)
  *   - MAX/MIN = extreme of contributing values       (`rrd/pdp.go:109-133`)
  *   - LAST    = value of the latest contributing interval (`rrd/pdp.go:135-141`)
  *   - heartbeat: a gap `ts − lastUpdate > HB` turns the whole interval
  *     NaN (`rrd/ds.go:320-330`); NaN contributes nothing (AddValue is a
  *     no-op on NaN), so NaN intervals are simply dropped — which also
  *     reproduces "NaN slots are deleted, not stored" (`rrd/rra.go:245-248`)
  *   - XFF: slot kept only if known fraction Σ(overlap)/step ≥ xff
  *     (`rrd/rra.go:232-237`; NB tgres's test is the *inverse* of RRDTool's)
  *   - the slot containing the last update is incomplete and not emitted
  *     (the reference's PDP holds it un-flushed)
  *
  * Scale: one shuffle partitioned by series for the lag(), a map-side
  * explode bounded by interval_length/step, and one combinable hash
  * aggregate on (name, slot). Dropping NaN intervals *before* the explode
  * means a series that goes silent for a month costs zero rows, not
  * gap/step ones. All plain Catalyst expressions — whole-stage codegen'd.
  */
object Consolidate {

  /** Per-(name, second) update stream from raw points: floors timestamps
    * to whole seconds (both engines agree on integer math) and collapses
    * same-second updates to the latest by full-precision timestamp —
    * the reference would process them in arrival order, last wins. */
  def updates(points: DataFrame): DataFrame =
    points.groupBy(col("name"), unix_timestamp(col("ts")).as("sec"))
      .agg(max_by(col("value"), col("ts")).as("value"))
      .select(col("name"), col("sec").as("ts"), col("value"))

  /** Consolidate an update stream `(name, ts: Long sec, value: Double)`
    * to `(name, t: Long slot-start, value)` at `stepSec` resolution.
    *
    * @param cf  "wmean" | "max" | "min" | "last"
    * @param xff minimum known fraction of a slot (0.0 disables)
    * @param heartbeatSec gap above which the interval is unknown
    */
  def consolidate(updateStream: DataFrame, stepSec: Long, cf: String,
      xff: Double, heartbeatSec: Long): DataFrame = {
    val byName = Window.partitionBy("name").orderBy("ts")

    // Interval per consecutive update pair; value rides on the LATER point
    // (`rrd/ds.go:330`: updateRange(ds.lastUpdate, ts, value)); heartbeat
    // exceedance → NaN → dropped (contributes nothing, see scaladoc).
    // A NaN-VALUED update is a boundary that contributes nothing
    // (`rrd/pdp.go:97-99`: AddValue no-ops on NaN, but ds.lastUpdate
    // still advances) — the row participates in the lag pairing above
    // and its own interval drops here, value and duration both.
    // Round 16 NOTE: folding the per-series lastUpdate into the lag
    // window as `max(ts) over (… unbounded following)` was tried and
    // REVERTED — an unbounded-FOLLOWING frame makes WindowExec buffer
    // the whole partition before emitting a row (the streaming lag
    // frame doesn't), and the 100 M-row probe read 12 s → 73 s on
    // consolidate_1m. The second scan + broadcast join-back is the
    // cheaper shape at scale.
    val iv = updateStream
      .withColumn("begin", lag(col("ts"), 1).over(byName))
      .filter(col("begin").isNotNull && col("ts") > col("begin") &&
        (col("ts") - col("begin")) <= heartbeatSec)
      .filter(!isnan(col("value")))
      .select(col("name"), col("begin"), col("ts").as("end"), col("value").as("v"))

    val pieces = explodeOverlap(iv, stepSec)

    val cfValue: Column = cf match {
      case "wmean" => sum(col("v") * col("overlap")) / sum(col("overlap"))
      case "max"   => max(col("v"))
      case "min"   => min(col("v"))
      case "last"  => max_by(col("v"), col("end"))
      case other   => throw new IllegalArgumentException(s"cf: $other")
    }

    val agg = pieces.groupBy(col("name"), col("t"))
      .agg(cfValue.as("value"), sum(col("overlap")).as("dur"))

    // Incomplete-slot cutoff: per-series lastUpdate (cheap agg, broadcast).
    val lastUpdate = updateStream.groupBy(col("name"))
      .agg(max(col("ts")).as("__last"))

    agg.join(broadcast(lastUpdate), Seq("name"))
      .filter(col("t") + stepSec <= col("__last"))
      .filter(col("dur") >= lit(xff * stepSec))
      .select(col("name"), col("t"), col("value"))
  }

  /** Like [[consolidate]] (WMEAN only) but keeps the per-slot known
    * duration — the partial-aggregate form that [[cascade]] re-combines
    * into coarser archives. */
  def consolidateWithDur(updateStream: DataFrame, stepSec: Long,
      heartbeatSec: Long): DataFrame = {
    val byName = Window.partitionBy("name").orderBy("ts")
    val iv = updateStream
      .withColumn("begin", lag(col("ts"), 1).over(byName))
      .filter(col("begin").isNotNull && col("ts") > col("begin") &&
        (col("ts") - col("begin")) <= heartbeatSec)
      .filter(!isnan(col("value"))) // NaN boundary: rrd/pdp.go:97-99
      .select(col("name"), col("begin"), col("ts").as("end"), col("value").as("v"))
    explodeOverlap(iv, stepSec)
      .groupBy(col("name"), col("t"))
      .agg((sum(col("v") * col("overlap")) / sum(col("overlap"))).as("value"),
        sum(col("overlap")).as("dur"))
  }

  /** Split interval rows `(…, begin, end, …)` across slot boundaries at
    * `stepSec`: adds `t` (slot start) and `overlap` (clamped
    * intersection length), drops empty intersections. The
    * weighted-overlap kernel shared by batch consolidation (above) and
    * the streaming slot/merge paths
    * ([[graft.streaming.Ingest.piecesToSlots]],
    * [[graft.streaming.Ingest.mergePiecesIntoArchive]]) — ONE
    * implementation so the `end − 1` slot bound and the clamp can never
    * drift between copies. */
  def explodeOverlap(iv: DataFrame, stepSec: Long): DataFrame = {
    val slotLo = floor(col("begin").cast("double") / stepSec).cast("long")
    val slotHi = floor((col("end") - 1).cast("double") / stepSec).cast("long")
    iv.withColumn("__slot", explode(sequence(slotLo, slotHi)))
      .withColumn("t", col("__slot") * stepSec)
      .withColumn("overlap",
        (least(col("end"), col("t") + stepSec) -
          greatest(col("begin"), col("t"))).cast("double"))
      .filter(col("overlap") > 0)
  }

  /** Multi-resolution cascade (`rrd/rra.go:179-253`'s DS-PDP → RRA
    * trickle, batch form): re-consolidate fine slots-with-duration into
    * a coarser archive WITHOUT touching raw data — the partial/final
    * aggregation split that makes a 10s→1m→10m→1d archive chain one
    * scan of the raw stream plus slot-cardinality re-aggregations.
    * Σ(value·dur)/Σ(dur) over complete target slots ≡ direct
    * consolidation at the target step (weighted means re-associate). */
  def cascade(slotsWithDur: DataFrame, lastUpdate: DataFrame,
      toStepSec: Long, xff: Double): DataFrame = {
    val bucket = (floor(col("t").cast("double") / toStepSec).cast("long") * toStepSec).as("t")
    slotsWithDur.groupBy(col("name"), bucket)
      .agg((sum(col("value") * col("dur")) / sum(col("dur"))).as("value"),
        sum(col("dur")).as("dur"))
      .join(broadcast(lastUpdate), Seq("name"))
      .filter(col("t") + toStepSec <= col("__last"))
      .filter(col("dur") >= lit(xff * toStepSec))
      .select(col("name"), col("t"), col("value"))
  }

  /** Per-series last update frame `(name, __last)` for cascade cutoff. */
  def lastUpdateOf(updateStream: DataFrame): DataFrame =
    updateStream.groupBy(col("name")).agg(max(col("ts")).as("__last"))

  /** Heartbeat-0 "Whisper mode" (`rrd/ds.go:86-104`, `rrd/ds.go:308-319`):
    * a point's value is assigned to its own slot only, no back-fill, a
    * later point in the same slot overwrites. Batch: last value per slot,
    * sparse (skipped slots are simply absent ≡ deleted NaN). */
  def whisperMode(updateStream: DataFrame, stepSec: Long): DataFrame =
    updateStream
      .filter(!isnan(col("value"))) // AddValue no-ops NaN: pdp.go:97-99
      .groupBy(col("name"),
        (floor(col("ts").cast("double") / stepSec).cast("long") * stepSec).as("t"))
      .agg(max_by(col("value"), col("ts")).as("value"))

  // ---- DuckDB oracle counterparts (kept adjacent; must stay
  // ---- formula-identical with the Spark definitions above) ----

  /** CTE chain `updates` ← events: (name, ts floored-sec, value). */
  val updatesSql: String =
    """updates AS (
      |  SELECT event_type AS name, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         arg_max(value, ts) AS value
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin

  /** CTE chain continuing `updates` with the consolidation at `step`;
    * defines `out(name, t, value)`. */
  def consolidateSql(stepSec: Long, cf: String, xff: Double,
      heartbeatSec: Long): String = {
    val cfSql = cf match {
      case "wmean" => "sum(v * overlap) / sum(overlap)"
      case "max"   => "max(v)"
      case "min"   => "min(v)"
      case "last"  => "arg_max(v, iend)"
    }
    s"""iv AS (
       |  SELECT * FROM (
       |    SELECT name, lag(sec) OVER (PARTITION BY name ORDER BY sec) AS ib,
       |           sec AS iend, value AS v
       |    FROM updates)
       |  WHERE ib IS NOT NULL AND iend > ib AND iend - ib <= $heartbeatSec
       |), pieces AS (
       |  SELECT name, v, iend, slot * $stepSec AS t,
       |         CAST(least(iend, slot * $stepSec + $stepSec)
       |            - greatest(ib, slot * $stepSec) AS DOUBLE) AS overlap
       |  FROM (SELECT name, ib, iend, v,
       |          unnest(generate_series(ib // $stepSec, (iend - 1) // $stepSec)) AS slot
       |        FROM iv)
       |), agged AS (
       |  SELECT name, t, $cfSql AS value, sum(overlap) AS dur
       |  FROM pieces WHERE overlap > 0 GROUP BY name, t
       |), lastu AS (
       |  SELECT name, max(sec) AS lastsec FROM updates GROUP BY name
       |), out AS (
       |  SELECT a.name, a.t, a.value FROM agged a JOIN lastu USING (name)
       |  WHERE a.t + $stepSec <= lastsec AND a.dur >= ${xff * stepSec}
       |)""".stripMargin
  }

  def whisperSql(stepSec: Long): String =
    s"""out AS (
       |  SELECT name, (sec // $stepSec) * $stepSec AS t, arg_max(value, sec) AS value
       |  FROM updates GROUP BY 1, 2
       |)""".stripMargin
}
