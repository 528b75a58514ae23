package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rrd.Consolidate
import graft.ts.Round6

/** Driver-checked queries for the consolidation engine (SURVEY §2.2):
  * time-weighted-mean / max / min / last interval consolidation with
  * heartbeat and XFF semantics, whisper (HB-0) mode, and the multi-step
  * cascade — the reference's whole write path re-expressed as batch
  * aggregation. Update stream = events with name=event_type.
  */
object RrdQueries {

  type Q = (SparkSession, String) => DataFrame

  private def points(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_type").as("name"), col("ts"), col("value"))

  private def fin(df: DataFrame): DataFrame =
    df.select(col("name"), col("t").cast("long").as("t"),
        Round6.r6(col("value").cast("double")).as("value"))
      .orderBy(col("name").asc_nulls_first, col("t").asc_nulls_first,
        col("value").asc_nulls_first)

  private val tailSql =
    s""" SELECT name, CAST(t AS BIGINT) AS t, ${Round6.r6Sql("CAST(value AS DOUBLE)")} AS value FROM out
       | ORDER BY name NULLS FIRST, t NULLS FIRST, value NULLS FIRST""".stripMargin

  private def consQ(step: Long, cf: String, xff: Double, hb: Long): String =
    s"WITH ${Consolidate.updatesSql}, ${Consolidate.consolidateSql(step, cf, xff, hb)}" + tailSql

  private def cons(cf: String, step: Long, xff: Double, hb: Long): Q =
    (s, d) => fin(Consolidate.consolidate(
      Consolidate.updates(points(s, d)), step, cf, xff, hb))

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // WMEAN at 30-min slots, xff 0.5, heartbeat 1 h — gaps beyond the
    // heartbeat become unknown and thin slots drop
    ("rrd_wmean",
      cons("wmean", 1800, 0.5, 3600),
      Some(consQ(1800, "wmean", 0.5, 3600))),

    // xff 0 keeps every slot with any known coverage
    ("rrd_wmean_xff0",
      cons("wmean", 1800, 0.0, 3600),
      Some(consQ(1800, "wmean", 0.0, 3600))),

    // the coarse-archive cascade: same stream at 1-day slots
    ("rrd_wmean_1d",
      cons("wmean", 86400, 0.5, 7200),
      Some(consQ(86400, "wmean", 0.5, 7200))),

    ("rrd_max",
      cons("max", 3600, 0.25, 7200),
      Some(consQ(3600, "max", 0.25, 7200))),

    ("rrd_min",
      cons("min", 3600, 0.25, 7200),
      Some(consQ(3600, "min", 0.25, 7200))),

    ("rrd_last",
      cons("last", 3600, 0.25, 7200),
      Some(consQ(3600, "last", 0.25, 7200))),

    // the multi-resolution cascade as partial→final re-aggregation:
    // 1h slots-with-duration recombined into the 6h archive, checked
    // against DIRECT 6h consolidation from raw — the algebraic identity
    // that lets a 10s→1m→10m→1d chain scan raw data once
    ("rrd_cascade_6h",
      ((s, d) => {
        val u = Consolidate.updates(points(s, d))
        fin(Consolidate.cascade(
          Consolidate.consolidateWithDur(u, 3600, 7200),
          Consolidate.lastUpdateOf(u), 21600, 0.5))
      }): Q,
      Some(consQ(21600, "wmean", 0.5, 7200))),

    // heartbeat-0 Whisper mode: value lands in its own slot, last wins
    ("rrd_whisper",
      ((s, d) => fin(Consolidate.whisperMode(
        Consolidate.updates(points(s, d)), 3600))): Q,
      Some(s"WITH ${Consolidate.updatesSql}, ${Consolidate.whisperSql(3600)}" + tailSql))
  )

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
