package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.StatsdAgg
import graft.ts.Round6

/** Driver-checked queries for the StatsD aggregation semantics
  * (SURVEY §2.2, `aggregator/aggregator.go`). Sample stream = events
  * with name=event_type, one hour flush windows (dense enough at every
  * scale factor; the reference's 10 s default is a config knob). */
object StatsdQueries {

  type Q = (SparkSession, String) => DataFrame

  private val W = 3600L

  private def samples(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_type").as("name"),
      unix_timestamp(col("ts")).as("tsSec"),
      col("value"),
      col("event_id").as("seq"))

  private def fin(df: DataFrame): DataFrame =
    df.select(col("name"), col("t").cast("long").as("t"),
        Round6.r6(col("value").cast("double")).as("value"))
      .orderBy(col("name").asc_nulls_first, col("t").asc_nulls_first,
        col("value").asc_nulls_first)

  private val samplesSql =
    """samples AS (
      |  SELECT event_type AS name, CAST(floor(epoch(ts)) AS BIGINT) AS tsSec,
      |         value, event_id AS seq
      |  FROM events
      |)""".stripMargin

  private def q(body: String): String =
    s"WITH $samplesSql, $body" +
      s""" SELECT name, CAST(t AS BIGINT) AS t, ${Round6.r6Sql("CAST(value AS DOUBLE)")} AS value FROM out
         | ORDER BY name NULLS FIRST, t NULLS FIRST, value NULLS FIRST""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(

    ("sd_counter_rate",
      ((s: SparkSession, d: String) =>
        fin(StatsdAgg.counterRate(samples(s, d), W))): Q,
      Some(q(StatsdAgg.counterRateSql(W)))),

    ("sd_gauge_sum",
      ((s, d) => fin(StatsdAgg.gaugeSum(samples(s, d), W))): Q,
      Some(q(StatsdAgg.gaugeSumSql(W)))),

    ("sd_gauge_last",
      ((s, d) => fin(StatsdAgg.gaugeLast(samples(s, d), W))): Q,
      Some(q(StatsdAgg.gaugeLastSql(W)))),

    ("sd_timers",
      ((s, d) => fin(StatsdAgg.timers(samples(s, d), W))): Q,
      Some(q(StatsdAgg.timersSql(W)))),

    // multiple percentile thresholds (statsd `percentThreshold` config)
    ("sd_timers_multi",
      ((s, d) => fin(StatsdAgg.timers(samples(s, d), W, Seq(50, 90, 99)))): Q,
      Some(q(StatsdAgg.timersSql(W, Seq(50, 90, 99)))))
  )

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
