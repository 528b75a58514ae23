package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Events

/** Driver-checked queries for the event-stream analytics family
  * ([[graft.pipeline.Events]]): gap sessionization, ordered funnels,
  * semi-structured props extraction — all in integer microsecond time
  * so the DuckDB oracles compare exactly. */
object EvQueries {

  type Q = (SparkSession, String) => DataFrame

  /** One "session day": events gap-split at 24 h. */
  private val GapUs = 86400L * 1000000L

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // gap-based sessionization: per-user 24h-gap sessions with start,
    // size, and exact microsecond duration
    ("ev_sessions",
      ((s: SparkSession, d: String) =>
        Events.sessionize(Tables.events(s, d), GapUs)
          .select(col("user_id").cast("long").as("user_id"),
            col("session_start"), col("n_events"), col("duration_us"))
          .orderBy("user_id", "session_start")): Q,
      Some(
        s"""WITH ${Events.sessionizeSql(GapUs)}
           |SELECT CAST(user_id AS BIGINT) AS user_id, session_start,
           |  n_events, duration_us
           |FROM sessions ORDER BY user_id, session_start""".stripMargin)),

    // bucketized interval join: every 997th event opens a 2h window;
    // each event matches the windows containing it through the
    // 1h-bucket equi-join (BETWEEN stated natively in the oracle)
    ("ev_range_join",
      ((s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val pts = ev.select(col("event_id").cast("long").as("pt_id"),
          unix_micros(col("ts")).as("t"))
        val ivs = ev.filter(col("event_id") % 997 === 0)
          .select(col("event_id").cast("long").as("iv_id"),
            unix_micros(col("ts")).as("t_start"),
            (unix_micros(col("ts")) + 7200000000L).as("t_end"))
        Events.rangeJoin(pts, ivs, widthUs = 3600000000L)
          .orderBy("pt_id", "iv_id")
      }): Q,
      Some(
        s"""WITH pts AS (
           |  SELECT CAST(event_id AS BIGINT) AS pt_id, epoch_us(ts) AS t
           |  FROM events
           |), ivs AS (
           |  SELECT CAST(event_id AS BIGINT) AS iv_id,
           |         epoch_us(ts) AS t_start, epoch_us(ts) + 7200000000 AS t_end
           |  FROM events WHERE event_id % 997 = 0
           |)
           |SELECT pt_id, iv_id, CAST(t AS BIGINT) AS t
           |FROM (${Events.rangeJoinSql})
           |ORDER BY pt_id, iv_id""".stripMargin)),

    // ordered conversion funnel: first view, then a click after it,
    // then a purchase after that — per-stage user counts
    ("ev_funnel",
      ((s, d) => Events.funnel(Tables.events(s, d),
        Seq("view", "click", "purchase"))): Q,
      Some(
        s"""WITH ${Events.funnelSql("view", "click", "purchase")}
           |SELECT n_view, n_click, n_purchase FROM funl""".stripMargin)),

    // four-stage chain through the SAME one-scan plan — pins the
    // N-stage generalization (view → click → signup → purchase)
    ("ev_funnel4",
      ((s, d) => Events.funnel(Tables.events(s, d),
        Seq("view", "click", "signup", "purchase"))): Q,
      Some(
        s"""WITH ${Events.funnelSqlN(Seq("view", "click", "signup", "purchase"))}
           |SELECT n_view, n_click, n_signup, n_purchase FROM funl""".stripMargin)),

    // session trajectories: each 24h-gap session as its ordered
    // event-type token string — the event-log → document-pipeline
    // bridge (the output feeds every documents-shaped operator)
    ("ev_trajectories",
      ((s, d) => Events.trajectories(Tables.events(s, d), GapUs)
        .select(col("user_id").cast("long").as("user_id"),
          col("session_start"), col("n_events"), col("trajectory"))
        .orderBy("user_id", "session_start")): Q,
      Some(
        s"""WITH ${Events.trajectoriesSql(GapUs)}
           |SELECT CAST(user_id AS BIGINT) AS user_id, session_start,
           |  n_events, trajectory
           |FROM traj ORDER BY user_id, session_start""".stripMargin)),

    // retention cohorts: users by first active week × later-activity
    // week offset — the retention triangle
    ("ev_cohorts",
      ((s, d) => Events.cohorts(Tables.events(s, d))
        .select(col("cohort_wk"), col("week_offset"), col("n_users"))
        .orderBy("cohort_wk", "week_offset")): Q,
      Some(
        s"""WITH ${Events.cohortsSql}
           |SELECT cohort_wk, week_offset, n_users
           |FROM coh ORDER BY cohort_wk, week_offset""".stripMargin)),

    // semi-structured props: anchored-regex integer extraction (no
    // JSON engine dependency), aggregated per event type
    ("ev_props_sum",
      ((s, d) => Events.propsInt(Tables.events(s, d), "k")
        .groupBy("event_type")
        .agg(sum(col("k_val")).as("k_sum"),
          count(col("k_val")).as("n_with_k"))
        .orderBy("event_type")): Q,
      Some(
        s"""SELECT event_type,
           |  CAST(sum(kv) AS BIGINT) AS k_sum,
           |  CAST(count(kv) AS BIGINT) AS n_with_k
           |FROM (SELECT event_type, ${Events.propsIntSql("k")} AS kv
           |      FROM events)
           |GROUP BY event_type ORDER BY event_type""".stripMargin))
  )

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
