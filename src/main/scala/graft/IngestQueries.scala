package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{Find, Ingest, Pickle}
import graft.ts.{SeriesModel => M, Round6}

/** Driver-checked queries for the ingest parsers and metadata finders.
  * Wire lines are synthesized from the events table with integer-only
  * value formatting (no cross-engine float-printf hazard), pushed
  * through the parser expressions, and re-aggregated — proving the
  * parse path against SQL oracles that replay the same construction. */
object IngestQueries {

  type Q = (SparkSession, String) => DataFrame

  private def fin(df: DataFrame): DataFrame =
    df.select(col("name"), col("t").cast("long").as("t"),
        Round6.r6(col("value").cast("double")).as("value"))
      .orderBy(col("name").asc_nulls_first, col("t").asc_nulls_first,
        col("value").asc_nulls_first)

  private val tail =
    s""" SELECT name, CAST(t AS BIGINT) AS t, ${Round6.r6Sql("CAST(value AS DOUBLE)")} AS value FROM out
       | ORDER BY name NULLS FIRST, t NULLS FIRST, value NULLS FIRST""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // graphite wire → parse (incl. sanitize) → whisper slots
    ("ig_graphite_parse",
      ((s: SparkSession, d: String) => {
        val lines = Tables.events(s, d).select(concat(
          // dirty name exercises SanitizeName: space→_, /→-, strip $
          lit("ev/"), col("event_type"), lit("$x "),
          round(col("value") * 100).cast("long").cast("string"), lit(" "),
          unix_timestamp(col("ts")).cast("string")).as("line"))
        val pts = Ingest.parseGraphite(lines, lit(0L))
        fin(pts
          .groupBy(col("name"),
            (floor(col("tsSec").cast("double") / 3600).cast("long") * 3600).as("t"))
          .agg((sum(col("value")) / 100.0 / count(lit(1))).as("value")))
      }): Q,
      Some(
        s"""WITH lines AS (
           |  SELECT 'ev/' || event_type || '$$x' AS rawname,
           |         CAST(round(value * 100) AS BIGINT) AS cents,
           |         CAST(floor(epoch(ts)) AS BIGINT) AS tsec
           |  FROM events
           |), parsed AS (
           |  SELECT regexp_replace(regexp_replace(regexp_replace(rawname,
           |           '\\s+', '_', 'g'), '/', '-', 'g'),
           |           '[^a-zA-Z_\\-0-9\\.]', '', 'g') AS name,
           |         CAST(cents AS DOUBLE) AS value, tsec
           |  FROM lines
           |), out AS (
           |  SELECT name, CAST(floor(tsec / 3600) AS BIGINT) * 3600 AS t,
           |         sum(value) / 100.0 / count(*) AS value
           |  FROM parsed GROUP BY 1, 2
           |)""".stripMargin + tail)),

    // statsd wire (mixed counter/timer packets with @sample) → parse →
    // per-kind aggregation
    ("ig_statsd_parse",
      ((s, d) => {
        val ev = Tables.events(s, d)
        val lines = ev.select(
          when(col("event_id") % 2 === 0,
            concat(col("event_type"), lit(":"),
              round(col("value") * 100).cast("long").cast("string"), lit("|c")))
          .otherwise(
            concat(col("event_type"), lit(":"),
              round(col("value") * 100).cast("long").cast("string"),
              lit("|ms|@0.5"))).as("line"))
        val parsed = Ingest.parseStatsd(lines)
        parsed.groupBy(col("name"), col("metric"))
          .agg(count(lit(1)).cast("long").as("n"),
            Round6.r6(sum(col("value")) / 100.0).as("sum_value"),
            Round6.r6(avg(col("sample"))).as("avg_sample"))
          .orderBy("name", "metric")
      }): Q,
      Some(
        s"""WITH parsed AS (
           |  SELECT event_type AS name,
           |         CASE WHEN event_id % 2 = 0 THEN 'c' ELSE 'ms' END AS metric,
           |         CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS value,
           |         CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE 0.5 END AS sample
           |  FROM events
           |)
           |SELECT name, metric, CAST(count(*) AS BIGINT) AS n,
           |       ${Round6.r6Sql("sum(value) / 100.0")} AS sum_value,
           |       ${Round6.r6Sql("avg(sample)")} AS avg_sample
           |FROM parsed GROUP BY 1, 2 ORDER BY name, metric""".stripMargin)),

    // carbon pickle wire → frame per partition chunk (encoded on the
    // executors) → decode → hourly re-aggregation. Integer-cent values
    // ride BINFLOAT exactly; names are NOT sanitized — the pickle path
    // queues them raw (daemon/graphite_pickle.go:186), unlike text
    ("ig_pickle_parse",
      ((s: SparkSession, d: String) => {
        import s.implicits._
        val pts = Tables.events(s, d).select(
            concat(lit("pk."), col("event_type")).as("name"),
            unix_timestamp(col("ts")).as("tsSec"),
            round(col("value") * 100).cast("double").as("value"))
          .as[(String, Long, Double)]
        val frames = pts.mapPartitions(_.grouped(100).map(chunk =>
          Pickle.encodeFrame(chunk.map(p => Pickle.Point(p._1, p._2, p._3)))))
        val decoded = frames.flatMap(Pickle.decodeFrames(_)).toDF()
        fin(decoded
          .groupBy(col("name"),
            (floor(col("tsSec").cast("double") / 3600).cast("long") * 3600).as("t"))
          .agg((sum(col("value")) / 100.0 / count(lit(1))).as("value")))
      }): Q,
      Some(
        s"""WITH pts AS (
           |  SELECT 'pk.' || event_type AS name,
           |         CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
           |         CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS value
           |  FROM events
           |), out AS (
           |  SELECT name, CAST(floor(tsec / 3600) AS BIGINT) * 3600 AS t,
           |         sum(value) / 100.0 / count(*) AS value
           |  FROM pts GROUP BY 1, 2
           |)""".stripMargin + tail)),

    // /metrics/find glob tree walk over the multi-node catalog
    ("fd_find_nodes",
      ((s, d) => Find.findNodes(
        M.multi(s, d).select("name").distinct(), "events.*")
        .orderBy("node")): Q,
      Some(M.multiSql() + s" ${Find.findNodesSql("events.*")} ORDER BY node")),

    // series search by regex with point counts
    ("fd_search",
      ((s, d) => Find.search(M.multi(s, d), "\\.u[01]$")
        .orderBy("name")): Q,
      Some(M.multiSql() +
        """ SELECT name, CAST(count(*) AS BIGINT) AS n_points
          | FROM series WHERE regexp_matches(name, '\.u[01]$')
          | GROUP BY name ORDER BY name""".stripMargin))
  )

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
