package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rrd.{Archives, Consolidate, Fetch, RraSpec}
import graft.ts.Round6

/** Driver-checked queries for the archive-selection fetch path
  * (SURVEY §3.1): two consolidated archives (1 h and 6 h) built from the
  * same update stream, BestRRA picking by (range, maxPoints), dense-grid
  * densification and maxPoints re-bucketing. The oracle replays the
  * whole chain in SQL with the archive choice (a driver-side planning
  * rule, unit-tested separately) fixed to the expected pick. */
object FetchQueries {

  type Q = (SparkSession, String) => DataFrame

  // events span 2024-01-01 .. 2024-01-31 UTC at every scale factor
  private val T0 = 1704067200L
  private val T1 = 1706659200L
  private val HourSpec = RraSpec(3600L, 744L, T1)   // 31 d retention
  // (744 not 720: a 720-slot span is (T0, T1] — exclusive at T0, so a
  // fetch FROM T0 exactly would fall outside the hi-res archive)
  private val SixHSpec = RraSpec(21600L, 121L, T1)  // ~30.25 d retention
  private val Hb = 30L * 86400                      // no heartbeat gaps

  private def archives(s: SparkSession, d: String): Seq[Fetch.Archive] = {
    def points = Tables.events(s, d).select(
      col("event_type").as("name"), col("ts"), col("value"))
    Seq(
      Fetch.Archive(HourSpec, () =>
        Consolidate.consolidate(Consolidate.updates(points), 3600L, "wmean", 0.0, Hb)),
      Fetch.Archive(SixHSpec, () =>
        Consolidate.consolidate(Consolidate.updates(points), 21600L, "wmean", 0.0, Hb)))
  }

  private def fin(df: DataFrame): DataFrame =
    df.select(col("name"), col("t").cast("long").as("t"),
        Round6.r6(col("value").cast("double")).as("value"))
      .orderBy(col("name").asc_nulls_first, col("t").asc_nulls_first,
        col("value").asc_nulls_first)

  private val tail =
    s""" SELECT name, CAST(t AS BIGINT) AS t, ${Round6.r6Sql("CAST(value AS DOUBLE)")} AS value FROM res
       | ORDER BY name NULLS FIRST, t NULLS FIRST, value NULLS FIRST""".stripMargin

  /** Oracle: consolidate at `archStep` (the expected BestRRA pick),
    * then fetch with the given bucket. */
  private def oracleFor(archStep: Long, from: Long, to: Long,
      bucket: Long): String =
    s"WITH ${Consolidate.updatesSql}, " +
      s"${Consolidate.consolidateSql(archStep, "wmean", 0.0, Hb)}, " +
      "arch AS (SELECT * FROM out), " +
      Fetch.fetchSql(from, to, archStep, bucket) + tail

  private def q(from: Long, to: Long, maxPoints: Long): Q =
    (s, d) => fin(Fetch.fetchSeries(s, archives(s, d), from, to, maxPoints))

  val entries: Seq[(String, Q, Option[String])] = {
    // 3-day viewport, 1000 points → 1 h archive, native bucket
    val (f1, t1, mp1) = (T0, T0 + 3 * 86400, 1000L)
    // full range, 50 points → 6 h archive (closest step), 18 h bucket
    val (f2, t2, mp2) = (T0, T1, 50L)
    // sanity-pin the planning rule the oracles assume
    require(Archives.bestRra(Seq(HourSpec, SixHSpec), f1, t1, mp1)
      .contains(HourSpec))
    require(Archives.bestRra(Seq(HourSpec, SixHSpec), f2, t2, mp2)
      .contains(SixHSpec))
    val b1 = Fetch.groupByStep(f1, t1, mp1, 3600L)
    val b2 = Fetch.groupByStep(f2, t2, mp2, 21600L)

    Seq(
      ("fetch_hires", q(f1, t1, mp1), Some(oracleFor(3600L, f1, t1, b1))),
      ("fetch_lores", q(f2, t2, mp2), Some(oracleFor(21600L, f2, t2, b2))))
  }

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
