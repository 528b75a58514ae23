package graft.rrd

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's query-side fetch path (`serde/dbseries.go:96-153`,
  * SURVEY §3.1 step 5): pick the best archive for (from, to, maxPoints)
  * via [[Archives.bestRra]], scan it over the time range, densify onto
  * the archive's grid, and re-bucket to ≤ maxPoints by average
  * (the "resolution pushdown" — consolidation happens at the scan, not
  * in the client).
  *
  * Scale: archive choice is a driver-side rule over the tiny catalog;
  * the chosen-archive scan carries a pushed time-range predicate
  * (partition pruning on a date-partitioned lake); the re-bucket is one
  * map-side-combinable aggregate whose output is ≤ series × maxPoints.
  */
object Fetch {

  /** An archive = its spec + a loader for its consolidated frame
    * `(name, t, value)`. */
  final case class Archive(spec: RraSpec, frame: () => DataFrame)

  /** groupBy step: ceil of span/maxPoints, floored at the archive step
    * and rounded up to a multiple of it (`serde/dbseries.go:104-127`). */
  def groupByStep(fromSec: Long, toSec: Long, maxPoints: Long,
      archStep: Long): Long = {
    if (maxPoints <= 0) return archStep
    val raw = math.max((toSec - fromSec).toDouble / maxPoints, archStep.toDouble)
    (math.ceil(raw / archStep) * archStep).toLong
  }

  /** Fetch: archive selection + range scan + dense grid + re-bucket.
    *
    * @param keepGaps when true, empty buckets stay as NULL-valued grid
    *        rows — the reference's exact shape (its LEFT JOIN emits a
    *        row per grid slot and the iterator reads NaN,
    *        `serde/dbseries.go:199-213`), which downstream gap-aware
    *        functions (transformNull, keepLastValue, …) need to see.
    *        The default drops them — the engine's sparse canonical
    *        convention (gap = absent row), which every operator also
    *        supports and the fetch oracles pin. */
  def fetchSeries(spark: SparkSession, archives: Seq[Archive],
      fromSec: Long, toSec: Long, maxPoints: Long,
      keepGaps: Boolean = false): DataFrame = {
    val arch = Archives.bestRra(archives.map(_.spec), fromSec, toSec, maxPoints)
      .getOrElse(throw new IllegalArgumentException("no archives"))
    val loader = archives.find(_.spec == arch).get
    val step = arch.stepSec
    val bucket = groupByStep(fromSec, toSec, maxPoints, step)

    // range predicate reaches the scan (partition pruning at scale)
    val scan = loader.frame()
      .filter(col("t") >= fromSec && col("t") <= toSec)

    // dense grid per series over the viewport, left-join actual slots —
    // `generate_series LEFT OUTER JOIN tv` (`serde/postgres.go:169-173`)
    val lo = math.floorDiv(fromSec, step) * step
    val grid = spark.range(lo, toSec + 1, step).select(col("id").as("t"))
    val names = scan.select("name").distinct()
    val dense = grid.crossJoin(broadcast(names))
      .join(scan, Seq("name", "t"), "left")

    // re-bucket to ≤ maxPoints by average (NULL slots don't contribute)
    val bucketed = dense.groupBy(col("name"),
        (floor(col("t").cast("double") / bucket).cast("long") * bucket).as("t"))
      .agg(avg(col("value")).as("value"))
    if (keepGaps) bucketed else bucketed.filter(col("value").isNotNull)
  }

  /** SQL mirror: fetch from a CTE `arch(name, t, value)` (the chosen
    * archive's frame — archive CHOICE is a driver-side rule, so the
    * oracle takes it as given). */
  def fetchSql(fromSec: Long, toSec: Long, stepSec: Long, bucket: Long,
      outName: String = "res"): String = {
    val lo = math.floorDiv(fromSec, stepSec) * stepSec
    s"""scan AS (
       |  SELECT name, t, value FROM arch WHERE t >= $fromSec AND t <= $toSec
       |), grid AS (
       |  SELECT unnest(generate_series($lo, $toSec, $stepSec)) AS t
       |), names AS (SELECT DISTINCT name FROM scan),
       |dense AS (
       |  SELECT n.name, g.t, s.value
       |  FROM grid g CROSS JOIN names n
       |  LEFT JOIN scan s ON s.name = n.name AND s.t = g.t
       |), $outName AS (
       |  SELECT name, CAST(floor(t / $bucket.0) AS BIGINT) * $bucket AS t,
       |         avg(value) AS value
       |  FROM dense GROUP BY 1, 2 HAVING avg(value) IS NOT NULL
       |)""".stripMargin
  }
}
