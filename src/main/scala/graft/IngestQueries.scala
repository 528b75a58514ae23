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

    // whisper backfill import: per-series two-archive .wsp images built
    // from events on the executors (fine hourly ring of 168 slots,
    // coarse daily ring of 60, empty slots zero-padded), then decoded by
    // the import path. The oracle replays the extraction arithmetic
    // (process.go:355-400): +step slot-end shift, newest-fine-point
    // drop, and the coarse archive clipped to pre-fine history
    ("ig_whisper_import",
      ((s: SparkSession, d: String) => {
        import s.implicits._
        import graft.sources.Whisper
        val base = Tables.events(s, d).select(
          col("event_type").as("name"),
          unix_timestamp(col("ts")).as("tsec"),
          round(col("value") * 100).cast("double").as("cents"))
        def slots(stepSec: Long, aix: Int) = base
          .groupBy(col("name"),
            (floor(col("tsec").cast("double") / stepSec).cast("long") * stepSec).as("t0"))
          .agg((sum(col("cents")) / 100.0 / count(lit(1))).as("v"))
          .select(col("name"), lit(aix).as("aix"), col("t0"), col("v"))
        val rings = Seq((3600L, 168), (86400L, 60))
        val rows = slots(3600L, 0).unionByName(slots(86400L, 1))
          .as[(String, Int, Long, Double)]
          .groupByKey(_._1)
          .flatMapGroups { (name, it) =>
            val pts = it.toArray
            val archives = rings.zipWithIndex.map { case ((step, size), aix) =>
              val sel = pts.filter(_._2 == aix).map(p => Whisper.Point(p._3, p._4))
              val mx = sel.map(_.tsSec).max
              val kept = sel.filter(_.tsSec > mx - size * step) // ring keeps last `size`
              step -> (kept ++ Array.fill(size - kept.length)(Whisper.Point(0L, 0.0))).toSeq
            }
            Whisper.extractPoints(Whisper.encode(1, 0.5f, archives))
              .map(p => (name, p.tsSec, p.value))
          }
        fin(rows.toDF("name", "t", "value"))
      }): Q,
      Some(
        s"""WITH base AS (
           |  SELECT event_type AS name, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
           |         CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS cents
           |  FROM events
           |), hourly AS (
           |  SELECT name, CAST(floor(tsec / 3600) AS BIGINT) * 3600 AS t0,
           |         sum(cents) / 100.0 / count(*) AS v
           |  FROM base GROUP BY 1, 2
           |), daily AS (
           |  SELECT name, CAST(floor(tsec / 86400) AS BIGINT) * 86400 AS t0,
           |         sum(cents) / 100.0 / count(*) AS v
           |  FROM base GROUP BY 1, 2
           |), hmax AS (SELECT name, max(t0) AS hm FROM hourly GROUP BY name),
           |dmax AS (SELECT name, max(t0) AS dm FROM daily GROUP BY name),
           |fine_out AS (
           |  SELECT h.name, h.t0 + 3600 AS t, h.v AS value
           |  FROM hourly h JOIN hmax m USING (name)
           |  WHERE h.t0 > m.hm - ${168 * 3600} AND h.t0 < m.hm
           |), coarse_out AS (
           |  SELECT dy.name, dy.t0 + 86400 AS t, dy.v AS value
           |  FROM daily dy JOIN dmax m USING (name) JOIN hmax hm2 USING (name)
           |  WHERE dy.t0 > m.dm - ${60 * 86400}
           |    AND dy.t0 + 86400 < hm2.hm + 3600 - ${168 * 3600}
           |), out AS (
           |  SELECT * FROM fine_out UNION ALL SELECT * FROM coarse_out
           |)""".stripMargin + tail)),

    // pixel endpoints: both engines synthesize the SAME request URLs
    // (integer-only value/ts text), then parse them independently —
    // Spark via Pixel.parseRequests column expressions, DuckDB via its
    // own split/regexp restatement of the Sscanf grammar
    ("ig_pixel_parse",
      ((s: SparkSession, d: String) => {
        import graft.streaming.Pixel
        val ev = Tables.events(s, d)
        val cents = round(col("value") * 100).cast("long").cast("string")
        val tsec = unix_timestamp(col("ts")).cast("string")
        val base = concat(lit("px/"), col("event_type"), lit("$z="), cents)
        val m4 = col("event_id") % 4
        val url =
          when(m4 === 0, concat(lit("/pixel?"), base, lit("@"), tsec,
            when(col("event_id") % 20 === 0, lit("&extra.m=5e-1@100"))
              .otherwise(lit(""))))
          .when(m4 === 1, concat(lit("/pixel?"), base,
            when(col("event_id") % 7 === 0, lit("&bad=@9")).otherwise(lit(""))))
          .when(m4 === 2, concat(lit("/pixel/add?"), base))
          .otherwise(concat(lit("/pixel/append?"), base))
        Pixel.parseRequests(ev.select(url.as("url")), lit(1700000000L))
          .groupBy(col("kind"), col("name"))
          .agg(count(lit(1)).cast("long").as("n"),
            Round6.r6(sum(col("value"))).as("sum_value"),
            sum(coalesce(col("tsSec"), lit(0L))).cast("long").as("sum_t"))
          .orderBy("kind", "name")
      }): Q,
      Some {
        val f = graft.streaming.Pixel.floatReSql
        s"""WITH ev AS (
           |  SELECT event_id, event_type,
           |         CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) AS cents,
           |         CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) AS tsec
           |  FROM events
           |), urls AS (
           |  SELECT CASE
           |    WHEN event_id % 4 = 0 THEN '/pixel?px/' || event_type || '$$z=' || cents || '@' || tsec
           |      || CASE WHEN event_id % 20 = 0 THEN '&extra.m=5e-1@100' ELSE '' END
           |    WHEN event_id % 4 = 1 THEN '/pixel?px/' || event_type || '$$z=' || cents
           |      || CASE WHEN event_id % 7 = 0 THEN '&bad=@9' ELSE '' END
           |    WHEN event_id % 4 = 2 THEN '/pixel/add?px/' || event_type || '$$z=' || cents
           |    ELSE '/pixel/append?px/' || event_type || '$$z=' || cents
           |  END AS url FROM ev
           |), pairs AS (
           |  SELECT CASE split_part(url, '?', 1)
           |           WHEN '/pixel' THEN 'dp' WHEN '/pixel/add' THEN 'add'
           |           WHEN '/pixel/addgauge' THEN 'addgauge'
           |           WHEN '/pixel/setgauge' THEN 'setgauge'
           |           WHEN '/pixel/append' THEN 'append' END AS kind,
           |         unnest(string_split(split_part(url, '?', 2), '&')) AS pair
           |  FROM urls
           |), scanned AS (
           |  SELECT kind,
           |         regexp_replace(regexp_replace(regexp_replace(
           |           split_part(pair, '=', 1),
           |           '\\s+', '_', 'g'), '/', '-', 'g'),
           |           '[^a-zA-Z_\\-0-9\\.]', '', 'g') AS name,
           |         try_cast(regexp_extract(split_part(pair, '=', 2),
           |           '^\\s*($f)', 1) AS DOUBLE) AS value,
           |         try_cast(regexp_extract(split_part(pair, '=', 2),
           |           '^\\s*$f@\\s*($f)', 1) AS DOUBLE) AS ut
           |  FROM pairs WHERE kind IS NOT NULL AND pair <> ''
           |), rows_ AS (
           |  SELECT kind, name, value,
           |         CASE WHEN kind = 'dp' THEN
           |           CASE WHEN coalesce(ut, 0) = 0 THEN 1700000000
           |                ELSE CAST(floor(ut) AS BIGINT) END
           |         END AS ts
           |  FROM scanned WHERE value IS NOT NULL
           |)
           |SELECT kind, name, CAST(count(*) AS BIGINT) AS n,
           |       ${Round6.r6Sql("sum(value)")} AS sum_value,
           |       CAST(sum(coalesce(ts, 0)) AS BIGINT) AS sum_t
           |FROM rows_ GROUP BY 1, 2 ORDER BY kind, name""".stripMargin
      }),

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
          | GROUP BY name ORDER BY name""".stripMargin)),

    // tag-map ident search (serde/postgres.go:602-621): ident carries
    // name + type/bucket tags parsed off the dotted name; the query is
    // {tag -> regex}, key-presence AND case-insensitive value match
    // (the UPPERCASE 'CLICK|ERROR' pattern only matches because of ~*
    // semantics). Output idents render in Ident.String() form.
    ("fd_search_tag",
      ((s, d) => Find.searchTags(
        Find.identify(M.multi(s, d),
          "type" -> element_at(split(col("name"), "\\."), 2),
          "bucket" -> element_at(split(col("name"), "\\."), 3)),
        Map("type" -> "^(CLICK|ERROR)$", "bucket" -> "u[01]"))
        .orderBy("ident")): Q,
      Some(M.multiSql() +
        """ SELECT '{"bucket": "' || ps[3] || '","name": "' || name
          |   || '","type": "' || ps[2] || '"}' AS ident,
          |   CAST(count(*) AS BIGINT) AS n_points
          | FROM (SELECT name, string_split(name, '.') AS ps FROM series)
          | WHERE regexp_matches(ps[2], '^(CLICK|ERROR)$', 'i')
          |   AND regexp_matches(ps[3], 'u[01]', 'i')
          | GROUP BY 1 ORDER BY ident""".stripMargin)),

    // tag-KEY autocomplete (`/tags/autoComplete/tags` contract): the
    // planted `err` tag exists only on ERROR-type series, so presence
    // is data-dependent, not schema-determined
    ("fd_tag_keys",
      ((s, d) => Find.tagKeys(
        Find.identify(M.multi(s, d),
          "type" -> element_at(split(col("name"), "\\."), 2),
          "bucket" -> element_at(split(col("name"), "\\."), 3),
          "err" -> when(element_at(split(col("name"), "\\."), 2) === "error",
            lit("1"))))): Q,
      Some(M.multiSql() +
        """ SELECT tag FROM (
          |   SELECT DISTINCT unnest(['bucket', 'name', 'type']) AS tag
          |   FROM series
          |   UNION
          |   SELECT DISTINCT 'err' AS tag FROM series
          |   WHERE string_split(name, '.')[2] = 'error'
          | ) ORDER BY tag LIMIT 100""".stripMargin)),

    // tag-VALUE autocomplete (`/tags/autoComplete/values`): distinct
    // `type` values under a prefix, sorted and capped
    ("fd_tag_values",
      ((s, d) => Find.tagValues(
        Find.identify(M.multi(s, d),
          "type" -> element_at(split(col("name"), "\\."), 2),
          "bucket" -> element_at(split(col("name"), "\\."), 3)),
        "type", prefix = "c")): Q,
      Some(M.multiSql() +
        """ SELECT DISTINCT string_split(name, '.')[2] AS value
          | FROM series
          | WHERE starts_with(string_split(name, '.')[2], 'c')
          | ORDER BY value LIMIT 100""".stripMargin)),

    // graphite 1.1 tagged paths end-to-end: wire lines carry tags in
    // NON-canonical order with a char sanitize must rewrite (`u/N`),
    // parseGraphite canonicalizes (`;dc=u-N;env=prod`), identFromName
    // recovers the tag map, searchTags answers a tag-regex query — the
    // oracle replays the whole chain as string construction
    ("fd_tagged_parse",
      ((s, d) => {
        val lines = Tables.events(s, d).select(concat(
          lit("ev."), col("event_type"), lit(";env=prod;dc=u/"),
          pmod(col("user_id"), lit(3)).cast("string"), lit(" "),
          round(col("value") * 100).cast("long").cast("string"), lit(" "),
          unix_timestamp(col("ts")).cast("string")).as("line"))
        val pts = Ingest.parseGraphite(lines, lit(0L))
        Find.searchTags(
          pts.withColumn("ident", Find.identFromName(col("name"))),
          Map("dc" -> "^u-[01]$"))
          .orderBy("ident")
      }): Q,
      Some(
        """SELECT '{"dc": "u-' || CAST(user_id % 3 AS VARCHAR)
          |    || '","env": "prod","name": "ev.' || event_type || '"}' AS ident,
          |  CAST(count(*) AS BIGINT) AS n_points
          |FROM events WHERE user_id % 3 IN (0, 1)
          |GROUP BY 1 ORDER BY ident""".stripMargin))
  )

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
