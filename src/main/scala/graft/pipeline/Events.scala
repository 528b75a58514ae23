package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table — the interaction
  * half of a training-data platform (session traces and funnels are
  * themselves training corpora for agent/recommendation models, and
  * the same gap-sessionization prepares "user trajectory" documents).
  *
  * Everything is micro-second integer time (`unix_micros` ↔ DuckDB
  * `epoch_us`) so the oracles compare exactly, with one shuffle by
  * `user_id` per operator — the partitioning a 100 TB event log is
  * already bucketed by.
  *
  * Reference scope: tgres has no event-log surface; this implements
  * the survey's pipeline extension (SURVEY.md §2 extension table).
  */
object Events {

  /** Gap-based sessionization: a new session starts when a user's gap
    * since their previous event exceeds `gapUs`. The classic
    * two-window form (break flag via `lag`, session id via running
    * sum) — both windows share ONE (user_id, t) sort in one shuffle,
    * Catalyst collapses them into a single Window node. Returns
    * (user_id, session_start, n_events, duration_us). */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    require(gapUs > 0, "gapUs must be positive")
    val w = Window.partitionBy("user_id").orderBy("t")
    events.select(col("user_id"), unix_micros(col("ts")).as("t"))
      .withColumn("brk",
        when(col("t") - lag(col("t"), 1).over(w) > gapUs || lag(col("t"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("t")).as("session_start"),
        count(lit(1)).as("n_events"),
        (max(col("t")) - min(col("t"))).as("duration_us"))
      .select("user_id", "session_start", "n_events", "duration_us")
  }

  /** DuckDB twin of [[sessionize]]; defines `sessions(user_id,
    * session_start, n_events, duration_us)`. */
  def sessionizeSql(gapUs: Long): String =
    s"""evt AS (SELECT user_id, epoch_us(ts) AS t FROM events),
       |brks AS (
       |  SELECT user_id, t,
       |    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > $gapUs
       |         OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
       |         THEN 1 ELSE 0 END AS brk
       |  FROM evt
       |), sids AS (
       |  SELECT user_id, t,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY t) AS sid
       |  FROM brks
       |), sessions AS (
       |  SELECT user_id, min(t) AS session_start,
       |    CAST(count(*) AS BIGINT) AS n_events,
       |    max(t) - min(t) AS duration_us
       |  FROM sids GROUP BY user_id, sid
       |)""".stripMargin

  /** Ordered conversion funnel: users whose first `stages(i+1)` event
    * happens strictly AFTER their qualifying `stages(i)` event.
    * Returns one row of per-stage user counts (`n_<stage>`).
    *
    * ONE event-log scan (an N-stage funnel over a 100 TB log must not
    * pay N passes): the pushed `event_type IN stages` filter prunes
    * the scan, one user_id shuffle aggregates each user's PER-STAGE
    * sorted event-time arrays, and the qualification chain — "first
    * stage-i time strictly after the stage-(i-1) qualifying time" —
    * evaluates as array expressions over that users-sized frame.
    * Sorted FULL per-stage time lists are required, not per-stage
    * minima: a user with `b` before their first `a` and another `b`
    * after it converts, which min(b) alone would miss. Per-user state
    * is their own stage-event times — the same per-user bound
    * sessionization already carries. */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnel needs at least 2 stages")
    val e = events.filter(col("event_type").isInCollection(stages))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    // collect_list skips the nulls the when() leaves for other stages
    val perStage = stages.zipWithIndex.map { case (st, i) =>
      sort_array(collect_list(when(col("event_type") === st, col("t"))))
        .as(s"__ts$i") }
    val users = e.groupBy("user_id").agg(perStage.head, perStage.tail: _*)
    // qualifying-time chain: tq(0) = first stage-0 time; tq(i) = first
    // stage-i time > tq(i-1). get() is null out-of-bounds, and a null
    // tq(i-1) nulls the whole tail (x > null filters everything out)
    val tqs = stages.indices.foldLeft(List.empty[Column]) { (acc, i) =>
      val tq =
        if (i == 0) get(col("__ts0"), lit(0))
        else {
          val prev = acc.head
          get(filter(col(s"__ts$i"), x => x > prev), lit(0))
        }
      tq :: acc
    }.reverse
    val counts = stages.zipWithIndex.map { case (st, i) =>
      count(tqs(i)).as(s"n_$st") }
    users.agg(counts.head, counts.tail: _*)
  }

  /** DuckDB twin of [[funnel]] for three stages. */
  def funnelSql(a: String, b: String, c: String): String =
    funnelSqlN(Seq(a, b, c))

  /** DuckDB twin of [[funnel]] for ANY stage chain: the sequential
    * per-stage qualification as a CTE chain (the Spark side collapses
    * it to one scan; the oracle states the semantics, not the plan).
    * Defines `funl(n_<stage>…)`. Stage names are validated like props
    * keys — they are interpolated into SQL string literals. */
  def funnelSqlN(stages: Seq[String]): String = {
    require(stages.size >= 2, "funnel needs at least 2 stages")
    stages.foreach(st => require(st.matches("[A-Za-z0-9_]+"),
      s"funnel stage must match [A-Za-z0-9_]+ (got '$st')"))
    val head =
      s"""s1 AS (SELECT user_id, min(t) AS tq FROM evtN
         |       WHERE event_type = '${stages.head}' GROUP BY user_id)""".stripMargin
    val rest = stages.tail.zipWithIndex.map { case (st, i) =>
      val p = i + 1
      s"""s${p + 1} AS (SELECT e.user_id, min(e.t) AS tq FROM evtN e
         |       JOIN s$p ON s$p.user_id = e.user_id
         |       WHERE e.event_type = '$st' AND e.t > s$p.tq GROUP BY e.user_id)""".stripMargin
    }
    val counts = stages.zipWithIndex.map { case (st, i) =>
      s"(SELECT CAST(count(*) AS BIGINT) FROM s${i + 1}) AS n_$st"
    }.mkString(",\n         ")
    s"""evtN AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
       |$head,
       |${rest.mkString(",\n")},
       |funl AS (
       |  SELECT $counts
       |)""".stripMargin
  }

  /** Semi-structured props extraction WITHOUT a JSON engine
    * dependency: pull integer key `key` out of the one-level JSON
    * `props` string by anchored regex — identical semantics on both
    * engines, codegen'd on Spark. Returns the input plus `<key>_val`
    * (null when absent/non-integer). Keys are restricted to
    * `[A-Za-z0-9_]+`: the key is interpolated into a regex on both
    * engines and a SQL string literal on one, so a metacharacter or
    * quote would silently change match semantics — identifier-shaped
    * keys need no escaping anywhere. */
  def propsInt(events: DataFrame, key: String): DataFrame = {
    requirePropsKey(key)
    events.withColumn(s"${key}_val",
      nullif(regexp_extract(col("props"),
        "\"" + key + "\": (-?\\d+)", 1), lit("")).cast("long"))
  }

  /** The matching DuckDB expression for [[propsInt]]'s column. */
  def propsIntSql(key: String): String = {
    requirePropsKey(key)
    s"""CAST(nullif(regexp_extract(props, '"$key": (-?\\d+)', 1), '') AS BIGINT)"""
  }

  private def requirePropsKey(key: String): Unit =
    require(key.matches("[A-Za-z0-9_]+"),
      s"props key must match [A-Za-z0-9_]+ (got '$key'): it is " +
        "interpolated into regex and SQL literals verbatim")

  /** Session TRAJECTORIES: each gap-session rendered as its ordered
    * event-type token string — the bridge from the event log to the
    * document pipeline (interaction traces ARE training corpora for
    * agent/recommendation models, and the output feeds every
    * `documents`-shaped operator: dedup, quality, packing). Same
    * two-window sessionization as [[sessionize]], then one
    * reassembly aggregate; ties at equal timestamps break by
    * event_id, so the text is deterministic cross-engine. Returns
    * (user_id, session_start, n_events, trajectory). */
  def trajectories(events: DataFrame, gapUs: Long): DataFrame = {
    require(gapUs > 0, "gapUs must be positive")
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    events.select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .withColumn("brk",
        when(col("t") - lag(col("t"), 1).over(w) > gapUs ||
          lag(col("t"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("t")).as("session_start"),
        count(lit(1)).as("n_events"),
        concat_ws(" ", array_sort(collect_list(
          struct(col("t"), col("event_id"), col("event_type"))))
          .getField("event_type")).as("trajectory"))
      .select("user_id", "session_start", "n_events", "trajectory")
  }

  /** DuckDB twin of [[trajectories]]; defines `traj(user_id,
    * session_start, n_events, trajectory)`. */
  def trajectoriesSql(gapUs: Long): String =
    s"""evtt AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t
       |         FROM events),
       |brkt AS (
       |  SELECT user_id, event_id, event_type, t,
       |    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > $gapUs
       |         OR lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
       |         THEN 1 ELSE 0 END AS brk
       |  FROM evtt
       |), sidt AS (
       |  SELECT user_id, event_id, event_type, t,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id) AS sid
       |  FROM brkt
       |), traj AS (
       |  SELECT user_id, min(t) AS session_start,
       |    CAST(count(*) AS BIGINT) AS n_events,
       |    string_agg(event_type, ' ' ORDER BY t, event_id) AS trajectory
       |  FROM sidt GROUP BY user_id, sid
       |)""".stripMargin

  /** Microseconds per week — the cohort grain. */
  val WeekUs: Long = 7L * 86400L * 1000000L

  /** Retention cohorts: users grouped by their FIRST active week,
    * counted per (cohort week, week offset) of later activity — the
    * retention triangle. Two aggregates over the distinct
    * (user, week) frame (its cardinality is bounded by users×weeks,
    * far under the event count), first-week joined back user-keyed.
    * Integer floor-div week indexing (`div` ↔ DuckDB `//`), exact
    * cross-engine. */
  def cohorts(events: DataFrame): DataFrame = {
    val uw = events.select(col("user_id"),
      expr(s"unix_micros(ts) div $WeekUs").as("wk")).distinct()
    val first = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    uw.join(first, "user_id")
      .groupBy(col("cohort_wk"),
        (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** DuckDB twin of [[cohorts]]; defines `coh(cohort_wk, week_offset,
    * n_users)`. */
  def cohortsSql: String =
    s"""uw AS (SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS wk
       |       FROM events),
       |fw AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id),
       |coh AS (
       |  SELECT cohort_wk, wk - cohort_wk AS week_offset,
       |    CAST(count(*) AS BIGINT) AS n_users
       |  FROM uw JOIN fw USING (user_id)
       |  GROUP BY cohort_wk, wk - cohort_wk
       |)""".stripMargin

  // ---- interval (range) join ----

  /** Exact bucket index for a non-negative integer time: `t div
    * width` computed through pmod so the double division is of an
    * exact multiple (exact for any epoch-micros value — both factors
    * and the quotient sit under 2⁵³). */
  private def bucketOf(t: Column, widthUs: Long): Column =
    ((t - pmod(t, lit(widthUs))) / widthUs).cast("long")

  /** Bucketized interval join — "which intervals contain each point"
    * WITHOUT a non-equi join. Spark plans `t BETWEEN s AND e` as a
    * BroadcastNestedLoopJoin (or a cartesian): every point is tested
    * against every interval, O(N·M) however big the log. Bucketizing
    * restores an equi-join: each interval explodes into the
    * `widthUs`-sized time buckets it overlaps, each point maps to its
    * ONE bucket, and the bucket equi-join + exact containment filter
    * emits each matching (point, interval) pair exactly once — a
    * point lives in one bucket and an interval covers that bucket at
    * most once, so no dedup pass exists to pay for.
    *
    * Containment is INCLUSIVE on both ends (SQL `BETWEEN`). Time
    * columns are non-negative integer micros ([[sessionize]]'s
    * convention). Interval-side blowup is span/widthUs rows per
    * interval — pick widthUs near the typical span so the explode
    * stays ~2× and the join shuffle carries (bucket, ids) only; at
    * 100 TB both sides shuffle once on the uniform bucket key
    * (time-skew within a bucket is bounded by the width itself).
    * For an interval table that fits a broadcast, skip the machinery:
    * [[rangeJoinBroadcast]] is the better plan below ~10 MB.
    * Returns (pt_id, iv_id, t). */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      widthUs: Long): DataFrame = {
    require(widthUs > 0, "bucket width must be positive")
    val pts = points.select(col("pt_id"), col("t"),
      bucketOf(col("t"), widthUs).as("bucket"))
    val ivs = intervals.select(col("iv_id"), col("t_start"), col("t_end"),
        explode(sequence(bucketOf(col("t_start"), widthUs),
          bucketOf(col("t_end"), widthUs))).as("bucket"))
    pts.join(ivs, Seq("bucket"))
      .filter(col("t") >= col("t_start") && col("t") <= col("t_end"))
      .select(col("pt_id"), col("iv_id"), col("t"))
  }

  /** Broadcast tier of [[rangeJoin]]: the plain non-equi containment
    * join, explicitly broadcast — optimal when the interval table is
    * small (each point tests M intervals in one map-side pass, no
    * shuffle at all). Result-identical to the bucketized tier;
    * EventsSpec pins the equivalence. */
  def rangeJoinBroadcast(points: DataFrame,
      intervals: DataFrame): DataFrame =
    points.select(col("pt_id"), col("t"))
      .join(broadcast(intervals.select(col("iv_id"), col("t_start"),
          col("t_end"))),
        col("t") >= col("t_start") && col("t") <= col("t_end"))
      .select(col("pt_id"), col("iv_id"), col("t"))

  /** DuckDB twin of [[rangeJoin]] over CTEs `pts(pt_id, t)` and
    * `ivs(iv_id, t_start, t_end)` — the engine's native inequality
    * join states the same containment. A complete SELECT without
    * ordering. */
  def rangeJoinSql: String =
    s"""SELECT p.pt_id, i.iv_id, p.t
       |FROM pts p JOIN ivs i ON p.t >= i.t_start AND p.t <= i.t_end""".stripMargin

  /** Streaming gap-sessionization: Spark's native `session_window`
    * over event time — sessions close `gap` after their last event
    * once the watermark passes, so state is bounded by OPEN sessions
    * only (the streaming twin of [[sessionize]]'s batch windows).
    * Append mode emits each session exactly once, on close. */
  def sessionizeStream(events: DataFrame, gap: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("session_start"),
        col("n_events"))
}
