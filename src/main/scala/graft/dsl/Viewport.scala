package graft.dsl

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ts.Durations

/** String→viewport parsing for `/render?from=…&until=…` — the step every
  * real render request begins with (reference `parseTime`,
  * `http/graphite.go:197-221`):
  *
  *   - empty          → absent (caller applies its default)
  *   - `-<duration>`  → now − duration (`misc.BetterParseDuration` grammar)
  *   - `now`          → now
  *   - decimal digits → absolute epoch seconds
  *   - anything else  → error
  *
  * "now" is an explicit argument, not the wall clock: the evaluator builds
  * deterministic, replayable plans (and the oracle gate re-runs them in a
  * different engine at a different time), so the caller anchors the clock
  * once at the request boundary.
  */
object Viewport {

  /** Reference `parseTime`. Returns None for the empty string (the
    * reference returns nil and lets the handler default it). */
  def parseTimeSec(s: String, nowSec: Long): Option[Long] = {
    val t = s.trim
    if (t.isEmpty) None
    else if (t.startsWith("-")) Some(nowSec - Durations.parseSeconds(t.substring(1)))
    else if (t == "now") Some(nowSec)
    else if (t.forall(_.isDigit)) Some(t.toLong)
    else throw new IllegalArgumentException(s"parseTime: bad time '$s'")
  }

  /** Build an [[Eval.Ctx]] from string from/until, mirroring the render
    * handler: `until` defaults to now (`http/graphite.go:97-100`); `from`
    * is required (the reference would NPE on a missing from — we fail
    * loudly instead). */
  def ctx(spark: SparkSession, store: DataFrame, stepSec: Long,
      from: String, until: String, nowSec: Long,
      maxPoints: Int = 512): Eval.Ctx = {
    val f = parseTimeSec(from, nowSec).getOrElse(
      throw new IllegalArgumentException("viewport: 'from' is required"))
    val u = parseTimeSec(until, nowSec).getOrElse(nowSec)
    Eval.Ctx(spark, store, stepSec, fromSec = f, toSec = u,
      maxPoints = maxPoints)
  }
}
