package graft.rrd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Series-creation rules: on first sight of a name, pick its
  * consolidation spec by first-matching regex
  * (`daemon/config.go:298-306`, default spec
  * `receiver/dsfinder.go:34-55`). Here the "creation" moment is plan
  * time — the finder annotates a name frame with (step, heartbeat,
  * archive chain), which the consolidation cascade then consumes.
  */
object DsFinder {

  final case class ArchiveSpec(cf: String, stepSec: Long, spanSec: Long,
      xff: Double = 0.5)
  final case class DsSpec(stepSec: Long, heartbeatSec: Long,
      rras: Seq[ArchiveSpec])

  /** The reference's default chain: 10s step / 2h heartbeat, WMEAN
    * archives 10s×6h, 1m×24h, 10m×93d, 1d×5y. */
  val Default: DsSpec = DsSpec(10L, 7200L, Seq(
    ArchiveSpec("wmean", 10L, 6L * 3600),
    ArchiveSpec("wmean", 60L, 24L * 3600),
    ArchiveSpec("wmean", 600L, 93L * 86400),
    ArchiveSpec("wmean", 86400L, 1825L * 86400)))

  /** First regex match wins; no match → default (the reference chains
    * config rules then SimpleDSFinder's single spec). */
  def findSpec(rules: Seq[(String, DsSpec)], name: String): DsSpec =
    rules.collectFirst {
      case (re, spec) if re.r.findFirstIn(name).isDefined => spec
    }.getOrElse(Default)

  /** Vectorized form: annotate a frame of names with the matched spec's
    * identity (rule index; −1 = default) plus step and heartbeat —
    * first-match-wins as a cascaded CASE, evaluated at the scan. */
  def annotate(names: DataFrame, rules: Seq[(String, DsSpec)]): DataFrame = {
    val ruleIdx: Column = rules.zipWithIndex.foldRight(lit(-1): Column) {
      case (((re, _), i), els) =>
        when(col("name").rlike(re), lit(i)).otherwise(els)
    }
    val step = rules.zipWithIndex.foldRight(lit(Default.stepSec): Column) {
      case (((re, spec), _), els) =>
        when(col("name").rlike(re), lit(spec.stepSec)).otherwise(els)
    }
    val hb = rules.zipWithIndex.foldRight(lit(Default.heartbeatSec): Column) {
      case (((re, spec), _), els) =>
        when(col("name").rlike(re), lit(spec.heartbeatSec)).otherwise(els)
    }
    names.withColumn("rule", ruleIdx)
      .withColumn("step_sec", step)
      .withColumn("heartbeat_sec", hb)
  }
}
