package graft.rrd

/** Archive (RRA) catalog + the BestRRA query-planning rule.
  *
  * In the reference an RRA is a fixed-size round-robin array
  * (`rrd/rra.go:33-74`); here an archive is just a parquet table of
  * consolidated slots at one resolution, and the spec carries the
  * metadata the planner needs. `latest` is the most recent consolidated
  * slot end; `spanSec = stepSec * size` is the retention window.
  */
final case class RraSpec(stepSec: Long, size: Long, latestSec: Long) {
  def spanSec: Long = stepSec * size
  /** `rra.includes(t)`: begins(latest) < t <= latest. */
  def includes(tSec: Long): Boolean =
    tSec > latestSec - spanSec && tSec <= latestSec
}

object Archives {

  /** The reference's archive-selection rule (`rrd/ds.go:136-198`):
    * candidates = RRAs covering `start` (plus RRAs whose latest predates
    * start — they'd return nothing but mark staleness); if none, the
    * longest-span RRA; among candidates, with `points > 0` pick the step
    * closest to (end-start)/points, else the smallest step (highest
    * resolution). Pure planning — runs on the driver over the tiny
    * archive catalog, never touches data.
    */
  def bestRra(rras: Seq[RraSpec], startSec: Long, endSec: Long,
      points: Long): Option[RraSpec] = {
    if (rras.isEmpty) return None
    val candidates0 = rras.filter(r => r.includes(startSec) || r.latestSec < startSec)
    val candidates =
      if (candidates0.nonEmpty) candidates0
      else Seq(rras.maxBy(_.spanSec))
    if (candidates.size == 1) Some(candidates.head)
    else if (points > 0) {
      val expectedStep = (endSec - startSec).toDouble / points
      Some(candidates.minBy(r => math.abs(expectedStep - r.stepSec)))
    } else Some(candidates.minBy(_.stepSec))
  }
}
