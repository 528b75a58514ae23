package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic load generator (`blaster/blaster.go:16-146`): N series of
  * sinusoid-ish random-walk points at a fixed step — the reference uses
  * it to stress ingest; here it generates deterministic bench corpora
  * of arbitrary size from `spark.range` (no driver-side data, scales to
  * any row count the cluster can hold).
  *
  * Determinism: the "random" walk is a hash of (series, index), so any
  * slice of the output is reproducible independent of partitioning. */
object Blaster {

  /** @param nSeries  number of series (`blaster.n`)
    * @param nPoints  points per series
    * @param stepSec  spacing; timestamps start at `t0` */
  def generate(spark: SparkSession, nSeries: Int, nPoints: Long,
      stepSec: Long = 10L, t0: Long = 1704067200L): DataFrame = {
    val rows = spark.range(nSeries.toLong * nPoints)
    val series = (col("id") % nSeries).cast("int")
    val idx = (col("id") / nSeries).cast("long")
    // sinusoid base + hash-noise, mirroring the reference's
    // sin + rand walk shape (`blaster/blaster.go:102-117`)
    val phase = series.cast("double") * 0.7
    val noise = (pmod(hash(col("id")).cast("long"), lit(1000L)).cast("double") - 500.0) / 1000.0
    rows.select(
      concat(lit("blaster.series_"), series).as("name"),
      (lit(t0) + idx * stepSec).as("tsSec"),
      (sin(idx.cast("double") / 10.0 + phase) * 50.0 + 100.0 + noise).as("value"))
  }
}
