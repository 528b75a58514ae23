package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.Blaster
import graft.ts.{SeriesOps => O}
import graft.rrd.Consolidate

/** Scale probe (dev main): generate a Blaster corpus ~1000× the sf0.1
  * fixture and time the core operator chain — evidence that the plan
  * shapes hold when the data no longer fits a single task. Row counts
  * and timings print as one JSON line. Run:
  * `SPARK_GRAFT_PROBE_ROWS=100000000 sbt "runMain graft.ScaleProbe"`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "100000000").toLong
    val nSeries = sys.env.getOrElse("SPARK_GRAFT_PROBE_SERIES", "1000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pts = Blaster.generate(spark, nSeries, rows / nSeries)
      .select(col("name"), col("tsSec").as("ts"), col("value"))

    def time(label: String)(f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      (label, math.rint((System.nanoTime() - t0) / 1e6) / 1e3, n)
    }

    val results = Seq(
      time("gen_scan")(pts.count()),
      time("consolidate_1m") {
        Consolidate.consolidate(pts, 60, "wmean", 0.0, 3600).count()
      },
      time("slot_agg_sum") { // cross-series combine on consolidated slots
        O.sumSeries(Consolidate.whisperMode(pts, 60)).count()
      },
      time("top5_by_max") {
        O.highestMax(Consolidate.whisperMode(pts, 600), 5).count()
      },
      time("moving_avg") {
        O.movingAverage(Consolidate.whisperMode(pts, 600), 10).count()
      })

    val json = results.map { case (l, sec, n) =>
      s""""$l":{"sec":$sec,"rows":$n}"""
    }.mkString("{", ",", "}")
    println(s"""{"probe_rows":$rows,"series":$nSeries,"stages":$json}""")
    spark.stop()
  }
}
