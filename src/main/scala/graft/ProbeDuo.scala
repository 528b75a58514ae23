package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.Blaster
import graft.ts.{SeriesOps => O}
import graft.rrd.Consolidate

/** Focused scale probe (dev main) for the round-17 measurement gaps the
  * full [[ScaleProbe]] cannot answer cheaply:
  *
  *  1. SCALING — the sf0.1 bench queries are 0.1-3 s and overhead-bound,
  *     so core count doesn't move them (round-16 c8/c32 ratios ≈ 1 told
  *     the driver nothing). This main re-times the probe's top
  *     SHUFFLE-HEAVY stages at the 100 M-row design point; run it at
  *     `SPARK_GRAFT_CPUS=32` and `=8` and compare sec@8 / sec@32.
  *  2. JOIN-STRATEGY A/B — the session-default
  *     `preferSortMergeJoin=false` + AQE SHJ threshold was A/B'd only at
  *     sf0.1; run this main with `GRAFT_PREFER_SMJ=true GRAFT_SHJ_LOCALMAP=0`
  *     vs defaults at the design point to prove (or revert) the default
  *     where partitions are no longer trivially small.
  *
  * Prints ONE JSON line: {"metric":"probe_duo","cpus":N,"prefer_smj":B,
  * "stages":{name:sec,...},"rows":R}. Corpora are the deterministic
  * in-plan generators [[ScaleProbe]] uses (same construction, same
  * sizes via the same env knobs).
  */
object ProbeDuo {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "100000000").toLong
    val nSeries = sys.env.getOrElse("SPARK_GRAFT_PROBE_SERIES", "1000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val preferSmj = sys.env.getOrElse("GRAFT_PREFER_SMJ", "false")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", preferSmj)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("GRAFT_SHJ_LOCALMAP", "64m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pts = Blaster.generate(spark, nSeries, rows / nSeries)
      .select(col("name"), col("tsSec").as("ts"), col("value"))
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_PROBE_DOCS", "200000").toLong
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(39)), j =>
        when(j === pmod(col("id"), lit(40)) && col("id") % 2 === 1,
          substring(md5(col("id").cast("string")), 1, 6))
          .otherwise(substring(md5(concat_ws("_",
            (col("id") - pmod(col("id"), lit(2))).cast("string"),
            j.cast("string"))), 1, 6))))
        .as("text"))
    val nVecs = sys.env.getOrElse("SPARK_GRAFT_PROBE_VECS", "1000000").toLong
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (pmod(xxhash64(col("id"), j), lit(2001)) - 1000).cast("double") / 1000.0)
        .as("embedding"))
    val nKeys = sys.env.getOrElse("SPARK_GRAFT_PROBE_KEYS", "10000000").toLong
    val keys = spark.range(nKeys).select(col("id").as("doc_id"))

    def time(label: String)(f: => Long): (String, Double, Long) = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val n = f
      spark.sparkContext.setJobDescription(null)
      (label, math.rint((System.nanoTime() - t0) / 1e6) / 1e3, n)
    }

    val results = Seq(
      time("gen_scan")(pts.count()), // ambient-load gauge
      time("consolidate_1m") {
        Consolidate.consolidate(pts, 60, "wmean", 0.0, 3600).count()
      },
      time("slot_agg_sum") {
        O.sumSeries(Consolidate.whisperMode(pts, 60)).count()
      },
      time("minhash_neardup") {
        pipeline.NearDup.minhashPairs(docs, 0.6).count()
      },
      time("window_fp_200k") {
        pipeline.NearDup.windowFpPairs(docs, 8, 3).count()
      },
      time("range_join_10m") {
        val p = keys.select(col("doc_id").as("pt_id"),
          pmod(col("doc_id") * 7919L, lit(2592000000000L)).as("t"))
        val ivs = spark.range(1000).select(col("id").as("iv_id"),
          (col("id") * 2590000000L).as("t_start"),
          (col("id") * 2590000000L + 7200000000L).as("t_end"))
        pipeline.Events.rangeJoin(p, ivs, 3600000000L).count()
      },
      time("semdedup_skew_1m") {
        val skew = pipeline.Similarity.skewedCorpus(vecs)
        val (assigned, relA) = pipeline.Similarity.twoLevelAssignScoped(
          skew, coarseK = 128, fineK = 64, coarseIters = 1, fineIters = 1)
        val (kept, relD) = pipeline.Similarity.semDedupChunkedScoped(
          assigned, eps = 0.9, capTarget = 256, levels = 2)
        val n = kept.count()
        relD(); relA()
        n
      })

    val js = results.map { case (l, s, _) => s""""$l":$s""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"probe_duo","cpus":$cpus,""" +
      s""""prefer_smj":$preferSmj,"rows":$rows,"stages":$js}""")
    spark.stop()
  }
}
