package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE short JSON line (the driver tail-captures stdout — round 1
  * proved an all-76-query line gets truncated past parseability, so the
  * per-query map is a representative subset and timings are ms-rounded).
  * Each query runs three times in the same JVM and the per-query MIN is
  * reported (noise-proofing: co-tenant jitter inflated round-5 numbers
  * 2×+ and a single-shot bench could not attribute it). `value` = total
  * of the per-query minima across the headline set.
  */
object Bench {
  /** One representative per operator family (SURVEY §2): relational
    * agg/join/window, ts grid + combines + window + top-k, dedup,
    * similarity, text analysis. */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q04_revenue_by_nation", "q05_top_customers",
    "q06_running_supplier",
    "ts_series_dense", "ts_sum_series", "ts_moving_average",
    "ts_highest_max", "ts_summarize_sum",
    "rrd_wmean", "dsl_deep_nest", "hw_forecast", "sd_timers",
    "dd_exact_dedup", "dd_minhash_pairs", "sim_topk_exact", "tx_token_count",
    // round-4 additions: wire decode, whisper import, clustering, sampling
    "ig_pickle_parse", "ig_whisper_import", "sim_kmeans", "sp_shuffle_rank",
    // curation stages (keep the JSON line < ~1 KB — driver tail-capture)
    "cu_repetition", "cu_pack_sequences", "cu_pipeline", "ts_asof_join",
    // round-6 additions: substring-level dedup, quantized MIPS tier,
    // per-source drift, BPE merge training
    "dd_window_fp", "sim_topk_q8", "cu_drift", "cu_bpe",
    // round-7 additions: LM-perplexity scoring, cluster-confined
    // semantic dedup, end-to-end gated selection, bloom-prefiltered
    // large-reference decontamination
    "tx_perplexity", "sim_semdedup", "cu_select", "cu_contamination_xl",
    // sketch-tier distinct counts, automaton blocklist
    "cu_distinct_hll", "tx_blocklist",
    // quantile-sketch tier, boilerplate-span removal, sessionization
    "cu_quantile_sketch", "dd_strip_boilerplate", "ev_sessions",
    // round-8 additions: capped SemDeDup over the two-level k-means
    // substrate (skew-constructed corpus), one-scan funnel
    "sim_semdedup_skew", "ev_funnel")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      try qs(name)(spark, sfDir).count()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val names = headline.filter(qs.contains)
    // min-of-3: each query is timed on three full passes in the same
    // JVM and the per-query MIN is reported. A co-tenant load spike
    // during any single pass no longer lands in the reported number —
    // the sandbox's 2×+ jitter made single-shot rounds unattributable.
    val passes = (1 to 3).map(_ => names.map(n => n -> time(n)).toMap)
    val results = names.map { n =>
      val ts = passes.map(_(n))
      val ok = ts.filter(_ >= 0)
      val best = if (ok.isEmpty) -1.0 else ok.min
      n -> math.rint(best * 1000) / 1000
    }
    val qjson = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = math.rint(results.map(_._2).filter(_ >= 0).sum * 1000) / 1000
    val line = s"""{"metric":"headline_total_warm","value":$total,"unit":"sec","queries":$qjson,"sf":"$sfDir"}"""
    println(line)
    // Belt-and-braces for the driver's stdout parse: also persist the line.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
