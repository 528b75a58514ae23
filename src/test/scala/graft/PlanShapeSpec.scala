package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Plan-shape regression guards for the scale-critical operators added
  * in round 6 — the argued shapes (broadcast-only corpus-side joins, no
  * all-pairs degeneration) asserted in the suite, not just observed in
  * the one-off `PlanAudit` sweep. AQE is disabled so the static
  * executed plan is inspected deterministically; the assertions target
  * join STRATEGY, which AQE would only ever improve (SMJ→BHJ), never
  * worsen. */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("planshape-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("dd_window_fp: inverted-index joins never degenerate to a cartesian") {
    val p = plan("dd_window_fp")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("quantized tiers: corpus side never shuffles for a join") {
    // flat q8 scan: broadcast query crossJoin (BNLJ over the tiny
    // side); IVF-SQ8: broadcast probe join into the assigned corpus;
    // the PQ tiers follow the same contract with LUT arrays riding
    // the broadcast instead of quantized query vectors.
    // A SortMergeJoin in any means the corpus got shuffled for a
    // frame that is broadcastable by contract.
    Seq("sim_topk_q8", "sim_topk_ivf_q8",
        "sim_topk_pq", "sim_topk_ivf_pq").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("quantized tiers: per-query top-k plans with a rank limit, not a full sort") {
    // row_number() <= k over per-query windows: Spark 4 inserts
    // WindowGroupLimit, whose Partial mode is a MAP-SIDE per-partition
    // top-k — each partition forwards at most k rows per query before
    // the window shuffle. A regression to a plain Window (full
    // per-query sort of every scored corpus row through the exchange)
    // would be invisible in results and only show at corpus scale.
    Seq("sim_topk_q8", "sim_topk_ivf_q8",
        "sim_topk_pq", "sim_topk_ivf_pq").foreach { q =>
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"), s"$q lost its rank-limit:\n$p")
    }
  }

  test("cu_contamination_xl: bloom prune is map-side, before any exchange") {
    // The corpus scan must carry the codegen'd graft_bloom_keep prune
    // (non-matching grams dropped before the verification shuffle) and
    // nothing may degenerate to a cartesian. A shuffle join against the
    // DISTRIBUTED reference grams is the intended shape here — the
    // whole point is that the reference set is never collected.
    val p = plan("cu_contamination_xl")
    assert(p.contains("graft_bloom_keep"), s"bloom prune missing:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("cu_distinct_hll: sketch tier plans as an object hash aggregate") {
    // the HLL typed aggregate must keep its partial/merge shape (one
    // register buffer per group per partition through the shuffle) and
    // the exact-vs-estimate comparison join must not degenerate
    val p = plan("cu_distinct_hll")
    assert(p.contains("ObjectHashAggregate"), s"hll agg shape lost:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("tx_blocklist: one automaton pass, no join anywhere") {
    val p = plan("tx_blocklist")
    assert(p.contains("graft_ac_count"), s"automaton prune missing:\n$p")
    assert(!p.contains("Join"), s"blocklist must be join-free:\n$p")
  }

  test("sp_mixture: the weight table joins broadcast, pass stays map-side") {
    val p = plan("sp_mixture")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("cu_dsir: scoring is one doc-local pass — no join, no explode") {
    // round 16: the B-row weight table (DsirBuckets by construction)
    // is a bounded driver bounce embedded in graft_dsir_score, so the
    // SCORING side of the plan must be join-free and explode-free —
    // one project over the corpus scan. (The weight ESTIMATION pass
    // keeps its explode+aggregate, but runs once at construction and
    // is not part of this plan.) A join or Generate reappearing here
    // means the scoring regressed to the shuffle shape.
    val p = plan("cu_dsir")
    assert(p.contains("graft_dsir_score"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Generate"), p)
  }

  test("sim_semdedup: pair search stays confined to cluster buckets") {
    // the epsilon-neighbor self-join is keyed on cid — a cartesian
    // here would mean the SemDeDup bucket confinement degenerated to
    // the all-pairs scan the clustering exists to avoid
    val p = plan("sim_semdedup")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tx_perplexity: count-table joins are equi-joins, V broadcasts") {
    // bigram/unigram lookups join on their own keys (SMJ is the RIGHT
    // shape at corpus scale — one row per key on the build side); the
    // scalar V must broadcast; nothing may degenerate to a cartesian
    val p = plan("tx_perplexity")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("sp_unimax: the S-row allocation broadcasts into the mixture pass") {
    // the water-filling runs entirely on the per-source counts frame
    // (metadata-scale); the corpus is touched only by the mixture
    // explode, whose weight lookup must stay a broadcast join
    val p = plan("sp_unimax")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tx_entropy: a pure two-level aggregate, no cartesian anywhere") {
    // char explode → map-side-combined (doc, char) count → per-doc
    // fold; the only join is the corpus-sized doc_id left join
    val p = plan("tx_entropy")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sim_recall_ivf: both tiers keep their query-broadcast shape") {
    // exact tier broadcast-crossjoins the 5 queries, IVF broadcasts
    // probes into the assigned corpus — a cartesian would mean either
    // tier lost its broadcast
    val p = plan("sim_recall_ivf")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("cu_select: score joins stay keyed, allocation broadcasts, no cartesian") {
    // three score frames join the corpus on doc_id (co-partitioned);
    // the DSIR bucket table and the S-row allocation broadcast
    val p = plan("cu_select")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("cu_drift: the K-bounded vocab probes broadcast into the token stream") {
    // the corpus-token membership probe against the driver-bounced
    // vocab must be a broadcast join — an SMJ here would shuffle the
    // full exploded token stream against a 100-row frame — and the
    // (sources × K)-bounded grid/count/total joins are hinted
    // broadcast, so NO join in this plan sort-merges
    val p = plan("cu_drift")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("cu_heavy_hitters: the sketch plans as a hash aggregate with map-side partials") {
    // the Misra-Gries TypedImperativeAggregate must run as
    // ObjectHashAggregate (partial sketches merged across the
    // exchange). A SortAggregate fallback would sort the full token
    // stream before aggregating — exactly the corpus-wide work the
    // sketch exists to avoid.
    val p = plan("cu_heavy_hitters")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("cu_quantile_sketch: compactor stacks cross the exchange as partials, values never sort") {
    // same contract as the heavy-hitters guard, for the quantile tier:
    // ObjectHashAggregate partials (one stack per group-partition
    // crosses the shuffle), never a SortAggregate over the value
    // stream — the full per-group sort is exactly what the sketch
    // replaces.
    Seq("cu_quantile_sketch", "cu_value_quantiles").foreach { q =>
      val p = plan(q)
      assert(p.contains("ObjectHashAggregate"), s"$q:\n$p")
      assert(!p.contains("SortAggregate"), s"$q:\n$p")
    }
  }

  test("dd_strip_boilerplate: hot-window and reassembly joins stay keyed") {
    // the hot join is on the uniform window-hash key, membership joins
    // on doc/text keys — a cartesian anywhere means the coverage
    // explode leaked into an unkeyed join
    val p = plan("dd_strip_boilerplate")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("imageHashPairs: band-bucket joins, no all-pairs degeneration") {
    // built from the operators directly (the mm_* query names pin the
    // sf0.01 oracle dataset; the plan shape is dataset-independent)
    import graft.pipeline.Multimodal
    val s = spark
    val media = Multimodal.syntheticMedia(s,
      s.range(0, 30).toDF().withColumnRenamed("id", "doc_id"))
    val p = Multimodal.imageHashPairs(
        Multimodal.imageHashes(s, media).toDF(), 7)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("hybrid retrieval: no cartesian; per-query ranks carry a group limit") {
    // bm25's tf⋈dl doc_id join is legitimately shuffled (both sides
    // corpus-wide), so SMJ is allowed in the fused plan — but nothing
    // may degenerate to a cartesian, and every per-query rank must
    // plan with the map-side WindowGroupLimit partial top-k
    Seq("tx_semantic_expand", "tx_hybrid_rrf").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(p.contains("WindowGroupLimit"), s"$q:\n$p")
    }
  }

  test("hard negatives: query/label frames broadcast, corpus never shuffles for a join") {
    // exact tier: broadcast-query BNLJ scan; IVF tier: broadcast
    // candidate list into the label projection + broadcast probes —
    // an SMJ in either means a corpus shuffle for a frame that is
    // broadcastable by contract
    Seq("sim_hard_negatives", "sim_hard_negatives_ivf").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q:\n$p")
      assert(p.contains("WindowGroupLimit"), s"$q:\n$p")
    }
  }

  test("sp_weighted: top-k plans as TakeOrdered, never a global sort") {
    val p = plan("sp_weighted")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("sim_semantic_contam: band and verify joins stay keyed") {
    val p = plan("sim_semantic_contam")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("headline sweep: no query plans an unpartitioned unbounded window") {
    // every deliberately-global window in the repo is (a) argued
    // bounded (strata counts, block totals, post-TakeOrdered rows) and
    // (b) given a non-foldable constant partition key, so WindowExec's
    // empty-partition warning stays SIGNAL: this sweep failing means a
    // real corpus-sized global sort crept into a headline plan
    import org.apache.spark.sql.execution.window.WindowExec
    Bench.headline.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
      val unpartitioned = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(unpartitioned.isEmpty,
        s"$name plans ${unpartitioned.size} unpartitioned WindowExec node(s)")
    }
  }

  test("round-8 similarity tiers: no all-pairs degeneration, corpus never SMJ-shuffles") {
    // two-level serving: cells and probe frames broadcast by contract;
    // incremental dedup: cluster-keyed store join; recall gauge:
    // inverted-index candidates, never a brute cross join
    Seq("sim_topk_two_level", "sim_semdedup_inc", "dd_minhash_recall")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      }
    val twoLevel = plan("sim_topk_two_level")
    assert(!twoLevel.contains("SortMergeJoin"), twoLevel)
  }

  test("probeTwoLevel past the 64MB gate broadcasts the probe batch, not cells") {
    // the round-8 advisor's medium finding, CI-pinned: at real K the
    // fine-cell frame is K-wide and must NOT be the broadcast side —
    // the probe batch is. Indexes are constructed directly (no build)
    // on either side of the deterministic coarseK·fineK·dim·8 ≤ 64MB
    // gate; the plan is inspected for which side each
    // BroadcastExchange carries (the cells frame is the only subtree
    // outputting a `cents` attribute).
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import graft.pipeline.Similarity
    val s = spark
    def syntheticIx(coarseK: Int, fineK: Int) = {
      val cells = s.range(coarseK).select(col("id").as("ccid"),
        transform(sequence(lit(0L), lit(fineK - 1L)), f =>
          struct(f.cast("long").as("fcid"),
            transform(sequence(lit(0), lit(Similarity.Dim - 1)),
              d => (d + f + lit(1.0)).cast("double")).as("cent")))
          .as("cents"))
      val assigned = s.range(100).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(Similarity.Dim - 1)),
          d => (d + col("id") + lit(1.0)).cast("float")).as("embedding"),
        (col("id") % coarseK).as("ccid"),
        (col("id") % (coarseK.toLong * fineK)).as("cid"))
      val coarse = (0 until coarseK).map(c =>
        (c.toLong, (0 until Similarity.Dim).map(d => (c + d + 1).toDouble)))
      Similarity.TwoLevelIndex(assigned, cells, coarse, () => ())
    }
    val queries = s.range(2).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(Similarity.Dim - 1)),
        d => (d + lit(1.0)).cast("float")).as("embedding"))
    def cellsBroadcasts(coarseK: Int, fineK: Int): Int =
      Similarity.probeTwoLevel(syntheticIx(coarseK, fineK), queries,
          k = 5, fineK = fineK, probeCoarse = 2, probeFine = 4)
        .queryExecution.executedPlan.collect {
          case b: BroadcastExchangeExec
            if b.output.exists(_.name == "cents") => b
        }.size
    // 4·64·64·8 = 128KB — under the gate: cells broadcast (control)
    assert(cellsBroadcasts(4, 64) === 1, "small-K control must broadcast cells")
    // 2080·64·64·8 ≈ 68MB — past it: cells must stay distributed
    assert(cellsBroadcasts(2080, 64) === 0,
      "K-wide cells frame broadcast past the 64MB gate")
  }

  test("ev_funnel: ONE event-log scan for the whole stage chain") {
    // an N-stage funnel must not pay N passes over a 100 TB log: the
    // per-stage qualification chain evaluates over the users-sized
    // aggregate, so exactly one pushed-filter scan may appear
    val p = plan("ev_funnel")
    val scans = "(?i)scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"expected 1 event-log scan, found $scans:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dd_bloom_novel: might_contain prunes the batch before the exact confirm") {
    // the batch side must carry the codegen'd bloom probe as a plain
    // filter (map-side, no shuffle to reach it), so only candidates
    // ride into the exact semi-join; nothing degenerates to a cartesian
    val p = plan("dd_bloom_novel")
    assert(p.contains("might_contain"), s"bloom probe missing:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }
}
