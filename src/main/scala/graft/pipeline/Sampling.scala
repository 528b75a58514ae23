package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / shuffling for training-data pipelines.
  *
  * Every operator here is driven by a portable md5-derived hash of a
  * key column, NOT by `rand()`: at 100 TB a sample must be (a)
  * reproducible run-to-run and engine-to-engine, (b) stable under
  * re-partitioning and retries (a rand()-based Bernoulli sample is
  * neither), and (c) consistent across derived tables — sampling
  * documents and their embeddings by the same key keeps them joined.
  *
  * All three ops are map-side only (the stratified variant broadcasts
  * its tiny rate table); nothing here shuffles the corpus — except
  * [[shuffleRank]], whose global sort is the point.
  */
object Sampling {

  /** Stable uniform bucket in [0, 10000): md5-prefix hash of the key,
    * 31-bit domain (same portability rules as [[NearDup.h64]]; native
    * digest path, value-identical to the hex-string form). */
  def bucket(key: Column): Column =
    pmod(graft.functions.TextExprs.md5Prefix60(key.cast("string")),
      lit(10000L))

  /** SQL twin of [[bucket]] for DuckDB oracles. */
  def bucketSql(e: String): String =
    s"((CAST('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 15) AS BIGINT) % 10000 + 10000) % 10000)"

  /** Uniform deterministic sample: keeps key-hash buckets below
    * rate·10⁴. The same key always lands on the same side. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(bucket(key) < math.round(rate * 10000).toInt)

  /** Stratified deterministic sample: per-stratum rates from a tiny
    * (stratum, rate) frame — broadcast, so the pass stays map-side.
    * Strata absent from the rate table keep `defaultRate`. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      rates: DataFrame, defaultRate: Double): DataFrame = {
    val r = broadcast(rates.select(col("stratum").as("__s"), col("rate").as("__r")))
    df.join(r, stratum === col("__s"), "left")
      .filter(bucket(key) <
        round(coalesce(col("__r"), lit(defaultRate)) * 10000).cast("long"))
      .drop("__s", "__r")
  }

  /** Deterministic mixture (re-)weighting — the data-mixing step a
    * pre-training corpus runs to hit a target source distribution:
    * weight w per stratum means every document yields floor(w) copies
    * plus one more with probability frac(w), decided by the same
    * stable hash family as [[hashSample]] (so the fractional keep-set
    * is a uniform, reproducible, engine-portable subset — and w ≤ 1
    * degenerates to exactly [[stratifiedSample]]'s keep rule). Copies
    * carry a `copy` index (0-based) so a downstream [[shuffleRank]]
    * with `copy` folded into the key spreads epochs apart instead of
    * emitting byte-identical neighbors.
    *
    * Scale shape: the weight table is broadcast and the pass is pure
    * map-side explode — output grows by exactly the mixture factor,
    * there is no shuffle, and a 100 TB corpus re-weights in one scan.
    * Strata absent from the table keep `defaultWeight`. */
  def mixtureSample(df: DataFrame, stratum: Column, key: Column,
      weights: DataFrame, defaultWeight: Double): DataFrame = {
    val w = broadcast(weights.select(col("stratum").as("__s"),
      col("weight").as("__w")))
    val eff = coalesce(col("__w"), lit(defaultWeight))
    val frac = eff - floor(eff)
    val copies = (floor(eff).cast("long") +
      when(bucket(key) < round(frac * 10000).cast("long"), 1L).otherwise(0L))
      .as("__n")
    df.join(w, stratum === col("__s"), "left")
      .withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__s", "__w", "__n")
  }

  /** SQL twin of [[mixtureSample]]'s copy count for a weight
    * expression `w` and key expression `k`. */
  def mixtureCopiesSql(w: String, k: String): String =
    s"(CAST(floor($w) AS BIGINT) + CASE WHEN ${bucketSql(k)} < " +
      s"CAST(round(($w - floor($w)) * 10000) AS BIGINT) THEN 1 ELSE 0 END)"

  /** Per-stratum budget allocation by water-filling — the UniMax
    * sampling rule (Chung et al. 2023, arXiv:2304.09151): spread a
    * total token budget as uniformly as possible across strata, but
    * never draw more than `maxEpochs` passes over any stratum's own
    * tokens. `counts` is one row per stratum: (stratum, c) with c the
    * stratum's token count. Returns (stratum, c, cap, alloc, weight)
    * where cap = c·maxEpochs, Σ alloc = min(budget, Σ cap), and
    * weight = alloc/c is the epoch multiplier a [[mixtureSample]] run
    * with this frame realizes in expectation.
    *
    * The water level has a closed form over the cap-sorted strata —
    * the first position j (caps ascending) whose uniform share
    * (budget − Σ caps before j) / (strata from j on) fits under its
    * own cap is the level; every smaller stratum is capped, every
    * larger one gets the level. Shares at feasible positions only
    * decrease (proof in the test), so "first feasible" ≡ max feasible
    * share — one window pass + one aggregate, no iteration.
    *
    * Scale shape: every operation here runs on the S-row counts frame
    * — strata are metadata-scale (sources/languages, not documents),
    * the same bounded-state contract as k-means centroids, so the
    * single-partition window is S rows by construction. The corpus
    * itself is touched only by the [[mixtureSample]] this frame feeds,
    * which stays one map-side scan. */
  def unimaxAlloc(counts: DataFrame, budget: Double,
      maxEpochs: Double): DataFrame =
    unimaxAllocScaled(counts, _ => budget, maxEpochs)._1

  /** [[unimaxAlloc]] with the budget derived FROM the collected total
    * (`budgetOf(Σc)`), so callers that scale their budget off the
    * corpus token count ([[graft.pipeline.Curation.selectTraining]],
    * sp_unimax) pay ONE S-row collect for both numbers. Round 17: the
    * water-fill itself runs on the driver over the collected rows —
    * strata are metadata-scale by contract (sources/languages; the
    * scaladoc above has always said so), the same bounded-bounce class
    * as k-means centroids and the DSIR bucket table. The previous plan
    * formulation paid two deliberately-single-partition windows plus a
    * crossJoin(broadcast(level)) INSIDE every consuming plan — three
    * extra stages and their Catalyst analysis per construction, per
    * bench pass. Arithmetic is replicated operation-for-operation
    * (sequential prefix sum in (cap, stratum-UTF8-binary, nulls-first)
    * order, `(budget − p) / (S − rn + 1)` with the same long/double
    * promotions, order-free max level, least/greatest twins), so the
    * alloc/weight doubles — and every mixture copy count downstream —
    * are bit-identical; PropertySpec pins driver ≡ plan formulation and
    * the oracle rows (sp_unimax, cu_select, sp_mixture family) pin it
    * end-to-end. Returns (alloc frame as a LocalRelation, Σc). */
  def unimaxAllocScaled(counts: DataFrame, budgetOf: Long => Double,
      maxEpochs: Double): (DataFrame, Long) = {
    require(maxEpochs > 0, "maxEpochs > 0")
    val spark = counts.sparkSession
    val stratumField = counts.schema("stratum")
    require(stratumField.dataType ==
      org.apache.spark.sql.types.StringType,
      "unimaxAlloc driver fill expects a string stratum")
    val rows = counts.select(col("stratum"), col("c").cast("long")).collect()
    var total = 0L
    rows.foreach(r => if (!r.isNullAt(1)) total += r.getLong(1))
    val budget = budgetOf(total)
    require(budget >= 0, "budget >= 0")
    // (stratum, c, cap) sorted by (cap asc NaN-last, stratum asc
    // UTF8-binary nulls-first) — exactly the window ORDER BY
    final case class S(stratum: String, c: Long, cap: Double)
    val srt = rows.map { r =>
      val c = if (r.isNullAt(1)) 0L else r.getLong(1)
      S(if (r.isNullAt(0)) null else r.getString(0), c,
        c.toDouble * maxEpochs)
    }.sortWith { (a, b) =>
      val byCap = java.lang.Double.compare(a.cap, b.cap)
      if (byCap != 0) byCap < 0
      else if (a.stratum == null) b.stratum != null
      else if (b.stratum == null) false
      else org.apache.spark.unsafe.types.UTF8String.fromString(a.stratum)
        .compareTo(
          org.apache.spark.unsafe.types.UTF8String.fromString(b.stratum)) < 0
    }
    val n = srt.length
    // sequential prefix sum + first-feasible level, the window twin
    var p = 0.0
    var lvl = Double.NaN
    var hasLvl = false
    var i = 0
    val shares = new Array[Double](n)
    while (i < n) {
      shares(i) = (budget - p) / (n - i).toDouble // __s − __rn + 1 = n − i
      if (shares(i) <= srt(i).cap &&
          (!hasLvl || shares(i) > lvl)) { lvl = shares(i); hasLvl = true }
      p += srt(i).cap
      i += 1
    }
    val out = srt.map { s =>
      val alloc = if (!hasLvl) s.cap else math.min(s.cap, lvl)
      org.apache.spark.sql.Row(s.stratum, s.c, s.cap, alloc,
        alloc / math.max(s.c.toDouble, 1.0))
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("stratum", StringType, stratumField.nullable),
      StructField("c", LongType, nullable = true),
      StructField("cap", DoubleType, nullable = true),
      StructField("alloc", DoubleType, nullable = true),
      StructField("weight", DoubleType, nullable = true)))
    import scala.jdk.CollectionConverters._
    (spark.createDataFrame(out.toSeq.asJava, schema), total)
  }

  /** The pre-round-17 PLAN formulation of [[unimaxAlloc]] — kept as
    * the reference implementation the driver water-fill is
    * property-tested against (PropertySpec), the
    * [[graft.pipeline.NearDup.signaturesFromSetsHof]] pattern. */
  private[graft] def unimaxAllocPlan(counts: DataFrame, budget: Double,
      maxEpochs: Double): DataFrame = {
    require(budget >= 0 && maxEpochs > 0, "budget >= 0, maxEpochs > 0")
    // deliberately single-partition windows over the S-row strata
    // frame; the non-foldable constant key (a literal would fold back
    // to an empty spec) keeps them off the empty-partition warn path
    // so a REAL global-window regression can't hide in warning noise
    // (same idiom as RelQueries.q05 / packSequences' block pass)
    val pk = coalesce(length(col("stratum").cast("string")) % 1, lit(0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pk).orderBy(col("cap"), col("stratum"))
    val capped = counts.select(col("stratum"), col("c"),
      (col("c").cast("double") * maxEpochs).as("cap"))
    val shared = capped
      .withColumn("__p", coalesce(
        sum(col("cap")).over(w.rowsBetween(Long.MinValue, -1)), lit(0.0)))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__s", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(pk)))
      .withColumn("__share",
        (lit(budget) - col("__p")) / (col("__s") - col("__rn") + 1))
    val level = broadcast(shared.agg(
      max(when(col("__share") <= col("cap"), col("__share"))).as("__lvl")))
    shared.crossJoin(level)
      .select(col("stratum"), col("c"), col("cap"),
        when(col("__lvl").isNull, col("cap"))
          .otherwise(least(col("cap"), col("__lvl"))).as("alloc"))
      .withColumn("weight",
        col("alloc") / greatest(col("c").cast("double"), lit(1.0)))
  }

  /** Temperature-smoothed mixture weights — the OTHER standard
    * multilingual mixing law ([[unimaxAlloc]]'s water-filling is the
    * epoch-capped one): sampling share p_i ∝ n_iᵗᵃᵘ, so τ = 1 is
    * proportional (each stratum at its natural share), τ → 0
    * approaches uniform (low-resource strata maximally upweighted),
    * and the realized epoch weight over stratum i is
    * w_i = budget·n_iᵗᵃᵘ⁻¹ / Σ n_jᵗᵃᵘ — exactly the frame
    * [[mixtureSample]] consumes (stratum, c, weight).
    *
    * Scale shape: runs entirely on the S-row counts frame (strata are
    * metadata-scale); the corpus is touched only by the mixture pass
    * this feeds. The one cross-stratum reduction (Σ n^τ) broadcasts. */
  def temperatureAlloc(counts: DataFrame, budget: Double,
      tau: Double): DataFrame = {
    require(budget >= 0 && tau > 0 && tau <= 1,
      "budget >= 0, 0 < tau <= 1")
    val z = broadcast(counts.agg(
      sum(pow(col("c").cast("double"), tau)).as("__z")))
    counts.crossJoin(z).select(col("stratum"), col("c"),
      (lit(budget) * pow(col("c").cast("double"), tau) / col("__z") /
        greatest(col("c").cast("double"), lit(1.0))).as("weight"))
  }

  /** SQL twin of [[temperatureAlloc]] over a CTE `cnt(stratum, c)`;
    * defines `tma(stratum, c, weight)`. */
  def temperatureAllocSql(budget: String, tau: Double): String =
    s"""tmz AS (
       |  SELECT sum(pow(CAST(c AS DOUBLE), $tau)) AS z FROM cnt
       |), tma AS (
       |  SELECT stratum, c,
       |    $budget * pow(CAST(c AS DOUBLE), $tau) / z
       |      / greatest(CAST(c AS DOUBLE), 1.0) AS weight
       |  FROM cnt, tmz
       |)""".stripMargin

  /** SQL twin of [[unimaxAlloc]] over a CTE `cnt(stratum, c)`;
    * defines `uma(stratum, c, cap, alloc, weight)`. */
  def unimaxAllocSql(budget: String, maxEpochs: Double): String =
    s"""ucap AS (
       |  SELECT stratum, c, c * $maxEpochs AS cap FROM cnt
       |), ushare AS (
       |  SELECT stratum, c, cap,
       |    ($budget - coalesce(sum(cap) OVER (ORDER BY cap, stratum
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
       |      / (count(*) OVER () - row_number() OVER (ORDER BY cap, stratum) + 1)
       |      AS share
       |  FROM ucap
       |), ulvl AS (
       |  SELECT max(CASE WHEN share <= cap THEN share END) AS lvl FROM ushare
       |), uma AS (
       |  SELECT stratum, c, cap,
       |    CASE WHEN lvl IS NULL THEN cap ELSE least(cap, lvl) END AS alloc,
       |    CASE WHEN lvl IS NULL THEN cap ELSE least(cap, lvl) END
       |      / greatest(CAST(c AS DOUBLE), 1.0) AS weight
       |  FROM ushare, ulvl
       |)""".stripMargin

  /** Deterministic train/val/test split assignment: each row gets the
    * split whose cumulative hash-bucket range its key lands in —
    * train [0, f₁·10⁴), val [f₁·10⁴, (f₁+f₂)·10⁴), … in the order
    * given. The same stable hash family as [[hashSample]], so the
    * split is reproducible run-to-run and engine-to-engine, stable
    * under repartitioning/retries, and CONSISTENT ACROSS DERIVED
    * TABLES (a document and its embedding land in the same split);
    * eval-set leakage into train cannot happen by nondeterminism.
    * Fractions must sum to ≤ 1 (a remainder falls into the LAST
    * split, keeping the assignment total). Map-side only — one
    * projection, no shuffle at any corpus size. Adds a `split`
    * column. */
  def splitAssign(df: DataFrame, key: Column,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must sum to <= 1")
    val cuts = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 10000) }.tail
    val b = bucket(key)
    val expr0 = splits.init.zip(cuts.init).reverse
      .foldLeft(lit(splits.last._1): Column) { case (els, ((name, _), cut)) =>
        when(b < cut, lit(name)).otherwise(els)
      }
    df.withColumn("split", expr0)
  }

  /** LEAKAGE-ROBUST train/val/test split: like [[splitAssign]], but
    * near-duplicate documents can never straddle splits — the quiet
    * eval-contamination channel a per-document split leaves open (a
    * paraphrase of a test doc lands in train with probability
    * 1 − f_test). Each doc is keyed by its near-dup CLUSTER label
    * ([[NearDup.clusters]] over the MinHash-LSH pair graph; docs with
    * no near-dup keep their own id), so a whole duplicate family
    * rides into one split together.
    *
    * Scale shape: the pair graph and its components are
    * near-dup-sized, not corpus-sized; the corpus is touched by one
    * keyed join on doc_id plus the map-side bucket projection. Same
    * hash family as [[splitAssign]] — reproducible, retry-stable,
    * and consistent across derived tables keyed the same way. */
  def splitAssignLeakFree(docs: DataFrame, splits: Seq[(String, Double)],
      minJ: Double): DataFrame = {
    val comp = NearDup.clusters(NearDup.minhashPairs(docs, minJ))
      .select(col("doc_id"), col("cluster"))
    val keyed = docs.join(comp, Seq("doc_id"), "left")
      .withColumn("__sk", coalesce(col("cluster"), col("doc_id")))
    splitAssign(keyed, col("__sk"), splits).drop("__sk", "cluster")
  }

  /** SQL twin of [[splitAssign]]'s split expression for key
    * expression `e`. */
  def splitAssignSql(e: String, splits: Seq[(String, Double)]): String = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must sum to <= 1")
    // one split = every row gets it; a CASE with zero WHEN branches
    // is a syntax error (the Scala twin folds to lit(name) here)
    if (splits.size == 1) return s"'${splits.head._1}'"
    val cuts = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 10000) }.tail
    val b = bucketSql(e)
    val cases = splits.init.zip(cuts.init).map { case ((name, _), cut) =>
      s"WHEN $b < $cut THEN '$name'" }.mkString(" ")
    s"(CASE $cases ELSE '${splits.last._1}' END)"
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    * row i keys on u_i^(1/w_i) with u_i a stable hash-uniform in
    * (0,1); the k largest keys are a weight-proportional
    * without-replacement sample (P(i drawn first) = w_i/Σw, then
    * recurse on the rest). [[stratifiedSample]]/[[mixtureSample]]
    * target a RATE per stratum; this targets a COUNT k under
    * per-ROW weights (quality scores, token counts) — the "keep the
    * n best-prioritized documents" selection a training mix runs
    * after scoring.
    *
    * Deterministic and engine-portable: u comes from the same
    * md5-prefix family as [[bucket]] (10⁶+3 grid, never 0), and the
    * ordering key is the LOG-domain form ln(u)/w — order-equivalent
    * to u^(1/w) but numerically spread where the power form crushes
    * against 1.0 at large weights — ROUNDED before comparison (the
    * bm25 rule: a 1-ulp `ln` divergence between engines cannot flip
    * an order) with id tie-break. Scale: `orderBy.limit(k)` plans as
    * TakeOrdered — per-partition heaps forward ≤ k rows each, no
    * global sort, no corpus shuffle. Weights must be positive;
    * magnitudes up to ~10⁵ keep the rounded key discriminating.
    * Returns (id, es_key), the k winners. */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, "weightedSample requires k > 0")
    val u = (pmod(graft.functions.TextExprs.md5Prefix60(key.cast("string")),
      lit(1000003L)) + 1).cast("double") / 1000004.0
    val es = graft.ts.Round6.r6(log(u) / weight.cast("double"))
    df.select(key.cast("long").as("id"), es.as("es_key"))
      .orderBy(col("es_key").desc, col("id")).limit(k)
  }

  /** SQL twin of [[weightedSample]]'s key for id expression `e` and
    * weight expression `w`. */
  def esKeySql(e: String, w: String): String =
    graft.ts.Round6.r6Sql(
      s"ln(((CAST('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 15) AS BIGINT)" +
        s" % 1000003 + 1000003) % 1000003 + 1) / 1000004.0)" +
        s" / CAST($w AS DOUBLE)")

  /** Deterministic global shuffle for training-order randomization:
    * each row gets (block, rank) = (hash-prefix bucket, position within
    * the block in md5(salt ∥ key) order); the global shuffled order is
    * block-major. Ranking partitions BY BLOCK — never a global
    * single-partition window — so the sort distributes across however
    * many blocks the corpus warrants. Changing the salt re-deals the
    * permutation. The block comes from the first SIX hex digits (2²⁴
    * values), so block counts up to ~16M stay supported and the
    * pmod non-uniformity is ≤ blocks/2²⁴ — a 2-digit prefix would
    * silently cap blocks at 256 and skew any non-divisor count. */
  def shuffleRank(df: DataFrame, key: Column, salt: String,
      blocks: Int = 256): DataFrame =
    df.withColumn("__h", md5(concat(lit(salt), key.cast("string"))))
      .withColumn("block",
        pmod(conv(substring(col("__h"), 1, 6), 16, 10).cast("long"), lit(blocks)))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("block")).orderBy(col("__h"), key.cast("string"))))
      .drop("__h")

  /** SAMPLE member of the stored-sketch family (HLL = distinct, MG =
    * frequency, compactor stacks = quantiles; this = a uniform
    * specimen set): per (group, increment) keep the `k` keys with the
    * smallest salted hash, as one array row. Bottom-k is a MONOTONE
    * selection, so the union of per-increment sketches re-bottom-k'd
    * ([[mergeSampleSketches]]) EQUALS the direct bottom-k of the whole
    * corpus — exactly, not approximately — at any increment split.
    * Plan shape: the rank filter is Spark 4's `WindowGroupLimit`
    * (map-side per-partition top-k before the one group shuffle);
    * state is k keys per group per increment. Deterministic and
    * engine-portable (md5 order, ties by key). */
  def sampleSketch(df: DataFrame, by: String, key: Column, k: Int,
      salt: String): DataFrame = {
    require(k > 0, "sampleSketch requires k > 0")
    df.select(col(by), key.cast("string").as("key"),
        md5(concat(lit(salt), key.cast("string"))).as("h"))
      .distinct() // dup (group, key) rows must occupy ONE bottom-k
                  // slot, or merge ≠ direct whole-corpus bottom-k
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(by)).orderBy(col("h"), col("key"))))
      .filter(col("rn") <= k)
      .groupBy(col(by))
      .agg(sort_array(collect_list(struct(col("h"), col("key"))))
        .as("smp"))
  }

  /** Read side of [[sampleSketch]]'s tier: union stored sketch rows
    * group-wise and re-select the bottom `k` — one (group, key) row
    * per surviving specimen. Distinct first, so re-stored overlapping
    * increments stay idempotent. */
  def mergeSampleSketches(sketches: DataFrame, by: String,
      k: Int): DataFrame =
    sketches.select(col(by), explode(col("smp")).as("e"))
      .select(col(by), col("e.h").as("h"), col("e.key").as("key"))
      .distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(by)).orderBy(col("h"), col("key"))))
      .filter(col("rn") <= k)
      .select(col(by), col("key"))
}
