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
}
