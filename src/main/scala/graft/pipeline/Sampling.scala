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
