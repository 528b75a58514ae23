package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.BinaryType

/** Deduplication operators for large-scale document corpora.
  *
  * Scale notes: everything here is a hash-partitioned groupBy/join on a
  * derived key — no operator compares all pairs. Exact dedup shuffles on
  * the content hash (uniform by construction); MinHash/SimHash bucket
  * first so candidate verification only runs within buckets.
  */
object Dedup {

  /** Exact duplicate groups by md5(text): groups with >1 member, with the
    * lowest doc_id as the designated keeper. NULL-text rows (failed
    * extraction, metadata-only) are never a duplicate group: md5(NULL)
    * is NULL and grouping would lump every such row together. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .filter(col("n_docs") > 1)

  /** Exact dedup: keep the lowest doc_id per content hash. Implemented
    * with row_number over the hash partition (not a self-join), so it is
    * a single shuffle on the hash key. NULL-text rows all survive —
    * without the split, the null-hash partition would silently keep
    * only one of them. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val withText = docs.filter(col("text").isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
    withText.unionByName(docs.filter(col("text").isNull))
  }

  /** Spark's runtime-filter cap (`spark.sql.optimizer.runtime.
    * bloomFilter.maxNumBits` default): 64 Mbit = an 8 MB blob, the
    * budget past which the filter stops growing and its false-positive
    * rate rises instead. */
  val BloomMaxNumBits: Long = 67108864L

  /** Optimal Bloom bit count for `n` items at false-positive rate
    * `fpp` (the standard -n·ln p/ln²2), capped at `maxNumBits` — the
    * same sizing rule Spark's own injected runtime filters use. */
  def bloomNumBits(n: Long, fpp: Double,
      maxNumBits: Long = BloomMaxNumBits): Long = {
    require(n > 0 && fpp > 0 && fpp < 1, "need n > 0, 0 < fpp < 1")
    val ln2 = math.log(2.0)
    math.min(maxNumBits,
      math.max(64L, math.ceil(-n * math.log(fpp) / (ln2 * ln2)).toLong))
  }

  /** BLOOM-PREFILTERED incremental exact dedup — the membership tier
    * an ingest pipeline runs BEFORE touching the history store. A
    * plain `batch ⟕ history` novelty check re-scans the full history
    * per batch; at 100 TB that is the pipeline's whole cost. Instead:
    *
    *  1. ONE aggregate over the history builds a Bloom filter of
    *     `xxhash64(text)` (Spark's native codegen'd
    *     `BloomFilterAggregate` — map-side partial blooms, one
    *     `mergeInPlace` reduce; the blob is the only thing the driver
    *     holds, capped at [[BloomMaxNumBits]] exactly like Spark's
    *     injected runtime join filters). At a steady cadence the blob
    *     is built once and reused across batches, so the amortized
    *     history cost is zero scans.
    *  2. The batch probes the blob as a LITERAL (codegen'd
    *     `might_contain`, map-side, no shuffle): definite-novel rows
    *     exit immediately — for a mostly-novel corpus that is almost
    *     the whole batch.
    *  3. Only Bloom-POSITIVE rows (true dups + fpp·novel false
    *     positives) reach the exact confirm — a semi-join whose left
    *     side is candidate-sized, not batch-sized, and whose right
    *     side prunes to candidate hash partitions.
    *
    * False positives COST (a row rides to the confirm join) but never
    * LIE (the join decides) — output is bit-identical to the exact
    * novelty check at any fpp, which is what lets the cap degrade the
    * filter gracefully instead of breaking it. NULL-text rows are
    * never duplicates (md5/xxhash of NULL is NULL), matching
    * [[exactDedup]].
    *
    * History beyond what one capped blob discriminates (≳10⁹ rows
    * at useful fpp) shards the same construction by hash range —
    * per-shard blooms each under the cap, batch rows probing their
    * shard's blob — before falling back to the store itself.
    *
    * Returns the batch plus `is_dup` (exact membership of `text` in
    * the history). */
  def bloomNovelty(history: DataFrame, batch: DataFrame,
      expectedItems: Long = 1000000L, fpp: Double = 0.03,
      maxNumBits: Long = BloomMaxNumBits): DataFrame = {
    val blob = bloomBuild(history.select(col("text")), col("text"),
      expectedItems, fpp, maxNumBits)
    bloomNoveltyWith(history, batch, blob)
  }

  /** Step 1 of [[bloomNovelty]] standalone: the serialized Bloom blob
    * over `key` (an empty filter for an empty frame — probes false
    * everywhere, so everything reads as novel). Build once per store
    * epoch, reuse across batches.
    *
    * Built as a direct `treeAggregate` of `sketch.BloomFilter`s —
    * map-side partial blooms, log-depth commutative merge — NOT
    * through `bloom_filter_agg` (which both the native
    * `BloomFilterAggregate` and Spark 4's `stat.bloomFilter` route
    * to): that expression silently clamps `estimatedNumItems` to the
    * session's runtime-filter cap (4 M by default), so at a 10 M-item
    * history it calibrates 12 hash functions for the capped bit
    * budget and OVERSATURATES the filter — the design-point probe
    * measured 11 % false positives where the correctly-calibrated
    * k = 5 gives 4 %. The blob serializes in the exact format the
    * native codegen'd `might_contain` deserializes, so the probe side
    * stays native. */
  def bloomBuild(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double, maxNumBits: Long = BloomMaxNumBits): Array[Byte] = {
    val n = math.max(1L, expectedItems)
    val bits = bloomNumBits(n, fpp, maxNumBits)
    val rdd = df.select(xxhash64(key).as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("__k")).rdd.map(_.getLong(0))
    val bf = rdd.treeAggregate(
      org.apache.spark.util.sketch.BloomFilter.create(n, bits))(
      (f, v) => { f.putLong(v); f },
      (a, b) => a.mergeInPlace(b))
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership probe of a `blob` built by [[bloomBuild]]:
    * `might_contain(blob, xxhash64(key))` with the blob as a literal
    * (the only form the native expression accepts — and the right
    * one: the blob rides the closure once per executor, not per row).
    * SYMMETRIC with the build: both sides wrap `key` in xxhash64, so
    * callers pass the same raw key expression to both. */
  def bloomProbe(blob: Array[Byte], key: Column): Column =
    GraftBridge.column(new BloomFilterMightContain(
      Literal(blob, BinaryType), GraftBridge.expression(xxhash64(key))))

  /** SHARDED blob build — the path past the single blob's bit budget.
    * One capped blob stops discriminating once the history outgrows
    * what [[BloomMaxNumBits]] resolves (≈50 M items at 1 % fpp); here
    * the hash domain is split into `shards` ranges, each folded into
    * its OWN blob sized for `expectedItems / shards` — total bits
    * scale linearly with history while every blob stays under the
    * per-shard cap and k stays calibrated at the TRUE per-shard count.
    * Build is one scan + one batch-of-longs shuffle (hash, not data),
    * then one in-memory fold per shard partition. Returns the blobs
    * in shard order (shard = pmod(xxhash64(key), shards)). */
  def bloomBuildSharded(df: DataFrame, key: Column, shards: Int,
      expectedItems: Long, fpp: Double,
      maxNumBits: Long = BloomMaxNumBits): Seq[Array[Byte]] = {
    require(shards >= 1, "shards >= 1")
    val perShard = math.max(1L, expectedItems / shards)
    val bits = bloomNumBits(perShard, fpp, maxNumBits)
    val pairs = df.select(xxhash64(key).as("h"))
      .filter(col("h").isNotNull)
      .select(pmod(col("h"), lit(shards.toLong)).cast("int").as("s"),
        col("h"))
      .rdd.map(r => (r.getInt(0), r.getLong(1)))
      .partitionBy(new org.apache.spark.HashPartitioner(shards))
    val built = pairs.mapPartitionsWithIndex { (i, it) =>
      val bf = org.apache.spark.util.sketch.BloomFilter.create(perShard, bits)
      it.foreach { case (_, h) => bf.putLong(h) }
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      Iterator((i, bos.toByteArray))
    }.collect().toMap
    (0 until shards).map(built(_))
  }

  /** Probe for a [[bloomBuildSharded]] blob set: the row's hash picks
    * its shard, that shard's literal answers. Built as ONE CaseWhen
    * keyed on the shard expression — per row, branch conditions stop
    * at the matching shard and exactly one `might_contain` evaluates
    * (an OR-reduce would carry every branch's shard test through the
    * predicate as shard counts grow with history). */
  def bloomProbeSharded(blobs: Seq[Array[Byte]], key: Column): Column = {
    require(blobs.nonEmpty, "need at least one shard blob")
    val h = xxhash64(key)
    val s = pmod(h, lit(blobs.size.toLong))
    def probe(b: Array[Byte]): Column =
      GraftBridge.column(new BloomFilterMightContain(
        Literal(b, BinaryType), GraftBridge.expression(h)))
    // pmod over a non-null hash is exhaustive on 0..shards-1, so the
    // last shard is the otherwise branch
    blobs.init.zipWithIndex
      .foldLeft(Option.empty[Column]) { case (acc, (b, i)) =>
        val c = s === i.toLong
        Some(acc.fold(when(c, probe(b)))(_.when(c, probe(b))))
      }
      .fold(probe(blobs.last))(_.otherwise(probe(blobs.last)))
  }

  /** [[bloomNovelty]] over a sharded blob set. Output is exact at any
    * fpp, same as the single-blob form — sharding changes only how
    * much novel traffic leaks into the confirm join. */
  def bloomNoveltySharded(history: DataFrame, batch: DataFrame,
      shards: Int, expectedItems: Long = 1000000L,
      fpp: Double = 0.03): DataFrame = {
    val blobs = bloomBuildSharded(history.select(col("text")),
      col("text"), shards, expectedItems, fpp)
    val candidates = batch
      .filter(col("text").isNotNull &&
        bloomProbeSharded(blobs, col("text")))
      .select(col("doc_id"), col("text"))
    val confirmed = candidates
      .join(history.select(col("text")).filter(col("text").isNotNull),
        Seq("text"), "left_semi")
      .select(col("doc_id"), lit(true).as("is_dup"))
    batch.join(confirmed, Seq("doc_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
  }

  /** Steps 2–3 of [[bloomNovelty]] against a prebuilt blob. */
  def bloomNoveltyWith(history: DataFrame, batch: DataFrame,
      blob: Array[Byte]): DataFrame = {
    if (blob == null) // empty history: everything is novel
      return batch.withColumn("is_dup", lit(false))
    val probe = bloomProbe(blob, col("text"))
    val candidates = batch
      .filter(col("text").isNotNull && probe)
      .select(col("doc_id"), col("text"))
    val confirmed = candidates
      .join(history.select(col("text")).filter(col("text").isNotNull),
        Seq("text"), "left_semi")
      .select(col("doc_id"), lit(true).as("is_dup"))
    batch.join(confirmed, Seq("doc_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
  }
}
