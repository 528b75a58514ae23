package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.pipeline.Dedup

/** Streaming EXACT dedup with a Bloom epoch tier — the continuous
  * form of [[graft.pipeline.Dedup.bloomNovelty]], and the membership
  * architecture a 100 TB rolling ingest actually runs:
  *
  *  - STATE is one (bid, hb)-partitioned parquet frame
  *    `hashes(h, rep)` — the content-hash census of everything ever
  *    admitted (`h` = xxhash64 of text, `rep` the keeper doc, `hb`
  *    the fixed [[HashBuckets]]-way hash bucket that lets confirm
  *    reads prune to candidate buckets). Replay-idempotent the same
  *    way [[DedupStream]]'s near-dup state is: each batch overwrites
  *    exactly its own `bid=` partitions with deterministic rows.
  *  - Every `bloomEvery` batches the accumulated census is folded
  *    into ONE Bloom blob (an EPOCH, covering all `bid <` the epoch
  *    number) via the native distributed aggregate. Per batch, the
  *    probe plan is then: blob literal (codegen'd `might_contain`,
  *    map-side) over the epoch-covered history + an exact join
  *    against only the POST-EPOCH DELTA partitions (the last <
  *    `bloomEvery` batches — batch-scale, not history-scale). The
  *    full history is scanned only by bloom-POSITIVE rows' confirm
  *    join and the epoch rebuilds — at a mostly-novel cadence the
  *    steady-state per-batch cost no longer grows with history.
  *  - False positives cost a confirm-join row, never an answer:
  *    admission is decided by exact joins at every path, so the
  *    survivor set is bit-identical to batch-exact dedup at ANY fpp.
  *  - A REPLAYED batch resolves the newest epoch `<=` its own bid —
  *    an epoch built after it (covering its own rows) is invisible,
  *    so replay sees exactly the pre-crash read set.
  *
  * Per batch the report frame `novel(doc_id, h, is_dup)` lands under
  * `outDir` (`is_dup` = exact-duplicate of history or of an earlier
  * doc in the same batch), and novel hashes append to the census. */
object ExactDedupStream {

  private val hashesSchema = StructType(Seq(
    StructField("h", LongType), StructField("rep", LongType)))

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The census's fixed hash-bucket fanout — the second partition
    * level (`hb = pmod(h, HashBuckets)`) under `bid=`. What it buys:
    * the confirm join's epoch-covered read prunes to the CANDIDATE
    * buckets (hive partition pruning on a driver-bounded ≤
    * HashBuckets-value list), so a mostly-novel batch — few
    * candidates, few touched buckets — reads a FRACTION of the
    * census instead of scanning all of it per batch. Fixed for the
    * store's life: hb values are data, a fanout change would silently
    * mis-prune. */
  val HashBuckets = 64

  /** Census partitions with `geBid <= bid < ltBid`, optionally pruned
    * to the `hb` buckets in `hbIn` (empty frame when none landed
    * yet). */
  def readHashes(spark: SparkSession, stateDir: String, ltBid: Long,
      geBid: Long = 0L, hbIn: Option[Seq[Long]] = None): DataFrame = {
    val dir = s"$stateDir/hashes"
    if (!fsOf(spark, dir).exists(new Path(dir)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], hashesSchema)
    else {
      val base = spark.read.schema(hashesSchema
          .add(StructField("bid", LongType))
          .add(StructField("hb", LongType)))
        .parquet(dir)
        .filter(col("bid") >= geBid && col("bid") < ltBid)
      val pruned = hbIn match {
        case Some(hbs) => base.filter(col("hb").isin(hbs.map(Long.box): _*))
        case None => base
      }
      pruned.select(col("h"), col("rep"))
    }
  }

  /** Newest epoch `<= leBid` and its blob shard set, if any. Epoch N
    * covers all census partitions with `bid < N`; its directory holds
    * `blob-0 .. blob-(B-1)` (B = 1 for the unsharded cadence). */
  def loadBloom(spark: SparkSession, stateDir: String,
      leBid: Long): Option[(Long, Seq[Array[Byte]])] = {
    val f = fsOf(spark, stateDir)
    val base = new Path(s"$stateDir/bloom")
    if (!f.exists(base)) return None
    val epochs = f.listStatus(base).map(_.getPath.getName)
      .filter(_.startsWith("epoch="))
      .flatMap(_.stripPrefix("epoch=").toLongOption)
      .filter(_ <= leBid)
    if (epochs.isEmpty) None
    else {
      val e = epochs.max
      val dir = new Path(base, s"epoch=$e")
      val shards = f.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith("blob-"))
        .flatMap(n => n.stripPrefix("blob-").toIntOption.map(n -> _))
        .sortBy(_._2)
      val blobs = shards.map { case (n, _) =>
        val in = f.open(new Path(dir, n))
        try org.apache.commons.io.IOUtils.toByteArray(in)
        finally in.close()
      }.toSeq
      if (blobs.isEmpty) None else Some((e, blobs))
    }
  }

  /** One micro-batch. Package-visible so the spec can drive replays
    * and epoch boundaries directly. */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
      bid: Long, stateDir: String, outDir: String, bloomEvery: Int,
      expectedItems: Long, fpp: Double, shards: Int = 1): Unit = {
    require(bloomEvery >= 1 && shards >= 1, "bloomEvery >= 1, shards >= 1")
    val b = batch.select(col("doc_id").cast("long").as("doc_id"),
        col("text"))
      .filter(col("text").isNotNull)
      .withColumn("h", xxhash64(col("text")))
    // intra-batch seniority: first (lowest doc_id) per hash is the
    // batch's own candidate; later twins are dups by construction
    val first = b
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .withColumn("__intra", col("__rn") > 1)
    // history membership: bloom-probed over the epoch-covered
    // partitions, exact over the post-epoch delta. Every census read
    // prunes to the probing rows' hash buckets — a driver-bounded
    // (≤ HashBuckets) value list collected from the candidate set, so
    // a mostly-novel batch's confirm join reads a FRACTION of the
    // history instead of scanning all of it per batch.
    def hbOf(df: DataFrame): Seq[Long] =
      df.select(pmod(col("h"), lit(HashBuckets.toLong)).as("hb"))
        .distinct().collect().map(_.getLong(0)).toIndexedSeq
    val dupIds = loadBloom(spark, stateDir, bid) match {
      case Some((e, blobs)) =>
        val cand = first.filter(!col("__intra") &&
          Dedup.bloomProbeSharded(blobs, col("h")))
        val probed = cand
          .join(readHashes(spark, stateDir, e, hbIn = Some(hbOf(cand))),
            Seq("h"), "left_semi")
        val delta = first.filter(!col("__intra"))
          .join(readHashes(spark, stateDir, bid, geBid = e),
            Seq("h"), "left_semi")
        probed.select("doc_id").unionByName(delta.select("doc_id")).distinct()
      case None =>
        val fresh = first.filter(!col("__intra"))
        fresh
          .join(readHashes(spark, stateDir, bid, hbIn = Some(hbOf(fresh))),
            Seq("h"), "left_semi")
          .select("doc_id").distinct()
    }
    val report = first
      .join(dupIds.withColumn("__histdup", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("h"),
        (col("__intra") || coalesce(col("__histdup"), lit(false)))
          .as("is_dup"))
      .localCheckpoint(true) // one compute; appends + report reuse it
    // report FIRST (it reads state lazily; the batch's own append must
    // not land before it materializes — the DedupStream ordering rule,
    // here enforced by the eager checkpoint above)
    report.withColumn("bid", lit(bid)).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bid").parquet(s"$outDir/novel")
    report.filter(!col("is_dup"))
      .select(col("h"), col("doc_id").as("rep"))
      .withColumn("bid", lit(bid))
      .withColumn("hb", pmod(col("h"), lit(HashBuckets.toLong)))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bid", "hb").parquet(s"$stateDir/hashes")
    // epoch rebuild on cadence: fold census < bid+1 into one blob.
    // Replay-safe: the same bid rebuilds the same epoch from the same
    // partitions (bloom bits OR commutatively — content is
    // order-independent), overwriting in place.
    if ((bid + 1) % bloomEvery == 0) {
      val blobs =
        if (shards == 1)
          Seq(Dedup.bloomBuild(readHashes(spark, stateDir, bid + 1),
            col("h"), expectedItems, fpp))
        else
          Dedup.bloomBuildSharded(readHashes(spark, stateDir, bid + 1),
            col("h"), shards, expectedItems, fpp)
      val f = fsOf(spark, stateDir)
      blobs.zipWithIndex.foreach { case (blob, i) =>
        if (blob != null) {
          val p = new Path(s"$stateDir/bloom/epoch=${bid + 1}/blob-$i")
          val out = f.create(p, true)
          try out.write(blob) finally out.close()
        }
      }
    }
  }

  /** Start the lifecycle over a streaming `(doc_id, text)` frame.
    * `shards > 1` switches the epochs to the sharded blob set
    * ([[graft.pipeline.Dedup.bloomBuildSharded]]) — the path when the
    * census outgrows one capped blob's bit budget. */
  def start(docs: DataFrame, stateDir: String, outDir: String,
      checkpointDir: String, bloomEvery: Int = 16,
      expectedItems: Long = 10000000L, fpp: Double = 0.01,
      shards: Int = 1): StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        processBatch(spark, batch, bid, stateDir, outDir, bloomEvery,
          expectedItems, fpp, shards)
      }
      .start()
  }

  private val novelSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("h", LongType),
    StructField("is_dup", BooleanType), StructField("bid", LongType)))

  /** The accumulated novelty report (doc_id, h, is_dup, bid). Read
    * with the explicit schema (the [[DedupStream]] convention) so the
    * `bid=` partition column is LongType whether the store is empty
    * or populated — inference would type it IntegerType. */
  def report(spark: SparkSession, outDir: String): DataFrame = {
    val dir = s"$outDir/novel"
    if (!fsOf(spark, dir).exists(new Path(dir)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], novelSchema)
    else spark.read.schema(novelSchema).parquet(dir)
  }
}
