package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.pipeline.{Similarity, Snapshot}

/** Streaming SEMANTIC dedup lifecycle — [[DedupStream]]'s sibling for
  * the embedding column: a vector stream dedups continuously against
  * the accumulated survivor set, without ever rescanning it.
  * [[graft.pipeline.Similarity.semDedupIncrementScoped]]'s shape wired
  * into `foreachBatch` with parquet-backed, batch-id-partitioned state.
  *
  * The quantizer (two-level k-means: √K coarse tier + per-cell fine
  * centroids) is FROZEN at [[bootstrap]] — the streaming path pays only
  * the delta assignment per batch, the same freshness trade as
  * [[graft.pipeline.Similarity.appendToIvfIndex]]; re-bootstrap when a
  * recall/drift gauge says the quantizer no longer fits the stream.
  *
  * Exactly-once under micro-batch replay, the [[DedupStream]] story:
  * survivor appends and the kept-output frame write under `bid=<batch>`
  * partitions via dynamic overwrite, so a replayed batch REWRITES its
  * own partitions; state reads filter `bid < currentBid`, so a replay
  * whose previous attempt died after a partial write still sees exactly
  * the state the first attempt saw.
  *
  * Stream semantics: ARRIVAL order is seniority — stored survivors are
  * immutable and kill matching newcomers regardless of vec_id (the
  * store-senior contract of the incremental API); within one batch the
  * min-vec_id keeper rule applies, chunk-capped.
  */
object SemDedupStream {

  private val survivorSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType)),
    StructField("ccid", LongType),
    StructField("cid", LongType)))

  /** Coarse-bucket partition key for the survivor store: survivors lay
    * out by (bid, pccid = ccid mod [[PccidBuckets]]), so a batch's
    * state read PRUNES to the partition directories of its own coarse
    * cells — without it, every micro-batch rescans the whole survivor
    * store, a per-batch cost that grows with the corpus instead of
    * the batch. 64 buckets caps directory fan-out per batch while
    * keeping pruning ~batch-cell selective at any coarseK. */
  private val PccidBuckets = 64L
  private def pccidOf(ccid: Column): Column = pmod(ccid, lit(PccidBuckets))

  private def readFrame(spark: SparkSession, dir: String,
      schema: StructType, ltBid: Long,
      partCols: Seq[StructField] = Seq(StructField("bid", LongType)),
      extraFilter: Option[Column] = None): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else {
      val full = partCols.foldLeft(schema)(_ add _)
      val base = spark.read.schema(full).parquet(dir)
        .filter(col("bid") < ltBid)
      extraFilter.fold(base)(base.filter)
        .select(schema.fieldNames.map(col).toSeq: _*)
    }
  }

  private def writePartition(df: DataFrame, bid: Long, dir: String,
      alsoBy: Seq[String] = Seq.empty): Unit =
    df.withColumn("bid", lit(bid)).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bid" +: alsoBy: _*).parquet(dir)

  private val survivorParts = Seq(StructField("bid", LongType),
    StructField("pccid", LongType))

  // ------------------------- state layout ----------------------------
  //
  //   $stateDir/q/v=N/{coarse,cells,meta}/   quantizer snapshot
  //                                          ([[Snapshot.publishTables]]:
  //                                          `_latest` pointer commits all
  //                                          three tables atomically)
  //   $stateDir/survivors-<uuid>/bid=*/pccid=*/
  //                                          survivor store; WHICH uuid is
  //                                          live is a `meta` row of the
  //                                          committed quantizer version
  //
  // The survivor-dir name riding in the committed meta is what makes
  // [[rebootstrap]] crash-safe: the rewrite stages the re-assigned
  // survivors into a FRESH directory and the single pointer rename
  // flips quantizer + survivor generation together — there is no
  // window where the old store is deleted but the new one is not yet
  // committed, and a crash at ANY point leaves the previous committed
  // state fully intact (debris is reclaimed on the next publish).

  private def qDir(stateDir: String) = s"$stateDir/q"

  /** The committed state: (coarse centroids, cells frame, fineK,
    * survivor-store path) — all read at ONE snapshot version, so a
    * reader can never mix a new quantizer with an old survivor set. */
  private def readState(spark: SparkSession, stateDir: String)
      : (Seq[(Long, Seq[Double])], DataFrame, Int, String) = {
    val v = Snapshot.latestVersion(spark, qDir(stateDir)).getOrElse(
      throw new IllegalStateException(
        s"no committed SemDedupStream state under $stateDir — bootstrap first"))
    val meta = Snapshot.readTable(spark, qDir(stateDir), "meta", Some(v))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val coarse = Snapshot.readTable(spark, qDir(stateDir), "coarse", Some(v))
      .select(col("ccid").cast("long"),
        transform(col("ccent"), _.cast("double")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)
    (coarse, Snapshot.readTable(spark, qDir(stateDir), "cells", Some(v)),
      meta("fineK").toInt, s"$stateDir/${meta("survivorsDir")}")
  }

  /** Publish quantizer tables + the live survivor-dir name as one
    * atomic snapshot version. */
  private def publishState(spark: SparkSession, stateDir: String,
      coarse: DataFrame, cells: DataFrame, fineK: Int,
      survName: String): Unit = {
    import spark.implicits._
    Snapshot.publishTables(Seq(
      "coarse" -> coarse,
      "cells" -> cells,
      "meta" -> Seq("fineK" -> fineK.toString, "survivorsDir" -> survName)
        .toDF("key", "value")), qDir(stateDir))
    ()
  }

  /** The live survivor-store directory (spec + ops visibility). */
  private[graft] def survivorsDir(spark: SparkSession,
      stateDir: String): String = readState(spark, stateDir)._4

  /** Freeze the quantizer from a seed corpus, dedup that corpus, and
    * seed the survivor store (under `bid = -1`, before any streaming
    * batch). Must run once before [[start]]. The state only exists
    * once the snapshot pointer commits — a crash mid-bootstrap leaves
    * no committed state and a clean re-run. */
  def bootstrap(spark: SparkSession, corpus: DataFrame, stateDir: String,
      eps: Double, coarseK: Int, fineK: Int, coarseIters: Int = 1,
      fineIters: Int = 1, capTarget: Int = 1024, levels: Int = 2): Unit = {
    import spark.implicits._
    val ix = Similarity.twoLevelIndex(corpus, coarseK, fineK,
      coarseIters, fineIters)
    try {
      val (kept, release) =
        Similarity.semDedupChunkedScoped(ix.assigned, eps, capTarget, levels)
      try {
        val survivors = ix.assigned
          .join(kept.select(col("vec_id")), Seq("vec_id"))
          .select(col("vec_id"),
            transform(col("embedding"), _.cast("double")).as("embedding"),
            col("ccid"), col("cid"), pccidOf(col("ccid")).as("pccid"))
        val survName = s"survivors-${UUID.randomUUID()}"
        writePartition(survivors, -1L, s"$stateDir/$survName",
          alsoBy = Seq("pccid"))
        publishState(spark, stateDir, ix.coarse.toDF("ccid", "ccent"),
          ix.cells, fineK, survName)
      } finally { release(); () }
    } finally { ix.release(); () }
  }

  /** One micro-batch: read survivors (< bid), delta-assign, drop
    * batch rows with a stored ε-neighbor in their cluster, dedup the
    * remainder chunk-capped, append the batch's survivors. Package-
    * visible so the spec can drive replays directly. */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
      bid: Long, stateDir: String, keptDir: String, eps: Double,
      capTarget: Int, levels: Int): Unit = {
    val (coarse, cells, fineK, survDir) = readState(spark, stateDir)
    val bAssigned = Similarity.assignWithQuantizer(coarse, cells, fineK,
      batch.select(col("vec_id").cast("long").as("vec_id"), col("embedding")))
      .persist()
    try {
      // the batch's coarse buckets — ≤ PccidBuckets values, a bounded
      // driver bounce — prune the survivor read to their partition
      // dirs: the state scan costs ~the batch's cells, not the corpus
      val batchPccids = bAssigned
        .select(pccidOf(col("ccid")).as("pccid")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val stored = readFrame(spark, survDir, survivorSchema,
        bid, survivorParts,
        extraFilter = Some(col("pccid").isin(batchPccids.map(Long.box): _*)))
      val vsStore = bAssigned
        .join(stored.select(col("cid"), col("embedding").as("se")), Seq("cid"))
        .filter(Similarity.cosine(col("embedding"), col("se")) >= eps)
        .select(col("vec_id")).distinct()
      val fresh = bAssigned.join(vsStore, Seq("vec_id"), "left_anti")
      val (kept, release) =
        Similarity.semDedupChunkedScoped(fresh, eps, capTarget, levels)
      try {
        val keptRows = fresh.join(kept.select(col("vec_id")), Seq("vec_id"))
          .select(col("vec_id"),
            transform(col("embedding"), _.cast("double")).as("embedding"),
            col("ccid"), col("cid"), pccidOf(col("ccid")).as("pccid"))
        writePartition(kept.select(col("vec_id"), col("cid")), bid, keptDir)
        writePartition(keptRows, bid, survDir, alsoBy = Seq("pccid"))
      } finally { release(); () }
    } finally { bAssigned.unpersist(); () }
  }

  /** Start the lifecycle over a streaming `(vec_id, embedding)` frame
    * against a [[bootstrap]]ped state dir. `keptDir` accumulates the
    * accepted (vec_id, cid) rows per batch. */
  def start(vecs: DataFrame, stateDir: String, keptDir: String,
      eps: Double, checkpointDir: String, capTarget: Int = 1024,
      levels: Int = 1): StreamingQuery = {
    val spark = vecs.sparkSession
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        processBatch(spark, batch, bid, stateDir, keptDir, eps,
          capTarget, levels)
      }
      .start()
  }

  /** [[start]] with the drift loop WIRED IN: every `maintainEvery`
    * batches (after that batch commits its stores), gauge
    * cluster-confinement recall on a deterministic sample of the
    * batch's own rows — the most recent arrivals, exactly where drift
    * shows first — and [[rebootstrap]] below `minRecall`. The check
    * runs inside `foreachBatch`, i.e. between micro-batches from the
    * state dir's point of view, which is the quiescence the rebuild
    * needs; a replayed maintenance batch re-runs the gauge and at
    * worst re-fits the same quantizer from the same survivors —
    * idempotent like the batch itself. */
  def startMaintained(vecs: DataFrame, stateDir: String, keptDir: String,
      eps: Double, checkpointDir: String, coarseK: Int, fineK: Int,
      capTarget: Int = 1024, levels: Int = 1, maintainEvery: Int = 8,
      minRecall: Double = 0.7, recallK: Int = 1, probeRows: Int = 64,
      coarseIters: Int = 1, fineIters: Int = 1): StreamingQuery = {
    require(maintainEvery > 0, "maintainEvery must be positive")
    val spark = vecs.sparkSession
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        processBatch(spark, batch, bid, stateDir, keptDir, eps,
          capTarget, levels)
        if (bid > 0 && bid % maintainEvery == 0) {
          val probes = batch
            .select(col("vec_id").cast("long").as("vec_id"),
              col("embedding"))
            .orderBy(col("vec_id")).limit(probeRows)
          maintain(spark, stateDir, probes, recallK, minRecall,
            coarseK, fineK, coarseIters, fineIters)
          ()
        }
      }
      .start()
  }

  /** Start over a parquet LANDING DIRECTORY of `(vec_id, embedding)`
    * files — the continuous-ingest deployment shape, as
    * [[DedupStream.startFromDir]]. */
  def startFromDir(spark: SparkSession, landingDir: String, outDir: String,
      eps: Double, maxFilesPerTrigger: Int = 8, capTarget: Int = 1024,
      levels: Int = 1): StreamingQuery = {
    val vecs = spark.readStream
      .schema(StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
    start(vecs, s"$outDir/state", s"$outDir/kept", eps, s"$outDir/ckpt",
      capTarget, levels)
  }

  // ------------------- drift gauge + re-bootstrap -------------------

  /** Survivor store WITH its partition columns — what a full rewrite
    * ([[rebootstrap]]) must preserve (bid keeps replay idempotence). */
  private def survivorsFull(spark: SparkSession, survDir: String): DataFrame =
    readFrame(spark, survDir,
      survivorParts.foldLeft(survivorSchema)(_ add _), Long.MaxValue,
      partCols = Seq.empty)

  /** Cluster-confinement recall of the FROZEN quantizer over the
    * current survivor set — the drift gauge the batch index family
    * has ([[graft.pipeline.Similarity.servedRecallTwoLevel]]), for the
    * stream. Dedup confines the pair search to ONE fine cell per
    * vector, so the gauge defaults to `probeCoarse = probeFine = 1`:
    * "searching only a probe's assigned cell, how much of its exact
    * top-k over the survivors is in reach?" A drifted stream packs
    * new arrivals into cells trained on the old distribution and the
    * gauge drops — dups start landing across cell boundaries, which
    * is exactly the miss mode freezing the quantizer buys. Returns
    * (qid, n_hits, recall) per probe. */
  def streamRecall(spark: SparkSession, stateDir: String,
      probes: DataFrame, k: Int, probeCoarse: Int = 1,
      probeFine: Int = 1): DataFrame = {
    val (coarse, cells, fineK, survDir) = readState(spark, stateDir)
    val surv = survivorsFull(spark, survDir)
      .select(col("vec_id"), col("embedding"), col("ccid"), col("cid"))
    val ix = Similarity.TwoLevelIndex(surv, cells, coarse, () => ())
    Similarity.recallJoin(
      Similarity.topKExact(surv.select(col("vec_id"), col("embedding")),
        probes, k),
      Similarity.probeTwoLevel(ix, probes, k, fineK, probeCoarse, probeFine))
  }

  /** Re-fit the quantizer to the CURRENT survivor set and re-assign
    * every survivor under it — the stream's answer to drift, sibling
    * of [[graft.pipeline.Similarity.maintainTwoLevelIndex]]'s rebuild
    * arm. Seniority is FROZEN: survivors stay survivors (no re-dedup
    * of the store — the accepted set is immutable history, exactly as
    * arrival-order seniority promises); only their cell assignments
    * move. Each survivor keeps its original `bid` partition, so a
    * replayed batch still reads exactly the pre-`bid` state and
    * rewrites only its own partitions — replay idempotence survives
    * the rebuild. Run BETWEEN micro-batches (stream stopped or
    * quiescent).
    *
    * Crash-safe by STAGING, not in-place overwrite: the re-assigned
    * survivors write into a fresh `survivors-<uuid>` directory (the
    * old store is never deleted, so a lost cache block or retried
    * stage re-reads intact input), and the quantizer tables + the new
    * directory's name commit together in ONE snapshot pointer rename
    * ([[publishState]]). A crash anywhere mid-rewrite leaves the
    * previous committed state untouched; the superseded store and any
    * staged debris are reclaimed after the flip. */
  def rebootstrap(spark: SparkSession, stateDir: String, coarseK: Int,
      fineK: Int, coarseIters: Int = 1, fineIters: Int = 1): Unit = {
    import spark.implicits._
    val (_, _, _, oldSurvDir) = readState(spark, stateDir)
    val surv = survivorsFull(spark, oldSurvDir).persist()
    try {
      val ix = Similarity.twoLevelIndex(
        surv.select(col("vec_id"), col("embedding")), coarseK, fineK,
        coarseIters, fineIters)
      try {
        val reassigned = ix.assigned
          .select(col("vec_id"), col("embedding"), col("ccid"), col("cid"))
          .join(surv.select(col("vec_id"), col("bid")), Seq("vec_id"))
          .withColumn("pccid", pccidOf(col("ccid")))
        // stage into a FRESH dir (plain write, no overwrite of live
        // state), then flip quantizer + survivor generation atomically
        val survName = s"survivors-${UUID.randomUUID()}"
        reassigned.write.partitionBy("bid", "pccid")
          .parquet(s"$stateDir/$survName")
        publishState(spark, stateDir, ix.coarse.toDF("ccid", "ccent"),
          ix.cells, fineK, survName)
        // post-commit cleanup: the superseded survivor store (safe —
        // the stream is quiescent and every reader resolves the dir
        // through the committed meta) and old quantizer versions
        val fs = new org.apache.hadoop.fs.Path(oldSurvDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(oldSurvDir), true)
        Snapshot.vacuum(spark, qDir(stateDir), keepVersions = 1)
        ()
      } finally { ix.release(); () }
    } finally { surv.unpersist(); () }
  }

  /** The maintenance loop: gauge cluster-confinement recall on
    * `probes`; below `minRecall`, [[rebootstrap]]. Returns (measured
    * mean recall, true iff rebuilt) — run it between batches at a
    * maintenance cadence, the streaming sibling of
    * [[graft.pipeline.Similarity.maintainTwoLevelIndex]]. */
  def maintain(spark: SparkSession, stateDir: String, probes: DataFrame,
      k: Int, minRecall: Double, coarseK: Int, fineK: Int,
      coarseIters: Int = 1, fineIters: Int = 1): (Double, Boolean) = {
    require(minRecall >= 0, "minRecall must be non-negative")
    val mean = streamRecall(spark, stateDir, probes, k)
      .agg(avg(col("recall"))).collect().head match {
        case r if r.isNullAt(0) => 1.0
        case r => r.getDouble(0)
      }
    if (mean < minRecall) {
      rebootstrap(spark, stateDir, coarseK, fineK, coarseIters, fineIters)
      (mean, true)
    } else (mean, false)
  }

  /** All accepted vectors so far (vec_id, cid). */
  def kept(spark: SparkSession, keptDir: String): DataFrame =
    readFrame(spark, keptDir, StructType(Seq(
      StructField("vec_id", LongType), StructField("cid", LongType))),
      Long.MaxValue)

  /** The current survivor set (vec_id, cid), bootstrap seed included. */
  def survivors(spark: SparkSession, stateDir: String): DataFrame =
    readFrame(spark, readState(spark, stateDir)._4, survivorSchema,
      Long.MaxValue, survivorParts)
      .select(col("vec_id"), col("cid"))
}
