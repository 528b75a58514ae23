package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline.NearDup
import graft.streaming.DedupStream

/** The streaming near-dup lifecycle: batch-sliced increments must
  * reproduce the whole-corpus batch answer exactly, a replayed batch
  * must be a no-op (bid-partitioned rewrites + bid-filtered state
  * reads), and the MemoryStream wiring must run end-to-end. */
class DedupStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("dedupstream-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  /** Corpus with planted structure: docs (2k, 2k+1) are near-dups (one
    * positional word differs), docs 100+k are exact copies of doc 2k. */
  private def corpus: Seq[(Long, String)] = {
    def base(k: Int, flip: Boolean) = (0 until 12).map { j =>
      if (flip && j == k % 12) s"x$k" else s"w${k}_$j"
    }.mkString(" ")
    (0 until 8).flatMap { k =>
      Seq((2L * k, base(k, flip = false)), (2L * k + 1, base(k, flip = true)))
    } ++ (0 until 4).map(k => (100L + k, base(k, flip = false)))
  }

  private def norm(rows: Array[org.apache.spark.sql.Row]): Seq[(Long, Long, Double)] =
    rows.map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 1e9) / 1e9)).toSeq.sorted

  test("batch-sliced stream reproduces the whole-corpus batch pairs") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("dedupstream").toString
    val (stateDir, pairsDir) = (s"$dir/state", s"$dir/pairs")
    // three uneven slices, arrival ordered by doc_id
    val slices = Seq(corpus.filter(_._1 < 6), corpus.filter(d => d._1 >= 6 && d._1 < 13),
      corpus.filter(_._1 >= 13))
    slices.zipWithIndex.foreach { case (sl, bid) =>
      DedupStream.processBatch(spark, sl.toDF("doc_id", "text"), bid.toLong,
        stateDir, pairsDir, 0.5)
    }
    val streamed = norm(DedupStream.pairs(spark, pairsDir).collect())
    val batch = norm(NearDup.minhashPairs(
      corpus.toDF("doc_id", "text"), 0.5).collect())
    assert(streamed.nonEmpty && streamed === batch)
    // distinct across batches: a pair is emitted exactly once
    assert(streamed.size === streamed.distinct.size)
  }

  test("replaying a batch rewrites its partitions — no duplicates, same state") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("dedupstream-rp").toString
    val (stateDir, pairsDir) = (s"$dir/state", s"$dir/pairs")
    val slices = Seq(corpus.filter(_._1 < 9), corpus.filter(_._1 >= 9))
    slices.zipWithIndex.foreach { case (sl, bid) =>
      DedupStream.processBatch(spark, sl.toDF("doc_id", "text"), bid.toLong,
        stateDir, pairsDir, 0.5)
    }
    val before = norm(DedupStream.pairs(spark, pairsDir).collect())
    val stateBefore = DedupStream.readState(spark, stateDir, Long.MaxValue)
    val countsBefore = Seq(stateBefore.fps, stateBefore.sets,
      stateBefore.bands, stateBefore.members).map(_.count())
    // a crash after batch 1's writes triggers a replay of batch 1
    DedupStream.processBatch(spark, slices(1).toDF("doc_id", "text"), 1L,
      stateDir, pairsDir, 0.5)
    assert(norm(DedupStream.pairs(spark, pairsDir).collect()) === before)
    val stateAfter = DedupStream.readState(spark, stateDir, Long.MaxValue)
    assert(Seq(stateAfter.fps, stateAfter.sets, stateAfter.bands,
      stateAfter.members).map(_.count()) === countsBefore)
  }

  test("a pair-free first batch leaves readable (empty) stores, stream continues") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("dedupstream-empty").toString
    val (stateDir, pairsDir) = (s"$dir/state", s"$dir/pairs")
    // batch 0: all-unique docs → zero pairs → pairsDir is committed but
    // holds no partition dirs; schema-less reads would fail to infer
    val unique = (0 until 4).map(k =>
      (500L + k, (0 until 12).map(j => s"u${k}_$j").mkString(" ")))
    DedupStream.processBatch(spark, unique.toDF("doc_id", "text"), 0L,
      stateDir, pairsDir, 0.5)
    assert(DedupStream.pairs(spark, pairsDir).count() === 0L)
    // batch 1 exactly duplicates a batch-0 doc — the deterministic
    // fingerprint path; the lifecycle must run against the empty-but-
    // committed stores and report the pair
    val nd = Seq((600L, unique.head._2))
    DedupStream.processBatch(spark, nd.toDF("doc_id", "text"), 1L,
      stateDir, pairsDir, 0.5)
    val got = DedupStream.pairs(spark, pairsDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((500L, 600L)))
  }

  test("file-source landing dir: dropped parquet batches dedup continuously") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("dedupstream-land").toString
    val (landing, out) = (s"$dir/landing", s"$dir/out")
    new java.io.File(landing).mkdirs()
    // drop batch files one at a time — each becomes a micro-batch
    corpus.filter(_._1 < 9).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$landing/b0")
    val q = DedupStream.startFromDir(spark, s"$landing/*", out, 0.5)
    try {
      q.processAllAvailable()
      corpus.filter(_._1 >= 9).toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$landing/b1")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = norm(DedupStream.pairs(spark, s"$out/pairs").collect())
    val batch = norm(NearDup.minhashPairs(
      corpus.toDF("doc_id", "text"), 0.5).collect())
    assert(streamed === batch)
  }

  test("MemoryStream wiring runs the lifecycle end-to-end") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("dedupstream-mem").toString
    val mem = MemoryStream[(Long, String)]
    val q = DedupStream.start(mem.toDF().toDF("doc_id", "text"),
      s"$dir/state", s"$dir/pairs", 0.5, s"$dir/ckpt")
    try {
      mem.addData(corpus.filter(_._1 < 9): _*)
      q.processAllAvailable()
      mem.addData(corpus.filter(_._1 >= 9): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = norm(DedupStream.pairs(spark, s"$dir/pairs").collect())
    val batch = norm(NearDup.minhashPairs(
      corpus.toDF("doc_id", "text"), 0.5).collect())
    assert(streamed === batch)
  }

  test("ExactDedupStream: MemoryStream end-to-end with epoch rebuilds") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("xdedup-mem").toString
    val mem = MemoryStream[(Long, String)]
    // bloomEvery = 1: every batch commits an epoch, so the second
    // batch's history membership rides the blob + empty delta path
    val q = graft.streaming.ExactDedupStream.start(
      mem.toDF().toDF("doc_id", "text"), s"$dir/state", s"$dir/out",
      s"$dir/ckpt", bloomEvery = 1, expectedItems = 100L, fpp = 0.01)
    try {
      mem.addData((0L until 20L).map(i => (i, s"t ${i % 8} body")): _*)
      q.processAllAvailable()
      mem.addData((20L until 40L).map(i => (i, s"t ${i % 8} body")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.streaming.ExactDedupStream.report(s, s"$dir/out")
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(got.size === 40)
    assert((0L until 40L).forall(i => got(i) == (i >= 8)),
      s"dup census diverged: $got")
    // census: exactly the 8 distinct texts, keepers 0..7
    val reps = graft.streaming.ExactDedupStream
      .readHashes(s, s"$dir/state", ltBid = 99L)
      .select("rep").as[Long].collect().sorted.toSeq
    assert(reps === (0L until 8L))
  }

  // ---- semantic (embedding) streaming dedup ----

  import graft.pipeline.Similarity
  import graft.streaming.SemDedupStream

  // the mod-13 tail alone repeats with period 13 in i AND aliases
  // across seeds, so "distinct" fixtures could be near-parallel: a
  // per-i leading coordinate breaks same-seed ties and a per-SEED
  // orthogonal marker dimension keeps cross-seed cosines far from 1
  private def svec(seed: Int, i: Long): List[Float] =
    (0 until Similarity.Dim).map(j =>
      if (j == 0) (i + 1).toFloat
      else if (j == 2 + (seed % 10)) 40.0f
      else (((i * 31 + j * 17 + seed) % 13) - 6).toFloat).toList

  test("semantic stream: batches dedup against the accumulated survivors") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("semstream").toString
    val stateDir = s"$dir/state"; val keptDir = s"$dir/kept"
    // seed corpus: 30 well-separated vectors freeze the quantizer and
    // seed the survivor store
    val seedCorpus = (0L until 30L).map(i => (i, svec(2, i)))
      .toDF("vec_id", "embedding")
    SemDedupStream.bootstrap(spark, seedCorpus, stateDir, eps = 0.999,
      coarseK = 2, fineK = 2, coarseIters = 1, fineIters = 1)
    assert(SemDedupStream.survivors(spark, stateDir).count() === 30L)
    // batch 0: 5 scaled copies of stored vectors (semantic dups — same
    // direction) + 3 genuinely new
    val b0 = ((0 until 5).map(i => (500L + i, svec(2, i.toLong * 5)
        .map(_ * 1.5f))) ++
      (0 until 3).map(i => (600L + i, svec(9, i.toLong))))
      .toDF("vec_id", "embedding")
    SemDedupStream.processBatch(spark, b0, 0L, stateDir, keptDir,
      eps = 0.999, capTarget = 16, levels = 1)
    val kept0 = SemDedupStream.kept(spark, keptDir)
      .collect().map(_.getLong(0)).sorted
    assert(kept0.toSeq === (0 until 3).map(600L + _))
    // batch 1: a copy of a batch-0 SURVIVOR (cross-batch dup — the
    // store-senior contract) + one new
    val b1 = Seq((700L, svec(9, 0L).map(_ * 2.0f)), (701L, svec(5, 40L)))
      .toDF("vec_id", "embedding")
    SemDedupStream.processBatch(spark, b1, 1L, stateDir, keptDir,
      eps = 0.999, capTarget = 16, levels = 1)
    val kept1 = SemDedupStream.kept(spark, keptDir)
      .collect().map(_.getLong(0)).sorted
    assert(kept1.toSeq === (0 until 3).map(600L + _) ++ Seq(701L))
    assert(SemDedupStream.survivors(spark, stateDir).count() === 34L)
    // REPLAY batch 1 (crash-after-commit semantics): bid-partitioned
    // rewrite + bid-filtered reads make it a no-op
    SemDedupStream.processBatch(spark, b1, 1L, stateDir, keptDir,
      eps = 0.999, capTarget = 16, levels = 1)
    assert(SemDedupStream.kept(spark, keptDir).count() === 4L)
    assert(SemDedupStream.survivors(spark, stateDir).count() === 34L)
    // the survivor store lays out by (bid, pccid): a batch's state
    // read prunes to its own coarse buckets' directories instead of
    // rescanning the whole store
    val bootPart = new java.io.File(
      s"${SemDedupStream.survivorsDir(spark, stateDir)}/bid=-1")
    val pccidDirs = bootPart.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("pccid="))
    assert(pccidDirs.nonEmpty, bootPart.listFiles().map(_.getName).toSeq)
  }

  test("semantic stream: MemoryStream wiring runs end-to-end") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("semstream-mem").toString
    val seedCorpus = (0L until 20L).map(i => (i, svec(3, i)))
      .toDF("vec_id", "embedding")
    SemDedupStream.bootstrap(spark, seedCorpus, s"$dir/state", eps = 0.999,
      coarseK = 2, fineK = 2, coarseIters = 1, fineIters = 1)
    val mem = MemoryStream[(Long, List[Float])]
    val q = SemDedupStream.start(mem.toDF().toDF("vec_id", "embedding"),
      s"$dir/state", s"$dir/kept", eps = 0.999, s"$dir/ckpt",
      capTarget = 16, levels = 1)
    try {
      // one stored copy (dies) + one new (lives)
      mem.addData((900L, svec(3, 4L).map(_ * 3.0f)), (901L, svec(8, 2L)))
      q.processAllAvailable()
      // the new survivor now kills ITS copy in the next batch
      mem.addData((902L, svec(8, 2L).map(_ * 1.25f)))
      q.processAllAvailable()
    } finally q.stop()
    val kept = SemDedupStream.kept(spark, s"$dir/kept")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(901L))
  }

  test("startMaintained: the drift loop fires inside the stream itself") {
    // the wired-in sibling of the manual maintain(): every
    // maintainEvery batches the lifecycle gauges confinement on the
    // batch's own rows and re-bootstraps under threshold — no operator
    // intervention. Drift arrives in batch 0, the bid-2 maintenance
    // tick sees batch 2's drifted probes gauge at 0.5 and refits; a
    // post-rebuild batch then plants a copy of a batch-0 survivor,
    // which must still collapse, and the final confinement gauge over
    // the original straddlers must be 1.0 — proof the in-stream
    // rebuild actually happened.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sq = s.sqlContext
    val dir = Files.createTempDirectory("semmaint").toString
    def unit(entries: (Int, Double)*): List[Float] = {
      val a = Array.fill(Similarity.Dim)(0.0f)
      entries.foreach { case (i, v) => a(i) = v.toFloat }
      a.toList
    }
    val seed = ((0 until 15).map(i => (2L * i, unit(0 -> 10.0, (1 + i) -> 1.0))) ++
      (0 until 15).map(i => (2L * i + 1, unit(16 -> 10.0, (17 + i) -> 1.0))))
      .toDF("vec_id", "embedding")
    SemDedupStream.bootstrap(spark, seed, s"$dir/state", eps = 0.997,
      coarseK = 2, fineK = 1, coarseIters = 1, fineIters = 1)
    def driftPairs(baseId: Long, baseMarker: Int): Seq[(Long, List[Float])] =
      (0 until 10).flatMap { p =>
        val mk = baseMarker + p
        Seq((baseId + 2 * p, unit(50 -> 100.0, mk -> 50.0, 0 -> 0.5)),
          (baseId + 2 * p + 1,
            unit(50 -> 100.0, mk -> 50.0, (if (p < 5) 16 else 0) -> 0.5)))
      }
    val mem = MemoryStream[(Long, List[Float])]
    val q = SemDedupStream.startMaintained(
      mem.toDF().toDF("vec_id", "embedding"), s"$dir/state", s"$dir/kept",
      eps = 0.997, s"$dir/ckpt", coarseK = 2, fineK = 2, capTarget = 32,
      levels = 1, maintainEvery = 2, minRecall = 0.9, recallK = 1,
      coarseIters = 2, fineIters = 1)
    try {
      mem.addData(driftPairs(100L, 32): _*)          // bid 0: drift lands
      q.processAllAvailable()
      mem.addData((300L, unit(60 -> 10.0)))          // bid 1: benign
      q.processAllAvailable()
      mem.addData(driftPairs(400L, 42): _*)          // bid 2: maintenance
      q.processAllAvailable()                        //   tick → rebuild
      // post-rebuild: a 1.5x copy of batch-0 survivor 100 must die
      // across the quantizer rebuild; a fresh vector lives
      mem.addData((500L, unit(50 -> 150.0, 32 -> 75.0, 0 -> 0.75)),
        (501L, unit(61 -> 10.0)))
      q.processAllAvailable()
    } finally q.stop()
    val kept = SemDedupStream.kept(spark, s"$dir/kept")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(501L) && !kept.contains(500L),
      s"cross-rebuild dup handling broke: $kept")
    // the in-stream rebuild really fired: the original straddlers are
    // now cluster-confined (frozen quantizer would gauge them at 0)
    val probes = driftPairs(100L, 32).filter(_._1 < 110L)
      .toDF("vec_id", "embedding")
    val recall = SemDedupStream.streamRecall(spark, s"$dir/state",
        probes, k = 1)
      .agg(org.apache.spark.sql.functions.avg(
        org.apache.spark.sql.functions.col("recall")))
      .collect().head.getDouble(0)
    assert(recall === 1.0, s"in-stream rebuild missing: gauge $recall")
  }

  test("drift loop: gauge drops on drift, rebootstrap restores confinement") {
    // the stream's quantizer is frozen at bootstrap; this closes its
    // drift loop (the sibling of Similarity.maintainTwoLevelIndex).
    // Engineered drift: the seed corpus lives along e0/e16; the stream
    // then delivers near-identical PAIRS in a region the quantizer
    // never saw (huge e50 + a per-pair marker), each member tilted
    // toward a different frozen cell — so pairs straddle cells, the
    // dedup misses them, and confinement recall collapses. Re-fitting
    // the quantizer to the current survivors pulls the whole drifted
    // region into one cell (the 10:5 tilt imbalance breaks the Lloyd
    // tie) and the gauge returns to 1 — with every pre-rebuild
    // survivor still senior.
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("semdrift").toString
    val stateDir = s"$dir/state"; val keptDir = s"$dir/kept"
    def unit(entries: (Int, Double)*): List[Float] = {
      val a = Array.fill(Similarity.Dim)(0.0f)
      entries.foreach { case (i, v) => a(i) = v.toFloat }
      a.toList
    }
    // two orthogonal seed groups; ids interleaved so the coarse seeds
    // (vec_id 0, 1) land one per group
    val seed = ((0 until 15).map(i => (2L * i, unit(0 -> 10.0, (1 + i) -> 1.0))) ++
      (0 until 15).map(i => (2L * i + 1, unit(16 -> 10.0, (17 + i) -> 1.0))))
      .toDF("vec_id", "embedding")
    SemDedupStream.bootstrap(spark, seed, stateDir, eps = 0.997,
      coarseK = 2, fineK = 1, coarseIters = 1, fineIters = 1)
    assert(SemDedupStream.survivors(spark, stateDir).count() === 30L)
    // drifted batch: 10 pairs at cos ≈ 0.99998 (>= eps). Pairs 0-4
    // straddle the frozen cells (members tilt e0 vs e16); pairs 5-9
    // are same-cell (identical members)
    val b0 = (0 until 10).flatMap { p =>
      val mk = 32 + p
      Seq((100L + 2 * p, unit(50 -> 100.0, mk -> 50.0, 0 -> 0.5)),
        (101L + 2 * p,
          unit(50 -> 100.0, mk -> 50.0, (if (p < 5) 16 else 0) -> 0.5)))
    }.toDF("vec_id", "embedding")
    SemDedupStream.processBatch(spark, b0, 0L, stateDir, keptDir,
      eps = 0.997, capTarget = 32, levels = 1)
    val kept0 = SemDedupStream.kept(spark, keptDir)
      .collect().map(_.getLong(0)).toSet
    // the miss mode drift buys: straddling pairs BOTH survive;
    // same-cell pairs collapse normally
    val straddlers = (0 until 5).flatMap(p => Seq(100L + 2 * p, 101L + 2 * p))
    assert(kept0 === straddlers.toSet ++ (5 until 10).map(p => 100L + 2 * p))
    // gauge below threshold -> maintain refits the quantizer
    val probes = b0.filter(col("vec_id")
      .isin(kept0.toSeq.map(Long.box): _*))
    val (r0, rebuilt0) = SemDedupStream.maintain(spark, stateDir, probes,
      k = 1, minRecall = 0.9, coarseK = 2, fineK = 2,
      coarseIters = 2, fineIters = 1)
    assert(r0 < 0.5, s"drifted gauge should collapse, got $r0")
    assert(rebuilt0)
    // seniority frozen: every survivor is still a survivor
    assert(SemDedupStream.survivors(spark, stateDir).count() === 45L)
    val survIds = SemDedupStream.survivors(spark, stateDir)
      .collect().map(_.getLong(0)).toSet
    assert(kept0.subsetOf(survIds))
    // post-rebuild the drifted region shares a cell: gauge back to 1,
    // and a second maintain leaves the quantizer alone
    val (r1, rebuilt1) = SemDedupStream.maintain(spark, stateDir, probes,
      k = 1, minRecall = 0.9, coarseK = 2, fineK = 2,
      coarseIters = 2, fineIters = 1)
    assert(r1 === 1.0, s"rebuilt gauge should recover, got $r1")
    assert(!rebuilt1)
    // planted dups ACROSS the rebuild: scaled copies of pre-rebuild
    // survivors (one drifted, one seed-era) still collapse against
    // the store; a genuinely new vector lives
    val b1 = Seq(
      (200L, unit(50 -> 150.0, 32 -> 75.0, 0 -> 0.75)), // 1.5x of vec 100
      (201L, unit(0 -> 20.0, 1 -> 2.0)),                // 2x of vec 0
      (202L, unit(60 -> 10.0)))
      .toDF("vec_id", "embedding")
    SemDedupStream.processBatch(spark, b1, 1L, stateDir, keptDir,
      eps = 0.997, capTarget = 32, levels = 1)
    val keptAll = SemDedupStream.kept(spark, keptDir)
      .collect().map(_.getLong(0)).toSet
    assert(keptAll === kept0 + 202L)
    // replay of the post-rebuild batch is a no-op
    SemDedupStream.processBatch(spark, b1, 1L, stateDir, keptDir,
      eps = 0.997, capTarget = 32, levels = 1)
    assert(SemDedupStream.kept(spark, keptDir).count() === 16L)
    assert(SemDedupStream.survivors(spark, stateDir).count() === 46L)
  }

  test("rebootstrap staging: crash debris is invisible, the flip is atomic") {
    // the rewrite stages into a fresh survivors-<uuid> dir and commits
    // quantizer + survivor generation in ONE snapshot pointer rename —
    // so a crash mid-rewrite (modeled here as its debris: a stray
    // staged survivor dir and an unpointed q version dir) leaves the
    // committed state fully readable, and a completed rebootstrap
    // swaps wholesale with the superseded store reclaimed
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("semstage").toString
    val stateDir = s"$dir/state"
    val seed = (0L until 30L).map(i => (i, svec((i % 3).toInt, i)))
      .toDF("vec_id", "embedding")
    SemDedupStream.bootstrap(spark, seed, stateDir, eps = 0.999,
      coarseK = 2, fineK = 2, coarseIters = 1, fineIters = 1)
    val d0 = SemDedupStream.survivorsDir(spark, stateDir)
    val ids0 = SemDedupStream.survivors(spark, stateDir)
      .collect().map(_.getLong(0)).toSet
    // plant crash debris: an abandoned staged survivor store and an
    // uncommitted (never-pointed) quantizer version directory
    new java.io.File(s"$stateDir/survivors-debris/bid=7").mkdirs()
    new java.io.File(s"$stateDir/q/v=99/coarse").mkdirs()
    // readers resolve through the committed pointer: both invisible
    assert(SemDedupStream.survivorsDir(spark, stateDir) === d0)
    assert(SemDedupStream.survivors(spark, stateDir)
      .collect().map(_.getLong(0)).toSet === ids0)
    // a completed rebootstrap commits a NEW generation atomically...
    SemDedupStream.rebootstrap(spark, stateDir, coarseK = 3, fineK = 2)
    val d1 = SemDedupStream.survivorsDir(spark, stateDir)
    assert(d1 !== d0)
    // ...preserving every survivor (seniority frozen), reclaiming the
    // superseded store, and leapfrogging the debris version
    assert(SemDedupStream.survivors(spark, stateDir)
      .collect().map(_.getLong(0)).toSet === ids0)
    assert(!new java.io.File(d0).exists(), s"superseded store $d0 not reclaimed")
    // and the state still serves batches
    val b0 = Seq((200L, svec(7, 1L))).toDF("vec_id", "embedding")
    SemDedupStream.processBatch(spark, b0, 0L, stateDir, s"$dir/kept",
      eps = 0.999, capTarget = 16, levels = 1)
    assert(SemDedupStream.kept(spark, s"$dir/kept")
      .collect().map(_.getLong(0)).toSeq === Seq(200L))
  }
}
