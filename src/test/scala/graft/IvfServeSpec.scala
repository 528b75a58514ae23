package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.{Similarity, Snapshot}

import java.nio.file.Files

/** The published-IVF serving tier: build-once/serve-many must be
  * result-identical to the fused build+query path, multi-table
  * versions must commit atomically, and serving must pin to a version
  * while a rebuild publishes. */
class IvfServeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("ivf-serve-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  private def vectors(n: Int, seed: Int) = {
    val s = spark; import s.implicits._
    (0 until n).map { i =>
      (i.toLong, (0 until Similarity.Dim).map(j =>
        (((i * 31 + j * 17 + seed) % 13) - 6).toFloat).toList)
    }.toDF("vec_id", "embedding")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("served top-k equals the fused build+query path") {
    val dir = Files.createTempDirectory("ivfserve").toString
    val corpus = vectors(200, 0)
    val queries = corpus.filter(col("vec_id") < 3)
    val v = Similarity.publishIvfIndex(corpus, dir)
    assert(v === 1L)
    val served = rows(Similarity.topKIvfServe(spark, dir, queries, 5))
    val direct = rows(Similarity.topKIvfKmeans(corpus, queries, 5))
    assert(served === direct && served.nonEmpty)
  }

  test("multi-table version commits atomically and serves pinned while rebuilt") {
    val dir = Files.createTempDirectory("ivfserve2").toString
    val corpusA = vectors(200, 0)
    val queries = corpusA.filter(col("vec_id") < 3)
    Similarity.publishIvfIndex(corpusA, dir)
    val v1Rows = rows(Similarity.topKIvfServe(spark, dir, queries, 5))
    // rebuild over different data publishes v=2; both tables flip
    // together and v=1 stays pinnable
    val corpusB = vectors(200, 7)
    val v2 = Similarity.publishIvfIndex(corpusB, dir)
    assert(v2 === 2L)
    assert(rows(Similarity.topKIvfServe(spark, dir, queries, 5,
      version = Some(1L))) === v1Rows)
    assert(rows(Similarity.topKIvfServe(spark, dir, queries, 5)) ===
      rows(Similarity.topKIvfKmeans(corpusB, queries, 5)))
    // the version dir carries both tables (single rename committed them)
    assert(Snapshot.readTable(spark, dir, "centroids", Some(2L)).count() ===
      Similarity.KmK.toLong)
    assert(Snapshot.readTable(spark, dir, "assigned", Some(2L)).count() === 200L)
  }

  test("append assigns the delta with published centroids; serve sees old+new") {
    val dir = Files.createTempDirectory("ivfserve3").toString
    val base = vectors(150, 0)
    Similarity.publishIvfIndex(base, dir)
    val s = spark; import s.implicits._
    val delta = vectors(200, 0).filter(col("vec_id") >= 150)
    val v = Similarity.appendToIvfIndex(spark, delta, dir)
    assert(v === 2L)
    // appended index ≡ a fresh assignment of the FULL corpus with the
    // SAME centroids (which the base build froze at k-means over base)
    val queries = base.filter(col("vec_id") < 3)
    val served = rows(Similarity.topKIvfServe(spark, dir, queries, 5))
    val cents = Snapshot.readTable(spark, dir, "centroids", Some(1L))
    val direct = rows(Similarity.topKIvfWith(vectors(200, 0), cents, queries, 5))
    assert(served === direct && served.nonEmpty)
    // and the delta really probes: some appended vector ranks somewhere
    assert(rows(Similarity.topKIvfServe(spark, dir,
      delta.filter(col("vec_id") < 153), 5)).nonEmpty)
  }

  test("index health loop: append drift → recall dip → rebuild restores, atomically") {
    val s = spark; import s.implicits._
    val dim = Similarity.Dim
    def vec(parts: (Int, Double)*): List[Float] = {
      val a = Array.fill(dim)(0.0f)
      parts.foreach { case (i, v) => a(i) = v.toFloat }
      a.toList
    }
    // old corpus: 8 tight clusters on axes e0..e7 (vec c of the first
    // 8 seeds cluster c, so the k-means converges onto the axes)
    val oldCorpus = (0 until 200).map { i =>
      val c = i % 8
      (i.toLong, vec(c -> 10.0, (8 + c) -> (i % 5).toDouble))
    }.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("ivf-health").toString
    val v0 = Similarity.publishIvfIndex(oldCorpus, dir)
    // drift batch: a NEW cluster on e63, orthogonal to every published
    // centroid — append-time assignment ties at cos 0 and dumps it all
    // into bucket 0, the freshness trade's worst case
    val drift = (200 until 268).map { i =>
      (i.toLong, vec(63 -> 10.0, 62 -> (i % 7).toDouble))
    }.toDF("vec_id", "embedding")
    val v1 = Similarity.appendToIvfIndex(s, drift, dir)
    assert(v1 > v0)
    // probe queries: mass on five old axes (their buckets fill all
    // nProbe=4 probe slots) plus a DOMINANT drift component — the true
    // top-k is drift vectors, which sit in the unprobed bucket 0
    val probes = (0 until 5).map { j =>
      (1000L + j, vec(3 -> 10.0, 4 -> 10.0, 5 -> 10.0, 6 -> 10.0,
        7 -> 10.0, 63 -> 30.0, 40 -> (j % 3).toDouble))
    }.toDF("vec_id", "embedding")
    val dipped = Similarity.servedRecall(s, dir, probes, k = 5)
      .agg(avg(col("recall"))).collect().head.getDouble(0)
    assert(dipped < 0.2, s"drift failed to dip recall: $dipped")
    // the loop: measure → below threshold → rebuild through the
    // published-snapshot flip
    val (measured, rebuilt) =
      Similarity.maintainIvfIndex(s, dir, probes, k = 5, minRecall = 0.8)
    assert(measured === dipped)
    assert(rebuilt.exists(_ > v1), "rebuild not triggered or not published")
    val restored = Similarity.servedRecall(s, dir, probes, k = 5)
      .agg(avg(col("recall"))).collect().head.getDouble(0)
    assert(restored >= 0.8, s"rebuild failed to restore recall: $restored")
    // old version still serves pinned (atomic flip, no torn state)
    assert(rows(Similarity.topKIvfServe(s, dir, probes, 5,
      version = Some(v1))).nonEmpty)
    // healthy index: the loop measures and leaves the version alone
    val (healthy, none) =
      Similarity.maintainIvfIndex(s, dir, probes, k = 5, minRecall = 0.8)
    assert(healthy >= 0.8 && none.isEmpty)
  }

  test("two-level assignment with one coarse cell ≡ flat k-means") {
    // coarseK=1 collapses the coarse layer (every vector in cell 0,
    // fine seeds = the global first-fineK vec_ids), so the fine rounds
    // ARE flat Lloyd with K=fineK: assignments must match exactly —
    // same seeds, same quantized math, same tie-breaks
    val corpus = vectors(120, 3)
    val (two, release) = Similarity.twoLevelAssignScoped(
      corpus, coarseK = 1, fineK = 6, coarseIters = 1, fineIters = 2)
    val twoMap = two.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    release()
    val flatMapped = Similarity.kmeans(corpus, k = 6, iters = 2)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoMap.size === 120)
    assert(twoMap === flatMapped)
  }

  test("two-level assignment: total, unique, ids composed from (ccid, fcid)") {
    val corpus = vectors(150, 9)
    val out = Similarity.twoLevelAssign(corpus, coarseK = 4, fineK = 3,
      coarseIters = 2, fineIters = 1).select("vec_id", "ccid", "cid").collect()
    assert(out.length === 150)
    assert(out.map(_.getLong(0)).distinct.length === 150)
    out.foreach { r =>
      val (ccid, cid) = (r.getLong(1), r.getLong(2))
      assert(ccid >= 0 && ccid < 4)
      assert(cid >= ccid * 3 && cid < ccid * 3 + 3, s"cid $cid of ccid $ccid")
    }
  }

  test("two-level IVF serving: probing everything degenerates to exact top-k") {
    // the equivalence law that pins the probe machinery: with
    // probeCoarse = coarseK and probeFine = coarseK·fineK every
    // candidate survives probing, so the result must equal the brute
    // exact tier row for row
    val corpus = vectors(150, 4)
    val queries = corpus.filter(col("vec_id") < 5)
    val (all, release) = Similarity.topKIvfTwoLevelScoped(
      corpus, queries, 8, coarseK = 3, fineK = 4, coarseIters = 1,
      fineIters = 1, probeCoarse = 3, probeFine = 12)
    val got = rows(all)
    release()
    assert(got === rows(Similarity.topKExact(corpus, queries, 8)))
    assert(got.nonEmpty)
    // narrow probing returns at most k per query and only real rows
    val (narrow, rel2) = Similarity.topKIvfTwoLevelScoped(
      corpus, queries, 8, coarseK = 3, fineK = 4, coarseIters = 1,
      fineIters = 1, probeCoarse = 1, probeFine = 2)
    val nr = rows(narrow)
    rel2()
    assert(nr.groupBy(_._1).forall(_._2.size <= 8))
    assert(nr.forall(r => r._3 >= 0 && r._3 < 150))
  }

  test("published two-level index: serve ≡ fused build+probe, version pinned") {
    val corpus = vectors(160, 6)
    val queries = corpus.filter(col("vec_id") < 5)
    val dir = Files.createTempDirectory("tl-index").toString
    val v0 = Similarity.publishTwoLevelIndex(corpus, dir,
      coarseK = 3, fineK = 4, coarseIters = 1, fineIters = 1)
    val served = rows(Similarity.topKIvfTwoLevelServe(spark, dir,
      queries, 6, probeCoarse = 2, probeFine = 4))
    val (fused, release) = Similarity.topKIvfTwoLevelScoped(
      corpus, queries, 6, coarseK = 3, fineK = 4, coarseIters = 1,
      fineIters = 1, probeCoarse = 2, probeFine = 4)
    val direct = rows(fused)
    release()
    assert(served === direct && served.nonEmpty)
    // a rebuild publishes the next version; the old one still serves
    val v1 = Similarity.publishTwoLevelIndex(corpus.filter(col("vec_id") < 100),
      dir, coarseK = 3, fineK = 4, coarseIters = 1, fineIters = 1)
    assert(v1 > v0)
    assert(rows(Similarity.topKIvfTwoLevelServe(spark, dir, queries, 6,
      probeCoarse = 2, probeFine = 4, version = Some(v0))) === direct)
  }

  test("two-level index lifecycle: append drift → recall dip → rebuild restores") {
    val s = spark; import s.implicits._
    val dim = Similarity.Dim
    def vec(parts: (Int, Double)*): List[Float] = {
      val a = Array.fill(dim)(0.0f)
      parts.foreach { case (i, v) => a(i) = v.toFloat }
      a.toList
    }
    // same engineered geometry as the flat health-loop case, through
    // the two-level publish/serve/append path (fineK=1 ⇒ fine cells
    // mirror the coarse buckets, so the dip construction carries over)
    val oldCorpus = (0 until 200).map { i =>
      val c = i % 8
      (i.toLong, vec(c -> 10.0, (8 + c) -> (i % 5).toDouble))
    }.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("tl-health").toString
    val v0 = Similarity.publishTwoLevelIndex(oldCorpus, dir,
      coarseK = 8, fineK = 1, coarseIters = 2, fineIters = 1)
    val drift = (200 until 268).map { i =>
      (i.toLong, vec(63 -> 10.0, 62 -> (i % 7).toDouble))
    }.toDF("vec_id", "embedding")
    val v1 = Similarity.appendToTwoLevelIndex(s, drift, dir)
    assert(v1 > v0)
    // append used the published quantizer: the delta is served without
    // a rebuild (old + new rows both reachable)
    assert(Snapshot.readTable(s, dir, "assigned").count() === 268L)
    val probes = (0 until 5).map { j =>
      (1000L + j, vec(3 -> 10.0, 4 -> 10.0, 5 -> 10.0, 6 -> 10.0,
        7 -> 10.0, 63 -> 30.0, 40 -> (j % 3).toDouble))
    }.toDF("vec_id", "embedding")
    def recall(): Double = Similarity.servedRecallTwoLevel(s, dir, probes,
        k = 5, probeCoarse = 4, probeFine = 4)
      .agg(avg(col("recall"))).collect().head.getDouble(0)
    val dipped = recall()
    assert(dipped < 0.2, s"drift failed to dip recall: $dipped")
    val (measured, rebuilt) = Similarity.maintainTwoLevelIndex(s, dir,
      probes, k = 5, minRecall = 0.8, coarseK = 8, fineK = 1,
      coarseIters = 2, fineIters = 1, probeCoarse = 4, probeFine = 4)
    assert(measured === dipped)
    assert(rebuilt.exists(_ > v1))
    val restored = recall()
    assert(restored >= 0.8, s"rebuild failed to restore recall: $restored")
    // healthy: measured and left alone
    val (healthy, none) = Similarity.maintainTwoLevelIndex(s, dir,
      probes, k = 5, minRecall = 0.8, coarseK = 8, fineK = 1,
      coarseIters = 2, fineIters = 1, probeCoarse = 4, probeFine = 4)
    assert(healthy >= 0.8 && none.isEmpty)
  }

  test("scalable SemDeDup: degenerate corpus collapses, non-dup corpus untouched") {
    val s = spark; import s.implicits._
    // degenerate: every vector a tiny perturbation of one base — flat
    // semDedup's worst case (one cluster, all-pairs). The cap chunks
    // it; two refinement levels must collapse it to ~one keeper.
    val n = 300
    val degenerate = (0 until n).map { i =>
      (i.toLong, (0 until Similarity.Dim).map(j =>
        (10.0 + j + i * 1e-5).toFloat).toList)
    }.toDF("vec_id", "embedding")
    val (kept, release) = Similarity.semDedupScalableScoped(
      degenerate, eps = 0.999, coarseK = 2, fineK = 2, coarseIters = 1,
      fineIters = 1, capTarget = 16, levels = 2)
    val survivors = kept.select("vec_id").collect().map(_.getLong(0)).sorted
    release()
    // vec 0 is the globally senior keeper and must survive; the chunk
    // keepers of level 1 meet at level 2 and collapse further — the
    // count must be far below the ~n/capTarget level-1 ceiling
    assert(survivors.head === 0L)
    assert(survivors.length <= 4,
      s"degenerate corpus left ${survivors.length} survivors")
    // eps above any attainable cosine ⇒ nothing dropped
    val all = Similarity.semDedupScalable(vectors(80, 5), eps = 1.1,
      coarseK = 2, fineK = 2, coarseIters = 1, fineIters = 1,
      capTarget = 8, levels = 2)
    assert(all.count() === 80L)
  }

  test("K dispatch: flat tier refuses large K, auto entries route around it") {
    val corpus = vectors(120, 7)
    // the flat tier's contract bound is enforced loudly, with a
    // pointer at the scalable sibling — not a silent driver bounce
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeans(corpus, k = Similarity.FlatKMax + 1, iters = 1)
        .count()
    }
    assert(e.getMessage.contains("two-level"))
    intercept[IllegalArgumentException] {
      Similarity.semDedup(corpus, eps = 0.999,
        k = Similarity.FlatKMax + 1).count()
    }
    // the auto entries succeed at the SAME K — which proves they took
    // the two-level route, since the flat sibling throws there
    val clustered = Similarity.kmeansAuto(corpus,
      k = Similarity.FlatKMax + 1, iters = 1)
    assert(clustered.count() === 120L)
    assert(clustered.select("vec_id").distinct().count() === 120L)
    val kept = Similarity.semDedupAuto(corpus, eps = 1.1,
      k = Similarity.FlatKMax + 1, iters = 1, capTarget = 16)
    assert(kept.count() === 120L) // eps above attainable cosine: no drops
    // and below the bound auto ≡ flat exactly (same tier, same answer)
    val autoSmall = Similarity.kmeansAuto(corpus, k = 6, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flatSmall = Similarity.kmeans(corpus, k = 6, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(autoSmall === flatSmall)
  }

  test("incremental SemDeDup: batch dedups against the published survivors") {
    val s = spark; import s.implicits._
    // store: 40 well-separated vectors, published as the survivor index
    val store = vectors(40, 2)
    val dir = Files.createTempDirectory("sem-inc").toString
    val v0 = Similarity.publishTwoLevelIndex(store, dir,
      coarseK = 2, fineK = 2, coarseIters = 1, fineIters = 1)
    // batch: 10 near-dups of stored vectors (scaled copies — identical
    // direction, cosine 1), 2 within-batch near-dup twins of one NEW
    // vector, and 5 genuinely new vectors
    val storeRows = store.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val nearStored = (0 until 10).map(i =>
      (1000L + i, storeRows(i.toLong * 3).map(x => x * 1.5f).toList))
    val newDir = (0 until Similarity.Dim).map(j =>
      if (j % 2 == 0) 7.0f else -3.0f).toList
    val batchTwins = Seq((1100L, newDir), (1101L, newDir.map(_ * 2.0f)))
    val genuinelyNew = (0 until 5).map(i =>
      (1200L + i, (0 until Similarity.Dim).map(j =>
        (((i * 13 + j * 29 + 7) % 17) - 8).toFloat).toList))
    val batch = (nearStored ++ batchTwins ++ genuinelyNew)
      .toDF("vec_id", "embedding")
    val (kept, release) = Similarity.semDedupIncrementScoped(
      s, dir, batch, eps = 0.999, capTarget = 16, levels = 1)
    val surv = kept.select("vec_id").collect().map(_.getLong(0)).sorted
    release()
    // stored seniors kill the 10 copies; the twin pair keeps its
    // senior; the 5 new vectors survive
    assert(surv.toSeq === (Seq(1100L) ++ (0 until 5).map(1200L + _)))
    // append publishes store ∪ survivors; re-running the SAME batch
    // against the new version drops everything (now all near stored)
    val (n, v1) = Similarity.semDedupAppend(s, dir, batch,
      eps = 0.999, capTarget = 16, levels = 1)
    assert(n === 6L && v1 > v0)
    assert(Snapshot.readTable(s, dir, "assigned").count() === 46L)
    val (again, rel2) = Similarity.semDedupIncrementScoped(
      s, dir, batch, eps = 0.999, capTarget = 16, levels = 1)
    assert(again.count() === 0L)
    rel2()
  }

  test("publishTables rejects unusable table names") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "x")).toDF("id", "t")
    intercept[IllegalArgumentException] {
      Snapshot.publishTables(Seq("a/b" -> df), "/tmp/unused")
    }
    intercept[IllegalArgumentException] {
      Snapshot.publishTables(Seq.empty, "/tmp/unused")
    }
  }
}
