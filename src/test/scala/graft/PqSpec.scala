package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.Similarity

import java.nio.file.Files

/** Product quantization (PQ): codebook training, 4-byte encode, ADC
  * and IVF-ADC serving — determinism, duplicate-collapse, and the
  * cluster-structure retrieval property ADC exists for. */
class PqSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("pq-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  /** `groups` well-separated cluster centers (one-hot stripes of
    * magnitude 5) with small deterministic jitter — retrieval
    * structure is unambiguous by construction. */
  private def clustered(n: Int, groups: Int) = {
    val s = spark; import s.implicits._
    (0 until n).map { i =>
      val g = i % groups
      (i.toLong, (0 until Similarity.Dim).map { j =>
        val base = if (j % groups == g) 5f else 0f
        base + (((i * 31 + j * 17) % 7) - 3) * 0.05f
      }.toList)
    }.toDF("vec_id", "embedding")
  }

  test("codebooks: one per subspace, <= Ksub codewords, deterministic") {
    val corpus = clustered(120, 4)
    val b1 = Similarity.pqCodebooks(corpus)
    val b2 = Similarity.pqCodebooks(corpus)
    assert(b1.size === Similarity.PqM)
    b1.foreach { sub =>
      assert(sub.nonEmpty && sub.size <= Similarity.PqKsub)
      assert(sub.forall(_._2.size === Similarity.PqDsub))
      assert(sub.map(_._1) === sub.map(_._1).sorted)
    }
    assert(b1 === b2)
  }

  test("exact duplicates encode to identical codes and code_key") {
    val base = clustered(100, 4)
    val twins = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(twins)
    val books = Similarity.pqCodebooks(base)
    val enc = Similarity.pqEncode(corpus, books)
      .select("vec_id", "code_key").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach { i =>
      assert(enc(i) === enc(i + 1000), s"twin of $i diverged")
    }
    // code_key is a bijection of the code array: 8 codes x 4 bits
    assert(enc.values.forall(k => k >= 0 && k < (1L << 32)))
  }

  test("ADC top-k retrieves the query's own cluster") {
    val corpus = clustered(120, 4)
    val queries = corpus.filter(col("vec_id") < 3)
    val books = Similarity.pqCodebooks(corpus)
    val top = Similarity.topKPqAdc(corpus, queries, 5, books)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(top.length === 15)
    top.foreach { case (qid, vid) =>
      assert(vid % 4 === qid % 4,
        s"ADC pulled $vid (group ${vid % 4}) for query $qid")
    }
  }

  test("IVF-PQ agrees with flat ADC scores and probes only buckets") {
    val corpus = clustered(120, 4)
    val queries = corpus.filter(col("vec_id") < 3)
    val books = Similarity.pqCodebooks(corpus)
    val flat = Similarity.topKPqAdc(corpus, queries, 10, books)
      .select("qid", "vec_id", "adot").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.topKIvfPq(corpus, queries, 10, books)
      .select("qid", "vec_id", "adot").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(ivf.nonEmpty)
    // every IVF-PQ (query, candidate) score is the flat ADC score —
    // the bucket tier changes the candidate set, never the metric
    ivf.foreach { case (k, adot) =>
      flat.get(k).foreach(f => assert(f === adot, s"score diverged at $k"))
    }
    // probing bounds the candidate pool: the scan behind each query
    // covers at most IvfProbe buckets of the corpus, so every result
    // must come from the probed buckets (same-center corpus rows)
    val buckets = Similarity.ivfAssign(corpus,
        corpus.filter(col("vec_id") < Similarity.IvfK))
      .select(col("vec_id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = ivf.map { case ((_, vid), _) => buckets(vid) }.toSet
    assert(probed.size <= Similarity.IvfK)
  }

  test("native PQ encode is bit-identical to the HOF formulation") {
    val s = spark; import s.implicits._
    val corpus = clustered(120, 4)
    val books = Similarity.pqCodebooks(corpus)
    def qv = transform(col("embedding"),
      e => floor(e.cast("double") * 10000d + 0.5d).cast("long"))
    val rows = corpus.select(
        graft.functions.VectorExprs.pqEncode(qv, books).as("nat"),
        Similarity.pqBestHof(qv, books).as("hof"))
      .select(col("nat.code").as("ncode"), col("nat.d").as("nd"),
        transform(col("hof"), b => b.getField("cid")).as("hcode"),
        transform(col("hof"), b => b.getField("d")).as("hd"))
      .collect()
    assert(rows.length === 120)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](2))
      assert(r.getSeq[Double](1) === r.getSeq[Double](3))
    }
    // malformed input (wrong dimensionality) nulls out, never truncates
    val short = Seq((0L, Seq.fill(10)(1f))).toDF("vec_id", "embedding")
    val out = short.select(
      graft.functions.VectorExprs.pqEncode(qv, books).as("nat")).collect()
    assert(out.length === 1 && out(0).isNullAt(0))
  }

  test("native ADC LUT is bit-identical to the HOF formulation") {
    val s = spark; import s.implicits._
    val corpus = clustered(120, 4)
    val trained = Similarity.pqCodebooks(corpus)
    // force DEAD codeword slots in some subspaces: the native
    // expression's live-mask path and the HOF's lit(0.0) arm must agree
    val books = trained.zipWithIndex.map { case (sub, i) =>
      if (i % 4 == 0 && sub.size > 1) sub.tail else sub
    }
    def qv = transform(col("embedding"),
      e => floor(e.cast("double") * 10000d + 0.5d).cast("long"))
    val rows = corpus.select(
        graft.functions.VectorExprs.pqLut(qv, books, Similarity.PqKsub)
          .as("nat"),
        Similarity.pqLutHof(qv, books, Similarity.PqKsub).as("hof"))
      .collect()
    assert(rows.length === 120)
    rows.foreach { r =>
      assert(r.getSeq[Double](0) === r.getSeq[Double](1))
    }
    // malformed input (wrong dimensionality) nulls out, never truncates
    val short = Seq((0L, Seq.fill(10)(1f))).toDF("vec_id", "embedding")
    val out = short.select(
      graft.functions.VectorExprs.pqLut(qv, books, Similarity.PqKsub))
      .collect()
    assert(out.length === 1 && out(0).isNullAt(0))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("published PQ index: serve equals the fused IVF-PQ path") {
    val dir = Files.createTempDirectory("pqserve").toString
    val corpus = clustered(120, 4)
    val queries = corpus.filter(col("vec_id") < 3)
    val v = Similarity.publishPqIndex(corpus, dir)
    assert(v === 1L)
    val books = Similarity.pqCodebooks(corpus)
    val served = rows(Similarity.topKPqServe(spark, dir, queries, 5))
    val direct = rows(Similarity.topKIvfPq(corpus, queries, 5, books))
    assert(served === direct && served.nonEmpty)
  }

  test("append encodes with pinned books; old version stays servable") {
    val dir = Files.createTempDirectory("pqappend").toString
    val base = clustered(120, 4)
    Similarity.publishPqIndex(base, dir)
    val extra = clustered(140, 4).filter(col("vec_id") >= 120)
    val v2 = Similarity.appendToPqIndex(spark, extra, dir)
    assert(v2 === 2L)
    val queries = base.filter(col("vec_id") < 3)
    val books = Similarity.pqCodebooks(base)
    // serve(v2) ≡ fused path over the union WITH THE ORIGINAL BOOKS —
    // holds only if the append reused the pinned quantizers
    val served = rows(Similarity.topKPqServe(spark, dir, queries, 10))
    val direct = rows(Similarity.topKIvfPq(
      base.unionByName(extra), queries, 10, books))
    assert(served === direct)
    // the pre-append version still serves its own result when pinned
    val v1 = rows(Similarity.topKPqServe(spark, dir, queries, 10, Some(1L)))
    assert(v1 === rows(Similarity.topKIvfPq(base, queries, 10, books)))
    // and the committed code table really carries old + new
    assert(graft.pipeline.Snapshot.readTable(spark, dir, "coded")
      .count() === 140L)
  }

  test("residual tier: twins share bucket and code; build is deterministic") {
    val base = clustered(100, 4)
    val s = spark
    val twins = base.filter(col("vec_id") < 8)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(twins)
    val (coded, books, _) = Similarity.residualPqBuild(corpus)
    val rows = coded.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    (0L until 8L).foreach { i =>
      assert(rows(i) === rows(i + 1000), s"twin of $i diverged")
    }
    val (coded2, books2, _) = Similarity.residualPqBuild(corpus)
    assert(books === books2)
    assert(coded2.collect().map(_.toSeq).toSet ===
      coded.collect().map(_.toSeq).toSet)
  }

  test("residual books resolve within-bucket structure: recall >= raw-vector PQ") {
    // richer local jitter (±0.75 vs the stripe magnitude 5): the
    // clusters stay unambiguous for the coarse tier, but the
    // within-cluster neighbor order now rides on detail that 16
    // GLOBAL codewords must share with the stripe structure, while
    // the residual books spend all 16 on the jitter alone
    val s = spark; import s.implicits._
    val corpus = (0 until 240).map { i =>
      val g = i % 4
      (i.toLong, (0 until Similarity.Dim).map { j =>
        val base = if (j % 4 == g) 5f else 0f
        base + (((i * 31 + j * 17) % 7) - 3) * 0.25f
      }.toList)
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 5)
    def hitSet(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hitSet(Similarity.topKExact(corpus, queries, 10))
    val res = hitSet(Similarity.topKIvfPqResidual(corpus, queries, 10))
    val raw = hitSet(Similarity.topKIvfPq(corpus, queries, 10,
      Similarity.pqCodebooks(corpus)))
    val resHits = (res intersect truth).size
    val rawHits = (raw intersect truth).size
    assert(resHits >= rawHits,
      s"residual recall $resHits < raw $rawHits (of ${truth.size})")
    assert(resHits > 0)
  }

  test("published residual index: serve equals the fused residual path") {
    val dir = Files.createTempDirectory("pqres").toString
    val corpus = clustered(150, 4)
    val queries = corpus.filter(col("vec_id") < 3)
    val v = Similarity.publishResidualPqIndex(corpus, dir)
    assert(v === 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val served = rows(Similarity.topKPqResServe(spark, dir, queries, 5))
    val fused = rows(Similarity.topKIvfPqResidual(corpus, queries, 5))
    assert(served === fused && served.nonEmpty)
  }

  test("pqRecall is 1.0 when the corpus lies on codewords") {
    // 8 distinct patterns (< Ksub), each with exactly Dim/8 high
    // positions so ALL norms are equal: after training, every
    // subvector IS a codeword, so ADC dot equals the exact dot, and
    // equal norms make dot-ranking equal cosine-ranking — the gauge
    // must read exactly 1.0 (and below it, compression loss shows)
    val s = spark; import s.implicits._
    val pats = (0 until 8).map(p => (0 until Similarity.Dim).map(j =>
      if (j % 8 == p) 4f else 1f))
    val corpus = (0L until 60L).map(i => (i, pats((i % 8).toInt).toList))
      .toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(corpus)
    val rec = Similarity.pqRecall(corpus,
        corpus.filter(col("vec_id") < 3), 5, books)
      .select("recall").collect().map(_.getDouble(0))
    assert(rec.length === 3 && rec.forall(_ === 1.0))
  }
}
