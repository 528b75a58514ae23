package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.{Similarity, TextAnalysis}

/** Hybrid-retrieval contracts beyond what the DuckDB oracle pins:
  * RRF fusion must be exact integer arithmetic (arm-order-free), the
  * Rocchio centroid must be the true mean of the matching embeddings,
  * and hard-negative mining must never surface a same-label vector. */
class RetrievalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("retrieval-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  private def arm(rows: Seq[(String, Long, Long)]) = {
    val s = spark; import s.implicits._
    rows.toDF("qid", "doc_id", "rank")
  }

  /** 64-dim embedding with the given (index -> value) entries. */
  private def vec(entries: (Int, Float)*): List[Float] = {
    val a = Array.fill(Similarity.Dim)(0f)
    entries.foreach { case (i, v) => a(i) = v }
    a.toList
  }

  test("rrfFuse: hand-computed masses, ranks, and rounded scores") {
    val a = arm(Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L)))
    val b = arm(Seq(("q", 2L, 1L), ("q", 3L, 2L), ("q", 4L, 3L)))
    val out = TextAnalysis.rrfFuse(Seq(a, b), 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rrf"))).toSeq
    // masses: doc2 = S//62 + S//61, doc3 = S//63 + S//62,
    //         doc1 = S//61, doc4 = S//63 (S = 1e12, exact longs)
    assert(out === Seq(
      (1L, 2L, 0.032522), (2L, 3L, 0.032002),
      (3L, 1L, 0.016393), (4L, 4L, 0.015873)))
  }

  test("rrfFuse: fusion is invariant to arm order (exact integer mass)") {
    val a = arm(Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L)))
    val b = arm(Seq(("q", 2L, 1L), ("q", 3L, 2L), ("q", 4L, 3L)))
    val c = arm(Seq(("q", 3L, 1L), ("q", 1L, 2L), ("q", 5L, 3L)))
    def run(arms: Seq[org.apache.spark.sql.DataFrame]) =
      TextAnalysis.rrfFuse(arms, 10).orderBy("rank").collect()
        .map(_.toSeq).toSeq
    val base = run(Seq(a, b, c))
    assert(run(Seq(c, a, b)) === base)
    assert(run(Seq(b, c, a)) === base)
  }

  test("rrfFuse: ties on mass break by doc_id") {
    // both docs appear in one arm each at the same rank -> equal mass
    val a = arm(Seq(("q", 9L, 1L)))
    val b = arm(Seq(("q", 4L, 1L)))
    val out = TextAnalysis.rrfFuse(Seq(a, b), 10)
      .orderBy("rank").collect().map(r => r.getAs[Long]("doc_id")).toSeq
    assert(out === Seq(4L, 9L))
  }

  test("rrfFuse: random arms match the in-Scala reference model") {
    var seed = 42L
    def next(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % n).toInt
    }
    def model(arms: Seq[Seq[(String, Long, Long)]],
        k: Int): Seq[(String, Long, Long)] = {
      val mass = scala.collection.mutable.Map[(String, Long), Long]()
      arms.flatten.foreach { case (q, d, r) =>
        mass((q, d)) = mass.getOrElse((q, d), 0L) +
          TextAnalysis.RrfScale / (TextAnalysis.RrfC + r)
      }
      mass.groupBy(_._1._1).toSeq.flatMap { case (q, m) =>
        m.toSeq.map { case ((_, d), mm) => (d, mm) }
          .sortBy { case (d, mm) => (-mm, d) }.take(k).zipWithIndex
          .map { case ((d, _), i) => (q, (i + 1).toLong, d) }
      }
    }
    for (_ <- 1 to 3) {
      val nArms = 2 + next(3)
      val armRows = (0 until nArms).map { _ =>
        Seq("a", "b").flatMap { q =>
          val m = 3 + next(5)
          val docs = scala.collection.mutable.LinkedHashSet[Long]()
          while (docs.size < m) docs += next(12).toLong
          docs.toSeq.zipWithIndex.map { case (d, i) =>
            (q, d, (i + 1).toLong)
          }
        }
      }
      val k = 1 + next(6)
      val got = TextAnalysis.rrfFuse(armRows.map(arm), k)
        .collect().map(r => (r.getAs[String]("qid"), r.getAs[Long]("rank"),
          r.getAs[Long]("doc_id"))).toSet
      assert(got === model(armRows, k).toSet)
    }
  }

  test("semanticExpand: centroid is the mean of matching docs; cosine ranks") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "hot stuff"), (1L, "hot iron"),
      (2L, "both axes"), (3L, "unrelated")).toDF("doc_id", "text")
    val vecs = Seq(
      (0L, vec(0 -> 1f)), (1L, vec(1 -> 1f)),
      (2L, vec(0 -> 1f, 1 -> 1f)), (3L, vec(2 -> 1f)))
      .toDF("vec_id", "embedding")
    val out = TextAnalysis.semanticExpand(docs, vecs, Seq("hot"), 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos"))).toSeq
    // centroid of {e0, e1} = (0.5, 0.5, 0, ...): vec 2 is colinear
    // (cos 1), vecs 0/1 tie at cos 1/sqrt(2), tie breaks by vec_id
    assert(out === Seq(
      (1L, 2L, 1.0), (2L, 0L, 0.707107), (3L, 1L, 0.707107)))
  }

  test("semanticExpand: term matching is on lowercased whitespace tokens") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "HOT soup"),        // matches via lowercasing
      (1L, "hotplate dinner"), // substring must NOT match
      (2L, "x")).toDF("doc_id", "text")
    val vecs = Seq(
      (0L, vec(0 -> 1f)), (1L, vec(1 -> 1f)), (2L, vec(2 -> 1f)))
      .toDF("vec_id", "embedding")
    val out = TextAnalysis.semanticExpand(docs, vecs, Seq("hot"), 1)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
    // centroid = e0 alone -> top hit is vec 0 itself
    assert(out.toSeq === Seq((1L, 0L)))
  }

  test("edge cases: unmatched terms vanish, k beyond pool, same-label corpus, empty intervals") {
    val s = spark; import s.implicits._
    // a term matching no document contributes no centroid and no rows
    val docs = Seq((0L, "alpha beta")).toDF("doc_id", "text")
    val vecs = Seq((0L, vec(0 -> 1f))).toDF("vec_id", "embedding")
    val exp = TextAnalysis.semanticExpand(docs, vecs,
      Seq("alpha", "nosuchterm"), 5).collect()
    assert(exp.map(_.getAs[String]("term")).distinct.toSeq === Seq("alpha"))
    // rrfFuse with k past the candidate pool returns the whole pool
    val a = arm(Seq(("q", 1L, 1L), ("q", 2L, 2L)))
    assert(TextAnalysis.rrfFuse(Seq(a), 100).count() === 2L)
    // hard negatives over an all-same-label corpus: empty, not error
    val mono = Seq((0L, vec(0 -> 1f), 1), (1L, vec(1 -> 1f), 1))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.hardNegatives(mono,
      mono.filter(col("vec_id") === 0L), 3).count() === 0L)
    // range join against an empty interval table: empty, not error
    val pts = Seq((1L, 10L)).toDF("pt_id", "t")
    val noIvs = Seq.empty[(Long, Long, Long)].toDF("iv_id", "t_start", "t_end")
    assert(graft.pipeline.Events.rangeJoin(pts, noIvs, 64L).count() === 0L)
  }

  test("semanticContamination: planted eval copies always flagged; census exact vs brute force") {
    val s = spark; import s.implicits._
    val corpus = (0L until 80L).map { i =>
      (i, (0 until Similarity.Dim).map(j =>
        (((i * 31 + j * 17) % 13) - 6).toFloat).toList)
    }.toDF("vec_id", "embedding")
    // eval = 5 held-out vectors; corpus rows 70-74 are EXACT copies
    // of them (identical sig -> every band collides -> LSH recall 1)
    val evalVecs = (1000L until 1005L).map { e =>
      (e, (0 until Similarity.Dim).map(j =>
        ((((e - 1000 + 70) * 31 + j * 17) % 13) - 6).toFloat).toList)
    }.toDF("vec_id", "embedding")
    val got = Similarity.semanticContamination(corpus, evalVecs, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (70L until 75L).foreach { i =>
      assert(got.contains(i), s"planted eval copy $i not flagged")
    }
    // soundness at a loose threshold: every flagged vector has a true
    // >= minCos eval neighbor, counts match the brute-force census
    // RESTRICTED to LSH-candidate pairs (band collisions bound recall;
    // the exact-copy case above pins the recall-1 regime)
    val loose = Similarity.semanticContamination(corpus, evalVecs, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val cvecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val evecs = evalVecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def q(x: Seq[Float]) = x.map(v => math.floor(v * 10000 + 0.5))
      val (qa, qb) = (q(a), q(b))
      val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(qa.map(x => x * x).sum) * math.sqrt(qb.map(x => x * x).sum))
    }
    loose.foreach { case (vid, n) =>
      val truth = evecs.values.count(e => cos(cvecs(vid), e) >= 0.3)
      assert(n <= truth, s"vec $vid over-counted: $n > $truth")
      assert(n >= 1)
    }
  }

  test("hardNegatives: never surfaces the query's own label; matches filtered exact top-k") {
    val s = spark; import s.implicits._
    // 3 tight same-label neighbors around the query + 3 other-label
    val rows = Seq(
      (0L, vec(0 -> 1f), 7),
      (1L, vec(0 -> 1f, 1 -> 0.1f), 7),  // nearest of all, same label
      (2L, vec(0 -> 1f, 1 -> 0.2f), 7),
      (3L, vec(0 -> 1f, 1 -> 0.3f), 9),  // nearest wrong-label
      (4L, vec(0 -> 1f, 1 -> 0.5f), 9),
      (5L, vec(1 -> 1f), 9))
    val corpus = rows.toDF("vec_id", "embedding", "label")
    val q = corpus.filter(col("vec_id") === 0L)
    val out = Similarity.hardNegatives(corpus, q, 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"))).toSeq
    assert(out === Seq((1L, 3L), (2L, 4L)))
  }

  test("hardNegativesIvf: label guarantee, contiguous ranks, candidates from the index tier") {
    val s = spark; import s.implicits._
    val corpus = (0L until 60L).map { i =>
      (i, (0 until Similarity.Dim).map(j =>
        (((i * 31 + j * 17) % 13) - 6).toFloat).toList, (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val queries = corpus.filter(col("vec_id") < 3)
    val out = Similarity.hardNegativesIvf(corpus, queries, 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"))).toSeq
    val labels = corpus.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every negative has a different label than its query
    out.foreach { case (qid, _, vid) =>
      assert(labels(vid) !== labels(qid), s"qid=$qid got same-label $vid")
    }
    // per-qid ranks are contiguous from 1
    out.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted === (1L to g.size.toLong).toSeq)
    }
    // candidates come from the over-fetched IVF tier
    val tier = Similarity.topKIvfKmeans(corpus, queries, 20)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { case (qid, _, vid) => assert(tier.contains(qid -> vid)) }
  }
}
