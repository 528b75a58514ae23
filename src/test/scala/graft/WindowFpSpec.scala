package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.NearDup

/** Invariants of the shared-substring (windowed-fingerprint) detector
  * beyond the DuckDB oracle: planted passages are found with the exact
  * shared-window count, offset-shifted copies still align at stride 1,
  * exact duplicates expand through the collapse with the full set
  * count, and sub-window documents stay silent. */
class WindowFpSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("windowfp-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  private def docs(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def pairs(d: org.apache.spark.sql.DataFrame, w: Int, m: Int) =
    NearDup.windowFpPairs(d, w, m).orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_shared"))).toSeq

  test("planted passage at different offsets is found with the exact count") {
    // 10-token passage shared by docs 1 and 2 at DIFFERENT token
    // offsets; 8-token windows fully inside it: starts s1..s3 → 3
    // distinct shared windows. Doc 3 is unrelated filler.
    val passage = (1 to 10).map(i => s"s$i").mkString(" ")
    val d = docs(Seq(
      1L -> s"a1 a2 $passage",
      2L -> s"$passage b1 b2",
      3L -> (1 to 12).map(i => s"c$i").mkString(" ")))
    assert(pairs(d, w = 8, m = 3) === Seq((1L, 2L, 3L)))
    // raising the floor past the true count silences the pair
    assert(pairs(d, w = 8, m = 4) === Seq.empty)
  }

  test("exact duplicates expand with the rep's full window-set count") {
    // two byte-identical 10-token docs: 3 distinct windows each, so the
    // within-group pair carries n_shared = 3 (the whole set)
    val t = (1 to 10).map(i => s"t$i").mkString(" ")
    val other = (1 to 10).map(i => s"u$i").mkString(" ")
    val d = docs(Seq(5L -> t, 9L -> t, 11L -> other))
    assert(pairs(d, w = 8, m = 3) === Seq((5L, 9L, 3L)))
  }

  test("stride > 1 keeps only aligned windows — fewer, never spurious") {
    // same 10-token shared passage at stride-aligned offsets: stride 2
    // halves the window set; the pair survives with the REDUCED count,
    // and a stride too coarse to align any window silences it
    val passage = (1 to 10).map(i => s"s$i").mkString(" ")
    val d = docs(Seq(1L -> s"a1 a2 $passage", 2L -> s"b1 b2 $passage"))
    val full = pairs(d, w = 8, m = 1)
    val coarse = NearDup.windowFpPairs(d, 8, 1, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_shared"))).toSeq
    assert(full === Seq((1L, 2L, 3L)))
    // both docs place the passage at token offset 2, so stride-2 windows
    // align: starts 3 and 5 (1-based) fall inside the passage → 2 shared
    assert(coarse === Seq((1L, 2L, 2L)))
  }

  test("scoped variant releases the window-set and membership caches") {
    val s = spark
    def cachedRdds = s.sparkContext.getPersistentRDDs.size
    val before = cachedRdds
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    val d = docs(Seq(1L -> s"a $passage", 2L -> s"$passage b"))
    val (pairs, release) = NearDup.windowFpPairsScoped(d, 8, 3)
    pairs.count()
    assert(cachedRdds > before, "expected the internal caches to register")
    release()
    assert(cachedRdds === before, "release() must unpersist every cache")
  }

  test("hotWindows surfaces passages with df ≥ threshold, linear output") {
    // one 10-token passage in THREE distinct docs: its 3 windows reach
    // df = 3; per-doc unique windows stay below any threshold ≥ 2
    val passage = (1 to 10).map(i => s"h$i").mkString(" ")
    val d = docs(Seq(1L -> s"a1 a2 $passage", 2L -> s"$passage b1 b2",
      3L -> s"c1 $passage c2"))
    val hot = NearDup.hotWindows(d, window = 8, minDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hot.length === 3 && hot.forall(_._2 === 3L))
    assert(NearDup.hotWindows(d, window = 8, minDf = 4).count() === 0L)
  }

  test("documents shorter than the window contribute nothing") {
    // identical 5-token docs: no full 8-token window exists, so the
    // detector stays silent even though they are exact duplicates —
    // whole-document dedup owns that case
    val d = docs(Seq(1L -> "a b c d e", 2L -> "a b c d e"))
    assert(pairs(d, w = 8, m = 1) === Seq.empty)
  }

  private def strip(d: org.apache.spark.sql.DataFrame, w: Int, m: Int) =
    NearDup.stripBoilerplate(d, w, m).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("stripBoilerplate removes exactly the hot banner, tails survive") {
    // an 8-token banner carried by three docs (df = 3); each doc keeps
    // its unique tail and loses exactly the 8 banner tokens. Doc 4's
    // tokens never reach df 3 and come back untouched (lowercased —
    // the pipeline's token normalization).
    val banner = (1 to 8).map(i => s"n$i").mkString(" ")
    val d = docs(Seq(
      1L -> s"$banner x1 x2 x3",
      2L -> s"y1 $banner y2",
      3L -> s"z1 z2 $banner",
      4L -> "Q1 q2 q3 q4 q5 q6 q7 q8 q9"))
    assert(strip(d, w = 8, m = 3) === Seq(
      (1L, "x1 x2 x3", 8L),
      (2L, "y1 y2", 8L),
      (3L, "z1 z2", 8L),
      (4L, "q1 q2 q3 q4 q5 q6 q7 q8 q9", 0L)))
  }

  test("stripBoilerplate: overlapping hot windows union their coverage") {
    // a 10-token shared passage: hot windows at starts 0,1,2 overlap;
    // covered positions are the UNION (all 10), not 3×8 double counts
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    val d = docs(Seq(
      1L -> s"$passage t1",
      2L -> s"$passage t2",
      3L -> s"$passage t3"))
    assert(strip(d, w = 8, m = 3) === Seq(
      (1L, "t1", 10L), (2L, "t2", 10L), (3L, "t3", 10L)))
  }

  test("stripBoilerplate: fully-boilerplate docs come back empty, dup members share the rep's cleaning") {
    val t = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = docs(Seq(1L -> t, 2L -> t, 3L -> t, 4L -> s"$t extra"))
    // the 8-token window is carried by two DISTINCT texts (t and
    // t+extra) — below minDf 3 nothing strips; at 2 everything does
    assert(strip(d, w = 8, m = 3).forall(_._3 === 0L))
    assert(strip(d, w = 8, m = 2) === Seq(
      (1L, "", 8L), (2L, "", 8L), (3L, "", 8L), (4L, "extra", 8L)))
  }

  test("stripBoilerplate: sub-window and null docs pass through") {
    val s = spark; import s.implicits._
    val d = Seq((1L, Some("a b c")), (2L, Some("a b c")),
      (3L, None: Option[String])).toDF("doc_id", "text")
    assert(strip(d, w = 8, m = 2) === Seq(
      (1L, "a b c", 0L), (2L, "a b c", 0L), (3L, null, 0L)))
  }

  test("fat bucket (df > DfCap) is dropped without unbounded state; disjoint pairs unaffected") {
    // 60 docs (> DfCap = 50) share one 8-token boilerplate passage:
    // its window buckets are over-cap and must surface NO pairs —
    // while the bounded aggregate keeps only DfCap+1 ids per bucket
    // (round 17), never the 60-wide list. An unrelated planted pair
    // must be unaffected. Pair-set equality with the pre-r17
    // collect_list shape is BY CONSTRUCTION (over-cap buckets were
    // filtered there too); this pins it empirically.
    // 10 boilerplate tokens → 3 full 8-token windows shared by all 60
    // docs (≥ minShared, so WITHOUT the df cap they would all pair)
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val fat = (100L until 160L).map(i => i -> s"$boiler x$i y$i z$i")
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    val d = docs(fat ++ Seq(1L -> s"q1 q2 $passage", 2L -> s"$passage r1 r2"))
    assert(pairs(d, w = 8, m = 3) === Seq((1L, 2L, 3L)))
  }
}
