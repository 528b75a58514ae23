package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.Curation

/** Invariants of the corpus-curation operators beyond what the DuckDB
  * oracle pins: the two-level prefix sum in sequence packing must be
  * independent of its block size, contamination fractions must be
  * bounded and exact on planted overlaps, and source caps must be
  * stable samples. */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("curation-spec")
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

  test("packSequences: offsets form the exact running sum in doc_id order") {
    // sparse, shuffled-input doc_ids — order must come from the ids
    val d = docs(Seq(7L -> "a b c", 2L -> "x y", 1000L -> "p q r s", 3L -> "z"))
    val out = Curation.packSequences(d, budget = 4, blockDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
      r.getAs[Long]("tok_start"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_pos"))).toSeq ===
      Seq((2L, 2L, 0L, 0L, 0L), (3L, 1L, 2L, 0L, 2L),
        (7L, 3L, 3L, 0L, 3L), (1000L, 4L, 6L, 1L, 2L)))
  }

  test("packSequences: output is invariant to the block size") {
    val s = spark; import s.implicits._
    val d = docs((0L until 97L).map(i =>
      i -> Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
    val base = Curation.packSequences(d, budget = 16, blockDocs = 4096)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    for (blk <- Seq(1, 3, 10, 97)) {
      val alt = Curation.packSequences(d, budget = 16, blockDocs = blk)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(alt === base, s"blockDocs=$blk diverged")
    }
  }

  test("bpeMerges: hand-traced merges, tie-break order, pair exhaustion") {
    // corpus "aa aa ab": vocab aa(2), ab(1); w0 = "a a </w>"(2), "a b </w>"(1)
    // r1: counts {a a:2, a </w>:2, a b:1, b </w>:1} — tie broken by pair
    //     asc ("a </w>" < "a a" since '<' < 'a') → merge "a </w>"
    // r2: "a a</w>":2 wins; r3: "a b":1 ("a b" < "b </w>"); r4 fuses
    //     ("ab","</w>") → "ab</w>"; r5/r6 find NO pairs → 4 rows, not 6
    val d = docs(Seq(1L -> "aa aa", 2L -> "ab"))
    val out = Curation.bpeMerges(d, 6).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out === Seq(
      (1L, "a </w>", 2L), (2L, "a a</w>", 2L), (3L, "a b", 1L),
      (4L, "ab </w>", 1L)))
  }

  test("bpeTokenize: learned merges map every word to its fused symbols") {
    val s = spark; import s.implicits._
    // after the 4 learnable merges (see the bpeMerges trace below):
    // "aa" fuses fully to one token, "ab" likewise; token order is
    // document word order
    val d = docs(Seq(1L -> "aa aa", 2L -> "ab aa"))
    val out = Curation.bpeTokenize(d, 6).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSeq
    assert(out === Seq(
      (1L, List("aa</w>", "aa</w>")), (2L, List("ab</w>", "aa</w>"))))
    // zero merges: pure character symbols with the end-of-word marker
    val out0 = Curation.bpeTokenize(d, 0).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSeq
    assert(out0.head === ((1L, List("a", "a", "</w>", "a", "a", "</w>"))))
    // token-less documents surface with an EMPTY array, never dropped
    val d2 = docs(Seq(1L -> "aa", 2L -> "", 3L -> "   "))
    val out2 = Curation.bpeTokenize(d2, 1).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).size)).toSeq
    assert(out2 === Seq((1L, 2), (2L, 0), (3L, 0)))
  }

  test("bpeMerges: materialization epochs don't change the learned merges") {
    val s = spark; import s.implicits._
    // a corpus with enough pair supply for >8 rounds: the symbol state
    // re-materializes at round 8 (BpeMatEvery), and the merges learned
    // across that boundary must be the plain continuation — the first
    // 8 of a 12-round run equal an 8-round run exactly, and tokenize
    // agrees with the final vocab state
    val d = docs(Seq(
      1L -> "abcdef abcdef abcdef", 2L -> "abcxyz abcxyz",
      3L -> "defxyz", 4L -> "abcdefxyz abcdef"))
    val m12 = Curation.bpeMerges(d, 12).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val m8 = Curation.bpeMerges(d, 8).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(m12.take(8) === m8)
    assert(m12.size > 8, "fixture exhausted before crossing the epoch")
    // cross-boundary tokenize: every word still maps through the
    // post-merge vocab (round-trip: joining tokens and stripping </w>
    // reproduces each document's words)
    val toks = Curation.bpeTokenize(d, 12).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).mkString("")))
    val flat = toks.map { case (id, s0) => (id, s0.replace("</w>", " ").trim) }
    assert(flat.toSeq === Seq(1L -> "abcdef abcdef abcdef",
      2L -> "abcxyz abcxyz", 3L -> "defxyz", 4L -> "abcdefxyz abcdef"))
  }

  test("bpeTokenizeWith: transfer applies trained merges to unseen words") {
    val s = spark; import s.implicits._
    val trainDocs = docs(Seq(1L -> "aa aa", 2L -> "ab"))
    val merges = Curation.bpeMerges(trainDocs, 6).orderBy("round")
      .collect().map(_.getString(1)).toSeq // the 4 learnable merges
    // same corpus: transfer == train-side tokenize exactly
    val direct = Curation.bpeTokenize(trainDocs, 6).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSeq
    val viaMerges = Curation.bpeTokenizeWith(trainDocs, merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSeq
    assert(viaMerges === direct)
    // unseen corpus: "aab" was never trained on; merges reach as far
    // as they apply ("a </w>" and "a b" don't match inside "a a b":
    // after r1 no-op, "a a</w>" no-op... the learned pairs fuse only
    // where trained contexts recur) — and "zz" (no trained symbols)
    // stays character-split
    val apply = docs(Seq(7L -> "aa zz", 8L -> ""))
    val out = Curation.bpeTokenizeWith(apply, merges).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSeq
    assert(out === Seq(
      (7L, List("aa</w>", "z", "z", "</w>")), (8L, Nil)))
    // empty merge table: pure character symbols
    val out0 = Curation.bpeTokenizeWith(apply, Nil).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSeq
    assert(out0.head === ((7L, List("a", "a", "</w>", "z", "z", "</w>"))))
  }

  test("bpeMerges: adjacent repeated pairs all fuse (canonical leftmost scan)") {
    val s = spark; import s.implicits._
    // "abab": w0 = "a b a b </w>". A naive single-space replace misses
    // the second "a b" (the scanner consumes the shared middle space)
    // and would re-emit the same pair next round; the delimiter-doubling
    // application fuses BOTH occurrences in round 1, like canonical BPE
    val d = docs(Seq(1L -> "abab"))
    val out = Curation.bpeMerges(d, 4).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out === Seq(
      (1L, "a b", 2L), (2L, "ab </w>", 1L), (3L, "ab ab</w>", 1L)))
    // run of the same letter: the pair count sees BOTH overlapping
    // occurrences per word (2 × word-count 2 = 4), but application is
    // leftmost non-overlapping: "a a a </w>" → "aa a </w>"
    val d2 = docs(Seq(1L -> "aaa aaa"))
    val out2 = Curation.bpeMerges(d2, 2).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out2 === Seq((1L, "a a", 4L), (2L, "a </w>", 2L)))
  }

  test("native BPE merge fold ≡ HOF fold, adjacent repeats included") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    // symbol strings with adjacent repeats, runs, and missing pairs;
    // merges applied in sequence where later ones depend on earlier
    val rows = Seq("a b a b </w>", "a a a </w>", "x y z </w>",
      "a b c </w>", "b a b a b </w>", "q </w>", "a b</w> a b")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val merges = Seq("a b", "ab </w>", "ab ab</w>", "x y")
    val df = rows.toDF("id", "sym")
    val out = df.select(
        graft.functions.TextExprs.bpeMergeFold(col("sym"), merges).as("nat"),
        Curation.fuseChainHof(col("sym"), merges).as("hof"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
    // hand-pinned: both occurrences of "a b" fuse in one application
    val one = df.filter(col("id") === 0).select(
      graft.functions.TextExprs.bpeMergeFold(col("sym"), merges)).head
    assert(one.getString(0) === "abab</w>")
  }

  test("sourceDrift: a zero-vocab-mass source surfaces as a null-drift row") {
    val s = spark; import s.implicits._
    // top-1 vocab is "x" (3 occurrences); source b's tokens never hit
    // the vocabulary — it must appear with n_vocab_tokens 0 and null
    // js_div, not silently vanish (it is the MOST drifted source)
    val d = Seq((1L, "a", "x x x"), (2L, "b", "zzz yyy"))
      .toDF("doc_id", "source", "text")
    val out = Curation.sourceDrift(d, 1).orderBy("source").collect()
    assert(out.length === 2)
    assert(out(1).getString(0) === "b" && out(1).getLong(1) === 0L
      && out(1).isNullAt(2))
    assert(out(0).getString(0) === "a" && !out(0).isNullAt(2))
  }

  test("sourceDrift: identical sources score 0, divergent ones stay in (0, ln 2]") {
    val s = spark; import s.implicits._
    // two sources with IDENTICAL token distributions: each equals the
    // corpus distribution, so JS divergence is exactly 0
    val same = Seq((1L, "a", "x y z"), (2L, "b", "x y z"))
      .toDF("doc_id", "source", "text")
    val d0 = Curation.sourceDrift(same, 10).collect()
    assert(d0.length === 2 && d0.forall(r => math.abs(r.getDouble(2)) < 1e-12))
    // disjoint vocabularies: maximal separation from the corpus mix,
    // but never past the JS bound ln 2
    val disj = Seq((1L, "a", "x x x"), (2L, "b", "y"))
      .toDF("doc_id", "source", "text")
    val dd = Curation.sourceDrift(disj, 10).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(dd.values.forall(v => v > 0 && v <= math.log(2) + 1e-12))
    // the 1-token source diverges more from the 3:1 corpus mix
    assert(dd("b") > dd("a"))
  }

  test("contamination: planted overlap is measured exactly and bounded") {
    // bench holds exactly one of the corpus doc's 3-grams
    val corpus = docs(Seq(1L -> "a b c d e")) // grams: "a b c","b c d","c d e"
    val bench = docs(Seq(100L -> "b c d"))
    val out = Curation.contamination(corpus, bench).collect().head
    assert(out.getAs[Long]("n_grams") === 3L)
    assert(out.getAs[Long]("n_hit") === 1L)
    assert(math.abs(out.getAs[Double]("contaminated_frac") - 1.0 / 3) < 1e-12)
    // disjoint corpus → zero; identical doc → one
    val none = Curation.contamination(docs(Seq(2L -> "q r s t")), bench)
      .collect().head
    assert(none.getAs[Long]("n_hit") === 0L)
    val full = Curation.contamination(docs(Seq(3L -> "b c d")), bench)
      .collect().head
    assert(full.getAs[Double]("contaminated_frac") === 1.0)
  }

  test("contaminationXl: Bloom two-phase result is identical to the exact broadcast path") {
    // Planted overlaps + clean docs; a deliberately loose fpp so the
    // Bloom phase admits false positives — the verification join must
    // remove every one (exactness is independent of fpp). Zero-hit
    // documents must still appear with frac 0 (explode_outer path).
    val corpus = docs(Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "completely unrelated clean text nothing shared here at all",
      3L -> "the quick brown fox went home early today",
      4L -> "alpha beta gamma delta epsilon zeta eta theta"))
    val ref = docs(Seq(
      100L -> "someone saw the quick brown fox jumps high",
      101L -> "unrelated reference material with its own words"))
    val exact = Curation.contamination(corpus, ref)
      .orderBy("doc_id").collect().toSeq
    val (xlDf, release) = Curation.contaminationXlScoped(corpus, ref, fpp = 0.25)
    val xl = xlDf.orderBy("doc_id").collect().toSeq
    release()
    assert(xl === exact)
    val byId = xl.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit")).toMap
    assert(byId(1L) > 0, "planted overlap must be detected")
    assert(byId(2L) === 0 && byId(4L) === 0, "clean docs report zero hits")
  }

  test("sourceCap: caps bind per source, are deterministic, and nest") {
    val s = spark; import s.implicits._
    val d = (0L until 60L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val kept5 = Curation.sourceCap(d, 5, "mix1").collect()
    assert(kept5.length === 15)
    assert(kept5.groupBy(_.getAs[String]("source")).forall(_._2.length == 5))
    // same salt → same picks; smaller cap → prefix of the larger pick set
    val again = Curation.sourceCap(d, 5, "mix1").collect()
      .map(_.getAs[Long]("doc_id")).sorted
    assert(again === kept5.map(_.getAs[Long]("doc_id")).sorted)
    val kept3 = Curation.sourceCap(d, 3, "mix1").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept3.subsetOf(kept5.map(_.getAs[Long]("doc_id")).toSet))
  }

  test("sourceCap: NULL source is its own capped group, never dropped") {
    val s = spark; import s.implicits._
    val d = (0L until 30L)
      .map(i => (i, if (i % 3 == 0) null else s"src${i % 3}"))
      .toDF("doc_id", "source")
    val kept = Curation.sourceCap(d, 4, "mix1").collect()
    // 3 groups of 10 (src1, src2, NULL), each capped at 4
    assert(kept.length === 12)
    val nullKept = kept.filter(_.isNullAt(1))
    assert(nullKept.length === 4, "null-source docs must form their own group")
    assert(nullKept.map(_.getAs[Int]("rn")).sorted === Array(1, 2, 3, 4))
  }

  test("dsirWeights: identical target/raw halves weigh every doc exactly 0") {
    // ct == cr per bucket and tt == tr ⇒ every ratio is 1, so logw is
    // EXACTLY 0.0 regardless of how tokens hash — the estimator's
    // calibration invariant
    val d = docs(Seq(0L -> "aa bb cc", 1L -> "aa bb cc",
      2L -> "dd dd", 3L -> "dd dd"))
    val out = Curation.dsirWeights(d).orderBy("doc_id").collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Double]("logw") == 0.0))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq === Seq(3L, 3L, 2L, 2L))
  }

  test("dsirWeights: target-domain docs weigh positive, raw-domain negative; empty docs surface") {
    // even (target) half is all "aa", odd (raw) half all "bb" — tokens
    // hash to distinct buckets (aa→39, bb→16 of 64, md5 is stable), so
    // an "aa" doc must score positive and a "bb" doc negative; the
    // null/empty docs surface with n_tokens 0 and null logw
    val d = docs(Seq(0L -> "aa aa aa", 2L -> "aa aa", 1L -> "bb bb",
      3L -> "bb", 4L -> "", 6L -> null))
    val out = Curation.dsirWeights(d).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), Option(r.getAs[Any]("logw")))).toMap
    assert(out(0L)._1 == 3L && out(0L)._2.exists(_.asInstanceOf[Double] > 0))
    assert(out(1L)._1 == 2L && out(1L)._2.exists(_.asInstanceOf[Double] < 0))
    assert(out(4L) == (0L, None) && out(6L) == (0L, None))
  }

  test("perplexity: hand-computed Laplace bigram scores; short docs get null ppl") {
    import graft.pipeline.TextAnalysis
    // train half = doc 0 only: unigrams a,b (V=2); bigram (a,b) once.
    // doc 0 scores p(b|a) = (1+1)/(1+2) = 2/3 → ppl = 3/2.
    // doc 1's (a,c) is unseen: p = (0+1)/(1+2) = 1/3 → ppl = 3.
    // doc 3 has one token, doc 5 null text: n_bigrams 0, null ppl.
    val d = docs(Seq(0L -> "a b", 1L -> "a c", 3L -> "solo", 5L -> null))
    val out = TextAnalysis.perplexity(d).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), Option(r.getAs[Any]("ppl")))).toMap
    assert(out(0L)._1 == 1L)
    assert(math.abs(out(0L)._2.get.asInstanceOf[Double] - 1.5) < 1e-12)
    assert(math.abs(out(1L)._2.get.asInstanceOf[Double] - 3.0) < 1e-12)
    assert(out(3L) == (0L, None) && out(5L) == (0L, None))
  }

  test("semDedup: within-cluster epsilon-neighbors collapse to the senior id") {
    val s = spark; import s.implicits._
    // two tight direction groups in R^64: ids 0,2,5 along e0 (pairwise
    // cos 1.0), ids 1,3 along e1, id 7 along e2 (alone past eps).
    // k=2/iters=1 clustering from first-2 seeds separates e0 from the
    // rest; within clusters, eps=0.9 drops 2,5 (senior 0) and 3
    // (senior 1); 7's cosine to 1/3 is 0 so it survives.
    def vec(axis: Int, scale: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == axis) scale else 0.0f)
    val e = Seq(0L -> vec(0, 1f), 2L -> vec(0, 2f), 5L -> vec(0, 0.5f),
      1L -> vec(1, 1f), 3L -> vec(1, 3f), 7L -> vec(2, 1f))
      .toDF("vec_id", "embedding")
    val out = pipeline.Similarity.semDedup(e, eps = 0.9, k = 2, iters = 1)
      .orderBy("vec_id").collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(out === Seq(0L, 1L, 7L))
  }

  test("nbQualityScores: hand-computed log-odds; OOV floor; seed separation") {
    val s = spark; import s.implicits._
    // seeds: good = {the cat}, bad = {buy now} — disjoint vocabularies
    val good = docs(Seq((1L, "the cat"), (2L, "the the")))
    val bad = docs(Seq((3L, "buy now")))
    // counts: cg(the)=3 cg(cat)=1; cb(buy)=1 cb(now)=1; Ng=4 Nb=2 V=4
    val ng = 4.0; val nb = 2.0; val v = 4.0
    def t(cg: Double, cb: Double): Double =
      math.log((cg + 1) / (ng + v)) - math.log((cb + 1) / (nb + v))
    val prior = math.log(2.0 / 1.0)
    val floor = math.log((nb + v) / (ng + v))
    val corpus = docs(Seq(
      (10L, "the cat"),          // pure good vocabulary
      (11L, "buy now buy"),      // pure bad vocabulary (buy twice)
      (12L, "zzz qqq")))         // fully out-of-vocabulary
    val out = Curation.nbQualityScores(corpus, good, bad)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def sortedFold(terms: Seq[Double]): Double =
      terms.sorted.foldLeft(prior)(_ + _)
    assert(out(10L) === sortedFold(Seq(t(3, 0), t(1, 0))))
    assert(out(11L) === sortedFold(Seq(t(0, 1), t(0, 1), t(0, 1))))
    assert(out(12L) === sortedFold(Seq(floor, floor)))
    // and the signs separate the classes
    assert(out(10L) > 0 && out(11L) < out(10L) &&
      out(11L) < prior + 0.0)
    // empty seeds are loud
    intercept[IllegalArgumentException] {
      Curation.nbQualityScores(corpus, good.limit(0), bad)
    }
  }

  test("selectTraining: sample is gate-consistent, epoch-bounded, deterministic") {
    val s = spark; import s.implicits._
    // 8 docs over 2 sources; loose gates so a non-trivial set survives
    val d = docs((0L until 8L).map(i =>
        i -> s"tok${i % 3} tok${(i * 2) % 5} tok$i common word run ${i}"))
      .withColumn("source", concat(lit("s"), col("doc_id") % 2))
    val (out, release) = Curation.selectTrainingScoped(
      d, maxPpl = 1e9, minEntropy = 0.0, budgetFrac = 0.9, maxEpochs = 2.0)
    val rows = out.select("doc_id", "copy").as[(Long, Long)].collect()
    release()
    // every sampled doc passed all three gates (recomputed independently)
    val pplOk = pipeline.TextAnalysis.perplexity(d)
      .filter(col("ppl").isNotNull).select("doc_id").as[Long].collect().toSet
    val dsirOk = Curation.dsirWeights(d)
      .filter(col("logw") > 0).select("doc_id").as[Long].collect().toSet
    val sampledIds = rows.map(_._1).toSet
    assert(sampledIds.nonEmpty)
    assert(sampledIds.subsetOf(pplOk & dsirOk))
    // epoch cap bounds per-doc copies: weight <= 2 -> at most 3 copies
    // (floor(2) + fractional), and copy indexes are dense from 0
    val perDoc = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    assert(perDoc.values.forall(cs => cs == (0L until cs.size.toLong)))
    assert(perDoc.values.forall(_.size <= 3))
    // deterministic: a second run returns the identical multiset
    val (out2, release2) = Curation.selectTrainingScoped(d, 1e9, 0.0, 0.9, 2.0)
    val again = out2.select("doc_id", "copy").as[(Long, Long)].collect()
    release2()
    assert(rows.sorted.toSeq === again.sorted.toSeq)
  }

  test("scoped curate/minhashPairs release their internal caches") {
    val s = spark; import s.implicits._
    val d = (0L until 40L).map(i =>
        (i, s"src${i % 2}", s"the quick brown fox ${i % 7} jumps over dog $i"))
      .toDF("doc_id", "source", "text")
    def cachedRdds = s.sparkContext.getPersistentRDDs.size
    val before = cachedRdds
    val (pairs, release) = graft.pipeline.NearDup.minhashPairsScoped(
      d.select("doc_id", "text"), 0.5)
    pairs.count() // materialize: the shared set/member caches fill
    assert(cachedRdds > before, "expected the internal caches to register")
    release()
    assert(cachedRdds === before, "release() must unpersist every cache")
    val (curated, release2) = Curation.curateScoped(d,
      d.filter(col("doc_id") % 13 === 0), 0.5, -1.0, 0.9, 10, "salt", 64)
    curated.count()
    assert(cachedRdds > before)
    release2()
    // every persist()-ed cache is gone (CacheManager empty); the only
    // storage left is the label-propagation result's OWN localCheckpoint
    // blocks, which back the returned frame until the caller drops it
    assert(s.sharedState.cacheManager.isEmpty,
      "release() must clear every CacheManager entry")
    val leftovers = s.sparkContext.getPersistentRDDs.values.toSeq
    assert(leftovers.forall(_.toString.contains("localCheckpoint")),
      s"non-checkpoint cache leaked: $leftovers")
    assert(leftovers.size <= 1,
      "superseded propagation rounds must be unpersisted deterministically")
  }

  test("pairsExact refuses a corpus past its guard (O(N^2) oracle tier)") {
    val s = spark; import s.implicits._
    val vecs = (0L until 10L)
      .map(i => (i, (0 until 4).map(j => (i + j).toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Similarity.pairsExact(vecs, 0.9, maxRows = 5)
    }
    assert(e.getMessage.contains("pairsLsh"))
    // under the guard it still answers
    assert(graft.pipeline.Similarity.pairsExact(vecs, -1.0).count() === 45L)
  }

  test("exactDedup: NULL-text rows all survive, never merged as one group") {
    import graft.pipeline.Dedup
    val s = spark; import s.implicits._
    val docs = Seq((1L, "same"), (2L, "same"),
      (3L, null: String), (4L, null: String)).toDF("doc_id", "text")
    val kept = Dedup.exactDedup(docs).select("doc_id")
      .as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L)) // dup text deduped; nulls kept
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.length === 1) // only the real text group, not the nulls
  }

  test("frameSample: zero-frame video yields no rows, not a job failure") {
    import graft.pipeline.Multimodal
    val s = spark; import s.implicits._
    val media = Seq((1L, "video", 0), (2L, "video", 5), (3L, "image", 9))
      .toDF("doc_id", "media_type", "n_frames")
    val out = Multimodal.frameIndexPlan(media, 2)
      .select("doc_id", "frame_idx").as[(Long, Int)].collect().sorted
    assert(out.toSeq === Seq((2L, 0), (2L, 2), (2L, 4)))
    intercept[IllegalArgumentException](Multimodal.frameIndexPlan(media, 0))
  }

  test("repetitionStats: hand-computed fractions on a crafted doc") {
    // "a a a b": tokens 4, distinct 2 → dup_token 0.5
    // 3-grams: "a a a","a a b" → distinct 2 of 2 → dup_3gram 0
    // 2-grams: "a a","a a","a b" → top "a a" 2 of 3
    val out = Curation.repetitionStats(docs(Seq(1L -> "a a a b")))
      .collect().head
    assert(out.getAs[Long]("n_tokens") === 4L)
    assert(math.abs(out.getAs[Double]("dup_token_frac") - 0.5) < 1e-12)
    assert(out.getAs[Double]("dup_3gram_frac") === 0.0)
    assert(math.abs(out.getAs[Double]("top_2gram_frac") - 2.0 / 3) < 1e-12)
    // single-token doc: no grams → both gram fractions 0, no NaN/null
    val one = Curation.repetitionStats(docs(Seq(2L -> "only"))).collect().head
    assert(one.getAs[Double]("dup_3gram_frac") === 0.0)
    assert(one.getAs[Double]("top_2gram_frac") === 0.0)
  }

  test("incrementalDocScores ≡ full re-score of the new version") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("incspec").toString
    def mk(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "text", "source")
    import graft.pipeline.{Curation, Snapshot}
    val v1 = Snapshot.publish(mk(Seq(
      (1L, "stable words here", "a"),
      (2L, "will change soon", "a"),
      (3L, "doomed to removal", "b"))), dir)
    val v2 = Snapshot.publish(mk(Seq(
      (1L, "stable words here", "a"),    // kept: must come from the OLD table
      (2L, "changed entirely now", "a"), // changed: re-scored
      (4L, "fresh arrival", "b"))), dir) // added: scored
    val old = Curation.docScores(Snapshot.read(s, dir, Some(v1)))
    val inc = Curation.incrementalDocScores(s, dir, v1, v2, old)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val full = Curation.docScores(Snapshot.read(s, dir, Some(v2)))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(inc === full)
    assert(inc.map(_.head) === Seq(1L, 2L, 4L)) // 3 removed
  }

  test("zipfFit: a perfectly Zipfian corpus scores alpha exactly 1") {
    val s = spark; import s.implicits._
    // tf(rank i) = 60/i: ln(tf) = ln 60 − 1·ln(rank), colinear points →
    // least-squares slope is exactly −1 whatever the accumulation order
    val text = (1 to 6).flatMap(i => Seq.fill(60 / i)(s"t$i")).mkString(" ")
    val docs = Seq((1L, text, "z")).toDF("doc_id", "text", "source")
    val out = Curation.zipfFit(docs, 6).collect().head
    assert(out.getString(0) === "z")
    assert(out.getLong(1) === 6L)
    assert(out.getDouble(2) === 1.0)
    // a flat (uniform-frequency) corpus scores alpha 0
    val flat = Seq((1L, (1 to 6).map(i => s"u$i u$i").mkString(" "), "f"))
      .toDF("doc_id", "text", "source")
    assert(Curation.zipfFit(flat, 6).collect().head.getDouble(2) === 0.0)
  }

  test("curriculumOrder: sketch-thresholded stages ascend by quality, thirds exact") {
    val s = spark; import s.implicits._
    // 9 docs with strictly distinct quality scores (growing clean-word
    // share): thresholds land on the 3rd and 6th ordered values →
    // exactly 3 docs per stage, stages ordered by quality
    val docs = (0 until 9).map { i =>
      val clean = Seq.fill(i + 1)("steady prose words").mkString(" ")
      val noisy = Seq.fill(9 - i)("#$%! 42").mkString(" ")
      (i.toLong, s"$clean $noisy", "src")
    }.toDF("doc_id", "text", "source")
    val out = Curation.curriculumOrder(docs, 3, "t").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(out.groupBy(_._1).view.mapValues(_.size).toMap ===
      Map(0L -> 3, 1L -> 3, 2L -> 3))
    val q = graft.pipeline.TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byStage = out.groupBy(_._1).view
      .mapValues(_.map(p => q(p._2)).max).toMap
    assert(byStage(0L) < byStage(1L) && byStage(1L) < byStage(2L))
    // determinism: same salt, same order
    val again = Curation.curriculumOrder(docs, 3, "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val first = Curation.curriculumOrder(docs, 3, "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(again === first)
  }

  test("bpeFertility: hand-computed at zero merges; merges drive fertility toward 1") {
    val s = spark; import s.implicits._
    // zero rounds = character-split (+ </w>):
    //   s1 "ab a": 2 words, tokens (a b </w>)+(a </w>) = 5, 4 chars
    //   s2 "abc": 1 word, 4 tokens, 3 chars
    val d = Seq((1L, "ab a", "s1"), (2L, "abc", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Curation.bpeFertility(d, rounds = 0).orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      ("s1", 2L, 5L, 2.5, 0.8), ("s2", 1L, 4L, 4.0, 0.75)))
    // a fully repetitive corpus fuses to whole-word tokens: two merges
    // take "xy xy xy" from 3 tokens/word to exactly 1
    val rep = Seq((1L, "xy xy xy", "s")).toDF("doc_id", "text", "source")
    def fert(rounds: Int) = Curation.bpeFertility(rep, rounds)
      .collect().head.getAs[Double]("fertility")
    assert(fert(0) === 3.0)
    assert(fert(2) === 1.0)
  }

  test("bpe driver tier ≡ forced-distributed loop: merges, tokenize, transfer") {
    // the round-16 size gate routes small vocabularies through the
    // in-memory trainer; graft.bpe.driver.max=0 forces the distributed
    // loop on the SAME corpus — merge tables and token streams must be
    // value-identical (exact long counts, UTF8-byte tie-break, shared
    // BpeMergeFold kernel)
    val d = docs(Seq(
      1L -> "abcdef abcdef abcdef", 2L -> "abcxyz abcxyz ÄØß ÄØß",
      3L -> "defxyz one two two three", 4L -> "abcdefxyz abcdef a",
      5L -> "", 6L -> "repeat repeat repeat repeat"))
    def merged() = Curation.bpeMerges(d, 12).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    def tokens() = Curation.bpeTokenize(d, 12).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toSeq
    val (mDriver, tDriver) = (merged(), tokens())
    System.setProperty("graft.bpe.driver.max", "0")
    try {
      val (mDist, tDist) = (merged(), tokens())
      assert(mDriver === mDist)
      assert(tDriver === tDist)
    } finally System.clearProperty("graft.bpe.driver.max")
  }
}
