package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ts.{SeriesOps => O}
import graft.dsl.Dsl

/** Property tests (SURVEY §5): algebraic laws the operators must
  * satisfy on arbitrary series, plus parser/glob invariants. Spark
  * round-trips are capped to small generated frames — the law, not the
  * volume, is the subject. */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  /** Deterministic stand-in for scalatest's forAll (the scalatestplus
    * bridge is not on the offline classpath): N seeded samples. */
  private def forAll[A](g: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 5)
      (body: (A, B) => Unit): Unit =
    (1 to n).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 100))
      } body(a, b)
    }

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("property-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  private val seriesGen: Gen[List[(String, Long, Double)]] = for {
    nSeries <- Gen.choose(1, 3)
    nPts <- Gen.choose(2, 8)
    vals <- Gen.listOfN(nSeries * nPts,
      Gen.choose(-100.0, 100.0).map(v => math.rint(v * 64) / 64))
  } yield (for {
    s <- 0 until nSeries
    i <- 0 until nPts
  } yield (s"s$s", i * 10L, vals(s * nPts + i))).toList

  private def df(pts: List[(String, Long, Double)]) = {
    val s = spark; import s.implicits._
    pts.toDF("name", "t", "value")
  }
  private def byT(d: org.apache.spark.sql.DataFrame): Map[Long, Double] = {
    val s = spark; import s.implicits._
    d.select("t", "value").as[(Long, Option[Double])].collect()
      .collect { case (t, Some(v)) => t -> v }.toMap
  }

  test("sumSeries(scale(x, k)) == scale(sumSeries(x), k)") {
    forAll2(seriesGen, Gen.oneOf(0.5, 2.0, -1.0)) { (pts, k) =>
      val a = byT(O.sumSeries(O.scale(df(pts), k)))
      val b = byT(O.scale(O.sumSeries(df(pts)), k))
      assert(a.keySet == b.keySet)
      a.foreach { case (t, v) => assert(math.abs(v - b(t)) < 1e-9) }
    }
  }

  test("integral ∘ derivative recovers the series up to the anchor") {
    // derivative then exclusive-prefix-sum: value(t_i) − value(t_0)
    forAll(seriesGen.map(_.filter(_._1 == "s0"))) { pts =>
      if (pts.size >= 2) {
        val orig = pts.map(p => p._2 -> p._3).toMap
        val v0 = orig.min._2
        // integral is exclusive (0 at first point), so integrate the
        // derivative and add it to each point's predecessor chain
        val got = byT(O.integral(O.derivative(df(pts))))
        // derivative's first point is NULL; integral skips NULLs, so
        // got(t_i) == value(t_{i-1}) − value(t_0); check the final sum
        val ts = orig.keys.toList.sorted
        ts.drop(2).foreach { t =>
          val prev = ts(ts.indexOf(t) - 1)
          assert(math.abs(got(t) - (orig(prev) - v0)) < 1e-9)
        }
      }
    }
  }

  test("align at the same step is the identity") {
    forAll(seriesGen) { pts =>
      val (aligned, step) = O.align(Seq((df(pts), 10L), (df(pts).limit(0), 10L)))
      assert(step == 10L)
      val got = aligned.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == pts.toSet)
    }
  }

  test("refQuantile is bounded by min and max") {
    forAll2(Gen.nonEmptyListOf(Gen.choose(-50.0, 50.0)),
        Gen.choose(0.0, 1.0)) { (vs, p) =>
      val s = spark; import s.implicits._
      val q = Seq(vs).toDF("vs")
        .select(O.refQuantile(sort_array(col("vs")), p).as("q"))
        .as[Double].head()
      assert(q >= vs.min - 1e-12 && q <= vs.max + 1e-12)
    }
  }

  test("maxSeries ≥ minSeries pointwise; rangeOfSeries = difference") {
    forAll(seriesGen) { pts =>
      val mx = byT(O.maxSeries(df(pts)))
      val mn = byT(O.minSeries(df(pts)))
      val rg = byT(O.rangeOfSeries(df(pts)))
      mx.foreach { case (t, v) =>
        assert(v >= mn(t))
        assert(math.abs(rg(t) - (v - mn(t))) < 1e-12)
      }
    }
  }

  test("glob→regex: every generated name matches its own literal glob") {
    val segGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    forAll(Gen.nonEmptyListOf(segGen)) { segs =>
      val name = segs.mkString(".")
      assert(name.matches(Dsl.globToRegex(name)))
      // a '*' in any single segment still matches
      val starred = (segs.head :: segs.tail).zipWithIndex
        .map { case (s, i) => if (i == 0) "*" else s }.mkString(".")
      assert(name.matches(Dsl.globToRegex(starred)))
    }
  }

  test("parser round-trip: rendering an AST reparses to itself") {
    import Dsl._
    def render(n: Node): String = n match {
      case Num(v) => if (v == v.toLong) v.toLong.toString else v.toString
      case Str(s) => s"'$s'"
      case Pattern(p) => p
      case Call(f, args, kw) =>
        (args.map(render) ++ kw.map { case (k, v) => s"$k=${render(v)}" })
          .mkString(s"$f(", ", ", ")")
    }
    val leafGen: Gen[Node] = Gen.oneOf(
      Gen.choose(-100, 100).map(n => Num(n.toDouble)),
      Gen.identifier.map(Str(_)),
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(cs => Pattern(cs.mkString)))
    def callGen(depth: Int): Gen[Node] =
      if (depth == 0) leafGen
      else for {
        f <- Gen.identifier.suchThat(_.headOption.exists(_.isLetter))
        n <- Gen.choose(1, 3)
        args <- Gen.listOfN(n, Gen.frequency(3 -> leafGen, 1 -> callGen(depth - 1)))
      } yield Call(f, args, Map.empty)
    forAll(callGen(2)) { ast =>
      assert(Dsl.parse(render(ast)) == ast)
    }
  }

  test("pickle: encode/decode round-trips arbitrary point batches") {
    import graft.streaming.Pickle
    val pointGen = for {
      name <- Gen.nonEmptyListOf(Gen.frequency(
        8 -> Gen.alphaNumChar, 1 -> Gen.const('.'), 1 -> Gen.const('_')))
        .map(_.mkString.take(60))
      ts <- Gen.choose(0L, Int.MaxValue.toLong)
      v <- Gen.oneOf(Gen.choose(-1e12, 1e12),
        Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, 1e-300, math.Pi))
    } yield Pickle.Point(name, ts, v)
    forAll(Gen.listOfN(40, pointGen), n = 8) { pts =>
      assert(Pickle.decodeFrames(Pickle.encodeFrame(pts)) === pts)
      // frame concatenation: stream of frames decodes in order
      val half = pts.length / 2
      val stream = Pickle.encodeFrame(pts.take(half)) ++
        Pickle.encodeFrame(pts.drop(half))
      assert(Pickle.decodeFrames(stream) === pts)
    }
  }

  test("whisper: single-archive extraction = all-but-newest, +step shift") {
    import graft.sources.Whisper
    val step = 60L
    val slotsGen = for {
      n <- Gen.choose(2, 50)
      start <- Gen.choose(10000L, 1000000L)
      vals <- Gen.listOfN(n, Gen.choose(-1e6, 1e6))
    } yield vals.zipWithIndex.map { case (v, i) =>
      Whisper.Point((start / step + i) * step, v)
    }
    forAll(slotsGen, n = 8) { slots =>
      val blob = Whisper.encode(1, 0.5f, Seq(step -> slots))
      val got = Whisper.extractPoints(blob)
      // a full ring: every slot is in [last-span, last); only the
      // newest is dropped (end == last); timestamps shift to slot ends
      val want = slots.dropRight(1).map(p => Whisper.Point(p.tsSec + step, p.value))
      assert(got === want)
    }
  }

  test("whisper: two-archive emission ranges never overlap") {
    import graft.sources.Whisper
    val gen = for {
      nF <- Gen.choose(2, 20)
      nC <- Gen.choose(2, 20)
      base <- Gen.choose(100L, 5000L)
    } yield (nF, nC, base * 300L)
    forAll(gen, n = 8) { case (nF, nC, base) =>
      val fine = (0 until nF).map(i => Whisper.Point(base + i * 60L, i.toDouble))
      val coarse = (0 until nC).map(i =>
        Whisper.Point((base / 300) * 300 - (nC - i) * 300L, 100.0 + i))
      val blob = Whisper.encode(1, 0.5f, Seq(60L -> fine, 300L -> coarse))
      val got = Whisper.extractPoints(blob)
      assert(got.map(_.tsSec).distinct.length === got.length) // no dup ts
      assert(got === got.sortBy(_.tsSec)) // ascending
      // fine points all come from the fine archive's value domain,
      // coarse contributions sit strictly before the fine range start
      val fineStart = fine.last.tsSec + 60L - nF * 60L
      got.filter(_.value >= 100.0).foreach(p => assert(p.tsSec < fineStart))
    }
  }

  test("sampling: hash-sample is a stable subset with stable buckets") {
    import graft.pipeline.Sampling
    val s = spark; import s.implicits._
    forAll(Gen.listOfN(60, Gen.choose(0L, 100000L)).map(_.distinct), n = 3) { ids =>
      val docs = ids.toDF("doc_id")
      val a = Sampling.hashSample(docs, col("doc_id"), 0.3)
        .as[Long].collect().sorted
      val b = Sampling.hashSample(docs, col("doc_id"), 0.3)
        .as[Long].collect().sorted
      assert(a === b) // deterministic run-to-run
      assert(a.toSet.subsetOf(ids.toSet))
      // rate monotonicity: a larger rate keeps a superset
      val c = Sampling.hashSample(docs, col("doc_id"), 0.7)
        .as[Long].collect().toSet
      assert(a.toSet.subsetOf(c))
    }
  }

  test("native MinHash/SimHash expressions ≡ higher-order-function folds") {
    import graft.pipeline.NearDup
    val s = spark; import s.implicits._
    val setGen: Gen[List[(Long, Seq[Long])]] = for {
      nDocs <- Gen.choose(1, 6)
      sets <- Gen.listOfN(nDocs,
        Gen.nonEmptyListOf(Gen.choose(0L, NearDup.P - 1)).map(_.distinct.toSeq))
    } yield sets.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }
    forAll(setGen, n = 4) { rows =>
      val sets = rows.toDF("doc_id", "hs")
      val native = NearDup.signaturesFromSets(sets)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val hof = NearDup.signaturesFromSetsHof(sets)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(native === hof)
      val nSim = sets.select(col("doc_id"),
          graft.functions.HashExprs.simhashSig(col("hs")).as("simhash"))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val hSim = NearDup.simhashFromSetsHof(sets)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(nSim === hSim)
    }
    // empty set: native must reproduce the fold's initial accumulator
    val empty = Seq((0L, Seq.empty[Long])).toDF("doc_id", "hs")
    val nat = NearDup.signaturesFromSets(empty).collect().head.toSeq.drop(1)
    assert(nat.forall(_ == Long.MaxValue))
    assert(sql_eval(empty) == 0L)
  }

  private def sql_eval(empty: org.apache.spark.sql.DataFrame): Long =
    empty.select(graft.functions.HashExprs.simhashSig(col("hs")))
      .collect().head.getLong(0)

  test("native profileHits ≡ per-profile array_contains folds") {
    import graft.pipeline.TextAnalysis
    val s = spark; import s.implicits._
    val vocab = Gen.oneOf("the", "cat", "la", "der", "und", "le", "xyz", "a")
    val textGen = Gen.listOf(vocab).map(_.mkString(" "))
    forAll(Gen.listOfN(6, textGen), n = 4) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val profiles = TextAnalysis.LangProfiles.map(_._2)
      val toks = split(trim(lower(col("text"))), "\\s+")
      val native = docs.select(col("doc_id"),
        graft.functions.TextExprs.profileHits(toks, profiles).as("h"))
        .orderBy("doc_id").collect().map(_.getSeq[Long](1)).toSeq
      val hof = docs.select(col("doc_id") +: profiles.zipWithIndex.map {
          case (p, i) =>
            val stopArr = array(p.map(lit): _*)
            aggregate(toks, lit(0L), (acc, t) =>
              acc + when(array_contains(stopArr, t), 1L).otherwise(0L)).as(s"h$i")
        }: _*)
        .orderBy("doc_id").collect()
        .map(r => profiles.indices.map(i => r.getLong(i + 1))).toSeq
      assert(native === hof)
    }
  }

  test("native expressions: interpreted eval path ≡ codegen path") {
    // production falls back to nullSafeEval when codegen is disabled
    // or compilation fails — pin that path against the codegen'd one
    // for every native expression
    val s = spark; import s.implicits._
    import graft.functions.{HashExprs, TextExprs, VectorExprs}
    import graft.pipeline.{NearDup, Similarity}
    val hs = Seq((1L, Seq(5L, 12345L, 2147483646L), Seq("the", "la", "und", "xyz"),
      "rolling hash input", Seq.fill(Similarity.Dim)(3L)))
      .toDF("id", "hs", "toks", "txt", "qv")
    def run(): Seq[Seq[Any]] = hs.select(
        HashExprs.minhashSig(col("hs"), NearDup.hashParams.map(_._1),
          NearDup.hashParams.map(_._2), NearDup.P),
        HashExprs.simhashSig(col("hs")),
        VectorExprs.dot(col("qv"), col("qv")),
        VectorExprs.lshSign(col("qv"), Similarity.planes.map(_.map(_.toLong))),
        VectorExprs.nearestCentroid(col("qv"),
          Seq((0L, Seq.fill(Similarity.Dim)(1.0)), (1L, Seq.fill(Similarity.Dim)(-1.0)))),
        TextExprs.profileHits(col("toks"), Seq(Seq("the", "und"), Seq("la"))),
        TextExprs.rollingHash(col("txt"), 31L, NearDup.P),
        TextExprs.md5Prefix60(col("txt")),
        TextExprs.nfcClean(concat(col("txt"), lit("\te\u0301\u200Bx\u00A0"))))
      .collect().map(_.toSeq).toSeq
    val codegen = run()
    val conf = spark.conf
    val (ws0, fm0) = (conf.get("spark.sql.codegen.wholeStage"),
      conf.get("spark.sql.codegen.factoryMode"))
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() === codegen)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", ws0)
      conf.set("spark.sql.codegen.factoryMode", fm0)
    }
  }

  test("nfcClean: composition, zero-width strip, collapse class, trim vectors") {
    val s = spark; import s.implicits._
    val cases = Seq(
      ("e\u0301", "\u00E9"),              // NFC composes e + combining acute
      ("a\u200Bb", "ab"),                 // ZWSP dropped, no space injected
      ("a\u00A0\u2003b", "a b"),          // NBSP + em-space collapse to ONE
      ("  a\t\r\n b  ", "a b"),           // runs collapse; boundary trim
      (" \u200B \u3000 ", ""),            // whitespace-only collapses away
      ("j\u00E1 est\u00E1", "j\u00E1 est\u00E1")) // already NFC: identity
    val out = cases.map(_._1).toDF("s")
      .select(graft.functions.TextExprs.nfcClean(col("s"))).as[String]
      .collect().toSeq
    assert(out === cases.map(_._2))
  }

  test("asof join: inclusive at equal ts, null before first match, tolerance") {
    import graft.ts.Asof
    val s = spark; import s.implicits._
    val left = Seq((1L, 5L), (1L, 10L), (1L, 20L), (2L, 7L))
      .toDF("k", "ts")
    val right = Seq((1L, 5L, 50.0), (1L, 12L, 120.0), (3L, 1L, 99.0))
      .toDF("k", "ts", "v")
    val out = Asof.join(left, right, Seq("k"), "ts", Seq("v"))
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out.toSeq === Seq(
      (1L, 5L, Some(50.0), Some(5L)),   // equal ts matches (inclusive)
      (1L, 10L, Some(50.0), Some(5L)),  // latest at-or-before
      (1L, 20L, Some(120.0), Some(12L)),
      (2L, 7L, None, None)))            // key with no right rows
    // tolerance: staleness > 4 ticks nulls the match out
    // (ts=10 matched rt=5 → 5 stale; ts=20 matched rt=12 → 8 stale)
    val tol = Asof.join(left, right, Seq("k"), "ts", Seq("v"),
        tolerance = Some(lit(4L)))
      .orderBy("k", "ts").collect()
      .map(r => Option(r.get(2)).map(_.asInstanceOf[Double]))
    assert(tol.toSeq === Seq(Some(50.0), None, None, None))
  }

  test("native nearestCentroid ≡ crossJoin+window argmax, bit-exact") {
    val s = spark; import s.implicits._
    val dim = 8
    val vecGen = Gen.listOfN(dim, Gen.choose(-5L, 5L)).map(_.toSeq)
    val genCase = for {
      nv <- Gen.choose(1, 6)
      nc <- Gen.choose(1, 4)
      vs <- Gen.listOfN(nv, vecGen)
      cs <- Gen.listOfN(nc, Gen.listOfN(dim, Gen.choose(-3.0, 3.0)).map(_.toSeq))
    } yield (vs.zipWithIndex.map { case (v, i) => (i.toLong, v) },
      cs.zipWithIndex.map { case (c, i) => (i.toLong, c) })
    forAll(genCase, n = 6) { case (vrows, crows) =>
      val qv = vrows.toDF("vec_id", "qv")
      val native = qv.select(col("vec_id"),
          graft.functions.VectorExprs.nearestCentroid(col("qv"), crows).as("nc"))
        .select(col("vec_id"), col("nc.cid"), col("nc.cos"))
        .orderBy("vec_id").collect()
      val cents = crows.toDF("cid", "cent")
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        graft.functions.VectorExprs.dot(x, y)
      val ref = qv.withColumn("__qn", sqrt(dot(col("qv"), col("qv"))))
        .crossJoin(cents.withColumn("__cn", sqrt(dot(col("cent"), col("cent")))))
        .select(col("vec_id"), col("cid"),
          (dot(col("qv"), col("cent")) / (col("__qn") * col("__cn"))).as("cos"))
        .withColumn("__r", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
            .orderBy(col("cos").desc, col("cid"))))
        .filter(col("__r") === 1)
        .select(col("vec_id"), col("cid"), col("cos"))
        .orderBy("vec_id").collect()
      native.zip(ref).foreach { case (n, r) =>
        assert(n.getLong(1) === r.getLong(1))
        assert(java.lang.Double.doubleToLongBits(n.getDouble(2)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          s"vec ${n.getLong(0)}")
      }
    }
    // zero vector: all cosines NaN → lowest cid, NaN cos (desc sorts NaN first)
    val z = Seq((0L, Seq.fill(dim)(0L))).toDF("vec_id", "qv")
    val out = z.select(graft.functions.VectorExprs.nearestCentroid(col("qv"),
      Seq((3L, Seq.fill(dim)(1.0)), (7L, Seq.fill(dim)(2.0)))).as("nc"))
      .select(col("nc.cid"), col("nc.cos")).collect().head
    assert(out.getLong(0) === 3L && out.getDouble(1).isNaN)
    // a null element ⇒ null assignment (malformed vector, documented)
    val holed = spark.sql(
      s"SELECT array(${(1 to dim).map(i => if (i == 3) "CAST(NULL AS BIGINT)" else s"CAST($i AS BIGINT)").mkString(", ")}) AS qv")
    val nres = holed.select(graft.functions.VectorExprs.nearestCentroid(
      col("qv"), Seq((0L, Seq.fill(dim)(1.0)))).as("nc")).collect().head
    assert(nres.isNullAt(0))
    // a wrong-length vector ⇒ null too, for nearestCentroid AND lshSign
    // (the zip_with folds they replace pad with null and absorb it —
    // truncation would silently score a wrong-dimension vector)
    val short = Seq((1L, (1 to (dim - 2)).map(_.toLong).toList),
        (2L, (1 to (dim + 2)).map(_.toLong).toList))
      .toDF("vec_id", "qv")
    val wrong = short.select(
      graft.functions.VectorExprs.nearestCentroid(col("qv"),
        Seq((0L, Seq.fill(dim)(1.0)))).as("nc"),
      graft.functions.VectorExprs.lshSign(col("qv"),
        graft.pipeline.Similarity.planes.map(_.map(_.toLong))).as("sig"))
      .collect()
    assert(wrong.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("native arraySumLong ≡ unrolled per-dim sum columns, exact") {
    val s = spark; import s.implicits._
    val dim = 7
    val genCase = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, 3)
        vs <- Gen.listOfN(dim, Gen.choose(-1000000L, 1000000L))
      } yield (g, vs.toSeq))
    } yield rows
    forAll(genCase, n = 4) { rows =>
      // repartition forces the partial/final MERGE path through the
      // serialized buffer, not just single-partition update+eval
      val df = rows.toDF("g", "qv").repartition(5)
      val nat = df.groupBy(col("g"))
        .agg(graft.functions.VectorExprs.arraySumLong(col("qv")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      val sums = (0 until dim).map(i => sum(col("qv").getItem(i)).as(s"s$i"))
      val un = df.groupBy(col("g")).agg(sums.head, sums.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (0 until dim).map(i => r.getLong(i + 1)).toSeq)
        .toMap
      assert(nat === un)
    }
    // null ARRAYS are skipped like sum; an all-null group is null
    val withNulls = Seq((0, Seq(1L, 2L)), (0, null: Seq[Long]),
      (1, null: Seq[Long])).toDF("g", "qv")
    val out = withNulls.groupBy(col("g"))
      .agg(graft.functions.VectorExprs.arraySumLong(col("qv")).as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(out(0) === Some(Seq(1L, 2L)))
    assert(out(1) === None)
    // mixed lengths within a group fail loudly, never silently skew
    val mixed = Seq((0, Seq(1L)), (0, Seq(1L, 2L))).toDF("g", "qv")
    val err = intercept[Exception] {
      mixed.groupBy(col("g"))
        .agg(graft.functions.VectorExprs.arraySumLong(col("qv")).as("s"))
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("native nearestInCell ≡ plan-time nearestCentroid, bit-exact") {
    val s = spark; import s.implicits._
    val dim = 8
    val vecGen = Gen.listOfN(dim, Gen.choose(-5L, 5L)).map(_.toSeq)
    val genCase = for {
      nv <- Gen.choose(1, 6)
      nc <- Gen.choose(1, 4)
      vs <- Gen.listOfN(nv, vecGen)
      cs <- Gen.listOfN(nc, Gen.listOfN(dim, Gen.choose(-3.0, 3.0)).map(_.toSeq))
    } yield (vs.zipWithIndex.map { case (v, i) => (i.toLong, v) },
      cs.zipWithIndex.map { case (c, i) => (i.toLong, c) })
    forAll(genCase, n = 6) { case (vrows, crows) =>
      val qv = vrows.toDF("vec_id", "qv")
      // runtime cells column: every row carries the same centroid set
      val cellsCol = array(crows.map { case (fc, cent) =>
        struct(lit(fc).as("fcid"),
          array(cent.map(lit(_)): _*).as("cent")) }: _*)
      val runtime = qv.select(col("vec_id"),
          graft.functions.VectorExprs.nearestInCell(col("qv"), cellsCol).as("nc"))
        .select(col("vec_id"), col("nc.fcid"), col("nc.cos"))
        .orderBy("vec_id").collect()
      val planTime = qv.select(col("vec_id"),
          graft.functions.VectorExprs.nearestCentroid(col("qv"), crows).as("nc"))
        .select(col("vec_id"), col("nc.cid"), col("nc.cos"))
        .orderBy("vec_id").collect()
      runtime.zip(planTime).foreach { case (r, p) =>
        assert(r.getLong(1) === p.getLong(1))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
          java.lang.Double.doubleToLongBits(p.getDouble(2)),
          s"vec ${r.getLong(0)}")
      }
    }
    // empty cell array / malformed vector / wrong-dim centroid ⇒ null
    val one = Seq((0L, (1 to dim).map(_.toLong))).toDF("vec_id", "qv")
    val emptyCells = one.select(graft.functions.VectorExprs.nearestInCell(
      col("qv"), array().cast(
        "array<struct<fcid: bigint, cent: array<double>>>")).as("nc"))
      .collect().head
    assert(emptyCells.isNullAt(0))
    val wrongDim = one.select(graft.functions.VectorExprs.nearestInCell(
      col("qv"), array(struct(lit(0L).as("fcid"),
        array(lit(1.0), lit(2.0)).as("cent")))).as("nc")).collect().head
    assert(wrongDim.isNullAt(0))
  }

  test("native md5Prefix60 ≡ conv(substring(md5)) hex parse") {
    val s = spark; import s.implicits._
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.oneOf(' ', 'é', '中'))).map(_.mkString)
    forAll(Gen.listOfN(8, strGen), n = 4) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val both = docs.select(
        graft.functions.TextExprs.md5Prefix60(col("text")).as("native"),
        graft.pipeline.NearDup.h64Hex(col("text")).as("hex")).collect()
      both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    }
  }

  test("native rollingHash ≡ split+ascii fold, including non-ASCII") {
    val s = spark; import s.implicits._
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '.', ','),
      2 -> Gen.oneOf('é', 'ü', 'ñ', '中', '文', 'д', 'ß'))
    forAll(Gen.listOf(charGen).map(_.mkString), n = 8) { text =>
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val native = docs.select(graft.functions.TextExprs.rollingHash(
        col("text"), 31L, graft.pipeline.NearDup.P)).collect().head.getLong(0)
      val hof = docs.select(aggregate(split(col("text"), ""), lit(0L),
        (acc, c) => (acc * 31 + ascii(c)) % graft.pipeline.NearDup.P))
        .collect().head.getLong(0)
      assert(native === hof, s"text=${text.take(40)}")
    }
  }

  test("native countInSet ≡ explode∘broadcast-join∘re-agg membership count") {
    val s = spark; import s.implicits._
    val elemGen = Gen.choose(0L, 50L)
    val rowGen = Gen.listOfN(12, elemGen)
    val setGen = Gen.listOfN(8, elemGen).map(_.distinct)
    forAll2(Gen.listOfN(6, rowGen), setGen, n = 6) { (rows, set) =>
      val df = rows.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }
        .toDF("doc_id", "hs")
      val sorted = set.toArray
      java.util.Arrays.sort(sorted)
      val bc = s.sparkContext.broadcast(sorted)
      val native = df.select(col("doc_id"),
          graft.functions.HashExprs.countInSet(col("hs"), bc).as("n"))
        .orderBy("doc_id").collect().map(_.getLong(1))
      // the formulation it replaced, on distinct-per-doc grams
      val expected = rows.map(_.distinct.count(set.contains)).toArray
      val distinctDf = df.select(col("doc_id"), array_distinct(col("hs")).as("hs"))
      val nativeDistinct = distinctDf.select(col("doc_id"),
          graft.functions.HashExprs.countInSet(col("hs"), bc).as("n"))
        .orderBy("doc_id").collect().map(_.getLong(1))
      assert(nativeDistinct.toSeq === expected.toSeq)
      // occurrence semantics: each occurrence counts once
      assert(native.toSeq === rows.map(_.count(set.contains)).toSeq)
      bc.destroy()
    }
  }

  test("native shingleSet ≡ HOF transform∘distinct, order included") {
    val s = spark; import s.implicits._
    import graft.pipeline.NearDup
    // adversarial text shapes: whitespace runs/tabs/newlines at ends and
    // inside, non-ASCII words (case-folding), short docs (< n words),
    // empty and single-token docs, repeated grams (dedup order)
    val word = Gen.oneOf("alpha", "Beta", "ÄØß", "Σίσυφος", "x", "d-g",
      "alpha") // repeat raises dup-gram probability
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val textGen = for {
      nw <- Gen.choose(0, 12)
      ws <- Gen.listOfN(nw, word)
      ss <- Gen.listOfN(nw + 1, sep)
    } yield (ss.head +: ws.zip(ss.tail).flatMap { case (w, p) => Seq(w, p) })
      .mkString("")
    forAll(Gen.listOfN(8, textGen), n = 6) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = NearDup.shingleSets(docs)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      val hof = NearDup.shingleSetsHof(docs)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      assert(native.toSeq === hof.toSeq)
    }
  }

  test("native dot/cosine/lshSign ≡ higher-order-function folds, bit-exact") {
    import graft.pipeline.Similarity
    val s = spark; import s.implicits._
    val vecGen: Gen[List[(Long, Seq[Float])]] = for {
      n <- Gen.choose(2, 5)
      vs <- Gen.listOfN(n, Gen.listOfN(Similarity.Dim,
        Gen.choose(-1.0, 1.0).map(_.toFloat)).map(_.toSeq))
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    forAll(vecGen, n = 4) { rows =>
      val vecs = rows.toDF("vec_id", "embedding")
      val pairs = vecs.select(col("vec_id").as("va"), col("embedding").as("ea"))
        .crossJoin(vecs.select(col("vec_id").as("vb"), col("embedding").as("eb")))
      // java.lang.Double.compare-style exact equality, including sign of zero
      val both = pairs.select(
        Similarity.cosine(col("ea"), col("eb")).as("native"),
        Similarity.cosineHof(col("ea"), col("eb")).as("hof")).collect()
      both.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
      val sigs = vecs.select(
        Similarity.lshSig(col("embedding")).as("native"),
        Similarity.lshSigHof(col("embedding")).as("hof")).collect()
      sigs.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    }
    // null element and length mismatch both yield null, like zip_with
    val odd = spark.sql(
      """SELECT array(1.0D, 2.0D, 3.0D) AS a,
        |       array(1.0D, CAST(NULL AS DOUBLE), 3.0D) AS b,
        |       array(1.0D, 2.0D) AS short""".stripMargin)
    val d = odd.select(
      graft.functions.VectorExprs.dot(col("a"), col("b")).as("withNull"),
      graft.functions.VectorExprs.dot(col("a"), col("short")).as("mismatch"))
      .collect().head
    assert(d.isNullAt(0) && d.isNullAt(1))
  }

  test("packed rank/filter round-trip preserves rows, null slots included") {
    val s = spark; import s.implicits._
    // series with unknown (null) slots — the packed collect_list form
    // must carry them through struct elements, not drop them
    val gen: Gen[List[(String, Long, Option[Double])]] = for {
      nSeries <- Gen.choose(1, 4)
      nPts <- Gen.choose(2, 8)
      vals <- Gen.listOfN(nSeries * nPts,
        Gen.option(Gen.choose(-100.0, 100.0).map(v => math.rint(v * 64) / 64)))
    } yield (for {
      sI <- 0 until nSeries
      i <- 0 until nPts
    } yield (s"s$sI", i * 10L, vals(sI * nPts + i))).toList
    def rows(x: org.apache.spark.sql.DataFrame) =
      x.select("name", "t", "value").as[(String, Long, Option[Double])]
        .collect().sortBy(r => (r._1, r._2))
    forAll(gen, n = 6) { pts =>
      val d = pts.toDF("name", "t", "value")
      val all = rows(d)
      // limit over-capacity keeps every series and every row verbatim
      assert(rows(O.limitSeries(d, 10)) === all)
      // rank keeps exactly the series the two-pass summaries form ranks
      val ref = O.summaries(d)
        .orderBy(col("smax").desc, col("name").asc).limit(2)
        .select("name").as[String].collect().toSet
      assert(rows(O.highestMax(d, 2)) === all.filter(r => ref(r._1)))
      // filter form agrees with a driver-side recomputation of smax
      val keep = pts.groupBy(_._1).collect {
        case (n2, rs) if rs.flatMap(_._3).nonEmpty && rs.flatMap(_._3).max > 0.0 => n2
      }.toSet
      assert(rows(O.maximumAbove(d, 0.0)) === all.filter(r => keep(r._1)))
    }
  }

  test("int8 quantization: per-element error ≤ s/2, range and invariants") {
    val s = spark; import s.implicits._
    val gen: Gen[List[List[Float]]] = for {
      n <- Gen.choose(2, 6)
      dim <- Gen.choose(1, 8)
      vals <- Gen.listOfN(n * dim, Gen.choose(-8.0f, 8.0f))
    } yield vals.grouped(dim).toList
    forAll(gen, n = 5) { vecs =>
      val d = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val out = pipeline.Similarity.quantizeInt8(d)
        .select("vec_id", "q", "qnorm2", "mse").collect()
      val dim = vecs.head.size
      // driver-side recomputation of the per-dim scales
      val scales = (0 until dim).map { j =>
        val m = vecs.map(v => math.abs(v(j).toDouble)).max
        if (m == 0.0) 1.0 else m / 127.0
      }
      out.foreach { r =>
        val v = vecs(r.getLong(0).toInt)
        val q = r.getSeq[Long](1)
        assert(q.forall(x => x >= -127 && x <= 127))
        assert(r.getLong(2) === q.map(x => x * x).sum)
        // in-range elements round to within half a scale step
        q.indices.foreach { j =>
          assert(math.abs(v(j) - q(j) * scales(j)) <= scales(j) / 2 + 1e-9)
        }
        val mse = q.indices.map(j =>
          math.pow(v(j) - q(j) * scales(j), 2)).sum / dim
        assert(math.abs(r.getDouble(3) - mse) < 1e-12)
      }
    }
  }

  test("mixtureSample: integer weights replicate, w ≤ 1 ≡ stratified keep") {
    val s = spark; import s.implicits._
    val d = (0L until 60L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val w = Seq(("src0", 2.0), ("src1", 0.4)).toDF("stratum", "weight")
    val out = pipeline.Sampling.mixtureSample(
        d, col("source"), col("doc_id"), w, 1.0)
      .select("doc_id", "source", "copy").as[(Long, String, Long)]
      .collect().toSeq.sorted
    // integer weight 2.0: every src0 doc exactly twice, copies 0 and 1
    val src0 = out.filter(_._2 == "src0")
    assert(src0.map(_._1).distinct.size === 20 && src0.size === 40)
    assert(src0.groupBy(_._1).values.forall(_.map(_._3).sorted == Seq(0L, 1L)))
    // w = 0.4 < 1: same keep set as the stratified sampler, single copy
    val rates = Seq(("src1", 0.4)).toDF("stratum", "rate")
    val keep = pipeline.Sampling.stratifiedSample(
        d.filter(col("source") === "src1"), col("source"), col("doc_id"),
        rates, 0.0)
      .select("doc_id").as[Long].collect().toSet
    val src1 = out.filter(_._2 == "src1")
    assert(src1.map(_._1).toSet === keep && src1.forall(_._3 == 0L))
    // default weight 1.0: every src2 doc exactly once
    val src2 = out.filter(_._2 == "src2")
    assert(src2.map(_._1).distinct.size === 20 && src2.size === 20)
    // weight 0 removes the stratum entirely; 1.5 gives every doc one
    // copy and a hash-chosen half a second one
    val w2 = Seq(("src0", 0.0), ("src1", 1.5)).toDF("stratum", "weight")
    val out2 = pipeline.Sampling.mixtureSample(
        d, col("source"), col("doc_id"), w2, 1.0)
      .select("doc_id", "source", "copy").as[(Long, String, Long)]
      .collect().toSeq
    assert(!out2.exists(_._2 == "src0"))
    val s1 = out2.filter(_._2 == "src1")
    val perDoc = s1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perDoc.values.forall(n => n == 1 || n == 2))
    assert(perDoc.size === 20 && perDoc.values.exists(_ == 2))
  }

  test("exponentialMovingAverage: SMA seed, recurrence, fallback, null drop") {
    val s = spark; import s.implicits._
    // graphite-web seeding, w=3 -> alpha=0.5: observed points (null
    // dropped) are 4, 8, 2, 6; the first w-1=2 are warm-up, seed SMA
    // (4+8+2)/3 = 14/3 emitted at t=30, then e = 0.5·6 + 0.5·(14/3)
    val rows = Seq(("a", 0L, Some(4.0)), ("a", 10L, Some(8.0)),
      ("a", 20L, None: Option[Double]), ("a", 30L, Some(2.0)),
      ("a", 40L, Some(6.0)))
    val out = ts.SeriesOps.exponentialMovingAverage(
        rows.toDF("name", "t", "value"), 3)
      .orderBy("t").as[(String, Long, Double)].collect().toSeq
    val seed = (4.0 + 8.0 + 2.0) / 3
    assert(out === Seq(("a", 30L, seed), ("a", 40L, 0.5 * 6.0 + 0.5 * seed)))
    // series shorter than the window: documented v0-seed fallback,
    // every observed point emitted
    val short = ts.SeriesOps.exponentialMovingAverage(
        Seq(("b", 0L, 4.0), ("b", 10L, 8.0)).toDF("name", "t", "value"), 3)
      .orderBy("t").as[(String, Long, Double)].collect().toSeq
    assert(short === Seq(("b", 0L, 4.0), ("b", 10L, 0.5 * 8.0 + 0.5 * 4.0)))
    intercept[IllegalArgumentException] {
      ts.SeriesOps.exponentialMovingAverage(rows.toDF("name", "t", "value"), 0)
    }
  }

  test("sequential-op family: per-series point bound fails loudly") {
    // the guard itself, at a test-scale bound: names the op, the
    // series, and the remedy instead of ballooning a task array
    val e = intercept[IllegalStateException] {
      ts.SeriesOps.boundedSeries("lttb", "web.cpu", Iterator.range(0, 10),
        maxPoints = 5)
    }
    assert(e.getMessage.contains("lttb") && e.getMessage.contains("web.cpu")
      && e.getMessage.contains("consolidate"))
    // under the bound: pass-through
    assert(ts.SeriesOps.boundedSeries("lttb", "web.cpu",
      Iterator.range(0, 5), maxPoints = 5).toSeq === Seq(0, 1, 2, 3, 4))
  }

  test("linearRegression: decimal overflow raises loudly (DuckDB parity)") {
    val s = spark; import s.implicits._
    // dt ~ 9e18 times q ~ 1e20 overflows decimal(38,0) in one product.
    // Under ANSI (the Spark 4 default) the arithmetic itself raises;
    // under non-ANSI the overflow is a silent null that unguarded
    // code would coalesce to 0 and emit as a wrong flat fit where the
    // HUGEINT oracle raises — the operator's guard turns that null
    // into the same loud failure. Both modes must fail, never lie.
    val rows = Seq(("a", 0L, 1.0e16), ("a", 9000000000000000000L, 2.0e16))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    def fit(): Unit =
      graft.ts.SeriesOps.linearRegression(rows.toDF("name", "t", "value"))
        .collect()
    val ansi = intercept[Exception](fit())
    assert(msgs(ansi).exists(m => m.contains("NUMERIC_VALUE_OUT_OF_RANGE")
      || m.contains("overflowed decimal(38,0)")))
    val saved = s.conf.get("spark.sql.ansi.enabled")
    s.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val quiet = intercept[Exception](fit())
      assert(msgs(quiet).exists(_.contains("overflowed decimal(38,0)")))
    } finally s.conf.set("spark.sql.ansi.enabled", saved)
  }

  test("linearRegression: exact fit on a perfect line, flat degenerate, nulls") {
    val s = spark; import s.implicits._
    // perfect line v = 1 + 0.1·t: fit must reproduce it exactly (the
    // quantized statistics are exact; the double fit has zero residual)
    val line = Seq(("a", 0L, Some(1.0)), ("a", 10L, Some(2.0)),
      ("a", 20L, Some(3.0)),
      // single-point series: zero denominator -> flat mean line
      ("b", 5L, Some(7.0)),
      // all-null series: stays null
      ("c", 0L, None: Option[Double]), ("c", 10L, None: Option[Double]))
    val out = graft.ts.SeriesOps.linearRegression(
        line.toDF("name", "t", "value"))
      .as[(String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", 0L)).contains(1.0) && out(("a", 10L)).contains(2.0) &&
      out(("a", 20L)).contains(3.0), s"line not reproduced: $out")
    assert(out(("b", 5L)).contains(7.0))
    assert(out(("c", 0L)).isEmpty && out(("c", 10L)).isEmpty)
    // a null gap inside an observed series still gets a fitted value
    val gap = Seq(("d", 0L, Some(0.0)), ("d", 10L, None: Option[Double]),
      ("d", 20L, Some(2.0)))
    val g = graft.ts.SeriesOps.linearRegression(gap.toDF("name", "t", "value"))
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._2 -> r._3).toMap
    assert(g(10L).contains(1.0), s"gap not on the line: $g")
  }

  test("lttb: endpoints kept, spikes survive averaging, bucket laws hold") {
    val s = spark; import s.implicits._
    // flat series with one spike: bucket averaging would flatten it,
    // LTTB must keep the spike point itself
    val rows = (0L until 30L).map(i =>
      ("s", i * 10, if (i == 17) 100.0 else 1.0))
    val out = ts.Lttb.lttb(rows.toDF("name", "t", "value"), 5)
      .orderBy("t").as[(String, Long, Double)].collect()
    assert(out.length === 5)
    assert(out.head._2 === 0L && out.last._2 === 290L, "endpoints not kept")
    assert(out.exists(p => p._2 == 170L && p._3 == 100.0), "spike flattened")
    // n <= threshold: identity (all points, original values)
    assert(ts.Lttb.lttb(rows.toDF("name", "t", "value"), 30).count() === 30L)
    // nulls (dense-grid gaps) are dropped before selection
    val withNulls = rows.map(r => (r._1, r._2, Some(r._3))) :+
      (("s", 500L, None: Option[Double]))
    assert(ts.Lttb.lttb(withNulls.toDF("name", "t", "value"), 5)
      .count() === 5L)
    // bucket laws on a pseudo-random series: exactly one point per
    // middle bucket, strictly increasing, endpoints present
    val n = 101; val k = 12
    val ts0 = (0 until n).map(i => (i * 7L + (i % 3))).toArray
    val qs0 = (0 until n).map(i => ((i * 2654435761L) % 997) - 500).toArray
    val idx = ts.Lttb.selectIdx(ts0, qs0, k)
    assert(idx.length === k && idx.head === 0 && idx.last === n - 1)
    assert(idx.sliding(2).forall { case Seq(a, b) => a < b })
    def bound(x: Int): Int = 1 + (x.toLong * (n - 2) / (k - 2)).toInt
    val mids = idx.tail.init
    (0 until k - 2).foreach { j =>
      val inB = mids.count(p => p >= bound(j) && p < bound(j + 1))
      assert(inB === 1, s"bucket $j holds $inB selections (want 1)")
    }
    intercept[IllegalArgumentException] {
      ts.Lttb.lttb(rows.toDF("name", "t", "value"), 2)
    }
  }

  test("splitAssignLeakFree: clusters never straddle; singletons match splitAssign") {
    val s = spark; import s.implicits._
    // 40 singleton docs (distinct texts) + 3 planted near-dup families
    // of 4 members each (identical texts -> Jaccard 1 pairs)
    val famText = (f: Long) =>
      s"family $f shares this exact body of repeated tokens " * 3
    val docs = ((0L until 40L).map(i =>
        (i, s"singleton $i with its own words ${i * 31} and ${i * 17}")) ++
      (0L until 12L).map(i => (100L + i, famText(i % 3)))).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2)
    val out = pipeline.Sampling.splitAssignLeakFree(docs, splits, minJ = 0.8)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.size === 52)
    // every family lands WHOLE in one split
    (0L until 3L).foreach { f =>
      val fam = (0L until 12L).filter(_ % 3 == f).map(i => out(100L + i))
      assert(fam.distinct.size === 1, s"family $f straddles: $fam")
    }
    // docs with no near-dup split exactly as the per-doc assignment
    val base = pipeline.Sampling.splitAssign(
        docs.filter(col("doc_id") < 40), col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert((0L until 40L).forall(i => out(i) == base(i)))
  }

  test("temperatureAlloc: hand-computed weights; tau=1 is proportional") {
    val s = spark; import s.implicits._
    val cnt = Seq(("a", 100L), ("b", 400L)).toDF("stratum", "c")
    // tau=0.5: n^tau = 10, 20; Z = 30; w_i = B·n^tau/Z/n
    val w = pipeline.Sampling.temperatureAlloc(cnt, budget = 300.0, tau = 0.5)
      .select("stratum", "weight").as[(String, Double)].collect().toMap
    assert(math.abs(w("a") - 1.0) < 1e-12 && math.abs(w("b") - 0.5) < 1e-12)
    // tau=1 degenerates to proportional: every stratum gets the same
    // epoch weight budget/Σn — natural shares preserved
    val p = pipeline.Sampling.temperatureAlloc(cnt, budget = 300.0, tau = 1.0)
      .select("stratum", "weight").as[(String, Double)].collect().toMap
    assert(p.values.forall(v => math.abs(v - 0.6) < 1e-12))
    // smaller tau upweights the low-resource stratum relative to its
    // natural share: w_a/w_b grows as tau falls
    assert(w("a") / w("b") > p("a") / p("b"))
    intercept[IllegalArgumentException] {
      pipeline.Sampling.temperatureAlloc(cnt, 300.0, tau = 0.0)
    }
  }

  test("yieldCurve: cumulative from above, all deciles emit, totals at 0") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then it runs home"),
      (2L, "99 1234 55 777 000 311 222 9 8 7"), // digit-heavy -> low quality
      (3L, "a be to of and in it is was for on with he as you do at this but")
    ).toDF("doc_id", "text")
    val out = pipeline.Curation.yieldCurve(docs)
      .select("threshold", "n_docs", "n_tokens")
      .as[(Double, Long, Long)].collect().sortBy(_._1)
    assert(out.length === 10, s"expected all 10 deciles: ${out.toSeq}")
    assert(out.map(_._1).toSeq === (0 until 10).map(_ / 10.0))
    // threshold 0 admits everything
    val totTok = docs.select(sum(size(split(trim(col("text")), "\\s+"))))
      .first().getLong(0)
    assert(out.head._2 === 3L && out.head._3 === totTok)
    // survivors only fall as the cutoff rises
    assert(out.sliding(2).forall { case Array(lo, hi) =>
      lo._2 >= hi._2 && lo._3 >= hi._3 })
    // the digit-heavy doc dies before the stopword-rich ones
    assert(out.exists(r => r._2 < 3L && r._2 > 0L))
  }

  test("bloomNovelty: exact membership at any fpp; nulls and empty history") {
    val s = spark; import s.implicits._
    val hist = Seq((0L, "aa"), (2L, "bb"), (4L, "cc"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val batch = Seq((1L, "aa"), (3L, "zz"), (5L, null.asInstanceOf[String]),
      (7L, "cc")).toDF("doc_id", "text")
    def run(fpp: Double, bits: Long = pipeline.Dedup.BloomMaxNumBits) =
      pipeline.Dedup.bloomNovelty(hist, batch, expectedItems = 4L,
          fpp = fpp, maxNumBits = bits)
        .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    val want = Map(1L -> true, 3L -> false, 5L -> false, 7L -> true)
    assert(run(0.01) === want)
    // a pathologically tiny filter (64 bits for the whole history)
    // floods the confirm join with false positives but CANNOT change
    // the answer — FPs cost, they never lie
    assert(run(0.5, bits = 64L) === want)
    // empty history: everything is novel, no probe, no join
    val none = pipeline.Dedup.bloomNovelty(hist.limit(0), batch)
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect()
    assert(none.length === 4 && none.forall(!_._2))
    // null-text batch rows are never duplicates of anything
    assert(!run(0.01)(5L))
    // the sharded form answers identically (sharding changes only how
    // much novel traffic leaks into the confirm join), at any shard
    // count — including shards > distinct hashes (empty shards)
    Seq(1, 3, 16).foreach { b =>
      val sh = pipeline.Dedup.bloomNoveltySharded(hist, batch, shards = b,
          expectedItems = 4L, fpp = 0.01)
        .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
      assert(sh === want, s"sharded ($b) diverged")
    }
  }

  test("splitAssign: exact partition, cross-table consistency, remainder to last") {
    val s = spark; import s.implicits._
    val d = (0L until 500L).map(i => (i, i % 7)).toDF("doc_id", "grp")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = pipeline.Sampling.splitAssign(d, col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // every row gets exactly one split; all three names appear
    assert(out.size === 500)
    assert(out.values.toSet === Set("train", "val", "test"))
    // hash-expected proportions: train dominates, val+test minor
    val n = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 350 && n("val") < 100 && n("test") < 100)
    // cross-table consistency: a second table keyed the same way
    // lands every shared key in the SAME split
    val e = (0L until 500L).map(i => (i, i * 2)).toDF("vec_id", "x")
    val out2 = pipeline.Sampling.splitAssign(e, col("vec_id"), splits)
      .select("vec_id", "split").as[(Long, String)].collect().toMap
    assert(out.forall { case (k, v) => out2(k) == v })
    // fractions summing under 1: the remainder falls into the LAST
    // split, so the assignment still totals
    val under = pipeline.Sampling.splitAssign(d, col("doc_id"),
        Seq("a" -> 0.5, "b" -> 0.2))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(under("a") + under("b") === 500L && under("b") > 100L)
    // degenerate single split: both twins assign every row to it (the
    // SQL twin must not emit a zero-WHEN CASE, a DuckDB syntax error)
    val one = pipeline.Sampling.splitAssign(d, col("doc_id"),
        Seq("all" -> 1.0))
      .select("split").distinct().as[String].collect().toSeq
    assert(one === Seq("all"))
    assert(pipeline.Sampling.splitAssignSql("doc_id",
      Seq("all" -> 1.0)) === "'all'")
  }

  test("weightedSample: exact model replay; huge weight dominates; k caps output") {
    val s = spark; import s.implicits._
    val rows = (0L until 200L).map(i => (i, 1.0 + (i % 7)))
    val d = rows.toDF("doc_id", "w")
    def uOf(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      ((h % 1000003L) + 1).toDouble / 1000004.0
    }
    def key(id: Long, w: Double): Double =
      math.floor(math.log(uOf(id)) / w * 1e6 + 0.500137) / 1e6
    val expect = rows.map { case (i, w) => (i, key(i, w)) }
      .sortBy { case (i, k) => (-k, i) }.take(25)
    val got = pipeline.Sampling.weightedSample(d, col("doc_id"), col("w"), 25)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("es_key"))).toSeq
      .sortBy { case (i, k) => (-k, i) }
    assert(got === expect)
    // a dominating weight pushes its key to the top regardless of u
    val d2 = d.withColumn("w",
      when(col("doc_id") === 113L, lit(1e9)).otherwise(col("w")))
    val top = pipeline.Sampling.weightedSample(d2, col("doc_id"), col("w"), 1)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(top === Seq(113L))
  }

  test("unimaxAlloc: hand-computed water level, conservation, cap/level split") {
    val s = spark; import s.implicits._
    // caps (E=1) ascending: 2, 4, 9; budget 9. share_1 = 9/3 = 3 > 2 →
    // capped; share_2 = (9-2)/2 = 3.5 ≤ 4 → the level. allocs (2, 3.5,
    // 3.5) conserve the budget exactly.
    val cnt = Seq(("a", 2L), ("b", 4L), ("c", 9L)).toDF("stratum", "c")
    val out = pipeline.Sampling.unimaxAlloc(cnt, 9.0, 1.0)
      .orderBy("stratum")
      .select("stratum", "alloc", "weight")
      .as[(String, Double, Double)].collect()
    assert(out.map(_._2).toSeq === Seq(2.0, 3.5, 3.5))
    assert(math.abs(out.map(_._2).sum - 9.0) < 1e-12)
    assert(math.abs(out(0)._3 - 1.0) < 1e-12)    // capped at 1 epoch
    assert(math.abs(out(2)._3 - 3.5 / 9) < 1e-12)
    // budget beyond total capacity: every stratum caps at maxEpochs
    val over = pipeline.Sampling.unimaxAlloc(cnt, 1000.0, 2.0)
      .select("stratum", "alloc", "weight")
      .as[(String, Double, Double)].collect()
    assert(over.forall(r => math.abs(r._3 - 2.0) < 1e-12))
    assert(math.abs(over.map(_._2).sum - 30.0) < 1e-12)
    // uniform fit: budget small enough that nobody caps — equal shares
    val uni = pipeline.Sampling.unimaxAlloc(cnt, 3.0, 1.0)
      .select("alloc").as[Double].collect()
    assert(uni.forall(a => math.abs(a - 1.0) < 1e-12))
  }

  test("charEntropy: constant text is 0, uniform text is ln k, empties null") {
    val s = spark; import s.implicits._
    val d = Seq(
      0L -> "aaaa",            // one symbol → H = 0
      1L -> "abab",            // two equiprobable → ln 2
      2L -> "abcd",            // four equiprobable → ln 4
      3L -> "aab",             // H = ln 3 − (2 ln 2)/3
      4L -> "",
      5L -> null.asInstanceOf[String])
      .toDF("doc_id", "text")
    val out = pipeline.TextAnalysis.charEntropy(d).orderBy("doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars"), Option(r.getAs[Any]("entropy")))).toMap
    def h(i: Long) = out(i)._2.get.asInstanceOf[Double]
    assert(out(0L)._1 == 4L && math.abs(h(0L)) < 1e-12)
    assert(math.abs(h(1L) - math.log(2)) < 1e-12)
    assert(math.abs(h(2L) - math.log(4)) < 1e-12)
    assert(math.abs(h(3L) - (math.log(3) - 2 * math.log(2) / 3)) < 1e-12)
    assert(out(4L) == (0L, None) && out(5L) == (0L, None))
  }

  test("ivfRecall: recall is exactly 1 when every corpus vector is a probed centroid") {
    val s = spark; import s.implicits._
    // 12 vectors, all ids < IvfK (16): each is its own bucket's seed
    // and assigns to itself (cos with itself = 1). Probe ranking by
    // centroid cosine IS exact-neighbor ranking, so the 4 probed
    // buckets hold the 4 true nearest — recall@3 must be 1.0 for
    // every query.
    val dim = graft.pipeline.Similarity.Dim
    val vecs = (0 until 12).map { i =>
      (i.toLong, Seq.tabulate(dim)(j =>
        (math.sin(i * 37 + j) * 0.5 + 0.6).toFloat))
    }.toDF("vec_id", "embedding")
    val out = pipeline.Similarity.ivfRecall(
        vecs, vecs.filter(col("vec_id") < 3), 3)
      .select("qid", "n_hits", "recall").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(out.length == 3)
    assert(out.forall(r => r._2 == 3L && math.abs(r._3 - 1.0) < 1e-12))
  }

  test("quantized top-k ≡ driver-side int8 MIPS recomputation") {
    val s = spark; import s.implicits._
    val gen: Gen[List[List[Float]]] = for {
      n <- Gen.choose(4, 8)
      dim <- Gen.choose(2, 6)
      vals <- Gen.listOfN(n * dim, Gen.choose(-4.0f, 4.0f))
    } yield vals.grouped(dim).toList
    forAll(gen, n = 5) { vecs =>
      val d = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val k = 3
      val got = pipeline.Similarity
        .topKQuantized(d, d.filter(col("vec_id") === 0), k)
        .orderBy("rank")
        .select("vec_id", "qdot").as[(Long, Long)].collect().toSeq
      // driver-side: corpus scales, quantize, integer dots, same order
      val dim = vecs.head.size
      val scales = (0 until dim).map { j =>
        val m = vecs.map(v => math.abs(v(j).toDouble)).max
        if (m == 0.0) 1.0 else m / 127.0
      }
      def q8(v: List[Float]): Seq[Long] = v.indices.map(j =>
        math.max(-127L, math.min(127L,
          math.floor(v(j).toDouble / scales(j) + 0.5).toLong)))
      val qq = q8(vecs.head)
      val want = vecs.zipWithIndex.drop(1)
        .map { case (v, i) =>
          (i.toLong, q8(v).zip(qq).map { case (a, b) => a * b }.sum) }
        .sortBy { case (id, dot) => (-dot, id) }.take(k)
      assert(got === want)
    }
  }

  test("quantized IVF: scores are exact int8 dots, ranking consistent") {
    val s = spark; import s.implicits._
    val gen: Gen[List[List[Float]]] = for {
      n <- Gen.choose(18, 24) // > IvfK=16 so buckets hold multiple vectors
      dim <- Gen.choose(2, 5)
      vals <- Gen.listOfN(n * dim, Gen.choose(-4.0f, 4.0f))
    } yield vals.grouped(dim).toList
    forAll(gen, n = 3) { vecs =>
      val d = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val out = pipeline.Similarity
        .topKIvfQ8(d, d.filter(col("vec_id") < 2), 5)
        .select("qid", "rank", "vec_id", "qdot")
        .as[(Long, Long, Long, Long)].collect().toSeq
      val dim = vecs.head.size
      val scales = (0 until dim).map { j =>
        val m = vecs.map(v => math.abs(v(j).toDouble)).max
        if (m == 0.0) 1.0 else m / 127.0
      }
      def q8(v: List[Float]): Seq[Long] = v.indices.map(j =>
        math.max(-127L, math.min(127L,
          math.floor(v(j).toDouble / scales(j) + 0.5).toLong)))
      out.groupBy(_._1).foreach { case (qid, rows) =>
        // every reported score is the exact int8 dot of its pair
        rows.foreach { case (_, _, vid, qdot) =>
          val expect = q8(vecs(vid.toInt)).zip(q8(vecs(qid.toInt)))
            .map { case (a, b) => a * b }.sum
          assert(qdot === expect, s"q$qid vs $vid")
        }
        // ranks are 1..n, strictly ordered by (qdot desc, vec_id)
        val sorted = rows.sortBy(_._2)
        assert(sorted.map(_._2) === (1L to sorted.size).toSeq)
        assert(sorted === sorted.sortBy(r => (-r._4, r._3)))
      }
    }
  }

  test("int8 quantization: ragged vector yields null elements, not clamped 127s") {
    val s = spark; import s.implicits._
    // a vector SHORTER than the corpus dimensionality: zip_with pads
    // with nulls — least/greatest skip nulls, so a non-strict clamp
    // would fabricate 127 for every missing dimension and inflate
    // qnorm2 by 16129 each; the null-strict element keeps the
    // documented null-on-mismatch contract
    val d = Seq((0L, List(1.0f, 2.0f, 3.0f)), (1L, List(1.0f)))
      .toDF("vec_id", "embedding")
    val scales = pipeline.Similarity.int8Scales(d.filter(col("vec_id") === 0))
    val out = pipeline.Similarity.quantizeInt8(d, Some(scales))
      .orderBy("vec_id").collect()
    assert(!out(0).isNullAt(2)) // full-length vector: exact invariant
    val ragged = out(1)
    assert(ragged.getSeq[Any](1).drop(1).forall(_ == null),
      "missing dimensions must quantize to null")
    assert(ragged.isNullAt(2) && ragged.isNullAt(3),
      "invariants of a ragged vector must be null")
  }

  test("int8 quantization: all-zero dimension quantizes to 0 via unit scale") {
    val s = spark; import s.implicits._
    val d = List((0L, List(0.0f, 1.0f)), (1L, List(0.0f, -2.0f)))
      .toDF("vec_id", "embedding")
    val q = pipeline.Similarity.quantizeInt8(d).orderBy("vec_id")
      .select("q").as[Seq[Long]].collect()
    assert(q(0)(0) === 0L && q(1)(0) === 0L)
    assert(q(0)(1) === 64L && q(1)(1) === -127L) // scale = 2/127
  }

  test("Misra-Gries law: for ANY corpus, partitioning and k — bounds hold") {
    val s = spark; import s.implicits._
    // arbitrary zipf-ish token streams, arbitrary sketch capacity,
    // arbitrary partition count: counts never exceed the truth, never
    // undershoot it by more than N/(k+1), size stays ≤ k, and every
    // token with true count > N/(k+1) is present
    val gCorpus = for {
      vocab <- Gen.choose(1, 60)
      n <- Gen.choose(1, 800)
      toks <- Gen.listOfN(n, Gen.choose(0, vocab - 1)
        .map(i => s"w${i * i % vocab}")) // quadratic residues skew the mass
    } yield toks
    val gK = Gen.choose(1, 24)
    forAll2(gCorpus, gK, n = 6) { (toks, k) =>
      val exact = toks.groupBy(identity).map { case (t, l) => t -> l.size.toLong }
      val nTot = toks.size.toLong
      val parts = 1 + (toks.size % 7)
      val got = toks.toDF("tok").repartition(parts)
        .agg(graft.functions.SketchExprs.heavyHitters(col("tok"), k).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.token"), col("e.count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val slack = nTot.toDouble / (k + 1)
      assert(got.size <= k)
      got.foreach { case (t, c) =>
        assert(c <= exact(t), s"overcount of $t: $c > ${exact(t)} (k=$k)")
        assert(c >= exact(t) - slack, s"bound breach on $t (k=$k, n=$nTot)")
      }
      exact.filter(_._2 > slack).keys.foreach(t =>
        assert(got.contains(t), s"guaranteed hitter $t missing (k=$k)"))
    }
  }

  test("quantile-sketch law: exact regime == sorted truth for ANY input, chunking, merge order") {
    import graft.functions.QuantileSketch
    val gVals = Gen.choose(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1e6, 1e6).map(v => math.rint(v * 16) / 16)))
    val gChunks = Gen.choose(1, 7)
    def truth(vals: Seq[Double], q: Double): Double = {
      val s = vals.sorted
      s(math.max(1, math.ceil(q * s.size).toLong).toInt - 1)
    }
    forAll2(gVals, gChunks, n = 20) { (vals, nChunks) =>
      val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
      // arbitrary chunking, REVERSED merge order, and a serde
      // round-trip per chunk: k=256 >= |vals| keeps it exact
      val chunks = vals.grouped(
        math.max(1, vals.size / nChunks)).toSeq.reverse
      val merged = new QuantileSketch(256)
      chunks.foreach { c =>
        val sk = new QuantileSketch(256)
        c.foreach(sk.update)
        merged.merge(QuantileSketch.deserialize(sk.serializeBytes()))
      }
      assert(merged.totalWeight === vals.size.toLong)
      val got = merged.quantiles(qs)
      qs.zipWithIndex.foreach { case (q, i) =>
        assert(got(i) === truth(vals, q), s"q=$q over ${vals.size} vals")
      }
    }
    // compacted regime is deterministic for a fixed build order, and
    // a serde round-trip preserves the EXACT state mid-stream
    val big = (0 until 5000).map(i => ((i * 2654435761L) % 4099).toDouble)
    val a = new QuantileSketch(64)
    big.foreach(a.update)
    val b = QuantileSketch.deserialize(a.serializeBytes())
    assert(a.quantiles(Seq(0.1, 0.5, 0.9)).toSeq ===
      b.quantiles(Seq(0.1, 0.5, 0.9)).toSeq)
    assert(b.totalWeight === 5000L)
  }

  test("sample-sketch law: ANY increment split re-merges to the direct bottom-k") {
    import graft.pipeline.Sampling
    val s = spark; import s.implicits._
    val gN = Gen.choose(1, 60)
    val gParts = Gen.choose(1, 5)
    forAll2(gN, gParts, n = 6) { (n, parts) =>
      // every key appears TWICE: duplicate (group, key) rows must
      // occupy one bottom-k slot, not evict other distinct keys
      val base = (0 until n).map(i => (i.toLong, s"g${i % 3}"))
      val df = (base ++ base).toDF("doc_id", "source")
      val direct = Sampling.mergeSampleSketches(
        Sampling.sampleSketch(df, "source", col("doc_id"), 4, "law"),
        "source", 4).collect().map(r => (r.getString(0), r.getString(1))).toSet
      val incs = (0 until parts).map(p =>
        Sampling.sampleSketch(df.filter(col("doc_id") % parts === p),
          "source", col("doc_id"), 4, "law")).reduce(_ union _)
      val merged = Sampling.mergeSampleSketches(incs, "source", 4)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(merged === direct, s"n=$n parts=$parts")
    }
  }

  test("Aho-Corasick count == brute-force positional count, incl. overlaps") {
    import graft.functions.AhoCorasick
    // small alphabet forces dense overlaps and nested patterns
    val gText = Gen.listOfN(60, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val gPats = Gen.listOfN(6,
      Gen.choose(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    def brute(text: String, pats: Seq[String]): Long =
      pats.map { p =>
        (0 to text.length - p.length)
          .count(i => text.regionMatches(i, p, 0, p.length)).toLong
      }.sum
    forAll2(gText, gPats, n = 25) { (text, pats) =>
      val ac = AhoCorasick(pats)
      // duplicate phrases count twice; nested/overlapping all register
      assert(ac.countMatches(text) === brute(text, pats), s"$text vs $pats")
    }
    // pinned nesting/overlap cases
    assert(AhoCorasick(Seq("aa")).countMatches("aaaa") === 3L)
    assert(AhoCorasick(Seq("a", "aa", "b")).countMatches("aab") === 4L)
    assert(AhoCorasick(Seq("ab", "b")).countMatches("abab") === 4L)
    assert(AhoCorasick(Seq("x")).countMatches("aaa") === 0L)
    assert(AhoCorasick(Seq.empty).countMatches("abc") === 0L)
  }

  test("quiet checkpoint release: blocks freed, no lineage WARN, post-free reads safe") {
    val s = spark; import s.implicits._
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    // capture appender on the rdd package so the truncated-lineage
    // warning is OBSERVED when Spark emits it (positive control) and
    // provably absent under the quiet release
    val captured = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val app = new AbstractAppender(
        "graft-capture", null, null, true, Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        captured.add(e.getMessage.getFormattedMessage)
    }
    app.start()
    val lctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = lctx.getConfiguration
    val pkg = "org.apache.spark.rdd"
    cfg.getRootLogger()  // force init
    org.apache.logging.log4j.core.config.Configurator.setLevel(pkg, Level.WARN)
    cfg.getLoggerConfig(cfg.getRootLogger.getName).addAppender(app, Level.WARN, null)
    lctx.updateLoggers()
    def warns(): Seq[String] =
      captured.toArray.map(_.toString).toSeq.filter(_.contains("locally checkpointed"))
    try {
      import org.apache.spark.sql.execution.LogicalRDD
      def ckptId(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.analyzed.asInstanceOf[LogicalRDD].rdd.id
      // positive control: the PUBLIC unpersist path does warn
      val loud = s.range(100).toDF("x").localCheckpoint(false)
      assert(loud.count() === 100)
      val loudId = ckptId(loud)
      loud.queryExecution.analyzed.asInstanceOf[LogicalRDD]
        .rdd.unpersist(blocking = false)
      assert(warns().nonEmpty, "control: RDD.unpersist should WARN")
      assert(!s.sparkContext.getPersistentRDDs.contains(loudId))
      captured.clear()
      // quiet release: same block drop, no warning
      val quiet = s.range(200).toDF("x").localCheckpoint(false)
      assert(quiet.count() === 200)
      val qid = ckptId(quiet)
      assert(s.sparkContext.getPersistentRDDs.contains(qid))
      org.apache.spark.sql.GraftBridge.unpersistRddQuietly(s.sparkContext, qid)
      assert(!s.sparkContext.getPersistentRDDs.contains(qid))
      assert(warns().isEmpty, s"quiet release warned: ${warns()}")
      // post-free recompute is unreachable through the operator
      // surface: the eager convenience path (materialize -> release
      // build caches) hands back a frame that stays fully consumable —
      // repeated actions read the EAGER checkpoint, never the freed
      // lazy build frames
      val corpus = (0L until 40L).map(i =>
        (i, Array.tabulate(graft.pipeline.Similarity.Dim)(d =>
          ((i * 7 + d) % 13).toFloat / 13f).toSeq)).toDF("vec_id", "embedding")
      val out = graft.pipeline.Similarity.twoLevelAssign(corpus, 2, 2)
      assert(out.count() === 40)
      assert(out.count() === 40) // second action: no freed-block read
      assert(warns().isEmpty)
    } finally {
      cfg.getLoggerConfig(cfg.getRootLogger.getName).removeAppender("graft-capture")
      lctx.updateLoggers()
      app.stop()
    }
  }

  test("mmrSelect: diversity beats redundancy; pure-relevance degenerate") {
    val s = spark; import s.implicits._
    // query along dim 0. Candidates 1 and 2 are twins whose MUTUAL
    // similarity (dot 2.0) exceeds their relevance (dot 1.0) — the
    // redundancy penalty outweighs 2's relevance edge over 3, which
    // points AWAY from the twins in dim 1 (sim −0.1). Pure relevance
    // = (1, 2, 3); MMR must pick 1, JUMP to 3, take 2 last.
    val q = Seq(1.0, 0.0, 0.0)
    val corpus = Seq(
      (1L, Seq(1.0f, 1.0f, 0.0f)),
      (2L, Seq(1.0f, 1.0f, 0.0f)),
      (3L, Seq(0.9f, -1.0f, 0.0f))).toDF("vec_id", "embedding")
    val picks = graft.pipeline.Similarity.mmrSelect(corpus, q, k = 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(picks === Seq(1L, 3L, 2L))
    // wDiv = 0 degenerates to pure relevance order
    val rel = graft.pipeline.Similarity.mmrSelect(corpus, q, k = 3, wDiv = 0L)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(rel === Seq(1L, 2L, 3L))
    // k past the pool: every candidate emitted once, no repeats
    val all = graft.pipeline.Similarity.mmrSelect(corpus, q, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(all.sorted === Seq(1L, 2L, 3L))
  }

  test("mmrSelectIvf == mmrSelect when probing covers the corpus") {
    val s = spark; import s.implicits._
    import graft.pipeline.Similarity
    val corpus = (0L until 30L).map(i => (i,
      Array.tabulate(Similarity.Dim)(d =>
        (((i * 13 + d * 7) % 17).toFloat - 8f) / 8f).toSeq))
      .toDF("vec_id", "embedding")
    val q = Array.tabulate(Similarity.Dim)(d =>
      (((d * 5) % 11).toDouble - 5.0) / 8.0).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").as[(Long, Long, Long)].collect().toSeq
    // kmK 4 <= IvfProbe 4 and poolN >= |corpus|: every bucket probed,
    // both pools are the whole corpus -> identical greedy selection
    val exact = rows(Similarity.mmrSelect(corpus, q, k = 6, poolN = 64))
    val ivf = rows(Similarity.mmrSelectIvf(corpus, q, k = 6, poolN = 64,
      kmK = 4, iters = 1))
    assert(exact.nonEmpty && ivf === exact)
  }

  test("native chunkKeepers ≡ self-join senior-drop, kept set identical") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.pipeline.Similarity
    // random chunks with planted near-duplicates: base vectors plus
    // scaled copies (cos 1 to their senior) and antipodes (cos -1)
    val chunkGen: Gen[List[(Long, Seq[Float])]] = for {
      n <- Gen.choose(2, 12)
      dim <- Gen.choose(2, 6)
      raw <- Gen.listOfN(n * dim, Gen.choose(-8, 8).map(_.toFloat / 4f))
      dups <- Gen.listOfN(n, Gen.oneOf(0, 0, 1, 2)) // 0 fresh, 1 copy, 2 antipode
    } yield (0 until n).map { i =>
      val base = raw.slice(i * dim, (i + 1) * dim)
      val v = dups(i) match {
        case 1 if i > 0 => raw.slice((i - 1) * dim, i * dim).map(_ * 2f)
        case 2 if i > 0 => raw.slice((i - 1) * dim, i * dim).map(-_)
        case _ => base
      }
      (i.toLong * 3 + 1, v: Seq[Float])
    }.toList
    forAll(chunkGen, n = 8) { chunk =>
      val eps = 0.9
      val df = chunk.toDF("vec_id", "embedding")
      // the join formulation semDedupChunkedScoped used to run,
      // restricted to one (cid, chunk) cell
      val a = df.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = df.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      val dropped = a.crossJoin(b)
        .filter(col("vec_a") < col("vec_b") &&
          Similarity.cosine(col("ea"), col("eb")) >= eps)
        .select(col("vec_b").as("vec_id")).distinct()
      val joinKept = df.join(dropped, Seq("vec_id"), "left_anti")
        .select("vec_id").as[Long].collect().toSet
      val kernelKept = df
        .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding"))))
          .as("xs"))
        .select(explode(graft.functions.VectorExprs.chunkKeepers(
          col("xs"), eps)).as("e"))
        .select("e.vec_id").as[Long].collect().toSet
      assert(kernelKept === joinKept, s"chunk $chunk")
    }
  }

  test("native charEntropy ≡ explode∘two-level-aggregate entropy") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // adversarial shapes: empty, single char, runs, whitespace-only,
    // non-ASCII (code-point counting), null text
    val texts: Seq[Option[String]] = Seq(
      Some(""), Some("a"), Some("aaaa"), Some("   "), Some("ab ab ab"),
      Some("ÄØß Σίσυφος"), Some("the quick brown fox"), None,
      Some("0123456789 0123456789"), Some("\t\nmixed  WS\u00A0runs"))
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t.orNull) }.toDF("doc_id", "text")
    val native = graft.pipeline.TextAnalysis.charEntropy(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // the pre-round-16 formulation, restated inline
    val perChar = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).cast("double").as("c"))
    val perDoc = perChar.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), sum(col("c") * log(col("c"))).as("clc"))
      .select(col("doc_id"), col("n").cast("long").as("n_chars"),
        (log(col("n")) - col("clc") / col("n")).as("entropy"))
    val legacy = docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"), col("entropy"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    native.zip(legacy).foreach { case ((di, ni, ei), (dl, nl, el)) =>
      assert(di === dl); assert(ni === nl)
      (ei, el) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12,
          s"doc $di entropy $a vs $b")
        case (a, b) => assert(a === b, s"doc $di nullness $a vs $b")
      }
    }
  }

  test("native dsirScore ≡ explode∘join∘re-aggregate DSIR weights") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.pipeline.{Curation, NearDup}
    val texts: Seq[Option[String]] = Seq(
      Some("alpha beta gamma"), Some("  alpha\talpha  "), Some(""),
      Some("one"), None, Some("ÄØß Σίσυφος mixed CASE case"),
      Some("the the the the"), Some("z"))
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t.orNull) }.toDF("doc_id", "text")
    val native = Curation.dsirWeights(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // the pre-round-16 formulation, restated inline
    val toks = split(trim(lower(col("text"))), "\\s+")
    val b = lit(Curation.DsirBuckets.toLong)
    val bucketed = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"), pmod(NearDup.h64(col("tok")), b).as("bk"))
    val dist = bucketed.groupBy(col("bk"))
      .agg(sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("ct"),
        sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("cr"))
    val tot = dist.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val w = broadcast(dist.crossJoin(broadcast(tot))
      .select(col("bk"),
        log(((col("ct") + 1.0) / (col("tt") + lit(Curation.DsirBuckets.toDouble))) /
          ((col("cr") + 1.0) / (col("tr") + lit(Curation.DsirBuckets.toDouble))))
          .as("lw")))
    val legacy = docs.select(col("doc_id"))
      .join(bucketed.join(w, Seq("bk"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            sum(col("lw")).as("logw")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"), col("logw"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    native.zip(legacy).foreach { case ((di, ni, wi), (dl, nl, wl)) =>
      assert(di === dl); assert(ni === nl, s"doc $di n_tokens")
      (wi, wl) match {
        case (Some(a), Some(bb)) => assert(math.abs(a - bb) < 1e-12,
          s"doc $di logw $a vs $bb")
        case (a, bb) => assert(a === bb, s"doc $di nullness $a vs $bb")
      }
    }
  }


  test("driver unimaxAlloc water-fill ≡ plan formulation, bit-exact") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(1717)
    // vectors: binding and non-binding budgets, ties in cap, a null-c
    // guard via coalesced longs, S from 1 to 40, fractional maxEpochs
    (1 to 12).foreach { trial =>
      val nS = 1 + rnd.nextInt(40)
      val rows = (0 until nS).map { i =>
        (s"src${rnd.nextInt(30)}_$i", math.abs(rnd.nextLong()) % 100000L)
      }
      val cnt = rows.toDF("stratum", "c").repartition(3)
      val maxEp = Seq(0.5, 1.0, 1.5, 2.0)(rnd.nextInt(4))
      val totalC = rows.map(_._2).sum
      val budget = Seq(0.0, 0.3, 0.8, 1.35, 10.0)(rnd.nextInt(5)) * totalC
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4))
      val got = pipeline.Sampling.unimaxAlloc(cnt, budget, maxEp)
        .collect().map(key).sortBy(_._1).toSeq
      val ref = pipeline.Sampling.unimaxAllocPlan(cnt, budget, maxEp)
        .collect().map(key).sortBy(_._1).toSeq
      assert(got === ref, s"trial $trial (S=$nS, budget=$budget, maxEp=$maxEp)")
      // and the scaled entry returns the exact long total
      val (_, tot) = pipeline.Sampling.unimaxAllocScaled(cnt, identity(_).toDouble, maxEp)
      assert(tot === totalC)
    }
  }
}
