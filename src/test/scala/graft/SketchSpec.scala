package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.SketchExprs

/** Misra–Gries guarantees the DuckDB oracle can't pin (it only sees
  * the exact regime): the N/(k+1) undercount bound, the
  * guaranteed-presence threshold, exactness at k ≥ cardinality under
  * real partitioned merges, and grouped/SQL surfaces. */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("sketch-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  /** Zipf-ish corpus: token i appears ~N/(i+1) times, shuffled and
    * spread over 8 partitions so partial-aggregate serialize/merge
    * actually runs. */
  private def corpus(nTokens: Int, scale: Int) = {
    val s = spark; import s.implicits._
    val rows = (0 until nTokens).flatMap(i =>
      Seq.fill(scale / (i + 1))(s"tok$i"))
    scala.util.Random.shuffle(rows).toDF("tok").repartition(8)
  }

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(SketchExprs.heavyHitters(col("tok"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token").as("tok"), col("e.count").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact regime: k ≥ cardinality reproduces exact counts across merges") {
    val df = corpus(50, 2000)
    val exact = df.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch(df, 64) === exact)
  }

  test("approximate regime: undercount bounded by N/(k+1); heavy tokens present") {
    val df = corpus(200, 20000).cache()
    val exact = df.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 16
    val got = sketch(df, k)
    assert(got.size <= k)
    val slack = n.toDouble / (k + 1)
    got.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overcounted: $c > ${exact(t)}")
      assert(c >= exact(t) - slack, s"$t undercounted past the bound")
    }
    // presence guarantee: true count > N/(k+1) ⇒ in the sketch
    exact.filter(_._2 > slack).keys.foreach(t =>
      assert(got.contains(t), s"guaranteed hitter $t missing"))
    df.unpersist()
  }

  test("nulls are skipped; empty input yields an empty summary") {
    val s = spark; import s.implicits._
    val withNulls = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("tok")
    assert(sketch(withNulls, 8) === Map("a" -> 2L, "b" -> 1L))
    assert(sketch(Seq.empty[String].toDF("tok"), 8) === Map.empty)
  }

  test("grouped aggregation: one independent sketch per group") {
    val s = spark; import s.implicits._
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "z")).toDF("g", "tok").repartition(4)
    val out = df.groupBy("g")
      .agg(SketchExprs.heavyHitters(col("tok"), 8).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select(col("g"), col("e.token"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set(("g1", "x", 2L), ("g1", "y", 1L), ("g2", "z", 1L)))
  }

  test("SQL surface: graft_heavy_hitters matches the Column API") {
    val s = spark; import s.implicits._
    corpus(20, 400).createOrReplaceTempView("sk_toks")
    val viaSql = spark.sql(
      "SELECT graft_heavy_hitters(tok, 64) AS hh FROM sk_toks")
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.table("sk_toks").groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql === exact)
  }

  // ---- the HLL distinct-count tier (graft.pipeline.Curation) ----

  /** Docs with a controlled distinct-token count per source: source
    * s_i holds tokens {i*span .. i*span + n_i - 1}, spread over docs
    * and partitions. */
  private def hllDocs(perSource: Map[String, Int]) = {
    val s = spark; import s.implicits._
    perSource.toSeq.flatMap { case (src, n) =>
      (0 until n).grouped(50).zipWithIndex.map { case (chunk, i) =>
        (s"$src-$i".hashCode.toLong, chunk.map(j => s"${src}_t$j").mkString(" "), src)
      }
    }.toDF("doc_id", "text", "source").repartition(8)
  }

  test("HLL tier: increment merge is order-insensitive, estimates near exact") {
    import graft.pipeline.Curation
    val docs = hllDocs(Map("a" -> 5000, "b" -> 1200, "c" -> 37))
    val whole = Curation.sketchDistinct(Curation.tokenSketches(docs))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // HLL registers merge by max — order/grouping of the union must
    // not change the estimate (this is what makes the stored tier
    // deterministic under arbitrary partitioning). NOTE the merged
    // estimate may differ from the direct whole-corpus sketch by a
    // hair: DataSketches estimates sparse-mode (coupon) sketches and
    // the union gadget's dense HLL mode through different paths — so
    // the cross-form assertion is a tolerance, not equality.
    def merged(order: Seq[Long]) = Curation.sketchDistinct(
      order.map(p => Curation.tokenSketches(
        docs.filter(pmod(col("doc_id"), lit(3)) === p))).reduce(_ union _))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m1 = merged(Seq(0L, 1L, 2L))
    val m2 = merged(Seq(2L, 0L, 1L))
    assert(m1 === m2, "increment union must be order-insensitive")
    for ((src, n) <- Map("a" -> 5000, "b" -> 1200, "c" -> 37)) {
      assert(math.abs(whole(src) - n) <= math.max(1, n * 0.05),
        s"$src: direct est ${whole(src)} vs exact $n")
      assert(math.abs(m1(src) - n) <= math.max(1, n * 0.05),
        s"$src: merged est ${m1(src)} vs exact $n")
    }
  }

  test("HLL tier: sketches survive a parquet round-trip and still merge") {
    import graft.pipeline.Curation
    val docs = hllDocs(Map("a" -> 800, "b" -> 300))
    val dir = java.nio.file.Files.createTempDirectory("hll_store").toString
    // write each increment's sketch rows as a stored table (the
    // snapshot-tier usage), then read back and merge across files —
    // against the SAME increments merged live, so the assertion
    // isolates binary serialization fidelity
    val incs = Seq(0, 1).map(p =>
      Curation.tokenSketches(docs.filter(col("doc_id") % 2 === p)))
    incs.foreach(_.write.mode("append").parquet(dir))
    val live = Curation.sketchDistinct(incs.reduce(_ union _))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stored = Curation.sketchDistinct(spark.read.parquet(dir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored === live)
  }

  // ---- the quantile-sketch tier (compactor stacks) ----

  /** The discrete lower quantile the sketch's exact regime must hit:
    * smallest value with cumulative rank ≥ ⌈q·n⌉. */
  private def truthQuantile(vals: Seq[Double], q: Double): Double = {
    val sorted = vals.sorted
    sorted(math.max(1, math.ceil(q * sorted.size).toLong).toInt - 1)
  }

  test("quantile sketch: exact regime reproduces discrete quantiles across partitioned merges") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(7)
    val groups = Map("a" -> 900, "b" -> 40, "c" -> 1)
    val rows = groups.toSeq.flatMap { case (g, n) =>
      (0 until n).map(_ => (g, rng.nextDouble() * 1000)) }
    val df = scala.util.Random.shuffle(rows).toDF("g", "v").repartition(8)
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val got = df.groupBy("g")
      .agg(SketchExprs.quantiles(col("v"), 1024, qs).as("q"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Double](1)).toMap
    for ((g, n) <- groups; (q, i) <- qs.zipWithIndex) {
      val vals = rows.filter(_._1 == g).map(_._2)
      assert(got(g)(i) === truthQuantile(vals, q),
        s"group $g q=$q (n=$n)")
    }
  }

  test("quantile sketch: stored increments union to the whole (exact regime)") {
    import graft.pipeline.Curation
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0 until 600).map(i => (i.toLong, s"s${i % 3}", rng.nextGaussian()))
    val df = rows.toDF("id", "source", "v").repartition(8)
    val qs = Seq(0.5, 0.95)
    val dir = java.nio.file.Files.createTempDirectory("qsk_store").toString
    // three disjoint increments written as stored sketch rows, read
    // back and merged — binary fidelity + merge in one assertion
    (0 until 3).foreach(p => Curation.valueSketches(
        df.filter(col("id") % 3 === p), "source", col("v"), k = 1024)
      .write.mode("append").parquet(dir))
    val got = Curation.sketchValueQuantiles(
        spark.read.parquet(dir), "source", qs)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for (src <- Seq("s0", "s1", "s2")) {
      val vals = rows.filter(_._2 == src).map(_._3)
      assert(got(src)._1 === truthQuantile(vals, 0.5), s"$src p50")
      assert(got(src)._2 === truthQuantile(vals, 0.95), s"$src p95")
    }
  }

  test("quantile column names: fractional percents stay distinct") {
    import graft.functions.SketchExprs.{quantileColName, quantileColNames}
    assert(quantileColName(0.5) === "p50")
    assert(quantileColName(1.0) === "p100")
    assert(quantileColName(0.995) === "p99_5")   // NOT p100
    assert(quantileColName(0.251) === "p25_1")   // NOT p25
    assert(quantileColNames(Seq(0.995, 1.0)) === Seq("p99_5", "p100"))
    // a fraction pair that maps to the same name is rejected loudly
    // instead of silently dropping a requested quantile
    intercept[IllegalArgumentException] {
      quantileColNames(Seq(0.5, 0.50))
    }
    // fractional names flow through the read side end-to-end
    import graft.pipeline.Curation
    val s = spark; import s.implicits._
    val df = (1 to 200).map(i => ("g", i.toDouble)).toDF("source", "v")
    val sk = Curation.valueSketches(df, "source", col("v"), k = 1024)
    val out = Curation.sketchValueQuantiles(sk, "source", Seq(0.995, 1.0))
    assert(out.columns.toSeq === Seq("source", "p99_5", "p100"))
    val r = out.collect()(0)
    assert(r.getDouble(1) === 199.0)
    assert(r.getDouble(2) === 200.0)
  }

  test("quantile sketch: compacted regime's rank error stays bounded") {
    val s = spark; import s.implicits._
    val n = 100000
    val k = 256
    // adversarial-ish: sorted-input runs interleaved with reverse runs,
    // spread over 8 partitions — compaction fires hundreds of times
    val vals = (0 until n).map(i =>
      if (i % 2 == 0) i.toDouble else (n - i).toDouble)
    val df = vals.toDF("v").repartition(8)
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val got = df.agg(SketchExprs.quantiles(col("v"), k, qs).as("q"))
      .collect()(0).getSeq[Double](0)
    val sorted = vals.sorted
    qs.zipWithIndex.foreach { case (q, i) =>
      // the reported value's true rank must sit within eps·n of the
      // target rank; for a k=256 stack over 100k values the alternating
      // compactor's observed error is well under 2%, asserted with
      // headroom at 5% so co-compaction drift can't flake the suite
      val trueRank = sorted.count(_ <= got(i))
      val target = math.ceil(q * n)
      assert(math.abs(trueRank - target) <= 0.05 * n,
        s"q=$q: value ${got(i)} has rank $trueRank, target $target")
    }
  }

  test("quantile sketch: nulls skipped; SQL surface matches the Column API") {
    val s = spark; import s.implicits._
    val df = Seq(Some(3.0), None, Some(1.0), Some(2.0), None).toDF("v")
    val viaCol = df.agg(SketchExprs.quantiles(col("v"), 64, Seq(0.5)))
      .collect()(0).getSeq[Double](0)
    assert(viaCol === Seq(2.0)) // 3 non-null values, median = 2
    df.createOrReplaceTempView("qsk_vals")
    val viaSql = spark.sql(
      """SELECT graft_sketch_quantiles(
        |  graft_quantile_merge(qsk), array(0.5D, 0.9D)) AS q
        |FROM (SELECT graft_quantile_sketch(v, 64) AS qsk
        |      FROM qsk_vals)""".stripMargin)
      .collect()(0).getSeq[Double](0)
    assert(viaSql === Seq(2.0, 3.0))
  }

  test("quantile sketch: mixed-k merge is rejected") {
    val s = spark; import s.implicits._
    val a = Seq(1.0).toDF("v").agg(SketchExprs.quantileSketch(col("v"), 64).as("qsk"))
    val b = Seq(2.0).toDF("v").agg(SketchExprs.quantileSketch(col("v"), 128).as("qsk"))
    val ex = intercept[Exception] {
      a.union(b).agg(SketchExprs.quantileMerge(col("qsk"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => Option(c.getMessage).exists(_.contains("mixed sketch k"))))
  }

  test("bounded min-list: complete and collect_list-identical under cap, min-prefix + exact df over cap") {
    val s = spark; import s.implicits._
    // groups: g1 has 3 values (under cap), g2 has 120 values (over a
    // cap of 51) spread over 8 partitions so partial merges run; dup
    // values included
    val rows = Seq.tabulate(120)(i => ("g2", (977L * i) % 401)) ++
      Seq(("g1", 7L), ("g1", 3L), ("g1", 7L))
    val df = scala.util.Random.shuffle(rows).toDF("g", "v").repartition(8)
    val cap = 51
    val got = df.groupBy(col("g"))
      .agg(SketchExprs.boundedMinList(col("v"), cap).as("bl"))
      .select(col("g"), col("bl.df").as("df"), col("bl.ds").as("ds"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Long](2).toSeq)).toMap
    val ref = df.groupBy(col("g"))
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("v"))).as("ds"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Long](2).toSeq)).toMap
    // under cap: bit-identical to (count, sort_array(collect_list))
    assert(got("g1") === ref("g1"))
    // over cap: exact total df, ds = the cap smallest of the full list
    assert(got("g2")._1 === ref("g2")._1)
    assert(got("g2")._2 === ref("g2")._2.take(cap))
  }

  test("bounded min-list caps buffer but keeps a DfCap-wide bucket complete (windowFp law)") {
    val s = spark; import s.implicits._
    // the exact windowFpPairs usage: cap = DfCap + 1; a bucket with
    // df <= DfCap must come back COMPLETE (pair set preserved), a
    // fat bucket must report df > DfCap (dropped by the filter)
    val dfCap = 50
    val under = (1L to dfCap.toLong).map(("w_ok", _))
    val over = (1L to 1000L).map(("w_hot", _))
    val df = scala.util.Random.shuffle(under ++ over).toDF("wh", "doc_id")
      .repartition(8)
    val agg = df.groupBy(col("wh"))
      .agg(SketchExprs.boundedMinList(col("doc_id"), dfCap + 1).as("bl"))
      .select(col("wh"), col("bl.df").as("df"), col("bl.ds").as("ds"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Long](2).toSeq)).toMap
    assert(agg("w_ok")._1 === dfCap.toLong)
    assert(agg("w_ok")._2 === (1L to dfCap.toLong))
    assert(agg("w_hot")._1 === 1000L) // exact df: the filter sees truth
    assert(agg("w_hot")._2.size === dfCap + 1) // buffer stayed bounded
  }
}
