package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.dsl.Eval

/** Port of the reference's DSL test corpus style
  * (`dsl/funcs_test.go:64-1024`): constant fixtures evaluated through
  * the full parse→eval path, asserting `checkEveryValueIs` — every
  * emitted non-null value equals the expectation and at least one row
  * exists. One table entry per reference `Test_dsl_*` case that maps to
  * a constant result. */
class ReferenceDslSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("reference-dsl-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  /** Store: foo.bar1.baz ≡ 10, foo.bar2.baz ≡ 20 on a 10-point grid —
    * the fixture of `Test_dsl_multiseriesStuff` and the set-filter
    * tests. constantLine() fixtures come from the generator itself. */
  private lazy val ctx: Eval.Ctx = {
    val s = spark; import s.implicits._
    val pts = for {
      (name, v) <- Seq("foo.bar1.baz" -> 10.0, "foo.bar2.baz" -> 20.0)
      i <- 0 until 10
    } yield (name, i * 10L, v)
    Eval.Ctx(s, pts.toDF("name", "t", "value"), stepSec = 10,
      fromSec = 0, toSec = 90)
  }

  /** (expression, expected constant) — reference test name in comment. */
  private val cases: Seq[(String, Double)] = Seq(
    // Test_dsl_averageSeries (both names)
    "averageSeries(constantLine(10), constantLine(20), constantLine(30))" -> 20,
    "avg(constantLine(10), constantLine(20), constantLine(30))" -> 20,
    // Test_dsl_sumSeries
    "sumSeries(constantLine(10), constantLine(20), constantLine(30))" -> 60,
    "sum(constantLine(10), constantLine(20), constantLine(30))" -> 60,
    // Test_dsl_maxSeries / minSeries
    "maxSeries(constantLine(10), constantLine(20), constantLine(30))" -> 30,
    "minSeries(constantLine(10), constantLine(20), constantLine(30))" -> 10,
    // Test_dsl_multiplySeries
    "multiplySeries(constantLine(10), constantLine(20))" -> 200,
    // Test_dsl_rangeOfSeries
    "rangeOfSeries(constantLine(10), constantLine(20), constantLine(30))" -> 20,
    // Test_dsl_isNonNull
    "isNonNull(constantLine(10), constantLine(20), constantLine(30))" -> 3,
    // Test_dsl_percentileOfSeries (p = 50 → middle of 3 constants)
    "percentileOfSeries(group(constantLine(10), constantLine(20), constantLine(30)), 50)" -> 20,
    // Test_dsl_group (identity merge of equal constants)
    "group(constantLine(5), constantLine(5))" -> 5,
    // processArgs merges var-args into a name-keyed SeriesMap
    // (dsl/funcs.go:470-487): foo.bar1.baz matches BOTH patterns but
    // counts once — 10+20, not 10+20+10
    "sumSeries('foo.*.baz', 'foo.bar1.baz')" -> 30,
    "countSeries('foo.*.baz', 'foo.bar2.baz')" -> 2,
    // Test_dsl_absolute
    "absolute(constantLine(-10))" -> 10,
    // Test_dsl_offset
    "offset(constantLine(10), 5)" -> 15,
    // Test_dsl_offsetToZero
    "offsetToZero(constantLine(10))" -> 0,
    // Test_dsl_scale
    "scale(constantLine(10), 2.5)" -> 25,
    // Test_dsl_logarithm
    "logarithm(constantLine(100))" -> 2,
    "log(constantLine(8), 2)" -> 3,
    // Test_dsl_transformNull (no nulls → passthrough)
    "transformNull(constantLine(10), 0)" -> 10,
    // Test_dsl_asPercent (scalar total; series total; set self-total)
    "asPercent(constantLine(10), 20)" -> 50,
    "asPercent('foo.bar1.baz', 'foo.bar2.baz')" -> 50,
    "asPercent('foo.bar2.baz')" -> 100,
    // Test_dsl_diffSeries
    "diffSeries(constantLine(30), constantLine(10))" -> 20,
    // Test_dsl_divideSeries
    "divideSeries(constantLine(10), constantLine(5))" -> 2,
    // Test_dsl_nPercentile
    "nPercentile(constantLine(10), 50)" -> 10,
    // Test_dsl_integral (constant zero stays zero)
    "integral(constantLine(0))" -> 0,
    // Test_dsl_countSeries
    "countSeries(constantLine(7), constantLine(8))" -> 2,
    // Test_dsl_scaleToSeconds
    "scaleToSeconds(constantLine(10), 2)" -> 20,
    // Test_dsl_hitcount (interval '20s' → ×20)
    "hitcount(constantLine(10), '20s')" -> 200,
    // Test_dsl_summarize (honest semantics; 'average' alias accepted)
    "summarize(constantLine(10), '20s', 'avg')" -> 10,
    "summarize('foo.bar2.baz', '50s', 'max')" -> 20,
    "summarize('foo.bar2.baz', '50s', 'average')" -> 20,
    // Test_dsl_movingAverage / movingMedian / stdev over constants
    "movingAverage(constantLine(10), 2)" -> 10,
    // duration-string window: 30s / (10+1) + 1 = 3 points over the
    // 10-point grid (`dsl/funcs.go:1658-1659` +1 formula)
    "movingAverage('foo.bar1.baz', '30s')" -> 10,
    "movingMedian(constantLine(10), 2)" -> 10,
    "stdev(constantLine(10), 2)" -> 0,
    // Test_dsl_sumSeriesWithWildcards / averageSeriesWithWildcards
    "sumSeriesWithWildcards('foo.*.baz', 1)" -> 30,
    "averageSeriesWithWildcards('foo.*.baz', 1)" -> 15,
    // Test_dsl_groupByNode (node 2 = 'baz', sum)
    "groupByNode('foo.*.baz', 2, 'sum')" -> 30,
    // Test_dsl_highestCurrent / highestMax / lowestAverage / lowestCurrent
    "highestCurrent('foo.*.baz', 1)" -> 20,
    "highestMax('foo.*.baz', 1)" -> 20,
    "lowestAverage('foo.*.baz', 1)" -> 10,
    "lowestCurrent('foo.*.baz', 1)" -> 10,
    // Test_dsl_maximumAbove / maximumBelow / minimumAbove / minimumBelow
    "maximumAbove('foo.*.baz', 15)" -> 20,
    "maximumBelow('foo.*.baz', 15)" -> 10,
    "minimumAbove('foo.*.baz', 15)" -> 20,
    "minimumBelow('foo.*.baz', 15)" -> 10,
    // Test_dsl_limit (first by sorted name = bar1)
    "limit('foo.*.baz', 1)" -> 10,
    // Test_dsl_exclude
    "exclude('foo.*.baz', 'bar1')" -> 20,
    // Test_dsl_alias keeps values
    "alias('foo.bar1.baz', 'renamed')" -> 10,
    // Test_dsl_keepLastValue (no gaps → passthrough)
    "keepLastValue('foo.bar1.baz', 5)" -> 10,
    // Test_dsl_changed (constant → 0 after the first point)
    // first point counts as changed (NaN prev) — assert separately below
    // Test_dsl_timeshift keeps values
    "timeShift('foo.bar1.baz', '-20s')" -> 10
  )

  private def everyValueIs(expr: String, expected: Double): Unit = {
    val s = spark; import s.implicits._
    val vals = Eval.evalExpr(ctx, expr)
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    if (vals.isEmpty) fail(s"no values for: $expr")
    val bad = vals.filter(v => math.abs(v - expected) > 1e-9)
    if (bad.nonEmpty) fail(s"$expr: expected $expected, got ${bad.head}")
  }

  cases.foreach { case (expr, expected) =>
    test(s"reference corpus: $expr == $expected") {
      everyValueIs(expr, expected)
    }
  }

  /** Gappy store: g.gappy = 10 for slots 0-4, unknown for 5-9 —
    * the fixture of Test_dsl_transformNull / Test_dsl_keepLastValue. */
  private lazy val gappyCtx: Eval.Ctx = {
    val s = spark; import s.implicits._
    val pts = (0 until 10).map(i =>
      ("g.gappy", i * 10L, if (i < 5) Some(10.0) else None))
    Eval.Ctx(s, pts.toDF("name", "t", "value"), stepSec = 10,
      fromSec = 0, toSec = 90)
  }

  test("reference corpus: transformNull fills the gaps — Test_dsl_transformNull") {
    val s = spark; import s.implicits._
    val vals = Eval.evalExpr(gappyCtx, "transformNull('g.gappy', 123)")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    assert(vals.length == 10)
    assert(vals.count(_ == 10.0) == 5)
    assert(vals.count(_ == 123.0) == 5)
  }

  test("reference corpus: keepLastValue fills up to the limit — Test_dsl_keepLastValue") {
    val s = spark; import s.implicits._
    val vals = Eval.evalExpr(gappyCtx, "keepLastValue('g.gappy', 3)")
      .as[(String, Long, Option[Double])].collect().map(_._3)
    // 5 original + 3 filled tens, 2 gaps beyond the limit stay unknown
    assert(vals.count(_.contains(10.0)) == 8)
    assert(vals.count(_.isEmpty) == 2)
  }

  test("reference corpus: weightedAverage pairs by node — Test_dsl_weightedAverage") {
    val s = spark; import s.implicits._
    val pts = for {
      (name, v) <- Seq("a.bar1.baz" -> 10.0, "w.bar1.baz" -> 20.0)
      i <- 0 until 10
    } yield (name, i * 10L, v)
    val c = Eval.Ctx(s, pts.toDF("name", "t", "value"), 10, 0, 90)
    val vals = Eval.evalExpr(c, "weightedAverage('a.bar1.baz', 'w.bar1.baz', 1)")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    assert(vals.nonEmpty && vals.forall(_ == 10.0)) // Σ(10·20)/Σ20
  }

  test("reference corpus: aliasing family rewrites names — Test_dsl_alias*") {
    val s = spark; import s.implicits._
    def names(expr: String): Set[String] =
      Eval.evalExpr(ctx, expr)
        .as[(String, Long, Option[Double])].collect().map(_._1).toSet
    assert(names("alias('foo.bar1.baz', 'the alias')") == Set("the alias"))
    assert(names("aliasByMetric('foo.bar1.baz')") == Set("baz"))
    assert(names("aliasByNode('foo.bar1.baz', 1)") == Set("bar1"))
    assert(names("aliasByNode('foo.*.baz', 0, 2)") == Set("foo.baz"))
    assert(names("aliasSub('foo.bar1.baz', 'bar', 'BAR')") == Set("foo.BAR1.baz"))
    // Graphite backreference syntax \1 → Java $1 conversion
    assert(names("""aliasSub('foo.bar1.baz', 'bar(\d)', 'B\1')""") == Set("foo.B1.baz"))
  }

  test("reference corpus: mostDeviant keeps the high-variance series — Test_dsl_mostDeviant") {
    val s = spark; import s.implicits._
    val pts = (0 until 10).flatMap(i => Seq(
      ("m.flat", i * 10L, 10.0),
      ("m.wild", i * 10L, if (i % 2 == 0) 0.0 else 100.0)))
    val c = Eval.Ctx(s, pts.toDF("name", "t", "value"), 10, 0, 90)
    val names = Eval.evalExpr(c, "mostDeviant('m.*', 1)")
      .as[(String, Long, Option[Double])].collect().map(_._1).toSet
    assert(names == Set("m.wild"))
  }

  test("reference corpus: removeAboveValue clamps to unknown — Test_dsl_removeAboveValue") {
    val s = spark; import s.implicits._
    val rows = Eval.evalExpr(ctx, "removeAboveValue('foo.*.baz', 15)")
      .as[(String, Long, Option[Double])].collect()
    assert(rows.count(_._3.isEmpty) == 10)          // the 20-series clamped
    assert(rows.flatMap(_._3).forall(_ == 10.0))    // the 10-series intact
  }

  test("reference corpus: useSeriesAbove filters and renames — Test_dsl_useSeriesAbove") {
    val s = spark; import s.implicits._
    val rows = Eval.evalExpr(ctx, "useSeriesAbove('foo.*.baz', 15, 'baz', 'qux')")
      .as[(String, Long, Option[Double])].collect()
    assert(rows.map(_._1).toSet == Set("foo.bar2.qux"))
    assert(rows.flatMap(_._3).forall(_ == 20.0))
  }

  test("reference corpus: changed() on a constant is 0 after the first point") {
    val s = spark; import s.implicits._
    val rows = Eval.evalExpr(ctx, "changed('foo.bar1.baz')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(rows.head._3.contains(1.0)) // NaN prev ⇒ changed
    assert(rows.tail.forall(_._3.contains(0.0)))
  }

  test("reference corpus: derivative() of a constant is 0 past the first point") {
    val s = spark; import s.implicits._
    val rows = Eval.evalExpr(ctx, "derivative('foo.bar1.baz')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(rows.head._3.isEmpty)
    assert(rows.tail.forall(_._3.contains(0.0)))
  }

  test("reference corpus: nonNegativeDerivative of sinusoid — Test_dsl_nonNegativeDerivative") {
    val s = spark; import s.implicits._
    val rows = Eval.evalExpr(ctx, "nonNegativeDerivative(sinusoid())")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    val c = 2.0 * math.Pi / 10.0
    def gen(i: Long): Double = math.sin(i * c)
    assert(rows.nonEmpty && rows.head._3.isEmpty) // first point: no prev
    var positives = 0
    rows.tail.foreach { case (_, t, v) =>
      val expect = gen(t) - gen(t - 1) // sinusoid step is 1s in this ctx
      // funcs.go:1263-1264: strictly positive diffs pass, else NaN —
      // diff == 0 (exact sin repeats on this denser grid) is NaN too
      if (expect > 0) { assert(v.contains(expect), s"t=$t"); positives += 1 }
      else assert(v.isEmpty, s"t=$t")
    }
    assert(positives > 10) // the rising half of every cycle survived
  }

  test("reference corpus: removeAbove/BelowPercentile(sinusoid, 50) — Test_dsl_removeAbovePercentile/Below") {
    val s = spark; import s.implicits._
    // "50% of a sinusoid is > 0": kept values after removeAbove are ≤ ~0
    val above = Eval.evalExpr(ctx, "removeAbovePercentile(sinusoid(), 50)")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    assert(above.nonEmpty && above.forall(_ <= 1e-9))
    val below = Eval.evalExpr(ctx, "removeBelowPercentile(sinusoid(), 50)")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    assert(below.nonEmpty && below.forall(_ >= -1e-9))
  }

  test("reference corpus: removeBelowValue(sinusoid, 0) — Test_dsl_removeBelowValue") {
    val s = spark; import s.implicits._
    val kept = Eval.evalExpr(ctx, "removeBelowValue(sinusoid(), 0)")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    assert(kept.nonEmpty && kept.forall(_ >= 0))
  }

  test("reference corpus: consolidateBy sum scales by seconds-per-point — Test_dsl_consolidateBy") {
    val s = spark; import s.implicits._
    // reference fixture: 1h span, maxPoints 100 → factor 36; the
    // function is the reference's admitted fake (dsl/funcs.go:2255-2286)
    val ctx2 = ctx.copy(fromSec = 0, toSec = 3600, maxPoints = 100)
    val vals = Eval.evalExpr(ctx2, "consolidateBy(constantLine(10), 'sum')")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    assert(vals.nonEmpty && vals.forall(_ == 360.0))
    // any non-sum cf: factor 1
    val id = Eval.evalExpr(ctx2, "consolidateBy(constantLine(10), 'max')")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    assert(id.nonEmpty && id.forall(_ == 10.0))
  }

  test("edge: color() is a data no-op wrapper — dsl/funcs.go:939-943") {
    val s = spark; import s.implicits._
    val plain = Eval.evalExpr(ctx, "sumSeries('foo.*.baz')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    val colored = Eval.evalExpr(ctx, "color(sumSeries('foo.*.baz'), 'red')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(colored === plain) // color only matters to a renderer
  }

  test("edge: timeShift ignores the resetEnd argument — dsl/funcs.go:1337-1339") {
    val s = spark; import s.implicits._
    // the reference declares resetEnd (funcs.go:124-126) but its own
    // comment says it is not implemented; a passed value changes nothing
    val base = Eval.evalExpr(ctx, "timeShift('foo.bar1.baz', '-20s')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    val withArg = Eval.evalExpr(ctx, "timeShift('foo.bar1.baz', '-20s', 'false')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(withArg === base)
  }

  test("combines merge MULTIPLE quoted patterns — varArg seriesList, funcs.go:470-487") {
    val s = spark; import s.implicits._
    // sumSeries("p1", "p2") must union both patterns, not silently drop
    // the second quoted arg
    val both = Eval.evalExpr(ctx, "sumSeries('foo.bar1.baz', 'foo.bar2.baz')")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    assert(both.length == 10 && both.forall(_ == 30.0))
    val viaGlob = Eval.evalExpr(ctx, "sumSeries('foo.*.baz')")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    assert(both.sorted === viaGlob.sorted)
    val mx = Eval.evalExpr(ctx, "maxSeries('foo.bar1.baz', 'foo.bar2.baz')")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    assert(mx.forall(_ == 20.0))
  }

  /** Gappy pair for the SeriesSlice NaN quirks
    * (`series/seriesslice.go:176-228`): q.full = 10 everywhere,
    * q.holey = 20 for slots 0-4 then unknown. */
  private lazy val quirkCtx: Eval.Ctx = {
    val s = spark; import s.implicits._
    val pts = (0 until 10).flatMap(i => Seq(
      ("q.full", i * 10L, Some(10.0)),
      ("q.holey", i * 10L, if (i < 5) Some(20.0) else None)))
    Eval.Ctx(s, pts.toDF("name", "t", "value"), stepSec = 10,
      fromSec = 0, toSec = 90)
  }

  private def quirkVals(expr: String): Seq[Option[Double]] = {
    val s = spark; import s.implicits._
    Eval.evalExpr(quirkCtx, expr)
      .as[(String, Long, Option[Double])].collect()
      .sortBy(_._2).map(_._3).toSeq
  }

  test("NaN quirks: Sum() treats NaN as 0 — seriesslice.go:176-183") {
    assert(quirkVals("sumSeries('q.*')") ===
      Seq.fill(5)(Some(30.0)) ++ Seq.fill(5)(Some(10.0)))
  }

  test("NaN quirks: Avg() divides by len, NaNs in the denominator — seriesslice.go:200-202") {
    // NOT sum/nonNullCount: the gap half averages 10/2 = 5, not 10
    assert(quirkVals("averageSeries('q.*')") ===
      Seq.fill(5)(Some(15.0)) ++ Seq.fill(5)(Some(5.0)))
  }

  test("NaN quirks: Max()/Min() skip NaN — seriesslice.go:206-228") {
    assert(quirkVals("maxSeries('q.*')") ===
      Seq.fill(5)(Some(20.0)) ++ Seq.fill(5)(Some(10.0)))
    assert(quirkVals("minSeries('q.*')") === Seq.fill(10)(Some(10.0)))
  }

  test("NaN quirks: Prod() propagates NaN — seriesslice.go:187-196") {
    assert(quirkVals("multiplySeries('q.*')") ===
      Seq.fill(5)(Some(200.0)) ++ Seq.fill(5)(None))
  }

  test("NaN quirks: isNonNull counts present inputs — dsl/funcs.go:1085-1105") {
    assert(quirkVals("isNonNull('q.*')") ===
      Seq.fill(5)(Some(2.0)) ++ Seq.fill(5)(Some(1.0)))
  }

  test("reference corpus: groupByNode at node 0 — Test_dsl_multiseriesStuff") {
    val s = spark; import s.implicits._
    val rows = Eval.evalExpr(ctx, "groupByNode('foo.*.baz', 0, 'sum')")
      .as[(String, Long, Option[Double])].collect()
    assert(rows.map(_._1).toSet === Set("foo"))
    assert(rows.flatMap(_._3).forall(_ == 30.0))
  }

  test("reference corpus: sum(exclude(...)) == 20 — Test_dsl_multiseriesStuff") {
    val s = spark; import s.implicits._
    val vals = Eval.evalExpr(ctx, "sum(exclude('foo.*.baz', 'bar1'))")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    assert(vals.nonEmpty && vals.forall(_ == 20.0))
  }

  test("reference corpus: sum(timeStack(..., 0, 3)) == 4x — Test_dsl_multiseriesStuff") {
    val s = spark; import s.implicits._
    // 4 shifted copies (0..3 x 20s) of the constant-10 series, summed —
    // the reference's 40 with its '10min' shift scaled to this grid.
    // Shifts land outside the store for early slots, where the stacked
    // copy is absent: assert the fully-covered tail of the viewport.
    val rows = Eval.evalExpr(ctx, "sum(timeStack('foo.bar1.baz', '20s', 0, 3))")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    val tail = rows.filter(_._2 >= 60) // all 4 shifted copies present
    assert(tail.nonEmpty && tail.forall(_._3.contains(40.0)))
  }

  test("reference corpus: useSeriesAbove with BARE identifier args — Test_dsl_useSeriesAbove") {
    val s = spark; import s.implicits._
    // the reference's exact call (funcs_test.go:991-1001): foo and bar
    // are unquoted barewords coerced to strings by arg position
    val rows = Eval.evalExpr(ctx,
      "useSeriesAbove(group(constantLine(10), constantLine(20), constantLine(30)), 20, foo, bar)")
      .as[(String, Long, Option[Double])].collect()
    assert(rows.flatMap(_._3).toSet === Set(30.0))
  }

  test("reference corpus: derivative(sinusoid) == successive diffs — Test_dsl_derivative") {
    val s = spark; import s.implicits._
    val rows = Eval.evalExpr(ctx, "derivative(sinusoid())")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    val c = 2.0 * math.Pi / 10.0
    def gen(i: Long): Double = math.sin(i * c)
    assert(rows.head._3.isEmpty)
    rows.tail.foreach { case (_, t, v) =>
      assert(v.exists(x => math.abs(x - (gen(t) - gen(t - 1))) < 1e-9), s"t=$t")
    }
  }

  test("reference corpus: integral(sinusoid) == exclusive running sum — Test_dsl_integral") {
    val s = spark; import s.implicits._
    val rows = Eval.evalExpr(ctx, "integral(sinusoid())")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    val c = 2.0 * math.Pi / 10.0
    var sum = 0.0
    rows.zipWithIndex.foreach { case ((_, t, v), i) =>
      // funcs_test.go:295-317: point i carries the sum of generators
      // BEFORE it (exclusive), first point = 0
      if (i > 0) assert(v.exists(x => math.abs(x - sum) < 1e-9), s"t=$t")
      sum += math.sin(t * c)
    }
  }

  test("reference corpus: hitcount of a summed set — Test_dsl_hitcount") {
    val s = spark; import s.implicits._
    // reference: sum(10,20,30) over '1min' -> 3600; this grid: x '20s'
    val vals = Eval.evalExpr(ctx,
      "hitcount(sum(constantLine(10), constantLine(20), constantLine(30)), '20s')")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
    assert(vals.nonEmpty && vals.forall(_ == 1200.0))
  }

  test("seriesByTag: operators, regex anchoring, and missing-tag semantics") {
    val s = spark; import s.implicits._
    val pts = for {
      name <- Seq("cpu;dc=west;env=prod", "cpu;dc=east;env=prod",
        "disk;env=dev", "plain")
      i <- 0 until 3
    } yield (name, i * 10L, 1.0)
    val ctx2 = Eval.Ctx(s, pts.toDF("name", "t", "value"), stepSec = 10,
      fromSec = 0, toSec = 20)
    def names(e: String) = Eval.evalExpr(ctx2, e)
      .select("name").distinct().collect().map(_.getString(0)).toSet
    assert(names("seriesByTag('dc=west')") === Set("cpu;dc=west;env=prod"))
    assert(names("seriesByTag('env=~pro')") ===
      Set("cpu;dc=west;env=prod", "cpu;dc=east;env=prod"))
    // =~ anchors at the start (graphite-web): 'rod' must not hit 'prod'
    assert(names("seriesByTag('env=~rod')") === Set.empty[String])
    // '=' with an empty value selects series WITHOUT the tag
    assert(names("seriesByTag('dc=')") === Set("disk;env=dev", "plain"))
    // negations include tag-less series
    assert(names("seriesByTag('env!=prod')") === Set("disk;env=dev", "plain"))
    assert(names("seriesByTag('dc!=~we.*')") ===
      Set("cpu;dc=east;env=prod", "disk;env=dev", "plain"))
    // the base name is itself the `name` tag; predicates conjoin
    assert(names("seriesByTag('name=cpu', 'dc=west')") ===
      Set("cpu;dc=west;env=prod"))
  }

  test("holtWintersForecast extends to the viewport end — funcs.go:2506-2510") {
    val s = spark; import s.implicits._
    // two full seasons of a 5-point cycle on a 10s step, viewport
    // extending one season past the data: the registry path must emit
    // forecast points up to toSec (the reference's nPreds derivation)
    val pts = (0 until 10).map(i => ("hw.s", i * 10L, 100.0 + (i % 5)))
    val hwCtx = Eval.Ctx(s, pts.toDF("name", "t", "value"), stepSec = 10,
      fromSec = 0, toSec = 140)
    val out = Eval.evalExpr(hwCtx,
      "holtWintersForecast('hw.s', '50s', 7, 0.5, 0.4, 0.6)")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(out.last._2 === 140L) // 5 predicted slots past t=90
    assert(out.length === 15)
    // the predicted values are the smoothing recursion's own forecast
    val data = (0 until 10).map(i => 100.0 + (i % 5)).toArray
    val trend = graft.ts.HoltWinters.initialTrend(data, 5)
    val seasonal = graft.ts.HoltWinters.initialSeasonal(data, 5)
    val (sm, _, _) = graft.ts.HoltWinters.smooth(
      data, 5, trend, seasonal, 5, 0.5, 0.4, 0.6)
    assert(out.flatMap(_._3).toSeq === sm.toSeq)
  }

  test("HW timestamps stay grid-aligned across ABSENT interior rows") {
    val s = spark; import s.implicits._
    // same series, once dense-with-null and once with the gap rows
    // absent entirely (the sparse convention): identical output,
    // timestamps included
    val dense = (0 until 10).map(i =>
      ("hw.g", i * 10L, if (i == 4 || i == 5) None else Some(100.0 + i)))
    val sparse = dense.filter(_._3.isDefined)
    def run(rows: Seq[(String, Long, Option[Double])]) =
      graft.ts.HwOps.holtWintersForecast(s, rows.toDF("name", "t", "value"),
          slenPoints = 2, nPred = 0, abg = Some((0.5, 0.4, 0.6)),
          devScale = 10.0, show = "smooth", stepSec = 10)
        .as[(String, Long, Double)].collect().sortBy(_._2).toSeq
    assert(run(sparse) === run(dense))
    assert(run(sparse).map(_._2) === (0 until 10).map(_ * 10L))
  }

  // ===== round-12 graphite-web extensions 7-10: hand vectors =====

  test("extension: perSecond — rate, wrap, bogus sample resets prev") {
    val s = spark; import s.implicits._
    // counter at step 10 with maxValue=400: 0, 50 (rate 5), 30 (wrap:
    // (400-50+30+1)/10 = 38.1), 420 (bogus -> null AND invalidates
    // prev, graphite's None,None), 60 (prev bogus -> null), 80 (rate 2)
    val pts = Seq(0.0, 50.0, 30.0, 420.0, 60.0, 80.0).zipWithIndex
      .map { case (v, i) => ("p.ctr", i * 10L, v) }
    val c = Eval.Ctx(s, pts.toDF("name", "t", "value"), 10, 0, 50)
    val out = Eval.evalExpr(c, "perSecond('p.ctr', maxValue=400)")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2).map(_._3)
    assert(out.toSeq === Seq(None, Some(5.0), Some(38.1), None, None, Some(2.0)))
    // no maxValue: negative delta is just unknown (no wrap guess)
    val out2 = Eval.evalExpr(c, "perSecond('p.ctr')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2).map(_._3)
    assert(out2.toSeq === Seq(None, Some(5.0), None, Some(39.0), None, Some(2.0)))
  }

  test("extension: averageAbove/Below filter on the viewport average") {
    val s = spark; import s.implicits._
    def names(expr: String): Set[String] =
      Eval.evalExpr(ctx, expr)
        .as[(String, Long, Option[Double])].collect().map(_._1).toSet
    assert(names("averageAbove('foo.*.baz', 15)") === Set("foo.bar2.baz"))
    assert(names("averageBelow('foo.*.baz', 15)") === Set("foo.bar1.baz"))
    assert(names("averageAbove('foo.*.baz', 5)") ===
      Set("foo.bar1.baz", "foo.bar2.baz"))
  }

  test("extension: sortBy* attaches __ord and the render honors it") {
    val s = spark; import s.implicits._
    def ords(expr: String): Seq[(String, Int)] =
      Eval.evalExpr(ctx, expr)
        .select("name", "__ord").distinct()
        .as[(String, Int)].collect().sortBy(_._2).toSeq
    // maxima: the 20-series first; name: lexicographic
    assert(ords("sortByMaxima('foo.*.baz')") ===
      Seq("foo.bar2.baz" -> 1, "foo.bar1.baz" -> 2))
    assert(ords("sortByMinima('foo.*.baz')") ===
      Seq("foo.bar1.baz" -> 1, "foo.bar2.baz" -> 2))
    assert(ords("sortByTotal('foo.*.baz')") ===
      Seq("foo.bar2.baz" -> 1, "foo.bar1.baz" -> 2))
    assert(ords("sortByName('foo.*.baz')") ===
      Seq("foo.bar1.baz" -> 1, "foo.bar2.baz" -> 2))
    // the render boundary emits series in __ord order, not name order
    val json = graft.Render.toGraphiteJson(
      Eval.evalExpr(ctx, "sortByMaxima('foo.*.baz')"))
    val firstTarget = """"target":"([^"]+)"""".r
      .findFirstMatchIn(json).get.group(1)
    assert(firstTarget === "foo.bar2.baz")
    // ...and a sort-less frame still renders in name order
    val plain = graft.Render.toGraphiteJson(
      Eval.evalExpr(ctx, "group('foo.*.baz')"))
    assert(""""target":"([^"]+)"""".r.findFirstMatchIn(plain)
      .get.group(1) === "foo.bar1.baz")
  }

  test("extension: aggregate() dispatches the generic combine") {
    val s = spark; import s.implicits._
    def every(expr: String, expected: Double): Unit = everyValueIs(expr, expected)
    every("aggregate('foo.*.baz', 'sum')", 30)
    every("aggregate('foo.*.baz', 'total')", 30)
    every("aggregate('foo.*.baz', 'average')", 15)
    every("aggregate('foo.*.baz', 'max')", 20)
    every("aggregate('foo.*.baz', 'min')", 10)
    every("aggregate('foo.*.baz', 'multiply')", 200)
    every("aggregate('foo.*.baz', 'range')", 10)
    every("aggregate('foo.*.baz', 'count')", 2)
    // reference quantile at p=.5 over [10, 20]: pos 1.5 -> 10 + .5*10
    every("aggregate('foo.*.baz', 'median')", 15)
    // population stddev of {10, 20}
    every("aggregate('foo.*.baz', 'stddev')", 5)
    // 'last' = the last series in name order (documented)
    every("aggregate('foo.*.baz', 'last')", 20)
    every("aggregate('foo.*.baz', 'diff')", -10)
    intercept[IllegalArgumentException] {
      Eval.evalExpr(ctx, "aggregate('foo.*.baz', 'mode')").collect()
    }
  }

  test("extension: per-point transforms and filters (vectors)") {
    val s = spark; import s.implicits._
    everyValueIs("invert(constantLine(4))", 0.25)
    everyValueIs("pow('foo.bar1.baz', 2)", 100)
    everyValueIs("squareRoot(constantLine(16))", 4)
    // invert(0) and sqrt(negative) map to NULL (the NaN/Inf stand-in)
    def allNull(expr: String): Unit = {
      val rows = Eval.evalExpr(ctx, expr)
        .as[(String, Long, Option[Double])].collect()
      assert(rows.nonEmpty && rows.forall(_._3.isEmpty), expr)
    }
    allNull("invert(constantLine(0))")
    allNull("squareRoot(constantLine(-9))")
    // currentAbove/Below on the last reading
    def names(expr: String): Set[String] =
      Eval.evalExpr(ctx, expr)
        .as[(String, Long, Option[Double])].collect().map(_._1).toSet
    assert(names("currentAbove('foo.*.baz', 15)") === Set("foo.bar2.baz"))
    assert(names("currentBelow('foo.*.baz', 15)") === Set("foo.bar1.baz"))
    // stacked/secondYAxis are render hints: data no-ops
    assert(Eval.evalExpr(ctx, "stacked('foo.bar1.baz')")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
      .forall(_ == 10.0))
    // ramp fixture for minMax / delay / timeSlice
    val ramp = (0 until 5).map(i => ("r.m", i * 10L, i * 2.0))
    val c = Eval.Ctx(s, ramp.toDF("name", "t", "value"), 10, 0, 40)
    def vals(expr: String): Seq[Option[Double]] =
      Eval.evalExpr(c, expr)
        .as[(String, Long, Option[Double])].collect().sortBy(_._2)
        .map(_._3).toSeq
    // ramp 0,2,4,6,8 -> minMax 0, .25, .5, .75, 1
    assert(vals("minMax('r.m')") ===
      Seq(Some(0.0), Some(0.25), Some(0.5), Some(0.75), Some(1.0)))
    // constant series normalizes to 0 (zero range)
    assert(Eval.evalExpr(ctx, "minMax('foo.bar1.baz')")
      .as[(String, Long, Option[Double])].collect().flatMap(_._3)
      .forall(_ == 0.0))
    // delay shifts values onto later grid points; vacated -> null
    assert(vals("delay('r.m', 2)") ===
      Seq(None, None, Some(0.0), Some(2.0), Some(4.0)))
    assert(vals("delay('r.m', -2)") ===
      Seq(Some(4.0), Some(6.0), Some(8.0), None, None))
    // timeSlice nulls values outside the window, grid survives
    assert(vals("timeSlice('r.m', 10, 30)") ===
      Seq(None, Some(2.0), Some(4.0), Some(6.0), None))
  }

  test("extension: moving window members, integralByInterval, groupByNodes") {
    val s = spark; import s.implicits._
    val ramp = (0 until 6).map(i => ("r.w", i * 10L, i * 1.0))
    val c = Eval.Ctx(s, ramp.toDF("name", "t", "value"), 10, 0, 50)
    def vals(expr: String): Seq[Option[Double]] =
      Eval.evalExpr(c, expr)
        .as[(String, Long, Option[Double])].collect().sortBy(_._2)
        .map(_._3).toSeq
    // ramp 0..5: trailing-3 sums from the 3rd point
    assert(vals("movingSum('r.w', 3)") ===
      Seq(Some(3.0), Some(6.0), Some(9.0), Some(12.0)))
    assert(vals("movingMin('r.w', 3)") ===
      Seq(Some(0.0), Some(1.0), Some(2.0), Some(3.0)))
    assert(vals("movingMax('r.w', 3)") ===
      Seq(Some(2.0), Some(3.0), Some(4.0), Some(5.0)))
    // interval 30s: exclusive running sum resets at t=30
    assert(vals("integralByInterval('r.w', '30s')") ===
      Seq(Some(0.0), Some(0.0), Some(1.0), Some(0.0), Some(3.0), Some(7.0)))
    // groupByNodes joins the selected nodes and aggregates the set
    val g = Eval.evalExpr(ctx, "groupByNodes('foo.*.baz', 'sum', 0, 2)")
      .as[(String, Long, Option[Double])].collect()
    assert(g.map(_._1).toSet === Set("foo.baz"))
    assert(g.flatMap(_._3).forall(_ == 30.0))
    val g2 = Eval.evalExpr(ctx, "groupByNodes('foo.*.baz', 'median', 1)")
      .as[(String, Long, Option[Double])].collect()
    assert(g2.map(_._1).toSet === Set("bar1", "bar2"))
    intercept[IllegalArgumentException] {
      Eval.evalExpr(ctx, "groupByNodes('foo.*.baz', 'mode', 1)").collect()
    }
    // removeEmptySeries: the all-null series drops; xff raises the bar
    val gap = (0 until 10).flatMap(i => Seq(
      ("re.full", i * 10L, Some(1.0)),
      ("re.half", i * 10L, if (i < 5) Some(2.0) else None),
      ("re.none", i * 10L, None: Option[Double])))
    val rc = Eval.Ctx(s, gap.toDF("name", "t", "value"), 10, 0, 90)
    def keptNames(expr: String): Set[String] =
      Eval.evalExpr(rc, expr)
        .as[(String, Long, Option[Double])].collect().map(_._1).toSet
    assert(keptNames("removeEmptySeries('re.*')") ===
      Set("re.full", "re.half"))
    assert(keptNames("removeEmptySeries('re.*', 0.6)") === Set("re.full"))
    assert(keptNames("removeEmptySeries('re.*', 0.5)") ===
      Set("re.full", "re.half")) // fraction >= xff keeps the boundary
    // aggregateWithWildcards: same dispatch, wildcarded key
    val aw = Eval.evalExpr(ctx, "aggregateWithWildcards('foo.*.baz', 'max', 1)")
      .as[(String, Long, Option[Double])].collect()
    assert(aw.map(_._1).toSet === Set("foo.*.baz"))
    assert(aw.flatMap(_._3).forall(_ == 20.0))
    // graphite-web safeAvg/safeSum skip Nones: over re.full(=1)/
    // re.half(=2, gapped past t=40)/re.none(all gaps), the late slots
    // average the ONE known member (gap-as-zero would give 1/3) and an
    // all-considered sum keeps the gap semantics per-slot
    val gavg = Eval.evalExpr(rc, "groupByNodes('re.*', 'avg', 0)")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(gavg.map(_._1).toSet === Set("re"))
    assert(gavg.map(_._3).toSeq ===
      (0 until 10).map(i => Some(if (i < 5) 1.5 else 1.0)))
  }

  test("extension: grep / substr — the name-surgery pair") {
    val s = spark; import s.implicits._
    // grep keeps matching names (exclude's dual)
    val g = Eval.evalExpr(ctx, "grep('foo.*.baz', 'bar1')")
      .as[(String, Long, Option[Double])].collect()
    assert(g.map(_._1).toSet === Set("foo.bar1.baz"))
    assert(g.length === 10)
    // substr: node slice; values/timestamps pass through untouched
    def names(expr: String): Set[String] =
      Eval.evalExpr(ctx, expr)
        .as[(String, Long, Option[Double])].collect().map(_._1).toSet
    assert(names("substr('foo.*.baz', 1)") === Set("bar1.baz", "bar2.baz"))
    assert(names("substr('foo.*.baz', 1, 2)") === Set("bar1", "bar2"))
    assert(names("substr('foo.*.baz', 0, -1)") === Set("foo.bar1", "foo.bar2"))
    assert(names("substr('foo.*.baz', -1)") === Set("baz"))
    // out-of-range slice clamps, never throws
    assert(names("substr('foo.*.baz', 5)") === Set(""))
    val sub = Eval.evalExpr(ctx, "substr('foo.bar1.baz', 1, 2)")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(sub.map(_._3).forall(_.contains(10.0)) && sub.length === 10)
  }

  test("extension: fallbackSeries — empty primary falls back") {
    val s = spark; import s.implicits._
    val fb = Eval.evalExpr(ctx, "fallbackSeries('no.such.*', 'foo.bar1.baz')")
      .as[(String, Long, Option[Double])].collect()
    assert(fb.map(_._1).toSet === Set("foo.bar1.baz"))
    // a non-empty primary wins — the fallback is NOT unioned in
    val keep = Eval.evalExpr(ctx,
        "fallbackSeries('foo.bar2.baz', 'foo.bar1.baz')")
      .as[(String, Long, Option[Double])].collect()
    assert(keep.map(_._1).toSet === Set("foo.bar2.baz"))
  }

  test("extension: interpolate — linear interior fill, leading/trailing stay") {
    val s = spark; import s.implicits._
    val pts: Seq[(String, Long, Option[Double])] = Seq(
      ("ip.m", 0L, None), // leading unknown: no left anchor
      ("ip.m", 10L, Some(1.0)),
      ("ip.m", 20L, None), // run of 2 between 1.0 and 4.0
      ("ip.m", 30L, None),
      ("ip.m", 40L, Some(4.0)),
      ("ip.m", 50L, None), // run of 1 between 4.0 and 6.0
      ("ip.m", 60L, Some(6.0)),
      ("ip.m", 70L, None)) // trailing unknown: no right anchor
    val c = Eval.Ctx(s, pts.toDF("name", "t", "value"), 10, 0, 70)
    def vals(expr: String): Seq[Option[Double]] =
      Eval.evalExpr(c, expr)
        .as[(String, Long, Option[Double])].collect().sortBy(_._2)
        .map(_._3).toSeq
    assert(vals("interpolate('ip.m')") ===
      Seq(None, Some(1.0), Some(2.0), Some(3.0), Some(4.0), Some(5.0),
        Some(6.0), None))
    // limit bounds the RUN length: the 2-run stays, the 1-run fills
    assert(vals("interpolate('ip.m', 1)") ===
      Seq(None, Some(1.0), None, None, Some(4.0), Some(5.0),
        Some(6.0), None))
  }

  test("extension: threshold / identity / cumulative / multiply-wildcards") {
    val s = spark; import s.implicits._
    // threshold: a labeled constantLine over the viewport
    val th = Eval.evalExpr(ctx, "threshold(42.5, 'limit')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(th.map(_._1).toSet === Set("limit"))
    assert(th.map(r => (r._2, r._3)).toSeq ===
      Seq((0L, Some(42.5)), (90L, Some(42.5))))
    // unlabeled keeps constantLine's own name
    val th0 = Eval.evalExpr(ctx, "threshold(42.5)")
      .as[(String, Long, Option[Double])].collect()
    assert(th0.map(_._1).toSet === Set("constantLine(42.5)"))
    // identity: value(t) = t on the maxPoints generator grid
    val idn = Eval.evalExpr(ctx.copy(maxPoints = 10), "identity('t.series')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(idn.map(_._1).toSet === Set("t.series"))
    assert(idn.length === 10 && idn.head._2 === 0L && idn.last._2 === 90L)
    assert(idn.forall(r => r._3.contains(r._2.toDouble)))
    // cumulative ≡ consolidateBy('sum') — same mirrored scaling hack
    val c9 = ctx.copy(maxPoints = 9) // factor (90-0)/9 = 10
    val cu = Eval.evalExpr(c9, "cumulative('foo.bar1.baz')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2).toSeq
    val cb = Eval.evalExpr(c9, "consolidateBy('foo.bar1.baz', 'sum')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2).toSeq
    assert(cu === cb && cu.forall(_._3.contains(100.0)))
    // multiplySeriesWithWildcards: bar-node collapse → 10·20 per slot
    val mw = Eval.evalExpr(ctx, "multiplySeriesWithWildcards(foo.*.baz, 1)")
      .as[(String, Long, Option[Double])].collect()
    assert(mw.map(_._1).toSet === Set("foo.*.baz"))
    assert(mw.length === 10 && mw.forall(_._3.contains(200.0)))
    // render-hint no-ops pass rows through
    val nop = Eval.evalExpr(ctx, "dashed(drawAsInfinite('foo.bar1.baz'))")
      .as[(String, Long, Option[Double])].collect()
    assert(nop.length === 10 && nop.forall(_._3.contains(10.0)))
    // verticalLine: two 1.0 points at [ts, ts+1]; outside-viewport raises
    val vl = Eval.evalExpr(ctx, "verticalLine(50, 'mark')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(vl.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq(("mark", 50L, Some(1.0)), ("mark", 51L, Some(1.0))))
    val err = intercept[IllegalArgumentException] {
      Eval.evalExpr(ctx, "verticalLine(500)")
    }
    assert(err.getMessage.contains("outside the viewport"))
  }

  test("extension: sigmoid/logit/exp/round vectors; add, case, movingWindow, aggregateLine, time") {
    val s = spark; import s.implicits._
    def vals(expr: String): Seq[Option[Double]] =
      Eval.evalExpr(ctx, expr)
        .as[(String, Long, Option[Double])].collect().sortBy(_._2)
        .map(_._3).toSeq
    def names(expr: String): Set[String] =
      Eval.evalExpr(ctx, expr)
        .as[(String, Long, Option[Double])].collect().map(_._1).toSet
    // sigmoid/exp on the constant-10 fixture; logit domain rules
    assert(vals("sigmoid('foo.bar1.baz')")
      .forall(_.contains(1.0 / (1.0 + math.exp(-10.0)))))
    assert(vals("exp('foo.bar1.baz')").forall(_.contains(math.exp(10.0))))
    assert(vals("exp(scale('foo.bar1.baz', 100))").forall(_.isEmpty)) // overflow
    assert(vals("logit('foo.bar1.baz')").forall(_.isEmpty)) // 10 ∉ (0,1)
    assert(vals("logit(scale('foo.bar1.baz', 0.01))")
      .forall(_.contains(math.log(0.1 / 0.9))))
    // round: python-3 half-to-even ties, precision arg
    assert(vals("round(scale('foo.bar1.baz', 0.05))").forall(_.contains(0.0)))
    assert(vals("round(scale('foo.bar1.baz', 0.15))").forall(_.contains(2.0)))
    assert(vals("round(scale('foo.bar1.baz', 0.333), 1)")
      .forall(_.contains(3.3)))
    // add ≡ offset
    assert(vals("add('foo.bar1.baz', 2.5)").forall(_.contains(12.5)))
    // case surgery round-trips
    assert(names("toUpperCase('foo.bar1.baz')") === Set("FOO.BAR1.BAZ"))
    assert(names("toLowerCase(toUpperCase('foo.bar1.baz'))") ===
      Set("foo.bar1.baz"))
    // unique: a double-fetched series collapses to one copy
    val u = Eval.evalExpr(ctx, "unique(group('foo.bar1.baz', 'foo.*.baz'))")
      .as[(String, Long, Option[Double])].collect()
    assert(u.count(_._1 == "foo.bar1.baz") === 10)
    assert(u.length === 20)
    // movingWindow dispatches the family by name
    assert(vals("movingWindow('foo.bar1.baz', 3, 'max')") ===
      vals("movingMax('foo.bar1.baz', 3)"))
    // aggregateLine: two-point constant line at the summary value
    val al = Eval.evalExpr(ctx, "aggregateLine('foo.bar1.baz', 'avg')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(al.map(_._1).toSet === Set("aggregateLine(foo.bar1.baz, avg)"))
    assert(al.map(r => (r._2, r._3)).toSeq ===
      Seq((0L, Some(10.0)), (90L, Some(10.0))))
    // time(name, step): explicit grid, value = t
    val tm = Eval.evalExpr(ctx, "time('clock', 30)")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(tm.map(_._2).toSeq === Seq(0L, 30L, 60L, 90L))
    assert(tm.forall(r => r._3.contains(r._2.toDouble)))
  }

  test("extension: sortBy, pairwise series lists, applyByNode") {
    val s = spark; import s.implicits._
    // sortBy('max', true) ≡ sortByMaxima on the render-order channel
    def ords(expr: String): Map[String, Int] =
      Eval.evalExpr(ctx, expr)
        .select("name", "__ord").distinct()
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(ords("sortBy('foo.*.baz', 'max', true)") ===
      ords("sortByMaxima('foo.*.baz')"))
    // default: ascending by average — bar1 (10) first
    assert(ords("sortBy('foo.*.baz')") ===
      Map("foo.bar1.baz" -> 1, "foo.bar2.baz" -> 2))
    // pairwise division: one pair, 10/20 at every slot
    val dv = Eval.evalExpr(ctx,
        "divideSeriesLists('foo.bar1.baz', 'foo.bar2.baz')")
      .as[(String, Long, Option[Double])].collect()
    assert(dv.map(_._1).toSet ===
      Set("divideSeries(foo.bar1.baz,foo.bar2.baz)"))
    assert(dv.length === 10 && dv.forall(_._3.contains(0.5)))
    // pairwise sum over the same pair: 30 everywhere
    val sm = Eval.evalExpr(ctx,
        "sumSeriesLists('foo.bar1.baz', 'foo.bar2.baz')")
      .as[(String, Long, Option[Double])].collect()
    assert(sm.length === 10 && sm.forall(_._3.contains(30.0)))
    // unequal lengths fail loudly at execution
    val err = intercept[Exception] {
      Eval.evalExpr(ctx, "divideSeriesLists('foo.*.baz', 'foo.bar1.baz')")
        .collect()
    }
    assert(err.getMessage != null)
    // applyByNode: per-prefix template + newName substitution
    val ab = Eval.evalExpr(ctx,
        "applyByNode('foo.*.baz', 1, 'scale(%.baz, 2)', '%.x2')")
      .as[(String, Long, Option[Double])].collect()
    assert(ab.map(_._1).toSet === Set("foo.bar1.x2", "foo.bar2.x2"))
    assert(ab.filter(_._1 == "foo.bar1.x2").forall(_._3.contains(20.0)))
    assert(ab.filter(_._1 == "foo.bar2.x2").forall(_._3.contains(40.0)))
  }

  test("extension: percentile-band filters (vectors)") {
    val s = spark; import s.implicits._
    // five constant series 1..5; averages [1..5] → reference-quantile
    // band (p=.2, .8) = (1.2, 4.8): only the 1 and 5 series escape
    val pts5 = for { k <- 1 to 5; i <- 0 until 4 }
      yield (s"p.s$k", i * 10L, k.toDouble)
    val c5 = Eval.Ctx(s, pts5.toDF("name", "t", "value"), 10, 0, 30)
    def names(c: Eval.Ctx, expr: String): Set[String] =
      Eval.evalExpr(c, expr)
        .as[(String, Long, Option[Double])].collect().map(_._1).toSet
    assert(names(c5, "averageOutsidePercentile(p.*, 80)") ===
      Set("p.s1", "p.s5"))
    // n < 50 mirrors to 100 − n
    assert(names(c5, "averageOutsidePercentile(p.*, 20)") ===
      Set("p.s1", "p.s5"))
    // removeBetweenPercentile: per-slot bands; constant frame agrees
    assert(names(c5, "removeBetweenPercentile(p.*, 80)") ===
      Set("p.s1", "p.s5"))
    // ONE escaping point rescues a series (the ANY rule): spike s3 at
    // one slot far above that slot's band
    val spiked = pts5.map { case (n, t, v) =>
      if (n == "p.s3" && t == 20L) (n, t, 100.0) else (n, t, v)
    }
    val cs = Eval.Ctx(s, spiked.toDF("name", "t", "value"), 10, 0, 30)
    assert(names(cs, "removeBetweenPercentile(p.*, 80)") ===
      Set("p.s1", "p.s3", "p.s5"))
  }

  test("extension: generic top-n / filterSeries / powSeries / " +
      "aggregateSeriesLists — the closing graphite-web wave") {
    val s = spark; import s.implicits._
    def names(expr: String): Set[String] =
      Eval.evalExpr(ctx, expr)
        .as[(String, Long, Option[Double])].collect().map(_._1).toSet

    // highest/lowest: the generic spellings; default n=1 func=average
    assert(names("highest('foo.*.baz', 1, 'max')") === Set("foo.bar2.baz"))
    assert(names("lowest('foo.*.baz', 1, 'total')") === Set("foo.bar1.baz"))
    assert(names("highest('foo.*.baz')") === Set("foo.bar2.baz"))

    // filterSeries: every operator
    assert(names("filterSeries('foo.*.baz', 'average', '>', 15)") ===
      Set("foo.bar2.baz"))
    assert(names("filterSeries('foo.*.baz', 'max', '<=', 10)") ===
      Set("foo.bar1.baz"))
    assert(names("filterSeries('foo.*.baz', 'last', '=', 20)") ===
      Set("foo.bar2.baz"))
    assert(names("filterSeries('foo.*.baz', 'sum', '!=', 100)") ===
      Set("foo.bar2.baz"))
    intercept[IllegalArgumentException] {
      Eval.evalExpr(ctx, "filterSeries('foo.*.baz', 'avg', '~', 1)")
    }

    // powSeries: name-order fold; a missing member shortens the fold,
    // an UNKNOWN member poisons the slot
    val pf = Seq(
      ("p.a", 0L, Some(2.0)), ("p.b", 0L, Some(3.0)), ("p.c", 0L, Some(2.0)),
      ("p.a", 10L, Some(4.0)), ("p.b", 10L, Some(0.5)),
      ("p.a", 20L, None), ("p.b", 20L, Some(3.0)))
    val cp = Eval.Ctx(s, pf.toDF("name", "t", "value"), 10, 0, 20)
    val pv = Eval.evalExpr(cp, "powSeries(p.*)")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(pv.map(_._1).forall(_ == "powSeries"))
    assert(pv.map(_._3).toSeq === Seq(Some(64.0), Some(2.0), None))
    // the generic stddev is POPULATION (graphite's safeStdDev divides
    // by n): a single-point series has stddev 0, not the sample form's
    // undefined — filterSeries '=' 0 must keep it
    def cpNames(expr: String): Set[String] =
      Eval.evalExpr(cp, expr)
        .as[(String, Long, Option[Double])].collect().map(_._1).toSet
    assert(cpNames("filterSeries(p.*, 'stddev', '=', 0)") === Set("p.c"))

    // aggregateSeriesLists: name-rank pairing + graphite's SAFE
    // aggregators — a one-sided 'diff' yields the known side POSITIVE
    // (safeDiff's first-known rule), 'sum' of one known is that value
    val lf = Seq(
      ("a.x", 0L, Some(10.0)), ("b.x", 0L, Some(4.0)),
      ("a.x", 10L, None), ("b.x", 10L, Some(4.0)),
      ("a.y", 0L, Some(7.0)), ("b.y", 0L, None),
      ("a.y", 10L, None), ("b.y", 10L, None))
    val cl = Eval.Ctx(s, lf.toDF("name", "t", "value"), 10, 0, 10)
    def agg(fn: String): Map[(String, Long), Option[Double]] =
      Eval.evalExpr(cl, s"aggregateSeriesLists(a.*, b.*, '$fn')")
        .as[(String, Long, Option[Double])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val d = agg("diff")
    assert(d(("diffSeries(a.x,b.x)", 0L)) === Some(6.0))
    assert(d(("diffSeries(a.x,b.x)", 10L)) === Some(4.0)) // subtrahend, positive
    assert(d(("diffSeries(a.y,b.y)", 0L)) === Some(7.0))
    assert(d(("diffSeries(a.y,b.y)", 10L)) === None)
    val sm = agg("sum")
    assert(sm(("sumSeries(a.x,b.x)", 0L)) === Some(14.0))
    assert(sm(("sumSeries(a.x,b.x)", 10L)) === Some(4.0))
    val mx = agg("max")
    assert(mx(("maxSeries(a.x,b.x)", 0L)) === Some(10.0))
    assert(mx(("maxSeries(a.y,b.y)", 0L)) === Some(7.0))
    val ml = agg("multiply") // safeMul: ANY unknown ⇒ unknown
    assert(ml(("multiplySeries(a.y,b.y)", 0L)) === None)
    val st = agg("stddev") // pop stddev of the knowns; one known → 0
    assert(st(("stddevSeries(a.x,b.x)", 0L)) === Some(3.0))
    assert(st(("stddevSeries(a.y,b.y)", 0L)) === Some(0.0))
    // length mismatch raises at execution (raise_error in the name)
    val lf2 = Seq(("a.x", 0L, 1.0), ("a.y", 0L, 2.0), ("b.x", 0L, 3.0))
    val cl2 = Eval.Ctx(s, lf2.toDF("name", "t", "value"), 10, 0, 0)
    intercept[Exception] {
      Eval.evalExpr(cl2, "aggregateSeriesLists(a.*, b.*, 'sum')").collect()
    }
    // graphite's 4th positional (xFilesFactor) is unimplemented —
    // loud, never silently dropped
    intercept[IllegalArgumentException] {
      Eval.evalExpr(cl2, "aggregateSeriesLists(a.*, b.*, 'sum', 0.5)")
    }
  }

  test("extension: mapSeries/reduceSeries, cactiStyle/legendValue, " +
      "aliasQuery, xff channel, render no-ops") {
    val s = spark; import s.implicits._
    // reduceSeries: graphite's canonical servers.*.disk.* example
    val disk = Seq(
      ("sv.s1.disk.used", 0L, 25.0), ("sv.s1.disk.total", 0L, 100.0),
      ("sv.s2.disk.used", 0L, 30.0), ("sv.s2.disk.total", 0L, 60.0))
    val cd = Eval.Ctx(s, disk.toDF("name", "t", "value"), 10, 0, 0)
    val red = Eval.evalExpr(cd,
      "reduceSeries(mapSeries(sv.*.disk.*, 1), 'asPercent', 3, 'used', 'total')")
      .as[(String, Long, Option[Double])].collect()
    assert(red.map(r => r._1 -> r._3).toMap === Map(
      "sv.s1.disk.reduce.asPercent" -> Some(25.0),
      "sv.s2.disk.reduce.asPercent" -> Some(50.0)))
    // mapSeries standalone renders flattened (identity)
    assert(Eval.evalExpr(cd, "mapSeries(sv.*.disk.*, 1)").count() === 4)

    // cactiStyle: exact layout, set-wide column alignment (both names
    // are 12 chars; all numbers 5 chars — no padding visible here)
    def nameSet(c: Eval.Ctx, e: String): Set[String] =
      Eval.evalExpr(c, e)
        .as[(String, Long, Option[Double])].collect().map(_._1).toSet
    assert(nameSet(ctx, "cactiStyle('foo.*.baz')") === Set(
      "foo.bar1.baz Current:10.00 Max:10.00 Min:10.00 ",
      "foo.bar2.baz Current:20.00 Max:20.00 Min:20.00 "))
    // width alignment: a shorter name/number pads to the set max
    val pad = Seq(("n.a", 0L, 5.0), ("n.longer", 0L, 123.456))
    val cpad = Eval.Ctx(s, pad.toDF("name", "t", "value"), 10, 0, 0)
    assert(nameSet(cpad, "cactiStyle('n.*')") === Set(
      "n.a      Current:5.00   Max:5.00   Min:5.00   ",
      "n.longer Current:123.46 Max:123.46 Min:123.46 "))
    // units suffix; positional system arg is loud
    assert(nameSet(cpad, "cactiStyle('n.a', units='b')") === Set(
      "n.a Current:5.00 b Max:5.00 b Min:5.00 b "))
    intercept[IllegalArgumentException] {
      Eval.evalExpr(cpad, "cactiStyle('n.*', 'si')")
    }

    // legendValue: suffixes in argument order
    assert(nameSet(ctx, "legendValue('foo.bar1.baz', 'avg', 'max')") ===
      Set("foo.bar1.baz (avg: 10.00) (max: 10.00)"))

    // aliasQuery: rewrite foo.bar1.baz → foo.bar2.baz, print its last
    // value through the %d slot (truncation toward zero)
    assert(nameSet(ctx,
      "aliasQuery('foo.bar1.baz', 'bar1', 'bar2', 'peer last %d')") ===
      Set("peer last 20"))
    intercept[IllegalArgumentException] {
      Eval.evalExpr(ctx,
        "aliasQuery('foo.bar1.baz', 'bar1', 'nosuch', 'x %d')")
    }

    // aliasQuery over MANY series runs a BOUNDED number of Spark jobs
    // (one unioned plan + one pick action — not one job per series):
    // 40 matched series under the old per-series loop issued 40+
    // sequential collect() actions; the union form stays < 10 jobs
    val many = (0 until 40).flatMap(i => Seq(
      (f"m.src$i%02d.q", 0L, i.toDouble), (f"m.dst$i%02d.q", 0L, i * 2.0)))
    val cm = Eval.Ctx(s, many.toDF("name", "t", "value"), 10, 0, 0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    s.sparkContext.addSparkListener(listener)
    try {
      val out = Eval.evalExpr(cm,
        "aliasQuery('m.src*.q', 'src', 'dst', 'v %d')")
        .as[(String, Long, Option[Double])].collect()
      // listener events post asynchronously — wait until the count is
      // stable (the 40-vs-<10 margin dwarfs any straggler)
      var prev = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        if (jobs.get() == prev) stable += 1 else { stable = 0; prev = jobs.get() }
      }
      assert(out.map(_._1).toSet === (0 until 40).map(i => s"v ${i * 2}").toSet)
      assert(jobs.get() < 10,
        s"aliasQuery issued ${jobs.get()} jobs for 40 series — not batched")
    } finally s.sparkContext.removeSparkListener(listener)
    // the plan-fanout guard is loud, not a silent truncation
    val tight = "GRAFT_DSL_MAX_FANOUT" // env-config'd; default 2000 ≫ 40
    assert(graft.dsl.EvalLimits.maxPlanFanout >= 40, tight)

    // callsFunction: AST-based events() detection — whitespace before
    // the paren, nesting, and string literals all classify correctly
    import graft.dsl.Dsl
    assert(Dsl.callsFunction("events(deploy)", "events"))
    assert(Dsl.callsFunction("events (deploy)", "events"))
    assert(Dsl.callsFunction("alias(events(a, b), 'x')", "events"))
    assert(!Dsl.callsFunction("alias(foo.events.bar, 'events(')", "events"))
    assert(!Dsl.callsFunction("sumSeries(foo.*)", "events"))

    // setXFilesFactor channel: a bare removeEmptySeries honors it
    val gap = (0 until 10).flatMap(i => Seq(
      ("xf.full", i * 10L, Some(1.0)),
      ("xf.half", i * 10L, if (i < 5) Some(2.0) else None)))
    val cg = Eval.Ctx(s, gap.toDF("name", "t", "value"), 10, 0, 90)
    assert(nameSet(cg, "removeEmptySeries(xf.*)") ===
      Set("xf.full", "xf.half"))
    assert(nameSet(cg, "removeEmptySeries(setXFilesFactor(xf.*, 0.6))") ===
      Set("xf.full"))
    assert(nameSet(cg, "removeEmptySeries(xFilesFactor(xf.*, 0.4))") ===
      Set("xf.full", "xf.half"))

    // render no-ops pass data through
    for (e <- Seq("alpha('foo.bar1.baz', 0.5)", "lineWidth('foo.bar1.baz', 2)",
        "areaBetween('foo.*.baz')"))
      assert(Eval.evalExpr(ctx, e).count() > 0, e)
  }

  test("extension: sinFunction and the deterministic randomWalk") {
    val s = spark; import s.implicits._
    val c = Eval.Ctx(s, Seq(("x.y", 0L, 1.0)).toDF("name", "t", "value"),
      10, fromSec = 100, toSec = 150)
    // sinFunction: amplitude·sin(t epoch) on an end-EXCLUSIVE grid
    val sv = Eval.evalExpr(c, "sinFunction('sine', 2, 10)")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(sv.map(_._2).toSeq === Seq(100L, 110L, 120L, 130L, 140L))
    assert(sv.map(_._3.get).toSeq ===
      Seq(100L, 110L, 120L, 130L, 140L).map(t => math.sin(t.toDouble) * 2))
    // randomWalk: point 0 is 0; point i is the LCG partial sum
    val rv = Eval.evalExpr(c, "randomWalk('rw', 10)")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    def u(i: Long): Double =
      ((1103515245L * i + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5
    val expect = Seq.iterate((0L, 0.0), 5) { case (i, acc) =>
      (i + 1, acc + u(i)) }.map(_._2)
    assert(rv.map(_._3.get).toSeq === expect)
    // and it is reproducible run-to-run
    val rv2 = Eval.evalExpr(c, "randomWalkFunction('rw', 10)")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(rv2.map(_._3).toSeq === rv.map(_._3).toSeq)
    // a viewport SHORTER than one step emits exactly one point at the
    // start — never a point past `until` (graphite's end-exclusive
    // while-loop)
    val cShort = Eval.Ctx(s, Seq(("x.y", 0L, 1.0)).toDF("name", "t", "value"),
      10, fromSec = 100, toSec = 130)
    val short = Eval.evalExpr(cShort, "sinFunction('s', 1, 60)")
      .as[(String, Long, Option[Double])].collect()
    assert(short.map(_._2).toSeq === Seq(100L))
  }

  test("extension: smartSummarize — buckets anchor at the query from") {
    val s = spark; import s.implicits._
    // ramp v=k at t=10k; from=5 → t=0 is outside the window, buckets
    // [5,25)={1,2}, [25,45)={3,4}, [45,65)={5}
    val ramp = (0 until 6).map(i => ("sm.m", i * 10L, i * 1.0))
    val c = Eval.Ctx(s, ramp.toDF("name", "t", "value"), 10,
      fromSec = 5, toSec = 55)
    val out = Eval.evalExpr(c, "smartSummarize('sm.m', 20, 'sum')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(out.map(r => (r._2, r._3)).toSeq ===
      Seq((5L, Some(3.0)), (25L, Some(7.0)), (45L, Some(5.0))))
    // default cf is sum; 'average' spelling maps to avg
    val avg = Eval.evalExpr(c, "smartSummarize('sm.m', 20, 'average')")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(avg.map(_._3).toSeq === Seq(Some(1.5), Some(3.5), Some(5.0)))
  }
}
