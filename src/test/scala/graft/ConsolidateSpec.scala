package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.rrd.{Archives, Consolidate, RraSpec}
import graft.ts.Durations
import graft.dsl.Eval

/** Consolidation-engine and planner tests with hand-computed vectors
  * (the style of `rrd/ds_test.go` / `rrd/pdp_test.go`), plus a DSL
  * end-to-end evaluation over an in-memory store. */
class ConsolidateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]")
      .appName("consolidate-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  test("weighted-mean slot consolidation with interval splitting") {
    val s = spark; import s.implicits._
    // intervals: [0,10)→2, [10,25)→4, [25,40)→8  (value rides the LATER point)
    val updates = Seq(("a", 0L, 1.0), ("a", 10L, 2.0), ("a", 25L, 4.0),
      ("a", 40L, 8.0)).toDF("name", "ts", "value")
    val byT = Consolidate.consolidate(updates, 10, "wmean", 0.0, 60)
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(byT == Map(0L -> 2.0, 10L -> 4.0, 20L -> 6.0, 30L -> 8.0))
  }

  test("NaN update is a boundary that contributes nothing — rrd/pdp_test.go:61-105 semantics") {
    val s = spark; import s.implicits._
    // (t=0, 10), (t=10, NaN), (t=20, 30): the NaN point's interval
    // [0,10) contributes NOTHING (value or duration), but the NEXT
    // interval starts at the NaN point — [10,20)→30. Had the NaN line
    // been dropped at parse, [0,20)→30 would smear 30 into slot 0.
    val updates = Seq(("a", 0L, 10.0), ("a", 10L, Double.NaN),
      ("a", 20L, 30.0)).toDF("name", "ts", "value")
    val byT = Consolidate.consolidate(updates, 10, "wmean", 0.0, 100)
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(byT == Map(10L -> 30.0))
    // ... and the non-contribution includes XFF duration: with xff 0.5
    // the empty slot stays absent either way, and a HALF-NaN slot
    // (NaN at t=5 inside [0,10)) keeps only its real half
    val half = Seq(("a", 0L, 10.0), ("a", 5L, Double.NaN),
      ("a", 10L, 40.0), ("a", 20L, 40.0)).toDF("name", "ts", "value")
    val h = Consolidate.consolidate(half, 10, "wmean", 0.6, 100)
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    // slot 0 covered 5s of 10 by the [5,10)→40 interval: xff .6 kills it
    assert(h == Map(10L -> 40.0))
    // max/min/last skip NaN the same way (AddValueMax/Min/Last gates)
    for (cf <- Seq("max", "min", "last")) {
      val m = Consolidate.consolidate(updates, 10, cf, 0.0, 100)
        .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
      assert(m == Map(10L -> 30.0), cf)
    }
    // whisper (HB-0) mode: a NaN point cannot overwrite a real value
    val w = Consolidate.whisperMode(Seq(("a", 3L, 7.0), ("a", 8L, Double.NaN))
        .toDF("name", "ts", "value"), 10)
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(w == Map(0L -> 7.0))
  }

  test("heartbeat gap drops the interval; xff drops thin slots") {
    val s = spark; import s.implicits._
    // gap 100 > hb 60 between 10 and 110: nothing lands in 10..110
    val updates = Seq(("a", 0L, 1.0), ("a", 10L, 2.0), ("a", 110L, 3.0),
      ("a", 125L, 4.0)).toDF("name", "ts", "value")
    val noXff = Consolidate.consolidate(updates, 10, "wmean", 0.0, 60)
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(noXff == Map(0L -> 2.0, 110L -> 4.0))
    // slot 110 has 10/10 coverage; slot 120 only 5/10 — xff .6 kills 120
    // (but 120+10 > lastUpdate 125 means it was already incomplete)
    val xff = Consolidate.consolidate(updates, 10, "wmean", 0.6, 60)
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(xff == Map(0L -> 2.0, 110L -> 4.0))
  }

  test("updateRange multi-RRA cascade — rrd/ds_test.go:177-250 vectors") {
    val s = spark; import s.implicits._
    // One interval [103, 156)@100 across four resolutions. The
    // reference keys slots by ring index = (endTime/step) mod size and
    // commits only COMPLETED slots (the tail stays in the PDP); our
    // slots are keyed by start time, so idx k ↔ start (k·step − step).
    // Filtering to slots whose end ≤ lastUpdate reproduces exactly the
    // committed sets the reference asserts.
    val pts = Seq(("ds", 103L, 0.0), ("ds", 156L, 100.0))
      .toDF("name", "ts", "value")
    def slots(step: Long): Map[Long, Double] =
      Consolidate.consolidate(pts, step, "wmean", 0.0, 3600)
        .filter(org.apache.spark.sql.functions.col("t") + step <= 156)
        .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    // rra[0] step 10: idx {1..5} = ends 110..150 = starts 100..140
    assert(slots(10) === (0 to 4).map(i => (100L + i * 10) -> 100.0).toMap)
    // rra[1] step 20: idx {6,7} = ends {120,140} = starts {100,120}
    assert(slots(20) === Map(100L -> 100.0, 120L -> 100.0))
    // rra[2] step 50: idx {3} = end 150 = start 100
    assert(slots(50) === Map(100L -> 100.0))
    // rra[3] step 100: nothing completed before 156
    assert(slots(100) === Map.empty[Long, Double])
    // aligned-end variant [104, 160): step 20 commits idx {6,7,8}
    val pts2 = Seq(("ds", 104L, 0.0), ("ds", 160L, 100.0))
      .toDF("name", "ts", "value")
    val aligned = Consolidate.consolidate(pts2, 20, "wmean", 0.0, 3600)
      .filter(org.apache.spark.sql.functions.col("t") + 20 <= 160)
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(aligned === Map(100L -> 100.0, 120L -> 100.0, 140L -> 100.0))
  }

  test("max/min/last consolidation functions") {
    val s = spark; import s.implicits._
    val updates = Seq(("a", 0L, 5.0), ("a", 4L, 1.0), ("a", 8L, 9.0),
      ("a", 20L, 2.0)).toDF("name", "ts", "value")
    def run(cf: String) = Consolidate.consolidate(updates, 10, cf, 0.0, 60)
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(run("max") == Map(0L -> 9.0, 10L -> 2.0))
    assert(run("min") == Map(0L -> 1.0, 10L -> 2.0))
    // "last" = value of the chronologically last write covering the slot:
    // the [8,20)→2.0 interval covers [8,10), so slot 0 ends at 2.0
    assert(run("last") == Map(0L -> 2.0, 10L -> 2.0))
  }

  test("whisper (HB-0) mode: own slot only, last wins") {
    val s = spark; import s.implicits._
    val updates = Seq(("a", 3L, 1.0), ("a", 7L, 2.0), ("a", 25L, 5.0))
      .toDF("name", "ts", "value")
    val out = Consolidate.whisperMode(updates, 10)
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(out == Map(0L -> 2.0, 20L -> 5.0))
  }

  test("BestRRA selection — rrd/ds_test.go:70-156 vectors") {
    val ten = RraSpec(10, 100, 10000)   // covers (9000, 10000]
    val twenty = RraSpec(20, 100, 10000) // covers (8000, 10000]

    // only candidate in range
    assert(Archives.bestRra(Seq(ten), 9500, 9600, 10).map(_.stepSec) == Some(10L))
    // none include → longest
    assert(Archives.bestRra(Seq(ten, twenty), 5500, 5600, 10).map(_.stepSec) == Some(20L))
    // both include → nearest step to (end-start)/points = 10
    assert(Archives.bestRra(Seq(ten, twenty), 9500, 9600, 10).map(_.stepSec) == Some(10L))
    // start past latest still includes
    assert(Archives.bestRra(Seq(ten, twenty), 10100, 10200, 10).map(_.stepSec) == Some(10L))
    // fewer points → bigger step wins
    assert(Archives.bestRra(Seq(ten, twenty), 9500, 9600, 3).map(_.stepSec) == Some(20L))
    // no points → highest resolution, regardless of rra order
    assert(Archives.bestRra(Seq(twenty, ten), 9500, 9600, 0).map(_.stepSec) == Some(10L))
    // empty → none
    assert(Archives.bestRra(Nil, 9500, 9600, 10).isEmpty)
  }

  test("DsFinder: first-matching rule wins, default otherwise") {
    import graft.rrd.DsFinder
    import graft.rrd.DsFinder.{ArchiveSpec, DsSpec}
    val s = spark; import s.implicits._
    val fast = DsSpec(1L, 300L, Seq(ArchiveSpec("wmean", 1L, 3600L)))
    val slow = DsSpec(60L, 7200L, Seq(ArchiveSpec("wmean", 60L, 86400L)))
    val rules = Seq("^stats\\.timers\\." -> fast, "^stats\\." -> slow)

    assert(DsFinder.findSpec(rules, "stats.timers.lat") == fast)
    assert(DsFinder.findSpec(rules, "stats.gauges.x") == slow)
    assert(DsFinder.findSpec(rules, "other.series") == DsFinder.Default)

    val annotated = DsFinder.annotate(
      Seq("stats.timers.lat", "stats.gauges.x", "other.series").toDF("name"),
      rules).collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(annotated("stats.timers.lat") == (0, 1L))
    assert(annotated("stats.gauges.x") == (1, 60L))
    assert(annotated("other.series") == (-1, 10L))
  }

  test("duration parsing — misc/misc.go:39-77 suffixes") {
    assert(Durations.parseSeconds("10") == 10L)
    assert(Durations.parseSeconds("5min") == 300L)
    assert(Durations.parseSeconds("-7d") == -7L * 86400)
    assert(Durations.parseSeconds("1mon") == 30L * 86400)
    assert(Durations.parseSeconds("2y") == 2L * 365 * 86400)
    assert(Durations.parseMs("250ms") == 250L)
    assertThrows[IllegalArgumentException](Durations.parseSeconds("junk"))
  }

  test("groupByStep: resolution-pushdown bucket sizing") {
    import graft.rrd.Fetch
    // span/points below the archive step → native step
    assert(Fetch.groupByStep(0, 259200, 1000, 3600) == 3600L)
    // span/points above → rounded UP to a step multiple
    assert(Fetch.groupByStep(0, 2592000, 50, 21600) == 64800L)
    // no maxPoints → native step
    assert(Fetch.groupByStep(0, 2592000, 0, 3600) == 3600L)
  }

  test("render JSON: Graphite datapoints shape, nulls, escaping") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a\"b", 10L, Some(1.5)), ("a\"b", 20L, None),
      ("c", 10L, Some(3.0))).toDF("name", "t", "value")
    val json = Render.toGraphiteJson(df)
    assert(json ==
      """[{"target":"a\"b","datapoints":[[1.5,10],[null,20]]},""" +
      """{"target":"c","datapoints":[[3,10]]}]""")
  }

  test("render: multiple targets evaluate into one JSON response") {
    val s = spark; import s.implicits._
    import graft.dsl.Eval
    val pts = (0 until 4).flatMap(i => Seq(
      ("m.one", i * 10L, 1.0), ("m.two", i * 10L, 2.0)))
      .toDF("name", "t", "value")
    val ctx = Eval.Ctx(s, pts, stepSec = 10, fromSec = 0, toSec = 30)
    val json = Render.renderTargets(ctx,
      Seq("sumSeries(m.*)", "scale(m.two, 10)"))
    // both targets' series land in the single response array
    assert(json.contains("\"target\":\"sumSeries\""))
    assert(json.contains("\"target\":\"m.two\""))
    assert(json.contains("[20,")) // scale(2, 10)
    assert(json.contains("[3,"))  // sum of 1+2
    // two targets yielding the SAME series name → two response objects
    // (the reference loops per target), never one merged datapoints
    // array with doubled timestamps
    val dup = Render.renderTargets(ctx, Seq("m.one", "scale(m.one, 1)"))
    assert(dup.split("\"target\":\"m.one\"").length - 1 === 2)
    // and an empty target list is an empty response, not an exception
    assert(Render.renderTargets(ctx, Seq.empty) === "[]")
  }

  test("salted join is row-identical to the plain join") {
    val s = spark; import s.implicits._
    import graft.pipeline.Skew
    // one hot key (k0 × 50) + tail
    val big = ((1 to 50).map(i => ("k0", i)) ++ Seq(("k1", 99), ("k2", 7)))
      .toDF("k", "v")
    val small = Seq(("k0", "a"), ("k1", "b"), ("k3", "c")).toDF("k", "tag")
    val plain = big.join(small, "k").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(big, small, "k", nSalts = 8).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
    // histogram surfaces the hot key first
    val hist = Skew.keyHistogram(big, "k").collect()
    assert(hist.head.getString(0) == "k0" && hist.head.getLong(1) == 50L)
  }

  test("LSH bucket guard: 1k identical docs stay linear, pairs complete") {
    val s = spark; import s.implicits._
    import graft.pipeline.NearDup
    // 1000 byte-identical documents + 2 distinct near-dup texts: without
    // the exact-dup collapse the band self-join would enumerate ~500k
    // candidate rows through the verify stage; with it, candidate
    // generation sees ONE representative for the identical block.
    val same = (1L to 1000L).map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
    val docs = (same ++ Seq(
      (2001L, "completely different text about spark catalyst optimizers and shuffles"),
      (2002L, "completely different text about spark catalyst optimizers and planners")))
      .toDF("doc_id", "text")
    val (members, reps) = NearDup.collapseExact(docs)
    assert(reps.count() == 3) // 1 rep for the block + 2 distinct
    assert(members.count() == 1002)
    // candidate stage operates on reps only: O(distinct texts), not O(N²)
    val repCand = NearDup.candidates(NearDup.bands(
      NearDup.minhashSignatures(NearDup.shingles(reps))))
    assert(repCand.count() <= 3)
    // the full operator still reports every pair in the identical block
    val pairs = NearDup.minhashPairs(docs, 0.8)
    val within = pairs.filter($"doc_a" <= 1000 && $"doc_b" <= 1000)
    assert(within.count() == 1000L * 999 / 2)
    assert(within.filter($"jaccard" =!= 1.0).isEmpty)
    // the n-gram inverted-index path has the same guard: without the
    // collapse, 1000 copies push every shared shingle's df past DfCap
    // (=50), dropping them from the index and silently LOSING the
    // duplicate pairs — with it, the block still reports all pairs
    val ngram = NearDup.ngramJaccardPairs(docs, 0.5)
    val ngWithin = ngram.filter($"doc_a" <= 1000 && $"doc_b" <= 1000)
    assert(ngWithin.count() == 1000L * 999 / 2)
    assert(ngWithin.filter($"jaccard" =!= 1.0).isEmpty)
  }

  test("find JSON: /metrics/find node shape") {
    val s = spark; import s.implicits._
    val nodes = Seq(("events.click", true, false), ("events.u", false, true))
      .toDF("node", "leaf", "expandable")
    assert(Render.toFindJson(nodes) ==
      """[{"text":"click","id":"events.click","leaf":true,"expandable":false},""" +
      """{"text":"u","id":"events.u","leaf":false,"expandable":true}]""")
  }

  test("DSL end-to-end: parse → eval → result over an in-memory store") {
    val s = spark; import s.implicits._
    val store = Seq(
      ("a.x", 0L, 1.0), ("a.x", 10L, 2.0),
      ("a.y", 0L, 3.0), ("a.y", 10L, 5.0),
      ("b.z", 0L, 100.0)).toDF("name", "t", "value")
    val ctx = Eval.Ctx(s, store, stepSec = 10, fromSec = 0, toSec = 10)

    val sum2 = Eval.evalExpr(ctx, "scale(sumSeries(a.*), 2)")
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(sum2 == Map(0L -> 8.0, 10L -> 14.0))

    val chained = Eval.evalExpr(ctx, "a.x.derivative()")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._2 -> r._3).toMap
    assert(chained == Map(0L -> None, 10L -> Some(1.0)))

    val aliased = Eval.evalExpr(ctx, "alias(maxSeries(a.*, b.*), 'top')")
      .as[(String, Long, Double)].collect().map(r => (r._1, r._2, r._3)).toSet
    assert(aliased == Set(("top", 0L, 100.0), ("top", 10L, 5.0)))

    // quoted patterns (the reference's quoteIdentifiers form) work in
    // series position, and later strings stay scalar args
    val quoted = Eval.evalExpr(ctx, "alias(sumSeries('a.*'), 'tot')")
      .as[(String, Long, Double)].collect().map(r => (r._1, r._2, r._3)).toSet
    assert(quoted == Set(("tot", 0L, 4.0), ("tot", 10L, 7.0)))
    val grouped = Eval.evalExpr(ctx, "group('a.x', 'b.*')")
      .as[(String, Long, Double)].collect().map(_._1).toSet
    assert(grouped == Set("a.x", "b.z"))
  }

  test("DSL holtWintersConfidenceBands wrapper maps delta to devScale") {
    val s = spark; import s.implicits._
    val data = Seq(10.0, 20, 30, 40, 12, 22, 32, 42).zipWithIndex
      .map { case (v, i) => ("hw.s", i * 10L, v) }
    val ctx = Eval.Ctx(s, data.toDF("name", "t", "value"),
      stepSec = 10, fromSec = 0, toSec = 70)
    // seasonLen '40s' → 4 points; conf bands only (no smooth series)
    val out = Eval.evalExpr(ctx,
      "holtWintersConfidenceBands('hw.s', 2, seasonLen='40s', alpha=0.5, beta=0.4, gamma=0.6)")
      .as[(String, Long, Double)].collect()
    val names = out.map(_._1).toSet
    assert(names == Set("holtWintersConfidenceUpper(hw.s)",
      "holtWintersConfidenceLower(hw.s)"))
    // upper ≥ lower pointwise; band width reflects devScale=2
    val byT = out.groupBy(_._2)
    byT.foreach { case (_, rows) =>
      val up = rows.find(_._1.contains("Upper")).get._3
      val lo = rows.find(_._1.contains("Lower")).get._3
      assert(up >= lo)
    }
  }

  test("timeStack fetches shifted history beyond a bounded viewport") {
    val s = spark; import s.implicits._
    val store = (0 to 5).map(i => ("m", i * 10L, i.toDouble))
      .toDF("name", "t", "value")
    // to = 50, period 20: copy 0 = window [30,50] as-is; copy 1 =
    // window [10,30] shifted forward 20 — past data overlays the most
    // recent period, which a viewport-clipped fetch could never show
    val ctx = Eval.Ctx(s, store, stepSec = 10, fromSec = 30, toSec = 50)
    val out = Eval.evalExpr(ctx, "timeStack('m', '20s', 0, 1)")
      .as[(String, Long, Double)].collect().toSet
    assert(out == Set(
      ("timeShift(m, -20s, 0)", 30L, 3.0), ("timeShift(m, -20s, 0)", 40L, 4.0),
      ("timeShift(m, -20s, 0)", 50L, 5.0),
      ("timeShift(m, -20s, 1)", 30L, 1.0), ("timeShift(m, -20s, 1)", 40L, 2.0),
      ("timeShift(m, -20s, 1)", 50L, 3.0)))
  }

  test("HwOps nanless handling: leading gaps skipped, interior recycled") {
    val s = spark; import s.implicits._
    // dsl/funcs.go:2409-2434: series starts at first known point;
    // interior unknowns recycle the last value. Two clean seasons of 2
    // after the gap handling: [5,6,5,6] starting at t=20.
    val gappy = Seq[(String, Long, Option[Double])](
      ("g", 0L, None), ("g", 10L, None),
      ("g", 20L, Some(5.0)), ("g", 30L, Some(6.0)),
      ("g", 40L, Some(5.0)), ("g", 50L, None) // recycles 5.0 → 5
    ).toDF("name", "t", "value")
    val out = graft.ts.HwOps.holtWintersForecast(
        s, gappy, slenPoints = 2, nPred = 0,
        abg = Some((0.5, 0.5, 0.5)), devScale = 10.0,
        show = "smooth", stepSec = 10)
      .as[(String, Long, Double)].collect().sortBy(_._2)
    // leading gaps skipped: output starts at t=20, 4 points
    assert(out.map(_._2).toSeq == Seq(20L, 30L, 40L, 50L))
    // first smoothed value = first known data point
    assert(out.head._3 == 5.0)
    assert(out.forall(_._1 == "holtWintersForecast(g)"))
  }

  test("DSL Holt-Winters through the registry binds positional args") {
    val s = spark; import s.implicits._
    // two exact seasons of 4 points at step 10 → seasonLen '40s'
    val data = Seq(10.0, 20, 30, 40, 12, 22, 32, 42).zipWithIndex
      .map { case (v, i) => ("hw.s", i * 10L, v) }
    val store = data.toDF("name", "t", "value")
    val ctx = Eval.Ctx(s, store, stepSec = 10, fromSec = 0, toSec = 70)
    val out = Eval.evalExpr(ctx,
      "holtWintersForecast(hw.s, '40s', 7, 0.5, 0.4, 0.6)")
      .as[(String, Long, Double)].collect()
    assert(out.length == 8) // smooth only, no forecast (toSec = data end)
    assert(out.forall(_._1 == "holtWintersForecast(hw.s)"))
    // first smoothed value equals the first data point (HW recursion)
    assert(out.minBy(_._2)._3 == 10.0)
  }
}
