package graft.dsl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ts.{Durations, SeriesOps => O}

/** DSL evaluator: walks a parsed [[Dsl.Node]] and folds it into a
  * DataFrame plan over the canonical series frame `(name, t, value)`.
  *
  * This is the Spark counterpart of the reference's `funcVisitor` +
  * `seriesFromFunction` (`dsl/dsl.go:159-264`, `dsl/funcs.go:347-500`):
  * where the reference wires lazy Go iterators, this builds a Catalyst
  * logical plan — the optimizer then owns execution order, pushdown and
  * parallelism. Nothing here runs an action; evaluation is plan
  * construction only, so a 100 TB store costs the same to *plan* as a
  * 100 MB one.
  *
  * Functions are registered in a name → binder map exactly like the
  * reference's `preprocessArgFuncs` (`dsl/funcs.go:64-345`); adding a
  * function is adding a map entry.
  */
/** Driver-side plan-shape bounds for the two DSL functions whose plan
  * size grows with the matched-series count (aliasQuery, applyByNode).
  * Both are catalog-bounded by construction — graphite expands the same
  * loops — but an accidental `*` glob should fail loudly, not build a
  * 100k-arm union that stalls Catalyst analysis. */
object EvalLimits {
  /** Max union arms one DSL call may build (env `GRAFT_DSL_MAX_FANOUT`). */
  def maxPlanFanout: Int =
    sys.env.get("GRAFT_DSL_MAX_FANOUT").map(_.toInt).getOrElse(2000)
}

object Eval {

  sealed trait Val
  /** A set of series — the reference's `SeriesMap`. */
  final case class SeriesV(df: DataFrame) extends Val
  final case class NumV(v: Double) extends Val
  final case class StrV(s: String) extends Val
  /** An unquoted bareword — a metric-path glob in series position, raw
    * text in string/duration position (the reference's Go-AST ident
    * coercion, `dsl/dsl.go:159-264`: `useSeriesAbove(..., foo, bar)`
    * passes bare idents as strings). Coercion happens at the arg
    * binder, so the SAME word can be either. */
  final case class PatternV(p: String) extends Val

  /** Evaluation context: the store is the catalog-resolved canonical
    * frame; from/to bound generator functions (`constantLine`,
    * `sinusoid`, `timeStack` re-fetches). */
  final case class Ctx(spark: SparkSession, store: DataFrame,
      stepSec: Long, fromSec: Long, toSec: Long, maxPoints: Int = 512,
      /** Optional events frame `(when: Long, tags: Array[String])` for
        * the `events()` function (graphite-web's annotations query;
        * extension) — the daemon builds it from its [[graft.streaming
        * .EventStore]], specs hand a small frame. None = no events
        * subsystem: `events()` then yields an empty series. */
      events: Option[DataFrame] = None) {
    /** Pattern → series: glob over the name catalog
      * (`dsl/named_ds.go:91-96`) plus the viewport time-range predicate
      * (`http/graphite.go:197-221` from/until → `serde/dbseries.go`
      * `t >= $ AND t <= $`). Both are Catalyst predicates on the store
      * scan — at scale they prune via partition/row-group stats rather
      * than listing names on the driver. A zero range (from == to)
      * means unbounded, matching the test contexts. */
    def fetch(pattern: String): DataFrame =
      fetchWhere(col("name").rlike(Dsl.globToRegex(pattern)))

    /** Store slice under an arbitrary name-catalog predicate plus the
      * viewport time range — [[fetch]]'s body, exposed for selectors
      * that are not name globs (`seriesByTag`). */
    def fetchWhere(cond: org.apache.spark.sql.Column): DataFrame = {
      val named = store.filter(cond)
      if (fromSec < toSec)
        named.filter(col("t") >= fromSec && col("t") <= toSec)
      else named
    }
  }

  /** The full render pipeline for one target (`SURVEY §3.1`): evaluate
    * the expression, then consolidate down to ≤ maxPoints per series by
    * average — the reference's maxDataPoints re-bucketing
    * (`serde/dbseries.go:104-127`), applied as the final plan stage. */
  def render(ctx: Ctx, expr: String): DataFrame = {
    val df = evalExpr(ctx, expr)
    val bucket = graft.rrd.Fetch.groupByStep(
      ctx.fromSec, ctx.toSec, ctx.maxPoints.toLong, ctx.stepSec)
    if (bucket <= ctx.stepSec) df
    else {
      val g = df.groupBy(col("name"),
        (floor(col("t").cast("double") / bucket).cast("long") * bucket).as("t"))
      // the sortBy* family's render-order channel is per-series
      // constant — carry it through the re-bucket
      if (df.columns.contains("__ord"))
        g.agg(avg(col("value")).as("value"), min(col("__ord")).as("__ord"))
      else g.agg(avg(col("value")).as("value"))
    }
  }

  def evalExpr(ctx: Ctx, expr: String): DataFrame =
    eval(ctx, Dsl.parse(expr)) match {
      case SeriesV(df) => df
      // A whole-expression bare path (`target=m.one`) is a fetch — the
      // reference quotes it into a pattern before parse
      // (`http/graphite.go:227-257`); series coercion here matches
      // [[asSeries]] for the top-level position.
      case PatternV(p) => ctx.fetch(p)
      case StrV(p)     => ctx.fetch(p)
      case other => throw new IllegalArgumentException(
        s"expression yields $other, not a series set: $expr")
    }

  def eval(ctx: Ctx, node: Dsl.Node): Val = node match {
    case Dsl.Num(v)     => NumV(v)
    case Dsl.Str(s)     => StrV(s)
    case Dsl.Pattern(p) => PatternV(p)
    case Dsl.Call(fn, args, kwargs) =>
      val f = registry.getOrElse(fn, throw new IllegalArgumentException(
        s"unknown function: $fn"))
      f(ctx, args.map(eval(ctx, _)), kwargs.map { case (k, n) => k -> eval(ctx, n) })
  }

  // ---- arg binders (the reference's coercion, `dsl/funcs.go:347-500`) ----

  /** A string in series position is a quoted pattern — the reference's
    * ident-quoting makes every dotted path a string before parse
    * (`http/graphite.go:227-257`). */
  private def asSeries(ctx: Ctx, v: Val): DataFrame = v match {
    case SeriesV(df) => df
    case StrV(p)     => ctx.fetch(p)
    case PatternV(p) => ctx.fetch(p)
    case other => throw new IllegalArgumentException(s"not a series: $other")
  }
  private def num(v: Val): Double = v match {
    case NumV(d) => d
    case StrV(s) => s.toDouble
    case PatternV(s) => s.toDouble
    case other   => throw new IllegalArgumentException(s"not a number: $other")
  }
  private def str(v: Val): String = v match {
    case StrV(s) => s
    case PatternV(s) => s
    case NumV(d) => if (d == d.toLong) d.toLong.toString else d.toString
    case other   => throw new IllegalArgumentException(s"not a string: $other")
  }
  /** Graphite duration ("1h", "-7d") or bare seconds. */
  private def durSec(v: Val): Long = v match {
    case NumV(d) => d.toLong
    case StrV(s) => Durations.parseSeconds(s)
    case PatternV(s) => Durations.parseSeconds(s)
    case other   => throw new IllegalArgumentException(s"not a duration: $other")
  }

  type Impl = (Ctx, Seq[Val], Map[String, Val]) => Val

  /** Merge resolved series frames the way the reference's `processArgs`
    * merges into a name-keyed SeriesMap (`dsl/funcs.go:470-487`,
    * `combined[n] = s`): a series matched by two overlapping patterns
    * counts ONCE. Frames are one row per (name, t), so dedup on that key
    * is the map-merge. Single-arg calls skip it — one fetch can't
    * self-duplicate, and the common path stays shuffle-free. */
  private def mergeSets(dfs: Seq[DataFrame]): DataFrame =
    if (dfs.sizeIs == 1) dfs.head
    else dfs.reduce(_.unionByName(_)).dropDuplicates("name", "t")

  /** fn over the merged leading series set + trailing scalars. All
    * leading series args merge into one set — the reference's var-arg
    * `SeriesMap` merge + Align (`dsl/funcs.go:472-487`). Every frame in
    * one evaluation shares the store's step, so the LCM-align is the
    * identity here; mixed-step inputs go through [[O.align]]. */
  private def onSeries(f: (Ctx, DataFrame, Seq[Val], Map[String, Val]) => DataFrame): Impl =
    (ctx, args, kw) => {
      // leading SeriesV args merge; a STRING in first position is a
      // quoted pattern (the reference's quoteIdentifiers pre-pass wraps
      // every dotted path in quotes, `http/graphite.go:227-257`) —
      // later strings are scalar args, since every registry function
      // takes its seriesList first
      val (sets, rest) = args match {
        case (s @ (_: StrV | _: PatternV)) +: more =>
          val (extra, r) = more.span(_.isInstanceOf[SeriesV])
          ((s +: extra), r)
        case _ => args.span(_.isInstanceOf[SeriesV])
      }
      require(sets.nonEmpty, "expected a series argument")
      val df = mergeSets(sets.map(asSeries(ctx, _)))
      SeriesV(f(ctx, df, rest, kw))
    }

  val registry: Map[String, Impl] = {
    val b = Map.newBuilder[String, Impl]
    def add(names: Seq[String])(impl: Impl): Unit = names.foreach(n => b += n -> impl)

    // ----- cross-series combines (series/seriesslice.go reducers) -----
    // The reference registers these varArg (`dsl/funcs.go:71-97`): EVERY
    // positional arg — quoted pattern or series — resolves and merges
    // into one set, so sumSeries("a.*", "b.*") unions both patterns
    // (processArgs' combined-map merge, `dsl/funcs.go:470-487`).
    def onAllSeries(f: DataFrame => DataFrame): Impl =
      (ctx, args, _) => {
        require(args.nonEmpty, "expected a series argument")
        SeriesV(f(mergeSets(args.map(asSeries(ctx, _)))))
      }
    add(Seq("sumSeries", "sum"))(onAllSeries(df => O.sumSeries(df)))
    add(Seq("averageSeries", "avg"))(onAllSeries(df => O.averageSeries(df)))
    add(Seq("maxSeries", "max"))(onAllSeries(df => O.maxSeries(df)))
    add(Seq("minSeries", "min"))(onAllSeries(df => O.minSeries(df)))
    add(Seq("multiplySeries"))(onAllSeries(df => O.multiplySeries(df)))
    add(Seq("rangeOfSeries"))(onAllSeries(df => O.rangeOfSeries(df)))
    add(Seq("isNonNull"))(onSeries((_, df, _, _) => O.isNonNull(df)))
    add(Seq("countSeries"))(onAllSeries(df => O.countSeries(df)))
    // diffSeries: explicit args subtract in ARGUMENT order; a single
    // merged set falls back to name order (= the reference's sorted-map
    // iteration for one pattern)
    add(Seq("diffSeries")) { (ctx, args, _) =>
      if (args.size >= 2)
        SeriesV(O.diffSeriesOrdered(asSeries(ctx, args.head),
          mergeSets(args.tail.map(asSeries(ctx, _)))))
      else SeriesV(O.diffSeries(asSeries(ctx, args.head)))
    }
    add(Seq("percentileOfSeries"))(onSeries((_, df, rest, _) =>
      O.percentileOfSeries(df, num(rest.head) / 100)))
    // group: every arg is a series (quoted or not) — var-arg merge
    add(Seq("group")) { (ctx, args, _) =>
      require(args.nonEmpty, "group() needs arguments")
      SeriesV(mergeSets(args.map(asSeries(ctx, _))))
    }
    add(Seq("divideSeries")) { (ctx, args, _) =>
      require(args.size == 2, "divideSeries(num, den)")
      SeriesV(O.divideSeries(asSeries(ctx, args(0)), asSeries(ctx, args(1))))
    }
    // pairwise list combines (graphite-web; extensions): position =
    // name-sorted rank per side, loud on length mismatch
    Seq("divideSeriesLists" -> "divideSeries",
      "diffSeriesLists" -> "diffSeries",
      "sumSeriesLists" -> "sumSeries",
      "multiplySeriesLists" -> "multiplySeries").foreach { case (nm, op) =>
      add(Seq(nm)) { (ctx, args, _) =>
        require(args.size == 2, s"$nm(listA, listB)")
        SeriesV(O.pairwiseSeriesLists(asSeries(ctx, args(0)),
          asSeries(ctx, args(1)), op))
      }
    }
    // aggregateSeriesLists(listA, listB, func) — the generic-cf
    // pairwise combine (graphite-web 1.1; extension): graphite's SAFE
    // aggregator semantics over the name-rank pairing — see
    // SeriesOps.aggregateSeriesLists for the per-member table
    add(Seq("aggregateSeriesLists")) { (ctx, args, _) =>
      // exactly 3: graphite's 4th positional (xFilesFactor) is not
      // implemented — reject loudly rather than silently dropping it
      // (the file's convention; cf. cactiStyle's `system` arg)
      require(args.size == 3,
        "aggregateSeriesLists(listA, listB, func) — xFilesFactor not supported")
      SeriesV(O.aggregateSeriesLists(asSeries(ctx, args(0)),
        asSeries(ctx, args(1)), str(args(2)) match {
          case "average" => "avg"; case f => f
        }))
    }
    // powSeries — per-timestamp power fold in name order (graphite-web;
    // extension): any unknown member poisons the slot, like multiply
    add(Seq("powSeries"))(onAllSeries(df => O.powSeriesList(df)))
    // applyByNode(series, nodeNum, template[, newName]) — evaluate the
    // template once per distinct (nodeNum+1)-node prefix with '%'
    // substituted (graphite-web; extension). The prefix list is a
    // driver-side DISTINCT over the fetched names — catalog-bounded,
    // exactly what graphite itself expands.
    add(Seq("applyByNode")) { (ctx, args, kw) =>
      val series = asSeries(ctx, args.head)
      val nodeNum = num(args(1)).toInt
      val template = str(args(2))
      val newName = args.lift(3).map(str).orElse(kw.get("newName").map(str))
      val s2 = ctx.spark
      import s2.implicits._
      val prefixes = series.select(
          array_join(slice(split(col("name"), "\\."), 1, nodeNum + 1), ".")
            .as("p"))
        .distinct().as[String].collect().sorted
      require(prefixes.nonEmpty, "applyByNode: no series matched")
      // plan size grows with the prefix count (one union arm each);
      // bound it loudly rather than let a runaway glob build a
      // 100k-arm plan that stalls Catalyst analysis
      require(prefixes.length <= EvalLimits.maxPlanFanout,
        s"applyByNode: ${prefixes.length} distinct prefixes exceeds " +
          s"the ${EvalLimits.maxPlanFanout}-arm plan bound " +
          "(GRAFT_DSL_MAX_FANOUT)")
      val parts = prefixes.map { p =>
        val df = evalExpr(ctx, template.replace("%", p))
        newName.fold(df)(nn =>
          df.withColumn("name", lit(nn.replace("%", p))))
      }
      SeriesV(parts.reduce(_.unionByName(_)))
    }
    add(Seq("asPercent")) { (ctx, args, _) =>
      val series = asSeries(ctx, args.head)
      args.drop(1).headOption match {
        case Some(NumV(x))     => SeriesV(O.asPercent(series, Some(x)))
        case Some(sv: SeriesV) => SeriesV(O.asPercent(series, None, Some(sv.df)))
        case Some(StrV(p))     => SeriesV(O.asPercent(series, None, Some(ctx.fetch(p))))
        case Some(PatternV(p)) => SeriesV(O.asPercent(series, None, Some(ctx.fetch(p))))
        case None              => SeriesV(O.asPercent(series))
      }
    }
    add(Seq("weightedAverage")) { (ctx, args, _) =>
      SeriesV(O.weightedAverage(asSeries(ctx, args(0)),
        asSeries(ctx, args(1)), num(args(2)).toInt))
    }

    // ----- per-point scalar transforms -----
    add(Seq("scale"))(onSeries((_, df, rest, _) => O.scale(df, num(rest.head))))
    add(Seq("absolute"))(onSeries((_, df, _, _) => O.absolute(df)))
    add(Seq("offset"))(onSeries((_, df, rest, _) => O.offset(df, num(rest.head))))
    add(Seq("offsetToZero"))(onSeries((_, df, _, _) => O.offsetToZero(df)))
    add(Seq("logarithm", "log"))(onSeries((_, df, rest, kw) =>
      O.logarithm(df, (rest.headOption orElse kw.get("base")).map(num).getOrElse(10.0))))
    add(Seq("transformNull"))(onSeries((_, df, rest, kw) =>
      O.transformNull(df, (rest.headOption orElse kw.get("default")).map(num).getOrElse(0.0))))
    add(Seq("scaleToSeconds"))(onSeries((_, df, rest, _) =>
      O.scaleToSeconds(df, num(rest.head))))
    add(Seq("hitcount"))(onSeries((_, df, rest, _) =>
      O.hitcount(df, durSec(rest.head))))
    add(Seq("timeShift"))(onSeries((_, df, rest, _) =>
      O.timeShift(df, durSec(rest.head))))
    add(Seq("removeAboveValue"))(onSeries((_, df, rest, _) =>
      O.removeAboveValue(df, num(rest.head))))
    add(Seq("removeBelowValue"))(onSeries((_, df, rest, _) =>
      O.removeBelowValue(df, num(rest.head))))
    add(Seq("removeAbovePercentile"))(onSeries((_, df, rest, _) =>
      O.removeAbovePercentile(df, num(rest.head) / 100)))
    // graphite-web's percentile-BAND filters (extensions): series-level
    // band on the averages / per-slot band on the values — see
    // SeriesOps for the n<50 mirror and reference-Quantile house rule
    add(Seq("averageOutsidePercentile"))(onSeries((_, df, rest, _) =>
      O.averageOutsidePercentile(df, num(rest.head))))
    add(Seq("removeBetweenPercentile"))(onSeries((_, df, rest, _) =>
      O.removeBetweenPercentile(df, num(rest.head))))
    add(Seq("removeBelowPercentile"))(onSeries((_, df, rest, _) =>
      O.removeBelowPercentile(df, num(rest.head) / 100)))
    add(Seq("nPercentile"))(onSeries((_, df, rest, _) =>
      O.nPercentile(df, num(rest.head) / 100)))
    add(Seq("keepLastValue"))(onSeries((_, df, rest, _) =>
      O.keepLastValue(df, rest.headOption.map(num(_).toInt).getOrElse(0))))
    add(Seq("changed"))(onSeries((_, df, _, _) => O.changed(df)))
    add(Seq("derivative"))(onSeries((_, df, _, _) => O.derivative(df)))
    add(Seq("nonNegativeDerivative"))(onSeries((_, df, rest, kw) =>
      O.nonNegativeDerivative(df,
        (rest.headOption orElse kw.get("maxValue")).map(num))))
    add(Seq("integral"))(onSeries((_, df, _, _) => O.integral(df)))
    add(Seq("summarize"))(onSeries((_, df, rest, _) =>
      O.summarize(df, durSec(rest.head),
        rest.drop(1).headOption.map(str).getOrElse("avg") match {
          case "average" => "avg"; case cf => cf
        })))
    // the reference's consolidateBy is self-describedly "fake"
    // (`dsl/funcs.go:2255-2286`): for cf=sum it scales every value by
    // seconds-per-point (span / maxPoints) — emulating how a
    // sum-consolidated graphite render reads — and is a no-op for any
    // other cf. Mirrored literally here; the HONEST re-bucketing
    // consolidation lives in `SeriesOps.consolidateBy` / `summarize`
    // (ts_consolidate_by_* queries), per the SURVEY directive.
    // guard the unbounded-viewport sentinel (fromSec == toSec): a
    // zero span would zero the whole series instead of scaling it.
    // cumulative(series) (graphite-web; extension) IS
    // consolidateBy(series, 'sum') — one handler, cf defaulting to sum
    add(Seq("consolidateBy", "cumulative"))(onSeries((ctx, df, rest, _) => {
      val factor =
        if (rest.headOption.map(str).getOrElse("sum") == "sum" &&
            ctx.maxPoints > 0 && ctx.toSec > ctx.fromSec)
          (ctx.toSec - ctx.fromSec).toDouble / ctx.maxPoints
        else 1.0
      df.withColumn("value", col("value") * factor)
    }))

    // ----- moving window -----
    // window arg: point count, or a duration string → the REFERENCE'S
    // formula `int(dur/(GroupBy()+1)) + 1` (`dsl/funcs.go:1658`, its
    // "+1 to avoid div by 0") — deliberately mirrored including the
    // off-by-one it introduces for fine steps; do not "fix" the +1
    def windowPoints(ctx: Ctx, v: Val): Int = v match {
      case NumV(n) => n.toInt
      case StrV(s) => (Durations.parseSeconds(s) / (ctx.stepSec + 1) + 1).toInt
      case PatternV(s) => (Durations.parseSeconds(s) / (ctx.stepSec + 1) + 1).toInt
      case other   => throw new IllegalArgumentException(s"bad window: $other")
    }
    add(Seq("movingAverage"))(onSeries((ctx, df, rest, _) =>
      O.movingAverage(df, windowPoints(ctx, rest.head))))
    add(Seq("movingMedian"))(onSeries((ctx, df, rest, _) =>
      O.movingMedian(df, windowPoints(ctx, rest.head))))
    add(Seq("stdev"))(onSeries((ctx, df, rest, _) =>
      O.stdev(df, windowPoints(ctx, rest.head))))
    // graphite-web's remaining trailing-window members (extensions)
    add(Seq("movingSum"))(onSeries((ctx, df, rest, _) =>
      O.movingSum(df, windowPoints(ctx, rest.head))))
    add(Seq("movingMin"))(onSeries((ctx, df, rest, _) =>
      O.movingMin(df, windowPoints(ctx, rest.head))))
    add(Seq("movingMax"))(onSeries((ctx, df, rest, _) =>
      O.movingMax(df, windowPoints(ctx, rest.head))))
    // generic dispatcher over the family (graphite-web; extension)
    add(Seq("movingWindow"))(onSeries((ctx, df, rest, _) => {
      val w = windowPoints(ctx, rest.head)
      rest.lift(1).map(str).getOrElse("average") match {
        case "average" | "avg" => O.movingAverage(df, w)
        case "sum" | "total"   => O.movingSum(df, w)
        case "min"             => O.movingMin(df, w)
        case "max"             => O.movingMax(df, w)
        case "median"          => O.movingMedian(df, w)
        case other => throw new IllegalArgumentException(
          s"movingWindow: unknown aggregator '$other'")
      }
    }))
    // per-interval reset integral (graphite-web; extension)
    add(Seq("integralByInterval"))(onSeries((_, df, rest, _) =>
      O.integralByInterval(df, durSec(rest.head))))

    // ----- series-set filters / top-k -----
    add(Seq("highestCurrent"))(onSeries((_, df, rest, _) =>
      O.highestCurrent(df, num(rest.head).toInt)))
    add(Seq("highestAverage"))(onSeries((_, df, rest, _) =>
      O.highestAverage(df, num(rest.head).toInt)))
    add(Seq("highestMax"))(onSeries((_, df, rest, _) =>
      O.highestMax(df, num(rest.head).toInt)))
    add(Seq("lowestAverage"))(onSeries((_, df, rest, _) =>
      O.lowestAverage(df, num(rest.head).toInt)))
    add(Seq("lowestCurrent"))(onSeries((_, df, rest, _) =>
      O.lowestCurrent(df, num(rest.head).toInt)))
    add(Seq("mostDeviant"))(onSeries((_, df, rest, _) =>
      O.mostDeviant(df, num(rest.head).toInt)))
    add(Seq("maximumAbove"))(onSeries((_, df, rest, _) =>
      O.maximumAbove(df, num(rest.head))))
    add(Seq("maximumBelow"))(onSeries((_, df, rest, _) =>
      O.maximumBelow(df, num(rest.head))))
    add(Seq("minimumAbove"))(onSeries((_, df, rest, _) =>
      O.minimumAbove(df, num(rest.head))))
    add(Seq("minimumBelow"))(onSeries((_, df, rest, _) =>
      O.minimumBelow(df, num(rest.head))))
    add(Seq("useSeriesAbove"))(onSeries((_, df, rest, _) =>
      O.useSeriesAbove(df, num(rest(0)), str(rest(1)), str(rest(2)))))
    add(Seq("limit"))(onSeries((_, df, rest, _) =>
      O.limitSeries(df, num(rest.head).toInt)))
    add(Seq("exclude"))(onSeries((_, df, rest, _) =>
      O.exclude(df, str(rest.head))))
    // graphite-web's averageAbove/Below — the summary-filter family's
    // members the reference lacks (extension; see SeriesOps scaladoc)
    add(Seq("averageAbove"))(onSeries((_, df, rest, _) =>
      O.averageAbove(df, num(rest.head))))
    add(Seq("averageBelow"))(onSeries((_, df, rest, _) =>
      O.averageBelow(df, num(rest.head))))
    // graphite-web's perSecond — counter rate (extension; the
    // reference's values are already rates, dsl/funcs.go:279)
    add(Seq("perSecond"))(onSeries((_, df, rest, kw) =>
      O.perSecond(df, (rest.headOption orElse kw.get("maxValue")).map(num))))
    // graphite-web's sortBy* dashboard ordering (extension): attaches
    // the __ord render-order channel Render honors
    // generic sortBy(func='average', reverse=false): bare true/false
    // tokens arrive as patterns — string-compare them
    add(Seq("sortBy"))(onSeries((_, df, rest, _) =>
      O.sortBy(df, rest.headOption.map(str).getOrElse("average"),
        rest.lift(1).map(str).exists(_.equalsIgnoreCase("true")))))
    add(Seq("sortByMaxima"))(onSeries((_, df, _, _) => O.sortByMaxima(df)))
    add(Seq("sortByMinima"))(onSeries((_, df, _, _) => O.sortByMinima(df)))
    add(Seq("sortByTotal"))(onSeries((_, df, _, _) => O.sortByTotal(df)))
    add(Seq("sortByName"))(onSeries((_, df, _, _) => O.sortByName(df)))
    // graphite-web's currentAbove/Below — the summary-filter family on
    // the last known value (extension)
    add(Seq("currentAbove"))(onSeries((_, df, rest, _) =>
      O.currentAbove(df, num(rest.head))))
    add(Seq("currentBelow"))(onSeries((_, df, rest, _) =>
      O.currentBelow(df, num(rest.head))))
    // graphite-web's removeEmptySeries (extension): drop all-unknown
    // series; optional xFilesFactor raises the known-fraction bar, and
    // with no explicit bar an upstream setXFilesFactor channel is the
    // default (graphite 1.1's series.xFilesFactor chain)
    add(Seq("removeEmptySeries"))(onSeries((_, df, rest, _) =>
      rest.headOption.map(x => O.removeEmptySeries(df, num(x)))
        .getOrElse(O.removeEmptySeriesDefault(df))))
    // graphite-web 1.1's setXFilesFactor/xFilesFactor — identity on
    // the data, attaches the __xff channel removeEmptySeries defaults
    // to (extension; see SeriesOps.setXFilesFactor)
    add(Seq("setXFilesFactor", "xFilesFactor"))(onSeries((_, df, rest, _) =>
      O.setXFilesFactor(df, num(rest.head))))
    // graphite-web 1.1's generic top/bottom-n and summary filter —
    // the generic spellings of the highest*/lowest*/…Above families
    add(Seq("highest"))(onSeries((_, df, rest, kw) =>
      O.highest(df,
        (rest.headOption orElse kw.get("n")).map(num(_).toInt).getOrElse(1),
        (rest.lift(1) orElse kw.get("func")).map(str).getOrElse("average"))))
    add(Seq("lowest"))(onSeries((_, df, rest, kw) =>
      O.lowest(df,
        (rest.headOption orElse kw.get("n")).map(num(_).toInt).getOrElse(1),
        (rest.lift(1) orElse kw.get("func")).map(str).getOrElse("average"))))
    add(Seq("filterSeries"))(onSeries((_, df, rest, _) =>
      O.filterSeries(df, str(rest(0)), str(rest(1)), num(rest(2)))))
    // graphite-web's grep — exclude's keep-side dual (extension)
    add(Seq("grep"))(onSeries((_, df, rest, _) =>
      O.grep(df, str(rest.head))))
    // graphite-web's substr — name-node slice, negative indices count
    // from the end, stop=0 = "to the end" (extension)
    add(Seq("substr"))(onSeries((_, df, rest, _) =>
      O.substrName(df, rest.headOption.map(num(_).toInt).getOrElse(0),
        rest.drop(1).headOption.map(num(_).toInt).getOrElse(0))))
    // graphite-web's fallbackSeries — the fallback set when the
    // primary pattern matched nothing (extension)
    add(Seq("fallbackSeries")) { (ctx, args, _) =>
      require(args.size == 2, "fallbackSeries(seriesList, fallback)")
      SeriesV(O.fallbackSeries(asSeries(ctx, args(0)), asSeries(ctx, args(1))))
    }
    // graphite-web's interpolate — linear interior gap fill, optional
    // run-length limit (extension)
    add(Seq("interpolate"))(onSeries((_, df, rest, _) =>
      O.interpolate(df, rest.headOption.map(num(_).toInt))))
    // graphite-web's smartSummarize — re-bucket anchored at the
    // query's from-time instead of the epoch (extension); default cf
    // is sum, like graphite's
    add(Seq("smartSummarize"))(onSeries((ctx, df, rest, _) =>
      O.smartSummarize(df, durSec(rest.head),
        rest.drop(1).headOption.map(str).getOrElse("sum") match {
          case "average" => "avg"; case cf => cf
        }, ctx.fromSec)))
    // graphite-web 1.1's GENERIC combine — aggregate(series, 'func')
    // subsumes the xxxSeries family; output series is named
    // 'aggregate' (extension; dispatch documented per member)
    add(Seq("aggregate"))(onSeries((_, df, rest, _) => {
      val out = "aggregate"
      str(rest.head) match {
        case "sum" | "total"     => O.sumSeries(df, out)
        case "avg" | "average"   => O.averageSeries(df, out)
        case "max"               => O.maxSeries(df, out)
        case "min"               => O.minSeries(df, out)
        case "multiply"          => O.multiplySeries(df, out)
        case "range" | "rangeOf" => O.rangeOfSeries(df, out)
        case "diff"              => O.diffSeries(df, out)
        case "count"             => O.countSeries(df, out)
        case "median"            => O.percentileOfSeries(df, 0.5, out)
        case "stddev"            => O.stddevSeries(df, out)
        case "last" | "current"  => O.lastSeries(df, out)
        case other => throw new IllegalArgumentException(
          s"aggregate: unknown function '$other'")
      }
    }))
    add(Seq("stddevSeries"))(onSeries((_, df, _, _) => O.stddevSeries(df)))
    // graphite-web per-point transforms (extensions)
    add(Seq("invert"))(onSeries((_, df, _, _) => O.invert(df)))
    // sigmoid/logit/exp (graphite-web; extensions) — `exp` is not
    // correctly-rounded cross-engine, so the trio is vector-pinned
    // like pow, not hash-oracled
    add(Seq("sigmoid"))(onSeries((_, df, _, _) => O.sigmoidSeries(df)))
    add(Seq("logit"))(onSeries((_, df, _, _) => O.logitSeries(df)))
    add(Seq("exp"))(onSeries((_, df, _, _) => O.expSeries(df)))
    // round(precision=0) — python-3 half-to-even (bround); vector-pinned
    add(Seq("round"))(onSeries((_, df, rest, _) =>
      O.roundSeries(df, rest.headOption.map(num(_).toInt).getOrElse(0))))
    // add(series, constant) — graphite 1.1's spelling of offset
    add(Seq("add"))(onSeries((_, df, rest, _) => O.offset(df, num(rest.head))))
    // name surgery (graphite-web; extensions)
    add(Seq("toLowerCase"))(onSeries((_, df, _, _) =>
      df.withColumn("name", lower(col("name")))))
    add(Seq("toUpperCase"))(onSeries((_, df, _, _) =>
      df.withColumn("name", upper(col("name")))))
    // unique(): collapse exact duplicate series rows (overlapping
    // globs union the same series twice; graphite keeps the first —
    // identical rows here, so distinct is the relational spelling)
    add(Seq("unique"))(onSeries((_, df, _, _) => df.distinct()))
    add(Seq("pow"))(onSeries((_, df, rest, _) =>
      O.powSeries(df, num(rest.head))))
    add(Seq("squareRoot"))(onSeries((_, df, _, _) => O.squareRoot(df)))
    add(Seq("minMax"))(onSeries((_, df, _, _) => O.minMax(df)))
    add(Seq("delay"))(onSeries((_, df, rest, _) =>
      O.delay(df, num(rest.head).toInt)))
    // timeSlice(series, startEpochSec, endEpochSec) — absolute epoch
    // bounds (documented; graphite's relative-time strings resolve at
    // its HTTP layer, which this engine's Viewport already covers)
    add(Seq("timeSlice"))(onSeries((_, df, rest, _) =>
      O.timeSlice(df, num(rest(0)).toLong, num(rest(1)).toLong)))
    // render hints with no data semantics — no-ops like color()
    // (drawAsInfinite/dashed/alpha/lineWidth are line-style hints;
    // areaBetween marks its exactly-two input series for filled
    // rendering — data unchanged in graphite too; graphite-web)
    add(Seq("stacked", "secondYAxis", "drawAsInfinite", "dashed",
      "alpha", "lineWidth", "areaBetween"))(
      onSeries((_, df, _, _) => df))
    // mapSeries/reduceSeries — graphite's map/reduce pair (extension).
    // mapSeries' list-of-lists grouping is RE-DERIVED by reduceSeries
    // from the name prefix nodes[0:reduceNode] (exactly graphite's
    // reduceSeriesName key), so the map step is the identity on the
    // relational frame; a standalone mapSeries renders flattened,
    // which is graphite's behavior too.
    add(Seq("mapSeries", "map"))(onSeries((_, df, _, _) => df))
    add(Seq("reduceSeries", "reduce"))(onSeries((_, df, rest, _) =>
      O.reduceSeries(df, str(rest(0)), num(rest(1)).toInt,
        rest.drop(2).map(str))))
    // cactiStyle/legendValue — legend-in-the-name functions
    // (graphite-web; extensions): per-series summaries printed into
    // the name by the cross-engine %.2f-of-bround rule (SeriesOps)
    // graphite's signature is cactiStyle(series, system=None,
    // units=None): the POSITIONAL second arg is the unit SYSTEM
    // ('si'/'binary'), which is unsupported — loud, not misread
    add(Seq("cactiStyle"))(onSeries((_, df, rest, kw) => {
      require(rest.isEmpty,
        "cactiStyle: si/binary unit systems unsupported — " +
          "use cactiStyle(series, units='…')")
      O.cactiStyle(df, kw.get("units").map(str))
    }))
    add(Seq("legendValue"))(onSeries((_, df, rest, _) =>
      O.legendValue(df, rest.map(str))))

    // ----- aliasing -----
    add(Seq("alias"))(onSeries((_, df, rest, _) => O.aliasAll(df, str(rest.head))))
    add(Seq("aliasByMetric"))(onSeries((_, df, _, _) => O.aliasByMetric(df)))
    add(Seq("aliasByNode"))(onSeries((_, df, rest, _) =>
      O.aliasByNode(df, rest.map(num(_).toInt))))
    add(Seq("aliasSub"))(onSeries((_, df, rest, _) =>
      O.aliasSub(df, str(rest(0)),
        // Graphite replacement groups are \1..\9; Java wants $1
        str(rest(1)).replaceAll("""\\(\d)""", """\$$1"""))))
    add(Seq("color"))(onSeries((_, df, _, _) => df)) // no-op, dsl/funcs.go:939-943

    // ----- name-node combines -----
    add(Seq("sumSeriesWithWildcards"))(onSeries((_, df, rest, _) =>
      O.seriesWithWildcards(df, rest.map(num(_).toInt), "sum")))
    add(Seq("averageSeriesWithWildcards"))(onSeries((_, df, rest, _) =>
      O.seriesWithWildcards(df, rest.map(num(_).toInt), "avg")))
    // the multiply member (graphite-web; extension): safeMul semantics
    // — any unknown member ⇒ unknown slot — via the generic wildcard
    // collapse's 'multiply' aggregator, NOT the older gap-as-zero pair
    add(Seq("multiplySeriesWithWildcards"))(onSeries((_, df, rest, _) =>
      O.aggregateWithWildcards(df, "multiply", rest.map(num(_).toInt))))
    add(Seq("groupByNode"))(onSeries((_, df, rest, _) =>
      O.groupByNode(df, num(rest(0)).toInt, str(rest(1)) match {
        case "average" => "avg"; case cf => cf
      })))
    // multi-node generalization (graphite-web's groupByNodes:
    // callback FIRST, then the node list — extension)
    add(Seq("groupByNodes"))(onSeries((_, df, rest, _) =>
      O.groupByNodes(df, str(rest.head) match {
        case "average" => "avg"; case cf => cf
      }, rest.drop(1).map(num(_).toInt))))
    // generic-cf wildcard collapse (graphite-web's
    // aggregateWithWildcards: callback first, then positions)
    add(Seq("aggregateWithWildcards"))(onSeries((_, df, rest, _) =>
      O.aggregateWithWildcards(df, str(rest.head) match {
        case "average" => "avg"; case cf => cf
      }, rest.drop(1).map(num(_).toInt))))
    // tag twins of the node functions (graphite-web's tagged-path
    // pair; extension beyond the reference's DSL)
    add(Seq("aliasByTags"))(onSeries((_, df, rest, _) =>
      O.aliasByTags(df, rest.map(str))))
    add(Seq("groupByTags"))(onSeries((_, df, rest, _) =>
      O.groupByTags(df, str(rest(0)) match {
        case "average" => "avg"; case cf => cf
      }, rest.drop(1).map(str))))
    // visual downsampling (extension beyond both the reference and
    // graphite-web): lttb(series, threshold) keeps ≤ threshold REAL
    // points per series, spike-preserving where maxDataPoints
    // consolidation averages — see [[graft.ts.Lttb]]
    add(Seq("lttb"))(onSeries((_, df, rest, _) =>
      graft.ts.Lttb.lttb(df, num(rest.head).toInt)))
    // least-squares trend line (graphite-web's linearRegression;
    // extension beyond the reference) — exact-statistics fit,
    // see [[graft.ts.SeriesOps.linearRegression]]
    add(Seq("linearRegression"))(onSeries((_, df, _, _) =>
      O.linearRegression(df)))
    // EMA (graphite-web's exponentialMovingAverage; extension) —
    // first-observation seed, see SeriesOps scaladoc
    add(Seq("exponentialMovingAverage"))(onSeries((_, df, rest, _) =>
      O.exponentialMovingAverage(df, num(rest.head).toInt)))

    // ----- forecasting (dsl/funcs.go:2395-2622) -----
    // seasonLimit is accepted-and-unused here: the ctx store is already
    // the full viewport (no archive re-fetch layer to widen). Forecast
    // length derives from ctx.toSec when it extends past the data.
    def hw(show: String, devScaleDefault: Double): Impl =
      onSeries { (ctx, df, rest, kw) =>
        def arg(i: Int, name: String, dflt: Double): Double =
          rest.drop(i).headOption.orElse(kw.get(name)).map(num).getOrElse(dflt)
        val slenSec = rest.headOption.orElse(kw.get("seasonLen")).map(durSec)
          .getOrElse(Durations.parseSeconds("1d"))
        val a = arg(2, "alpha", 0.0)
        val bb = arg(3, "beta", 0.0)
        val g = arg(4, "gamma", 0.0)
        val abg = if (a == 0 && bb == 0 && g == 0) None else Some((a, bb, g))
        graft.ts.HwOps.holtWintersForecast(ctx.spark, df,
          (slenSec / ctx.stepSec).toInt, 0, abg,
          arg(5, "devScale", devScaleDefault),
          rest.drop(6).headOption.orElse(kw.get("show")).map(str).getOrElse(show),
          ctx.stepSec,
          // per-series forecast extension to the viewport end — the
          // reference's nPreds = (to − Latest()) / GroupBy()
          predUntilSec = Some(ctx.toSec))
      }
    b += "holtWintersForecast" -> hw("smooth", 10.0)
    b += "holtWintersConfidenceBands" -> (
      (ctx, args, kw) => hw("conf", 3.0)(ctx, args.take(1),
        kw ++ args.drop(1).headOption.map("devScale" -> _)))
    b += "holtWintersAberration" -> (
      (ctx, args, kw) => hw("aberr", 3.0)(ctx, args.take(1),
        kw ++ args.drop(1).headOption.map("devScale" -> _)))
    // graphite-web's area variant draws the same two band series with
    // a fill style — a render hint; the data is the bands (extension)
    b += "holtWintersConfidenceArea" -> (
      (ctx, args, kw) => hw("conf", 3.0)(ctx, args.take(1),
        kw ++ args.drop(1).headOption.map("devScale" -> _)))

    // ----- tagged-series selector (graphite 1.1 `seriesByTag`) -----
    // seriesByTag('k=v', 'k=~re', 'k!=v', 'k!=~re'): conjunctive tag
    // predicates over idents DERIVED from the stored canonical names
    // ([[graft.streaming.Find.identFromName]]) — the graphite tag
    // API's selector, wired into the render path so a Grafana target
    // can select tagged series directly. Semantics per graphite-web:
    // `=` exact (empty value matches series WITHOUT the tag), `=~`
    // regex anchored at the start and requires the tag present, and
    // the two negations are their exact complements (so `!=~` matches
    // tag-less series). Extension: the reference has no tagged render
    // selector; its idents never reach the DSL (`serde/serde.go:95`).
    add(Seq("seriesByTag")) { (ctx, args, _) =>
      require(args.nonEmpty, "seriesByTag needs at least one expression")
      SeriesV(ctx.fetchWhere(graft.streaming.Find.tagExprCond(
        args.map(str),
        graft.streaming.Find.identFromName(col("name")))))
    }

    // ----- generators (need ctx from/to) -----
    add(Seq("constantLine")) { (ctx, args, _) =>
      SeriesV(O.constantLine(ctx.spark, num(args.head), ctx.fromSec, ctx.toSec))
    }
    add(Seq("sinusoid")) { (ctx, _, _) =>
      // maxPoints-long sine over the ctx range (`dsl/funcs.go:1152-1178`)
      val n = math.max(ctx.maxPoints, 2)
      val step = math.max((ctx.toSec - ctx.fromSec) / (n - 1), 1L)
      SeriesV(ctx.spark.range(n).select(
        lit("sinusoid").as("name"),
        (lit(ctx.fromSec) + col("id") * step).as("t"),
        sin(col("id").cast("double") * (2.0 * math.Pi / 10.0)).as("value")))
    }
    // events(*tags) — graphite-web's annotations-as-a-series function
    // (extension; the reference's events surface is a permanent []):
    // count of stored events per step slot within the viewport, tag
    // args as a subset match (every requested tag present — the
    // find_events rule). Graphite emits 1-valued points on a 1-second
    // grid; this engine consolidates to its step grid (documented —
    // the same slot convention as every stored series), with absent
    // slots simply absent (the sparse-store convention). The events
    // frame is daemon-provided annotation data (human-scale), so the
    // aggregate is trivially bounded.
    add(Seq("events")) { (ctx, args, _) =>
      val tags = args.map(str)
      val name = "events(" + tags.mkString(", ") + ")"
      val base = ctx.events.getOrElse {
        val s2 = ctx.spark
        import s2.implicits._
        Seq.empty[(Long, Seq[String])].toDF("when", "tags")
      }
      val tagged = tags.foldLeft(base)((df, t) =>
        df.filter(array_contains(col("tags"), t)))
      val windowed =
        if (ctx.fromSec < ctx.toSec)
          tagged.filter(col("when") >= ctx.fromSec &&
            col("when") <= ctx.toSec)
        else tagged
      SeriesV(windowed
        .groupBy((floor(col("when").cast("double") / ctx.stepSec)
          .cast("long") * ctx.stepSec).as("t"))
        .agg(count(lit(1)).cast("double").as("value"))
        .select(lit(name).as("name"), col("t"), col("value")))
    }
    // sinFunction/sin (graphite-web; extension): amplitude · sin(t
    // epoch-seconds) on a `step` grid from the viewport start,
    // end-exclusive like graphite's while-loop (`functions.py
    // sinFunction`). sin's cross-engine ulp is absorbed by the
    // oracle's round-6 (|sin| ≤ 1), like the sinusoid generator.
    add(Seq("sinFunction", "sin")) { (ctx, args, kw) =>
      val nm = str(args.head)
      val amp = args.lift(1).orElse(kw.get("amplitude")).map(num).getOrElse(1.0)
      val step = args.lift(2).orElse(kw.get("step")).map(num(_).toLong)
        .filter(_ > 0).getOrElse(60L)
      // end-exclusive ceil like graphite's while-loop — a viewport
      // shorter than one step emits exactly one point, never a point
      // past `until`; the floor of 1 covers only the from == to
      // unbounded-sentinel test contexts
      val n = math.max((ctx.toSec - ctx.fromSec + step - 1) / step, 1L)
      val t = lit(ctx.fromSec) + col("id") * step
      SeriesV(ctx.spark.range(n).select(
        lit(nm).as("name"), t.as("t"),
        (sin(t.cast("double")) * amp).as("value")))
    }
    // randomWalk/randomWalkFunction (graphite-web; extension —
    // DETERMINISTIC variant, documented divergence: graphite seeds
    // python's global RNG, so any reproducible engine must fix the
    // generator). uᵢ = LCG(i)/2³¹ − 0.5 with glibc's (1103515245·i +
    // 12345) mod 2³¹; valueᵢ = Σ_{j<i} uⱼ (graphite appends BEFORE
    // stepping, so point 0 is 0). Integer LCG and the power-of-two
    // divide are exact in ieee-754, and both engines cumulative-sum in
    // ascending t — bit-identical cross-engine, hence hash-oracled.
    // The rank window is over the GENERATOR frame (viewport/step rows,
    // the sinusoid class) — never over stored data.
    add(Seq("randomWalk", "randomWalkFunction")) { (ctx, args, kw) =>
      val nm = str(args.head)
      val step = args.lift(1).orElse(kw.get("step")).map(num(_).toLong)
        .filter(_ > 0).getOrElse(60L)
      // end-exclusive ceil, floor 1 — the sinFunction contract above
      val n = math.max((ctx.toSec - ctx.fromSec + step - 1) / step, 1L)
      val u = ((lit(1103515245L) * col("id") + lit(12345L)) %
        lit(2147483648L)).cast("double") / 2147483648.0 - 0.5
      val wSeq = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      SeriesV(ctx.spark.range(n).select(
        lit(nm).as("name"),
        (lit(ctx.fromSec) + col("id") * step).as("t"),
        coalesce(sum(u).over(wSeq), lit(0.0)).as("value")))
    }
    // aliasQuery(series, search, replace, newName) — graphite-web
    // 1.1.4 (extension): per input series, regex-rewrite its name into
    // a NEW target expression, evaluate it, take the last known value
    // of its first series (name order, latest t), and print it into
    // newName's one %-format slot (%d truncates toward zero like
    // python's int-format of a float; %.Nf fixed; %s prints the
    // %.6f-trimmed form). Where graphite loops evaluateTarget
    // per-series, here the rewritten queries are ONE unioned plan with
    // a per-source window — a single Spark action however many series
    // match; raises when a query matches nothing or its last value is
    // unknown, as graphite does.
    add(Seq("aliasQuery")) { (ctx, args, _) =>
      require(args.size == 4, "aliasQuery(series, search, replace, newName)")
      val series = asSeries(ctx, args.head)
      val search = str(args(1))
      val replace = str(args(2)).replaceAll("""\\(\d)""", """\$$1""")
      val newName = str(args(3))
      def fmt(pattern: String, value: Double): String = {
        val m = java.util.regex.Pattern.compile("%(\\.\\d+)?[dfs]")
          .matcher(pattern)
        require(m.find(), s"aliasQuery: newName has no %-slot: $pattern")
        val slot = m.group()
        val printed =
          if (slot == "%d") value.toLong.toString
          else if (slot == "%s")
            String.format(java.util.Locale.ROOT, "%.6f", Double.box(value))
              .reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
          else String.format(java.util.Locale.ROOT, slot, Double.box(value))
        pattern.substring(0, m.start) + printed + pattern.substring(m.end)
      }
      val s2 = ctx.spark
      import s2.implicits._
      val names = series.select(col("name")).distinct()
        .as[String].collect().sorted
      require(names.nonEmpty, "aliasQuery: no series matched")
      require(names.length <= EvalLimits.maxPlanFanout,
        s"aliasQuery: ${names.length} matched series exceeds the " +
          s"${EvalLimits.maxPlanFanout}-arm plan bound (GRAFT_DSL_MAX_FANOUT)")
      // ONE unioned plan + ONE action regardless of series count:
      // each rewritten query's frame is tagged with its source name,
      // and a per-tag window picks the first series (name asc) at its
      // latest known value — the exact row the old per-series
      // `limit(1)` action picked, minus the ~0.1 s-per-name driver
      // round-trip tax (500 matched series = 1 job, not 500).
      val tagged = names.toSeq.map { nm =>
        val q = nm.replaceAll(search, replace)
        evalExpr(ctx, q).select(lit(nm).as("__src"), col("name"),
          col("t"), col("value").cast("double").as("value"))
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__src")).orderBy(col("name").asc, col("t").desc)
      val picked = tagged.reduce(_.union(_))
        .filter(col("value").isNotNull)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("__src"), col("value")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val renames = names.toSeq.map { nm =>
        require(picked.contains(nm),
          s"aliasQuery: no data for query: ${nm.replaceAll(search, replace)}")
        (nm, fmt(newName, picked(nm)))
      }
      val mapDf = renames.toDF("name", "__nn")
      SeriesV(series.join(broadcast(mapDf), Seq("name"))
        .select(col("__nn").as("name"), col("t"), col("value")))
    }
    // threshold(value[, label[, color]]) — graphite-web: a constantLine
    // the dashboard names; color is a render hint, accepted and ignored
    add(Seq("threshold")) { (ctx, args, kw) =>
      val value = num(args.head)
      val label = args.lift(1).orElse(kw.get("label")).map(str)
      val base = O.constantLine(ctx.spark, value, ctx.fromSec, ctx.toSec)
      SeriesV(label.fold(base)(l => O.aliasAll(base, l)))
    }
    // verticalLine(ts[, label]) — graphite-web's render marker: a
    // two-point 1.0 series at [ts, ts+1], drawn infinite by the UI
    // (the flag is a no-op here like the other render hints). Graphite
    // raises when ts falls outside the viewport; mirrored, with the
    // unbounded sentinel (from == to) passing through
    add(Seq("verticalLine")) { (ctx, args, _) =>
      val ts = num(args.head).toLong
      val label = args.lift(1).map(str).getOrElse("verticalLine")
      require(ctx.fromSec == ctx.toSec ||
        (ts >= ctx.fromSec && ts <= ctx.toSec),
        s"verticalLine timestamp $ts outside the viewport " +
          s"[${ctx.fromSec}, ${ctx.toSec}]")
      import org.apache.spark.sql.functions.{lit => l}
      SeriesV(ctx.spark.range(2).select(
        l(label).as("name"),
        (l(ts) + col("id")).as("t"),
        l(1.0).as("value")))
    }
    // identity(name) / time(name[, step]) / timeFunction — graphite-
    // web: value(t) = t (epoch seconds). identity rides the sinusoid's
    // maxPoints grid; time with an explicit step uses that grid
    // (graphite's default 60 s grid is a maxPoints grid here — the
    // engine's generator convention, documented)
    add(Seq("identity", "time", "timeFunction")) { (ctx, args, _) =>
      val nm = str(args.head)
      val stepArg = args.lift(1).map(num(_).toLong).filter(_ > 0)
      val (n, step) = stepArg match {
        case Some(s) =>
          (math.max((ctx.toSec - ctx.fromSec) / s + 1, 1L), s)
        case None =>
          val n0 = math.max(ctx.maxPoints, 2).toLong
          (n0, math.max((ctx.toSec - ctx.fromSec) / (n0 - 1), 1L))
      }
      val t = lit(ctx.fromSec) + col("id") * step
      SeriesV(ctx.spark.range(n).select(
        lit(nm).as("name"), t.as("t"), t.cast("double").as("value")))
    }
    // aggregateLine(series[, cf]) — per-series constant line at the
    // series' summary value over the ctx viewport (graphite-web)
    add(Seq("aggregateLine"))(onSeries((ctx, df, rest, _) =>
      O.aggregateLine(df, rest.headOption.map(str).getOrElse("average"),
        ctx.fromSec, ctx.toSec)))
    add(Seq("timeStack")) { (ctx, args, _) =>
      // fetch the same pattern at N period-shifted windows
      // (`dsl/funcs.go:2326-2393`); one union branch per shift — the
      // scan is shared (same store), shifts differ only in the filter+map
      val pattern = args(0) match {
        case StrV(p) => p
        case PatternV(p) => p
        case other => throw new IllegalArgumentException(
          s"timeStack needs a quoted pattern, got $other")
      }
      val ispec = args(1) match {
        case StrV(x) => x; case PatternV(x) => x; case v => durSec(v).toString }
      val period = durSec(args(1))
      val begin = num(args(2)).toInt
      val endN = num(args(3)).toInt
      // reference semantics (`dsl/funcs.go:2366-2390`): copy i fetches
      // the window [to−(i+1)·p, to−i·p] and shifts it FORWARD by i·p so
      // past periods overlay the most recent one; names follow the
      // reference's "timeShift(%s, -%s, %d)" format
      require(ctx.toSec > 0, "timeStack needs a bounded viewport (to)")
      val to = ctx.toSec
      val unbounded = ctx.copy(fromSec = 0L, toSec = 0L)
      val shifts = (begin to endN).map { i =>
        unbounded.fetch(pattern)
          .filter(col("t") >= to - period * (i + 1) && col("t") <= to - period * i)
          .withColumn("t", col("t") + period * i)
          .withColumn("name", concat(lit("timeShift("), col("name"),
            lit(s", -$ispec, $i)")))
      }
      SeriesV(shifts.reduce(_.unionByName(_)))
    }

    b.result()
  }
}
