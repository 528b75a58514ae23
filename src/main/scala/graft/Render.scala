package graft

import org.apache.spark.sql.DataFrame

/** Graphite `/render` JSON formatting (`http/graphite.go:142-181`):
  * `[{"target": <name>, "datapoints": [[value|null, ts], ...]}, ...]`.
  *
  * This is the one place the engine collects: the HTTP boundary, where
  * the result is already ≤ series × maxPoints rows (the fetch path
  * re-bucketed upstream) — the same place the reference drives its
  * iterators into the response writer. */
object Render {

  /** Series order: by the sortBy* family's `__ord` channel when the
    * plan carries one (see `SeriesOps.sortSeries`), else by name. */
  def toGraphiteJson(df: DataFrame): String = {
    val rows =
      (if (df.columns.contains("__ord"))
        df.orderBy("__ord", "name", "t")
      else df.orderBy("name", "t"))
        .select("name", "t", "value")
        .collect()
    renderRows(rows.map(r => (r.getString(0), r)))
  }

  /** Shared series-run renderer: emits one response object per distinct
    * consecutive `key` (key = name, or (target ordinal, name)). */
  private def renderRows(rows: Array[(Any, org.apache.spark.sql.Row)]): String = {
    val sb = new StringBuilder("[")
    var curKey: Any = null
    var firstSeries = true
    var firstPoint = true
    def closeSeries(): Unit = if (curKey != null) sb.append("]}")
    rows.foreach { case (key, r) =>
      if (key != curKey) {
        closeSeries()
        if (!firstSeries) sb.append(",")
        firstSeries = false
        sb.append("{\"target\":\"").append(escape(r.getString(0)))
          .append("\",\"datapoints\":[")
        curKey = key
        firstPoint = true
      }
      if (!firstPoint) sb.append(",")
      firstPoint = false
      val v = if (r.isNullAt(2)) "null" else {
        val d = r.getDouble(2)
        if (d.isNaN || d.isInfinite) "null" else formatNum(d)
      }
      sb.append("[").append(v).append(",").append(r.getLong(1)).append("]")
    }
    closeSeries()
    sb.append("]").toString
  }

  /** Full `/render` request with several `target=` params
    * (`http/graphite.go:142-181` loops `r.Form["target"]`): every
    * target evaluates to its own plan, the union collects ONCE at the
    * boundary — one Spark job for the whole response, not one per
    * target. Series are grouped per (target, name), so two targets
    * that yield the same series name produce two response objects (as
    * the reference's per-target loop does), never one merged
    * datapoints array with doubled timestamps. */
  def renderTargets(ctx: graft.dsl.Eval.Ctx, targets: Seq[String]): String =
    if (targets.isEmpty) "[]"
    else {
      import org.apache.spark.sql.functions.{col, lit}
      // normalize the order channel per target: a target without a
      // sortBy* stage renders in name order (constant __ord)
      val tagged = targets.zipWithIndex.map { case (t, i) =>
        val df = graft.dsl.Eval.render(ctx, t)
        val withOrd =
          if (df.columns.contains("__ord")) df
          else df.withColumn("__ord", lit(Int.MaxValue))
        withOrd.select(col("name"), col("t"), col("value"), col("__ord"))
          .withColumn("__tgt", lit(i))
      }.reduce(_.unionByName(_))
      val rows = tagged.orderBy("__tgt", "__ord", "name", "t")
        .select("name", "t", "value", "__tgt")
        .collect()
      renderRows(rows.map(r => ((r.getInt(3), r.getString(0)), r)))
    }

  /** Pie-mode `/render` (graphite-web's `graphType=pie`; extension —
    * the reference renders lines only): each series reduces to ONE
    * number by `pieMode` — graphite's PieFunctions table: average
    * (None-skipping mean), maximum, minimum — and the response is
    * `[{"target": <name>, "value": <v>}, ...]`, graphite's json pie
    * shape (render/views.py). An all-unknown series emits null.
    * Order: (target ordinal, name), like the line form; the per-series
    * reduction is ONE map-side-combinable aggregate over the already
    * viewport-bounded plan — nothing new collects beyond the
    * one-row-per-series response. */
  def renderPieTargets(ctx: graft.dsl.Eval.Ctx, targets: Seq[String],
      pieMode: String): String = {
    import org.apache.spark.sql.functions._
    val agg = pieMode match {
      case "average" | "avg" => avg(col("value"))
      case "maximum" | "max" => max(col("value"))
      case "minimum" | "min" => min(col("value"))
      case other => throw new IllegalArgumentException(
        s"unknown pieMode '$other'")
    }
    if (targets.isEmpty) "[]"
    else {
      // evalExpr, NOT Eval.render: the pie reduction must see the
      // FETCHED series values (graphite's PieFunctions reduce the raw
      // fetched list) — rendering first would re-bucket to maxPoints
      // by average, making pieMode=maximum/minimum (and gap-skipping
      // averages) wrong and resolution-dependent, even though a pie
      // response has no datapoint resolution at all.
      val tagged = targets.zipWithIndex.map { case (t, i) =>
        graft.dsl.Eval.evalExpr(ctx, t)
          .select(col("name"), col("t"), col("value"))
          .withColumn("__tgt", lit(i))
      }.reduce(_.unionByName(_))
      val rows = tagged.groupBy(col("__tgt"), col("name")).agg(agg.as("v"))
        .orderBy("__tgt", "name").select("name", "v").collect()
      rows.map { r =>
        val v = if (r.isNullAt(1)) "null" else {
          val d = r.getDouble(1)
          if (d.isNaN || d.isInfinite) "null" else formatNum(d)
        }
        s"""{"target":"${escape(r.getString(0))}","value":$v}"""
      }.mkString("[", ",", "]")
    }
  }

  /** `/metrics/find` JSON (`http/graphite.go:39-75`): one node object
    * per row of a [[graft.streaming.Find.findNodes]] frame, with the
    * last name segment as `text`. */
  def toFindJson(df: DataFrame): String = {
    val rows = df.select("node", "leaf", "expandable").orderBy("node").collect()
    rows.map { r =>
      val node = r.getString(0)
      val text = node.substring(node.lastIndexOf('.') + 1)
      s"""{"text":"${escape(text)}","id":"${escape(node)}",""" +
        s""""leaf":${r.getBoolean(1)},"expandable":${r.getBoolean(2)}}"""
    }.mkString("[", ",", "]")
  }

  private def formatNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}
