package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013,
  * "Downsampling Time Series for Visual Representation") — the
  * render-path reducer dashboards actually want: where
  * `consolidateBy`/maxDataPoints AVERAGE each bucket (flattening the
  * spikes a human is looking for), LTTB keeps, per bucket, the real
  * point that preserves the most visual area with its neighbours, so
  * peaks, dips and trend breaks survive a 10⁶-point series squeezed
  * into a 500-pixel panel.
  *
  * Algorithm: first and last points always kept; the middle points
  * split into `threshold − 2` equal index buckets; per bucket, keep
  * the point maximizing the triangle area with the PREVIOUSLY KEPT
  * point and the NEXT bucket's average point (sequential by nature —
  * each pick anchors the next bucket's triangles).
  *
  * Determinism contract (the kmeans idiom): areas are computed in an
  * EXACT integer domain — values quantized `floor(v·10⁴ + 0.5)`, the
  * next-bucket average kept as (Σt, Σq, m) and the area formula
  * multiplied through by `m`, all in arbitrary-precision integers
  * (BigInt here, HUGEINT in the DuckDB twin) — so the argmax and its
  * first-wins tie-break replay bit-identically cross-engine. Bucket
  * boundaries are integer arithmetic (`1 + j·(n−2)/(k−2)` floored),
  * not float.
  *
  * Scale shape: one shuffle keying the corpus by series, then a
  * per-series sequential pass in `flatMapGroups` over viewport-bounded
  * arrays — many small keys, the Holt-Winters shape. Null values
  * (dense-grid gaps) are dropped first, as visual downsampling is
  * over observed points. */
object Lttb {

  private def q(v: Double): Long = math.floor(v * 10000 + 0.5).toLong

  /** Indices (0-based) LTTB keeps for `n` points at `threshold` k —
    * the pure selection, exposed for the spec's model replay.
    * `ts`/`qs` are the time and quantized-value arrays in t order. */
  private[graft] def selectIdx(ts: Array[Long], qs: Array[Long],
      threshold: Int): Seq[Int] = {
    val n = ts.length
    val k = threshold
    if (n <= k) return ts.indices
    val sel = scala.collection.mutable.ArrayBuffer(0)
    var a = 0
    var j = 0
    while (j < k - 2) {
      def bound(x: Int): Int = 1 + (x.toLong * (n - 2) / (k - 2)).toInt
      val (lo, hi) = (bound(j), bound(j + 1))
      val (cLo, cHi) = if (j == k - 3) (n - 1, n) else (bound(j + 1), bound(j + 2))
      val m = cHi - cLo
      var sumTc = BigInt(0); var sumQc = BigInt(0)
      var i = cLo
      while (i < cHi) { sumTc += ts(i); sumQc += qs(i); i += 1 }
      val ta = BigInt(ts(a)); val qa = BigInt(qs(a))
      var best = lo; var bestArea = BigInt(-1)
      var p = lo
      while (p < hi) {
        val area = ((ta * m - sumTc) * (BigInt(qs(p)) - qa) -
          (ta - BigInt(ts(p))) * (sumQc - qa * m)).abs
        if (area > bestArea) { bestArea = area; best = p } // first wins ties
        p += 1
      }
      sel += best
      a = best
      j += 1
    }
    sel += n - 1
    sel.toSeq
  }

  /** Downsample `(name, t, value)` to ≤ `threshold` points per series.
    * Returns the kept rows with their ORIGINAL values. Per-series
    * input is materialized as one task-local array under the
    * sequential-op family's [[SeriesOps.SeqOpMaxPoints]] ceiling
    * (loud failure, not executor ballooning). */
  def lttb(series: DataFrame, threshold: Int): DataFrame = {
    require(threshold >= 3, "lttb threshold must be >= 3")
    val spark = series.sparkSession
    import spark.implicits._
    series.filter(col("value").isNotNull)
      .select(col("name"), col("t").cast("long").as("t"),
        col("value").cast("double").as("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (name, it) =>
        val pts = SeriesOps.boundedSeries("lttb", name, it).sortBy(_._2)
        val ts = pts.map(_._2)
        val qs = pts.map(p => q(p._3))
        selectIdx(ts, qs, threshold).iterator
          .map(i => (name, pts(i)._2, pts(i)._3))
      }
      .toDF("name", "t", "value")
  }

  /** DuckDB twin over a CTE `series(name, t, value)`: pack each series
    * into t-ordered lists (the Holt-Winters oracle pattern), run the
    * bucket recursion carrying the previously-kept index, HUGEINT
    * area argmax with first-wins ties (`list_position` finds the
    * FIRST maximum, matching the Scala `>` scan). Defines
    * `out(name, t, value)`. Compose under `WITH RECURSIVE`. */
  def lttbSql(threshold: Int, src: String = "series"): String = {
    val k = threshold
    // lists are 1-based; idx/a/lo/hi values are 0-based point indices
    s"""lpk AS (
       |  SELECT name, CAST(count(*) AS BIGINT) AS n,
       |         list(t ORDER BY t) AS ts,
       |         list(CAST(floor(value * 10000 + 0.5) AS HUGEINT) ORDER BY t) AS qs,
       |         list(value ORDER BY t) AS vs
       |  FROM (SELECT name, CAST(t AS BIGINT) AS t, CAST(value AS DOUBLE) AS value
       |        FROM $src WHERE value IS NOT NULL)
       |  GROUP BY name
       |), lsel AS (
       |  SELECT name, CAST(-1 AS BIGINT) AS j, CAST(0 AS BIGINT) AS a
       |  FROM lpk WHERE n > $k
       |  UNION ALL
       |  SELECT name, jn,
       |    lo + CAST(list_position(areas, list_max(areas)) AS BIGINT) - 1
       |  FROM (
       |    SELECT name, jn, lo,
       |      list_transform(generate_series(lo, hi - 1), p ->
       |        abs((ta * m - sumtc) * (qs[p + 1] - qa)
       |          - (ta - CAST(ts[p + 1] AS HUGEINT)) * (sumqc - qa * m))) AS areas
       |    FROM (
       |      SELECT name, jn, lo, hi, ts, qs,
       |        CAST(ts[a + 1] AS HUGEINT) AS ta, qs[a + 1] AS qa,
       |        CAST(chi - clo AS HUGEINT) AS m,
       |        list_reduce(list_transform(generate_series(clo, chi - 1),
       |          i -> CAST(ts[i + 1] AS HUGEINT)), (x, y) -> x + y) AS sumtc,
       |        list_reduce(list_transform(generate_series(clo, chi - 1),
       |          i -> qs[i + 1]), (x, y) -> x + y) AS sumqc
       |      FROM (
       |        SELECT s.name, s.a, s.j + 1 AS jn, p.ts, p.qs,
       |          1 + (s.j + 1) * (p.n - 2) // ($k - 2) AS lo,
       |          1 + (s.j + 2) * (p.n - 2) // ($k - 2) AS hi,
       |          CASE WHEN s.j + 1 = $k - 3 THEN p.n - 1
       |               ELSE 1 + (s.j + 2) * (p.n - 2) // ($k - 2) END AS clo,
       |          CASE WHEN s.j + 1 = $k - 3 THEN p.n
       |               ELSE 1 + (s.j + 3) * (p.n - 2) // ($k - 2) END AS chi
       |        FROM lsel s JOIN lpk p USING (name)
       |        WHERE s.j + 1 <= $k - 3
       |      )
       |    )
       |  )
       |), lidx AS (
       |  SELECT name, a AS idx FROM lsel
       |  UNION ALL
       |  SELECT name, n - 1 AS idx FROM lpk WHERE n > $k
       |  UNION ALL
       |  SELECT name, unnest(generate_series(CAST(0 AS BIGINT), n - 1)) AS idx
       |  FROM lpk WHERE n <= $k
       |), out AS (
       |  SELECT l.name, p.ts[CAST(l.idx AS INT) + 1] AS t,
       |         p.vs[CAST(l.idx AS INT) + 1] AS value
       |  FROM lidx l JOIN lpk p USING (name)
       |)""".stripMargin
  }
}
