package graft.streaming

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.dsl.Dsl

/** Metadata queries: the `/metrics/find` glob tree walk
  * (`dsl/fs_find_cache.go:32-203`, `http/graphite.go:39-75`) and series
  * search (`serde/postgres.go:602-621`), over a name catalog frame.
  *
  * The reference keeps an in-memory trie; here the "trie" is a groupBy
  * over name prefixes — at scale the catalog is tiny relative to data
  * (one row per series, not per point) and the aggregation is one
  * shuffle of distinct names. */
object Find {

  /** Find nodes matching a dotted glob at the pattern's depth.
    * Output: (node, leaf, expandable) — leaf: a series ends exactly
    * here; expandable: deeper segments exist (both can be true). */
  def findNodes(names: DataFrame, pattern: String): DataFrame = {
    val nSeg = pattern.split('.').length
    val parts = split(col("name"), "\\.")
    val node = concat_ws(".", slice(parts, 1, nSeg))
    names
      .filter(size(parts) >= nSeg)
      .select(node.as("node"), (size(parts) === nSeg).as("isLeaf"))
      .groupBy(col("node"))
      .agg(max(col("isLeaf")).as("leaf"), max(!col("isLeaf")).as("expandable"))
      .filter(col("node").rlike(Dsl.globToRegex(pattern)))
  }

  /** SQL mirror of [[findNodes]] over a `series(name, …)` CTE. */
  def findNodesSql(pattern: String): String = {
    val nSeg = pattern.split('.').length
    // DuckDB single-quoted strings don't process backslash escapes, so
    // the Java-regex text embeds verbatim; only quotes need doubling
    val regex = Dsl.globToRegex(pattern).replace("'", "''")
    s"""SELECT node, bool_or(isLeaf) AS leaf, bool_or(NOT isLeaf) AS expandable
       |FROM (
       |  SELECT array_to_string(ps[1:$nSeg], '.') AS node,
       |         len(ps) = $nSeg AS isLeaf
       |  FROM (SELECT string_split(name, '.') AS ps
       |        FROM (SELECT DISTINCT name FROM series))
       |  WHERE len(ps) >= $nSeg)
       |GROUP BY node HAVING regexp_matches(node, '$regex')""".stripMargin
  }

  /** Series search by name regex with per-series point counts —
    * the catalog-scan analogue of the reference's GIN-indexed tag
    * search. */
  def search(series: DataFrame, regex: String): DataFrame =
    series.filter(col("name").rlike(regex))
      .groupBy(col("name")).agg(count(lit(1)).as("n_points"))
}
