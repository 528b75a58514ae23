package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Tag-map identity (`serde/serde.go:95`: `Ident map[string]string`):
    * attach `ident: map<string,string>` to a `name`-keyed frame — the
    * map always carries `name`, plus the caller's tag columns. A tag
    * whose column evaluates to NULL is ABSENT from that row's map (the
    * reference's idents simply lack keys other series carry), which is
    * what gives [[searchTags]]'s key-presence check its meaning. */
  def identify(series: DataFrame, tags: (String, Column)*): DataFrame = {
    val entries = (("name" -> col("name")) +: tags)
      .flatMap { case (k, c) => Seq(lit(k), c) }
    series.withColumn("ident",
      map_filter(map(entries: _*), (_, v) => v.isNotNull))
  }

  /** The reference's canonical ident rendering (`serde/serde.go:98-121`
    * `Ident.String()`): keys sorted, `{"k": "v","k2": "v2"}` — comma
    * with no space, exactly as `%q` prints. A deterministic scalar, so
    * map identities survive groupBy and the oracle hash compare. */
  def identString(ident: Column): Column =
    concat(lit("{"), array_join(
      transform(array_sort(map_keys(ident)),
        k => concat(lit("\""), k, lit("\": \""), element_at(ident, k), lit("\""))),
      ","), lit("}"))

  /** Tag search with the reference's exact predicate shape
    * (`serde/postgres.go:602-621` via `postgres_common.go:111-133`):
    * for every (key, regex) in the query, the ident must CONTAIN the
    * key (`ident ? $k` — the GIN-index guard) AND its value must match
    * the regex case-insensitively (`ident ->> $k ~* $v`, an
    * unanchored POSIX match). Conjunctive across query entries.
    * Output: (ident, n_points) per matching series, ident in
    * [[identString]] form.
    *
    * Scale: a catalog predicate — series-count grain, one
    * map-side-combinable aggregate; never touches point payloads. */
  def searchTags(series: DataFrame, query: Map[String, String]): DataFrame = {
    val cond = query.toSeq.sortBy(_._1).map { case (k, v) =>
      element_at(col("ident"), lit(k)).isNotNull &&
        element_at(col("ident"), lit(k)).rlike("(?i)" + v)
    }.reduce(_ && _)
    series.filter(cond)
      .groupBy(identString(col("ident")).as("ident"))
      .agg(count(lit(1)).as("n_points"))
  }

  /** Ident map of a CANONICAL graphite tagged path
    * ([[Ingest.sanitizeTagged]]'s output: `base;k=v;…`, keys unique
    * and sorted): `{"name" -> base}` plus one entry per tag. The
    * stored catalog stays a flat name string — this derives the
    * reference's `Ident map[string]string` view from it at query
    * time, which is what lets [[searchTags]]/[[tagKeys]]/[[tagValues]]
    * serve tagged series without a second catalog table. A tag
    * literally named `name` is dropped rather than allowed to shadow
    * the base name. Untagged names yield `{"name" -> name}`. */
  def identFromName(name: Column): Column = {
    val parts = split(name, ";")
    val base = get(parts, lit(0))
    val tags = filter(
      slice(parts, lit(2), greatest(size(parts) - 1, lit(0))),
      t => instr(t, "=") > 0 && substring_index(t, "=", 1) =!= "name")
    val entries = transform(tags, t => struct(
      substring_index(t, "=", 1).as("key"),
      regexp_replace(t, "^[^=]*=", "").as("value")))
    map_concat(map(lit("name"), base), map_from_entries(entries))
  }

  /** One catalog predicate for a conjunction of graphite tag
    * expressions (`k=v`, `k!=v`, `k=~re`, `k!=~re`) over `ident` —
    * the shared core of the DSL's `seriesByTag` and the daemon's
    * `/tags/findSeries`. graphite-web semantics: `=` is exact and an
    * EMPTY value matches series without the tag; `=~` anchors at the
    * start and requires the tag present; each negation is the exact
    * complement (so `!=~` matches tag-less series). */
  def tagExprCond(exprs: Seq[String], ident: Column): Column = {
    require(exprs.nonEmpty, "at least one tag expression is required")
    exprs.map { e =>
      def cut(op: String) = {
        val i = e.indexOf(op)
        (e.substring(0, i), e.substring(i + op.length))
      }
      def tagval(k: String) = element_at(ident, lit(k))
      def eqCond(k: String, v: String) =
        coalesce(tagval(k), lit("")) === v
      def reCond(k: String, v: String) =
        tagval(k).isNotNull && tagval(k).rlike("^" + v)
      if (e.contains("!=~")) { val (k, v) = cut("!=~")
        coalesce(!reCond(k, v), lit(true)) }
      else if (e.contains("=~")) { val (k, v) = cut("=~"); reCond(k, v) }
      else if (e.contains("!=")) { val (k, v) = cut("!="); !eqCond(k, v) }
      else if (e.contains("=")) { val (k, v) = cut("="); eqCond(k, v) }
      else throw new IllegalArgumentException(
        s"tag expression needs an operator (=, !=, =~, !=~): $e")
    }.reduce(_ && _)
  }

  /** Tag-KEY autocomplete over an [[identify]]-shaped catalog (the
    * Graphite tag API's `/tags/autoComplete/tags` contract: distinct
    * keys with an optional prefix filter, sorted, limited). Catalog
    * grain — one distinct over exploded map keys; `limit` caps the
    * driver-bound result the way autocomplete uses it. */
  def tagKeys(series: DataFrame, prefix: String = "",
      limitN: Int = 100): DataFrame = {
    val keys = series.select(explode(map_keys(col("ident"))).as("tag"))
    (if (prefix.isEmpty) keys
     else keys.filter(col("tag").startsWith(prefix)))
      .distinct().orderBy(col("tag")).limit(limitN)
  }

  /** Tag-VALUE autocomplete for one key
    * (`/tags/autoComplete/values`): distinct values of `key` across
    * idents that carry it, optional prefix, sorted, limited. */
  def tagValues(series: DataFrame, key: String, prefix: String = "",
      limitN: Int = 100): DataFrame = {
    val vals = series
      .select(element_at(col("ident"), lit(key)).as("value"))
      .filter(col("value").isNotNull)
    (if (prefix.isEmpty) vals
     else vals.filter(col("value").startsWith(prefix)))
      .distinct().orderBy(col("value")).limit(limitN)
  }
}
