package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTTP pixel-endpoint ingest (`http/pixel.go:43-144`): 1×1-GIF
  * tracking URLs whose query strings carry data points or aggregator
  * commands. Five routes (`daemon/http.go:47-51`):
  *
  *   - `/pixel?name=VAL@TS&…` — each form pair is scanned with
  *     `Sscanf("%f@%f")` (`pixel.go:66`): a leading float is required,
  *     `@ts` optional (ts 0 or absent → "now"), trailing garbage after
  *     the matched prefix is ignored (Sscanf stops, n ≥ 1 accepts).
  *     Result: a data point (name, ts, value).
  *   - `/pixel/add|addgauge|setgauge|append?name=VAL&…` — plain `%f`
  *     scan → aggregator command, same routing the statsd path feeds
  *     ([[Ingest.statsdToCommands]]).
  *
  * Names pass `misc.SanitizeName` after form-decoding; a pair whose
  * value yields no float is dropped (the reference aborts its — Go map
  * ordered, hence random — remaining pairs; dropping just the bad pair
  * is the deterministic superset). Sub-second `@ts` fractions truncate
  * to the second at this row grain (`pixel.go:76-78` keeps nanos).
  *
  * All parsing is Catalyst column expressions — no UDFs, codegen'd,
  * identical on batch frames and streams of request logs.
  */
object Pixel {

  /** Sscanf-style float literal: optional sign, digits with optional
    * fraction (or bare .fraction), optional exponent. */
  private val F = "[+-]?(?:\\d+\\.?\\d*|\\.\\d+)(?:[eE][+-]?\\d+)?"

  /** Parse a frame with a `url` string column into
    * (kind ∈ {dp, add, addgauge, setgauge, append}, name,
    *  tsSec — data points only, null for commands, value). */
  def parseRequests(urls: DataFrame, nowSec: Column): DataFrame = {
    val path = substring_index(col("url"), "?", 1)
    val qs = when(col("url").contains("?"),
      regexp_replace(col("url"), "^[^?]*\\?", "")).otherwise(lit(""))
    val kind = when(path === "/pixel", lit("dp"))
      .when(path === "/pixel/add", lit("add"))
      .when(path === "/pixel/addgauge", lit("addgauge"))
      .when(path === "/pixel/setgauge", lit("setgauge"))
      .when(path === "/pixel/append", lit("append"))
    val kv = split(col("pair"), "=", 2)
    urls
      .select(kind.as("kind"), explode(split(qs, "&")).as("pair"))
      .filter(col("kind").isNotNull && col("pair") =!= "")
      // try_url_decode: malformed percent-encoding yields NULL (and the
      // pair drops through the filters below) — plain url_decode would
      // throw and kill the whole batch on one bad request
      .select(col("kind"),
        Ingest.sanitizeName(try_url_decode(get(kv, lit(0)))).as("name"),
        try_url_decode(coalesce(get(kv, lit(1)), lit(""))).as("vs"))
      // Sscanf %f skips leading whitespace — which is how a form-encoded
      // "+2" (decoded " 2") still parses as 2 in the reference
      .withColumn("value",
        regexp_extract(col("vs"), s"^\\s*($F)", 1).try_cast("double"))
      // Sscanf n < 1 OR undecodable name: pair dropped
      .filter(col("value").isNotNull && col("name").isNotNull)
      .withColumn("ut",
        regexp_extract(col("vs"), s"^\\s*$F@\\s*($F)", 1).try_cast("double"))
      .select(col("kind"), col("name"),
        when(col("kind") === "dp",
          when(coalesce(col("ut"), lit(0.0)) === 0.0, nowSec)
            .otherwise(col("ut").cast("long"))).as("tsSec"),
        col("value"))
  }

  /** The same float-scan grammar for a DuckDB oracle (single-quoted SQL
    * string, regexp groups identical). */
  val floatReSql: String = F
}
