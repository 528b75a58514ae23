package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.Find

/** Tag-map ident semantics (`serde/serde.go:95-121`,
  * `serde/postgres_common.go:111-133`): key presence gates the match
  * (`ident ? key`), value regexes are case-insensitive and unanchored
  * (`~*`), query entries conjoin, and idents render in the reference's
  * sorted-key `Ident.String()` form. */
class FindSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("find-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  // Catalog of 3 series x 2 points; only web.* rows carry a `dc` tag
  // (host-derived), so dc-queries exercise the key-presence guard.
  private def catalog() = {
    val s = spark; import s.implicits._
    Seq(
      ("web.srv1.cpu", 1L), ("web.srv1.cpu", 2L),
      ("web.srv2.cpu", 1L), ("web.srv2.cpu", 2L),
      ("db.main.cpu", 1L), ("db.main.cpu", 2L)
    ).toDF("name", "t")
  }

  private def identified() =
    Find.identify(catalog(),
      "tier" -> element_at(split(col("name"), "\\."), 1),
      "dc" -> when(col("name").startsWith("web."),
        concat(lit("dc-"), element_at(split(col("name"), "\\."), 2))))

  test("missing key never matches, even when the regex would") {
    // dc regex '.*' matches anything — but db.main.cpu has no dc key
    val out = Find.searchTags(identified(), Map("dc" -> ".*"))
      .orderBy("ident").collect()
    assert(out.length === 2)
    assert(out.forall(_.getString(0).contains("\"tier\": \"web\"")))
  }

  test("value match is case-insensitive and unanchored (~* semantics)") {
    val out = Find.searchTags(identified(), Map("tier" -> "WE"))
      .orderBy("ident").collect()
    assert(out.map(_.getString(0)).toSeq === Seq(
      "{\"dc\": \"dc-srv1\",\"name\": \"web.srv1.cpu\",\"tier\": \"web\"}",
      "{\"dc\": \"dc-srv2\",\"name\": \"web.srv2.cpu\",\"tier\": \"web\"}"))
    assert(out.forall(_.getLong(1) === 2L))
  }

  test("query entries conjoin: every (key, regex) must hold") {
    val out = Find.searchTags(identified(),
      Map("tier" -> "web", "dc" -> "srv2$")).collect()
    assert(out.map(_.getString(0)).toSeq ===
      Seq("{\"dc\": \"dc-srv2\",\"name\": \"web.srv2.cpu\",\"tier\": \"web\"}"))
  }

  test("ident renders with sorted keys in Ident.String() form") {
    // db row has only (name, tier) — rendering must skip absent keys
    val out = Find.searchTags(identified(), Map("tier" -> "^db$")).collect()
    assert(out.map(_.getString(0)).toSeq ===
      Seq("{\"name\": \"db.main.cpu\",\"tier\": \"db\"}"))
  }

  test("tagKeys: sparse keys surface once, prefix and limit bind") {
    // dc exists only on web rows — it must still be listed exactly once
    val all = Find.tagKeys(identified()).collect().map(_.getString(0)).toSeq
    assert(all === Seq("dc", "name", "tier"))
    assert(Find.tagKeys(identified(), prefix = "t")
      .collect().map(_.getString(0)).toSeq === Seq("tier"))
    assert(Find.tagKeys(identified(), limitN = 2)
      .collect().map(_.getString(0)).toSeq === Seq("dc", "name"))
  }

  test("sanitizeTagged: canonical form — sanitize, drop bad entries, last-wins, sort") {
    val s = spark; import s.implicits._
    import graft.streaming.Ingest
    val in = Seq(
      "web srv/1.cpu",                            // untagged: plain sanitize
      "cpu;env=prod;dc=us west;env=stage",        // dup key: LAST wins; value sanitized; sorted
      "mem;broken;dc=e$ast",                      // no-'=' entry drops; $ stripped
      "disk;=v;k="                                // empty key / empty value survive as-is
    ).toDF("name")
    val out = in.select(Ingest.sanitizeTagged(col("name")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq(
      "web_srv-1.cpu",
      "cpu;dc=us_west;env=stage",
      "mem;dc=east",
      "disk;=v;k="))
  }

  test("identFromName: canonical tagged path → reference-shaped ident map") {
    val s = spark; import s.implicits._
    import graft.streaming.{Find, Ingest}
    val cat = Seq(
      ("cpu;dc=west;env=prod", 1L), ("cpu;dc=west;env=prod", 2L),
      ("cpu;dc=east;env=prod", 1L), ("mem.free", 1L),
      ("odd;name=shadow;z=1", 1L)   // a tag named `name` must NOT shadow base
    ).toDF("name", "t")
    val idented = cat.withColumn("ident", Find.identFromName(col("name")))
    // searchTags over the derived idents: the end-to-end tagged query
    val hits = Find.searchTags(idented, Map("dc" -> "^west$"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hits === Seq(
      ("{\"dc\": \"west\",\"env\": \"prod\",\"name\": \"cpu\"}", 2L)))
    assert(Find.tagKeys(idented).collect().map(_.getString(0)).toSeq ===
      Seq("dc", "env", "name", "z"))
    assert(Find.tagValues(idented, "dc").collect().map(_.getString(0)).toSeq ===
      Seq("east", "west"))
    // untagged + shadow cases: base name survives as ident["name"]
    val names = idented.select(element_at(col("ident"), lit("name")))
      .distinct().collect().map(_.getString(0)).toSet
    assert(names === Set("cpu", "mem.free", "odd"))
    // round-trip: parseGraphite canonicalizes, identFromName reads back
    val lines = Seq("req;env=prod;dc=us/east 5 100").toDF("line")
    val parsed = Ingest.parseGraphite(lines, lit(0L))
    assert(parsed.select("name").head.getString(0) === "req;dc=us-east;env=prod")
  }

  test("tagValues: distinct values of one key; absent-key rows drop") {
    val dcs = Find.tagValues(identified(), "dc")
      .collect().map(_.getString(0)).toSeq
    assert(dcs === Seq("dc-srv1", "dc-srv2"))
    assert(Find.tagValues(identified(), "dc", prefix = "dc-srv2")
      .collect().map(_.getString(0)).toSeq === Seq("dc-srv2"))
    // a key no ident carries yields an empty result, not an error
    assert(Find.tagValues(identified(), "rack").collect().isEmpty)
  }
}
