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
}
