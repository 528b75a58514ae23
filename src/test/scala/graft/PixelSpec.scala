package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.Pixel

/** Pixel-endpoint parser vectors pinned to `http/pixel.go:43-144`
  * Sscanf semantics: prefix-float scan with ignored trailing garbage,
  * optional @ts (0/absent → now), form decoding before SanitizeName,
  * route → command mapping, malformed pairs dropped. */
class PixelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]")
      .appName("pixel-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  private def parse(urls: String*): Set[(String, String, Option[Long], Double)] = {
    val s = spark; import s.implicits._
    Pixel.parseRequests(urls.toDF("url"), lit(999L))
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getDouble(3))).toSet
  }

  test("data points: val@ts, bare val → now, Sscanf prefix semantics") {
    assert(parse("/pixel?a.b=12.5@100") === Set(("dp", "a.b", Some(100L), 12.5)))
    assert(parse("/pixel?n=3") === Set(("dp", "n", Some(999L), 3.0)))
    // trailing garbage after the scanned prefix is ignored (n>=1 accepts)
    assert(parse("/pixel?n=12.5xyz") === Set(("dp", "n", Some(999L), 12.5)))
    assert(parse("/pixel?n=12@") === Set(("dp", "n", Some(999L), 12.0)))
    // @0 explicitly means now (pixel.go:73-75)
    assert(parse("/pixel?n=4@0") === Set(("dp", "n", Some(999L), 4.0)))
    // sub-second ts truncates to the second grain
    assert(parse("/pixel?n=1@100.75") === Set(("dp", "n", Some(100L), 1.0)))
    // exponent floats scan
    assert(parse("/pixel?n=5e-1@1e2") === Set(("dp", "n", Some(100L), 0.5)))
  }

  test("form decode + SanitizeName: +/%20 → space → _, / → -, strip $") {
    assert(parse("/pixel?x+y$=1") === Set(("dp", "x_y", Some(999L), 1.0)))
    assert(parse("/pixel?a%20b/c=2@5") === Set(("dp", "a_b-c", Some(5L), 2.0)))
  }

  test("aggregator command routes; ts is null for commands") {
    assert(parse("/pixel/add?c=7", "/pixel/addgauge?g=+2",
      "/pixel/setgauge?g=-2.5", "/pixel/append?t=.5") === Set(
      ("add", "c", None, 7.0), ("addgauge", "g", None, 2.0),
      ("setgauge", "g", None, -2.5), ("append", "t", None, 0.5)))
  }

  test("malformed pairs drop; unknown routes and empty queries drop") {
    assert(parse("/pixel?bad=@9&ok=1@5") === Set(("dp", "ok", Some(5L), 1.0)))
    assert(parse("/pixel?noval") === Set.empty)
    assert(parse("/nope?x=1", "/pixel", "/pixel/mul?x=1") === Set.empty)
    // multi-pair form: every valid pair yields a point (pixel.go:59-63)
    assert(parse("/pixel?a=1@10&b=2@20") ===
      Set(("dp", "a", Some(10L), 1.0), ("dp", "b", Some(20L), 2.0)))
    // malformed percent-encoding drops the PAIR, not the batch
    // (try_url_decode → NULL → filtered; url_decode would throw)
    assert(parse("/pixel?cpu%=50&ok=1@5") === Set(("dp", "ok", Some(5L), 1.0)))
    assert(parse("/pixel?ok=50%") === Set.empty)
  }
}
