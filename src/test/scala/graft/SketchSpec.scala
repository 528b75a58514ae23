package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.SketchExprs

/** Misra–Gries guarantees the DuckDB oracle can't pin (it only sees
  * the exact regime): the N/(k+1) undercount bound, the
  * guaranteed-presence threshold, exactness at k ≥ cardinality under
  * real partitioned merges, and grouped/SQL surfaces. */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("sketch-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  /** Zipf-ish corpus: token i appears ~N/(i+1) times, shuffled and
    * spread over 8 partitions so partial-aggregate serialize/merge
    * actually runs. */
  private def corpus(nTokens: Int, scale: Int) = {
    val s = spark; import s.implicits._
    val rows = (0 until nTokens).flatMap(i =>
      Seq.fill(scale / (i + 1))(s"tok$i"))
    scala.util.Random.shuffle(rows).toDF("tok").repartition(8)
  }

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(SketchExprs.heavyHitters(col("tok"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token").as("tok"), col("e.count").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact regime: k ≥ cardinality reproduces exact counts across merges") {
    val df = corpus(50, 2000)
    val exact = df.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch(df, 64) === exact)
  }

  test("approximate regime: undercount bounded by N/(k+1); heavy tokens present") {
    val df = corpus(200, 20000).cache()
    val exact = df.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 16
    val got = sketch(df, k)
    assert(got.size <= k)
    val slack = n.toDouble / (k + 1)
    got.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overcounted: $c > ${exact(t)}")
      assert(c >= exact(t) - slack, s"$t undercounted past the bound")
    }
    // presence guarantee: true count > N/(k+1) ⇒ in the sketch
    exact.filter(_._2 > slack).keys.foreach(t =>
      assert(got.contains(t), s"guaranteed hitter $t missing"))
    df.unpersist()
  }

  test("nulls are skipped; empty input yields an empty summary") {
    val s = spark; import s.implicits._
    val withNulls = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("tok")
    assert(sketch(withNulls, 8) === Map("a" -> 2L, "b" -> 1L))
    assert(sketch(Seq.empty[String].toDF("tok"), 8) === Map.empty)
  }

  test("grouped aggregation: one independent sketch per group") {
    val s = spark; import s.implicits._
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "z")).toDF("g", "tok").repartition(4)
    val out = df.groupBy("g")
      .agg(SketchExprs.heavyHitters(col("tok"), 8).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select(col("g"), col("e.token"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set(("g1", "x", 2L), ("g1", "y", 1L), ("g2", "z", 1L)))
  }

  test("SQL surface: graft_heavy_hitters matches the Column API") {
    val s = spark; import s.implicits._
    corpus(20, 400).createOrReplaceTempView("sk_toks")
    val viaSql = spark.sql(
      "SELECT graft_heavy_hitters(tok, 64) AS hh FROM sk_toks")
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.table("sk_toks").groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql === exact)
  }

  // ---- the HLL distinct-count tier (graft.pipeline.Curation) ----

  /** Docs with a controlled distinct-token count per source: source
    * s_i holds tokens {i*span .. i*span + n_i - 1}, spread over docs
    * and partitions. */
  private def hllDocs(perSource: Map[String, Int]) = {
    val s = spark; import s.implicits._
    perSource.toSeq.flatMap { case (src, n) =>
      (0 until n).grouped(50).zipWithIndex.map { case (chunk, i) =>
        (s"$src-$i".hashCode.toLong, chunk.map(j => s"${src}_t$j").mkString(" "), src)
      }
    }.toDF("doc_id", "text", "source").repartition(8)
  }

  test("HLL tier: increment merge is order-insensitive, estimates near exact") {
    import graft.pipeline.Curation
    val docs = hllDocs(Map("a" -> 5000, "b" -> 1200, "c" -> 37))
    val whole = Curation.sketchDistinct(Curation.tokenSketches(docs))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // HLL registers merge by max — order/grouping of the union must
    // not change the estimate (this is what makes the stored tier
    // deterministic under arbitrary partitioning). NOTE the merged
    // estimate may differ from the direct whole-corpus sketch by a
    // hair: DataSketches estimates sparse-mode (coupon) sketches and
    // the union gadget's dense HLL mode through different paths — so
    // the cross-form assertion is a tolerance, not equality.
    def merged(order: Seq[Long]) = Curation.sketchDistinct(
      order.map(p => Curation.tokenSketches(
        docs.filter(pmod(col("doc_id"), lit(3)) === p))).reduce(_ union _))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m1 = merged(Seq(0L, 1L, 2L))
    val m2 = merged(Seq(2L, 0L, 1L))
    assert(m1 === m2, "increment union must be order-insensitive")
    for ((src, n) <- Map("a" -> 5000, "b" -> 1200, "c" -> 37)) {
      assert(math.abs(whole(src) - n) <= math.max(1, n * 0.05),
        s"$src: direct est ${whole(src)} vs exact $n")
      assert(math.abs(m1(src) - n) <= math.max(1, n * 0.05),
        s"$src: merged est ${m1(src)} vs exact $n")
    }
  }

  test("HLL tier: sketches survive a parquet round-trip and still merge") {
    import graft.pipeline.Curation
    val docs = hllDocs(Map("a" -> 800, "b" -> 300))
    val dir = java.nio.file.Files.createTempDirectory("hll_store").toString
    // write each increment's sketch rows as a stored table (the
    // snapshot-tier usage), then read back and merge across files —
    // against the SAME increments merged live, so the assertion
    // isolates binary serialization fidelity
    val incs = Seq(0, 1).map(p =>
      Curation.tokenSketches(docs.filter(col("doc_id") % 2 === p)))
    incs.foreach(_.write.mode("append").parquet(dir))
    val live = Curation.sketchDistinct(incs.reduce(_ union _))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stored = Curation.sketchDistinct(spark.read.parquet(dir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored === live)
  }
}
