package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.GraftExtensions

/** The SparkSessionExtensions injection: every native expression must
  * be callable from SQL text and agree with its Column-API form. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("extensions-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  test("SQL-registered functions match the Column API bit-for-bit") {
    val s = spark; import s.implicits._
    Seq((1L, Seq(5L, 99L, 12345L)), (2L, Seq(0L, 2147483646L)))
      .toDF("doc_id", "hs").createOrReplaceTempView("hsets")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_minhash_sig(hs) AS sig, graft_simhash(hs) AS sim
        |FROM hsets ORDER BY doc_id""".stripMargin).collect()
    val viaCol = spark.table("hsets").select(col("doc_id"),
        graft.functions.HashExprs.minhashSig(col("hs"),
          pipeline.NearDup.hashParams.map(_._1),
          pipeline.NearDup.hashParams.map(_._2), pipeline.NearDup.P).as("sig"),
        graft.functions.HashExprs.simhashSig(col("hs")).as("sim"))
      .orderBy("doc_id").collect()
    assert(viaSql.map(_.toSeq).toSeq === viaCol.map(_.toSeq).toSeq)

    val dims = (0 until pipeline.Similarity.Dim)
    Seq((1L, dims.map(i => (i % 7).toLong)))
      .toDF("vec_id", "qv").createOrReplaceTempView("qvecs")
    val dotSql = spark.sql(
      "SELECT graft_dot(qv, qv) AS d, graft_lsh_sign(qv) AS sig FROM qvecs")
      .collect().head
    val dotCol = spark.table("qvecs").select(
        graft.functions.VectorExprs.dot(col("qv"), col("qv")).as("d"),
        graft.functions.VectorExprs.lshSign(col("qv"),
          pipeline.Similarity.planes.map(_.map(_.toLong))).as("sig"))
      .collect().head
    assert(dotSql.getDouble(0) === dotCol.getDouble(0))
    assert(dotSql.getLong(1) === dotCol.getLong(1))

    Seq((1L, "the quick brown fox jumps"), (2L, "a b"))
      .toDF("doc_id", "text").createOrReplaceTempView("sdocs")
    val shSql = spark.sql(
      "SELECT doc_id, graft_shingle_set(text) AS hs FROM sdocs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val shCol = pipeline.NearDup.shingleSets(spark.table("sdocs"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(shSql.toSeq === shCol.toSeq)

    val nfSql = spark.sql(
      "SELECT graft_nfc_clean(concat(text, '\te\u0301\u200B!')) AS n " +
        "FROM sdocs ORDER BY doc_id")
      .collect().map(_.getString(0))
    val nfCol = spark.table("sdocs").orderBy("doc_id")
      .select(graft.functions.TextExprs.nfcClean(
        concat(col("text"), lit("\te\u0301\u200B!"))).as("n"))
      .collect().map(_.getString(0))
    assert(nfSql.toSeq === nfCol.toSeq)
    assert(nfSql.head.endsWith(" \u00E9!")) // composed, tab collapsed, ZWSP gone
  }

  test("graft_minhash_sig normalizes arbitrary SQL input into [0, P)") {
    val s = spark; import s.implicits._
    val p = pipeline.NearDup.P
    // out-of-domain elements: negative, > P, and Long extremes — the
    // SQL boundary must fold each into [0, P) instead of silently
    // overflowing x·a in the signature fold
    val raw = Seq(-5L, p + 3L, Long.MaxValue, Long.MinValue, 12345L)
    val folded = raw.map(x => ((x % p) + p) % p)
    Seq((raw, folded)).toDF("raw", "folded")
      .createOrReplaceTempView("oob")
    val got = spark.sql(
      "SELECT graft_minhash_sig(raw) AS a, graft_minhash_sig(folded) AS b FROM oob")
      .collect().head
    assert(got.getSeq[Long](0) === got.getSeq[Long](1))
    // and every signature slot is a legal hash value, inside [0, P)
    assert(got.getSeq[Long](0).forall(v => v >= 0 && v < p))
  }

  test("arity errors surface as analysis-time failures") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0D))").collect()
    }
    assert(e.getMessage.contains("graft_dot"))
  }

  test("FuseDotRule rewrites HOF dot folds to the native expression") {
    val s = spark; import s.implicits._
    // spark.range keeps a real plan — a Seq-based frame constant-folds
    // to a LocalRelation before the rule's effect is observable
    val df = s.range(1, 4).select(
      transform(sequence(lit(1), lit(3)),
        i => (i * col("id")).cast("float")).as("x"),
      transform(sequence(lit(1), lit(3)),
        i => (i * col("id") * 2).cast("double")).as("y"))
    val hof = df.selectExpr(
      "aggregate(zip_with(x, y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d")
    // the optimizer must have replaced the fold with graft_dot
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
    val expect = df.select(
      graft.functions.VectorExprs.dot(col("x"), col("y")).as("d"))
    assert(hof.collect().map(_.getDouble(0)).toSeq ===
      expect.collect().map(_.getDouble(0)).toSeq)
    // a fold that is NOT a dot product must survive untouched
    val other = df.selectExpr(
      "aggregate(zip_with(x, y, (p, q) -> CAST(p AS DOUBLE) + CAST(q AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d")
    assert(other.queryExecution.optimizedPlan.toString.contains("aggregate("))
    // sum-of-sums, not a dot: Σ(p+q) per row with x=i·id, y=2i·id
    assert(other.collect().map(_.getDouble(0)).toSeq ===
      Seq(18.0, 36.0, 54.0))
    // decimal arrays: a valid HOF fold that the native expression
    // cannot evaluate — the rule must leave it alone, and the result
    // must still be correct
    val dec = s.range(1, 3).selectExpr(
      "transform(sequence(1, 3), i -> CAST(i * id AS DECIMAL(10, 2))) AS x")
    val decFold = dec.selectExpr(
      "aggregate(zip_with(x, x, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d")
    assert(decFold.queryExecution.optimizedPlan.toString.contains("aggregate("))
    assert(decFold.collect().map(_.getDouble(0)).toSeq === Seq(14.0, 56.0))
    // and calling graft_dot on decimals directly fails at analysis time
    val e2 = intercept[Exception] {
      dec.select(graft.functions.VectorExprs.dot(col("x"), col("x"))).collect()
    }
    assert(e2.getMessage.contains("decimal"))
  }

  test("spark.sql.extensions config string loads the class reflectively") {
    // the cluster deploy path: --conf spark.sql.extensions=<class>; the
    // class must be public with a zero-arg constructor and register on
    // a session built from config alone
    spark.stop()
    val s2 = SparkSession.builder()
      .master("local[2]").appName("extensions-conf-spec")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val got = s2.sql("SELECT graft_simhash(array(CAST(5 AS BIGINT)))")
        .collect().head.getLong(0)
      assert(got === 5L) // single element: sig bits == its low bits
    } finally {
      s2.stop()
      spark0 = SparkSession.builder()
        .master("local[4]").appName("extensions-spec")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false").getOrCreate()
    }
  }
}
