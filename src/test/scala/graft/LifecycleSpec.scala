package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.dsl.Eval
import graft.rrd.{Consolidate, Fetch, RraSpec}
import graft.streaming.{Find, Ingest}

/** Capstone: the reference's full lifecycle (§3.1 + §3.3) composed from
  * this engine's pieces — graphite wire lines → parse → weighted-mean
  * consolidation into two archives → BestRRA fetch with maxPoints
  * re-bucketing → DSL expression over the fetched frame → render JSON.
  * Every stage is the production operator, not a test double. */
class LifecycleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("lifecycle-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  test("wire → consolidate → archive select → DSL → render JSON") {
    val s = spark; import s.implicits._

    // 1. ingest: graphite plaintext, two series, 1 Hz for 100 s
    val lines = (for {
      (name, base) <- Seq("web.req.count" -> 100, "db.req.count" -> 10)
      i <- 0 until 100
    } yield s"$name ${base + i % 2} $i").toDF("line")
    val points = Ingest.parseGraphite(lines, nowSec = lit(0L))
      .select(col("name"), col("tsSec").as("ts"), col("value"))

    // 2. write path: consolidate into a 10s and a 50s archive
    val arch10 = Consolidate.consolidate(points, 10, "wmean", 0.0, 3600)
    val arch50 = Consolidate.consolidate(points, 50, "wmean", 0.0, 3600)
    assert(arch10.count() > 0 && arch50.count() > 0)

    // 3. read path: BestRRA picks the coarse archive for few maxPoints
    val archives = Seq(
      Fetch.Archive(RraSpec(10, 10, 100), () => arch10),
      Fetch.Archive(RraSpec(50, 2, 100), () => arch50))
    val fetched = Fetch.fetchSeries(s, archives, 0, 99, maxPoints = 2)
    // 0.5 Hz alternation consolidates to the mean at any step ≥ 10
    val fv = fetched.as[(String, Long, Double)].collect()
    assert(fv.nonEmpty)
    assert(fv.filter(_._1 == "web.req.count").forall(r => math.abs(r._3 - 100.5) < 1e-9))

    // 4. query: DSL over the fetched frame (sum across series)
    val ctx = Eval.Ctx(s, fetched, stepSec = 50, fromSec = 0, toSec = 99)
    val summed = Eval.evalExpr(ctx, "sumSeries(*.req.count).alias('total')")
    val sv = summed.as[(String, Long, Double)].collect()
    assert(sv.forall(_._1 == "total"))
    assert(sv.forall(r => math.abs(r._3 - 111.0) < 1e-9)) // 100.5 + 10.5

    // 5. metadata: find the tree nodes the two series hang from
    val nodes = Find.findNodes(fetched.select("name").distinct(), "*")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2))).toSet
    assert(nodes == Set(("web", false, true), ("db", false, true)))

    // 6. render: Graphite JSON out
    val json = Render.toGraphiteJson(summed)
    assert(json.startsWith("""[{"target":"total","datapoints":[["""))
    assert(json.contains("111"))
  }
}
