package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.Events

/** The interval (range) join: the bucketized equi-join tier must be
  * result-identical to the plain non-equi broadcast tier at any
  * bucket width, inclusive on both ends, duplicate-free however many
  * buckets an interval spans — and must actually plan as an
  * equi-join (no nested-loop anywhere). */
class EventsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("events-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  // deterministic scattered points and a mix of degenerate / long /
  // overlapping intervals
  private def pts = {
    val s = spark; import s.implicits._
    (0L until 400L).map(i => (i, (i * 37L) % 10007L)).toDF("pt_id", "t")
  }
  private def ivs = {
    val s = spark; import s.implicits._
    Seq(
      (0L, 0L, 0L),        // degenerate: single instant
      (1L, 5L, 120L),      // short
      (2L, 100L, 9000L),   // spans many buckets at small widths
      (3L, 8000L, 10007L), // overlaps 2's tail
      (4L, 36L, 37L),      // hits exactly one point at its start
      (5L, 9990L, 20000L)  // runs past every point
    ).toDF("iv_id", "t_start", "t_end")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("bucketized tier ≡ broadcast non-equi tier at every width") {
    val base = rows(Events.rangeJoinBroadcast(pts, ivs)).sorted
    assert(base.nonEmpty)
    for (w <- Seq(1L, 7L, 100L, 4096L, 1000000L)) {
      val got = rows(Events.rangeJoin(pts, ivs, w))
      assert(got.sorted === base, s"width=$w diverged")
      // exactly-once: no (pt, iv) pair appears twice
      assert(got.map(r => (r._1, r._2)).distinct.size === got.size,
        s"width=$w emitted duplicate pairs")
    }
  }

  test("containment is inclusive on both ends") {
    val s = spark; import s.implicits._
    val p = Seq((1L, 99L), (2L, 100L), (3L, 150L), (4L, 200L), (5L, 201L))
      .toDF("pt_id", "t")
    val i = Seq((7L, 100L, 200L)).toDF("iv_id", "t_start", "t_end")
    val got = rows(Events.rangeJoin(p, i, 64L)).map(_._1).sorted
    assert(got === Seq(2L, 3L, 4L))
  }

  test("bucketized plan is an equi-join: no nested loop, no cartesian") {
    val p = Events.rangeJoin(pts, ivs, 100L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
