package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.Snapshot

import java.nio.file.Files

/** The snapshot sink's commit protocol: atomic publish, crash debris
  * invisibility, rename-race retry, compaction row-preservation,
  * clustered-layout disjointness, and vacuum's grace window. */
class SnapshotSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("snapshot-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  private def tmpDir(): String =
    Files.createTempDirectory("snapspec").toString

  private def corpus(n: Int, tag: String) = {
    val s = spark; import s.implicits._
    (0 until n).map(i => (i.toLong, s"$tag-$i")).toDF("doc_id", "text")
  }

  test("publish → read round-trip; versions increment; old version stays pinned") {
    val dir = tmpDir()
    assert(Snapshot.latestVersion(spark, dir).isEmpty)
    val v1 = Snapshot.publish(corpus(100, "a"), dir)
    assert(v1 === 1L)
    assert(Snapshot.read(spark, dir).count() === 100)
    val v2 = Snapshot.publish(corpus(50, "b"), dir)
    assert(v2 === 2L)
    assert(Snapshot.latestVersion(spark, dir) === Some(2L))
    assert(Snapshot.read(spark, dir).count() === 50)
    // MVCC: the superseded version is still readable when pinned
    assert(Snapshot.read(spark, dir, Some(1L)).count() === 100)
  }

  test("crash debris is invisible: stray tmp dirs and unpointed versions don't surface") {
    val dir = tmpDir()
    Snapshot.publish(corpus(10, "live"), dir)
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a publisher that crashed mid-stage…
    corpus(99, "crashed").write.parquet(s"$dir/.tmp-deadbeef")
    // …and one that renamed its version dir but never swung the pointer
    corpus(99, "orphan").write.parquet(s"$dir/v=5")
    assert(Snapshot.latestVersion(spark, dir) === Some(1L))
    assert(Snapshot.read(spark, dir).count() === 10)
    // routine vacuum clears tmp debris but leaves the orphan (a live
    // publisher could be mid-commit); opt-in reclaim removes it too
    Snapshot.vacuum(spark, dir)
    assert(!f.exists(new Path(dir, ".tmp-deadbeef")))
    assert(f.exists(new Path(dir, "v=5")))
    Snapshot.vacuum(spark, dir, reclaimOrphans = true)
    assert(!f.exists(new Path(dir, "v=5")))
    assert(Snapshot.read(spark, dir).count() === 10)
  }

  test("publish after an orphaned version dir never reuses its number") {
    val dir = tmpDir()
    Snapshot.publish(corpus(10, "a"), dir)
    corpus(99, "orphan").write.parquet(s"$dir/v=7") // crashed publisher
    val v = Snapshot.publish(corpus(20, "b"), dir)
    assert(v === 8L) // rename-if-absent skipped the occupied slot
    assert(Snapshot.read(spark, dir).count() === 20)
  }

  test("compact bin-packs the small-files tail and preserves every row") {
    val dir = tmpDir()
    // 16 part files of ~100 rows each
    Snapshot.publish(corpus(1600, "x").repartition(16), dir)
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts(v: Long) = f.listStatus(new Path(dir, s"v=$v"))
      .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
    assert(parts(1L) === 16)
    val v2 = Snapshot.compact(spark, dir, targetBytes = 1L << 30)
    assert(v2 === Some(2L))
    assert(parts(2L) === 1) // everything fits one 1 GiB target file
    val rows = Snapshot.read(spark, dir).orderBy("doc_id")
      .collect().map(_.getString(1))
    assert(rows.length === 1600 && rows.distinct.length === 1600)
    // already-compact layout: no version churn
    assert(Snapshot.compact(spark, dir, targetBytes = 1L << 30).isEmpty)
  }

  test("publishClustered writes disjoint per-file key ranges") {
    val dir = tmpDir()
    Snapshot.publishClustered(corpus(1000, "k"), dir, "doc_id", nFiles = 4)
    val ranges = Snapshot.fileRanges(spark, dir, "doc_id")
      .orderBy("key_min")
      .collect().map(r => (r.getAs[Long]("key_min"), r.getAs[Long]("key_max")))
    assert(ranges.length === 4)
    // ranges are disjoint and ordered: every file's min exceeds the
    // previous file's max, so footer stats prune whole files
    ranges.sliding(2).foreach { case Array((_, prevMax), (curMin, _)) =>
      assert(curMin > prevMax)
    }
    assert(ranges.map { case (lo, hi) => hi - lo + 1 }.sum >= 1000)
  }

  test("z-order: rows preserved; every listed column prunes, not just the cluster key") {
    import org.apache.spark.sql.functions._
    val df = spark.range(4096).select(col("id"),
      (pmod(xxhash64(col("id")), lit(1000)).cast("double") / 1000.0).as("d1"),
      (pmod(xxhash64(col("id"), lit(7)), lit(1000)).cast("double") / 1000.0).as("d2"))
    val dirZ = tmpDir(); val dirL = tmpDir()
    Snapshot.publishZOrdered(df, dirZ, Seq("d1", "d2"), nFiles = 16, bits = 4)
    Snapshot.publishClustered(df, dirL, "d1", nFiles = 16)
    // a layout op must not change content
    assert(Snapshot.read(spark, dirZ).orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
    // per-file envelopes: files whose [min,max] box intersects
    // d2 ∈ [0.40, 0.45] — the dimension the single-key layout CANNOT
    // prune (its files all span d2 fully), while the z-order envelope
    // stays tight in both dimensions
    def d2Files(dir: String): Long =
      Snapshot.read(spark, dir)
        .select(input_file_name().as("f"), col("d2"))
        .groupBy("f").agg(min("d2").as("lo"), max("d2").as("hi"))
        .filter(!(col("hi") < 0.40 || col("lo") > 0.45)).count()
    val (zf, lf) = (d2Files(dirZ), d2Files(dirL))
    assert(lf === 16L, s"single-key layout should span d2 in every file, got $lf")
    assert(zf <= 8L, s"z-order failed to bound d2 envelopes: $zf of 16 files")
  }

  test("concurrent publishers all commit distinct versions") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = tmpDir()
    // 6 racing publishers: the rename-if-absent mutex must hand each a
    // distinct version slot, and the final pointer must be readable
    val versions = Await.result(
      Future.sequence((1 to 6).map(i => Future {
        Snapshot.publish(corpus(10 * i, s"w$i"), dir)
      })), 120.seconds)
    assert(versions.toSet.size === 6) // no slot won twice
    assert(versions.toSet === (1L to 6L).toSet)
    // the pointer lands on SOME committed version (last swing wins —
    // publishes are atomic, ordering between racers is unspecified)
    val live = Snapshot.latestVersion(spark, dir).get
    assert(versions.contains(live))
    assert(Snapshot.read(spark, dir).count() ===
      10 * versions.indexOf(live) + 10)
    // and every committed version remains pinnable
    versions.foreach(v =>
      assert(Snapshot.read(spark, dir, Some(v)).count() ===
        10 * versions.indexOf(v) + 10))
  }

  test("curateToSnapshot publishes the curated frame and releases its caches") {
    val s = spark; import s.implicits._
    val d = (0L until 40L).map(i =>
        (i, s"src${i % 2}", s"the quick brown fox ${i % 7} jumps over dog $i"))
      .toDF("doc_id", "source", "text")
    val dir = tmpDir()
    val v = graft.pipeline.Curation.curateToSnapshot(d,
      d.filter(col("doc_id") % 13 === 0), 0.5, -1.0, 0.9, 10, "salt", 64, dir)
    assert(v === 1L)
    val direct = graft.pipeline.Curation.curateScoped(d,
      d.filter(col("doc_id") % 13 === 0), 0.5, -1.0, 0.9, 10, "salt", 64)
    try {
      val want = direct._1.select("doc_id").collect().map(_.getLong(0)).sorted
      val got = Snapshot.read(spark, dir).select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(got === want && got.nonEmpty)
    } finally direct._2()
    // the publish path released the curation caches too
    assert(s.sharedState.cacheManager.isEmpty)
  }

  test("diff: hand-planted add/remove/change; schema drift refused") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    val v1 = Snapshot.publish(Seq(
      (1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"))
      .toDF("doc_id", "text", "source"), dir)
    val v2 = Snapshot.publish(Seq(
      (1L, "one", "a"),            // untouched → absent from the diff
      (2L, "two EDITED", "a"),     // changed
      (4L, "four", "b"))           // added; 3 removed
      .toDF("doc_id", "text", "source"), dir)
    val got = Snapshot.diff(spark, dir, Seq("doc_id"), v1, v2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // identical versions diff to nothing
    assert(Snapshot.diff(spark, dir, Seq("doc_id"), v1, v1).count() === 0L)
    // a column rename between versions must refuse, not silently diff
    val v3 = Snapshot.publish(Seq((1L, "one"))
      .toDF("doc_id", "body"), dir)
    val ex = intercept[IllegalArgumentException](
      Snapshot.diff(spark, dir, Seq("doc_id"), v2, v3))
    assert(ex.getMessage.contains("schema drift"))
  }

  test("vacuum keeps the grace window and the live version") {
    val dir = tmpDir()
    (1 to 4).foreach(i => Snapshot.publish(corpus(i * 10, s"v$i"), dir))
    Snapshot.vacuum(spark, dir, keepVersions = 2)
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new Path(dir, "v=1")))
    assert(!f.exists(new Path(dir, "v=2")))
    assert(f.exists(new Path(dir, "v=3"))) // grace window for live readers
    assert(Snapshot.read(spark, dir).count() === 40)
  }
}
