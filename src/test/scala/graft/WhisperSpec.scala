package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.sources.Whisper
import graft.sources.Whisper.Point

/** Whisper import conformance: hand-built file images exercising the
  * documented quirks of `cmd/whisper_import/process.go:355-400` — the
  * +step slot-end shift, the per-archive [start, end) chain, ghost-point
  * exclusion, the newest-point drop on the finest archive, and empty
  * (ts=0) slots — plus the Spark binaryFile read path and the
  * whisper-wins backfill merge. */
class WhisperSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]")
      .appName("whisper-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  test("header + archive dump round-trip") {
    val blob = Whisper.encode(1, 0.5f, Seq(
      60L -> Seq(Point(600, 1.0), Point(660, 2.0), Point(0, 0.0)),
      300L -> Seq(Point(300, 9.0))))
    val hdr = Whisper.readHeader(blob)
    assert(hdr.cf === 1 && hdr.xff === 0.5f)
    assert(hdr.archives.map(a => (a.stepSec, a.size)) === Seq((60L, 3L), (300L, 1L)))
    assert(Whisper.dumpArchive(blob, hdr.archives(0)) ===
      Seq(Point(600, 1.0), Point(660, 2.0), Point(0, 0.0)))
  }

  test("single archive: +step shift, newest point dropped, empties skipped") {
    // 3 slots of step 60: ts 600, 660, 720 — span 180+ (size 4 w/ empty)
    val blob = Whisper.encode(1, 0.5f, Seq(
      60L -> Seq(Point(0, 0.0), Point(600, 1.0), Point(660, 2.0), Point(720, 3.0))))
    // last = 720+60 = 780, start = 780-240 = 540, end = 780
    // emitted t: 660 (600+60), 720; t=780 fails t<end — reference drops
    // the newest point (process.go:384-391)
    assert(Whisper.extractPoints(blob) === Seq(Point(660, 1.0), Point(720, 2.0)))
  }

  test("ghost points outside the archive range are excluded") {
    // size 2 × step 60 → span 120; last = 1260, start = 1140
    // ghost slot ts=600 (t=660 < start) from an old round-robin pass
    val blob = Whisper.encode(1, 0.5f, Seq(
      60L -> Seq(Point(600, 99.0), Point(1140, 1.0), Point(1200, 2.0))))
    // size=3 → span 180, last=1260, start=1080: t=660 still < 1080 → out
    assert(Whisper.extractPoints(blob) === Seq(Point(1200, 1.0)))
  }

  test("two archives chain: coarse contributes only pre-fine history") {
    // fine: step 60, slots 86460,86520 → last 86580, span 120, start
    //   86460, end 86580 → emits t=86520 (newest t=86580 dropped)
    // coarse: step 300, size 4, slots 0(empty),85500,85800,86100 → last
    //   86400, span 1200, start 85200; end chains to fine's start 86460
    //   → emits t=85800,86100,86400 (the empty slot's t=300 < start)
    val blob = Whisper.encode(1, 0.5f, Seq(
      60L -> Seq(Point(86460, 1.0), Point(86520, 2.0)),
      300L -> Seq(Point(0, 0.0), Point(85500, 10.0), Point(85800, 11.0),
        Point(86100, 12.0))))
    assert(Whisper.extractPoints(blob) ===
      Seq(Point(85800, 10.0), Point(86100, 11.0), Point(86400, 12.0),
        Point(86520, 1.0)))
  }

  test("nameFromPath strips dir + .wsp, slashes to dots, optional prefix") {
    assert(Whisper.nameFromPath("/data/whisper/servers/web01/load.wsp",
      "/data/whisper", "") === "servers.web01.load")
    assert(Whisper.nameFromPath("/data/whisper/a/b.wsp", "/data/whisper/", "gr") ===
      "gr.a.b")
  }

  test("specFromHeader: step from finest archive, all RRAs wmean-shaped") {
    val blob = Whisper.encode(2, 0.0f, Seq(
      60L -> Seq(Point(600, 1.0)), 300L -> Seq(Point(300, 2.0))))
    val (step, hb, rras) = Whisper.specFromHeader(Whisper.readHeader(blob), 1800L)
    assert(step === 60L && hb === 1800L)
    assert(rras === Seq((60L, 60L), (300L, 300L)))
  }

  test("readDir: decode .wsp files via binaryFile; bad file skipped") {
    val dir = java.nio.file.Files.createTempDirectory("wsp").toFile
    val sub = new java.io.File(dir, "servers/web01"); sub.mkdirs()
    val blob = Whisper.encode(1, 0.5f, Seq(
      60L -> Seq(Point(600, 1.5), Point(660, 2.5), Point(720, 3.5))))
    java.nio.file.Files.write(new java.io.File(sub, "load.wsp").toPath, blob)
    java.nio.file.Files.write(new java.io.File(sub, "bad.wsp").toPath,
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(new java.io.File(sub, "notwsp.txt").toPath,
      Array[Byte](9))
    val out = Whisper.readDir(spark, dir.getAbsolutePath, dir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    // last=780, start=600(size3·60=180), end=780 → t=660,720 (780 dropped)
    assert(out === Array(
      ("servers.web01.load", 660L, 1.5), ("servers.web01.load", 720L, 2.5)))
  }

  test("backfill: whisper wins covered slots, archive keeps the rest") {
    val s = spark; import s.implicits._
    val archive = Seq(("a", 600L, 1.0), ("a", 660L, 2.0), ("a", 720L, 3.0))
      .toDF("name", "t", "value")
    val wsp = Seq(("a", 660L, 20.0), ("a", 540L, 15.0), ("b", 600L, 7.0))
      .toDF("name", "t", "value")
    val out = Whisper.backfill(archive, wsp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    assert(out === Array(
      ("a", 540L, 15.0), // whisper-only slot added
      ("a", 600L, 1.0),  // archive slot whisper doesn't cover
      ("a", 660L, 20.0), // collision: whisper overwrites the past
      ("a", 720L, 3.0),  // past whisper's latest: protected
      ("b", 600L, 7.0))) // new series entirely
  }

  test("WhisperImport.run: tree walk, stale-series drop, idempotent rerun") {
    import java.nio.file.{Files, Paths}
    val wdir = Files.createTempDirectory("wsp-import").toString
    val adir = Files.createTempDirectory("wsp-archive").toString + "/points"
    Files.createDirectories(Paths.get(s"$wdir/sys/cpu"))
    // live series: slots near nowSec (extract emits 199860, 199920)
    Files.write(Paths.get(s"$wdir/sys/cpu/load.wsp"),
      Whisper.encode(1, 0.5f, Seq(60L ->
        Seq(Point(199800, 1.0), Point(199860, 2.0), Point(199920, 3.0)))))
    // stale series: newest point far in the past relative to nowSec
    Files.write(Paths.get(s"$wdir/sys/old.wsp"),
      Whisper.encode(1, 0.5f, Seq(60L ->
        Seq(Point(60, 9.0), Point(120, 9.0), Point(180, 9.0)))))
    val nowSec = 200000L // old.wsp's newest slot is ~199880s stale
    val (nSeries, nSlots) = WhisperImport.run(spark, wdir, wdir, adir,
      prefix = "imp", staleDays = 2, stepSec = 60L, nowSec = nowSec)
    assert(nSeries === 1L && nSlots === 2L)
    val got = graft.streaming.Ingest.readArchive(spark, adir)
      .orderBy("t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq(
      ("imp.sys.cpu.load", 199860L, 1.0), ("imp.sys.cpu.load", 199920L, 2.0)))
    // rerun REPLACES its own contribution (fixed writer identity):
    // no double-counted weight, byte-identical store contents
    WhisperImport.run(spark, wdir, wdir, adir,
      prefix = "imp", staleDays = 2, stepSec = 60L, nowSec = nowSec)
    val again = graft.streaming.Ingest.readArchive(spark, adir)
      .orderBy("t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(again === got)
  }
}
