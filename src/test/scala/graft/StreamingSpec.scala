package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.{ArchiveStore, Ingest}
import graft.rrd.Consolidate

/** Ingest-path tests: wire parsers (incl. malformed input), streaming
  * windowed consolidation through a real MemoryStream micro-batch run,
  * and the stateful PDP path checked for equivalence against the batch
  * consolidation engine on the same data. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  private def linesDf(ls: String*) = {
    val s = spark; import s.implicits._
    ls.toDF("line")
  }

  test("graphite parser: happy path, ts=-1, sanitize, malformed dropped") {
    val out = Ingest.parseGraphite(linesDf(
      "a.b.c 1.5 100",
      "x/y$z 2 -1",            // name sanitized: x-yz (slash, stripped $)
      "only.two 3.0",          // malformed: 2 fields
      "bad notanumber 5",      // malformed: value
      "n 1 notatime"           // malformed: ts
    ), nowSec = lit(999L)).collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSet == Set(("a.b.c", 100L, 1.5), ("x-yz", 999L, 2.0)))
  }

  test("graphite parser: NaN survives as a boundary point, ±Inf lines drop — ds.go:300, pdp.go:97") {
    val out = Ingest.parseGraphite(linesDf(
      "g.n nan 100",        // Go-style lowercase nan → NaN point kept
      "g.n NaN 110",        // Java-style spelling too
      "g.i inf 100",        // Go inf token: rejected at ingest
      "g.i Infinity 100",   // Java spelling: rejected
      "g.i -Infinity 100",  // negative too
      "g.i 1e999 100",      // overflow → ±Inf → rejected (Go: ErrRange)
      "g.v 5 120"
    ), nowSec = lit(999L)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.count(r => r._1 == "g.n" && r._3.isNaN) === 2)
    assert(!out.exists(_._1 == "g.i"))
    assert(out.count(_._1 == "g.v") === 1)
  }

  test("statsd parser: kinds, sample rate, delta quirk, bare name") {
    val rows = Ingest.parseStatsd(linesDf(
      "gorets:1|c",
      "glork:320|ms|@0.1",
      "gauge:+10|g",
      "gauge:-10|g",        // reference quirk: NOT a delta
      "justname",           // counts as name:1|c
      "bad:x|c",            // dropped: value
      "bad:1|q",            // dropped: metric type
      "bad:1|c|@7"          // dropped: sample out of range
    )).collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getString(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.toSet == Set(
      ("gorets", 1.0, "c", 1.0, false),
      ("glork", 320.0, "ms", 0.1, false),
      ("gauge", 10.0, "g", 1.0, true),
      ("gauge", -10.0, "g", 1.0, false),
      ("justname", 1.0, "c", 1.0, false)))
  }

  test("statsd stat → aggregator command: prefixes, sample scaling, routing") {
    val rows = Ingest.statsdToCommands(Ingest.parseStatsd(linesDf(
      "hits:2|c|@0.1",      // counter at 10% sampling → 20 effective
      "temp:42|g",          // absolute gauge
      "adjust:+5|g",        // delta gauge
      "lat:320|ms"          // timer
    ))).collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set(
      ("stats.hits", "add", 20.0),
      ("stats.gauges.temp", "setgauge", 42.0),
      ("stats.gauges.adjust", "addgauge", 5.0),
      ("stats.timers.lat", "append", 320.0)))
  }

  test("streaming whisper consolidation matches batch on the same data") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val points = mem.toDF().toDF("name", "tsSec", "value")

    val q = Ingest.streamWhisper(points, stepSec = 10, lateness = "0 seconds")
      .writeStream.format("memory").queryName("slots").outputMode("complete")
      .start()
    mem.addData(("a", 5L, 1.0), ("a", 7L, 3.0), ("a", 15L, 5.0), ("b", 21L, 7.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("slots").as[(String, Long, Double)].collect().toSet
    assert(got == Set(("a", 0L, 2.0), ("a", 10L, 5.0), ("b", 20L, 7.0)))
  }

  test("rangeJoin is streaming-capable: stream-static interval match ≡ batch") {
    // the bucketized interval join is STATELESS per point row, so the
    // same plan runs stream-static unchanged (append mode, no
    // watermark needed) — points arriving across micro-batches match
    // the static window table exactly as the batch operator does
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ivs = Seq((1L, 100L, 200L), (2L, 150L, 300L), (3L, 1000L, 1000L))
      .toDF("iv_id", "t_start", "t_end")
    val mem = MemoryStream[(Long, Long)]
    val pts = mem.toDF().toDF("pt_id", "t")
    val q = graft.pipeline.Events.rangeJoin(pts, ivs, widthUs = 64L)
      .writeStream.format("memory").queryName("rj").outputMode("append")
      .start()
    mem.addData((10L, 99L), (11L, 100L), (12L, 175L))
    q.processAllAvailable()
    mem.addData((13L, 300L), (14L, 1000L), (15L, 999L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rj").as[(Long, Long, Long)].collect().toSet
    val batch = graft.pipeline.Events.rangeJoin(
        Seq((10L, 99L), (11L, 100L), (12L, 175L), (13L, 300L),
          (14L, 1000L), (15L, 999L)).toDF("pt_id", "t"), ivs, 64L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === batch)
    assert(got === Set((11L, 1L, 100L), (12L, 1L, 175L), (12L, 2L, 175L),
      (13L, 2L, 300L), (14L, 3L, 1000L)))
  }

  test("live top-talkers: sketch state accumulates across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val points = mem.toDF().toDF("name", "tsSec", "value")
    val q = Ingest.liveTopTalkers(points, k = 16)
      .writeStream.format("memory").queryName("talkers")
      .outputMode("complete").start()
    mem.addData(("noisy", 1L, 1.0), ("noisy", 2L, 1.0), ("quiet", 3L, 1.0))
    q.processAllAvailable()
    // second batch merges into the SAME sketch buffer in the state
    // store — counts accumulate, they don't reset per batch
    mem.addData(("noisy", 4L, 1.0), ("noisy", 5L, 1.0), ("late", 6L, 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("talkers").as[(String, Long)].collect().toMap
    assert(got === Map("noisy" -> 4L, "quiet" -> 1L, "late" -> 1L))
  }

  test("live value quantiles: sketch state accumulates across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val points = mem.toDF().toDF("name", "tsSec", "value")
    val q = Ingest.liveValueQuantiles(points, k = 64, qs = Seq(0.5, 1.0))
      .writeStream.format("memory").queryName("liveq")
      .outputMode("complete").start()
    // the NaN boundary point must contribute NOTHING (rrd/pdp.go:
    // 97-99 AddValue no-op policy): it would otherwise inflate total
    // weight and return NaN for the upper quantile
    mem.addData(("lat", 1L, 10.0), ("lat", 2L, 30.0), ("other", 3L, 5.0),
      ("lat", 0L, Double.NaN))
    q.processAllAvailable()
    // the second batch merges into the SAME compactor stack: the
    // median is over ALL FIVE lat points (10 20 30 40 50 → 30), not
    // the last batch's
    mem.addData(("lat", 4L, 20.0), ("lat", 5L, 40.0), ("lat", 6L, 50.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("liveq").as[(String, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("lat" -> ((30.0, 50.0)), "other" -> ((5.0, 5.0))))
  }

  test("streaming sessionization: session_window closes sessions past the watermark") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val q = graft.pipeline.Events.sessionizeStream(events, "10 seconds", "0 seconds")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // two events 5s apart merge into one session window [0, 15)
    mem.addData((1L, ts(0)), (1L, ts(5)))
    q.processAllAvailable()
    // an event far past the gap advances the watermark beyond the
    // first session's close; the next batch flushes it (append mode
    // emits each closed session exactly once)
    mem.addData((1L, ts(100)))
    q.processAllAvailable()
    mem.addData((2L, ts(200)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess").as[(Long, Long, Long)].collect().toSet
    // the closed session: user 1, start t=0 (µs), both events merged
    assert(got.contains((1L, 0L, 2L)), s"got $got")
    // the open sessions (user 1 @100s, user 2 @200s) must NOT have
    // been emitted yet
    assert(!got.exists(r => r._2 == 200000000L))
  }

  test("pickle frames stream end-to-end: binary micro-batches → slots") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.streaming.Pickle
    // a TCP receiver would hand whole frames to the stream; batch
    // boundaries land anywhere between frames
    val mem = MemoryStream[Array[Byte]]
    val points = mem.toDS().flatMap(Pickle.decodeFrames(_))
      .select(col("name"), col("tsSec"), col("value"))
    val q = Ingest.streamWhisper(points, stepSec = 10, lateness = "0 seconds")
      .writeStream.format("memory").queryName("pkslots").outputMode("complete")
      .start()
    mem.addData(Pickle.encodeFrame(Seq(
      Pickle.Point("a", 5L, 1.0), Pickle.Point("a", 7L, 3.0))))
    mem.addData(Pickle.encodeFrame(Seq(
      Pickle.Point("a", 15L, 5.0), Pickle.Point("b", 21L, 7.0))))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("pkslots").as[(String, Long, Double)].collect().toSet
    // identical slots to the text-path test: the wire format is the
    // only difference between the two ingest paths
    assert(got == Set(("a", 0L, 2.0), ("a", 10L, 5.0), ("b", 20L, 7.0)))
  }

  test("incremental near-dup across micro-batches via foreachBatch stores") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.pipeline.NearDup
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val mem = MemoryStream[(Long, String)]
    // parquet-backed stores, appended per batch — the production shape
    val dir = java.nio.file.Files.createTempDirectory("inc").toString
    val dirs = Map("fps" -> s"$dir/fps", "sets" -> s"$dir/sets",
      "bands" -> s"$dir/bands", "members" -> s"$dir/members")
    // seed empty stores with the right schemas
    val seed = NearDup.indexCorpus(Seq((-1L, "seed")).toDF("doc_id", "text"))
    seed.fps.limit(0).write.parquet(dirs("fps"))
    seed.sets.limit(0).write.parquet(dirs("sets"))
    seed.bands.limit(0).write.parquet(dirs("bands"))
    seed.members.limit(0).write.parquet(dirs("members"))
    def store = NearDup.NearDupState(
      s.read.parquet(dirs("fps")), s.read.parquet(dirs("sets")),
      s.read.parquet(dirs("bands")), s.read.parquet(dirs("members")))
    val found = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = mem.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (pairs, app) = NearDup.minhashIncrement(batch, store, 0.5)
        found ++= pairs.select("doc_a", "doc_b").as[(Long, Long)].collect()
        app.fps.write.mode("append").parquet(dirs("fps"))
        app.sets.write.mode("append").parquet(dirs("sets"))
        app.bands.write.mode("append").parquet(dirs("bands"))
        app.members.write.mode("append").parquet(dirs("members"))
        // per the operator contract: release the batch's persisted
        // shingle frame so cached blocks don't accumulate across batches
        app.sets.unpersist()
        ()
      }
      .start()
    mem.addData((1L, base), (2L, "totally unrelated words only here"))
    q.processAllAvailable()
    assert(found.isEmpty) // batch 1: no dups yet
    // batch 2: doc 3 near-dups doc 1 (one word differs) — found against
    // the STORE, not within its own batch
    mem.addData((3L, base.replace("kappa", "lambda")))
    q.processAllAvailable()
    q.stop()
    assert(found.toSet === Set((1L, 3L)))
  }

  test("incremental near-dup: 1k byte-identical docs add ZERO index rows") {
    val s = spark; import s.implicits._
    import graft.pipeline.NearDup
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val st = NearDup.indexCorpus(Seq(
      (1L, base), (2L, "totally unrelated words only here"))
      .toDF("doc_id", "text"))
    // crawl pathology: a micro-batch of 1 000 byte-identical copies of
    // a STORED text — the case that used to re-degenerate the buckets
    val copies = (100L until 1100L).map(i => (i, base))
    val (pairs, app) = NearDup.minhashIncrement(
      copies.toDF("doc_id", "text"), st, 0.5)
    // structural guard: fp-matched copies create no reps, sets, bands
    assert(app.sets.count() === 0L)
    assert(app.bands.count() === 0L)
    assert(app.fps.count() === 0L)
    assert(app.members.count() === 1000L)
    // output is still the full answer: 1001 identical docs pair up
    assert(pairs.count() === 1001L * 1000L / 2)
    // batch of 1 000 identical copies of an UNSEEN text: exactly one
    // rep enters the index — one set row, one row per band bucket
    val fresh = (2000L until 3000L).map(i => (i, base.replace("alpha", "omega")))
    val (pairs2, app2) = NearDup.minhashIncrement(
      fresh.toDF("doc_id", "text"), st, 0.5)
    assert(app2.sets.count() === 1L)
    assert(app2.fps.count() === 1L)
    val bandsPerDoc = st.bands.filter(col("doc_id") === 1L).count()
    assert(app2.bands.count() === bandsPerDoc)
    // 1000 identical copies pair with each other, plus near-dup pairs
    // to stored rep 1 (one word differs) expanded to every copy
    val within2 = 1000L * 999L / 2
    val cross2 = pairs2.filter(col("doc_a") === 1L).count()
    assert(pairs2.count() === within2 + cross2)
    assert(cross2 === 1000L) // rep-level pair (1, 2000) × 1000 members
    app.sets.unpersist(); app2.sets.unpersist()
  }

  test("timers: sub-50 threshold on a 1-sample window skips, not crashes") {
    val s = spark; import s.implicits._
    import graft.streaming.StatsdAgg
    // one sample → idx = round(0.25·1)−1 = −1: the reference would
    // panic on list[-1]; we adopt etsy-statsd's skip
    val one = Seq(("lat", 0L, 7.0, 0L)).toDF("name", "tsSec", "value", "seq")
    val out = StatsdAgg.timers(one, 10, Seq(25, 90))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(!out.keys.exists(_.contains("_25"))) // 25th skipped entirely
    assert(out("lat.upper_90") === 7.0)         // 90th present (idx 0)
    assert(out("lat.count") === 1.0)
  }

  test("streaming curation: per-batch quality+decontamination == batch run") {
    // quality and contamination are per-document against a STATIC
    // benchmark, so filtering each micro-batch independently must give
    // exactly the batch-run answer regardless of how the corpus splits
    // — the foreachBatch form a streaming ingest pipeline runs.
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.pipeline.{Curation, TextAnalysis}
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the fast data table join with the sort and the filter plan"),
      (2L, "el la los de que y en un una es"), // no 'the'-profile stopwords
      (3L, "the quick brown fox is on the hill by the river with a map"),
      (4L, "short text"),
      (5L, "the fast data table join with a sort and a filter plan now"))
    val bench = Seq((100L, "fast data table join with the sort"))
      .toDF("doc_id", "text")
    def filterBatch(b: org.apache.spark.sql.DataFrame) = {
      val q = TextAnalysis.qualityScore(b).filter(col("quality") >= 0.5)
        .select(col("doc_id"))
      Curation.contamination(b, bench)
        .filter(col("contaminated_frac") <= 0.5).select(col("doc_id"))
        .join(q, "doc_id")
    }
    val batchAnswer = filterBatch(docs.toDF("doc_id", "text"))
      .as[Long].collect().toSet
    val kept = scala.collection.mutable.Set.empty[Long]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        kept ++= filterBatch(batch).as[Long].collect()
        ()
      }
      .start()
    mem.addData(docs.take(2): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    assert(kept.toSet === batchAnswer)
    assert(kept.nonEmpty && kept.size < docs.size) // both filters bind
  }

  test("live view: archive ∪ unflushed stream state, archive wins collisions") {
    val s = spark; import s.implicits._
    // flushed archive: slots 0 and 10
    val archive = Seq(("a", 0L, 2.0), ("a", 10L, 4.0)).toDF("name", "t", "value")
    // unflushed pieces: one refining slot 10 (stale — archive must win),
    // one extending into slot 20
    val pending = Seq(
      Ingest.Piece("a", 10L, 20L, 99.0),
      Ingest.Piece("a", 20L, 30L, 8.0)).toDF()
    val live = Ingest.liveSeries(archive, pending, stepSec = 10)
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(live == Map(0L -> 2.0, 10L -> 4.0, 20L -> 8.0))
  }

  test("retention: whole partitions past the span age out, straddlers stay") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ret").toString + "/slots"
    // tiny partitions: 10 slots × 10s = 100s per pt dir
    val slots = 10L
    val pieces = (0L until 40L).map(i =>
      Ingest.Piece("a", i * 10, i * 10 + 10, 1.0))
    Ingest.mergePiecesIntoArchive(s, pieces.toDF(), dir, stepSec = 10,
      partitionSlots = slots)
    assert(Ingest.readArchive(s, dir).count() === 40) // pt 0..3
    // now = 400, span = 150: horizon 250 → pt 0 ([0,100)) and pt 1
    // ([100,200)) fully aged; pt 2 ([200,300)) straddles → kept whole
    val dropped = Ingest.enforceRetention(s, dir, stepSec = 10,
      spanSec = 150, nowSec = 400, partitionSlots = slots)
    assert(dropped === Seq(0L, 1L))
    val left = Ingest.readArchive(s, dir).collect().map(_.getLong(1))
    assert(left.length === 20 && left.forall(_ >= 200L))
    // idempotent: nothing more to drop at the same horizon
    assert(Ingest.enforceRetention(s, dir, 10, 150, 400, slots).isEmpty)
    // absent store: no-op
    assert(Ingest.enforceRetention(s, dir + "-absent", 10, 150, 400, slots).isEmpty)
  }

  test("readArchives: multi-store slot collisions weighted-merge on partials") {
    val s = spark; import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-multi").toString
    // store A: slot ("a", 0) from 10s at value 2; store B: SAME slot
    // from 30s at value 6 — the union must weighted-mean: (2·10+6·30)/40
    Seq(("a", 0L, 20.0, 10.0)).toDF("name", "t", "vw", "dur")
      .withColumn("pt", lit(0L)).write.partitionBy("pt")
      .parquet(s"$base/p1/data-a")
    ArchiveStore.commit(s, s"$base/p1", Map(0L -> "data-a"))
    Seq(("a", 0L, 180.0, 30.0), ("b", 10L, 5.0, 5.0))
      .toDF("name", "t", "vw", "dur")
      .withColumn("pt", lit(0L)).write.partitionBy("pt")
      .parquet(s"$base/p2/data-b")
    ArchiveStore.commit(s, s"$base/p2", Map(0L -> "data-b"))
    val got = Ingest.readArchives(s, Seq(s"$base/p1", s"$base/p2",
        s"$base/absent")) // not-yet-written store reads as empty
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got === Map(("a", 0L) -> 5.0, ("b", 10L) -> 1.0))
    // single present store: plain read, no merge layer
    val one = Ingest.readArchives(s, Seq(s"$base/p1", s"$base/absent"))
      .collect().map(r => r.getDouble(2))
    assert(one.toSeq === Seq(2.0))
    // nothing present: empty frame with the series schema
    assert(Ingest.readArchives(s, Seq(s"$base/absent")).isEmpty)
  }

  test("live view: the archive branch of the union never shuffles") {
    val s = spark; import s.implicits._
    // a REAL parquet store, as in production — the archive side of the
    // watch view must reach the union as a plain scan; only the
    // micro-batch-sized pending side may exchange (its slot aggregation
    // and the broadcast of the t-pruned collision probe)
    val dir = java.nio.file.Files.createTempDirectory("graft-live").toString + "/slots"
    s.range(1000).select(concat(lit("m"), pmod(col("id"), lit(10))).as("name"),
        (col("id") * 10).as("t"), col("id").cast("double").as("vw"),
        lit(1.0).as("dur"))
      .withColumn("pt", floor(col("t").cast("double") / 86400).cast("long"))
      .write.partitionBy("pt").parquet(s"$dir/data-a")
    ArchiveStore.commit(s, dir, Map(0L -> "data-a"))
    val archive = Ingest.readArchive(s, dir)
    val pending = Seq(
      Ingest.Piece("m1", 10000L, 10010L, 5.0),
      Ingest.Piece("m2", 10010L, 10020L, 7.0)).toDF()
    val live = Ingest.liveSeries(archive, pending, stepSec = 10)

    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.UnionExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def findUnion(p: SparkPlan): Option[UnionExec] = p match {
      case a: AdaptiveSparkPlanExec => findUnion(a.executedPlan)
      case u: UnionExec => Some(u)
      case other => other.children.view.flatMap(findUnion).headOption
    }
    val union = findUnion(live.queryExecution.executedPlan)
      .getOrElse(fail("expected a UnionExec in the live-view plan"))
    val archBranch = union.children.head
    val shuffles = archBranch.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"archive branch must be shuffle-free, found:\n$archBranch")
    // and the result is still right: archive wins its slots, pending adds
    val out = live.as[(String, Long, Double)].collect()
    assert(out.count(_._2 >= 10000L) === 2)
    assert(out.length === 1002)
  }

  test("checkpoint restart: PDP state and archive survive, nothing lost or doubled") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-rs").toString
    val archiveDir = s"$dir/slots"
    val ckpt = s"$dir/ckpt"
    val B = 1000000L
    // the daemon lifecycle's exact pipeline shape: stateful PDP pieces →
    // exactly-once merge, on a REPLAYABLE source (what Kafka provides in
    // production — the socket dev source cannot resume offsets)
    val mem = MemoryStream[(String, Long, Double)]
    def start() = Ingest.pdpPieces(s, mem.toDS(), heartbeatSec = 3600).toDF()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        Ingest.mergePiecesIntoArchive(s, batch, archiveDir, stepSec = 10,
          writer = Some(("rs-tok", bid)))
      }
      .start()
    val q1 = start()
    (0 to 50 by 10).foreach(t => mem.addData(("rs.m", B + t, 2.0)))
    q1.processAllAvailable()
    q1.stop()
    assert(Ingest.readArchive(s, archiveDir).count() === 5) // slots 0..40
    // process restart: same checkpoint, same stores — the per-series
    // state (lastTs = B+50) must be RESTORED so the interval spanning
    // the restart, [50, 60), still becomes a slot
    val q2 = start()
    (60 to 90 by 10).foreach(t => mem.addData(("rs.m", B + t, 2.0)))
    q2.processAllAvailable()
    q2.stop()
    val got = Ingest.readArchive(s, archiveDir).collect()
      .map(r => (r.getLong(1) - B, r.getDouble(2))).toMap
    assert(got === (0L to 80L by 10).map(_ -> 2.0).toMap,
      "every slot exactly once, including the one spanning the restart")
  }

  test("cross-process isolation: a reader pinned mid-merge in a separate " +
      "process reads a consistent version") {
    // THE case the MVCC port exists for: at scale, ingest and serving
    // do not share a JVM, so no in-memory lock can isolate them. The
    // writer here is a REAL second JVM (MergeTool → its own
    // SparkSession → mergePiecesIntoArchive); this process pins a
    // snapshot before the merge and must read exactly that content
    // after it — and see the new version the instant it re-resolves.
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-xproc").toString + "/slots"
    Ingest.mergePiecesIntoArchive(s,
      Seq(Ingest.Piece("xp.m", 0L, 20L, 2.0)).toDF(), dir, stepSec = 10)
    val st1 = ArchiveStore.state(s, dir).get
    def readPinned(st: ArchiveStore.State): Map[Long, Double] =
      Ingest.readArchives(s, Seq(dir), pinned = Some(Seq(Some(st))))
        .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val c1 = readPinned(st1)
    assert(c1 === Map(0L -> 2.0, 10L -> 2.0))
    // out-of-process merge: same slots refined + a new one
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Xmx2g",
      "-cp", System.getProperty("java.class.path"),
      "graft.streaming.MergeTool", dir, "10", "xp.m", "10", "40", "8.0"))
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val log = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() === 0, s"MergeTool failed:\n${log.takeRight(2000)}")
    // the child's commit is visible HERE through the filesystem alone
    val st2 = ArchiveStore.state(s, dir).get
    assert(st2.version > st1.version, "out-of-process commit not visible")
    // piece [10,40) at 8.0: slot 10 refines to (2*10+8*10)/20, slots
    // 20 and 30 are new
    val c2 = readPinned(st2)
    assert(c2 === Map(0L -> 2.0, 10L -> 5.0, 20L -> 8.0, 30L -> 8.0))
    // the PINNED pre-merge read is bit-stable after the commit...
    assert(readPinned(st1) === c1, "pinned version torn by concurrent merge")
    // ...and survives retention + vacuum thanks to the reader grace
    // window (keepVersions retains st1's manifest and its chunks)
    Ingest.enforceRetention(s, dir, stepSec = 10, spanSec = 10L * 8640 * 4,
      nowSec = 1000L, keepVersions = 8)
    assert(readPinned(st1) === c1, "pinned version lost to vacuum grace")
    // while a grace-less vacuum (keepVersions = 1) does reclaim it:
    // the old chunks disappear once no retained manifest references
    // them — storage is actually bounded, not leak-by-grace
    ArchiveStore.vacuum(s, dir, keepVersions = 1, orphanGraceMs = 0L)
    assert(ArchiveStore.state(s, dir, Some(st1.version)).isEmpty,
      "vacuum(keep=1) left the superseded version")
    assert(readPinned(st2) === c2, "latest version must survive vacuum")
  }

  test("archive compaction: live content collapses to one chunk, " +
      "content and replay identity preserved") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-compact").toString + "/slots"
    // three merges → up to three live chunks in the manifest
    Seq((0L, 2.0), (40L, 4.0), (80L, 6.0)).zipWithIndex.foreach {
      case ((t0, v), i) =>
        Ingest.mergePiecesIntoArchive(s,
          Seq(Ingest.Piece("cp.m", t0, t0 + 20L, v)).toDF(),
          dir, stepSec = 10, partitionSlots = 2,
          writer = Some(("tok", i.toLong)))
    }
    val before = Ingest.readArchive(s, dir)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val chunksBefore = ArchiveStore.state(s, dir).get.manifest.values.toSet
    assert(chunksBefore.size === 3, chunksBefore)
    val v = ArchiveStore.compact(s, dir, keepVersions = 1)
    assert(v.nonEmpty)
    val st = ArchiveStore.state(s, dir).get
    assert(st.manifest.values.toSet.size === 1, "compaction left >1 chunk")
    assert(st.manifest.keySet ===
      Set(0L, 2L, 4L)) // pts at 20s partitions: t 0-20, 40-60, 80-100
    // content identical through the rewrite
    val after = Ingest.readArchive(s, dir)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(after === before)
    // replay identity survives: re-merging batch 2 with the same
    // writer identity is a no-op (its bid stamp rode the compaction)
    Ingest.mergePiecesIntoArchive(s,
      Seq(Ingest.Piece("cp.m", 80L, 100L, 6.0)).toDF(),
      dir, stepSec = 10, partitionSlots = 2,
      writer = Some(("tok", 2L)))
    assert(Ingest.readArchive(s, dir)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap === before)
    // and a NEW merge on the compacted store still works
    Ingest.mergePiecesIntoArchive(s,
      Seq(Ingest.Piece("cp.m", 120L, 140L, 8.0)).toDF(),
      dir, stepSec = 10, partitionSlots = 2, writer = Some(("tok", 3L)))
    assert(Ingest.readArchive(s, dir).count() === before.size + 2L)
  }

  test("tiered compaction: settled big chunks never rewrite, " +
      "same-tier debris folds, under-fanout tiers are left alone") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tiered").toString + "/slots"
    // hand-build a store with one BIG settled chunk and two tiny
    // batch-debris chunks (committed through the manifest protocol,
    // never raw pt= dirs). The tiny chunks carry byte-identical files
    // (pt lives in the directory name, not the file), so they land in
    // the same size tier by construction; the big chunk's
    // incompressible 20k rows put it tiers above them.
    def writeChunk(pt: Long, rows: Int): String = {
      val dd = ArchiveStore.newDataDir()
      (0 until rows).map(i =>
        ("tc.m", i.toLong, math.sin(i.toDouble), 10.0, pt, ""))
        .toDF("name", "t", "vw", "dur", "pt", "bid")
        .coalesce(1).write.partitionBy("pt").parquet(s"$dir/$dd")
      dd
    }
    val big = writeChunk(0L, 20000)
    val s1 = writeChunk(1L, 1)
    val s2 = writeChunk(2L, 1)
    ArchiveStore.commit(s, dir, Map(0L -> big, 1L -> s1, 2L -> s2))
    val rowsBefore = ArchiveStore.readLatest(s, dir).count()
    // fanout=3: no tier holds 3 chunks — compaction declines, nothing
    // is rewritten, the manifest is untouched
    assert(ArchiveStore.compact(s, dir, fanout = 3, tierBytes = 1).isEmpty)
    assert(ArchiveStore.state(s, dir).get.manifest ===
      Map(0L -> big, 1L -> s1, 2L -> s2))
    // fanout=2: the tiny tier folds to one fresh chunk; the settled
    // big chunk keeps its identity — zero bytes of history rewritten
    assert(ArchiveStore.compact(s, dir, fanout = 2, tierBytes = 1).nonEmpty)
    val m = ArchiveStore.state(s, dir).get.manifest
    assert(m(0L) === big, "settled chunk was rewritten")
    assert(m(1L) === m(2L), "tiny chunks should share the folded chunk")
    assert((m(1L) !== s1) && (m(1L) !== s2))
    assert(ArchiveStore.readLatest(s, dir).count() === rowsBefore)
  }

  test("archive merge: batch replay is idempotent, restarts don't double-count") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-eo").toString + "/slots"
    def snap() = Ingest.readArchive(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val b0 = Seq(Ingest.Piece("a", 0L, 20L, 2.0)).toDF()
    val b1 = Seq(Ingest.Piece("a", 20L, 40L, 6.0)).toDF()
    // batch 0 commits, then REPLAYS (crash after commit, source
    // re-delivers with the same batchId): the store must not change
    Ingest.mergePiecesIntoArchive(s, b0, dir, stepSec = 10,
      writer = Some(("tokA", 0L)))
    val after0 = snap()
    Ingest.mergePiecesIntoArchive(s, b0, dir, stepSec = 10,
      writer = Some(("tokA", 0L)))
    assert(snap() === after0, "replayed batch must be a no-op")
    // next batch applies once, then replays — still once
    Ingest.mergePiecesIntoArchive(s, b1, dir, stepSec = 10,
      writer = Some(("tokA", 1L)))
    val after1 = snap()
    assert(after1 === Map(("a", 0L) -> 2.0, ("a", 10L) -> 2.0,
      ("a", 20L) -> 6.0, ("a", 30L) -> 6.0))
    Ingest.mergePiecesIntoArchive(s, b1, dir, stepSec = 10,
      writer = Some(("tokA", 1L)))
    assert(snap() === after1, "replayed batch must be a no-op")
    // a DIFFERENT writer reusing batchId 0 (fresh checkpoint dir, new
    // token) must NOT be mistaken for a replay — it adds
    Ingest.mergePiecesIntoArchive(s, b0, dir, stepSec = 10,
      writer = Some(("tokB", 0L)))
    assert(snap()(("a", 0L)) === 2.0) // same value: weighted mean of 2&2
    assert(Ingest.readArchive(s, dir).count() === 4)
    // and plain additive mode (no writer) still adds on every call
    Ingest.mergePiecesIntoArchive(s, b0, dir, stepSec = 10)
    assert(snap()(("a", 0L)) === 2.0)
  }

  test("foreachBatch archive merge: slots stay exact across batch splits") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-arch").toString + "/slots"

    val mem = MemoryStream[(String, Long, Double)]
    val pieces = Ingest.pdpPieces(s, mem.toDS(), heartbeatSec = 60)
    val q = pieces.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Ingest.Piece], _: Long) =>
        Ingest.mergePiecesIntoArchive(s, batch.toDF(), dir, stepSec = 10)
      }
      .outputMode("append").start()
    // slot [10,20) is split across the two micro-batches: piece [10,15)
    // arrives in batch 1, piece [15,20) in batch 2 — the merged slot
    // must still be the exact weighted mean 2*0.5 + 6*0.5 = 4.
    // B keeps event times above the initial watermark (0): rows at
    // event-time ≤ watermark are dropped as late, like any real stream.
    val B = 100000L
    mem.addData(("a", B + 0L, 9.0), ("a", B + 10L, 1.0), ("a", B + 15L, 2.0))
    q.processAllAvailable()
    mem.addData(("a", B + 20L, 6.0), ("a", B + 30L, 8.0))
    q.processAllAvailable()
    q.stop()

    val slots = Ingest.readArchive(s, dir)
      .as[(String, Long, Double)].collect().map(r => r._2 - B -> r._3).toMap
    assert(slots == Map(0L -> 1.0, 10L -> 4.0, 20L -> 8.0))
  }

  test("archive merge touches only the time partitions the batch lands in") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/slots"

    // resolve a partition's files through the committed manifest: the
    // incremental-merge property is now "an untouched pt keeps its
    // manifest entry AND its chunk files" (nothing rewrites its bytes)
    def files(pt: Long): Map[String, Long] =
      ArchiveStore.state(s, dir).flatMap(_.manifest.get(pt)) match {
        case None => Map.empty
        case Some(dd) =>
          val d = new java.io.File(s"$dir/$dd/pt=$pt")
          if (!d.exists()) Map.empty
          else d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => s"$dd/" + f.getName -> f.lastModified()).toMap
      }

    // stepSec=10, partitionSlots=2 → 20-second partitions
    // batch 1: slots 0,10 (pt=0) and 20 (pt=1)
    Ingest.mergePiecesIntoArchive(s, Seq(
      Ingest.Piece("a", 0L, 20L, 2.0),
      Ingest.Piece("a", 20L, 30L, 4.0)).toDF(), dir, stepSec = 10, partitionSlots = 2)
    val pt0Before = files(0)
    assert(pt0Before.nonEmpty && files(1).nonEmpty)

    // batch 2: refines slot 20 (pt=1) and adds slot 40 (pt=2) — pt=0
    // must not be rewritten (same file names, same mtimes)
    Ingest.mergePiecesIntoArchive(s, Seq(
      Ingest.Piece("a", 25L, 30L, 8.0),
      Ingest.Piece("a", 40L, 50L, 6.0)).toDF(), dir, stepSec = 10, partitionSlots = 2)
    assert(files(0) == pt0Before,
      s"pt=0 was rewritten: ${files(0)} vs $pt0Before")
    assert(files(2).nonEmpty)

    // row identity: slot 20 = (4*10 + 8*5)/15, others plain
    val slots = Ingest.readArchive(s, dir)
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(slots == Map(0L -> 2.0, 10L -> 2.0, 20L -> (4.0 * 10 + 8.0 * 5) / 15, 40L -> 6.0))
  }

  test("idle series state is evicted after a heartbeat of wall-clock " +
      "silence; backfill (old ts) is never dropped as late") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    // heartbeat 2 s of PROCESSING time — eviction is wall-clock
    // idleness (the DS-LRU shape), NOT an event-time watermark
    val pieces = Ingest.pdpPieces(spark, mem.toDS(), heartbeatSec = 2)
    val q = pieces.writeStream.format("memory").queryName("evict")
      .outputMode("append").start()

    val B = 100000L
    mem.addData(("idle", B, 1.0), ("busy", B, 1.0))
    q.processAllAvailable()              // batch 1: watermark 0, unarmed
    mem.addData(("idle", B + 1L, 1.5), ("busy", B + 1L, 2.0))
    q.processAllAvailable()              // batch 2: both series armed
    Thread.sleep(5000)                   // > 2 heartbeats of wall silence
    mem.addData(("busy", B + 2L, 3.0))   // watermark advances...
    q.processAllAvailable()
    mem.addData(("busy", B + 3L, 4.0))   // ...and this batch fires it
    q.processAllAvailable()

    val states = q.recentProgress.flatMap(_.stateOperators.headOption)
      .map(_.numRowsTotal)
    q.stop()
    assert(states.contains(2L),
      s"expected both series in state at some point, got ${states.toSeq}")
    assert(states.last == 1,
      s"expected the idle series evicted, got ${states.toSeq}")

    // BACKFILL acceptance (the reference's `rrd/ds.go:304-306`: only
    // per-series out-of-order is rejected, never "lateness"): after a
    // wall-clock-ts series advanced the event clock by ~100000 s, a
    // series writing OLD timestamps must still store its pieces —
    // under the previous event-time watermark these vanished silently
    val mem2 = MemoryStream[(String, Long, Double)]
    val now = System.currentTimeMillis() / 1000L
    val q2 = Ingest.pdpPieces(spark, mem2.toDS(), heartbeatSec = 300)
      .writeStream.format("memory").queryName("backfill")
      .outputMode("append").start()
    try {
      mem2.addData(("clock", now, 1.0))
      q2.processAllAvailable()
      mem2.addData(("old", now - 3800, 1.0), ("old", now - 3790, 2.0))
      q2.processAllAvailable()
      mem2.addData(("old", now - 3780, 3.0))
      q2.processAllAvailable()
      val oldPieces = spark.table("backfill")
        .filter(col("name") === "old").count()
      assert(oldPieces === 2L,
        s"backfill pieces dropped: got $oldPieces of 2")
    } finally q2.stop()
  }

  test("stateful PDP stream equals batch Consolidate across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // same update stream, fed in two micro-batches split mid-series
    // (B: keep event times above the initial watermark — see merge test)
    val B = 100000L
    val batch1 = Seq(("s", B + 0L, 1.0), ("s", B + 10L, 2.0), ("s", B + 25L, 4.0))
    val batch2 = Seq(("s", B + 40L, 8.0), ("s", B + 30L, 9.9) /* late: dropped */,
      ("s", B + 50L, Double.NaN) /* NaN boundary: contributes nothing */,
      ("s", B + 60L, 6.0) /* interval starts AT the NaN point */,
      ("t", B + 5L, 1.0), ("t", B + 95L, 2.0) /* gap 90 > hb: unknown */)

    val mem = MemoryStream[(String, Long, Double)]
    val pieces = Ingest.pdpPieces(spark, mem.toDS(), heartbeatSec = 60)
    val q = pieces.writeStream.format("memory").queryName("pieces")
      .outputMode("append").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = Ingest.piecesToSlots(
      spark.table("pieces"), stepSec = 10, xff = 0.0)
      .as[(String, Long, Double)].collect().toSet

    val batchDf = (batch1 ++ batch2).toDF("name", "ts", "value")
    val expected = Consolidate.consolidate(
        batchDf, stepSec = 10, cf = "wmean", xff = 0.0, heartbeatSec = 60)
      .as[(String, Long, Double)].collect().toSet

    // the batch engine also excludes the incomplete last slot; the
    // streaming side leaves that to the archive-merge stage, so compare
    // on the slots batch emits
    val streamedOnBatchSlots = streamed.filter { case (n, t, _) =>
      expected.exists(e => e._1 == n && e._2 == t) || !expected.exists(_._1 == n)
    }
    assert(expected.subsetOf(streamed),
      s"batch slots missing from stream: ${expected.diff(streamed)}")
    // and nothing in the stream contradicts batch values where both exist
    streamed.foreach { case (n, t, v) =>
      expected.find(e => e._1 == n && e._2 == t).foreach { e =>
        assert(math.abs(e._3 - v) < 1e-12)
      }
    }
  }

  test("funnel: sequential qualification, not per-stage minima") {
    val s = spark; import s.implicits._
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    // u1: b BEFORE first a, then b again after it → converts through b
    //     (a min-per-stage shortcut would see min(b) < min(a) and miss it),
    //     then c after the qualifying b
    // u2: full chain but c arrives BEFORE the qualifying b → stops at b
    // u3: only a
    // u4: b and c but never a → counts nowhere
    val events = Seq(
      (1L, "b", ts(10)), (1L, "a", ts(20)), (1L, "b", ts(30)), (1L, "c", ts(40)),
      (2L, "a", ts(10)), (2L, "c", ts(20)), (2L, "b", ts(30)),
      (3L, "a", ts(5)),
      (4L, "b", ts(5)), (4L, "c", ts(6))
    ).toDF("user_id", "event_type", "ts")
    val row = graft.pipeline.Events.funnel(events, Seq("a", "b", "c"))
      .collect().head
    assert(row.getLong(row.fieldIndex("n_a")) === 3L)
    assert(row.getLong(row.fieldIndex("n_b")) === 2L)
    assert(row.getLong(row.fieldIndex("n_c")) === 1L)
    // equal timestamps do NOT qualify (strictly-after contract)
    val tie = Seq((7L, "a", ts(10)), (7L, "b", ts(10)))
      .toDF("user_id", "event_type", "ts")
    val trow = graft.pipeline.Events.funnel(tie, Seq("a", "b")).collect().head
    assert(trow.getLong(trow.fieldIndex("n_a")) === 1L)
    assert(trow.getLong(trow.fieldIndex("n_b")) === 0L)
  }

  test("MVCC model run: random merge/compact/retention keeps content " +
      "exact and pinned versions stable") {
    // model-based check of the whole store protocol: a seeded random
    // interleaving of merges (the only content mutator), size-tiered
    // compaction (must be a pure maintenance no-op on content),
    // retention (partition-grain manifest edit), and version pins
    // (grace-window readers must stay byte-stable through later
    // mutations). Values are integer-valued doubles so every vw/dur
    // partial is order-independent-exact and the in-memory model
    // compares with == (no epsilon hiding a real divergence).
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mvcc-model")
      .toString + "/slots"
    val step = 10L; val pslots = 8L; val partSec = step * pslots
    val rnd = new scala.util.Random(7)
    val names = (0 until 5).map(i => s"mdl.s$i")
    val model =
      scala.collection.mutable.Map[(String, Long), (Double, Double)]()
    def modelValues: Map[(String, Long), Double] =
      model.toMap.map { case (k, (vw, dur)) => k -> vw / dur }
    def readAll(): Map[(String, Long), Double] =
      Ingest.readArchive(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    var pinned: Option[(ArchiveStore.State,
      Map[(String, Long), Double], Int)] = None
    var maxT = 0L
    (0 until 24).foreach { op =>
      rnd.nextInt(10) match {
        case r if r < 6 => // merge: the content mutator
          val ps = (0 until 1 + rnd.nextInt(4)).map { _ =>
            val n = names(rnd.nextInt(names.size))
            val slot = rnd.nextInt(40).toLong
            val v = (1 + rnd.nextInt(9)).toDouble
            maxT = math.max(maxT, slot * step)
            Ingest.Piece(n, slot * step, (slot + 1) * step, v)
          }
          Ingest.mergePiecesIntoArchive(spark, ps.toDF(), dir,
            stepSec = step, partitionSlots = pslots,
            writer = Some(("model", op.toLong)))
          ps.foreach { p =>
            val k = (p.name, p.begin)
            val (vw, dur) = model.getOrElse(k, (0.0, 0.0))
            model(k) = (vw + p.value * step, dur + step)
          }
        case 6 | 7 => // compaction: content-invariant maintenance
          ArchiveStore.compact(spark, dir, keepVersions = 8,
            fanout = 2 + rnd.nextInt(3), tierBytes = 1L)
          ()
        case 8 => // retention: partition-grain manifest edit
          val span = (1 + rnd.nextInt(3)).toLong * partSec
          val now = maxT + step
          val horizonPt =
            math.floor((now - span).toDouble / partSec).toLong
          Ingest.enforceRetention(spark, dir, step, span, now,
            partitionSlots = pslots, keepVersions = 8)
          model.keys.filter { case (_, t) =>
            math.floor(t.toDouble / partSec).toLong < horizonPt }.toSeq
            .foreach(model.remove)
        case _ => // pin a snapshot to re-check under later mutations
          ArchiveStore.state(spark, dir).foreach { st =>
            pinned = Some((st, modelValues, op))
          }
      }
      assert(readAll() == modelValues, s"content diverged after op $op")
      pinned.foreach { case (st, want, at) =>
        if (op - at <= 3) {
          val got = ArchiveStore.readRaw(spark, dir, st)
            .select(col("name"), col("t"),
              (col("vw") / col("dur")).as("v"))
            .collect()
            .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
            .toMap
          assert(got == want, s"pinned read diverged at op $op (pin $at)")
        } else pinned = None
      }
    }
  }

  test("exact-dedup stream: bloom epochs, batch slicing ≡ whole-corpus, replay no-op") {
    val s = spark; import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-xdedup").toString
    val (stateDir, outDir) = (s"$base/state", s"$base/out")
    // 60 docs in 6 batches of 10; text repeats with period 7, so dups
    // land within batches, across adjacent batches, AND across epoch
    // boundaries (bloomEvery = 2 -> epochs at bids 2, 4, 6)
    val docs = (0L until 60L).map(i => (i, s"text ${i % 7} body"))
    docs.grouped(10).zipWithIndex.foreach { case (chunk, bid) =>
      graft.streaming.ExactDedupStream.processBatch(s,
        chunk.toDF("doc_id", "text"), bid.toLong, stateDir, outDir,
        bloomEvery = 2, expectedItems = 100L, fpp = 0.01)
    }
    val got = graft.streaming.ExactDedupStream.report(s, outDir)
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    // oracle: a doc is a dup iff a lower doc_id carries the same text
    val want = docs.map { case (id, _) => id -> (id >= 7) }.toMap
    assert(got === want)
    // census holds exactly the 7 distinct texts, keepers = ids 0..6
    val census = graft.streaming.ExactDedupStream
      .readHashes(s, stateDir, ltBid = 6L)
      .select("rep").as[Long].collect().sorted.toSeq
    assert(census === (0L until 7L))
    // replay of the last batch: same report, no doubled census rows
    graft.streaming.ExactDedupStream.processBatch(s,
      docs.grouped(10).toSeq.last.toDF("doc_id", "text"), 5L, stateDir,
      outDir, bloomEvery = 2, expectedItems = 100L, fpp = 0.01)
    assert(graft.streaming.ExactDedupStream.report(s, outDir).count() === 60L)
    assert(graft.streaming.ExactDedupStream
      .readHashes(s, stateDir, ltBid = 6L).count() === 7L)
    // a pathologically small, FP-flooded filter changes nothing: every
    // admission is decided by an exact join (FPs cost, never lie)
    val base2 = java.nio.file.Files.createTempDirectory("graft-xdedup2").toString
    docs.grouped(10).zipWithIndex.foreach { case (chunk, bid) =>
      graft.streaming.ExactDedupStream.processBatch(s,
        chunk.toDF("doc_id", "text"), bid.toLong, s"$base2/state",
        s"$base2/out", bloomEvery = 2, expectedItems = 1L, fpp = 0.5)
    }
    val flooded = graft.streaming.ExactDedupStream.report(s, s"$base2/out")
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(flooded === want)
    // sharded epochs (the past-one-blob's-bit-budget path) answer
    // identically across the same epoch boundaries
    val base3 = java.nio.file.Files.createTempDirectory("graft-xdedup3").toString
    docs.grouped(10).zipWithIndex.foreach { case (chunk, bid) =>
      graft.streaming.ExactDedupStream.processBatch(s,
        chunk.toDF("doc_id", "text"), bid.toLong, s"$base3/state",
        s"$base3/out", bloomEvery = 2, expectedItems = 100L, fpp = 0.01,
        shards = 4)
    }
    val sharded = graft.streaming.ExactDedupStream.report(s, s"$base3/out")
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(sharded === want)
  }

  test("legacy pre-manifest store: reads fail loudly, merge adopts it as v1") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-legacy")
      .toString + "/slots"
    // the round-9 layout: top-level pt= partition dirs, no _latest
    // pointer — a daemon restarted over such a data dir must NOT read
    // it as an empty store and commit a manifest omitting its history
    Seq(("old", 0L, 20.0, 10.0)).toDF("name", "t", "vw", "dur")
      .withColumn("pt", lit(0L)).write.partitionBy("pt").parquet(dir)
    intercept[IllegalStateException] { graft.streaming.ArchiveStore.state(s, dir) }
    intercept[IllegalStateException] { ArchiveStore.readLatest(s, dir) }
    // the first merge adopts in place: pre-existing history becomes v1
    // and survives alongside the new batch
    Ingest.mergePiecesIntoArchive(s,
      Seq(Ingest.Piece("new", 100L, 110L, 3.0)).toDF(), dir, stepSec = 10)
    val got = ArchiveStore.readLatest(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.contains(("old", 0L)) && got(("old", 0L)) === 20.0,
      s"pre-manifest history lost on adoption: $got")
    assert(got.keys.exists(_._1 == "new"), s"merge rows missing: $got")
    // adoption is a no-op on an already-versioned (or empty) store
    assert(ArchiveStore.adoptLegacy(s, dir).isEmpty)
    assert(ArchiveStore.adoptLegacy(s, dir + "-absent").isEmpty)
  }

  test("vacuum: a v>latest dir gets the same grace as staged chunks") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-vgrace")
      .toString + "/slots"
    Seq(("a", 0L, 1.0, 1.0)).toDF("name", "t", "vw", "dur")
      .withColumn("pt", lit(0L)).write.partitionBy("pt")
      .parquet(s"$dir/data-a")
    ArchiveStore.commit(s, dir, Map(0L -> "data-a"))
    // another process's commit caught between its v=N rename and the
    // pointer swing: inside the grace window vacuum must not destroy it
    val v9 = java.nio.file.Paths.get(dir, "v=9")
    java.nio.file.Files.createDirectories(v9)
    java.nio.file.Files.write(v9.resolve("manifest"),
      "0\tdata-a\n".getBytes("UTF-8"))
    ArchiveStore.vacuum(s, dir, keepVersions = 1)
    assert(java.nio.file.Files.exists(v9),
      "in-flight future version deleted inside the grace window")
    // past the window it is debris of a crashed commit and reclaims
    ArchiveStore.vacuum(s, dir, keepVersions = 1, orphanGraceMs = -1)
    assert(!java.nio.file.Files.exists(v9))
    // the committed version and its chunk are untouched throughout
    assert(ArchiveStore.readLatest(s, dir).count() === 1L)
  }

  test("replayable-source swap: file-source twin == gateway path, offset-exact restart") {
    val s = spark; import s.implicits._
    import graft.streaming.Daemon
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft-swap").toString
    val base = 1704067200L // fixed epoch: both paths see explicit ts only
    // three micro-batches over two series; b2 carries an OUT-OF-ORDER
    // point (older than b1's last) that only survives-as-dropped if
    // the PDP state rides the checkpoint across the restart
    val batches = Seq(
      Seq(s"sw.a 1.0 $base", s"sw.b 5.0 $base",
        s"sw.a 2.0 ${base + 10}", s"sw.b 6.0 ${base + 10}"),
      Seq(s"sw.a 3.0 ${base + 20}", s"sw.b 7.0 ${base + 30}"),
      Seq(s"sw.a 9.9 ${base + 5}", // out-of-order: must drop in both paths
        s"sw.a 4.0 ${base + 30}", s"sw.b 8.0 ${base + 40}"))
    // ---- gateway path (the daemon's own source) ----
    val gw = new Daemon.LineGateway(0, 0)
    val pk = new Daemon.LineGateway(0, 0, framed = true)
    val q1 = Daemon.startReceiver(s, gw.boundFeedPort, pk.boundFeedPort,
      s"$root/gw/points", stepSec = 10, heartbeatSec = 7200,
      checkpointDir = s"$root/gw/ckpt")
    try {
      val sock = new java.net.Socket("127.0.0.1", gw.boundListenPort)
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      def rows(tag: String): Long =
        scala.util.Try(Ingest.readArchive(s, s"$root/$tag/points").count())
          .getOrElse(0L)
      // barrier per batch: b2's stale point must reach the state
      // machine in a LATER micro-batch than b1 (in one batch the sort
      // would legally accept it), matching the file twin's batch cuts
      val cumRows = Seq(2L, 5L, 7L)
      batches.zip(cumRows).foreach { case (b, want) =>
        b.foreach(out.println); out.flush()
        val deadline = System.currentTimeMillis() + 60000
        while (rows("gw") < want && System.currentTimeMillis() < deadline) {
          Thread.sleep(100); q1.processAllAvailable()
        }
        assert(rows("gw") === want, s"gateway path stalled before $want rows")
      }
      sock.close()
    } finally q1.stop()
    // ---- file-source twin through the SAME downstream seam ----
    val landing = s"$root/landing"
    Files.createDirectories(Paths.get(landing))
    def fileReceiver() = {
      val pts = Ingest.parseGraphite(
          s.readStream.text(landing).withColumnRenamed("value", "line"),
          nowSec = lit(base)) // unused: every line carries its ts
        .as[(String, Long, Double)]
      Daemon.startReceiverFromPoints(s, pts, s"$root/file/points",
        stepSec = 10, heartbeatSec = 7200,
        checkpointDir = s"$root/file/ckpt")
    }
    def drop(i: Int): Unit = {
      Files.write(Paths.get(s"$landing/b$i.txt"),
        (batches(i).mkString("\n") + "\n").getBytes("UTF-8"))
      ()
    }
    val qa = fileReceiver()
    try { drop(0); qa.processAllAvailable()
          drop(1); qa.processAllAvailable() } finally qa.stop()
    val vMid = ArchiveStore.state(s, s"$root/file/points").get.version
    // bounce: a fresh query on the same checkpoint must NOT re-merge
    // the committed files (offset-exact resume), and the restored PDP
    // state must still reject b2's out-of-order point
    val qb = fileReceiver()
    try {
      qb.processAllAvailable() // replay window: no new input
      assert(ArchiveStore.state(s, s"$root/file/points").get.version === vMid,
        "restart re-merged committed batches")
      drop(2); qb.processAllAvailable()
    } finally qb.stop()
    // ---- parity: bit-identical stores ----
    def store(tag: String): Map[(String, Long), Double] =
      Ingest.readArchive(s, s"$root/$tag/points").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val gwStore = store("gw"); val fileStore = store("file")
    assert(gwStore === fileStore,
      "file-source twin diverged from the gateway path")
    // the stale point contaminated NEITHER store: slot base is the
    // pure (base, base+10] piece (2.0), not the 9.9-blended 5.95 a
    // state loss across the bounce would have admitted
    assert(fileStore(("sw.a", base)) === 2.0)
    assert(gwStore(("sw.a", base)) === 2.0)
    assert(fileStore.size === 7)
  }
}
