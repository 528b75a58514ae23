package graft

import java.io.PrintWriter
import java.net.{DatagramPacket, DatagramSocket, HttpURLConnection, InetAddress, Socket, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.{Daemon, EventStore, Find, Ingest, Pickle}
import graft.dsl.Viewport

/** End-to-end process-frontend test: real TCP sockets in, real HTTP
  * out, the full reference lifecycle in between — sender connects to
  * the gateway and writes graphite plaintext, Spark's socket source
  * streams it through parse → PDP state → partition-scoped archive
  * merge, and a Grafana-shaped client GETs `/render` +
  * `/metrics/find`, whose payloads must equal the batch evaluation of
  * the same archive. */
class DaemonSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("daemon-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.schemaInference", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  private def httpGet(url: String): (Int, String) = {
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000); conn.setReadTimeout(30000)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    (code, body)
  }

  private def httpPost(url: String, body: String): (Int, String) = {
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000); conn.setReadTimeout(30000)
    conn.setRequestMethod("POST"); conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val out = new String(is.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    (code, out)
  }

  test("events: POST stores, get_data queries, events() renders, " +
      "journal survives restart") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("revents")
    val slots = dir.toString + "/slots"
    Ingest.mergePiecesIntoArchive(s,
      Seq(Ingest.Piece("web.req", 1000000L, 1000010L, 2.0)).toDF(),
      slots, stepSec = 10)
    val store = new EventStore(Some(dir.resolve("events.jsonl")))
    val http = Daemon.startHttp(s, 0, Seq(slots), stepSec = 10,
      now = () => 1000100L, events = Some(store))
    try {
      val base = s"http://127.0.0.1:${http.getAddress.getPort}"
      // an EMPTY store answers the reference's exact bytes
      assert(httpGet(s"$base/events/get_data")._2 === "[]\n")
      // POST both graphite body shapes: list tags and the pre-1.1
      // space-separated string
      assert(httpPost(s"$base/events",
        """{"what": "deploy", "tags": ["prod", "api"],""" +
          """ "when": 1000010, "data": "v2"}""")._1 === 200)
      assert(httpPost(s"$base/events",
        """{"what": "incident", "tags": "prod db", "when": 1000035}""")
        ._1 === 200)
      // window + subset-tag query
      val all = httpGet(s"$base/events/get_data?from=1000000&until=now")._2
      assert(all.contains("\"what\":\"deploy\"") &&
        all.contains("\"what\":\"incident\""), all)
      val api = httpGet(
        s"$base/events/get_data?from=1000000&until=now&tags=api")._2
      assert(api.contains("deploy") && !api.contains("incident"), api)
      // events() through the real render chain: per-slot counts on
      // the step grid (10 s slots here)
      val body = httpGet(s"$base/render?target=events(prod)" +
        "&from=1000000&until=now")._2
      assert(body.contains("events(prod)"), body)
      assert(body.contains("[1,1000010]") && body.contains("[1,1000030]"),
        body)
      // a NEW event invalidates the cached render (version vector)
      assert(httpPost(s"$base/events",
        """{"what": "deploy2", "tags": ["prod"], "when": 1000012}""")
        ._1 === 200)
      val body2 = httpGet(s"$base/render?target=events(prod)" +
        "&from=1000000&until=now")._2
      assert(body2.contains("[2,1000010]"), body2)
      // malformed JSON and a missing `what` both answer 400
      assert(httpPost(s"$base/events", "{nope")._1 === 400)
      assert(httpPost(s"$base/events", """{"tags":["x"]}""")._1 === 400)
      // GET on the submission route is a 405
      assert(httpGet(s"$base/events")._1 === 405)
      // the submission context must NOT prefix-capture subpaths: a
      // typo'd path 404s instead of journaling a bogus annotation
      assert(httpPost(s"$base/events/get_dat",
        """{"what": "typo", "when": 1000050}""")._1 === 404)
      assert(!httpGet(s"$base/events/get_data?from=1000000&until=now")._2
        .contains("typo"))
    } finally http.stop(0)
    // restart: the journal replays into a fresh store
    val store2 = new EventStore(Some(dir.resolve("events.jsonl")))
    assert(store2.all().map(e => (e.when, e.what)).toSet ===
      Set((1000010L, "deploy"), (1000035L, "incident"),
        (1000012L, "deploy2")))
  }

  test("events: ring cap evicts oldest, journal compacts at 2x cap, " +
      "restart replays the capped set; oversized POST body answers 413") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("revcap")
    val jp = dir.resolve("events.jsonl")
    val store = new EventStore(Some(jp), maxEvents = 5)
    (1 to 12).foreach(i => store.add(1000000L + i, s"ev$i", Seq("t"), ""))
    // ring: only the newest 5 remain, 7 evicted, ids never reused
    assert(store.count === 5)
    assert(store.dropped === 7L)
    assert(store.all().map(_.what) === (8 to 12).map(i => s"ev$i"))
    assert(store.all().map(_.id) === (8L to 12L))
    // journal compacted at the 2×-cap trigger: bounded, not 12 lines
    val lines = Files.readAllLines(jp, StandardCharsets.UTF_8)
    assert(lines.size <= 10, s"journal not compacted: ${lines.size} lines")
    // restart replays exactly the capped set (when/what/tags/data)
    val store2 = new EventStore(Some(jp), maxEvents = 5)
    assert(store2.all().map(e => (e.when, e.what, e.tags, e.data)) ===
      store.all().map(e => (e.when, e.what, e.tags, e.data)))

    // oversized POST body → 413, nothing journaled
    val slots = dir.toString + "/slots"
    Ingest.mergePiecesIntoArchive(s,
      Seq(Ingest.Piece("web.req", 1000000L, 1000010L, 2.0)).toDF(),
      slots, stepSec = 10)
    val http = Daemon.startHttp(s, 0, Seq(slots), stepSec = 10,
      now = () => 1000100L, events = Some(store2))
    try {
      val base = s"http://127.0.0.1:${http.getAddress.getPort}"
      val big = """{"what": """" + ("x" * (EventStore.MaxBodyBytes + 10)) +
        """"}"""
      assert(httpPost(s"$base/events", big)._1 === 413)
      assert(store2.count === 5)
      // a normal-sized post still lands
      assert(httpPost(s"$base/events",
        """{"what": "small", "when": 1000050}""")._1 === 200)
      assert(store2.all().last.what === "small")
    } finally http.stop(0)
  }

  test("gateway sheds the OLDEST lines past capacity, newest survive") {
    // the reference's bounded ingest channels shed load rather than
    // OOM; the gateway must do the same — offer 6 lines into a
    // capacity-4 queue, the feed connection reads exactly the LAST 4
    val gw = new Daemon.LineGateway(0, 0, capacity = 4)
    try {
      (1 to 6).foreach(i => gw.offer(s"line$i"))
      val sock = new Socket("127.0.0.1", gw.boundFeedPort)
      try {
        sock.setSoTimeout(10000)
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          sock.getInputStream, StandardCharsets.UTF_8))
        val got = (1 to 4).map(_ => in.readLine())
        assert(got === Seq("line3", "line4", "line5", "line6"))
      } finally sock.close()
    } finally gw.close()
  }

  test("receiver backpressure: flood past max-receiver-queue-size drops, counts, stays bounded") {
    // the reference's elastic-queue bound (receiver/receiver.go:121-135,
    // director.go:287-299): points past max-receiver-queue-size go to
    // /dev/null with stats.dropped++. Flood 1000 lines into a source
    // capped at 50 uncommitted: exactly 50 get offsets, 950 drop, the
    // counter surfaces on /stats
    import graft.sources.{GatewayMicroBatchStream, GatewayOffset, GatewayStats}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val gw = new Daemon.LineGateway(0, 0)
    val stream = new GatewayMicroBatchStream(
      "127.0.0.1", gw.boundFeedPort, maxQueue = 50)
    val http = Daemon.startHttp(spark, 0, Seq.empty, stepSec = 10)
    try {
      (1 to 1000).foreach(i => gw.offer(s"m.flood $i ${1000000 + i}"))
      val key = s"127.0.0.1:${gw.boundFeedPort}"
      def received: Long =
        stream.latestOffset(GatewayOffset(-1L), ReadLimit.allAvailable())
          .asInstanceOf[GatewayOffset].v + 1
      val deadline = System.currentTimeMillis() + 15000
      while (received + GatewayStats.dropped(key) < 1000 &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(received === 50L, "buffer exceeded the configured bound")
      assert(GatewayStats.dropped(key) === 950L)
      // the planned batch carries exactly the bounded prefix
      val parts = stream.planInputPartitions(
        GatewayOffset(-1L), GatewayOffset(49L))
      val lines = parts.flatMap(
        _.asInstanceOf[graft.sources.GatewayPartition].lines)
      assert(lines.length === 50 && lines.head === "m.flood 1 1000001")
      // ops surface: the drop counter is visible on /stats
      val (code, body) = httpGet(
        s"http://127.0.0.1:${http.getAddress.getPort}/stats")
      assert(code === 200)
      assert(body.contains(s""""$key":950"""), body)
    } finally { stream.stop(); gw.close(); http.stop(0) }
  }

  test("memory bound: lines drop while used heap exceeds max-memory-bytes") {
    // the memory half of the reference's drop gate
    // (director.go:287-291): with a 1-byte bound the JVM is always
    // over, so every line goes to /dev/null with the counter moving
    import graft.sources.{GatewayMicroBatchStream, GatewayOffset, GatewayStats}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val gw = new Daemon.LineGateway(0, 0)
    val stream = new GatewayMicroBatchStream(
      "127.0.0.1", gw.boundFeedPort, maxQueue = 0, maxMemory = 1L)
    try {
      (1 to 100).foreach(i => gw.offer(s"m $i ${1000000 + i}"))
      val key = s"127.0.0.1:${gw.boundFeedPort}"
      val deadline = System.currentTimeMillis() + 15000
      while (GatewayStats.dropped(key) < 100 &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(GatewayStats.dropped(key) >= 100L)
      val end = stream.latestOffset(GatewayOffset(-1L), ReadLimit.allAvailable())
        .asInstanceOf[GatewayOffset].v
      assert(end === -1L, "memory-dropped lines must not get offsets")
    } finally { stream.stop(); gw.close() }
  }

  test("render: lttb(target, k) downsamples through the whole HTTP chain") {
    // the DSL extension is reachable from a real /render URL: 30
    // stored slots with one spike, lttb(…, 5) must return exactly 5
    // points per series INCLUDING the spike (bucket averaging would
    // flatten it), straight off the archive store
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("rlttb").toString + "/slots"
    val pieces = (0 until 30).map { i =>
      Ingest.Piece("web.req", 1000000L + i * 10, 1000010L + i * 10,
        if (i == 17) 100.0 else 1.0)
    }
    Ingest.mergePiecesIntoArchive(s, pieces.toDF(), dir, stepSec = 10)
    val http = Daemon.startHttp(s, 0, Seq(dir), stepSec = 10,
      now = () => 1000400L)
    try {
      val base = s"http://127.0.0.1:${http.getAddress.getPort}"
      val body = httpGet(s"$base/render?target=lttb(web.req,5)" +
        "&from=999990&until=now")._2
      assert(body.contains("web.req"), body)
      val points = "\\[[-0-9.]+,\\d+\\]".r.findAllIn(body).toSeq
      assert(points.length === 5, s"expected 5 lttb points: $body")
      assert(body.contains("[100,1000170]"), s"spike flattened: $body")
    } finally http.stop(0)
  }

  test("render: graphType=pie reduces each series to one value") {
    // graphite-web's pie mode (extension): per-series safe summary by
    // pieMode; json body is [{"target": name, "value": v}, ...] in
    // name order. Two series: a ramp (avg ≠ max ≠ min distinguishes
    // the modes) and a flat line; cache keys must not alias the line
    // form (the same target renders BOTH shapes in one test).
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("rpie").toString + "/slots"
    val pieces =
      (0 until 4).map(i =>
        Ingest.Piece("web.a", 1000000L + i * 10, 1000010L + i * 10,
          (i + 1) * 2.0)) :+ // 2,4,6,8 → avg 5, max 8, min 2
        Ingest.Piece("web.b", 1000000L, 1000010L, 7.0)
    Ingest.mergePiecesIntoArchive(s, pieces.toDF(), dir, stepSec = 10)
    val http = Daemon.startHttp(s, 0, Seq(dir), stepSec = 10,
      now = () => 1000100L)
    try {
      val base = s"http://127.0.0.1:${http.getAddress.getPort}"
      val q = "/render?target=web.*&from=999990&until=now"
      assert(httpGet(s"$base$q&graphType=pie")._2 ===
        """[{"target":"web.a","value":5},{"target":"web.b","value":7}]""")
      assert(httpGet(s"$base$q&graphType=pie&pieMode=maximum")._2 ===
        """[{"target":"web.a","value":8},{"target":"web.b","value":7}]""")
      assert(httpGet(s"$base$q&graphType=pie&pieMode=minimum")._2 ===
        """[{"target":"web.a","value":2},{"target":"web.b","value":7}]""")
      // the reduction sees FETCHED values, not the maxDataPoints
      // re-bucket: with maxDataPoints=1 a render-then-reduce would
      // average web.a to one 5.0 bucket and report maximum=5
      assert(httpGet(s"$base$q&graphType=pie&pieMode=maximum" +
        "&maxDataPoints=1")._2 ===
        """[{"target":"web.a","value":8},{"target":"web.b","value":7}]""")
      // the line form still renders datapoints under the same target
      // (distinct cache key despite identical target/viewport)
      assert(httpGet(s"$base$q")._2.contains("datapoints"))
    } finally http.stop(0)
  }

  test("render cache: identical render hits, archive mutation invalidates") {
    // the reference's query LRU (dsl/ds_lru.go, query-cache-size):
    // a dashboard re-requesting the same target must not re-scan the
    // archive, and a mutated store must never serve a stale payload
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("rcache").toString + "/slots"
    Ingest.mergePiecesIntoArchive(s,
      Seq(Ingest.Piece("web.req", 1000000L, 1000020L, 2.0)).toDF(),
      dir, stepSec = 10)
    val http = Daemon.startHttp(s, 0, Seq(dir), stepSec = 10,
      now = () => 1000100L)
    try {
      val base = s"http://127.0.0.1:${http.getAddress.getPort}"
      def stats(): String = httpGet(s"$base/stats")._2
      def render(): String =
        httpGet(s"$base/render?target=web.req&from=1000000&until=now")._2
      val first = render()
      assert(first.contains("web.req") && first.contains("[2,1000000]"), first)
      val second = render()
      assert(second === first)
      assert(stats().contains("\"query_cache.hits\":1"), stats())
      // mutate the store: the generation bump must invalidate — the
      // third render recomputes and SEES the new slot
      Ingest.mergePiecesIntoArchive(s,
        Seq(Ingest.Piece("web.req", 1000040L, 1000060L, 8.0)).toDF(),
        dir, stepSec = 10)
      val third = render()
      assert(third !== first, "stale payload served after store mutation")
      assert(third.contains("[8,1000040]"), third)
      val st = stats()
      assert(st.contains("\"query_cache.hits\":1") &&
        st.contains("\"query_cache.misses\":2"), st)
      // a different viewport is its own entry, not a hit on the old one
      val other = httpGet(
        s"$base/render?target=web.req&from=1000020&until=now")._2
      assert(other !== third)
      assert(stats().contains("\"query_cache.misses\":3"), stats())
    } finally http.stop(0)
  }

  test("render cache: relative viewport hits across a moving clock") {
    // the reason query-cache-size exists at all (tgres.conf.sample:36)
    // is hot dashboard traffic, and dashboards ask for RELATIVE
    // viewports (-1h) that re-resolve per request. The resolution
    // clock quantizes to the archive's finest step, so two refreshes
    // landing in different SECONDS of the same step window must alias
    // to one cache entry — and the aliased payload must still be the
    // exact archive content, because every rendered bound derives from
    // the same quantized clock.
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("rcache2").toString + "/slots"
    Ingest.mergePiecesIntoArchive(s,
      Seq(Ingest.Piece("web.req", 1000000L, 1000020L, 2.0)).toDF(),
      dir, stepSec = 10)
    // a MOVING clock (not frozen): ticks 3 s per call, both requests
    // inside the step-10 window [1000090, 1000100)
    val clock = new java.util.concurrent.atomic.AtomicLong(1000091L)
    val http = Daemon.startHttp(s, 0, Seq(dir), stepSec = 10,
      now = () => clock.getAndAdd(3L))
    try {
      val base = s"http://127.0.0.1:${http.getAddress.getPort}"
      def stats(): String = httpGet(s"$base/stats")._2
      def render(): String =
        httpGet(s"$base/render?target=web.req&from=-1h&until=now")._2
      val first = render()  // now=1000091 → quantized 1000090
      val second = render() // now=1000094 → same window → HIT
      assert(first.contains("[2,1000000]") && first.contains("[2,1000010]"),
        first)
      assert(second === first)
      val st = stats()
      assert(st.contains("\"query_cache.misses\":1") &&
        st.contains("\"query_cache.hits\":1"), st)
      // next step window (now=1000097 → last inside; 1000100 → next):
      // a refresh crossing the boundary is a fresh viewport, not a hit
      clock.set(1000103L)
      render()
      assert(stats().contains("\"query_cache.misses\":2"), stats())
    } finally http.stop(0)
  }

  test("render cache single-flight: concurrent identical misses compute once") {
    // a dashboard fans out N panels with the same target at once; the
    // cache must not stampede N archive scans before the first put
    val cache = new Daemon.RenderCache(8)
    val computes = new java.util.concurrent.atomic.AtomicInteger
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val gens = Seq(1L)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val r = cache.getOrCompute("k", gens) {
          Thread.sleep(200)
          s"payload-${computes.incrementAndGet()}"
        }
        results.add(r); ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(computes.get === 1, "stampede: compute ran more than once")
    assert(results.toArray(new Array[String](0)).toSet === Set("payload-1"))
    assert(cache.misses.get === 1L && cache.hits.get === 7L)
    // and a waiter that raced a store mutation recomputes at ITS gens:
    // a second generation must not be served the gen-1 payload
    val r2 = cache.getOrCompute("k", Seq(2L))("gen2")
    assert(r2 === "gen2" && cache.misses.get === 2L)
  }

  test("render cache spin-exhausted fallback never clobbers a fresher entry") {
    // maxSpins = 0 sends every miss straight to the direct-compute
    // fallback; a fallback carrying STALE gens (it lost its races to
    // fresher winners) must not overwrite the cached entry with a
    // payload no future request's gens can match
    val cache = new Daemon.RenderCache(8, maxSpins = 0)
    assert(cache.getOrCompute("k", Seq(5L))("fresh") === "fresh")
    // older-gens request: computes directly, gets its own payload...
    assert(cache.getOrCompute("k", Seq(4L))("stale") === "stale")
    // ...but the gen-5 entry survives: the next gen-5 request HITS
    val hitsBefore = cache.hits.get
    val r = cache.getOrCompute("k", Seq(5L)) {
      fail("fresh entry was clobbered by the stale fallback") }
    assert(r === "fresh" && cache.hits.get === hitsBefore + 1)
    // an empty slot still installs through the fallback path
    assert(cache.getOrCompute("k2", Seq(1L))("first") === "first")
    assert(cache.getOrCompute("k2", Seq(1L)) {
      fail("fallback failed to install into an empty slot") } === "first")
  }

  /** Poll `/stats` until `field` reaches at least `want` (or deadline). */
  private def awaitStat(base: String, field: String, want: Long,
      timeoutMs: Long = 20000): Long = {
    val re = ("\"" + java.util.regex.Pattern.quote(field) + "\":(\\d+)").r
    val deadline = System.currentTimeMillis() + timeoutMs
    var last = -1L
    while (last < want && System.currentTimeMillis() < deadline) {
      last = re.findFirstMatchIn(httpGet(s"$base/stats")._2)
        .map(_.group(1).toLong).getOrElse(-1L)
      if (last < want) Thread.sleep(25)
    }
    last
  }

  test("HTTP concurrency: /ping and a distinct-key render proceed while " +
      "a cold render is latched") {
    // the reference serves 64 concurrent readers (BATCH_LIMIT,
    // http/graphite.go:37); with no executor the JDK HttpServer would
    // serialize everything on one dispatcher thread and this test
    // would deadlock. Latch: the injectable resolution clock blocks
    // the FIRST render request on its handler thread (renders take no
    // store lock since the MVCC port — they pin a snapshot — so the
    // clock is the seam that models a slow in-flight request).
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("conc").toString + "/slots"
    Ingest.mergePiecesIntoArchive(s,
      Seq(Ingest.Piece("web.req", 1000000L, 1000020L, 2.0)).toDF(),
      dir, stepSec = 10)
    val firstLatched = new java.util.concurrent.atomic.AtomicBoolean(false)
    val release = new java.util.concurrent.CountDownLatch(1)
    val http = Daemon.startHttp(s, 0, Seq(dir), stepSec = 10,
      now = () => {
        if (firstLatched.compareAndSet(false, true)) release.await()
        1000100L
      })
    try {
      val base = s"http://127.0.0.1:${http.getAddress.getPort}"
      val r1Body = new java.util.concurrent.atomic.AtomicReference[String]()
      val r1 = new Thread(() => {
        val (code, body) =
          httpGet(s"$base/render?target=web.req&from=1000000&until=now")
        assert(code === 200, body); r1Body.set(body)
      })
      r1.start()
      // the first render is latched on its own handler thread; /stats
      // answering at all already proves the dispatcher is not
      // head-of-line-blocked (it counts the latched request in flight)
      assert(awaitStat(base, "http.in_flight", 2L) >= 2L) // r1 + this /stats
      val (pc, pb) = httpGet(s"$base/ping")
      assert(pc === 200 && pb === "OK\n")
      // a DISTINCT-key render runs on its own thread and COMPLETES
      // while the first is still latched — full request concurrency
      val (c2, b2) =
        httpGet(s"$base/render?target=web.req&from=1000010&until=now")
      assert(c2 === 200 && b2.contains("web.req"), b2)
      assert(r1.isAlive, "latched render finished early — latch broken")
      val st = httpGet(s"$base/stats")._2
      assert(st.contains("\"query_cache.misses\":1"), st)
      release.countDown()
      r1.join(30000)
      assert(!r1.isAlive, "latched render did not complete after release")
      assert(r1Body.get.contains("web.req"), r1Body.get)
      assert(awaitStat(base, "http.max_in_flight", 2L) >= 2L)
    } finally { release.countDown(); http.stop(0) }
  }

  test("e2e render stampede over HTTP: N identical cold requests " +
      "compute once") {
    // round-9 proved single-flight with direct RenderCache threads
    // because the server serialized; now the same property must hold
    // through real concurrent HTTP clients
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("stampede").toString + "/slots"
    Ingest.mergePiecesIntoArchive(s,
      Seq(Ingest.Piece("web.req", 1000000L, 1000020L, 2.0)).toDF(),
      dir, stepSec = 10)
    // gate: every client's request blocks in the resolution clock
    // until all 8 have arrived, then ALL race into the cache at once —
    // the strongest possible stampede against single-flight
    val arrived = new java.util.concurrent.CountDownLatch(8)
    val http = Daemon.startHttp(s, 0, Seq(dir), stepSec = 10,
      now = () => { arrived.countDown(); arrived.await(); 1000100L })
    try {
      val base = s"http://127.0.0.1:${http.getAddress.getPort}"
      val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val url = s"$base/render?target=web.req&from=1000000&until=now"
      val clients = (1 to 8).map { _ =>
        val t = new Thread(() => { bodies.add(httpGet(url)._2); () })
        t.start(); t
      }
      clients.foreach(_.join(30000))
      assert(clients.forall(!_.isAlive), "clients did not complete")
      assert(bodies.size === 8)
      assert(bodies.toArray(new Array[String](0)).toSet.size === 1,
        "torn/differing payloads across identical requests")
      // exactly ONE held a permit and computed; 7 were served as hits
      // (single-flight waiters or cache hits, depending on arrival)
      val st = httpGet(s"$base/stats")._2
      assert(st.contains("\"query_cache.misses\":1") &&
        st.contains("\"query_cache.hits\":7"), st)
      assert(st.contains("\"render.max_in_flight\":1"), st)
      assert(awaitStat(base, "http.max_in_flight", 8L) >= 8L, st)
    } finally http.stop(0)
  }

  test("e2e distinct renders under a concurrent merge: N misses, " +
      "no torn payloads") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("merge-race").toString + "/slots"
    Ingest.mergePiecesIntoArchive(s,
      Seq(Ingest.Piece("web.req", 1000000L, 1000020L, 2.0)).toDF(),
      dir, stepSec = 10)
    val http = Daemon.startHttp(s, 0, Seq(dir), stepSec = 10,
      now = () => 1000100L)
    try {
      val base = s"http://127.0.0.1:${http.getAddress.getPort}"
      val merger = new Thread(() =>
        Ingest.mergePiecesIntoArchive(s,
          Seq(Ingest.Piece("web.req", 1000040L, 1000060L, 8.0)).toDF(),
          dir, stepSec = 10))
      val results = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
      val clients = (0 until 6).map { i =>
        new Thread(() => {
          // distinct maxDataPoints → 6 distinct cache keys, all over a
          // viewport that holds data on both sides of the merge
          results.add(httpGet(
            s"$base/render?target=web.req&from=1000000&until=now" +
              s"&maxDataPoints=${100 + i}"))
          ()
        })
      }
      merger.start(); clients.foreach(_.start())
      merger.join(60000); clients.foreach(_.join(60000))
      assert(!merger.isAlive && clients.forall(!_.isAlive))
      val all = results.toArray(new Array[(Int, String)](0)).toSeq
      assert(all.size === 6)
      all.foreach { case (code, body) =>
        // every render — whichever side of the merge it landed on —
        // is a complete consistent payload, never an error or a
        // mid-swap partial scan
        assert(code === 200, body)
        assert(body.startsWith("[") && body.contains("web.req"), body)
      }
      // 6 distinct keys, each computed exactly once
      val st = httpGet(s"$base/stats")._2
      assert(st.contains("\"query_cache.misses\":6") &&
        st.contains("\"query_cache.hits\":0"), st)
    } finally http.stop(0)
  }

  test("self-stats reporter emits receiver counters as graphite lines") {
    // the reference's reportStatCount/Gauge path: internal counters
    // become stored series via the normal ingest route. Flood a capped
    // source so both counters move, then the reporter's lines must be
    // parseable graphite with the dropped delta visible
    import graft.sources.{GatewayMicroBatchStream, GatewayStats}
    val gw = new Daemon.LineGateway(0, 0)
    val stream = new GatewayMicroBatchStream(
      "127.0.0.1", gw.boundFeedPort, maxQueue = 10)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    try {
      val key = s"127.0.0.1:${gw.boundFeedPort}"
      (1 to 200).foreach(i => gw.offer(s"m $i ${1000000 + i}"))
      val deadline = System.currentTimeMillis() + 15000
      while (GatewayStats.accepted(key) + GatewayStats.dropped(key) < 200 &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(GatewayStats.accepted(key) === 10L)
      assert(GatewayStats.dropped(key) === 190L)
      Daemon.startSelfStats(line => { got.add(line); () },
        () => gw.queueSize.toLong, flushSec = 1L)
      val d2 = System.currentTimeMillis() + 15000
      while (got.size < 3 && System.currentTimeMillis() < d2)
        Thread.sleep(100)
      val lines = got.toArray(new Array[String](0)).toSeq
      assert(lines.exists(_.startsWith("graft.receiver.datapoints.total ")))
      assert(lines.exists(_.startsWith("graft.receiver.queue_len ")))
      val droppedLine = lines
        .find(_.startsWith("graft.receiver.datapoints.dropped ")).get
      // parseable graphite: name value ts, with the JVM-wide dropped
      // delta at least this gateway's 190
      val parts = droppedLine.split(" ")
      assert(parts.length === 3 && parts(1).toLong >= 190L)
    } finally { stream.stop(); gw.close() }
  }

  test("self-stats: a forwarding shard reports its director deltas") {
    // the reference stores stats.forwarded as a series
    // (receiver/director.go:105-107); a sharded daemon's reporter must
    // carry the forwarded counter DELTA per interval, not the
    // cumulative — two windows after one burst of forwards must show
    // the burst once, then zero
    import graft.streaming.Shard
    val srv = new java.net.ServerSocket(0)
    val sink = new Thread(() => { // keep the peer reading
      try {
        val c = srv.accept()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(c.getInputStream, "UTF-8"))
        while (in.readLine() != null) {}
      } catch { case _: java.io.IOException => () }
    })
    sink.setDaemon(true); sink.start()
    val dir = new Shard.Director(0, 2,
      new Shard.Forwarder(Seq(0, srv.getLocalPort)))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    try {
      val theirs = (1 to 50).map(i => s"fs$i.x").find(Shard.owner(_, 2) == 1).get
      (1 to 7).foreach(k => dir.route(s"$theirs $k 10$k"))
      // wait for the drain thread to deliver before the reporter reads
      val d0 = System.currentTimeMillis() + 10000
      while (dir.forwarder.forwarded.get < 7L && System.currentTimeMillis() < d0)
        Thread.sleep(50)
      assert(dir.forwarder.forwarded.get === 7L)
      Daemon.startSelfStats(line => { got.add(line); () }, () => 0L,
        flushSec = 1L,
        extraCounters = () => Seq(
          "receiver.graphite.forwarded" -> dir.forwarder.forwarded.get,
          "receiver.graphite.fwd_dropped" -> dir.forwarder.dropped.get))
      def fwdLines(): Seq[String] = got.toArray(new Array[String](0)).toSeq
        .filter(_.startsWith("graft.receiver.graphite.forwarded "))
      val d1 = System.currentTimeMillis() + 15000
      while (fwdLines().size < 2 && System.currentTimeMillis() < d1)
        Thread.sleep(100)
      val deltas = fwdLines().map(_.split(" ")(1).toLong)
      assert(deltas.head === 7L, s"first window must carry the burst: $deltas")
      assert(deltas.tail.forall(_ === 0L), s"later windows re-report: $deltas")
      assert(got.toArray(new Array[String](0)).toSeq
        .exists(_.startsWith("graft.receiver.graphite.fwd_dropped ")))
    } finally { dir.close(); scala.util.Try(srv.close()); () }
  }

  test("find catalog cache: repeats hit, a new series invalidates") {
    // the reference's fsFindCache role: /metrics/find and the tag
    // routes share one cached name catalog per store generation —
    // autocomplete traffic must not rescan the archive, and a newly
    // ingested series must appear immediately after its merge
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("fcache").toString + "/slots"
    Ingest.mergePiecesIntoArchive(s,
      Seq(Ingest.Piece("web.req", 1000000L, 1000020L, 2.0)).toDF(),
      dir, stepSec = 10)
    val http = Daemon.startHttp(s, 0, Seq(dir), stepSec = 10,
      now = () => 1000100L)
    try {
      val base = s"http://127.0.0.1:${http.getAddress.getPort}"
      def stats(): String = httpGet(s"$base/stats")._2
      val f1 = httpGet(s"$base/metrics/find?query=*.*")._2
      assert(f1.contains("web.req"), f1)
      // tag autocomplete rides the same catalog → still ONE miss
      httpGet(s"$base/tags/autoComplete/tags")
      val f2 = httpGet(s"$base/metrics/find?query=*.*")._2
      assert(f2 === f1)
      assert(stats().contains("\"find_cache.misses\":1"), stats())
      assert(stats().contains("\"find_cache.hits\":2"), stats())
      // a new series merges → generation bump → catalog rebuilds and
      // the new name is findable
      Ingest.mergePiecesIntoArchive(s,
        Seq(Ingest.Piece("db.req", 1000000L, 1000020L, 4.0)).toDF(),
        dir, stepSec = 10)
      val f3 = httpGet(s"$base/metrics/find?query=*.*")._2
      assert(f3.contains("db.req") && f3.contains("web.req"), f3)
      assert(stats().contains("\"find_cache.misses\":2"), stats())
    } finally http.stop(0)
  }

  test("blaster corpus is deterministic and partitioning-independent") {
    val a = graft.streaming.Blaster.generate(spark, 3, 100)
      .collect().map(_.toSeq).toSet
    val b = graft.streaming.Blaster.generate(spark, 3, 100)
      .repartition(7).collect().map(_.toSeq).toSet
    assert(a.size === 300 && a === b)
  }

  test("socket lines → streaming ingest → archive → HTTP render/find") {
    val s = spark
    val dir = Files.createTempDirectory("daemon").toString
    val archiveDir = s"$dir/archive"
    val gw = new Daemon.LineGateway(0, 0)
    // epoch base well past 0: a point at exactly t=0 would sit ON the
    // stream's initial watermark and be dropped as late — an artifact
    // of toy timestamps, not of real clocks
    val base = 1000000L
    val q = Daemon.startGraphiteIngest(s, gw.boundFeedPort, archiveDir,
      stepSec = 10, heartbeatSec = 3600, checkpointDir = s"$dir/ckpt")
    val http = Daemon.startHttp(s, 0, Seq(archiveDir), stepSec = 10,
      now = () => base + 90L, allowOrigin = Some("*"))
    try {
      // a sender opens a plain TCP connection, as it would to the
      // reference's graphite listener, and writes 1 series pair
      val sender = new Socket("127.0.0.1", gw.boundListenPort)
      val out = new PrintWriter(sender.getOutputStream, true)
      (0 to 90 by 10).foreach { t =>
        out.println(s"web.req 2 ${base + t}")
        out.println(s"db.req 4 ${base + t}")
      }
      out.flush()

      // wait until the stream has merged all 18 slots ([0,90) at step
      // 10 for two series); socket delivery is async, so poll
      val deadline = System.currentTimeMillis() + 60000
      def slots(): Long = Try(
        Ingest.readArchive(s, archiveDir).count()).getOrElse(0L)
      while (slots() < 18 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        q.processAllAvailable()
      }
      assert(slots() === 18, "archive never reached the expected slots")
      sender.close()

      // HTTP answers must equal the batch evaluation of the same store
      val store = Ingest.readArchive(s, archiveDir)
      val ctx = Viewport.ctx(s, store, 10, s"$base", "now",
        nowSec = base + 90L, 512)
      val wantRender = Render.renderTargets(ctx, Seq("sumSeries(*.req)"))
      val (rc, render) = httpGet(s"http://127.0.0.1:${http.getAddress.getPort}" +
        s"/render?target=sumSeries(*.req)&from=$base&until=now")
      assert(rc === 200)
      assert(render === wantRender)
      assert(render.contains("6")) // 2 + 4 summed per slot

      // configured http-allow-origin reaches the Grafana routes, and a
      // gzip-accepting client gets a gzipped render payload that
      // decompresses to the identical body (the reference's
      // makeGzipHandler wraps render alone)
      val gzConn = new URI(s"http://127.0.0.1:${http.getAddress.getPort}" +
        s"/render?target=sumSeries(*.req)&from=$base&until=now").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      gzConn.setRequestProperty("Accept-Encoding", "gzip")
      assert(gzConn.getResponseCode === 200)
      assert(gzConn.getHeaderField("Access-Control-Allow-Origin") === "*")
      assert(gzConn.getHeaderField("Content-Encoding") === "gzip")
      val unz = new String(new java.util.zip.GZIPInputStream(
        gzConn.getInputStream).readAllBytes(), StandardCharsets.UTF_8)
      assert(unz === wantRender)
      gzConn.disconnect()

      // Grafana POSTs render requests as a form body — must answer
      // identically to the GET
      val postConn = new URI(s"http://127.0.0.1:${http.getAddress.getPort}/render")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      postConn.setRequestMethod("POST"); postConn.setDoOutput(true)
      postConn.setRequestProperty("Content-Type",
        "application/x-www-form-urlencoded")
      postConn.getOutputStream.write(
        s"target=sumSeries(*.req)&from=$base&until=now"
          .getBytes(StandardCharsets.UTF_8))
      assert(postConn.getResponseCode === 200)
      assert(new String(postConn.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8) === wantRender)
      postConn.disconnect()

      val wantFind = Render.toFindJson(Find.findNodes(
        store.select("name").distinct(), "*"))
      val (fc, find) = httpGet(s"http://127.0.0.1:${http.getAddress.getPort}" +
        "/metrics/find?query=*")
      assert(fc === 200)
      assert(find === wantFind)
      assert(find.contains("\"web\"") && find.contains("\"db\""))

      // malformed viewport → 400, not a hung socket
      val (bc, berr) = httpGet(s"http://127.0.0.1:${http.getAddress.getPort}" +
        "/render?target=sumSeries(*.req)&from=tomorrowish")
      assert(bc === 400 && berr.contains("error"))

      // /toptalkers: both series wrote 9 slots within the window; an
      // exact-regime sketch (2 names ≤ k) reports them exactly
      val (tc, talkers) = httpGet(
        s"http://127.0.0.1:${http.getAddress.getPort}/toptalkers?k=10&window=600")
      assert(tc === 200)
      assert(talkers.contains("""{"name":"web.req","n_points":9}"""))
      assert(talkers.contains("""{"name":"db.req","n_points":9}"""))
      // and a window in the past excludes everything
      val (ec, empty) = httpGet(
        s"http://127.0.0.1:${http.getAddress.getPort}/toptalkers?window=0")
      assert(ec === 200 && empty === "[]")
      val (kc, kerr) = httpGet(
        s"http://127.0.0.1:${http.getAddress.getPort}/toptalkers?k=0")
      assert(kc === 400 && kerr.contains("error"))

      // /quantiles: the p50 answer is an actual stored slot value —
      // checked against the archive's own discrete lower quantile
      val archVals = Ingest.readArchive(s, archiveDir)
        .filter(col("name") === "web.req").select("value")
        .collect().map(_.getDouble(0)).sorted
      val p50 = archVals(
        math.max(1, math.ceil(0.5 * archVals.length).toLong).toInt - 1)
      val (qc2, qjson) = httpGet(s"http://127.0.0.1:${http.getAddress.getPort}" +
        "/quantiles?name=web.req&q=0.5&window=600")
      assert(qc2 === 200 && qjson === s"""[{"q":0.5,"value":$p50}]""")
      val (qe, qempty) = httpGet(s"http://127.0.0.1:${http.getAddress.getPort}" +
        "/quantiles?name=web.req&window=0")
      assert(qe === 200 && qempty === "[]")
      val (qb, qberr) = httpGet(s"http://127.0.0.1:${http.getAddress.getPort}" +
        "/quantiles?name=web.req&q=1.5")
      assert(qb === 400 && qberr.contains("error"))
      val (qn, qnerr) = httpGet(s"http://127.0.0.1:${http.getAddress.getPort}" +
        "/quantiles?q=0.5")
      assert(qn === 400 && qnerr.contains("error"))

      // graphite 1.1 tagged path: the wire carries tags in non-canonical
      // order with a value sanitize must rewrite; the store holds the
      // canonical name and the tag routes answer over derived idents
      val sender2 = new Socket("127.0.0.1", gw.boundListenPort)
      val out2 = new PrintWriter(sender2.getOutputStream, true)
      (0 to 40 by 10).foreach { t =>
        out2.println(s"api.req;env=prod;dc=us/west 1 ${base + t}")
      }
      out2.flush()
      // 5 points close 4 PDP intervals (each point finalizes the
      // PREVIOUS step), so the archive grows 18 → 22 slots
      while (slots() < 22 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        q.processAllAvailable()
      }
      assert(slots() === 22, "tagged slots never landed")
      sender2.close()
      assert(Ingest.readArchive(s, archiveDir)
        .filter(col("name") === "api.req;dc=us-west;env=prod").count() === 4L)
      val port = http.getAddress.getPort
      val (kc2, keys) = httpGet(
        s"http://127.0.0.1:$port/tags/autoComplete/tags")
      assert(kc2 === 200 && keys === """["dc","env","name"]""")
      val (kp, keysD) = httpGet(
        s"http://127.0.0.1:$port/tags/autoComplete/tags?tagPrefix=d")
      assert(kp === 200 && keysD === """["dc"]""")
      val (vc, vals) = httpGet(
        s"http://127.0.0.1:$port/tags/autoComplete/values?tag=dc")
      assert(vc === 200 && vals === """["us-west"]""")
      val (vpc, valsP) = httpGet(
        s"http://127.0.0.1:$port/tags/autoComplete/values?tag=name&valuePrefix=api")
      assert(vpc === 200 && valsP === """["api.req"]""")
      val (ve, verr) = httpGet(
        s"http://127.0.0.1:$port/tags/autoComplete/values")
      assert(ve === 400 && verr.contains("error"))
      // findSeries: conjunctive tag exprs → canonical names
      val (fsc, fs) = httpGet(s"http://127.0.0.1:$port" +
        "/tags/findSeries?expr=dc=us-west&expr=env=~pro")
      assert(fsc === 200 && fs === """["api.req;dc=us-west;env=prod"]""")
      val (fne, fnone) = httpGet(s"http://127.0.0.1:$port" +
        "/tags/findSeries?expr=dc=nowhere")
      assert(fne === 200 && fnone === "[]")
      val (fse, fserr) = httpGet(s"http://127.0.0.1:$port/tags/findSeries")
      assert(fse === 400 && fserr.contains("error"))
    } finally {
      Try(q.stop()); http.stop(0); gw.close()
    }
  }

  test("blaster: /blaster/set drives load at runtime; /ping + annotations answer") {
    import graft.streaming.Blaster
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val b = new Blaster.LiveBlaster(line => { got.add(line); () }, seed = 1L)
    val http = Daemon.startHttp(spark, 0, Seq.empty, stepSec = 10,
      blaster = Some(b))
    try {
      val base = s"http://127.0.0.1:${http.getAddress.getPort}"
      assert(httpGet(s"$base/ping") === ((200, "OK\n")))
      // annotations: the reference's permanent empty list
      assert(httpGet(s"$base/events/get_data") === ((200, "[]\n")))
      // boot state is rate 0 — inert, like the zero-limit limiter
      Thread.sleep(300)
      assert(got.isEmpty, "blaster emitted at rate 0")
      val (c1, r1) = httpGet(s"$base/blaster/set?rate=100&n=5")
      assert(c1 === 200 && r1 === "New rate: 100\nNew nSeries: 5\n")
      val deadline = System.currentTimeMillis() + 10000
      while (got.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(!got.isEmpty, "no load after rate was raised")
      // emitted lines are valid graphite plaintext under the
      // reference's naming scheme, and parse through the real parser
      val s0 = spark; import s0.implicits._
      val line = got.peek()
      assert(line.matches(
        """tgres\.blaster\.test\.a\d\d\.b\d\d\.c\d\d\.d\d\d -?[0-9.E-]+ \d+"""),
        line)
      val parsed = graft.streaming.Ingest.parseGraphite(
        Seq(line).toDF("line"), org.apache.spark.sql.functions.lit(0L))
      assert(parsed.count() === 1L)
      // rate back to 0 stops the flow (within a batch beat)
      val (c2, r2) = httpGet(s"$base/blaster/set?rate=0")
      assert(c2 === 200 && r2 === "New rate: 0\n")
      Thread.sleep(400); got.clear(); Thread.sleep(400)
      assert(got.isEmpty, "blaster kept emitting after rate 0")
      // unparseable value answers the reference's 500 "Error\n"
      assert(httpGet(s"$base/blaster/set?rate=abc") === ((500, "Error\n")))
    } finally {
      http.stop(0); b.close()
    }
  }

  test("UDP datagrams → same gateway → streaming ingest → archive") {
    val s = spark
    val dir = Files.createTempDirectory("daemon-udp").toString
    val archiveDir = s"$dir/archive"
    val gw = new Daemon.LineGateway(0, 0)
    val base = 1000000L
    val q = Daemon.startGraphiteIngest(s, gw.boundFeedPort, archiveDir,
      stepSec = 10, heartbeatSec = 3600, checkpointDir = s"$dir/ckpt")
    val udp = new DatagramSocket()
    try {
      // a statsd/graphite emitter's default transport: datagrams to the
      // same port number the TCP listener serves; one packet may carry
      // several newline-separated lines
      val addr = InetAddress.getByName("127.0.0.1")
      (0 to 90 by 30).foreach { t =>
        val payload = (t until (t + 30) by 10)
          .filter(_ <= 90)
          .map(tt => s"udp.req 3 ${base + tt}").mkString("\n")
        val bytes = payload.getBytes(StandardCharsets.UTF_8)
        udp.send(new DatagramPacket(bytes, bytes.length, addr,
          gw.boundListenPort))
      }
      val deadline = System.currentTimeMillis() + 60000
      def slots(): Long = Try(
        Ingest.readArchive(s, archiveDir).count()).getOrElse(0L)
      while (slots() < 9 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        q.processAllAvailable()
      }
      assert(slots() === 9, "archive never reached the expected slots")
      val got = Ingest.readArchive(s, archiveDir).collect()
      assert(got.forall(r => r.getString(0) == "udp.req" &&
        r.getDouble(2) == 3.0))
    } finally {
      Try(q.stop()); udp.close(); gw.close()
    }
  }

  test("pickle frames → framed gateway → decode on executors → archive") {
    val s = spark
    val dir = Files.createTempDirectory("daemon-pk").toString
    val archiveDir = s"$dir/archive"
    val gw = new Daemon.LineGateway(0, 0, framed = true)
    val base = 1000000L
    val q = Daemon.startPickleIngest(s, gw.boundFeedPort, archiveDir,
      stepSec = 10, heartbeatSec = 3600, checkpointDir = s"$dir/ckpt")
    try {
      // a carbon client sends length-prefixed pickle frames over TCP;
      // names ride raw (the pickle path does not sanitize)
      val sender = new Socket("127.0.0.1", gw.boundListenPort)
      val out = sender.getOutputStream
      (0 to 90 by 10).foreach { t =>
        out.write(Pickle.encodeFrame(Seq(
          Pickle.Point("pk.web", base + t, 2.0),
          Pickle.Point("pk.db", base + t, 4.0),
          // tagged path in NON-canonical order: unlike plain names, it
          // must canonicalize so text- and pickle-ingested spellings of
          // one tagged series share a stored identity
          Pickle.Point("pk.api;env=prod;dc=west", base + t, 6.0))))
      }
      out.flush()
      val deadline = System.currentTimeMillis() + 60000
      def slots(): Long = Try(
        Ingest.readArchive(s, archiveDir).count()).getOrElse(0L)
      while (slots() < 27 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        q.processAllAvailable()
      }
      assert(slots() === 27, "archive never reached the expected slots")
      sender.close()
      val byName = Ingest.readArchive(s, archiveDir).collect()
        .groupBy(_.getString(0))
      assert(byName("pk.web").forall(_.getDouble(2) == 2.0))
      assert(byName("pk.db").forall(_.getDouble(2) == 4.0))
      assert(byName("pk.api;dc=west;env=prod").forall(_.getDouble(2) == 6.0))
    } finally {
      Try(q.stop()); gw.close()
    }
  }

  test("pixel GETs → dp into the point receiver, commands into flush windows") {
    val s = spark
    val dir = Files.createTempDirectory("daemon-px").toString
    val pointsDir = s"$dir/points"
    val pixelDir = s"$dir/pixel"
    val base = 1000000L
    val gGw = new Daemon.LineGateway(0, 0)
    val pkGw = new Daemon.LineGateway(0, 0, framed = true)
    val pxDpGw = new Daemon.LineGateway(0, 0)
    val pxGw = new Daemon.LineGateway(0, 0)
    // dp lines are the receiver's third source — no driver re-injection
    val recv = Daemon.startReceiver(s, gGw.boundFeedPort,
      pkGw.boundFeedPort, pointsDir, stepSec = 10, heartbeatSec = 3600,
      checkpointDir = s"$dir/ckpt-g",
      pixelDpFeedPort = Some(pxDpGw.boundFeedPort))
    val pxq = Daemon.startPixelIngest(s, pxGw.boundFeedPort,
      pixelDir, flushSec = 10, checkpointDir = s"$dir/ckpt-px")
    val http = Daemon.startHttp(s, 0, Seq(pointsDir, pixelDir),
      stepSec = 10, now = () => base + 90L,
      pixelOffer = Some(Daemon.pixelRoute(pxDpGw.offer, pxGw.offer)))
    try {
      val port = http.getAddress.getPort
      // data points: /pixel?name=VAL@TS — each must answer the 1×1 GIF
      (0 to 90 by 10).foreach { t =>
        val (code, body) = httpGet(
          s"http://127.0.0.1:$port/pixel?px.req=6@${base + t}")
        assert(code === 200 && body.startsWith("GIF89a"))
      }
      // aggregator commands: /pixel/add?name=VAL, names stay UNprefixed
      (1 to 20).foreach { _ =>
        val (code, _) = httpGet(s"http://127.0.0.1:$port/pixel/add?cnt=7")
        assert(code === 200)
      }
      val deadline = System.currentTimeMillis() + 60000
      def pointSlots(): Long = Try(
        Ingest.readArchive(s, pointsDir).count()).getOrElse(0L)
      def cmdSum(): Double = Try(
        Ingest.readArchive(s, pixelDir).collect()
          .filter(_.getString(0) == "cnt").map(_.getDouble(2) * 10).sum)
        .getOrElse(0.0)
      // /pixel dps flow through the receiver's pixel source directly
      while ((pointSlots() < 9 || cmdSum() < 140.0) &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        pxq.processAllAvailable()
        recv.processAllAvailable()
      }
      assert(pointSlots() === 9, "point archive never filled")
      val pts = Ingest.readArchive(s, pointsDir).collect()
      assert(pts.forall(r => r.getString(0) == "px.req" &&
        r.getDouble(2) == 6.0))
      // 20 × 7 over 10-second flush windows: rates must total 140/10
      assert(math.abs(cmdSum() - 140.0) < 1e-9)
    } finally {
      Try(pxq.stop()); Try(recv.stop()); http.stop(0)
      pxGw.close(); pxDpGw.close(); pkGw.close(); gGw.close()
    }
  }

  test("graceful restart: lines accepted during the bounce survive") {
    // the reference's SIGHUP handoff (daemon/daemon.go:131-143,
    // graceful/): listeners never close, accepted-but-unprocessed
    // input survives into the next process. Here: the gateway keeps
    // listening and buffering while the streaming lifecycle stops and
    // relaunches on the SAME checkpoint/store — lines sent while no
    // query is attached are held (pending slot + queue) and the
    // offset padding realigns the restarted socket source with the
    // checkpoint, so nothing drops and PDP state carries over.
    val s = spark
    val dir = Files.createTempDirectory("daemon-hup").toString
    val base = 1000000L
    val gw = new Daemon.LineGateway(0, 0)
    def boot() = Daemon.startGraphiteIngest(s, gw.boundFeedPort,
      s"$dir/points", stepSec = 10, heartbeatSec = 3600,
      checkpointDir = s"$dir/ckpt")
    val q1 = boot()
    var q2: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val sender = new Socket("127.0.0.1", gw.boundListenPort)
      val out = new PrintWriter(sender.getOutputStream, true)
      (0 to 50 by 10).foreach(t => out.println(s"hup.m 1 ${base + t}"))
      out.flush()
      val deadline = System.currentTimeMillis() + 60000
      def slots(): Long = Try(
        Ingest.readArchive(s, s"$dir/points").count()).getOrElse(0L)
      while (slots() < 5 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250); q1.processAllAvailable()
      }
      assert(slots() === 5, "pre-restart slots never materialized")
      // the restart signal: stop the lifecycle mid-session. The
      // gateway's watchdog notices the dead feed connection.
      q1.stop()
      Thread.sleep(300)
      // in-flight lines: accepted while NO query is attached
      (60 to 110 by 10).foreach(t => out.println(s"hup.m 1 ${base + t}"))
      out.flush()
      q2 = boot() // relaunch on the same checkpoint + store
      while (slots() < 11 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250); q2.processAllAvailable()
      }
      assert(slots() === 11, "post-restart slots never materialized")
      // every slot [base, base+110) exactly once, value intact — the
      // cross-restart slot [base+50, base+60) proves PDP state carried
      val rows = Ingest.readArchive(s, s"$dir/points").collect()
        .map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
      assert(rows === (0 to 100 by 10).map(t => (base + t, 1.0)))
      sender.close()
    } finally {
      Try(q1.stop()); if (q2 != null) Try(q2.stop()); gw.close()
    }
  }

  test("boot from the checked-in sample config: settings drive the lifecycles") {
    // the reference is config-file-driven (etc/tgres.conf.sample,
    // daemon/config.go); the daemon boots from the same shape. Fixed
    // ports from the file can't bind in a test, so gateways stay
    // ephemeral — every OTHER setting (step, heartbeat, flush, stats
    // prefix, RRA chain) comes from the file, as main wires it.
    val s = spark
    val conf = graft.streaming.Conf.load("etc/graft.conf.sample")
    val (stepSec, hbSec, retain, chain) = graft.streaming.Conf.storeSettings(conf)
    assert(stepSec === 10L && hbSec === 7200L && retain === Some(21600L))
    assert(chain.head === Daemon.Rra(60L, 86400L))
    val dir = Files.createTempDirectory("daemon-conf").toString
    val base = (System.currentTimeMillis() / 1000L - 400) / 60 * 60
    val gGw = new Daemon.LineGateway(0, 0)
    val pkGw = new Daemon.LineGateway(0, 0, framed = true)
    val sGw = new Daemon.LineGateway(0, 0)
    val recv = Daemon.startReceiver(s, gGw.boundFeedPort,
      pkGw.boundFeedPort, s"$dir/points", stepSec, hbSec,
      checkpointDir = s"$dir/ckpt-g",
      // the sample's 1min:24h RRA only — the 10m/1d tiers would idle here
      rras = chain.take(1))
    val sdq = Daemon.startStatsdIngest(s, sGw.boundFeedPort,
      s"$dir/statsd", conf.statFlushSec,
      checkpointDir = s"$dir/ckpt-sd", statsPrefix = conf.statsNamePrefix)
    try {
      val gs = new Socket("127.0.0.1", gGw.boundListenPort)
      val gOut = new PrintWriter(gs.getOutputStream, true)
      (0 to 110 by 10).foreach(t => gOut.println(s"cf.m ${t / 10 % 3} ${base + t}"))
      gOut.flush()
      val ss = new Socket("127.0.0.1", sGw.boundListenPort)
      val sOut = new PrintWriter(ss.getOutputStream, true)
      (1 to 5).foreach(_ => sOut.println("hits:2|c"))
      sOut.flush()
      val deadline = System.currentTimeMillis() + 60000
      def baseSlots(): Long = Try(
        Ingest.readArchive(s, s"$dir/points").count()).getOrElse(0L)
      def sdNames(): Set[String] = Try(
        Ingest.readArchive(s, s"$dir/statsd").collect()
          .map(_.getString(0)).toSet).getOrElse(Set.empty)
      while ((baseSlots() < 11 || sdNames().isEmpty) &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        recv.processAllAvailable()
        sdq.processAllAvailable()
      }
      assert(baseSlots() === 11, "base store never filled at the config step")
      // the file's stats-name-prefix routed the counter
      assert(sdNames() === Set("stats.hits"))
      // the 1min chain tier materialized at the config's coarse step
      val coarse = Ingest.readArchive(s,
        Daemon.Rra(60L, 0L).dir(s"$dir/points")).collect()
      assert(coarse.nonEmpty &&
        coarse.forall(_.getLong(1) % 60L == 0L))
      gs.close(); ss.close()
    } finally {
      Try(sdq.stop()); Try(recv.stop())
      sGw.close(); pkGw.close(); gGw.close()
    }
  }

  test("live RRA chain: coarse stores equal re-consolidation of the base") {
    val s = spark
    val dir = Files.createTempDirectory("daemon-rra").toString
    // near-now timestamps, 40s-aligned: chain retention runs against the
    // wall clock, so an ancient toy epoch would age out instantly
    val base = (System.currentTimeMillis() / 1000L - 400) / 40 * 40
    val gGw = new Daemon.LineGateway(0, 0)
    val pkGw = new Daemon.LineGateway(0, 0, framed = true)
    // base step 10s plus a 40s RRA (span long enough that nothing ages)
    // compactEvery=1: every batch also folds each store's batch
    // debris — the whole lifecycle (merge, RRA cascade, query) must
    // be indistinguishable under the maintenance cadence. fanout=2
    // with uniformly tiny chunks ≡ full collapse, so the final
    // manifest is deterministic (one chunk).
    val q = Daemon.startReceiver(s, gGw.boundFeedPort, pkGw.boundFeedPort,
      s"$dir/points", stepSec = 10, heartbeatSec = 3600,
      checkpointDir = s"$dir/ckpt",
      rras = Seq(Daemon.Rra(40L, 365L * 86400)), compactEvery = 1,
      compactFanout = 2)
    try {
      val sender = new Socket("127.0.0.1", gGw.boundListenPort)
      val out = new PrintWriter(sender.getOutputStream, true)
      // varying values so the coarse weighted mean is non-trivial
      (0 to 160 by 10).foreach(t => out.println(s"ch.m ${t / 10 % 5} ${base + t}"))
      out.flush()
      val deadline = System.currentTimeMillis() + 60000
      def baseSlots(): Long = Try(
        Ingest.readArchive(s, s"$dir/points").count()).getOrElse(0L)
      while (baseSlots() < 16 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        q.processAllAvailable()
      }
      assert(baseSlots() === 16)
      sender.close()
      // the live 40s store must equal re-consolidating the base store
      // (weighted means re-associate — the cascade contract)
      val coarse = Ingest.readArchive(s, Daemon.Rra(40L, 0L).dir(s"$dir/points"))
        .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
      val expect = graft.streaming.ArchiveStore.readLatest(s, s"$dir/points")
        .groupBy(org.apache.spark.sql.functions.expr("name"),
          org.apache.spark.sql.functions.expr("CAST(floor(t / 40) AS BIGINT) * 40 AS ct"))
        .agg(org.apache.spark.sql.functions.expr("sum(vw) / sum(dur) AS v"))
        .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
      assert(coarse === expect)
      assert(coarse.size === 4) // [0,160) at 40s
      // the compaction cadence actually ran: each store's live
      // manifest references exactly one chunk
      Seq(s"$dir/points", Daemon.Rra(40L, 0L).dir(s"$dir/points"))
        .foreach { d =>
          val chunks = graft.streaming.ArchiveStore.state(s, d)
            .get.manifest.values.toSet
          assert(chunks.size === 1, s"$d not compacted: $chunks")
        }
    } finally {
      Try(q.stop()); pkGw.close(); gGw.close()
    }
  }

  test("statsd lines → flush-window aggregation → archive") {
    val s = spark
    val dir = Files.createTempDirectory("daemon-sd").toString
    val archiveDir = s"$dir/archive"
    val gw = new Daemon.LineGateway(0, 0)
    val q = Daemon.startStatsdIngest(s, gw.boundFeedPort, archiveDir,
      flushSec = 10, checkpointDir = s"$dir/ckpt")
    try {
      val sender = new Socket("127.0.0.1", gw.boundListenPort)
      val out = new PrintWriter(sender.getOutputStream, true)
      (1 to 20).foreach(_ => out.println("req:5|c"))
      out.println("temp:42|g")
      out.flush()
      val deadline = System.currentTimeMillis() + 60000
      def arch() = Try(Ingest.readArchive(s, archiveDir)
        .collect().map(r => (r.getString(0), r.getDouble(2))).toMap)
        .getOrElse(Map.empty[String, Double])
      while (arch().size < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        q.processAllAvailable()
      }
      sender.close()
      val got = arch()
      // 20 counter hits × 5 over a 10s flush window → rate 10/s; the
      // gauge stores its set value (routing + prefixes per reference)
      assert(got.get("stats.req").contains(10.0))
      assert(got.get("stats.gauges.temp").contains(42.0))
    } finally {
      Try(q.stop()); gw.close()
    }
  }
}
