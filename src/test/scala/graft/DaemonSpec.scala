package graft

import java.io.PrintWriter
import java.net.{HttpURLConnection, Socket, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.{Daemon, Find, Ingest}
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
    val http = Daemon.startHttp(s, 0, archiveDir, stepSec = 10,
      now = () => base + 90L)
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
    } finally {
      Try(q.stop()); http.stop(0); gw.close()
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
