package graft.streaming

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.LinkedBlockingQueue
import java.util.concurrent.atomic.AtomicBoolean

import scala.util.Try

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Render
import graft.dsl.Viewport

/** Process frontends — the reference's daemon shell (routes
  * `daemon/http.go:47-51`, graphite listener
  * `daemon/graphite_text.go:179-234`, service lifecycle
  * `daemon/services.go`) re-expressed as: a TCP line gateway feeding a
  * Structured Streaming ingest lifecycle, plus a JDK `HttpServer` query
  * surface over the same archive. With this shell the engine is a
  * runnable metrics daemon: senders open plain TCP connections and
  * write graphite/statsd lines, Grafana-style clients GET `/render`
  * and `/metrics/find`.
  *
  * Scale shape: the gateway is a thin accept-loop (the reference's
  * per-connection goroutines, `daemon/services.go`); ALL heavy work —
  * parsing, PDP state, archive merge — happens inside Spark operators
  * that are identical between this live path and the batch oracle
  * queries (`ig_graphite_parse`, `rrd_*`). On a real cluster the socket
  * source would be swapped for Kafka; every operator downstream is
  * source-agnostic.
  */
object Daemon {

  // ------------------------- line gateway ---------------------------

  /** Accepts MANY sender connections on `listenPort` (the reference's
    * graphite/statsd listener socket) and relays their lines, in
    * arrival order, to the single connection Spark's socket source
    * opens against `feedPort`. Lines arriving while Spark is
    * (re)connecting are buffered, bounded by `capacity` — beyond it the
    * oldest lines drop, matching the reference's bounded ingest
    * channels (it too sheds load rather than OOM). */
  final class LineGateway(val listenPort: Int, val feedPort: Int,
      capacity: Int = 1 << 20) {
    private val queue = new LinkedBlockingQueue[String](capacity)
    private val running = new AtomicBoolean(true)
    private val listenSock = new ServerSocket()
    private val feedSock = new ServerSocket()
    listenSock.bind(new InetSocketAddress("127.0.0.1", listenPort))
    feedSock.bind(new InetSocketAddress("127.0.0.1", feedPort))

    /** Ports actually bound (pass 0 above for ephemeral). */
    def boundListenPort: Int = listenSock.getLocalPort
    def boundFeedPort: Int = feedSock.getLocalPort

    private def daemonThread(name: String)(body: => Unit): Thread = {
      val t = new Thread(() => try body catch { case _: Throwable if !running.get => () }, name)
      t.setDaemon(true); t.start(); t
    }

    daemonThread("gateway-accept") {
      while (running.get) {
        val client = listenSock.accept()
        daemonThread(s"gateway-conn-${client.getPort}") {
          val in = new BufferedReader(new InputStreamReader(
            client.getInputStream, StandardCharsets.UTF_8))
          try Iterator.continually(in.readLine()).takeWhile(_ != null)
            .foreach { line =>
              if (!queue.offer(line)) { queue.poll(); queue.offer(line); () }
            }
          finally client.close()
        }
        ()
      }
    }

    daemonThread("gateway-feed") {
      while (running.get) {
        val spark = feedSock.accept() // Spark's socket source connects
        val out = new PrintWriter(spark.getOutputStream, true)
        try while (running.get && !out.checkError()) {
          val line = queue.take()
          out.println(line)
        } finally spark.close()
      }
    }

    def close(): Unit = {
      running.set(false)
      Try(listenSock.close()); Try(feedSock.close())
      ()
    }
  }

  // ---------------------- ingest lifecycles -------------------------

  /** Graphite plaintext lifecycle: socket stream → [[Ingest.parseGraphite]]
    * → exact PDP pieces (stateful, heartbeat-evicted) → partition-scoped
    * archive merge per micro-batch. */
  def startGraphiteIngest(spark: SparkSession, feedPort: Int,
      archiveDir: String, stepSec: Long, heartbeatSec: Long,
      checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val lines = spark.readStream.format("socket")
      .option("host", "127.0.0.1").option("port", feedPort).load()
      .toDF("line")
    val pts = Ingest.parseGraphite(lines,
        nowSec = unix_timestamp(current_timestamp()))
      .as[(String, Long, Double)]
    Ingest.pdpPieces(spark, pts, heartbeatSec).toDF()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Ingest.mergePiecesIntoArchive(spark, batch, archiveDir, stepSec)
      }
      .start()
  }

  /** StatsD lifecycle: socket stream → [[Ingest.parseStatsd]] →
    * [[Ingest.statsdToCommands]] → per-flush-window aggregation
    * ([[StatsdAgg]]) merged into the archive as whole-window pieces.
    * (TCP lines; the reference listens on UDP and TCP — the wire
    * grammar is identical.) */
  def startStatsdIngest(spark: SparkSession, feedPort: Int,
      archiveDir: String, flushSec: Long,
      checkpointDir: String): StreamingQuery = {
    val lines = spark.readStream.format("socket")
      .option("host", "127.0.0.1").option("port", feedPort).load()
      .toDF("line")
    val cmds = Ingest.statsdToCommands(Ingest.parseStatsd(lines))
    cmds.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (raw: DataFrame, _: Long) =>
        // tsSec/seq are assigned HERE, where the micro-batch is a static
        // DataFrame: monotonically_increasing_id() is illegal in a
        // streaming plan (UnsupportedOperationChecker rejects it at
        // start()). seq only feeds StatsdAgg.gaugeLast's (tsSec, seq)
        // last-wins tiebreak, a within-batch total order — batch-local
        // ids preserve the socket arrival order exactly as well.
        val batch = raw
          .withColumn("tsSec", unix_timestamp(current_timestamp()))
          .withColumn("seq", monotonically_increasing_id())
        val slots = StatsdAgg.counterRate(
            batch.filter(col("cmd") === "add"), flushSec)
          .unionByName(StatsdAgg.gaugeSum(
            batch.filter(col("cmd") === "addgauge"), flushSec))
          .unionByName(StatsdAgg.gaugeLast(
            batch.filter(col("cmd") === "setgauge"), flushSec))
          .unionByName(StatsdAgg.timers(
            batch.filter(col("cmd") === "append"), flushSec))
        val pieces = slots.select(col("name"), col("t").as("begin"),
          (col("t") + flushSec).as("end"), col("value"))
        Ingest.mergePiecesIntoArchive(spark, pieces, archiveDir, flushSec)
      }
      .start()
  }

  // ------------------------- HTTP surface ---------------------------

  /** `/render` + `/metrics/find` over the archive store — the
    * reference's two query routes (`daemon/http.go:47-51`,
    * `http/graphite.go:77-181`). `now` is injectable for tests;
    * production defaults to the wall clock. */
  def startHttp(spark: SparkSession, port: Int, archiveDir: String,
      stepSec: Long, maxPointsDefault: Int = 512,
      now: () => Long = () => System.currentTimeMillis() / 1000L): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

    def params(ex: HttpExchange): Map[String, Seq[String]] = {
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      q.split("&").filter(_.nonEmpty).toSeq
        .map { kv =>
          val i = kv.indexOf('=')
          val k = if (i < 0) kv else kv.substring(0, i)
          val v = if (i < 0) "" else java.net.URLDecoder.decode(
            kv.substring(i + 1), StandardCharsets.UTF_8)
          (k, v)
        }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    }

    def respond(ex: HttpExchange)(body: => String): Unit = {
      val (code, payload) =
        try (200, body)
        catch {
          case e: IllegalArgumentException => (400, s"""{"error":"${e.getMessage}"}""")
          case e: Exception => (500, s"""{"error":"${e.getMessage}"}""")
        }
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    server.createContext("/render", (ex: HttpExchange) => respond(ex) {
      val p = params(ex)
      val targets = p.getOrElse("target", Seq.empty)
      val from = p.get("from").flatMap(_.headOption).getOrElse("")
      val until = p.get("until").flatMap(_.headOption).getOrElse("")
      val maxDp = p.get("maxDataPoints").flatMap(_.headOption)
        .map(_.toInt).getOrElse(maxPointsDefault)
      val ctx = Viewport.ctx(spark, Ingest.readArchive(spark, archiveDir),
        stepSec, from, until, now(), maxDp)
      Render.renderTargets(ctx, targets)
    })

    server.createContext("/metrics/find", (ex: HttpExchange) => respond(ex) {
      val p = params(ex)
      val pattern = p.get("query").flatMap(_.headOption).getOrElse("*")
      Render.toFindJson(Find.findNodes(
        Ingest.readArchive(spark, archiveDir).select("name").distinct(),
        pattern))
    })

    server.start()
    server
  }

  // ----------------------------- main --------------------------------

  /** Runnable daemon: graphite on GRAFT_GRAPHITE_PORT (default 2003),
    * statsd lines on GRAFT_STATSD_PORT (8125), HTTP on GRAFT_HTTP_PORT
    * (8080), archives under GRAFT_DATA_DIR. Blocks until killed. */
  def main(args: Array[String]): Unit = {
    def env(k: String, d: String) = sys.env.getOrElse(k, d)
    val dataDir = env("GRAFT_DATA_DIR",
      Files.createTempDirectory("graft-daemon").toString)
    val stepSec = env("GRAFT_STEP_SEC", "10").toLong
    val spark = SparkSession.builder()
      .master(env("GRAFT_MASTER", "local[4]"))
      .appName("graft-daemon")
      .config("spark.sql.shuffle.partitions",
        env("GRAFT_SHUFFLE_PARTITIONS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gGw = new LineGateway(env("GRAFT_GRAPHITE_PORT", "2003").toInt, 0)
    val sGw = new LineGateway(env("GRAFT_STATSD_PORT", "8125").toInt, 0)
    startGraphiteIngest(spark, gGw.boundFeedPort, s"$dataDir/graphite",
      stepSec, heartbeatSec = env("GRAFT_HEARTBEAT_SEC", "300").toLong,
      checkpointDir = s"$dataDir/ckpt-graphite")
    startStatsdIngest(spark, sGw.boundFeedPort, s"$dataDir/statsd",
      flushSec = env("GRAFT_FLUSH_SEC", "10").toLong,
      checkpointDir = s"$dataDir/ckpt-statsd")
    val http = startHttp(spark,
      env("GRAFT_HTTP_PORT", "8080").toInt, s"$dataDir/graphite", stepSec)
    println(s"graft daemon: graphite=${gGw.boundListenPort} " +
      s"statsd=${sGw.boundListenPort} http=${http.getAddress.getPort} " +
      s"data=$dataDir")
    spark.streams.awaitAnyTermination()
  }
}
