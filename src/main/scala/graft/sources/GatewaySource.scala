package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.util

import scala.collection.mutable.ArrayBuffer
import scala.util.Try

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{AcceptsLatestSeenOffset, MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Restart-safe line-socket streaming source for the daemon's gateway
  * feeds — the dev-source role Spark's built-in `socket` source plays,
  * with one semantic fix that built-in cannot express: **offset
  * continuity across a query restart**.
  *
  * The built-in socket source numbers offsets per CONNECTION from 0,
  * so a query restarted on its checkpoint (the graceful-restart path,
  * reference `daemon/daemon.go:131-143` + `graceful/`) resumes from
  * the committed offset while the fresh connection restarts at −1 —
  * the engine then either silently skips that many real lines or dies
  * with out-of-order commits. This source aligns instead: the engine
  * hands it the checkpoint's latest offset
  * ([[AcceptsLatestSeenOffset.setLatestSeenOffset]], with the
  * admission-control `latestOffset(start, _)` as a fallback seam), and
  * lines received on the new connection are numbered FROM that offset
  * — in-flight lines held by the gateway during the bounce land on
  * fresh offsets and nothing is skipped.
  *
  * Like the built-in, batch data ships inside the planned partitions
  * (driver-buffered): this is the single-JVM dev shim for wire
  * listeners — a production cluster swaps Kafka in and every operator
  * downstream is source-agnostic (SURVEY §2.1). Buffer is trimmed on
  * commit; one partition per batch preserves line arrival order for
  * the PDP state machine downstream.
  */
object GatewaySource {
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))
}

/** JVM-global drop counters for the gateway sources, keyed
  * `host:port` — the receiver's `stats.dropped` counter
  * (`receiver/director.go:287-299` increments it when the elastic
  * queue exceeds `max-receiver-queue-size` and the point "goes to
  * /dev/null"). Global because the streams are instantiated inside
  * Spark's source machinery while the daemon's HTTP stats route needs
  * to read them; the source is the single-JVM dev shim by contract,
  * so a process-wide registry is the honest scope. */
object GatewayStats {
  private val drops =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]
  private val accepts =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]
  private val commits =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]
  private def at(m: java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong],
      key: String) =
    m.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong)
  private[sources] def counter(key: String): java.util.concurrent.atomic.AtomicLong =
    at(drops, key)
  private[sources] def acceptCounter(key: String): java.util.concurrent.atomic.AtomicLong =
    at(accepts, key)
  /** Lines dropped at `host:port` since JVM start. */
  def dropped(key: String): Long =
    Option(drops.get(key)).map(_.get).getOrElse(0L)
  /** Lines accepted (offset-assigned) at `host:port` since JVM start. */
  def accepted(key: String): Long =
    Option(accepts.get(key)).map(_.get).getOrElse(0L)
  private[sources] def commitCounter(key: String): java.util.concurrent.atomic.AtomicLong =
    at(commits, key)
  /** Lines whose offsets the engine has COMMITTED at `host:port` —
    * `accepted(k) == committed(k)` means every line the source ever
    * buffered is durably in the store (the rolling-resize quiesce
    * barrier reads exactly this). */
  def committed(key: String): Long =
    Option(commits.get(key)).map(_.get).getOrElse(0L)
  import scala.jdk.CollectionConverters._
  /** All drop counters, stable order. */
  def all(): Seq[(String, Long)] =
    drops.asScala.toSeq.map { case (k, v) => (k, v.get) }.sortBy(_._1)
  /** JVM-wide totals — the reference's `stats.total`/`stats.dropped`
    * pair (`receiver/director.go:202,285-293`). */
  def totalAccepted(): Long = accepts.asScala.valuesIterator.map(_.get).sum
  def totalDropped(): Long = drops.asScala.valuesIterator.map(_.get).sum
}

final case class GatewayOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** `spark.readStream.format(classOf[GatewaySourceProvider].getName)
  * .option("host", h).option("port", p)` */
class GatewaySourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GatewaySource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GatewayTable(properties.get("host"),
      Integer.parseInt(properties.get("port")),
      Option(properties.get("maxQueue")).map(Integer.parseInt).getOrElse(0),
      Option(properties.get("maxMemory")).map(java.lang.Long.parseLong)
        .getOrElse(0L))
}

class GatewayTable(host: String, port: Int, maxQueue: Int, maxMemory: Long)
    extends Table with SupportsRead {
  override def name(): String = s"gateway($host:$port)"
  override def schema(): StructType = GatewaySource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = GatewaySource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GatewayMicroBatchStream(host, port, maxQueue, maxMemory)
    }
}

/** `maxQueue` > 0 bounds the uncommitted line buffer exactly as
  * `max-receiver-queue-size` bounds the reference's elastic queue
  * (`receiver/receiver.go:121-135`, `etc/tgres.conf.sample:7`): a
  * line arriving while the buffer holds `maxQueue` uncommitted lines
  * is DROPPED — it never gets an offset — and counted in
  * [[GatewayStats]], mirroring `stats.dropped++` / "goes to
  * /dev/null" (`receiver/director.go:299`). `maxMemory` > 0 is the
  * memory half of the same bound (`max-memory-bytes`,
  * `director.go:287-291`): lines drop while JVM used heap exceeds it,
  * with the used-heap check cached ~100 ms like the reference's
  * `memoryChecked`. 0 = unbounded for both, the reference's own
  * defaults. Shedding the NEWEST matches the director (the daemon's
  * [[graft.streaming.Daemon.LineGateway]] relay keeps its own small
  * bounded queue in front of this). */
class GatewayMicroBatchStream(host: String, port: Int, maxQueue: Int = 0,
    maxMemory: Long = 0L)
    extends MicroBatchStream with SupportsAdmissionControl
    with AcceptsLatestSeenOffset {

  private val lock = new Object
  // lines received but not yet committed; buf(0) has offset `firstOff`
  private val buf = ArrayBuffer.empty[String]
  private var base = -1L // offset BEFORE this connection's first line
  private var firstOff = 0L // offset of buf(0); advances on commit
  private var aligned = false
  private var received = 0L // lines read on this connection
  private var committed = -1L
  @volatile private var sock: Socket = _

  private val reader = new Thread(() => {
    try {
      val s = new Socket()
      s.connect(new InetSocketAddress(host, port))
      sock = s
      val in = new BufferedReader(new InputStreamReader(
        s.getInputStream, StandardCharsets.UTF_8))
      val dropCounter = GatewayStats.counter(s"$host:$port")
      val acceptCounter = GatewayStats.acceptCounter(s"$host:$port")
      var memChecked = 0L
      var memOver = false
      var line = in.readLine()
      while (line != null) {
        if (maxMemory > 0) {
          val now = System.currentTimeMillis()
          if (now - memChecked >= 100L) { // reference's 100ms cache
            val rt = Runtime.getRuntime
            memOver = rt.totalMemory() - rt.freeMemory() > maxMemory
            memChecked = now
          }
        }
        lock.synchronized {
          if ((maxQueue > 0 && buf.size >= maxQueue) || memOver)
            dropCounter.incrementAndGet()
          else { buf += line; received += 1; acceptCounter.incrementAndGet() }
        }
        line = in.readLine()
      }
    } catch { case _: Exception => () } // gateway gone: go quiet
  }, s"gateway-source-$host:$port")
  reader.setDaemon(true)
  reader.start()

  /** Number this connection's lines from `v`: buffered line i gets
    * offset v + 1 + i. Idempotent — first alignment wins (the engine
    * may surface the checkpoint through setLatestSeenOffset AND the
    * admission-control start offset; they agree). */
  private def align(v: Long): Unit = lock.synchronized {
    if (!aligned) { base = v; firstOff = v + 1; aligned = true }
  }

  /** Restored offsets can surface as the engine's SerializedOffset
    * (raw json) rather than via deserializeOffset — accept both. */
  private def offVal(o: Offset): Long = o match {
    case g: GatewayOffset => g.v
    case other => other.json().trim.toLong
  }

  override def setLatestSeenOffset(offset: Offset): Unit =
    align(offVal(offset))

  override def initialOffset(): Offset = GatewayOffset(-1L)
  override def deserializeOffset(json: String): Offset =
    GatewayOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    align(offVal(start))
    lock.synchronized(GatewayOffset(base + received))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = offVal(start)
    val e = offVal(end)
    align(s)
    val lines = lock.synchronized {
      val from = math.max(0L, s + 1 - firstOff).toInt
      val until = math.max(0L, e + 1 - firstOff).toInt
      buf.slice(from, until).toArray
    }
    if (lines.isEmpty) Array.empty
    else Array(GatewayPartition(lines))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GatewayReaderFactory

  override def commit(end: Offset): Unit = lock.synchronized {
    val e = offVal(end)
    if (aligned && e >= committed) {
      val n = math.max(0L, e + 1 - firstOff).toInt
      val removed = math.min(n, buf.size)
      buf.remove(0, removed)
      GatewayStats.commitCounter(s"$host:$port").addAndGet(removed.toLong)
      firstOff = math.max(firstOff, e + 1)
      committed = e
    }
  }

  override def stop(): Unit = { Try(Option(sock).foreach(_.close())); () }
}

final case class GatewayPartition(lines: Array[String]) extends InputPartition

object GatewayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val lines = partition.asInstanceOf[GatewayPartition].lines
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(lines(i)))
      override def close(): Unit = ()
    }
  }
}
