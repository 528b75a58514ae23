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
      Integer.parseInt(properties.get("port")))
}

class GatewayTable(host: String, port: Int) extends Table with SupportsRead {
  override def name(): String = s"gateway($host:$port)"
  override def schema(): StructType = GatewaySource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = GatewaySource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GatewayMicroBatchStream(host, port)
    }
}

class GatewayMicroBatchStream(host: String, port: Int)
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
      var line = in.readLine()
      while (line != null) {
        lock.synchronized { buf += line; received += 1 }
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
      buf.remove(0, math.min(n, buf.size))
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
