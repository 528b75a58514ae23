package graft.streaming

import java.io.{IOException, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Ingest-tier scale-out: N daemon processes each OWN a hash-slice of
  * the series space, and any daemon accepts any point — the reference's
  * cluster subsystem (`cluster/cluster.go:209-218` `selectNodes`
  * assigns a node by id-modulo over the ready list;
  * `cluster/cluster.go:226-250` `LoadDistData` registers each series
  * under its selected node; `receiver/director.go:89-117`
  * `directorProcessOrForward` processes owned series locally and
  * forwards the rest to their owner, with
  * `receiver/director.go:55-66`'s one-hop rule: a forwarded point is
  * never forwarded again).
  *
  * Spark-first re-expression: ownership is a pure function of the
  * CANONICAL series name — `pmod(xxhash64(name), shards)`, the exact
  * hash Spark SQL exposes, so the partition rule is checkable from a
  * plan (`ShardSpec` pins the plain-JVM twin bit-equal to the Column
  * form) and a render tier can prove store disjointness with one SQL
  * predicate. The reference selects by sequential DS id modulo node
  * count; a shared-nothing ingest tier has no global id allocator, so
  * the stable name hash replaces it (same properties: deterministic,
  * uniform, agreed by every node — documented divergence). Each shard
  * runs the UNCHANGED single-daemon pipeline against its own archive
  * stores; the render tier reads the union of the shards' store dirs
  * (`Ingest.readArchives` — already multi-store). Forwarding is the
  * reference's internal cluster envelope re-expressed as a marker
  * prefix on the wire line: a marked line is ingested where it lands
  * and never re-forwarded (`dp.Hops` semantics).
  *
  * At 100 TB/day: the gateway tier scales linearly in N (each daemon
  * owns 1/N of the series, sees ~1/N of the points after one
  * forwarding hop), the stores stay disjoint (no cross-daemon write
  * coordination — the MVCC manifests are per-store), and the render
  * tier is stateless over the union. */
object Shard {

  /** Envelope marking an already-forwarded line (the reference's
    * `dp.Hops > 0`): ingested where it lands, never re-forwarded. The
    * marker cannot collide with a metric name: `sanitizeName` strips
    * nothing here — the director checks it BEFORE parse, and external
    * senders speak plain graphite. */
  val FwdMarker = "__graft_fwd__ "

  /** Plain-JVM twin of [[Ingest.sanitizeName]] (`misc/misc.go:28-37`):
    * whitespace→_, /→-, strip everything outside [a-zA-Z_\-0-9.]. */
  def sanitizePlain(s: String): String =
    s.replaceAll("\\s+", "_").replace("/", "-")
      .replaceAll("[^a-zA-Z_\\-0-9\\.]", "")

  /** Plain-JVM twin of [[Ingest.sanitizeTagged]] — the canonical
    * stored identity of a raw wire name (tag entries sanitized,
    * last-wins deduped, sorted; untagged names pass through
    * [[sanitizePlain]]). MUST stay bit-equal to the Column form:
    * ownership is computed here at the gateway while the stored name
    * is computed executor-side at parse — divergence would split one
    * series across two shards. Pinned by ShardSpec's property case. */
  def canonicalName(raw: String): String = {
    val parts = raw.split(";", -1)
    val base = sanitizePlain(parts(0))
    val ents = parts.drop(1).filter(_.contains("=")).map { t =>
      val i = t.indexOf('=')
      sanitizePlain(t.substring(0, i)) + "=" + sanitizePlain(t.substring(i + 1))
    }
    val deduped = ents.zipWithIndex.filter { case (t, i) =>
      val k = t.substring(0, t.indexOf('='))
      !ents.drop(i + 1).exists(u => u.substring(0, u.indexOf('=')) == k)
    }.map(_._1)
    if (deduped.isEmpty) base
    else base + ";" + deduped.sorted.mkString(";")
  }

  /** The partition rule: `pmod(xxhash64(name), shards)` — bit-equal to
    * the Spark SQL expression (XXH64 over the UTF-8 bytes, seed 42),
    * so the render tier can assert store disjointness in one plan.
    * The `selectNodes` analogue (`cluster/cluster.go:209-218`). */
  def owner(canonical: String, shards: Int): Int = {
    require(shards >= 1, "shards >= 1")
    java.lang.Math.floorMod(
      XXH64.hashUTF8String(UTF8String.fromString(canonical), 42L),
      shards.toLong).toInt
  }

  /** First whitespace-separated token of a graphite text line — the
    * name field `Ingest.parseGraphite` splits out. */
  def nameOf(line: String): Option[String] =
    line.trim.split("\\s+").headOption.filter(_.nonEmpty)

  /** StatsD line name: the token before `:`
    * (`daemon/statsd_text.go`'s split). */
  def statsdNameOf(line: String): Option[String] = {
    val i = line.indexOf(':')
    if (i > 0) Some(line.substring(0, i)) else None
  }

  /** Line forwarder to peer gateways — the reference's cluster send
    * channel (`receiver/director.go:55-66`). One lazily-connected,
    * per-peer socket, re-dialed once per send on failure; a line that
    * cannot be delivered DROPS with a counter (the reference logs and
    * skips — `director: Error forwarding a data point`), it never
    * blocks the gateway. */
  final class Forwarder(peerPorts: Seq[Int], host: String = "127.0.0.1") {
    private val socks = Array.fill[Option[(Socket, OutputStream)]](
      peerPorts.size)(None)
    val forwarded = new AtomicLong
    val dropped = new AtomicLong

    private def connect(i: Int): (Socket, OutputStream) = {
      val s = new Socket()
      s.connect(new InetSocketAddress(host, peerPorts(i)), 2000)
      val out = s.getOutputStream
      socks(i) = Some((s, out))
      (s, out)
    }

    /** Send one line to peer `i` (appends the newline). */
    def send(i: Int, line: String): Unit = synchronized {
      val bytes = (line + "\n").getBytes(StandardCharsets.UTF_8)
      def attempt(conn: (Socket, OutputStream)): Unit = {
        conn._2.write(bytes); conn._2.flush()
      }
      try {
        attempt(socks(i).getOrElse(connect(i)))
        forwarded.incrementAndGet(); ()
      } catch {
        case _: IOException =>
          socks(i).foreach(c => { try c._1.close() catch { case _: IOException => () } })
          socks(i) = None
          try {
            attempt(connect(i))
            forwarded.incrementAndGet(); ()
          } catch {
            case _: IOException =>
              socks(i).foreach(c => { try c._1.close() catch { case _: IOException => () } })
              socks(i) = None
              dropped.incrementAndGet(); ()
          }
      }
    }

    def close(): Unit = synchronized {
      socks.indices.foreach { i =>
        socks(i).foreach(c => { try c._1.close() catch { case _: IOException => () } })
        socks(i) = None
      }
    }
  }

  /** The director (`receiver/director.go:89-117`): every line landing
    * on this shard's gateway routes by the partition rule — owned
    * lines pass through to the local receiver, foreign lines forward
    * (marked) to their owner, already-forwarded lines ingest where
    * they land. Plugs into [[Daemon.LineGateway]]'s `route` hook, so
    * the blaster, self-stats and pixel offers direct exactly like
    * socket traffic (the reference's self-stats are ordinary points
    * through the same director).
    *
    * `parseName`/`canon` default to the graphite text wire; the
    * statsd gateway directs with [[statsdNameOf]]/[[sanitizePlain]]
    * (ownership keys on the sanitized WIRE name — the invariant is
    * "each statsd series aggregates on exactly ONE shard", which is
    * what makes the sharded union's per-series mass equal a single
    * daemon's; the stored names carry type-routing prefixes and are
    * derived, not the partition key). */
  final class Director(val shardIndex: Int, val shardCount: Int,
      val forwarder: Forwarder,
      parseName: String => Option[String] = nameOf,
      canon: String => String = canonicalName) {
    require(shardIndex >= 0 && shardIndex < shardCount,
      s"shard index $shardIndex outside 0..${shardCount - 1}")
    val kept = new AtomicLong
    val received = new AtomicLong // forwarded lines accepted here

    def route(line: String): Option[String] =
      if (line.startsWith(FwdMarker)) { // hops exhausted: ingest here
        received.incrementAndGet()
        Some(line.substring(FwdMarker.length))
      } else parseName(line) match {
        case None => Some(line) // malformed: local parse drops it
        case Some(raw) =>
          val o = owner(canon(raw), shardCount)
          if (o == shardIndex) { kept.incrementAndGet(); Some(line) }
          else { forwarder.send(o, FwdMarker + line); None }
      }

    def close(): Unit = forwarder.close()
  }

  /** Pickle-frame director — the carbon-pickle protocol's member of
    * the shard tier. The reference's pickle listener PARSES frames
    * before the director sees the points (`daemon/graphite_pickle.go`
    * → the shared receiver), and so does this: each base64 frame the
    * pickle gateway relays is decoded AT THE GATEWAY, its owned
    * points re-encode into a local frame, and its foreign points
    * forward as MARKED canonical graphite TEXT lines to their owner's
    * graphite gateway — legitimate because every point protocol
    * funnels into the ONE receiver ([[Daemon.startReceiver]] unions
    * graphite + pickle into shared PDP state), so a text-forwarded
    * pickle point is semantically identical to a framed one. The
    * canonical name is computed before re-emission (sanitization is
    * idempotent, and canonical names carry no whitespace, so the text
    * framing is safe); `Double.toString` round-trips values exactly
    * and the parse normalizes NaN/Inf tokens. Undecodable frames pass
    * through for the executor-side parse to drop, like malformed
    * text lines. */
  final class PickleDirector(val shardIndex: Int, val shardCount: Int,
      val forwarder: Forwarder) {
    require(shardIndex >= 0 && shardIndex < shardCount,
      s"shard index $shardIndex outside 0..${shardCount - 1}")
    val kept = new AtomicLong // points kept in local frames
    val forwardedPoints = new AtomicLong

    def route(b64: String): Option[String] = {
      val pts =
        try Pickle.decodeFrames(java.util.Base64.getDecoder.decode(b64))
        catch { case _: Exception => return Some(b64) } // executor drops it
      val (mine, theirs) = pts.partition(p =>
        owner(canonicalName(p.name), shardCount) == shardIndex)
      theirs.foreach { p =>
        val canon = canonicalName(p.name)
        forwarder.send(owner(canon, shardCount),
          FwdMarker + s"$canon ${p.value} ${p.tsSec}")
        forwardedPoints.incrementAndGet(); ()
      }
      kept.addAndGet(mine.size.toLong)
      if (mine.isEmpty) None
      else if (theirs.isEmpty) Some(b64) // untouched frame, no re-encode
      else Some(java.util.Base64.getEncoder
        .encodeToString(Pickle.encodeFrame(mine)))
    }

    def close(): Unit = forwarder.close()
  }
}
