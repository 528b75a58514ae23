package graft.streaming

import java.io.{IOException, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions.{col, lit, pmod, sum, xxhash64}
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

  /** Envelope marking a primary copy RE-DELIVERED from a replica copy
    * during a transition ([[Director.reroute]]): ingested where it
    * lands like [[FwdMarker]], but NEVER re-fans replica copies even
    * under reroute — the fan is what the replica side already did, and
    * without the distinction a rerouted keep-and-fan and a rerouted
    * replica re-home feed each other forever (fan → ReplMarker →
    * re-deliver → fan → …). */
  val Fwd1Marker = "__graft_fwd1__ "

  /** The ring PREDECESSORS whose series shard `i`'s replica store
    * holds — the inverse of the director's successor placement
    * (`replicasOf(o) = {(o+k) mod n, 0 < k < copies}`): all owners o
    * with i ∈ replicasOf(o). The reshard lifecycle seeds a replica
    * receiver with exactly these shards' seed slices
    * (`GRAFT_PDP_SEED_ALL`). */
  def replicatedBy(i: Int, n: Int, copies: Int): Seq[Int] =
    (1 until copies).map(k => java.lang.Math.floorMod(i - k, n))
      .distinct.filter(_ != i)

  /** Envelope marking a REPLICA copy (the reference's n-copy placement:
    * `cluster/cluster.go:183-191` `Copies`, `cluster.go:209-218`
    * `selectNodes` assigns `nodes[(id+i) % len]` for i < copies — the
    * owner plus its ring successors; `receiver/director.go:89-117`
    * forwards every incoming point to EVERY selected node it is not
    * itself). A repl-marked line ingests into the landing shard's
    * REPLICA store — never its primary (store disjointness holds), and
    * never re-forwards (same one-hop rule as [[FwdMarker]]). */
  val ReplMarker = "__graft_repl__ "

  /** Transition FENCE line (never stored): sent by a member's
    * forwarders to every peer after a drain/quiesce flush, counted by
    * the receiving gateway ([[graft.streaming.Daemon.LineGateway]])
    * and reported via `/admin/info`. TCP is FIFO per connection and
    * each gateway connection has ONE reader thread, so once a peer has
    * counted the fence, every line the sender wrote BEFORE it on that
    * connection is parked in the peer's hold buffer — the co-presence
    * proof the transition's re-admission rounds need (a drain round
    * that runs before a prior round's redeliveries have LANDED leaves
    * them to race live traffic after open; observed as one wave lost
    * on the replica path under a 5× co-tenant slowdown). */
  val FenceMarker = "__graft_fence__ "

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
    * CHANNEL (`receiver/director.go:55-66`: the director enqueues into
    * a buffered channel and moves on; a dedicated goroutine drains it
    * to the peer connection). Same decoupling here: [[send]] is a
    * non-blocking bounded-queue offer — O(µs), no shared lock, no
    * socket I/O on the caller (the gateway reader threads: TCP conns,
    * the UDP datagram loop, pixel HTTP) — and one DAEMON SENDER THREAD
    * per peer drains its queue over a buffered socket, flushing when
    * the queue goes momentarily empty or every `flushLines` lines. A
    * line that cannot be delivered DROPS with a counter (the reference
    * logs and skips — `director: Error forwarding a data point`), it
    * never blocks the gateway: a FULL queue drops the new line at
    * offer, and a dead peer trips a cooldown circuit-breaker so the
    * drain drops instantly instead of paying the connect timeout per
    * line. Per-peer ordering is preserved (single queue, single
    * drainer).
    *
    * At scale this is the shape that survives: a slow or down peer
    * costs bounded memory (`queueCap` lines) and zero gateway latency,
    * while the happy path batches thousands of lines per syscall
    * instead of one write+flush each. */
  final class Forwarder(peerPorts: Seq[Int], host: String = "127.0.0.1",
      queueCap: Int = 1 << 16, connectTimeoutMs: Int = 250,
      cooldownMs: Long = 2000L, flushLines: Int = 2048) {
    val forwarded = new AtomicLong // lines written to a peer socket
    val dropped = new AtomicLong // queue-full + delivery failures

    private final class Peer(port: Int) {
      val q = new java.util.concurrent.ArrayBlockingQueue[String](queueCap)
      val started = new java.util.concurrent.atomic.AtomicBoolean(false)
      @volatile var thread: Thread = null
      @volatile private var sock: Option[(Socket, OutputStream)] = None
      private var downUntil = 0L // drain-thread-only

      private def closeSock(): Unit = {
        sock.foreach(c => { try c._1.close() catch { case _: IOException => () } })
        sock = None
      }

      private def conn(): OutputStream = sock match {
        case Some((_, out)) => out
        case None =>
          val s = new Socket()
          s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
          // buffered: the drain loop writes line-by-line, the wire
          // sees kilobyte batches
          val out = new java.io.BufferedOutputStream(
            s.getOutputStream, 64 * 1024)
          sock = Some((s, out))
          out
      }

      private def drain(): Unit = {
        var sinceFlush = 0
        while (running.get || !q.isEmpty) {
          val line = q.poll(100, java.util.concurrent.TimeUnit.MILLISECONDS)
          if (line == null) {
            // queue momentarily empty: push buffered bytes to the wire
            if (sinceFlush > 0) {
              try { conn().flush(); forwarded.addAndGet(sinceFlush.toLong) }
              catch { case _: IOException =>
                closeSock(); dropped.addAndGet(sinceFlush.toLong)
                downUntil = System.currentTimeMillis() + cooldownMs
              }
              sinceFlush = 0
            }
          } else if (downUntil > System.currentTimeMillis()) {
            dropped.incrementAndGet(); () // circuit open: drop fast
          } else {
            try {
              conn().write((line + "\n").getBytes(StandardCharsets.UTF_8))
              sinceFlush += 1
              if (sinceFlush >= flushLines) {
                conn().flush(); forwarded.addAndGet(sinceFlush.toLong)
                sinceFlush = 0
              }
            } catch {
              case _: IOException =>
                closeSock()
                // PESSIMISTIC accounting: the 64 KB buffer auto-flushes
                // mid-batch, so some of sinceFlush may already be on
                // the peer's wire when the failure fires — their fate
                // is unknowable from this side, and a line is counted
                // forwarded only once its batch flush SUCCEEDS. Drops
                // therefore over-count on a connection failure (never
                // under-count): at-most-once bookkeeping, matching the
                // reference's drop-when-behind channel accounting.
                dropped.addAndGet(sinceFlush.toLong + 1L)
                sinceFlush = 0
                downUntil = System.currentTimeMillis() + cooldownMs
            }
          }
        }
        if (sinceFlush > 0) { // final flush on shutdown
          try { conn().flush(); forwarded.addAndGet(sinceFlush.toLong) }
          catch { case _: IOException => dropped.addAndGet(sinceFlush.toLong) }
        }
        closeSock()
      }

      def offer(line: String): Unit = {
        if (started.compareAndSet(false, true)) {
          val t = new Thread(() => try drain() catch { case _: Throwable => () },
            s"shard-fwd-$host:$port")
          t.setDaemon(true); thread = t; t.start()
        }
        if (!q.offer(line)) { dropped.incrementAndGet(); () }
      }
    }

    private val running = new java.util.concurrent.atomic.AtomicBoolean(true)
    private val peers = peerPorts.map(new Peer(_)).toArray

    /** Enqueue one line for peer `i` (the drainer appends the
      * newline). Never blocks: a full queue drops the line. */
    def send(i: Int, line: String): Unit = peers(i).offer(line)

    /** Wait (bounded) for every peer queue to drain to the wire
      * WITHOUT stopping the drainers — the quiesce barrier's flush: a
      * resize must see pending forwards delivered (into peers' hold
      * buffers) while keeping the forwarder usable, so an ABORTED
      * transition can still route (the old directors stay live until
      * resume replaces them). Returns false when a dead peer's queue
      * could not drain in time — its lines are bounded by `queueCap`
      * and counted dropped by the circuit breaker, the reference's
      * drop-when-behind accounting. */
    def flushed(timeoutMs: Long = 5000): Boolean = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (peers.exists(p => !p.q.isEmpty) &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      // queues empty → one more drain-loop empty-poll cycle pushes the
      // buffered bytes to the wire (the 100 ms poll flush)
      Thread.sleep(250)
      peers.forall(_.q.isEmpty)
    }

    /** Enqueue a [[FenceMarker]] line to every peer except `except`
      * (self — peers are shard-index-aligned and self-delivery is
      * local). Returns the number of peers fenced; follow with
      * [[flushed]] to push the fences to the wire. A cooled-down dead
      * peer drops its fence like any line — the coordinator's bounded
      * fence-wait times out loudly instead of wedging. */
    def fence(tag: String, except: Int): Int = {
      var n = 0
      peers.indices.foreach { i =>
        if (i != except) { peers(i).offer(FenceMarker + tag); n += 1 }
      }
      n
    }

    /** Stop accepting, give the drainers a bounded grace to flush what
      * is queued (so a graceful daemon shutdown does not shed lines a
      * peer would have taken), then cut. */
    def close(): Unit = if (running.compareAndSet(true, false)) {
      val deadline = System.currentTimeMillis() + 1000
      peers.foreach { p =>
        val t = p.thread
        if (t != null) t.join(math.max(1, deadline - System.currentTimeMillis()))
      }
    }

    /** Cut DISCARDING whatever is still queued (counted dropped) — the
      * resize-commit close: these queues hold decisions made under the
      * OLD shard count, and flushing them after a peer resumed at the
      * new count would plant a series on a non-owner's store
      * ([[Director.route]] ingests a marked line where it lands, by
      * the one-hop rule). Quiesce already flushed everything that
      * mattered (and the coordinator verifies `flushed`); anything
      * still here is stale by definition. */
    def closeDiscarding(): Unit = if (running.compareAndSet(true, false)) {
      peers.foreach { p =>
        var n = 0
        while (p.q.poll() != null) n += 1
        if (n > 0) { dropped.addAndGet(n.toLong); () }
      }
      val deadline = System.currentTimeMillis() + 500
      peers.foreach { p =>
        val t = p.thread
        if (t != null) t.join(math.max(1, deadline - System.currentTimeMillis()))
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
      canon: String => String = canonicalName,
      val copies: Int = 1,
      replicaOffer: String => Unit = _ => ()) {
    require(shardIndex >= 0 && shardIndex < shardCount,
      s"shard index $shardIndex outside 0..${shardCount - 1}")
    require(copies >= 1 && copies <= shardCount,
      s"copies $copies outside 1..$shardCount")
    val kept = new AtomicLong
    val received = new AtomicLong // forwarded lines accepted here
    val replKept = new AtomicLong // replica copies stored here
    val replReceived = new AtomicLong // repl-marked lines accepted here

    /** See [[Shard.replicatedBy]] for the inverse (who `r` holds). */
    /** The ring successors holding replicas of series owned by `o` —
      * `selectNodes`' `nodes[(id+i) % len]`, i in 1..copies-1. */
    private def replicasOf(o: Int): Seq[Int] =
      (1 until copies).map(i => (o + i) % shardCount)

    def route(line: String): Option[String] =
      if (line.startsWith(FwdMarker)) { // hops exhausted: ingest here
        received.incrementAndGet()
        Some(line.substring(FwdMarker.length))
      } else if (line.startsWith(Fwd1Marker)) { // same one-hop rule
        received.incrementAndGet()
        Some(line.substring(Fwd1Marker.length))
      } else if (line.startsWith(ReplMarker)) { // replica copy: own store
        replReceived.incrementAndGet()
        replicaOffer(line.substring(ReplMarker.length))
        None
      } else routePlain(line)

    private def routePlain(line: String): Option[String] =
      parseName(line) match {
        case None => Some(line) // malformed: local parse drops it
        case Some(raw) =>
          val o = owner(canon(raw), shardCount)
          // the reference's director: deliver to EVERY selected node
          // from the entry (process locally when self is selected,
          // forward to the rest) — each copy travels at most one hop
          replicasOf(o).foreach { r =>
            if (r == shardIndex) { replKept.incrementAndGet(); replicaOffer(line) }
            else forwarder.send(r, ReplMarker + line)
          }
          if (o == shardIndex) { kept.incrementAndGet(); Some(line) }
          else { forwarder.send(o, FwdMarker + line); None }
      }

    /** Transition-window route (the membership-change re-home): a held
      * line's marker encodes a decision made under the OLD shard count,
      * so it is VOID here — strip it and re-decide under THIS director's
      * count. Safe under agreement (re-routing a marked line lands it at
      * its new owner and stops), and every duplicate delivery the rules
      * below create self-heals downstream: the PDP state machine rejects
      * a second point at the same (name, ts) (`Ingest.pdpPieces`
      * `ts > lastTs`).
      *
      * Per-flavor rules, each send-bounded so rerouting members cannot
      * feed each other forever:
      *  - PLAIN: full [[routePlain]] (primary keep-or-forward + replica
      *    fan) — the line has never been decided.
      *  - [[FwdMarker]] (an old-count primary copy): keep-or-forward
      *    under the new count, and FAN replicas when kept — its replica
      *    twin may have been consumed into an OLD epoch's replica store
      *    before the hold, so without the fan the new-count replica
      *    tier would miss the line (observed: the straddle slot gone
      *    from the fallback render after the new owner died).
      *  - [[ReplMarker]] (an old-count replica copy): deliver the
      *    replica locally if this shard is a new-count holder (else one
      *    hop to the first holder), AND re-deliver the PRIMARY as
      *    [[Fwd1Marker]] — the copy that traveled as the primary may
      *    have DIED with a departed member (observed: the replica copy
      *    was the slot's only surviving piece, stranded in a store no
      *    render reads). Fwd1 keeps WITHOUT fanning, which is what
      *    breaks the fan→repl→re-deliver→fan cycle.
      *  - [[Fwd1Marker]]: keep-or-forward, never fan. */
    def reroute(line: String): Option[String] =
      if (line.startsWith(FwdMarker)) routePlain(line.substring(FwdMarker.length))
      else if (line.startsWith(Fwd1Marker)) {
        val l = line.substring(Fwd1Marker.length)
        parseName(l) match {
          case None => Some(l)
          case Some(raw) =>
            val o = owner(canon(raw), shardCount)
            if (o == shardIndex) { kept.incrementAndGet(); Some(l) }
            else { forwarder.send(o, Fwd1Marker + l); None }
        }
      } else if (line.startsWith(ReplMarker)) {
        val l = line.substring(ReplMarker.length)
        parseName(l) match {
          case None => None // malformed replica copy: nothing to place
          case Some(raw) =>
            val o = owner(canon(raw), shardCount)
            val holders = replicasOf(o)
            if (holders.contains(shardIndex)) {
              replKept.incrementAndGet(); replicaOffer(l)
            } else holders.headOption.foreach(r =>
              forwarder.send(r, ReplMarker + l))
            if (o == shardIndex) { kept.incrementAndGet(); Some(l) }
            else { forwarder.send(o, Fwd1Marker + l); None }
        }
      } else routePlain(line)

    def close(): Unit = forwarder.close()

    /** Resize-commit close: see [[Forwarder.closeDiscarding]]. */
    def closeDiscarding(): Unit = forwarder.closeDiscarding()
  }

  /** OWNER-PREFERRED cluster render over primary + replica stores: the
    * union of every live shard's primary store, with a DOWN shard's
    * slice served from the replica store on its nearest live ring
    * successor, FILTERED to the down shard's ownership predicate
    * (`pmod(xxhash64(name), n) = i`) — a replica store on shard r
    * holds the series of EVERY owner that selected r (all o with
    * r − o < copies on the ring), so the filter is what keeps the
    * union double-count-free for any `copies`. All-up this degenerates
    * to the plain primary union (replicas never read). The reference
    * renders owner-preferred the same way: `NodesForDistDatum` lists
    * owner first, the query goes to the first ready node. */
  /** The nearest LIVE ring successor holding shard `i`'s replica —
    * loud when every holder is down too (the slice is unservable).
    * Shared by both cluster readers so the owner-preferred and raw
    * render paths can never diverge on holder selection. */
  private def fallbackHolder(i: Int, n: Int, copies: Int,
      down: Set[Int]): Int =
    (1 until copies).map(k => (i + k) % n).find(!down(_))
      .getOrElse(sys.error(
        s"shard $i is down and so is every replica holder " +
          s"(copies=$copies)"))

  private def requireClusterDirs(n: Int, replicaDirs: Seq[String],
      down: Set[Int]): Unit = {
    require(replicaDirs.size == n,
      s"${replicaDirs.size} replica dirs for $n shards")
    require(down.size < n, "every shard is down")
  }

  def readClusterArchives(spark: SparkSession, shardPointDirs: Seq[String],
      replicaPointDirs: Seq[String], copies: Int,
      down: Set[Int] = Set.empty): DataFrame = {
    val n = shardPointDirs.size
    requireClusterDirs(n, replicaPointDirs, down)
    val primaries = shardPointDirs.indices.filterNot(down)
      .map(i => Ingest.readArchive(spark, shardPointDirs(i)))
    val fallbacks = shardPointDirs.indices.filter(down).map { i =>
      val r = fallbackHolder(i, n, copies, down)
      Ingest.readArchive(spark, replicaPointDirs(r))
        .filter(pmod(xxhash64(col("name")), lit(n.toLong)).cast("int")
          === i)
    }
    (primaries ++ fallbacks).reduce(_.unionByName(_))
  }

  /** [[readClusterArchives]] for a fleet that is RESIZED and DEGRADED
    * at once: every source — the live shards' primary stores, an
    * ownership-FILTERED replica slice standing in for each down shard,
    * and the previous epochs' read-only primary stores (`extraDirs`) —
    * contributes its RAW (vw, dur) slot pieces, and ONE weighted merge
    * recombines resize-straddling slots exactly (the
    * `Ingest.readArchives` merge, extended with the replica-fallback
    * selection). `extraDirs` must be prior epochs' PRIMARY stores
    * only: a slot present under two sources with the same data (a
    * primary and its replica) would double its weight in the merge —
    * the fallback slices are ownership-filtered for exactly that
    * reason. A store directory with no committed state contributes
    * nothing (a fresh shard that never ingested). */
  def readClusterArchivesRaw(spark: SparkSession, extraDirs: Seq[String],
      shardPointDirs: Seq[String], replicaPointDirs: Seq[String],
      copies: Int, down: Set[Int]): DataFrame = {
    val n = shardPointDirs.size
    requireClusterDirs(n, replicaPointDirs, down)
    def raw(dir: String): Option[DataFrame] =
      ArchiveStore.state(spark, dir).map(st =>
        ArchiveStore.readRaw(spark, dir, st)
          .select(col("name"), col("t"), col("vw"), col("dur")))
    val primaries = shardPointDirs.indices.filterNot(down)
      .flatMap(i => raw(shardPointDirs(i)))
    val fallbacks = shardPointDirs.indices.filter(down).map { i =>
      val r = fallbackHolder(i, n, copies, down)
      // LOUD when the holder never committed replica state: serving
      // the render with shard i's slice silently missing is the one
      // failure an operator cannot see (the all-holders-down sibling
      // above fails loudly for the same reason)
      raw(replicaPointDirs(r)).getOrElse(sys.error(
          s"shard $i is down and its replica holder $r has no " +
            s"committed replica store (${replicaPointDirs(r)})"))
        .filter(
          pmod(xxhash64(col("name")), lit(n.toLong)).cast("int") === i)
    }
    val frames = extraDirs.flatMap(raw) ++ primaries ++ fallbacks
    if (frames.isEmpty)
      spark.emptyDataFrame.select(lit("").as("name"), lit(0L).as("t"),
        lit(0.0).as("value")).limit(0)
    else frames.reduce(_.unionByName(_))
      .groupBy(col("name"), col("t"))
      .agg((sum(col("vw")) / sum(col("dur"))).as("value"))
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
      val forwarder: Forwarder,
      val copies: Int = 1,
      replicaOffer: String => Unit = _ => ()) {
    require(shardIndex >= 0 && shardIndex < shardCount,
      s"shard index $shardIndex outside 0..${shardCount - 1}")
    require(copies >= 1 && copies <= shardCount,
      s"copies $copies outside 1..$shardCount")
    val kept = new AtomicLong // points kept in local frames
    val forwardedPoints = new AtomicLong
    val replicatedPoints = new AtomicLong

    def route(b64: String): Option[String] = {
      val pts =
        try Pickle.decodeFrames(java.util.Base64.getDecoder.decode(b64))
        catch { case _: Exception => return Some(b64) } // executor drops it
      val (mine, theirs) = pts.partition(p =>
        owner(canonicalName(p.name), shardCount) == shardIndex)
      // replica copies travel as marked canonical TEXT lines, same as
      // the forwarding hop (every point protocol funnels into the one
      // receiver); a replica slot that is THIS shard feeds the local
      // replica store directly
      def replicate(canon: String, textLine: String): Unit =
        (1 until copies).map(i =>
            (owner(canon, shardCount) + i) % shardCount).foreach { r =>
          if (r == shardIndex) replicaOffer(textLine)
          else forwarder.send(r, ReplMarker + textLine)
          replicatedPoints.incrementAndGet(); ()
        }
      theirs.foreach { p =>
        val canon = canonicalName(p.name)
        val textLine = s"$canon ${p.value} ${p.tsSec}"
        forwarder.send(owner(canon, shardCount), FwdMarker + textLine)
        forwardedPoints.incrementAndGet()
        replicate(canon, textLine)
      }
      mine.foreach { p =>
        val canon = canonicalName(p.name)
        replicate(canon, s"$canon ${p.value} ${p.tsSec}")
      }
      kept.addAndGet(mine.size.toLong)
      if (mine.isEmpty) None
      else if (theirs.isEmpty) Some(b64) // untouched frame, no re-encode
      else Some(java.util.Base64.getEncoder
        .encodeToString(Pickle.encodeFrame(mine)))
    }

    def close(): Unit = forwarder.close()

    /** Resize-commit close: see [[Forwarder.closeDiscarding]]. */
    def closeDiscarding(): Unit = forwarder.closeDiscarding()
  }
}
