package graft.streaming

import org.apache.spark.sql.SparkSession

/** The AUTOMATIC membership-transition trigger — the reference's
  * memberlist watcher (`receiver/director.go:255-265`: `Transition()`
  * fired from the cluster-change channel, membership itself gossiped
  * by `cluster/cluster.go`'s memberlist). Spark ships no gossip layer,
  * so membership is a REGISTRY FILE on the shared filesystem (the
  * deploy's source of truth — the memberlist join-address analogue;
  * provisioners append a joiner's admin address, and a crashed member
  * simply stops answering) plus per-member `/admin/info` polls as the
  * liveness heartbeat. EVERY daemon runs a watcher; only the LEADER —
  * the live, non-held active member with the lowest shard index —
  * invokes the rolling coordinator, so exactly one Transition runs
  * fleet-wide (and the daemons' admin-op serialization 409s any stray
  * second coordinator that slips through a leadership race).
  *
  * Triggers, each debounced over `debounce` consecutive identical
  * observations:
  *
  *  - JOIN: every registered active answers and one or more standbys
  *    (booted `GRAFT_STANDBY=1`, gateways held) answer with indices
  *    extending the fleet to exactly 0..M-1 → grow to M
  *    ([[Reshard.rolling]], the one command, now fired by no one).
  *  - LEAVE: a previously-active member misses `deadPolls` consecutive
  *    heartbeats while every survivor answers → shrink to the survivor
  *    count, survivors re-ranked 0..M-1 (`reindex`); the departed
  *    member's series seed from its last checkpoint (readable on the
  *    shared filesystem) merged with the survivors' REPLICA
  *    checkpoints — [[Reshard.writeSeeds]]' `max_by(lastTs)` picks the
  *    freshest state per series, so with `copies > 1` the dead window
  *    loses nothing. Renders stay exact throughout via the
  *    owner-preferred replica fallback ([[Shard]]).
  *
  * At 100 TB nothing here scales with data: the watcher moves O(fleet)
  * HTTP polls per tick, and the transition it fires is the O(live
  * series) rolling resize — archive stores never move. */
final class FleetWatch(
    spark: SparkSession,
    fleetFile: java.nio.file.Path,
    selfNonce: String,
    hasStatsdDirector: () => Boolean,
    seedBase: String,
    pollMs: Long = 5000L,
    debounce: Int = 3,
    deadPolls: Int = 5,
    log: String => Unit = s => println(s"fleetwatch: $s")) {

  private[graft] final case class Info(index: Int, count: Int,
    epoch: Int, graphitePort: Int, statsdPort: Int, ckptPoints: String,
    held: Boolean, standby: Boolean, nonce: String)

  private[graft] sealed trait Plan
  private[graft] final case class Grow(actives: Seq[(String, Info)],
    joiners: Seq[(String, Info)]) extends Plan
  private[graft] final case class Shrink(survivors: Seq[(String, Info)],
    deadCkpts: Seq[String]) extends Plan

  private val failCount = collection.mutable.Map.empty[String, Int]
  private val lastKnown = collection.mutable.Map.empty[String, Info]
  private var lastPlanKey: String = ""
  private var stableFor = 0
  @volatile private var running = true

  private def info(addr: String): Option[Info] =
    try {
      val conn = new java.net.URI(s"http://$addr/admin/info").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(2000); conn.setReadTimeout(2000)
      val code = conn.getResponseCode
      val body = new String(conn.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      conn.disconnect()
      if (code != 200) None
      else EventStore.Json.parse(body.trim) match {
        case Some(m: Map[_, _]) =>
          val j = m.asInstanceOf[Map[String, Any]]
          def num(k: String): Int = j(k) match {
            case d: Double => d.toInt
            case l: Long => l.toInt
            case other => sys.error(s"$k not numeric: $other")
          }
          Some(Info(num("index"), num("count"), num("epoch"),
            num("graphitePort"), num("statsdPort"),
            j("ckptPoints").asInstanceOf[String],
            j("held") == true, j("standby") == true,
            j.get("nonce").fold("")(_.toString)))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def members(): Seq[String] =
    try {
      if (!java.nio.file.Files.exists(fleetFile)) Seq.empty
      else new String(java.nio.file.Files.readAllBytes(fleetFile),
        java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#")).toSeq.distinct
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** One observation → an actionable plan, or None. Package-private
    * pieces kept together so the spec can drive [[pollOnce]]. */
  private[graft] def pollOnce(): Option[Plan] = {
    val addrs = members()
    if (addrs.isEmpty) return None
    val polled = addrs.map(a => a -> info(a))
    polled.foreach {
      case (a, Some(i)) => failCount(a) = 0; lastKnown(a) = i
      case (a, None) => failCount(a) = failCount.getOrElse(a, 0) + 1
    }
    val live = polled.collect { case (a, Some(i)) => (a, i) }
    // a held non-standby means a transition is already in flight
    // somewhere (or an operator is mid-resize): observe, never act
    if (live.exists { case (_, i) => i.held && !i.standby }) return None
    val actives = live.filter { case (_, i) => !i.standby && !i.held }
      .sortBy(_._2.index)
    val joiners = live.filter { case (_, i) => i.standby }
      .sortBy(_._2.index)
    // dead = registered, previously seen as an ACTIVE member, silent
    // for deadPolls consecutive ticks (a dead-on-arrival entry with no
    // last-known shape is ignored — nothing to transition)
    val dead = addrs.filter(a =>
      failCount.getOrElse(a, 0) >= deadPolls &&
        lastKnown.get(a).exists(i => !i.standby))
      .map(a => (a, lastKnown(a)))
    if (actives.isEmpty) return None
    // LEADERSHIP: the live active with the lowest index acts. Self is
    // recognized by the boot nonce its own /admin/info round-trips —
    // NOT by admin port, which every member of a homogeneous
    // multi-host deploy shares (a port compare elects everyone leader
    // at once, and the losers' aborted 409s then /admin/release the
    // real coordinator's staged state mid-transition).
    if (actives.head._2.nonce != selfNonce) return None
    val n = actives.head._2.count
    val consistent = actives.forall(_._2.count == n)
    if (!consistent) return None
    if (dead.nonEmpty && joiners.isEmpty &&
        actives.size + dead.size == n &&
        (actives.map(_._2.index) ++ dead.map(_._2.index)).sorted ==
          (0 until n)) {
      Some(Shrink(actives, dead.map(_._2.ckptPoints)))
    } else if (joiners.nonEmpty && dead.isEmpty &&
        actives.size == n && actives.map(_._2.index) == (0 until n) &&
        (actives ++ joiners).map(_._2.index).sorted ==
          (0 until n + joiners.size)) {
      Some(Grow(actives, joiners))
    } else None
  }

  private def execute(plan: Plan): Unit = plan match {
    case Grow(actives, joiners) =>
      val all = (actives ++ joiners).sortBy(_._2.index)
      val m = all.size
      val epoch = all.map(_._2.epoch).max + 1
      log(s"JOIN detected: ${actives.size} -> $m members, firing " +
        s"rolling transition (epoch $epoch)")
      Reshard.rolling(spark, m, s"$seedBase/ep$epoch",
        oldAdmin = actives.map(_._1), standbyAdmin = joiners.map(_._1),
        newPeers = all.map(_._2.graphitePort),
        statsdPeers =
          if (hasStatsdDirector()) all.map(_._2.statsdPort) else Seq.empty)
    case Shrink(survivors, deadCkpts) =>
      val m = survivors.size
      val epoch = survivors.map(_._2.epoch).max + 1
      log(s"LEAVE detected: ${m + deadCkpts.size} -> $m members, " +
        s"firing rolling transition (epoch $epoch, reindexed)")
      Reshard.rolling(spark, m, s"$seedBase/ep$epoch",
        oldAdmin = survivors.map(_._1), standbyAdmin = Seq.empty,
        newPeers = survivors.map(_._2.graphitePort),
        statsdPeers = if (hasStatsdDirector())
          survivors.map(_._2.statsdPort) else Seq.empty,
        deadCkpts = deadCkpts, reindex = true)
  }

  private def planKey(p: Option[Plan]): String = p match {
    case None => ""
    case Some(Grow(a, j)) =>
      s"grow:${a.map(_._1).mkString(",")}+${j.map(_._1).mkString(",")}"
    case Some(Shrink(s, d)) =>
      s"shrink:${s.map(_._1).mkString(",")}-${d.size}"
  }

  /** Debounce state machine, one observation in → the plan to FIRE (or
    * None): a plan fires only after `debounce` CONSECUTIVE observations
    * with the identical plan key — any flip (plan change, or a no-plan
    * tick, e.g. a presumed-dead member answering again mid-shrink)
    * resets the streak. Extracted from the poll thread so the spec can
    * pin the boundary (stableFor == debounce) and the reset cases
    * without timing. */
  private[graft] def step(plan: Option[Plan]): Option[Plan] = {
    val key = planKey(plan)
    if (key.nonEmpty && key == lastPlanKey) stableFor += 1
    else stableFor = if (key.nonEmpty) 1 else 0
    lastPlanKey = key
    if (stableFor >= debounce) { stableFor = 0; lastPlanKey = ""; plan }
    else None
  }

  private val thread = new Thread(() => {
    while (running) {
      try {
        step(pollOnce()).foreach { p =>
          try execute(p)
          catch {
            case scala.util.control.NonFatal(e) =>
              log(s"transition failed: $e")
          }
          failCount.clear() // re-observe the post-transition fleet
        }
      } catch {
        case scala.util.control.NonFatal(e) => log(s"poll failed: $e")
      }
      Thread.sleep(pollMs)
    }
  }, "fleet-watch")
  thread.setDaemon(true)

  def start(): Unit = thread.start()
  def close(): Unit = running = false
}
