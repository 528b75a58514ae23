package graft

import org.scalatest.funsuite.AnyFunSuite
import com.sun.net.httpserver.HttpServer
import java.net.InetSocketAddress
import graft.streaming.FleetWatch

/** Unit pins for the automatic membership-transition DECISION logic
  * ([[graft.streaming.FleetWatch]]) — the end-to-end grow/shrink paths
  * are proven by ClusterSmoke's `auto transition` case; this spec
  * drives `pollOnce`/`step` directly against scriptable fake
  * `/admin/info` endpoints so the election, dead-detection, debounce,
  * and registry-corruption edges are pinned without real daemons:
  *
  *  - leadership is decided by the NONCE the leader's own info
  *    round-trips, never by admin port (the advisor's multi-host
  *    same-port fleet would have elected everyone);
  *  - a torn/garbage registry line can never throw or trigger;
  *  - the debounce fires exactly at `debounce` consecutive identical
  *    plans and any flip (including a presumed-dead member answering
  *    again mid-shrink) resets the streak;
  *  - heartbeat flapping below `deadPolls` consecutive misses never
  *    produces a shrink plan. */
class FleetWatchSpec extends AnyFunSuite {

  /** Scriptable fake daemon: one /admin/info endpoint whose fields the
    * test mutates; `silent=true` answers 404 (the watcher treats any
    * non-200 as a missed heartbeat). */
  private final class Member(@volatile var index: Int,
      @volatile var count: Int,
      @volatile var standby: Boolean = false,
      @volatile var held: Boolean = false) {
    val nonce: String = java.util.UUID.randomUUID().toString
    @volatile var silent = false
    private val srv =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/admin/info", ex => {
      if (silent) { ex.sendResponseHeaders(404, -1); ex.close() }
      else {
        val body =
          s"""{"index":$index,"count":$count,"copies":1,"epoch":0,""" +
            s""""nonce":"$nonce","dataDir":"/tmp/x",""" +
            s""""ckptPoints":"/tmp/x/ckpt-$index",""" +
            s""""graphitePort":${10000 + index},""" +
            s""""statsdPort":${11000 + index},""" +
            s""""awaitingOpen":false,"held":$held,"standby":$standby}"""
        val b = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      }
    })
    srv.start()
    def addr: String = s"127.0.0.1:${srv.getAddress.getPort}"
    def stop(): Unit = srv.stop(0)
  }

  private def registry(lines: Seq[String]): java.nio.file.Path = {
    val f = java.nio.file.Files.createTempFile("fleet", ".txt")
    java.nio.file.Files.writeString(f, lines.mkString("\n") + "\n")
    f.toFile.deleteOnExit()
    f
  }

  /** Watcher under test: thread never started, execute never reached —
    * pollOnce/step only. The SparkSession is only consumed by
    * execute(), so null is safe here. */
  private def watcher(file: java.nio.file.Path, nonce: String,
      debounce: Int = 3, deadPolls: Int = 3): FleetWatch =
    new FleetWatch(null, file, nonce, () => false, "/tmp/fwspec-seeds",
      debounce = debounce, deadPolls = deadPolls, log = _ => ())

  test("leader is the lowest-index active, identified by nonce") {
    val m0 = new Member(0, 2); val m1 = new Member(1, 2)
    val s2 = new Member(2, 2, standby = true)
    try {
      val reg = registry(Seq(m0.addr, m1.addr, s2.addr))
      // the lowest-index active's own watcher plans the grow
      watcher(reg, m0.nonce).pollOnce() match {
        case Some(g: FleetWatch#Grow @unchecked) =>
          assert(g.joiners.map(_._1) === Seq(s2.addr))
        case other => fail(s"expected Grow, got $other")
      }
      // a higher-index member's watcher stands down
      assert(watcher(reg, m1.nonce).pollOnce().isEmpty)
      // the advisor's multi-host race: a watcher whose nonce matches NO
      // registry member (the port-compare false-leader) must stand down
      assert(watcher(reg, "not-a-member-nonce").pollOnce().isEmpty)
    } finally { m0.stop(); m1.stop(); s2.stop() }
  }

  test("torn or garbage registry lines never throw or trigger") {
    val m0 = new Member(0, 2); val m1 = new Member(1, 2)
    try {
      // comment, blank, unparsable address, and a torn (truncated) line
      val reg = registry(Seq("# provisioner header", "", m0.addr,
        "not-an-address", m1.addr, "127.0.0.1:"))
      val w = watcher(reg, m0.nonce, deadPolls = 2)
      // garbage addrs fail their heartbeats but were never ACTIVE
      // members (no last-known shape) — they can never become "dead"
      // and force a shrink; a steady 2-fleet plans nothing
      (1 to 4).foreach(_ => assert(w.pollOnce().isEmpty))
      // an unreadable registry is an empty fleet: observe, never act
      java.nio.file.Files.delete(reg)
      assert(w.pollOnce().isEmpty)
    } finally { m0.stop(); m1.stop() }
  }

  test("debounce fires exactly at the boundary and any flip resets") {
    val m0 = new Member(0, 2); val m1 = new Member(1, 2)
    val s2 = new Member(2, 2, standby = true)
    try {
      val reg = registry(Seq(m0.addr, m1.addr, s2.addr))
      val w = watcher(reg, m0.nonce, debounce = 3)
      val plan = w.pollOnce()
      assert(plan.nonEmpty)
      // two consecutive identical observations: below the boundary
      assert(w.step(plan).isEmpty)
      assert(w.step(plan).isEmpty)
      // third consecutive: fires, and the streak resets
      assert(w.step(plan).nonEmpty)
      assert(w.step(plan).isEmpty)
      // a no-plan tick mid-streak resets the count
      assert(w.step(plan).isEmpty) // 2
      assert(w.step(None).isEmpty) // reset
      assert(w.step(plan).isEmpty) // 1
      assert(w.step(plan).isEmpty) // 2
      assert(w.step(plan).nonEmpty) // 3: fires
    } finally { m0.stop(); m1.stop(); s2.stop() }
  }

  test("a dead member returning mid-shrink resets the debounce") {
    val m0 = new Member(0, 3); val m1 = new Member(1, 3)
    val m2 = new Member(2, 3)
    try {
      val reg = registry(Seq(m0.addr, m1.addr, m2.addr))
      val w = watcher(reg, m0.nonce, debounce = 3, deadPolls = 2)
      assert(w.pollOnce().isEmpty) // all alive: lastKnown learned
      m2.silent = true
      assert(w.step(w.pollOnce()).isEmpty) // miss 1 < deadPolls
      // miss 2 == deadPolls: shrink plan appears, debounce streak 1
      val p2 = w.pollOnce()
      assert(p2.exists(_.isInstanceOf[FleetWatch#Shrink]))
      assert(w.step(p2).isEmpty)
      // the member answers again: plan vanishes AND the streak resets
      m2.silent = false
      assert(w.step(w.pollOnce()).isEmpty)
      m2.silent = true
      // the shrink must re-earn deadPolls misses and a full debounce
      assert(w.step(w.pollOnce()).isEmpty) // miss 1
      assert(w.step(w.pollOnce()).isEmpty) // miss 2: plan, streak 1
      assert(w.step(w.pollOnce()).isEmpty) // streak 2
      val fired: Option[FleetWatch#Plan] =
        w.step(w.pollOnce()) // streak 3: fires
      assert(fired.exists(_.isInstanceOf[FleetWatch#Shrink]))
      fired match {
        case Some(s: FleetWatch#Shrink @unchecked) =>
          assert(s.survivors.map(_._1) === Seq(m0.addr, m1.addr))
          assert(s.deadCkpts === Seq("/tmp/x/ckpt-2"))
        case other => fail(s"expected Shrink, got $other")
      }
    } finally { m0.stop(); m1.stop(); m2.stop() }
  }

  test("heartbeat flapping below deadPolls never plans a shrink") {
    val m0 = new Member(0, 2); val m1 = new Member(1, 2)
    try {
      val reg = registry(Seq(m0.addr, m1.addr))
      val w = watcher(reg, m0.nonce, deadPolls = 3)
      assert(w.pollOnce().isEmpty) // learn shapes
      (1 to 6).foreach { i =>
        m1.silent = i % 2 == 1 // alternate miss/answer: streak ≤ 1
        assert(w.pollOnce().isEmpty)
      }
    } finally { m0.stop(); m1.stop() }
  }

  test("a held active or inconsistent counts block any plan") {
    val m0 = new Member(0, 2); val m1 = new Member(1, 2)
    val s2 = new Member(2, 2, standby = true)
    try {
      val reg = registry(Seq(m0.addr, m1.addr, s2.addr))
      val w = watcher(reg, m0.nonce)
      assert(w.pollOnce().nonEmpty) // baseline: grow is plannable
      m1.held = true // a mid-transition member: observe, never act
      assert(w.pollOnce().isEmpty)
      m1.held = false
      m1.count = 3 // count disagreement: a transition just landed
      assert(w.pollOnce().isEmpty)
    } finally { m0.stop(); m1.stop(); s2.stop() }
  }
}
