package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Conf, Daemon}
import graft.rrd.DsFinder

/** The tgres.conf loader (`daemon/config.go:40-135,277-306`): TOML
  * subset, RRA string grammar, processDSSpec validation, and the
  * first-match-wins DS rules. */
class ConfSpec extends AnyFunSuite {

  test("sample config parses to the reference's settings") {
    val c = Conf.load("etc/graft.conf.sample")
    assert(c.httpPort === Some(8080))
    assert(c.graphitePort === Some(2003))
    assert(c.picklePort === Some(2004))
    assert(c.statsdPort === Some(8125))
    assert(c.statFlushSec === 10L)
    assert(c.statsNamePrefix === "stats")
    assert(c.minStepSec === 10L)
    val spec = c.specFor("any.name.at.all")
    assert(spec.stepSec === 10L && spec.heartbeatSec === 7200L)
    assert(spec.rras === Seq(
      DsFinder.ArchiveSpec("wmean", 10L, 6L * 3600),
      DsFinder.ArchiveSpec("wmean", 60L, 24L * 3600),
      DsFinder.ArchiveSpec("wmean", 600L, 93L * 86400),
      DsFinder.ArchiveSpec("wmean", 86400L, 1825L * 86400, 1.0)))
    // store settings: base retention from the base-step RRA, the
    // coarser three as the live chain
    val (st, hb, retain, chain) = Conf.storeSettings(c)
    assert(st === 10L && hb === 7200L && retain === Some(6L * 3600))
    assert(chain === Seq(Daemon.Rra(60L, 86400L),
      Daemon.Rra(600L, 93L * 86400), Daemon.Rra(86400L, 1825L * 86400)))
  }

  test("RRA grammar: digit-led defaults to wmean, cf is case-insensitive") {
    assert(Conf.parseRra("10s:6h") ===
      DsFinder.ArchiveSpec("wmean", 10L, 21600L))
    assert(Conf.parseRra("MAX:1min:24h") ===
      DsFinder.ArchiveSpec("max", 60L, 86400L))
    assert(Conf.parseRra("Last:10s:1h:0.25") ===
      DsFinder.ArchiveSpec("last", 10L, 3600L, 0.25))
    intercept[IllegalArgumentException](Conf.parseRra("median:10s:1h"))
    intercept[IllegalArgumentException](Conf.parseRra("10s"))
  }

  test("RRA span auto-adjusts down to a multiple of step") {
    // 25s span over 10s step → 20s (daemon/config.go:119-126)
    assert(Conf.parseRra("10s:25s").spanSec === 20L)
    intercept[IllegalArgumentException](Conf.parseRra("10s:5s")) // → 0
  }

  test("DS rules: first matching regexp wins; RRA step must honor min-step") {
    val c = Conf.parse(
      """min-step = "10s"
        |[[ds]]
        |regexp = "^web\\."
        |step = "10s"
        |heartbeat = "1h"
        |rras = ["10s:1h"]
        |[[ds]]
        |regexp = ".*"
        |step = "1min"
        |heartbeat = "2h"
        |rras = ["1min:1d"]
        |""".stripMargin)
    assert(c.specFor("web.cpu").stepSec === 10L)
    assert(c.specFor("db.cpu").stepSec === 60L)
    intercept[IllegalArgumentException](Conf.parse(
      """min-step = "10s"
        |[[ds]]
        |regexp = ".*"
        |step = "15s"
        |heartbeat = "1h"
        |rras = ["15s:1h"]
        |""".stripMargin))
  }

  test("RRA step not a multiple of DS step auto-adjusts down") {
    val c = Conf.parse(
      """[[ds]]
        |regexp = ".*"
        |step = "10s"
        |heartbeat = "1h"
        |rras = ["25s:1h"]
        |""".stripMargin)
    // 25s → 20s (daemon/config.go:284-291)
    assert(c.specFor("x").rras.head.stepSec === 20L)
  }

  test("comments and unknown keys/tables are tolerated") {
    val c = Conf.parse(
      """workers = 4  # comment after a value
        |pid-file = "tgres.pid"
        |# whole-line comment
        |stats-name-prefix = "st#ats"
        |[unknown-table]
        |some = "key"
        |""".stripMargin)
    assert(c.string("pid-file", "") === "tgres.pid")
    // '#' inside quotes is content, not a comment
    assert(c.statsNamePrefix === "st#ats")
    assert(c.scalars.get("some").isEmpty)
  }

  test("max-receiver-queue-size: absent → unbounded (0), set → its bound") {
    assert(Conf.parse("workers = 1\n").maxReceiverQueueSize === 0)
    assert(Conf.parse("max-receiver-queue-size = 1000000\n")
      .maxReceiverQueueSize === 1000000)
  }

  test("max-memory-bytes and pid-file parse with reference defaults") {
    val c = Conf.parse("workers = 1\n")
    assert(c.maxMemoryBytes === 0L && c.pidFile === None)
    val c2 = Conf.parse(
      "max-memory-bytes = 8000000000\npid-file = \"graft.pid\"\n")
    assert(c2.maxMemoryBytes === 8000000000L)
    assert(c2.pidFile === Some("graft.pid"))
  }

  test("http-allow-origin: absent/empty → no CORS header, set → its value") {
    assert(Conf.parse("workers = 1\n").httpAllowOrigin === None)
    assert(Conf.parse("http-allow-origin = \"\"\n").httpAllowOrigin === None)
    assert(Conf.parse("http-allow-origin = \"*\"\n")
      .httpAllowOrigin === Some("*"))
  }
}
