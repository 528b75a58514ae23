package graft.streaming

import scala.io.Source
import scala.util.Try

import graft.rrd.DsFinder
import graft.ts.Durations

/** `tgres.conf` loader — the reference's TOML config surface
  * (`daemon/config.go:40-56` Config struct, `etc/tgres.conf.sample`)
  * reduced to the subset this daemon consumes: listen specs,
  * `stat-flush-interval`, `stats-name-prefix`, `min-step`, and the
  * `[[ds]]` series-creation rules (regexp, step, heartbeat, rras) with
  * the reference's RRA string grammar `[cf:]step:span[:xff]`
  * (`daemon/config.go:86-135`).
  *
  * The parser is a deliberate TOML SUBSET — exactly the shape the
  * sample config uses (top-level `key = value` scalars, `#` comments,
  * `[[ds]]` array-of-tables whose values are strings, durations, or
  * string arrays) — so the daemon stays dependency-free. Validation
  * mirrors `processDSSpec` (`daemon/config.go:277-296`): every RRA step
  * must be a multiple of `min-step`, and an RRA step that is not a
  * multiple of its DS step auto-adjusts DOWN to one (error at zero).
  */
object Conf {

  /** One `[[ds]]` rule: first-matching-regexp wins
    * (`daemon/config.go:298-306` FindMatchingDSSpec). */
  final case class DsRule(regexp: String, spec: DsFinder.DsSpec)

  final case class Settings(scalars: Map[String, String], dss: Seq[DsRule]) {
    def string(key: String, default: String): String =
      scalars.getOrElse(key, default)
    def durationSec(key: String, default: Long): Long =
      scalars.get(key).map(Durations.parseSeconds).getOrElse(default)
    /** Port of a `host:port` listen spec; absent/commented key → None. */
    def port(key: String): Option[Int] =
      scalars.get(key).map(s => s.substring(s.lastIndexOf(':') + 1).toInt)

    def httpPort: Option[Int] = port("http-listen-spec")
    def graphitePort: Option[Int] = port("graphite-text-listen-spec")
      .orElse(port("graphite-line-listen-spec"))
      .orElse(port("graphite-udp-listen-spec"))
    def picklePort: Option[Int] = port("graphite-pickle-listen-spec")
    def statsdPort: Option[Int] = port("statsd-text-listen-spec")
      .orElse(port("statsd-udp-listen-spec"))
    def statFlushSec: Long = durationSec("stat-flush-interval", 10L)
    /** `max-receiver-queue-size` (`etc/tgres.conf.sample:7`,
      * `receiver/receiver.go:121-135`): uncommitted ingest lines a
      * feed may buffer before newly arriving ones drop (counted, see
      * the `/stats` route). 0/absent = unbounded, the reference's own
      * default. */
    def maxReceiverQueueSize: Int =
      scalars.get("max-receiver-queue-size").map(_.trim.toInt).getOrElse(0)
    /** `max-memory-bytes` (`etc/tgres.conf.sample:9`,
      * `receiver/director.go:287-291`): the memory half of the drop
      * bound — ingest lines drop while used heap exceeds it.
      * 0/absent = unbounded. */
    def maxMemoryBytes: Long =
      scalars.get("max-memory-bytes").map(_.trim.toLong).getOrElse(0L)
    /** `pid-file` (`daemon/config.go:36`, written at boot by
      * `daemon/daemon.go` savePid): absent → no pid file. */
    def pidFile: Option[String] =
      scalars.get("pid-file").filter(_.nonEmpty)
    /** `query-cache-size` (`etc/tgres.conf.sample:36`,
      * `daemon/config.go:51`): render result LRU capacity; absent/0
      * disables, the reference's own default ("Default is 0 == cache
      * disabled", sample:35; `daemon/daemon.go:284` gates on > 0). */
    def queryCacheSize: Int =
      scalars.get("query-cache-size").map(_.trim.toInt).getOrElse(0)
    def statsNamePrefix: String = string("stats-name-prefix", "stats")
    def minStepSec: Long = durationSec("min-step", 1L)
    /** `http-allow-origin` (`daemon/config.go:50`): CORS header value
      * for the Grafana-facing routes; absent/empty → no header. */
    def httpAllowOrigin: Option[String] =
      scalars.get("http-allow-origin").filter(_.nonEmpty)

    /** Rules in [[DsFinder]]'s shape (first match wins). */
    def dsRules: Seq[(String, DsFinder.DsSpec)] =
      dss.map(r => (r.regexp, r.spec))
    /** The spec a given series name would be created with. */
    def specFor(name: String): DsFinder.DsSpec =
      DsFinder.findSpec(dsRules, name)
  }

  /** `[cf:]step:span[:xff]` (`daemon/config.go:86-135`): cf defaults to
    * WMEAN when the first field is digit-led, cf names are
    * case-insensitive, durations use the graphite suffixes
    * (`misc.BetterParseDuration`), a span that is not a multiple of the
    * step auto-adjusts DOWN, and xff defaults to 0.5. */
  def parseRra(s: String): DsFinder.ArchiveSpec = {
    val parts0 = s.split(":", 4).toSeq
    require(parts0.length >= 2,
      s"invalid RRA spec (not enough elements): '$s'")
    val parts =
      if (parts0.head.nonEmpty && parts0.head.charAt(0).isDigit)
        "wmean" +: parts0
      else parts0
    val cf = parts.head.toLowerCase
    require(Set("wmean", "min", "max", "last")(cf),
      s"invalid consolidation: '${parts.head}' (valid: wmean, min, max, last)")
    require(parts.length >= 3, s"invalid RRA spec (missing span): '$s'")
    val step = Durations.parseSeconds(parts(1))
    require(step > 0, s"invalid RRA step: '${parts(1)}'")
    val span0 = Durations.parseSeconds(parts(2))
    val span = span0 / step * step
    require(span > 0, s"invalid RRA span: '${parts(2)}'")
    val xff = if (parts.length >= 4) parts(3).toDouble else 0.5
    DsFinder.ArchiveSpec(cf, step, span, xff)
  }

  def load(path: String): Settings = {
    val src = Source.fromFile(path, "UTF-8")
    try parse(src.mkString) finally src.close()
  }

  def parse(text: String): Settings = {
    // strip a trailing comment, respecting double-quoted strings
    def stripComment(line: String): String = {
      var inQ = false
      val i = line.indexWhere {
        case '"' => inQ = !inQ; false
        case '#' => !inQ
        case _ => false
      }
      if (i < 0) line else line.substring(0, i)
    }
    // TOML basic-string escapes (the subset the sample shape can carry:
    // \\ \" \n \r \t) — a config regexp like "^web\\." must reach the
    // matcher as ^web\.
    def unescape(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '\\' => sb.append('\\')
            case '"' => sb.append('"')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case o => sb.append('\\').append(o)
          }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    def unquote(v: String): String =
      if (v.length >= 2 && v.head == '"' && v.last == '"')
        unescape(v.substring(1, v.length - 1))
      else v
    def stringArray(v: String): Seq[String] = {
      require(v.head == '[' && v.last == ']', s"expected array, got: '$v'")
      v.substring(1, v.length - 1).split(",").toSeq
        .map(_.trim).filter(_.nonEmpty).map(unquote)
    }

    val scalars = scala.collection.mutable.Map.empty[String, String]
    // section state: 0 = top level, 1 = inside [[ds]], 2 = inside an
    // unrecognized table (keys ignored until the next header)
    var section = 0
    val dsAcc = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.Map[String, String]]

    text.linesIterator.map(stripComment).map(_.trim).filter(_.nonEmpty)
      .foreach { line =>
        if (line == "[[ds]]") { section = 1; dsAcc += scala.collection.mutable.Map.empty }
        else if (line.startsWith("[")) section = 2
        else line.split("=", 2) match {
          case Array(k, v) =>
            val key = k.trim
            val value = v.trim
            if (section == 1) dsAcc.last += (key -> value)
            else if (section == 0) { scalars += (key -> unquote(value)); () }
          case _ => () // not a key=value line; tolerate
        }
      }

    val minStep = scalars.get("min-step").map(Durations.parseSeconds)
    val dss = dsAcc.toSeq.map { m =>
      val regexp = unquote(m.getOrElse("regexp",
        throw new IllegalArgumentException("[[ds]] missing regexp")))
      val step = Durations.parseSeconds(unquote(m.getOrElse("step",
        throw new IllegalArgumentException(s"[[ds]] '$regexp' missing step"))))
      val hb = Durations.parseSeconds(unquote(m.getOrElse("heartbeat",
        throw new IllegalArgumentException(s"[[ds]] '$regexp' missing heartbeat"))))
      val rras = stringArray(m.getOrElse("rras", "[]")).map(parseRra).map { r =>
        // processDSSpec (daemon/config.go:277-296): rra step must be a
        // multiple of min-step; non-multiple-of-DS-step auto-adjusts DOWN
        minStep.foreach(ms => require(r.stepSec % ms == 0,
          s"DS '$regexp': RRA step ${r.stepSec}s not a multiple of min-step ${ms}s"))
        if (r.stepSec % step == 0) r
        else {
          val adj = r.stepSec / step * step
          require(adj > 0, s"DS '$regexp': invalid RRA step ${r.stepSec}s")
          r.copy(stepSec = adj)
        }
      }
      DsRule(regexp, DsFinder.DsSpec(step, hb, rras))
    }
    Settings(scalars.toMap, dss)
  }

  /** Daemon store settings derived from the FIRST rule matching `name`
    * (the store is uniform per daemon, like [[Daemon.DefaultRras]]):
    * base step/heartbeat from the DS spec, base retention = the span of
    * the RRA at the base step (if any), the coarser RRAs as the live
    * chain. */
  def storeSettings(conf: Settings, name: String = "")
      : (Long, Long, Option[Long], Seq[Daemon.Rra]) = {
    val spec = Try(conf.specFor(name)).getOrElse(DsFinder.Default)
    val retain = spec.rras.find(_.stepSec == spec.stepSec).map(_.spanSec)
    val chain = spec.rras.filter(_.stepSec != spec.stepSec)
      .map(r => Daemon.Rra(r.stepSec, r.spanSec))
    (spec.stepSec, spec.heartbeatSec, retain, chain)
  }
}
