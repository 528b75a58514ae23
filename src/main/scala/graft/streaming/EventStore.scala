package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}
import scala.collection.mutable.ArrayBuffer

/** Graphite-web events store (extension — the reference serves
  * `/events/get_data` as a permanent `[]`, "Annotations not
  * implemented", `http/graphite.go:188-195`; graphite-web backs the
  * same API with a Django `Event` table). Events are OPERATIONAL
  * annotations — deploy markers, incident notes — not a data plane:
  * volume is human-scale (10³–10⁵ per fleet), so the store is an
  * in-memory vector with an append-only jsonl journal for restart
  * durability, the same shape as graphite's events table. Thread-safe;
  * `version` is a monotone change counter the daemon's render cache
  * folds into its invalidation vector (an `events()` render must not
  * serve stale after a new event lands).
  *
  * Tag-query semantics per graphite-web `Event.find_events`: an event
  * matches when EVERY requested tag is among its tags (subset match);
  * no tags requested matches everything in the window.
  */
final class EventStore(journal: Option[Path],
    maxEvents: Int = EventStore.DefaultMax) {
  import EventStore.Ev
  require(maxEvents > 0, s"maxEvents must be positive: $maxEvents")

  private val evs = new ArrayBuffer[Ev]()
  @volatile private var ver = 0L
  // monotone id source — ids never reuse after an eviction
  private var nextId = 0L
  // journal lines written since last compaction (drives the 2×-cap
  // compaction trigger) and total evictions (a /stats gauge)
  private var journalLines = 0L
  @volatile private var droppedCt = 0L

  // restart durability: replay the journal (ids re-assigned densely,
  // like any table reload — ids are response-local handles), then
  // trim to the cap and compact so boot replay is itself bounded
  journal.filter(Files.exists(_)).foreach { p =>
    Files.readAllLines(p, StandardCharsets.UTF_8).forEach { line =>
      if (line.nonEmpty) EventStore.parseEventBody(line).foreach {
        case (when, what, tags, data) =>
          nextId += 1
          evs += Ev(nextId, when.getOrElse(0L), what, tags, data)
      }
    }
    journalLines = evs.length.toLong
    if (evs.length > maxEvents) {
      droppedCt += (evs.length - maxEvents).toLong
      evs.remove(0, evs.length - maxEvents)
      compact(p)
    }
    ver = evs.length.toLong
  }

  def version: Long = ver
  def count: Int = synchronized { evs.length }
  def dropped: Long = droppedCt

  /** Append one event; journals before publishing so a crash between
    * the two loses the event but never forgets a served one. Journal
    * IO failures propagate to the caller (the HTTP handler answers
    * 5xx) without publishing. Beyond `maxEvents` the OLDEST event is
    * evicted (annotations are a time-ordered ring — the recent window
    * is the useful one), and the journal is compacted once it holds
    * 2× the cap, so neither driver heap nor boot-replay time grows
    * without bound under a misbehaving poster. */
  def add(when: Long, what: String, tags: Seq[String],
      data: String): Ev = synchronized {
    nextId += 1
    val ev = Ev(nextId, when, what, tags, data)
    journal.foreach { p =>
      Files.createDirectories(p.getParent)
      Files.write(p, (ev.toJson + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      journalLines += 1
    }
    evs += ev
    if (evs.length > maxEvents) {
      droppedCt += (evs.length - maxEvents).toLong
      evs.remove(0, evs.length - maxEvents)
    }
    // amortized O(1): a full rewrite every maxEvents appends
    if (journalLines > 2L * maxEvents) journal.foreach(compact)
    ver += 1
    ev
  }

  /** Rewrite the journal to exactly the live (capped) set, atomically
    * (temp file + move), so a crash mid-compaction keeps the old
    * journal. Caller holds the lock (or is the single-threaded
    * constructor). */
  private def compact(p: Path): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    val body = evs.iterator.map(_.toJson + "\n").mkString
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    try
      Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    journalLines = evs.length.toLong
  }

  /** Window + subset-tag query, when-then-id ordered. */
  def query(fromSec: Long, untilSec: Long, tags: Seq[String]): Seq[Ev] =
    synchronized {
      evs.filter(e => e.when >= fromSec && e.when <= untilSec &&
          tags.forall(e.tags.contains))
        .sortBy(e => (e.when, e.id)).toSeq
    }

  /** Everything, for the DSL frame build (bounded: annotations). */
  def all(): Seq[Ev] = synchronized { evs.toSeq }
}

object EventStore {

  /** Default ring cap: annotations are human-scale (graphite deploys
    * + incidents — thousands per fleet); 20k bounds driver heap at a
    * few MB and boot replay at tens of ms while holding months of
    * real traffic. Override per-daemon via `GRAFT_EVENTS_MAX`. */
  val DefaultMax: Int = 20000

  /** Largest accepted POST /events body: annotations are human-scale
    * prose — 64 KiB is generous; beyond it the daemon answers 413
    * rather than ballooning heap + journal on one request. */
  val MaxBodyBytes: Int = 64 * 1024

  final case class Ev(id: Long, when: Long, what: String,
      tags: Seq[String], data: String) {
    def toJson: String = {
      s"""{"id":$id,"when":$when,"what":"${esc(what)}","tags":[""" +
        tags.map(t => "\"" + esc(t) + "\"").mkString(",") +
        s"""],"data":"${esc(data)}"}"""
    }
  }

  private[streaming] def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Parse a graphite-web event POST body:
    * `{"what": "...", "tags": ["a","b"] | "a b", "when": epoch,
    *   "data": "..."}` — `what` required, `when` defaults to the
    * caller's clock (None here), `tags` accepts graphite's both
    * spellings (list, or the pre-1.1 space-separated string).
    * Returns None on malformed JSON or a missing `what`. */
  def parseEventBody(body: String)
      : Option[(Option[Long], String, Seq[String], String)] =
    Json.parse(body).collect { case obj: Map[_, _] =>
      val m = obj.asInstanceOf[Map[String, Any]]
      m.get("what").collect { case s: String => s }.map { what =>
        val when = m.get("when").collect {
          case d: Double => d.toLong
          case l: Long => l
        }
        val tags = m.get("tags") match {
          case Some(l: List[_]) => l.collect { case s: String => s }
          case Some(s: String) => s.split("\\s+").filter(_.nonEmpty).toSeq
          case _ => Seq.empty[String]
        }
        val data = m.get("data").collect { case s: String => s }.getOrElse("")
        (when, what, tags, data)
      }
    }.flatten

  /** Minimal recursive-descent JSON reader for the event bodies —
    * objects → Map[String, Any], arrays → List[Any], strings →
    * String (escape-aware incl. \uXXXX), numbers → Double (integral
    * values exact to 2⁵³ — epochs fit), true/false/null. No JVM JSON
    * dependency exists in this build, and the daemon needs exactly
    * this one shape; not a general-purpose parser (no streaming, no
    * surrogate-pair re-pairing). */
  private[streaming] object Json {
    def parse(s: String): Option[Any] =
      try {
        val p = new P(s)
        p.ws()
        val v = p.value()
        p.ws()
        if (p.done) Some(v) else None
      } catch { case _: Exception => None }

    private final class P(s: String) {
      private var i = 0
      def done: Boolean = i >= s.length
      def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
      private def ch: Char = s.charAt(i)
      private def expect(c: Char): Unit = {
        require(!done && ch == c, s"expected '$c' at $i"); i += 1
      }
      def value(): Any = { ws(); ch match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", java.lang.Boolean.TRUE)
        case 'f' => lit("false", java.lang.Boolean.FALSE)
        case 'n' => lit("null", null)
        case _ => num()
      }}
      private def lit(word: String, v: Any): Any = {
        require(s.startsWith(word, i), s"bad literal at $i"); i += word.length; v
      }
      private def obj(): Map[String, Any] = {
        expect('{'); ws()
        val b = Map.newBuilder[String, Any]
        if (!done && ch == '}') { i += 1; return b.result() }
        var more = true
        while (more) {
          ws(); val k = str(); ws(); expect(':'); val v = value(); ws()
          b += k -> v
          if (!done && ch == ',') i += 1 else { expect('}'); more = false }
        }
        b.result()
      }
      private def arr(): List[Any] = {
        expect('['); ws()
        val b = List.newBuilder[Any]
        if (!done && ch == ']') { i += 1; return b.result() }
        var more = true
        while (more) {
          b += value(); ws()
          if (!done && ch == ',') i += 1 else { expect(']'); more = false }
        }
        b.result()
      }
      private def str(): String = {
        expect('"')
        val sb = new StringBuilder
        while ({ require(!done, "unterminated string"); ch != '"' }) {
          if (ch == '\\') {
            i += 1; require(!done, "bad escape")
            ch match {
              case '"' => sb += '"'; case '\\' => sb += '\\'
              case '/' => sb += '/'; case 'b' => sb += '\b'
              case 'f' => sb += '\f'; case 'n' => sb += '\n'
              case 'r' => sb += '\r'; case 't' => sb += '\t'
              case 'u' =>
                require(i + 4 < s.length, "bad \\u")
                sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
                i += 4
              case c => throw new IllegalArgumentException(s"bad escape \\$c")
            }
            i += 1
          } else { sb += ch; i += 1 }
        }
        i += 1
        sb.toString
      }
      private def num(): Double = {
        val start = i
        if (!done && (ch == '-' || ch == '+')) i += 1
        while (!done && (ch.isDigit || ch == '.' || ch == 'e' || ch == 'E' ||
          ch == '-' || ch == '+')) i += 1
        require(i > start, s"expected a number at $start")
        s.substring(start, i).toDouble
      }
    }
  }
}
