package graft.streaming

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Graphite pickle ingest protocol (`daemon/graphite_pickle.go:125-210`):
  * a TCP stream of frames, each a 4-byte big-endian length followed by a
  * Python pickle of `[(name, (ts, value)), ...]`. The reference decodes
  * with the stalecucumber library and queues one data point per tuple,
  * accepting int-typed timestamps and int- or float-typed values
  * (`graphite_pickle.go:172-195`).
  *
  * This is a self-contained unpickler for the subset every Graphite
  * carbon client actually emits — pickle protocols 0-2 scalar/list/tuple
  * opcodes plus the memo. No Python interop: the opcode grammar is from
  * the public pickle protocol documentation (CPython `pickletools`), and
  * [[PickleSpec]] pins conformance against hand-assembled byte vectors.
  *
  * Spark-side shape: [[Pickle.decodeFrames]] is pure bytes→rows, used via
  * `flatMap` over a binary-payload Dataset (socket/Kafka `readStream`
  * value column or a batch frame) — the same batch/stream duality as the
  * text parsers in [[Ingest]]. Binary wire decoding is genuine
  * per-record imperative work, the one place `mapPartitions`-style code
  * is the right tool rather than a column expression.
  */
object Pickle {

  /** One decoded data point. */
  final case class Point(name: String, tsSec: Long, value: Double)

  // ---- unpickler ----

  private object Mark // sentinel pushed by MARK

  /** Decode one pickle blob to its root object. Throws on anything
    * outside the supported grammar (caller treats the frame as
    * malformed, mirroring the reference's abort-on-error). */
  def unpickle(buf: Array[Byte], off: Int, len: Int): Any = {
    val bb = ByteBuffer.wrap(buf, off, len).order(ByteOrder.BIG_ENDIAN)
    val stack = mutable.ArrayBuffer.empty[Any]
    val memo = mutable.LongMap.empty[Any]

    def pop(): Any = stack.remove(stack.length - 1)
    def popToMark(): List[Any] = {
      val items = mutable.ListBuffer.empty[Any]
      var top = pop()
      while (top != Mark) { items.prepend(top); top = pop() }
      items.toList
    }
    def readLine(): String = {
      val sb = new StringBuilder
      var c = bb.get()
      while (c != '\n') { sb.append(c.toChar); c = bb.get() }
      sb.toString
    }
    def readBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n); bb.get(a); a
    }
    def u8(): Int = bb.get() & 0xff
    def u16le(): Int = { val a = u8(); val b = u8(); a | (b << 8) }
    def i32le(): Int = {
      val a = u8(); val b = u8(); val c = u8(); val d = u8()
      a | (b << 8) | (c << 16) | (d << 24)
    }

    while (true) {
      (bb.get() & 0xff) match {
        case 0x80 => u8() // PROTO n
        case 0x2e => // STOP '.'
          return pop()
        case 0x28 => stack += Mark // MARK '('
        case 0x4e => stack += null // NONE 'N'
        // -- integers --
        case 0x4a => stack += i32le().toLong // BININT 'J'
        case 0x4b => stack += u8().toLong // BININT1 'K'
        case 0x4d => stack += u16le().toLong // BININT2 'M'
        case 0x49 => // INT 'I' (text; also encodes proto-0 bools)
          readLine() match {
            case "00" => stack += false
            case "01" => stack += true
            case s => stack += s.toLong
          }
        case 0x4c => // LONG 'L' (text, trailing 'L' optional)
          stack += readLine().stripSuffix("L").toLong
        case 0x8a => // LONG1: n bytes little-endian two's-complement
          val n = u8()
          if (n == 0) stack += 0L
          else {
            val bytes = readBytes(n)
            var v = 0L
            var i = n - 1
            while (i >= 0) { v = (v << 8) | (bytes(i) & 0xffL); i -= 1 }
            if (n < 8 && (bytes(n - 1) & 0x80) != 0) v -= (1L << (8 * n))
            stack += v
          }
        // -- floats --
        case 0x47 => stack += bb.getDouble // BINFLOAT 'G' (big-endian)
        case 0x46 => stack += readLine().toDouble // FLOAT 'F' (text)
        // -- strings --
        case 0x55 => // SHORT_BINSTRING 'U'
          stack += new String(readBytes(u8()), StandardCharsets.ISO_8859_1)
        case 0x54 => // BINSTRING 'T'
          stack += new String(readBytes(i32le()), StandardCharsets.ISO_8859_1)
        case 0x58 => // BINUNICODE 'X'
          stack += new String(readBytes(i32le()), StandardCharsets.UTF_8)
        case 0x8c => // SHORT_BINUNICODE (proto 4, some clients)
          stack += new String(readBytes(u8()), StandardCharsets.UTF_8)
        case 0x53 => // STRING 'S' (proto 0: quoted repr)
          val s = readLine()
          if (s.length < 2) throw new IllegalArgumentException("bad STRING")
          stack += unescapePy(s.substring(1, s.length - 1))
        case 0x56 => stack += readLine() // UNICODE 'V' (raw-unicode-escape; plain subset)
        // -- tuples / lists --
        case 0x74 => stack += popToMark() // TUPLE 't'
        case 0x85 => stack += List(pop()) // TUPLE1
        case 0x86 => // TUPLE2
          val b = pop(); val a = pop(); stack += List(a, b)
        case 0x87 => // TUPLE3
          val c = pop(); val b = pop(); val a = pop(); stack += List(a, b, c)
        case 0x29 => stack += Nil // EMPTY_TUPLE ')'
        case 0x5d => stack += mutable.ArrayBuffer.empty[Any] // EMPTY_LIST ']'
        case 0x6c => // LIST 'l'
          stack += mutable.ArrayBuffer(popToMark(): _*)
        case 0x61 => // APPEND 'a'
          val v = pop()
          stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] += v
        case 0x65 => // APPENDS 'e'
          val items = popToMark()
          stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] ++= items
        // -- memo --
        case 0x70 => memo(readLine().toLong) = stack.last // PUT 'p'
        case 0x71 => memo(u8().toLong) = stack.last // BINPUT 'q'
        case 0x72 => memo(i32le().toLong) = stack.last // LONG_BINPUT 'r'
        case 0x67 => stack += memo(readLine().toLong) // GET 'g'
        case 0x68 => stack += memo(u8().toLong) // BINGET 'h'
        case 0x6a => stack += memo(i32le().toLong) // LONG_BINGET 'j'
        // -- bools (proto 2) --
        case 0x88 => stack += true // NEWTRUE
        case 0x89 => stack += false // NEWFALSE
        case op =>
          throw new IllegalArgumentException(f"unsupported pickle opcode 0x$op%02x")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def unescapePy(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '"' => sb.append('"'); i += 2
          case 'x' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar)
            i += 4
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Extract data points from one unpickled payload, mirroring the
    * reference's typed walk (`graphite_pickle.go:172-195`): the root is
    * a list/tuple of 2-item (name, (ts, value)); ts must be an int;
    * value may be float or int (the int fallback at :180-185). A
    * malformed item aborts the remainder of the payload, as the
    * reference's `break` does. */
  def pointsFromPayload(root: Any): Seq[Point] = {
    // stalecucumber's ListOrTuple: either container type is accepted
    def asSeq(a: Any): Option[Seq[Any]] = a match {
      case l: mutable.ArrayBuffer[_] => Some(l.toSeq)
      case l: List[_] => Some(l)
      case _ => None
    }
    val out = mutable.ArrayBuffer.empty[Point]
    val items = asSeq(root).getOrElse(Seq.empty)
    var i = 0
    var ok = true
    while (ok && i < items.length) {
      asSeq(items(i)) match {
        case Some(Seq(name: String, dp)) =>
          asSeq(dp) match {
            case Some(Seq(ts: Long, v)) =>
              v match {
                case d: Double => out += Point(name, ts, d)
                case n: Long => out += Point(name, ts, n.toDouble)
                case _ => ok = false // non-numeric value: abort payload
              }
            case _ => ok = false // dp wrong length/type: abort payload
          }
        case _ => ok = false // item wrong length: abort payload
      }
      i += 1
    }
    out.toSeq
  }

  /** Decode a byte stream of length-prefixed pickle frames
    * (`graphite_pickle.go:145-168`: uint32 BE length, then the blob).
    * A frame that fails to decode ends the stream, like the reference's
    * connection-handler break; complete prior frames are kept. */
  def decodeFrames(stream: Array[Byte]): Seq[Point] = {
    val out = mutable.ArrayBuffer.empty[Point]
    val bb = ByteBuffer.wrap(stream).order(ByteOrder.BIG_ENDIAN)
    while (bb.remaining() >= 4) {
      val len = bb.getInt
      if (len < 0 || len > bb.remaining()) return out.toSeq
      val off = bb.position()
      try out ++= pointsFromPayload(unpickle(stream, off, len))
      catch { case _: Exception => return out.toSeq }
      bb.position(off + len)
    }
    out.toSeq
  }

  // ---- encoder (test fixture / round-trip source) ----

  /** Protocol-2 pickle of `[(name, (ts, value)), ...]` exactly as a
    * Python-2 carbon client emits it: PROTO 2, EMPTY_LIST, MARK,
    * (SHORT_BINSTRING name, (BININT ts, BINFLOAT value) TUPLE2) TUPLE2
    * per point, APPENDS, STOP — prefixed with the uint32 BE frame
    * length. Names over 255 bytes use BINSTRING (i32le length), the
    * pickle escape every client library takes — total, never throws:
    * the sharded PickleDirector re-encodes OWNED points from arbitrary
    * external frames on the gateway connection thread, where an
    * exception would kill the connection and drop the frame. */
  def encodeFrame(points: Seq[Point]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    def w(bytes: Int*): Unit = bytes.foreach(b => body.write(b & 0xff))
    w(0x80, 2, 0x5d, 0x28)
    points.foreach { p =>
      val nameBytes = p.name.getBytes(StandardCharsets.ISO_8859_1)
      val n = nameBytes.length
      if (n <= 255) w(0x55, n)
      else w(0x54, n & 0xff, (n >> 8) & 0xff, (n >> 16) & 0xff, (n >> 24) & 0xff)
      body.write(nameBytes, 0, nameBytes.length)
      val ts = p.tsSec.toInt
      w(0x4a, ts & 0xff, (ts >> 8) & 0xff, (ts >> 16) & 0xff, (ts >> 24) & 0xff)
      w(0x47)
      val dv = java.lang.Double.doubleToLongBits(p.value)
      (7 to 0 by -1).foreach(i => body.write(((dv >> (8 * i)) & 0xff).toInt))
      w(0x86, 0x86)
    }
    w(0x65, 0x2e)
    val blob = body.toByteArray
    val framed = ByteBuffer.allocate(4 + blob.length).order(ByteOrder.BIG_ENDIAN)
    framed.putInt(blob.length).put(blob)
    framed.array()
  }
}
