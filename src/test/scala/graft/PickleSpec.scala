package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Pickle
import graft.streaming.Pickle.Point

/** Conformance tests for the carbon pickle decoder against
  * hand-assembled byte vectors of the documented pickle opcode grammar
  * (CPython `pickletools`) — independent of [[Pickle.encodeFrame]], so
  * encoder and decoder cannot share a bug. Covers the three client
  * generations the reference accepts via stalecucumber
  * (`daemon/graphite_pickle.go:168-195`): protocol-0 text pickles,
  * py2 protocol-2 (SHORT_BINSTRING names), and py3-style BINUNICODE
  * names, plus the int-value fallback and malformed-payload aborts. */
class PickleSpec extends AnyFunSuite {

  private def bytes(parts: Any*): Array[Byte] =
    parts.flatMap {
      case s: String => s.getBytes("ISO-8859-1").toSeq
      case c: Char => Seq(c.toByte)
      case i: Int => Seq(i.toByte)
      case b: Byte => Seq(b)
      case a: Array[Byte] => a.toSeq
    }.toArray

  // 4-byte BE length framing
  private def frame(blob: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + blob.length)
    out.putInt(blob.length).put(blob).array()
  }

  private def beDouble(d: Double): Array[Byte] = {
    val v = java.lang.Double.doubleToLongBits(d)
    (7 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
  }

  test("protocol-0 text pickle: [(name, (ts, value))]") {
    // (lp0\n(S'foo.bar'\np1\n(I1425959940\nF12.5\ntp2\ntp3\na.
    val blob = bytes(
      "(lp0\n",
      "(S'foo.bar'\np1\n",
      "(I1425959940\nF12.5\ntp2\n",
      "tp3\na.")
    assert(Pickle.pointsFromPayload(Pickle.unpickle(blob, 0, blob.length)) ===
      Seq(Point("foo.bar", 1425959940L, 12.5)))
  }

  test("py2 protocol-2: SHORT_BINSTRING + BININT + BINFLOAT, MARK/APPENDS") {
    // \x80\x02]q\x00(U\x03a.bq\x01J<ts-le>G<val-be>\x86q\x02\x86q\x03
    //   U\x03c.dq\x04J<ts-le>K\x2a\x86q\x05\x86q\x06e.
    val ts = 1500000000 // 0x59682F00
    val blob = bytes(
      0x80, 2, ']', 'q', 0, '(',
      'U', 3, "a.b", 'q', 1,
      'J', 0x00, 0x2f, 0x68, 0x59, 'G', beDouble(2.25),
      0x86, 'q', 2, 0x86, 'q', 3,
      'U', 3, "c.d", 'q', 4,
      'J', 0x00, 0x2f, 0x68, 0x59, 'K', 42, // int-typed value
      0x86, 'q', 5, 0x86, 'q', 6,
      'e', '.')
    assert(Pickle.pointsFromPayload(Pickle.unpickle(blob, 0, blob.length)) ===
      Seq(Point("a.b", ts.toLong, 2.25), Point("c.d", ts.toLong, 42.0)))
  }

  test("py3-style: BINUNICODE names, LONG1 ts, memo BINGET reuse") {
    // name memoized with BINPUT then reused via BINGET for point 2
    val blob = bytes(
      0x80, 2, ']', 'q', 0, '(',
      'X', 7, 0, 0, 0, "foo.bar", 'q', 1,
      0x8a, 4, 0x04, 0x6c, 0xfe, 0x54, // LONG1(4): 1425959940 LE
      'G', beDouble(-1.5), 0x86, 0x86,
      'h', 1, // BINGET 1 → "foo.bar"
      0x8a, 4, 0x08, 0x6c, 0xfe, 0x54, 'G', beDouble(3.0), 0x86, 0x86,
      'e', '.')
    assert(Pickle.pointsFromPayload(Pickle.unpickle(blob, 0, blob.length)) ===
      Seq(Point("foo.bar", 1425959940L, -1.5),
        Point("foo.bar", 1425959944L, 3.0)))
  }

  test("LONG1 negative and TUPLE via MARK both decode") {
    // single point with MARK...'t' tuple instead of TUPLE2, ts = -2
    val blob = bytes(
      0x80, 2, ']', '(',
      '(', 'U', 1, "n",
      '(', 0x8a, 1, 0xfe, // LONG1(1) = -2
      'G', beDouble(0.5), 't', 't',
      'e', '.')
    assert(Pickle.pointsFromPayload(Pickle.unpickle(blob, 0, blob.length)) ===
      Seq(Point("n", -2L, 0.5)))
  }

  test("malformed item aborts the payload remainder, keeps prior points") {
    // second item is a 3-tuple (wrong length) → first point kept only,
    // mirroring the reference's break (graphite_pickle.go:191-193)
    val blob = bytes(
      0x80, 2, ']', '(',
      'U', 1, "a", 'J', 100, 0, 0, 0, 'G', beDouble(1.0), 0x86, 0x86,
      'U', 1, "b", 'U', 1, "c", 'U', 1, "d", 0x87,
      'U', 1, "e", 'J', 101, 0, 0, 0, 'G', beDouble(2.0), 0x86, 0x86,
      'e', '.')
    assert(Pickle.pointsFromPayload(Pickle.unpickle(blob, 0, blob.length)) ===
      Seq(Point("a", 100L, 1.0)))
  }

  test("float-typed timestamp rejects the item (pickle.Int semantics)") {
    val blob = bytes(
      0x80, 2, ']', '(',
      'U', 1, "a", 'G', beDouble(100.0), 'G', beDouble(1.0), 0x86, 0x86,
      'e', '.')
    assert(Pickle.pointsFromPayload(Pickle.unpickle(blob, 0, blob.length)).isEmpty)
  }

  test("decodeFrames: multiple frames; truncated tail frame keeps priors") {
    val f1 = Pickle.encodeFrame(Seq(Point("x.y", 10L, 1.0), Point("x.z", 11L, 2.0)))
    val f2 = Pickle.encodeFrame(Seq(Point("w", 12L, 3.0)))
    val both = f1 ++ f2
    assert(Pickle.decodeFrames(both) ===
      Seq(Point("x.y", 10L, 1.0), Point("x.z", 11L, 2.0), Point("w", 12L, 3.0)))
    // truncate mid-second-frame: first frame's points survive
    val cut = both.take(f1.length + 6)
    assert(Pickle.decodeFrames(cut) ===
      Seq(Point("x.y", 10L, 1.0), Point("x.z", 11L, 2.0)))
    // garbage frame body ends the stream
    val garbage = f1 ++ frame(bytes(0xff, 0xff, 0xff))
    assert(Pickle.decodeFrames(garbage) ===
      Seq(Point("x.y", 10L, 1.0), Point("x.z", 11L, 2.0)))
  }

  test("encoder round-trip: exact doubles and negative values survive") {
    val pts = Seq(
      Point("servers.web01.load", 1425959940L, 0.1 + 0.2), // inexact repr
      Point("a", 0L, -123456.789),
      Point("b", 2147483647L, Double.MinPositiveValue))
    assert(Pickle.decodeFrames(Pickle.encodeFrame(pts)) === pts)
  }

  test("encoder: names over 255 bytes take the BINSTRING escape, total") {
    // the sharded PickleDirector re-encodes OWNED points from external
    // frames on the gateway connection thread — a throw there would
    // kill the connection and drop the frame, so long names must
    // round-trip, not raise
    val long = "n." + ("x" * 300)
    val pts = Seq(Point(long, 100L, 1.5), Point("short", 101L, 2.5))
    assert(Pickle.decodeFrames(Pickle.encodeFrame(pts)) === pts)
  }
}
