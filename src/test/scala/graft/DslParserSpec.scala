package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dsl.Dsl
import graft.dsl.Dsl._

/** Parser-only tests (no Spark session): grammar shapes from the
  * reference's DSL surface (`dsl/dsl.go`, `dsl/funcs_test.go`). */
class DslParserSpec extends AnyFunSuite {

  test("bare pattern") {
    assert(Dsl.parse("a.b.*") == Pattern("a.b.*"))
  }

  test("number forms") {
    assert(Dsl.parse("scale(a, -2.5)") ==
      Call("scale", List(Pattern("a"), Num(-2.5)), Map.empty))
    assert(Dsl.parse("f(1e3)") == Call("f", List(Num(1000.0)), Map.empty))
  }

  test("nested calls and strings") {
    assert(Dsl.parse("alias(sumSeries(a.b.*), 'total')") ==
      Call("alias", List(
        Call("sumSeries", List(Pattern("a.b.*")), Map.empty),
        Str("total")), Map.empty))
  }

  test("chained call prepends receiver — dsl/dsl.go:219-233") {
    assert(Dsl.parse("group(a).scale(2)") ==
      Call("scale", List(
        Call("group", List(Pattern("a")), Map.empty), Num(2.0)), Map.empty))
  }

  test("dotted receiver: last segment is the function") {
    assert(Dsl.parse("a.b.c.scale(2)") ==
      Call("scale", List(Pattern("a.b.c"), Num(2.0)), Map.empty))
  }

  test("multi-chain") {
    assert(Dsl.parse("a.b.scale(2).offset(1)") ==
      Call("offset", List(
        Call("scale", List(Pattern("a.b"), Num(2.0)), Map.empty),
        Num(1.0)), Map.empty))
  }

  test("kwargs — dsl/funcs.go:412-430") {
    assert(Dsl.parse("nonNegativeDerivative(a, maxValue=100)") ==
      Call("nonNegativeDerivative", List(Pattern("a")),
        Map("maxValue" -> Num(100.0))))
  }

  test("braces swallow commas in patterns") {
    assert(Dsl.parse("group(events.{click,view}.u0, b)") ==
      Call("group",
        List(Pattern("events.{click,view}.u0"), Pattern("b")), Map.empty))
  }

  test("empty arg list and whitespace tolerance") {
    assert(Dsl.parse("sinusoid()") == Call("sinusoid", Nil, Map.empty))
    assert(Dsl.parse(" scale( a.b , 2 ) ") ==
      Call("scale", List(Pattern("a.b"), Num(2.0)), Map.empty))
  }

  test("glob → regex: segment-local wildcards") {
    assert(Dsl.globToRegex("events.*.u1") == "^events\\.[^.]*\\.u1$")
    assert(Dsl.globToRegex("a.u?") == "^a\\.u[^.]$")
    assert("^events\\.[^.]*\\.u1$".r.matches("events.click.u1"))
    assert(!"^events\\.[^.]*\\.u1$".r.matches("events.a.b.u1"))
  }

  test("glob → regex: braces and classes") {
    val r = Dsl.globToRegex("events.{click,view}.u[0-2]").r
    assert(r.matches("events.click.u0"))
    assert(r.matches("events.view.u2"))
    assert(!r.matches("events.error.u1"))
    assert(!r.matches("events.click.u3"))
  }

  test("glob → regex: regex metachars in literals are escaped") {
    val r = Dsl.globToRegex("a+b.c").r
    assert(r.matches("a+b.c"))
    assert(!r.matches("aab.c"))
  }

  test("rejects malformed input") {
    assertThrows[IllegalArgumentException](Dsl.parse("f(a"))
    assertThrows[IllegalArgumentException](Dsl.parse("f(a))"))
    assertThrows[IllegalArgumentException](Dsl.parse("'unterminated"))
  }

  // viewport parseTime grammar (http/graphite.go:197-221)
  test("viewport: relative, now, absolute, empty, junk") {
    import graft.dsl.Viewport
    val now = 1704585600L
    assert(Viewport.parseTimeSec("-1h", now) == Some(now - 3600))
    assert(Viewport.parseTimeSec("-1d", now) == Some(now - 86400))
    assert(Viewport.parseTimeSec("-2weeks", now) == Some(now - 2 * 7 * 86400))
    assert(Viewport.parseTimeSec("-30minutes", now) == Some(now - 1800))
    assert(Viewport.parseTimeSec("-5m", now) == Some(now - 300)) // Go bare m
    assert(Viewport.parseTimeSec("now", now) == Some(now))
    assert(Viewport.parseTimeSec("1704499200", now) == Some(1704499200L))
    assert(Viewport.parseTimeSec("", now) == None)
    assert(Viewport.parseTimeSec("  ", now) == None)
    assertThrows[IllegalArgumentException](Viewport.parseTimeSec("tomorrow", now))
    assertThrows[IllegalArgumentException](Viewport.parseTimeSec("-1parsec", now))
  }

  test("viewport: ctx defaults until to now, requires from") {
    import graft.dsl.Viewport
    // ctx construction needs no live session/store for the range math:
    // parseTimeSec is the surface under test; ctx wiring is exercised
    // end-to-end by dsl_relative_range / dsl_viewport_mixed.
    val now = 1705104000L
    assert(Viewport.parseTimeSec("-6days", now) == Some(1704585600L))
  }
}
