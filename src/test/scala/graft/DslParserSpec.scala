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
}
