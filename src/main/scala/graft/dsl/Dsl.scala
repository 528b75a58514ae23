package graft.dsl

/** Graphite-expression parser (reference: `dsl/dsl.go:38-290`).
  *
  * The reference preprocesses a target string (quoting dotted identifiers,
  * `http/graphite.go:227-257`) and feeds it to Go's stdlib expression
  * parser, then walks the AST (`dsl/dsl.go:159-264`). Here the grammar is
  * small enough for a direct hand-rolled recursive-descent parser — no
  * quoting pre-pass needed, since the tokenizer treats a dotted/globbed
  * metric path as one token.
  *
  * Grammar (chaining `a.b.fn(x)` ≡ `fn(a.b, x)`, receiver prepended,
  * exactly the reference's `dsl/dsl.go:219-233`):
  * {{{
  *   expr    := primary chain*
  *   chain   := '.' IDENT '(' args ')'
  *   primary := STRING | CALL | NUMBER | PATTERN
  *   CALL    := BAREWORD '(' args ')'      // dotted bareword: last
  *                                         // segment is the function,
  *                                         // prefix is the receiver
  *   args    := (expr | IDENT '=' expr) (',' ...)*
  * }}}
  */
object Dsl {

  sealed trait Node
  final case class Num(v: Double) extends Node
  final case class Str(s: String) extends Node
  /** A metric-path glob, e.g. `events.*.u{0,1}` — resolved against the
    * catalog at eval time. */
  final case class Pattern(p: String) extends Node
  final case class Call(fn: String, args: List[Node],
      kwargs: Map[String, Node]) extends Node

  // ---- tokenizer ----

  private sealed trait Tok
  private case class TStr(s: String) extends Tok
  private case class TWord(s: String) extends Tok
  private case object TLParen extends Tok
  private case object TRParen extends Tok
  private case object TComma extends Tok
  private case object TEq extends Tok

  private def tokenize(in: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = in.length
    while (i < n) {
      val c = in(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val j = in.indexOf(c, i + 1)
        require(j > 0, s"unterminated string at $i in: $in")
        out += TStr(in.substring(i + 1, j)); i = j + 1
      } else if (c == '(') { out += TLParen; i += 1 }
      else if (c == ')') { out += TRParen; i += 1 }
      else if (c == ',') { out += TComma; i += 1 }
      else if (c == '=') { out += TEq; i += 1 }
      else {
        // bareword: metric path chars; `{a,b}` braces swallow commas
        val sb = new StringBuilder
        var done = false
        while (i < n && !done) {
          val ch = in(i)
          if (ch == '{') {
            val j = in.indexOf('}', i)
            require(j > 0, s"unterminated brace at $i in: $in")
            sb ++= in.substring(i, j + 1); i = j + 1
          } else if (ch.isWhitespace || "(),='\"".contains(ch)) done = true
          else { sb += ch; i += 1 }
        }
        out += TWord(sb.toString)
      }
    }
    out.result()
  }

  // ---- parser ----

  private val NumberPat = """[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?""".r
  private val IdentPat = """[A-Za-z_][A-Za-z0-9_]*""".r

  def parse(expr: String): Node = {
    val toks = tokenize(expr)
    val (node, rest) = parseExpr(toks)
    require(rest.isEmpty, s"trailing tokens ${rest.take(3)} in: $expr")
    node
  }

  /** True when the parsed target calls `name` anywhere in its tree.
    * AST-based (not a substring test) because the tokenizer skips
    * whitespace — `events (deploy)` is the same call as
    * `events(deploy)` — and a function name can appear inside string
    * literals or metric paths without being a call. An unparseable
    * target answers true: conservative for cache-invalidation use
    * (the render fails anyway; never under-invalidate). */
  def callsFunction(expr: String, name: String): Boolean = {
    def walk(n: Node): Boolean = n match {
      case Call(fn, args, kwargs) =>
        fn == name || args.exists(walk) || kwargs.valuesIterator.exists(walk)
      case _ => false
    }
    try walk(parse(expr)) catch { case scala.util.control.NonFatal(_) => true }
  }

  private def parseExpr(t: Vector[Tok]): (Node, Vector[Tok]) = {
    var (node, rest) = parsePrimary(t)
    // chained calls: `.fn(args)` with the receiver as first argument
    var more = true
    while (more) more = rest match {
      case TWord(w) +: TLParen +: tail if w.startsWith(".") &&
          IdentPat.matches(w.drop(1)) =>
        val (args, kwargs, r2) = parseArgs(tail)
        node = Call(w.drop(1), node :: args, kwargs); rest = r2; true
      case _ => false
    }
    (node, rest)
  }

  private def parsePrimary(t: Vector[Tok]): (Node, Vector[Tok]) = t match {
    case TStr(s) +: rest => (Str(s), rest)
    case TWord(w) +: TLParen +: rest =>
      val (args, kwargs, r2) = parseArgs(rest)
      val dot = w.lastIndexOf('.')
      if (dot < 0) (Call(w, args, kwargs), r2)
      else // `a.b.fn(x)` — receiver prepended (`dsl/dsl.go:219-233`)
        (Call(w.substring(dot + 1), Pattern(w.take(dot)) :: args, kwargs), r2)
    case TWord(w) +: rest =>
      if (NumberPat.matches(w)) (Num(w.toDouble), rest) else (Pattern(w), rest)
    case other => throw new IllegalArgumentException(s"unexpected: ${other.take(3)}")
  }

  private def parseArgs(t0: Vector[Tok])
      : (List[Node], Map[String, Node], Vector[Tok]) = {
    val args = List.newBuilder[Node]
    val kwargs = Map.newBuilder[String, Node]
    var t = t0
    var done = t match { case TRParen +: r => t = r; true; case _ => false }
    while (!done) {
      t match {
        // kwarg `k=v` (`dsl/funcs.go:412-430`)
        case TWord(k) +: TEq +: rest if IdentPat.matches(k) =>
          val (v, r2) = parseExpr(rest); kwargs += k -> v; t = r2
        case _ =>
          val (v, r2) = parseExpr(t); args += v; t = r2
      }
      t match {
        case TComma +: r  => t = r
        case TRParen +: r => t = r; done = true
        case other => throw new IllegalArgumentException(
          s"expected , or ) at ${other.take(3)}")
      }
    }
    (args.result(), kwargs.result(), t)
  }

  /** Graphite glob → anchored regex, portable between Java regex and
    * DuckDB RE2: `*`/`?` don't cross dot boundaries (the reference
    * matches per-segment with `filepath.Match`, `dsl/fs_find_cache.go:74-98`),
    * `{a,b}` is alternation, `[...]` passes through.
    */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob(i) match {
        case '*' => sb ++= "[^.]*"
        case '?' => sb ++= "[^.]"
        case '{' =>
          val j = glob.indexOf('}', i)
          require(j > 0, s"unterminated brace in glob: $glob")
          // literal alternatives; escaped char-by-char (not Pattern.quote,
          // whose \Q..\E is Java-only — the same regex must run in RE2)
          sb ++= glob.substring(i + 1, j).split(',')
            .map(_.flatMap(c =>
              if ("\\^$.|?*+()[]{}".indexOf(c) >= 0) s"\\$c" else s"$c"))
            .mkString("(", "|", ")")
          i = j
        case '[' =>
          val j = glob.indexOf(']', i)
          require(j > 0, s"unterminated class in glob: $glob")
          sb ++= glob.substring(i, j + 1)
          i = j
        case '.' => sb ++= "\\."
        case c if "\\^$()+|".indexOf(c) >= 0 => sb += '\\' += c
        case c => sb += c
      }
      i += 1
    }
    sb.append('$').toString
  }
}
