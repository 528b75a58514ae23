package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression for the text-quality hot loop: per-profile
  * stopword occurrence counts, all profiles in ONE pass over the token
  * array. The HOF formulation ([[graft.pipeline.TextAnalysis]]'s
  * `aggregate` + `array_contains` fold) is interpreted and runs once
  * per profile — language ID over P profiles walks every document's
  * tokens P times. At 100 TB of text this loop IS the quality/lang-ID
  * stage, so it gets the same treatment as the sketch loops: fused
  * pass, hash-set membership, whole-stage codegen. */
object TextExprs {

  /** counts[p] = number of token occurrences contained in profile p
    * (token nulls contribute 0, as the fold's `otherwise(0)` does). */
  def profileHits(tokens: Column, profiles: Seq[Seq[String]]): Column =
    GraftBridge.column(ProfileHitsExpr(GraftBridge.expression(tokens), profiles))

  /** (…((0·m + c₀) mod p)·m + c₁ …) mod p over the string's UTF-16
    * code units — one native pass instead of a per-character split. */
  def rollingHash(s: Column, mult: Long, mod: Long): Column =
    GraftBridge.column(RollingHashExpr(GraftBridge.expression(s), mult, mod))

  /** Total occurrences of every blocklist phrase in the string (all
    * end positions, overlapping included), via one broadcast
    * Aho–Corasick automaton pass — O(|text|) regardless of the
    * blocklist's size, where a per-phrase scan is O(|text|·|phrases|)
    * ([[AhoCountExpr]]). */
  def acCount(s: Column,
      ac: org.apache.spark.broadcast.Broadcast[AhoCorasick]): Column =
    GraftBridge.column(AhoCountExpr(GraftBridge.expression(s), ac))

  /** Apply a BPE merge SEQUENCE to a space-separated symbol string —
    * one native compiled fold; see [[BpeMergeFoldExpr]]. */
  def bpeMergeFold(s: Column, merges: Seq[String]): Column =
    GraftBridge.column(BpeMergeFoldExpr(GraftBridge.expression(s), merges))

  /** First 60 bits of md5 as a non-negative long — the engine's
    * portable hash primitive, identical in value to
    * `conv(substring(md5(s), 1, 15), 16, 10)` but computed straight
    * from the digest bytes (no 32-char hex string materialized and
    * re-parsed per shingle). */
  def md5Prefix60(s: Column): Column =
    GraftBridge.column(Md5Prefix60Expr(GraftBridge.expression(s)))

  /** Per-document shingle-hash SET in one fused pass: lower → trim →
    * whitespace split → word n-grams → md5-prefix60 mod x →
    * first-occurrence dedup. See [[ShingleSetExpr]]. */
  def shingleSet(text: Column, n: Int, x: Long): Column =
    GraftBridge.column(ShingleSetExpr(GraftBridge.expression(text), n, x))

  /** Unicode text cleanup in one native pass: NFC → zero-width strip →
    * whitespace/control run collapse → trim. See [[NfcCleanExpr]]. */
  def nfcClean(s: Column): Column =
    GraftBridge.column(NfcCleanExpr(GraftBridge.expression(s)))

  /** Doc-local Shannon entropy of the code-point distribution (nats)
    * — see [[CharEntropyExpr]]; caller guards empty strings. */
  def charEntropy(s: Column): Column =
    GraftBridge.column(CharEntropyExpr(GraftBridge.expression(s)))

  /** Doc-local DSIR score against a driver-bounced bucket weight
    * table — struct(n_tokens, logw); see [[DsirScoreExpr]]. */
  def dsirScore(s: Column, lw: Seq[Double]): Column =
    GraftBridge.column(DsirScoreExpr(GraftBridge.expression(s), lw))
}

/** Shared eval body for [[NfcCleanExpr]] (interpreted + codegen).
  *
  * The collapse class is ENUMERATED, not delegated to
  * `Character.isWhitespace` (which excludes NBSP and figure/narrow
  * spaces) or a regex engine — the exact same code-point set is stated
  * as an RE2 class in the DuckDB oracle, so both engines agree by
  * construction: C0 controls + space (≤ 0x20), DEL + C1 (0x7F–0x9F),
  * NBSP, OGHAM, the 0x2000–0x200A space block, LS/PS, NNBSP, MMSP,
  * IDEOGRAPHIC SPACE. Zero-width chars (ZWSP/ZWNJ/ZWJ/BOM) are
  * dropped entirely BEFORE collapsing, so they never create a space
  * inside a word. */
object NfcClean {
  private def isCollapse(c: Char): Boolean =
    c <= ' ' || (c >= '\u007F' && c <= '\u009F') || c == '\u00A0' ||
      c == '\u1680' || (c >= '\u2000' && c <= '\u200A') ||
      c == '\u2028' || c == '\u2029' || c == '\u202F' ||
      c == '\u205F' || c == '\u3000'
  private def isZeroWidth(c: Char): Boolean =
    (c >= '\u200B' && c <= '\u200D') || c == '\uFEFF'

  def clean(input: UTF8String): UTF8String = {
    val n = java.text.Normalizer.normalize(
      input.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(n.length)
    var pendingSpace = false
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (isZeroWidth(c)) ()
      else if (isCollapse(c)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** The identical code-point set as an RE2 character class, for the
    * DuckDB oracle's `regexp_replace`. */
  val CollapseClassRe2: String =
    "[\\x00-\\x20\\x{7F}-\\x{9F}\\x{A0}\\x{1680}\\x{2000}-\\x{200A}" +
      "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+"
  val ZeroWidthClassRe2: String = "[\\x{200B}-\\x{200D}\\x{FEFF}]"
}

/** NFC normalization + cleanup as one codegen'd pass — the text
  * canonicalization every hash-keyed stage (exact dedup, shingles,
  * fingerprints) wants upstream, since NFC-divergent byte encodings of
  * the same text otherwise hash apart. Spark has no normalization
  * builtin; the JDK normalizer does the heavy step and the
  * strip/collapse runs in the same pass. */
/** Shared eval body for [[BpeMergeFoldExpr]] (interpreted + codegen):
  * apply a learned-merge sequence to a space-separated symbol string
  * with canonical BPE's leftmost non-overlapping scan. Per merge, the
  * EXACT column-op sequence of the fold it replaces (the space-
  * doubling trick — see [[graft.pipeline.Curation]] `fuseChain`):
  * double every space, replace " pa  pb " with " papb ", halve, trim.
  * `UTF8String.replace` is the same primitive `StringReplace` codegens
  * to, and `trim()` strips 0x20 only, exactly like the `trim` column
  * function — so outputs are bit-identical to the HOF fold and the
  * SQL twins. */
object BpeMergeFold {
  private val SP = UTF8String.fromString(" ")
  private val SP2 = UTF8String.fromString("  ")

  /** (finds, repls) for a merge list: find = " pa  pb " (doubled
    * inner boundary), repl = " papb ". */
  def tables(merges: Seq[String]): (Array[UTF8String], Array[UTF8String]) = {
    val fs = new Array[UTF8String](merges.length)
    val rs = new Array[UTF8String](merges.length)
    merges.zipWithIndex.foreach { case (pr, i) =>
      val cut = pr.indexOf(' ')
      require(cut > 0 && pr.indexOf(' ', cut + 1) < 0,
        s"malformed merge pair '$pr' (need exactly one space)")
      val pa = pr.substring(0, cut); val pb = pr.substring(cut + 1)
      fs(i) = UTF8String.fromString(" " + pa + "  " + pb + " ")
      rs(i) = UTF8String.fromString(" " + pa + pb + " ")
    }
    (fs, rs)
  }

  def fold(input: UTF8String, finds: Array[UTF8String],
      repls: Array[UTF8String]): UTF8String = {
    var cur = input
    var i = 0
    while (i < finds.length) {
      val doubled =
        UTF8String.concat(SP, cur, SP).replace(SP, SP2)
      cur = doubled.replace(finds(i), repls(i)).replace(SP2, SP).trim()
      i += 1
    }
    cur
  }
}

/** The BPE merge-sequence fold as ONE native expression: the merge
  * tables ride the references array (stable codegen source regardless
  * of merge content AND count — per-round training plans never
  * recompile, a 32k-merge tokenizer is one plan node) and each row
  * pays one compiled loop instead of an interpreted `aggregate()` HOF
  * walk (the HOF form profiled 1.5× slower at the 200k-doc probe
  * point). Output is bit-identical to the HOF fold ([[BpeMergeFold]]
  * scaladoc); CurationSpec pins the equivalence and the oracle rows
  * stay hash-exact. */
case class BpeMergeFoldExpr(child: Expression, merges: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_merge_fold"

  @transient private lazy val tables = BpeMergeFold.tables(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeMergeFold.fold(input.asInstanceOf[UTF8String],
      tables._1, tables._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { in =>
      val fRef = ctx.addReferenceObj("bpeFinds", tables._1,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val rRef = ctx.addReferenceObj("bpeRepls", tables._2,
        "org.apache.spark.unsafe.types.UTF8String[]")
      s"${ev.value} = graft.functions.BpeMergeFold.fold($in, $fRef, $rRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeMergeFoldExpr =
    copy(child = newChild)
}

case class NfcCleanExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_clean"

  override protected def nullSafeEval(input: Any): Any =
    NfcClean.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.NfcClean.clean($in);")

  override protected def withNewChildInternal(newChild: Expression): NfcCleanExpr =
    copy(child = newChild)
}

/** Shared eval body for [[ShingleSetExpr]] (interpreted + codegen). */
object ShingleSet {
  def hashSet(input: UTF8String, n: Int, x: Long): ArrayData = {
    // UTF8String.toLowerCase/trim: the SAME methods Spark's
    // lower()/trim() expressions call, so semantics (including
    // non-ASCII lowercasing) are identical by construction; the regex
    // split matches StringSplit's Java-Pattern behavior
    val toks = input.toLowerCase.trim.toString.split("\\s+", -1)
    val count = math.max(toks.length - n, 0) + 1
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var m = 0
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < count) {
      sb.setLength(0)
      val end = math.min(i + n, toks.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val h = Math.floorMod(
        Md5Prefix60.hash(UTF8String.fromString(sb.toString)), x)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, m))
  }
}

/** Fused per-document shingle-hash set — the hottest loop of the dedup
  * stack (every near-dup path starts by shingling the corpus). The
  * declarative form is three interpreted higher-order passes (n-gram
  * `transform` with `slice`+`concat_ws` per element, a hash `transform`,
  * `array_distinct`), each materializing intermediate arrays; this walks
  * the token array once per document. Value-identical to
  * `array_distinct(transform(grams(split(trim(lower(text)), "\\s+")),
  * g -> pmod(md5_prefix60(g), x)))` — first-occurrence order included —
  * which PropertySpec pins (non-ASCII, whitespace runs, empty, short). */
case class ShingleSetExpr(child: Expression, n: Int, x: Long)
    extends UnaryExpression {

  require(n > 0 && x > 0, "shingle width and modulus must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleSet.hashSet(input.asInstanceOf[UTF8String], n, x)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.ShingleSet.hashSet($in, $n, ${x}L);")

  override protected def withNewChildInternal(newChild: Expression): ShingleSetExpr =
    copy(child = newChild)
}

/** Digest helper shared by interpreted eval and generated code; MD5
  * instances are thread-local (tasks run one row batch per thread). */
object Md5Prefix60 {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  def hash(s: UTF8String): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val first8 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    first8 >>> 4 // 15 hex nibbles = first 60 bits
  }
}

case class Md5Prefix60Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Md5Prefix60.hash($in);")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60Expr =
    copy(child = newChild)
}

/** Rolling polynomial hash over a string column: acc = (acc·mult +
  * codeUnit) mod m, in UTF-16 code-unit order — the same sequence the
  * `split(s, "") → aggregate(…, ascii(c))` fold it replaces produces
  * (Spark's per-character split yields one code unit per element;
  * PropertySpec pins the equivalence over non-ASCII inputs too). The
  * fold materializes a per-CHARACTER string array and folds it
  * interpreted; this walks the string once. */
case class RollingHashExpr(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * mult + s.charAt(i)) % mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $s = $in.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * ${mult}L + (long) $s.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

case class ProfileHitsExpr(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {

  private val nProfiles = profiles.length
  require(nProfiles > 0, "at least one profile")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> input, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_profile_hits"

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    profiles.map { p =>
      val s = new java.util.HashSet[UTF8String](p.size * 2)
      p.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](nProfiles)
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var p = 0
        while (p < nProfiles) {
          if (sets(p).contains(t)) counts(p) += 1
          p += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val setsRef = ctx.addReferenceObj("profileSets", sets, "java.util.HashSet[]")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      s"""
         |long[] $counts = new long[$nProfiles];
         |int $len = $arr.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $t = $arr.getUTF8String($i);
         |    for (int $p = 0; $p < $nProfiles; $p++) {
         |      if ($setsRef[$p].contains($t)) $counts[$p]++;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ProfileHitsExpr =
    copy(child = newChild)
}

/** Aho–Corasick string-matching automaton, built once on the driver
  * and broadcast ([[TextExprs.acCount]]). Flattened to primitive
  * arrays: per-node sorted transition chars + targets (binary-search
  * step), BFS failure links, and `outCount` pre-summed along the
  * failure chain so matching never walks it — the standard
  * construction (Aho & Corasick 1975, public algorithm). Counts EVERY
  * match end position, so phrases that overlap or nest (`"aa"` in
  * `"aaa"` → 2) all register; callers wanting leftmost-non-overlap
  * semantics should de-overlap the phrase list instead. */
final class AhoCorasick private (
    chars: Array[Array[Char]], next: Array[Array[Int]],
    fail: Array[Int], outCount: Array[Long]) extends Serializable {

  def countMatches(s: UTF8String): Long =
    if (s == null) 0L else countMatches(s.toString)

  def countMatches(s: String): Long = {
    var st = 0
    var n = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      var cur = st
      var nxt = -1
      while (nxt == -1) {
        val idx = java.util.Arrays.binarySearch(chars(cur), c)
        if (idx >= 0) nxt = next(cur)(idx)
        else if (cur == 0) nxt = 0
        else cur = fail(cur)
      }
      st = nxt
      n += outCount(st)
      i += 1
    }
    n
  }
}

object AhoCorasick {
  /** Build from a phrase list; empty phrases are dropped (an empty
    * needle would "match" at every position). */
  def apply(patterns: Seq[String]): AhoCorasick = {
    import scala.collection.mutable
    val kids = mutable.ArrayBuffer(mutable.SortedMap.empty[Char, Int])
    val ends = mutable.ArrayBuffer(0L)
    patterns.filter(_.nonEmpty).foreach { p =>
      var node = 0
      p.foreach { c =>
        node = kids(node).getOrElseUpdate(c, {
          kids += mutable.SortedMap.empty[Char, Int]
          ends += 0L
          kids.length - 1
        })
      }
      ends(node) += 1L
    }
    val n = kids.length
    val fail = new Array[Int](n)
    val out = ends.toArray
    val queue = mutable.Queue.empty[Int]
    kids(0).values.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      out(u) += out(fail(u)) // pre-sum the failure chain
      kids(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !kids(f).contains(c)) f = fail(f)
        fail(v) = kids(f).get(c).filter(_ != v).getOrElse(0)
        queue += v
      }
    }
    new AhoCorasick(
      kids.map(_.keys.toArray).toArray,
      kids.map(_.values.toArray).toArray,
      fail, out)
  }
}

/** Blocklist-phrase occurrence count over a string column via a
  * broadcast [[AhoCorasick]] automaton — the scale path for
  * C4/RefinedWeb-style blocklist filtering, where the phrase list is
  * large and a per-phrase scan would multiply the text pass. Null
  * input yields null (UnaryExpression's default). */
case class AhoCountExpr(child: Expression,
    ac: org.apache.spark.broadcast.Broadcast[AhoCorasick])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ac_count"

  override protected def nullSafeEval(input: Any): Any =
    ac.value.countMatches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bcRef = ctx.addReferenceObj("acBc", ac,
        "org.apache.spark.broadcast.Broadcast")
      s"""
         |${ev.value} = ((graft.functions.AhoCorasick) $bcRef.value())
         |  .countMatches($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AhoCountExpr =
    copy(child = newChild)
}

/** Shared eval body for [[CharEntropyExpr]] (interpreted + codegen):
  * Shannon entropy of the per-code-point distribution in nats,
  * H = ln n − (Σ_c c·ln c)/n, one native pass with an ASCII-array
  * fast path. Counting is per CODE POINT — exactly the groups
  * `split(text, "")` + `length(ch) > 0` produces (Java's empty-regex
  * split advances by code point), so the value is the explode +
  * two-level aggregate's, minus the explode and both exchanges.
  * Caller guards empty input (n = 0 has no defined entropy). */
object CharEntropy {
  def entropy(input: UTF8String): Double = {
    val s = input.toString
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Array[Int]] = null
    var i = 0
    var n = 0.0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1.0
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Int]]()
        val slot = other.get(cp)
        if (slot == null) other.put(cp, Array(1)) else slot(0) += 1
      }
    }
    var clc = 0.0
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) clc += k * math.log(k.toDouble)
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val k = it.next()(0)
        clc += k * math.log(k.toDouble)
      }
    }
    math.log(n) - clc / n
  }
}

/** Doc-local character entropy — null input yields null; the caller
  * guards n = 0 (empty string) with a `when(length > 0, …)`. */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.CharEntropy.entropy($in);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

/** Shared eval body for [[DsirScoreExpr]]: tokenize (lower → trim →
  * whitespace split, the pipeline's normalization — same kernel
  * semantics as [[ShingleSet]]), hash each token with the portable
  * md5-prefix60, and fold the per-bucket log-weight — the whole DSIR
  * scoring pass as one compiled walk over the document. Returns
  * (n_tokens, logw) with logw null when the document has no tokens. */
object DsirScore {
  def score(input: UTF8String, lw: Array[Double])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val toks = input.toLowerCase.trim.toString.split("\\s+", -1)
    val b = lw.length.toLong
    var n = 0L
    var s = 0.0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        n += 1
        s += lw(Math.floorMod(
          Md5Prefix60.hash(UTF8String.fromString(t)), b).toInt)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, if (n > 0) java.lang.Double.valueOf(s) else null))
  }
}

/** Doc-local DSIR score over a driver-bounced bucket weight table —
  * struct(n_tokens, logw); null input yields a null struct. Value-
  * identical to exploding the token stream, joining the B-row weight
  * table on `pmod(md5_prefix60(tok), B)` and re-aggregating by doc
  * (PropertySpec pins the equivalence); the fold runs in token order,
  * a float-sum order change absorbed by the Round6 trip like the
  * shuffle-order sum it replaces. */
case class DsirScoreExpr(child: Expression, lw: Seq[Double])
    extends UnaryExpression {

  // Seq, not Array: case-class equality must be VALUE equality so the
  // expression canonicalizes stably (plan-identical invocations reuse
  // the CacheManager entry; an Array field compares by reference and
  // silently defeats that). The eval-side array is derived once.
  @transient private lazy val lwArr: Array[Double] = lw.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("logw", DoubleType, nullable = true)))
  override def prettyName: String = "graft_dsir_score"

  override protected def nullSafeEval(input: Any): Any =
    DsirScore.score(input.asInstanceOf[UTF8String], lwArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { in =>
      val lwRef = ctx.addReferenceObj("dsirLw", lwArr, "double[]")
      s"${ev.value} = graft.functions.DsirScore.score($in, $lwRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): DsirScoreExpr =
    copy(child = newChild)
}
