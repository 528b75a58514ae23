package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot sketching loops of the
  * near-dup pipeline ([[graft.pipeline.NearDup]]).
  *
  * Why these exist: Spark's higher-order functions (`aggregate`,
  * `transform`) are `CodegenFallback` — every element step allocates a
  * lambda frame and boxes the accumulator, and computing a 16-hash
  * MinHash signature that way makes 16 interpreted passes over each
  * document's shingle array. At 100 TB the signature fold is the
  * single hottest loop in dedup, so it gets the tier-(c) treatment the
  * design calls for: a real `Expression` with `doGenCode`, one fused
  * pass per document, primitive `long` arithmetic, no boxing, inlined
  * into whole-stage codegen alongside the surrounding projection.
  *
  * Both expressions are bit-compatible with the higher-order-function
  * formulations they replace (asserted by PropertySpec), which keeps
  * the DuckDB oracle SQL unchanged.
  */
object HashExprs {

  /** All 16 MinHash minima in one pass: `sig[k] = min over x of
    * (x·a_k + b_k) mod p`, empty/all-null input ⇒ Long.MaxValue per
    * slot (the fold's initial accumulator). */
  def minhashSig(c: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(c), as, bs, p))

  /** 32-bit SimHash in one pass: bit i of the result = sign of
    * Σ(±1 per element's bit i). */
  def simhashSig(c: Column): Column =
    GraftBridge.column(SimHashSigExpr(GraftBridge.expression(c)))

  /** Count of the array's elements contained in the broadcast sorted
    * set — one binary-search probe per element ([[CountInSetExpr]]).
    * Sort with `java.util.Arrays.sort` before broadcasting. */
  def countInSet(c: Column,
      sortedSet: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    GraftBridge.column(CountInSetExpr(GraftBridge.expression(c), sortedSet))

  /** The subset of the array's elements the broadcast Bloom filter
    * might contain ([[BloomKeepExpr]]) — the map-side prefilter of the
    * two-phase cross-corpus contamination check
    * ([[graft.pipeline.Curation.contaminationXl]]). No false
    * negatives by the filter's contract, so downstream exact
    * verification sees every true hit. */
  def bloomKeep(c: Column,
      bloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]): Column =
    GraftBridge.column(BloomKeepExpr(GraftBridge.expression(c), bloom))

  private[functions] def checkLongArray(name: String, dt: DataType): TypeCheckResult =
    dt match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<bigint> input, got ${other.catalogString}")
    }
}

/** One-pass k-way MinHash over an `array<long>` of shingle hashes.
  * Inputs are 31-bit hashes and (a, b) < p = 2^31−1, so every product
  * stays below 2^62 — no overflow, same domain contract as
  * [[graft.pipeline.NearDup.P]]. Null elements are skipped, matching
  * `least(acc, null) = acc` in the fold it replaces.
  *
  * `normalize = true` folds each element into [0, p) first
  * (`((x % p) + p) % p`, two extra ops per element×hash) — the
  * SQL-registered form uses it because arbitrary user input has no
  * 31-bit guarantee and an out-of-domain element would otherwise
  * overflow `x·a` SILENTLY into a wrong signature. The library's
  * internal pipelines produce in-domain hashes by construction and
  * skip it. */
case class MinHashSigExpr(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long,
    normalize: Boolean = false)
    extends UnaryExpression {

  private val n = as.length
  require(bs.length == n && n > 0, "a/b parameter vectors must match and be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.checkLongArray(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(n)(Long.MaxValue)
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val x0 = arr.getLong(i)
        val x = if (normalize) ((x0 % p) + p) % p else x0
        var k = 0
        while (k < n) {
          val h = (x * aArr(k) + bArr(k)) % p
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val x = ctx.freshName("x")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$n];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $len = $arr.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $x = $arr.getLong($i);
         |    ${if (normalize) s"$x = (($x % ${p}L) + ${p}L) % ${p}L;" else ""}
         |    for (int $k = 0; $k < $n; $k++) {
         |      long $h = ($x * $aRef[$k] + $bRef[$k]) % ${p}L;
         |      if ($h < $mins[$k]) $mins[$k] = $h;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** One-pass 32-bit SimHash over an `array<long>` of shingle hashes:
  * counter c_i accumulates +1/−1 per element's bit i; result bit i is
  * set iff c_i > 0. Replaces a nested 32×|hs| interpreted fold with a
  * single |hs|-length loop. Null elements are skipped. */
case class SimHashSigExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.checkLongArray(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counters = new Array[Long](32)
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        var b = 0
        while (b < 32) {
          if (((x >> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (counters(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counters = ctx.freshName("counters")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val x = ctx.freshName("x")
      val b = ctx.freshName("b")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $counters = new long[32];
         |int $len = $arr.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $x = $arr.getLong($i);
         |    for (int $b = 0; $b < 32; $b++) {
         |      if ((($x >> $b) & 1L) == 1L) $counters[$b]++; else $counters[$b]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if ($counters[$b] > 0) $sig |= 1L << $b;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSigExpr =
    copy(child = newChild)
}

/** Count of array<long> elements contained in a fixed long set — the
  * decontamination membership probe
  * ([[graft.pipeline.Curation.contamination]]), fused: one hash-set
  * lookup per element against a set built ONCE per plan from the
  * benchmark grams. The formulation it replaces exploded every corpus
  * document's grams, broadcast-joined them against the benchmark, and
  * re-aggregated by doc_id — a full shuffle of the exploded corpus just
  * to count matches that are computable row-local. (`array_intersect`
  * with a literal would also work but rebuilds the probe set per row.)
  * The set is bounded by contract: benchmarks are eval suites, orders
  * of magnitude smaller than the corpus — same bound the broadcast
  * join relied on. It ships as a real torrent BROADCAST of a sorted
  * primitive long[] (8 bytes per gram, probed by binary search): the
  * serialized expression carries only the broadcast handle, so the
  * many copies Catalyst makes of an expression during optimization
  * never replicate the payload into task binaries, and executors fetch
  * the blocks once — exactly the distribution path the broadcast join
  * used. Null elements never match (they never equal a set member),
  * matching the left join's null-key behavior. */
case class CountInSetExpr(child: Expression,
    sortedSet: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.checkLongArray(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_in_set"

  override protected def nullSafeEval(input: Any): Any = {
    val probe = sortedSet.value
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var n = 0L
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i) &&
        java.util.Arrays.binarySearch(probe, arr.getLong(i)) >= 0) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val bcRef = ctx.addReferenceObj("countInSetBc", sortedSet,
        "org.apache.spark.broadcast.Broadcast")
      val pRef = ctx.freshName("probe")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val n = ctx.freshName("n")
      s"""
         |long[] $pRef = (long[]) $bcRef.value();
         |int $len = $arr.numElements();
         |long $n = 0L;
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$arr.isNullAt($i) &&
         |      java.util.Arrays.binarySearch($pRef, $arr.getLong($i)) >= 0) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CountInSetExpr =
    copy(child = newChild)
}

/** Keep the elements of an `array<long>` that a broadcast Bloom filter
  * might contain. This is the map-side phase of the two-phase
  * cross-corpus overlap check: where [[CountInSetExpr]] broadcasts the
  * reference set ITSELF (eval suites — small by definition), this
  * broadcasts only the filter's bit array, so the reference side can be
  * another full-size corpus. Bloom filters admit false positives but
  * never false negatives, so the output is a superset of the true
  * matches; an exact join downstream removes the false positives while
  * paying shuffle only for this pruned stream. Null elements are
  * dropped (a null gram hash cannot match anything). */
case class BloomKeepExpr(child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.checkLongArray(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom_keep"

  override protected def nullSafeEval(input: Any): Any = {
    val f = bloom.value
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val out = new Array[Long](len)
    var m = 0
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        if (f.mightContainLong(v)) { out(m) = v; m += 1 }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val bcRef = ctx.addReferenceObj("bloomKeepBc", bloom,
        "org.apache.spark.broadcast.Broadcast")
      val f = ctx.freshName("bf")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      s"""
         |org.apache.spark.util.sketch.BloomFilter $f =
         |  (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();
         |int $len = $arr.numElements();
         |long[] $out = new long[$len];
         |int $m = 0;
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $v = $arr.getLong($i);
         |    if ($f.mightContainLong($v)) { $out[$m] = $v; $m++; }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($out, $m));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BloomKeepExpr =
    copy(child = newChild)
}
