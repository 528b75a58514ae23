package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import scala.collection.mutable

/** Sketch aggregates — bounded-state answers to questions whose exact
  * form needs a corpus-wide shuffle.
  *
  * [[heavyHitters]] is Misra–Gries (the mergeable-summaries form,
  * Agarwal et al., PODS'12): each partial aggregate keeps at most `k`
  * counters, so the state that crosses the shuffle is k-bounded per
  * partition REGARDLESS of corpus size — the 100 TB contrast with
  * exact `groupBy(token).count()`, which shuffles one row per distinct
  * token. The guarantee: every reported count is an underestimate of
  * the true count by at most N/(k+1) (N = total observations), and any
  * token with true count > N/(k+1) is guaranteed present in the
  * output. With k chosen ≥ the distinct-value count the sketch is
  * exact (no decrement ever fires), which is what the DuckDB oracle
  * pins; SketchSpec covers the approximate regime's bounds.
  */
object SketchExprs {

  /** Misra–Gries top-`k` sketch over a string column. Returns
    * `array<struct<token:string, count:bigint>>` sorted by
    * (count desc, token asc). Counts are lower bounds, short by at
    * most N/(k+1); exact when the column has ≤ k distinct values. */
  def heavyHitters(c: Column, k: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(c), k).toAggregateExpression())

  /** Bounded min-list over a bigint column: the `cap` smallest values
    * (ascending) plus the total count, as
    * `struct(df: bigint, ds: array<bigint>)` — the memory-safe
    * `(count, sort_array(collect_list))` for df-capped LSH buckets
    * ([[BoundedMinListAgg]]). */
  def boundedMinList(c: Column, cap: Int): Column =
    GraftBridge.column(
      BoundedMinListAgg(GraftBridge.expression(c), cap).toAggregateExpression())

  /** Mergeable quantile sketch over a double column → binary state
    * ([[QuantileSketch]]'s compactor stack). Store one row per
    * (group, increment); answer later with [[quantileMerge]] +
    * [[sketchQuantiles]] — the quantile twin of the HLL distinct tier.
    * Exact while the group holds ≤ k values (no compaction fires);
    * past that, rank error grows with the compaction depth, bounded
    * and empirically pinned in SketchSpec. */
  def quantileSketch(c: Column, k: Int): Column =
    GraftBridge.column(
      QuantileSketchAgg(GraftBridge.expression(c), k).toAggregateExpression())

  /** Union previously-stored sketch binaries group-wise (aggregate).
    * All inputs must share one `k`. */
  def quantileMerge(c: Column): Column =
    GraftBridge.column(
      QuantileMergeAgg(GraftBridge.expression(c)).toAggregateExpression())

  /** Read quantiles out of a sketch binary: returns `array<double>`,
    * one entry per requested rank fraction — each is an ACTUAL stored
    * value, the smallest whose cumulative weight reaches ⌈q·N⌉ (the
    * discrete lower-quantile rule the DuckDB oracles replay). */
  def sketchQuantiles(c: Column, qs: Seq[Double]): Column =
    GraftBridge.column(SketchQuantilesExpr(
      GraftBridge.expression(c),
      GraftBridge.expression(
        org.apache.spark.sql.functions.typedlit(qs))))

  /** One-shot aggregate-then-read convenience:
    * `sketchQuantiles(quantileSketch(c, k), qs)`. */
  def quantiles(c: Column, k: Int, qs: Seq[Double]): Column =
    sketchQuantiles(quantileSketch(c, k), qs)

  /** Canonical output-column name for a rank fraction: `p50`, `p99`,
    * and `p99_5` for non-integral percents (0.995). Rounding to the
    * nearest percent alone would collide (0.995 and 1.0 both → p100,
    * silently dropping a requested quantile via withColumn replace),
    * so fractional percents keep their digits with `.`→`_`. */
  def quantileColName(q: Double): String = {
    val pct = q * 100.0
    val r = math.rint(pct)
    if (math.abs(pct - r) < 1e-9) s"p${r.toLong}"
    else ("p" + BigDecimal(pct).underlying.stripTrailingZeros.toPlainString)
      .replace('.', '_').replace("-", "neg")
  }

  /** Names for a fraction list, with the uniqueness every caller
    * needs (duplicate names would shadow earlier columns). */
  def quantileColNames(qs: Seq[Double]): Seq[String] = {
    val names = qs.map(quantileColName)
    require(names.distinct.size == names.size,
      s"quantile fractions map to duplicate column names: $names")
    names
  }
}

/** Mergeable quantile summary: a stack of fixed-capacity compactors
  * (the KLL/MRL shape — Karnin–Lang–Liberty, FOCS'16; Manku et al.,
  * SIGMOD'98). Level `i` holds values of weight 2^i; a full level
  * sorts and promotes every other element to level i+1, the surviving
  * offset alternating per level (DETERMINISTIC, where KLL flips a
  * coin — reproducible runs and a cross-engine-checkable exact regime
  * matter more here than KLL's tighter constant). State is
  * O(k · log(N/k)) values regardless of input size — the shuffle
  * carries compactor stacks, never the value stream, which is the
  * 100 TB contrast with exact `percentile_disc`'s full per-group sort.
  * While N ≤ k nothing compacts and the sketch IS the value multiset:
  * quantiles are exact, which is what the DuckDB oracle pins.
  */
final class QuantileSketch(val k: Int) extends Serializable {
  import mutable.ArrayBuffer
  require(k > 0, "quantile sketch requires k > 0")

  /** levels(i): values of weight 2^i, unsorted between compactions. */
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty)
  /** per-level alternating survivor offset (flips each compaction). */
  val phases: ArrayBuffer[Boolean] = ArrayBuffer(false)

  def totalWeight: Long = {
    var n = 0L; var i = 0
    while (i < levels.size) { n += levels(i).size.toLong << i; i += 1 }
    n
  }

  def update(v: Double): Unit = {
    levels(0) += v
    if (levels(0).size > k) compact(0)
  }

  private def compact(i: Int): Unit = {
    val arr = levels(i).toArray
    java.util.Arrays.sort(arr)
    levels(i).clear()
    // weight conservation: an odd buffer leaves its smallest element
    // BEHIND at this level's weight — promoting every other element of
    // an odd count would add or drop one 2^(i+1) weight unit, and
    // totalWeight must equal the observation count EXACTLY
    // (PropertySpec pins it)
    var start = 0
    if (arr.length % 2 == 1) { levels(i) += arr(0); start = 1 }
    val off = start + (if (phases(i)) 1 else 0)
    phases(i) = !phases(i)
    if (i + 1 == levels.size) { levels += ArrayBuffer.empty; phases += false }
    val up = levels(i + 1)
    var j = off
    while (j < arr.length) { up += arr(j); j += 2 }
    if (up.size > k) compact(i + 1)
  }

  /** Summary-combination: concatenate level-wise, then re-compact any
    * level the union overflowed (bottom-up, so promotions cascade).
    * Both operands must share `k` — enforced at the aggregate layer. */
  def merge(other: QuantileSketch): Unit = {
    var i = 0
    while (i < other.levels.size) {
      if (i == levels.size) { levels += ArrayBuffer.empty; phases += false }
      levels(i) ++= other.levels(i)
      i += 1
    }
    i = 0
    while (i < levels.size) { // compact() may append levels; size re-reads
      if (levels(i).size > k) compact(i)
      i += 1
    }
  }

  /** For each rank fraction q: the smallest stored value whose
    * cumulative weight reaches max(1, ⌈q·N⌉); NaN on an empty sketch. */
  def quantiles(qs: Seq[Double]): Array[Double] = {
    val items = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.size) {
      val w = 1L << i
      levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    if (items.isEmpty) return qs.map(_ => Double.NaN).toArray
    val sorted = items.sortBy(_._1)
    val n = totalWeight
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L; var idx = 0; var res = sorted.last._1; var done = false
      while (idx < sorted.length && !done) {
        cum += sorted(idx)._2
        if (cum >= target) { res = sorted(idx)._1; done = true }
        idx += 1
      }
      res
    }.toArray
  }

  def serializeBytes(): Array[Byte] = {
    var n = 4 + 4
    levels.foreach(l => n += 1 + 4 + 8 * l.size)
    val bb = ByteBuffer.allocate(n)
    bb.putInt(k); bb.putInt(levels.size)
    var i = 0
    while (i < levels.size) {
      bb.put(if (phases(i)) 1.toByte else 0.toByte)
      bb.putInt(levels(i).size)
      levels(i).foreach(bb.putDouble)
      i += 1
    }
    bb.array()
  }
}

object QuantileSketch {
  def deserialize(bytes: Array[Byte]): QuantileSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val s = new QuantileSketch(k)
    val nLevels = bb.getInt
    var i = 0
    while (i < nLevels) {
      if (i == s.levels.size) {
        s.levels += mutable.ArrayBuffer.empty; s.phases += false
      }
      s.phases(i) = bb.get() == 1.toByte
      val sz = bb.getInt
      var j = 0
      while (j < sz) { s.levels(i) += bb.getDouble; j += 1 }
      i += 1
    }
    s
  }
}

/** [[QuantileSketch]] as an aggregate over a double column; emits the
  * serialized sketch (`binary`) — the WRITE side of the stored tier.
  * Merges anywhere in the plan (partial aggregation, AQE re-orders)
  * go through the summary-combination rule, so the state crossing any
  * shuffle is one compactor stack per group per partition. */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch]
  with UnaryLike[Expression] {

  require(k > 0, "graft_quantile_sketch requires k > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quantile_sketch requires a double column, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_quantile_sketch"

  override def createAggregationBuffer(): QuantileSketch = new QuantileSketch(k)

  override def update(buf: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def merge(buf: QuantileSketch, other: QuantileSketch): QuantileSketch = {
    buf.merge(other); buf
  }
  override def eval(buf: QuantileSketch): Any = buf.serializeBytes()
  override def serialize(buf: QuantileSketch): Array[Byte] = buf.serializeBytes()
  override def deserialize(bytes: Array[Byte]): QuantileSketch =
    QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

/** Group-wise union of STORED sketch binaries — the READ side of the
  * tier ([[graft.pipeline.Curation.sketchDistinct]]'s HLL shape, for
  * quantiles). The buffer starts as an "adopt" sentinel (null holder)
  * because `k` lives in the incoming binaries; all inputs of one group
  * must share a `k`, enforced here. */
case class QuantileMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileMergeAgg.Holder]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quantile_merge requires a binary sketch column, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantile_merge"

  override def createAggregationBuffer(): QuantileMergeAgg.Holder =
    new QuantileMergeAgg.Holder(null)

  private def mergeInto(h: QuantileMergeAgg.Holder, s: QuantileSketch): Unit =
    if (h.s == null) h.s = s
    else {
      require(h.s.k == s.k,
        s"graft_quantile_merge: mixed sketch k (${h.s.k} vs ${s.k})")
      h.s.merge(s)
    }

  override def update(h: QuantileMergeAgg.Holder, input: InternalRow)
      : QuantileMergeAgg.Holder = {
    val v = child.eval(input)
    if (v != null)
      mergeInto(h, QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    h
  }
  override def merge(h: QuantileMergeAgg.Holder, other: QuantileMergeAgg.Holder)
      : QuantileMergeAgg.Holder = {
    if (other.s != null) mergeInto(h, other.s)
    h
  }
  override def eval(h: QuantileMergeAgg.Holder): Any =
    if (h.s == null) null else h.s.serializeBytes()
  override def serialize(h: QuantileMergeAgg.Holder): Array[Byte] =
    if (h.s == null) Array.emptyByteArray else h.s.serializeBytes()
  override def deserialize(bytes: Array[Byte]): QuantileMergeAgg.Holder =
    if (bytes.isEmpty) new QuantileMergeAgg.Holder(null)
    else new QuantileMergeAgg.Holder(QuantileSketch.deserialize(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileMergeAgg =
    copy(child = newChild)
}

object QuantileMergeAgg {
  /** Mutable adopt-on-first-input buffer (k is carried by the data). */
  final class Holder(var s: QuantileSketch)
}

/** Scalar read of a sketch binary: quantiles at the given rank
  * fractions, each an actual stored value (smallest with cumulative
  * weight ≥ ⌈q·N⌉). Runs once per GROUP row — K-bounded, never on the
  * value stream — so `CodegenFallback` costs nothing measurable here
  * (the hot path is the aggregate, which is imperative by design). */
case class SketchQuantilesExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sketch_quantiles requires (binary, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_sketch_quantiles"

  override def nullSafeEval(sketch: Any, qs: Any): Any = {
    val s = QuantileSketch.deserialize(sketch.asInstanceOf[Array[Byte]])
    val fracs = qs.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(s.quantiles(fracs.toIndexedSeq))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SketchQuantilesExpr =
    copy(left = newLeft, right = newRight)
}

/** Misra–Gries summary as a [[TypedImperativeAggregate]]: the buffer is
  * a k-bounded counter map, merged with the summary-combination rule
  * (sum counts, then subtract the (k+1)-th largest and drop ≤ 0),
  * which preserves the N/(k+1) error bound across any merge tree —
  * partial aggregation and AQE-reordered merges included. Update-side
  * overflow uses the classic decrement-all step, amortized O(1) per
  * observation (each decrement event spends O(k) but retires k
  * counts). */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "heavyHitters requires k > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters requires a string column, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String]
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < k =>
        buf.update(key.clone(), 1L) // row-backed bytes: copy before keeping
      case None => // full and new: the decrement-all step
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.foreach { case (t, c) =>
          if (c == 1L) dead += t else buf.update(t, c - 1) }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop ≤ 0:
      // at most k strictly-greater entries survive
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.foreach { case (t, c) =>
        if (c - cut <= 0L) dead += t else buf.update(t, c - cut) }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((ta, ca), (tb, cb)) =>
      if (ca != cb) ca > cb else ta.compareTo(tb) < 0 }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(t, c) }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    var n = 4
    buf.foreach { case (t, _) => n += 4 + t.numBytes() + 8 }
    val bb = ByteBuffer.allocate(n)
    bb.putInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val size = bb.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < size) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

/** Bounded min-list: the `cap` SMALLEST long values plus the TOTAL
  * count, as one mergeable aggregate — the memory-safe form of
  * `(count(*), sort_array(collect_list(x)))` for consumers that DROP
  * over-cap groups (LSH df caps). The buffer never holds more than
  * `cap` longs however large the group, so one degenerate hot bucket
  * (df ≫ cap) costs O(cap) aggregate state instead of an unspillable
  * group-sized array row; for groups with ≤ cap values the list is
  * COMPLETE and ascending-sorted, i.e. bit-identical to the
  * collect_list form it replaces (SketchSpec pins the equivalence on
  * an over-cap synthetic bucket). Returns
  * struct(df: bigint, ds: array<bigint>). */
object BoundedMinListAgg {
  final class Buf(val cap: Int) {
    var n: Long = 0L // total observations
    var size: Int = 0 // valid prefix of arr, ascending
    val arr: Array[Long] = new Array[Long](cap)
    def add(v: Long): Unit = {
      n += 1
      if (size == cap && v >= arr(size - 1)) return
      var lo = 0; var hi = size // binary search: first index with arr(i) > v
      while (lo < hi) { // upper bound keeps insertion stable for dups
        val mid = (lo + hi) >>> 1
        if (arr(mid) <= v) lo = mid + 1 else hi = mid
      }
      val last = math.min(size, cap - 1) // room after shifting
      System.arraycopy(arr, lo, arr, lo + 1, last - lo)
      arr(lo) = v
      if (size < cap) size += 1
    }
  }
}

case class BoundedMinListAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMinListAgg.Buf]
  with UnaryLike[Expression] {

  require(cap > 0, "boundedMinList requires cap > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bounded_min_list requires a bigint column, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("df", LongType, nullable = false),
    StructField("ds", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bounded_min_list"

  override def createAggregationBuffer(): BoundedMinListAgg.Buf =
    new BoundedMinListAgg.Buf(cap)

  override def update(buf: BoundedMinListAgg.Buf,
      input: InternalRow): BoundedMinListAgg.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedMinListAgg.Buf,
      other: BoundedMinListAgg.Buf): BoundedMinListAgg.Buf = {
    // merge two ascending prefixes, keep the cap smallest
    val out = new Array[Long](math.min(cap, buf.size + other.size))
    var i = 0; var j = 0; var k = 0
    while (k < out.length) {
      if (j >= other.size || (i < buf.size && buf.arr(i) <= other.arr(j))) {
        out(k) = buf.arr(i); i += 1
      } else { out(k) = other.arr(j); j += 1 }
      k += 1
    }
    System.arraycopy(out, 0, buf.arr, 0, out.length)
    buf.size = out.length
    buf.n += other.n
    buf
  }

  override def eval(buf: BoundedMinListAgg.Buf): Any =
    InternalRow(buf.n,
      new GenericArrayData(java.util.Arrays.copyOf(buf.arr, buf.size)))

  override def serialize(buf: BoundedMinListAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + 8 * buf.size)
    bb.putLong(buf.n); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedMinListAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BoundedMinListAgg.Buf(cap)
    buf.n = bb.getLong
    buf.size = bb.getInt
    var i = 0
    while (i < buf.size) { buf.arr(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinListAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinListAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedMinListAgg =
    copy(child = newChild)
}
