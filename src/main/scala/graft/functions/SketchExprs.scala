package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
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
