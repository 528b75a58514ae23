package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding-similarity hot loops
  * ([[graft.pipeline.Similarity]]): a fused double dot product and a
  * fused 16-plane LSH signature.
  *
  * The composed formulation — `aggregate(zip_with(x, y, _*_), 0, _+_)`
  * — materializes the zipped product array and folds it interpreted
  * (higher-order functions are CodegenFallback). k-means assignment
  * computes N·K of these per Lloyd round, brute-force top-k N·Q; both
  * are the multiplicative hot path of the ANN stack at 100 TB.
  *
  * Bit-compatibility contract (PropertySpec asserts it): products and
  * additions run in IEEE double in the same element order as the fold,
  * so cos values are bit-identical to both the HOF formulation and the
  * DuckDB oracle's sequential list fold. Null/length semantics mirror
  * `zip_with` + `aggregate`: mismatched lengths or any null element ⇒
  * null result (zip_with pads with null, the fold then absorbs it). */
object VectorExprs {

  /** Σ double(x_i)·double(y_i) in index order; null on length mismatch
    * or any null element. Element types may be any numeric; each is
    * widened to double exactly as `cast("double")` does. */
  def dot(x: Column, y: Column): Column =
    GraftBridge.column(DotProductExpr(GraftBridge.expression(x), GraftBridge.expression(y)))

  /** Double-precision cosine from three fused dots — the same formula
    * (and the same doubles) as [[graft.pipeline.Similarity.cosine]]. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** All-plane LSH signature: bit k of the result = (⟨x, plane_k⟩ ≥ 0),
    * integer arithmetic, one pass over the vector. */
  def lshSign(x: Column, planes: Seq[Seq[Long]]): Column =
    GraftBridge.column(LshSignExpr(GraftBridge.expression(x), planes))

  /** struct(cid, cos) of the nearest centroid by cosine — ONE map-side
    * pass per vector against the (always tiny, driver-held) centroid
    * set, replacing the crossJoin→window pattern that materializes and
    * sorts N·K rows. Tie-break (cos desc, cid asc) and NaN-first
    * ordering match `row_number over (order by cos desc, cid)`. */
  def nearestCentroid(vec: Column, cents: Seq[(Long, Seq[Double])]): Column =
    GraftBridge.column(NearestCentroidExpr(GraftBridge.expression(vec),
      cents.map(_._1), cents.map(_._2)))

  /** struct(fcid, cos) of the nearest centroid in a RUNTIME cell
    * column (`array<struct<fcid, cent>>`, fcid-ascending) — the
    * two-level k-means assignment kernel; see [[NearestInCellExpr]]. */
  def nearestInCell(vec: Column, cells: Column): Column =
    GraftBridge.column(NearestInCellExpr(GraftBridge.expression(vec),
      GraftBridge.expression(cells)))

  /** struct(code, d) — all M product-quantization subspace argmins in
    * one pass over the vector; see [[PqEncodeExpr]]. `books(sub)` =
    * cid-ascending (cid, codeword) pairs. */
  def pqEncode(vec: Column,
      books: Seq[Seq[(Long, Seq[Double])]]): Column =
    GraftBridge.column(PqEncodeExpr(GraftBridge.expression(vec),
      books.map(_.map(_._1)), books.map(_.map(_._2))))

  /** Elementwise sum of an `array<bigint>` column as ONE aggregate —
    * the k-means/PQ Lloyd update's per-dim sums without unrolling Dim
    * `sum(getItem(i))` columns into the plan; see [[LongArraySumAgg]].
    * Long addition is associative and exact, so the result is
    * bit-identical to the per-dim columns whatever order partials
    * combine in. */
  def arraySumLong(c: Column): Column =
    GraftBridge.column(
      LongArraySumAgg(GraftBridge.expression(c)).toAggregateExpression())

  /** Per-query ADC lookup table — the M·Ksub <query subvector,
    * codeword> dots as one fused pass; see [[PqLutExpr]]. Dead
    * codeword slots hold 0.0. `books(sub)` = cid-ascending
    * (cid, codeword) pairs, cids in [0, ksub). */
  def pqLut(qq: Column, books: Seq[Seq[(Long, Seq[Double])]],
      ksub: Int): Column =
    GraftBridge.column(PqLutExpr(GraftBridge.expression(qq),
      books.map(_.map(_._1)), books.map(_.map(_._2)), ksub))

  /** SemDeDup senior-keeper rule over ONE collected chunk — see
    * [[ChunkKeepersExpr]]. `xs` = vec_id-ascending
    * `array<struct<vec_id, embedding>>`; returns the kept subset. */
  def chunkKeepers(xs: Column, eps: Double): Column =
    GraftBridge.column(ChunkKeepersExpr(GraftBridge.expression(xs), eps))

  /** Accepts primitive numeric element types only — DecimalType is
    * rejected at ANALYSIS time because the fused loops read elements
    * with primitive getters (a decimal array would otherwise crash at
    * runtime). */
  private[functions] def numericElem(name: String, dt: DataType): TypeCheckResult =
    dt match {
      case ArrayType(_: DecimalType, _) => TypeCheckResult.TypeCheckFailure(
        s"$name does not support array<decimal> input; cast to double first")
      case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<numeric> input, got ${other.catalogString}")
    }

  /** Java source for `(double) <arr>.get<T>(<i>)` per element type. */
  private[functions] def getAsDouble(arr: String, i: String, dt: DataType): String =
    dt match {
      case ByteType => s"(double) $arr.getByte($i)"
      case ShortType => s"(double) $arr.getShort($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType => s"(double) $arr.getLong($i)"
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case other => throw new IllegalStateException(s"non-numeric element $other")
    }

  private[functions] def evalAsDouble(arr: ArrayData, i: Int, dt: DataType): Double =
    dt match {
      case ByteType => arr.getByte(i).toDouble
      case ShortType => arr.getShort(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case other => throw new IllegalStateException(s"non-numeric element $other")
    }
}

/** Fused sequential-order double dot product over two numeric arrays. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VectorExprs.numericElem(prettyName, left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VectorExprs.numericElem(prettyName, right.dataType)
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val ya = b.asInstanceOf[ArrayData]
    val n = xa.numElements()
    if (ya.numElements() != n) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xa.isNullAt(i) || ya.isNullAt(i)) return null
      acc += VectorExprs.evalAsDouble(xa, i, lt) * VectorExprs.evalAsDouble(ya, i, rt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val lx = VectorExprs.getAsDouble(xa, i, elemType(left))
      val ry = VectorExprs.getAsDouble(ya, i, elemType(right))
      s"""
         |int $n = $xa.numElements();
         |boolean $bad = ($ya.numElements() != $n);
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($xa.isNullAt($i) || $ya.isNullAt($i)) { $bad = true; break; }
         |    $acc += $lx * $ry;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Nearest centroid by double-precision cosine, centroids fixed at
  * plan time (k-means rounds re-plan with fresh centroids — the same
  * driver round-trip the update step already makes). Per vector:
  * the self-norm once, then one dot per centroid in cid-ascending
  * order; a candidate replaces the best only when strictly better, so
  * ties keep the lowest cid. NaN cosines (zero-norm vectors) rank
  * ABOVE numbers, mirroring Spark's descending sort where NaN is
  * greatest. All products/sums are IEEE doubles in index order —
  * bit-identical to the dot/cosine fold formulation and the oracle.
  * A vector containing a null element OR whose length differs from the
  * centroid dim yields a NULL result (malformed input — the dot-fold
  * formulations this replaces return null on length mismatch, because
  * `zip_with` pads with null and the fold absorbs it; truncating would
  * silently assign a wrong-dimension vector). */
case class NearestCentroidExpr(child: Expression,
    cids: Seq[Long], cents: Seq[Seq[Double]])
    extends UnaryExpression {

  private val k = cids.length
  private val dim = cents.headOption.map(_.length).getOrElse(0)
  require(k > 0 && cents.length == k && cents.forall(_.length == dim),
    "centroid matrix must be non-empty and rectangular")
  require(cids.zip(cids.drop(1)).forall(p => p._1 < p._2),
    "centroids must be sorted by cid (tie-break contract)")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.numericElem(prettyName, child.dataType)
  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val cidArr: Array[Long] = cids.toArray
  /** row-major K×dim centroid matrix */
  @transient private lazy val flat: Array[Double] = cents.flatten.toArray
  /** per-centroid self-norms, same sequential fold as sqrt(dot(c,c)) */
  @transient private lazy val norms: Array[Double] = cents.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }.toArray

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null // wrong-dim vector
    val n = dim
    val et = elemType
    var qacc = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null // malformed vector: no assignment
      val x = VectorExprs.evalAsDouble(arr, i, et)
      qacc += x * x
      i += 1
    }
    val qn = math.sqrt(qacc)
    var bestCid = 0L
    var bestCos = 0.0
    var c = 0
    while (c < k) {
      var dacc = 0.0
      i = 0
      while (i < n) {
        dacc += VectorExprs.evalAsDouble(arr, i, et) * flat(c * dim + i)
        i += 1
      }
      val cos = dacc / (qn * norms(c))
      val better =
        if (c == 0) true
        else if (cos.isNaN != bestCos.isNaN) cos.isNaN
        else cos > bestCos
      if (better) { bestCid = cidArr(c); bestCos = cos }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestCid, bestCos))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cRef = ctx.addReferenceObj("ncCents", flat, "double[]")
      val nRef = ctx.addReferenceObj("ncNorms", norms, "double[]")
      val idRef = ctx.addReferenceObj("ncCids", cidArr, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val qacc = ctx.freshName("qacc")
      val qn = ctx.freshName("qn")
      val dacc = ctx.freshName("dacc")
      val cos = ctx.freshName("cos")
      val bestCid = ctx.freshName("bestCid")
      val bestCos = ctx.freshName("bestCos")
      val better = ctx.freshName("better")
      val x = ctx.freshName("x")
      val get = VectorExprs.getAsDouble(arr, i, elemType)
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $dim;
         |boolean $bad = ($arr.numElements() != $dim);
         |double $qacc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($arr.isNullAt($i)) { $bad = true; break; }
         |    double $x = $get;
         |    $qacc += $x * $x;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else {
         |  double $qn = java.lang.Math.sqrt($qacc);
         |  long $bestCid = 0L;
         |  double $bestCos = 0.0;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $dacc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dacc += $get * $cRef[$c * $dim + $i];
         |    }
         |    double $cos = $dacc / ($qn * $nRef[$c]);
         |    boolean $better;
         |    if ($c == 0) { $better = true; }
         |    else if (Double.isNaN($cos) != Double.isNaN($bestCos)) {
         |      $better = Double.isNaN($cos);
         |    } else { $better = $cos > $bestCos; }
         |    if ($better) { $bestCid = $idRef[$c]; $bestCos = $cos; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{$bestCid, $bestCos});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

/** Fused LSH signature: for each plane k (±1 entries, fixed matrix),
  * bit k = (Σ x_i·plane_k_i ≥ 0), all planes accumulated in one pass
  * over the (long-quantized) vector. Null elements OR a length other
  * than the plane width ⇒ null, matching the per-plane zip_with fold
  * it replaces (`zip_with` pads a mismatched pair with null and the
  * fold absorbs it — truncating would sign a wrong-dim vector). */
case class LshSignExpr(child: Expression, planes: Seq[Seq[Long]])
    extends UnaryExpression {

  private val nPlanes = planes.length
  private val dim = planes.headOption.map(_.length).getOrElse(0)
  require(nPlanes > 0 && planes.forall(_.length == dim),
    "planes must be a non-empty rectangular matrix")

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.checkLongArray(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_sign"

  // flattened row-major so codegen indexes one long[]
  @transient private lazy val flat: Array[Long] = planes.flatten.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null // wrong-dim vector
    val n = dim
    val sums = new Array[Long](nPlanes)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val x = arr.getLong(i)
      var k = 0
      while (k < nPlanes) {
        sums(k) += x * flat(k * dim + i)
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < nPlanes) {
      if (sums(k) >= 0) sig |= 1L << k
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val pRef = ctx.addReferenceObj("lshPlanes", flat, "long[]")
      val sums = ctx.freshName("sums")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val x = ctx.freshName("x")
      val sig = ctx.freshName("sig")
      val bad = ctx.freshName("bad")
      s"""
         |long[] $sums = new long[$nPlanes];
         |int $n = $dim;
         |boolean $bad = ($arr.numElements() != $dim);
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($arr.isNullAt($i)) { $bad = true; break; }
         |    long $x = $arr.getLong($i);
         |    for (int $k = 0; $k < $nPlanes; $k++) {
         |      $sums[$k] += $x * $pRef[$k * $dim + $i];
         |    }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else {
         |  long $sig = 0L;
         |  for (int $k = 0; $k < $nPlanes; $k++) {
         |    if ($sums[$k] >= 0L) $sig |= 1L << $k;
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignExpr =
    copy(child = newChild)
}

/** Nearest centroid by double-precision cosine where the centroid set
  * arrives as a RUNTIME COLUMN — `array<struct<fcid: long, cent:
  * array<double>>>` — instead of plan-time constants. This is the
  * assignment kernel of the TWO-LEVEL k-means tier
  * ([[graft.pipeline.Similarity.twoLevelAssign]]): at the K ≈ 10⁶
  * centroids that 10⁹-vector SemDeDup needs, a flat
  * [[NearestCentroidExpr]] would bounce ~GB of centroid state through
  * the driver into every task AND linear-scan all K per row. Here each
  * row carries only ITS coarse cell's fine centroids (joined in on the
  * coarse cid), so the per-row scan is K/√K-bounded and the centroid
  * state stays a distributed frame end to end.
  *
  * Contract (mirrors [[NearestCentroidExpr]] and the DuckDB window
  * `row_number() OVER (ORDER BY cos DESC, fcid)` the oracle replays):
  * IEEE doubles in element order, strictly-better replacement so ties
  * keep the EARLIEST entry, NaN cosines rank above numbers. The cell
  * array must be fcid-ascending (callers build it with `sort_array`
  * over struct(fcid, cent), which sorts on the leading field) — the
  * tie-break contract is positional. Null/malformed vector, empty cell
  * array, or any malformed centroid entry ⇒ null result. */
case class NearestInCellExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.numericElem(prettyName, left.dataType) match {
      case TypeCheckResult.TypeCheckSuccess => right.dataType match {
        case ArrayType(StructType(Array(
            StructField(_, LongType, _, _),
            StructField(_, ArrayType(DoubleType, _), _, _))), _) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<struct<fcid: bigint, cent: " +
            s"array<double>>> cells, got ${other.catalogString}")
      }
      case fail => fail
    }
  override def dataType: DataType = StructType(Seq(
    StructField("fcid", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_in_cell"

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(vecAny: Any, cellsAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    val cells = cellsAny.asInstanceOf[ArrayData]
    val k = cells.numElements()
    if (k == 0) return null
    val dim = vec.numElements()
    val et = elemType
    var qacc = 0.0
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      val x = VectorExprs.evalAsDouble(vec, i, et)
      qacc += x * x
      i += 1
    }
    val qn = math.sqrt(qacc)
    var bestFcid = 0L
    var bestCos = 0.0
    var c = 0
    while (c < k) {
      if (cells.isNullAt(c)) return null
      val cell = cells.getStruct(c, 2)
      if (cell.isNullAt(1)) return null
      val cent = cell.getArray(1)
      if (cent.numElements() != dim) return null
      var dacc = 0.0
      var cacc = 0.0
      i = 0
      while (i < dim) {
        if (cent.isNullAt(i)) return null
        val y = cent.getDouble(i)
        dacc += VectorExprs.evalAsDouble(vec, i, et) * y
        cacc += y * y
        i += 1
      }
      val cos = dacc / (qn * math.sqrt(cacc))
      val better =
        if (c == 0) true
        else if (cos.isNaN != bestCos.isNaN) cos.isNaN
        else cos > bestCos
      if (better) { bestFcid = cell.getLong(0); bestCos = cos }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestFcid, bestCos))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cells) => {
      val k = ctx.freshName("k")
      val dim = ctx.freshName("dim")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val qacc = ctx.freshName("qacc")
      val qn = ctx.freshName("qn")
      val dacc = ctx.freshName("dacc")
      val cacc = ctx.freshName("cacc")
      val cos = ctx.freshName("cos")
      val bestFcid = ctx.freshName("bestFcid")
      val bestCos = ctx.freshName("bestCos")
      val better = ctx.freshName("better")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val cell = ctx.freshName("cell")
      val cent = ctx.freshName("cent")
      val bad = ctx.freshName("bad")
      val get = VectorExprs.getAsDouble(vec, i, elemType)
      s"""
         |int $k = $cells.numElements();
         |int $dim = $vec.numElements();
         |boolean $bad = ($k == 0);
         |double $qacc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($vec.isNullAt($i)) { $bad = true; break; }
         |    double $x = $get;
         |    $qacc += $x * $x;
         |  }
         |}
         |long $bestFcid = 0L;
         |double $bestCos = 0.0;
         |if (!$bad) {
         |  double $qn = java.lang.Math.sqrt($qacc);
         |  for (int $c = 0; $c < $k; $c++) {
         |    if ($cells.isNullAt($c)) { $bad = true; break; }
         |    org.apache.spark.sql.catalyst.InternalRow $cell = $cells.getStruct($c, 2);
         |    if ($cell.isNullAt(1)) { $bad = true; break; }
         |    org.apache.spark.sql.catalyst.util.ArrayData $cent = $cell.getArray(1);
         |    if ($cent.numElements() != $dim) { $bad = true; break; }
         |    double $dacc = 0.0;
         |    double $cacc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      if ($cent.isNullAt($i)) { $bad = true; break; }
         |      double $y = $cent.getDouble($i);
         |      $dacc += $get * $y;
         |      $cacc += $y * $y;
         |    }
         |    if ($bad) break;
         |    double $cos = $dacc / ($qn * java.lang.Math.sqrt($cacc));
         |    boolean $better;
         |    if ($c == 0) { $better = true; }
         |    else if (Double.isNaN($cos) != Double.isNaN($bestCos)) {
         |      $better = Double.isNaN($cos);
         |    } else { $better = $cos > $bestCos; }
         |    if ($better) { $bestFcid = $cell.getLong(0); $bestCos = $cos; }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{$bestFcid, $bestCos});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestInCellExpr =
    copy(left = newLeft, right = newRight)
}

/** Fused product-quantization encoder: for each of the M subspaces of
  * the (integer-quantized) input vector, the squared-L2-nearest
  * codeword — ALL M argmins in one pass over the vector, against the
  * driver-held codebooks (M·Ksub·Dsub doubles, plan-time constants).
  *
  * Replaces the per-subspace `array_min(transform(...))` HOF stack in
  * [[graft.pipeline.Similarity]]'s PQ tier: higher-order functions are
  * CodegenFallback and materialize a Ksub-struct array per subspace
  * per row — the multiplicative hot path of codebook training (M·Ksub
  * distances × N rows × Lloyd rounds) and corpus encode. Distances
  * accumulate `(x−y)²` in IEEE double in index order, candidates scan
  * cid-ascending with strict-improvement replacement — bit-identical
  * to the HOF formulation and the DuckDB oracle's
  * `ORDER BY d ASC, cid` window (PqSpec pins the equivalence).
  *
  * Returns struct(code: array<long>, d: array<double>) — per-subspace
  * chosen cids and their squared distances. Null element or a length
  * other than M·Dsub ⇒ null result (the malformed-input convention of
  * [[NearestCentroidExpr]]). Subspace codebooks may hold differing
  * (≤ Ksub) live codeword counts — empty codewords drop during
  * training, exactly as flat k-means drops empty clusters. */
case class PqEncodeExpr(child: Expression,
    subCids: Seq[Seq[Long]], subCents: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val m = subCids.length
  private val dsub = subCents.headOption.flatMap(_.headOption)
    .map(_.length).getOrElse(0)
  private val dim = m * dsub
  require(m > 0 && subCents.length == m &&
    subCids.zip(subCents).forall(p => p._1.length == p._2.length) &&
    subCents.forall(_.forall(_.length == dsub)),
    "codebooks must be non-empty and rectangular per subspace")
  require(subCids.forall(s => s.zip(s.drop(1)).forall(p => p._1 < p._2)),
    "codewords must be sorted by cid per subspace (tie-break contract)")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.numericElem(prettyName, child.dataType)
  override def dataType: DataType = StructType(Seq(
    StructField("code", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("d", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  /** candidate-count prefix offsets: sub s scans [off(s), off(s+1)) */
  @transient private lazy val offs: Array[Int] =
    subCids.scanLeft(0)(_ + _.length).toArray
  @transient private lazy val cidArr: Array[Long] =
    subCids.flatten.toArray
  /** row-major (global candidate)×dsub codeword matrix */
  @transient private lazy val flat: Array[Double] =
    subCents.flatten.flatten.toArray

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val et = elemType
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val code = new Array[Long](m)
    val dist = new Array[Double](m)
    var s = 0
    while (s < m) {
      var bestCid = 0L
      var bestD = 0.0
      var first = true
      var c = offs(s)
      while (c < offs(s + 1)) {
        var dacc = 0.0
        i = 0
        while (i < dsub) {
          val x = VectorExprs.evalAsDouble(arr, s * dsub + i, et)
          val diff = x - flat(c * dsub + i)
          dacc += diff * diff
          i += 1
        }
        if (first || dacc < bestD) { bestCid = cidArr(c); bestD = dacc }
        first = false
        c += 1
      }
      code(s) = bestCid
      dist(s) = bestD
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        new org.apache.spark.sql.catalyst.util.GenericArrayData(code),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(dist)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cRef = ctx.addReferenceObj("pqCents", flat, "double[]")
      val idRef = ctx.addReferenceObj("pqCids", cidArr, "long[]")
      val offRef = ctx.addReferenceObj("pqOffs", offs, "int[]")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val dacc = ctx.freshName("dacc")
      val diff = ctx.freshName("diff")
      val bestCid = ctx.freshName("bestCid")
      val bestD = ctx.freshName("bestD")
      val first = ctx.freshName("first")
      val code = ctx.freshName("code")
      val dist = ctx.freshName("dist")
      val bad = ctx.freshName("bad")
      val xi = ctx.freshName("xi")
      val getAt = VectorExprs.getAsDouble(arr, xi, elemType)
      s"""
         |boolean $bad = ($arr.numElements() != $dim);
         |if (!$bad) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($arr.isNullAt($i)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else {
         |  long[] $code = new long[$m];
         |  double[] $dist = new double[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    long $bestCid = 0L;
         |    double $bestD = 0.0;
         |    boolean $first = true;
         |    for (int $c = $offRef[$s]; $c < $offRef[$s + 1]; $c++) {
         |      double $dacc = 0.0;
         |      for (int $i = 0; $i < $dsub; $i++) {
         |        int $xi = $s * $dsub + $i;
         |        double $diff = ($getAt) - $cRef[$c * $dsub + $i];
         |        $dacc += $diff * $diff;
         |      }
         |      if ($first || $dacc < $bestD) {
         |        $bestCid = $idRef[$c]; $bestD = $dacc;
         |      }
         |      $first = false;
         |    }
         |    $code[$s] = $bestCid;
         |    $dist[$s] = $bestD;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($code),
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($dist)});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Elementwise sum of `array<bigint>` rows as one
  * [[TypedImperativeAggregate]] — the Lloyd-update aggregate.
  *
  * The k-means/PQ centroid updates previously unrolled Dim parallel
  * `sum(qv[i])` columns into every round's plan: correct and map-side
  * combined, but each Lloyd round re-analyzed and re-optimized a
  * ~4·Dim-expression tree on the DRIVER — profiled as the dominant
  * wall−jobs gap of the iterative sim_* queries (the jobs themselves
  * are milliseconds at any one round). This aggregate carries the same
  * per-dim long sums as ONE plan node, so a round's analyzed tree is a
  * dozen expressions regardless of Dim.
  *
  * Exactness: long addition is associative/commutative and the
  * quantized-domain sums stay far inside 2⁶³ (|qv_i| ≤ ~10⁶ · 10⁴),
  * so partial/final combine order cannot change the result — the
  * emitted sums are bit-identical to the per-dim `sum` columns and the
  * DuckDB twins' `sum(qv[i])`. Null handling mirrors `sum`: null
  * ARRAYS are skipped; a group with no non-null input evaluates to
  * null. Null ELEMENTS are rejected (quantized vectors never carry
  * them — malformed input fails loudly rather than skewing a
  * centroid). Mixed lengths within a group are rejected the same way. */
case class LongArraySumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongArraySumAgg.Buf]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_array_sum_long requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_array_sum_long"

  override def createAggregationBuffer(): LongArraySumAgg.Buf =
    new LongArraySumAgg.Buf(null)

  override def update(buf: LongArraySumAgg.Buf, input: InternalRow)
      : LongArraySumAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Long](n)
      require(buf.sums.length == n,
        s"graft_array_sum_long: mixed array lengths (${buf.sums.length} vs $n)")
      var i = 0
      while (i < n) {
        require(!arr.isNullAt(i),
          "graft_array_sum_long: null element in input array")
        buf.sums(i) += arr.getLong(i)
        i += 1
      }
    }
    buf
  }
  override def merge(buf: LongArraySumAgg.Buf, other: LongArraySumAgg.Buf)
      : LongArraySumAgg.Buf = {
    if (other.sums != null) {
      if (buf.sums == null) buf.sums = other.sums.clone()
      else {
        require(buf.sums.length == other.sums.length,
          s"graft_array_sum_long: mixed array lengths " +
            s"(${buf.sums.length} vs ${other.sums.length})")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
      }
    }
    buf
  }
  override def eval(buf: LongArraySumAgg.Buf): Any =
    if (buf.sums == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.sums)

  // a leading presence byte keeps the null (no-input) buffer distinct
  // from a legitimate ZERO-LENGTH sums array across the serialization
  // boundary — without it an empty-array group would evaluate to []
  // un-shuffled but NULL after a spill, and would silently bypass the
  // mixed-length check on merge
  override def serialize(buf: LongArraySumAgg.Buf): Array[Byte] =
    if (buf.sums == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(1 + buf.sums.length * 8)
      bb.put(1.toByte)
      buf.sums.foreach(bb.putLong)
      bb.array()
    }
  override def deserialize(bytes: Array[Byte]): LongArraySumAgg.Buf =
    if (bytes.isEmpty) new LongArraySumAgg.Buf(null)
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.get() // presence byte
      val out = new Array[Long]((bytes.length - 1) / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong(); i += 1 }
      new LongArraySumAgg.Buf(out)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongArraySumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongArraySumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongArraySumAgg =
    copy(child = newChild)
}

object LongArraySumAgg {
  /** Adopt-on-first-input running sums (dim is carried by the data). */
  final class Buf(var sums: Array[Long])
}

/** Per-query ADC lookup table as one fused expression: a flat
  * M·Ksub `array<double>` where slot s·Ksub+c holds the
  * <query subvector s, codeword c> dot (0.0 for dead codeword slots —
  * no live code ever indexes them; codebooks may hold fewer than Ksub
  * live codewords after empty-cluster drops during training).
  *
  * Replaces the composed per-slot HOF stack
  * (M·Ksub × `aggregate(zip_with(slice(...), typedlit(cent), ·*·))`)
  * on the query side of the ADC serve paths: that formulation builds a
  * ~2000-node projection tree whose ANALYSIS + compile dominated
  * sim_topk_pq's wall−jobs gap, and its HOFs are CodegenFallback
  * besides. Dots accumulate `(double) qq[s·dsub+i] · cent[i]` in IEEE
  * double in index order with a 0.0 init — bit-identical to the HOF
  * fold (PqSpec pins the equivalence). Null/malformed input (null
  * vector, null element, length ≠ M·Dsub) ⇒ null result, the
  * [[NearestCentroidExpr]] convention. */
case class PqLutExpr(child: Expression,
    subCids: Seq[Seq[Long]], subCents: Seq[Seq[Seq[Double]]], ksub: Int)
    extends UnaryExpression {

  private val m = subCids.length
  private val dsub = subCents.headOption.flatMap(_.headOption)
    .map(_.length).getOrElse(0)
  private val dim = m * dsub
  require(m > 0 && ksub > 0 && subCents.length == m &&
    subCids.zip(subCents).forall(p => p._1.length == p._2.length) &&
    subCents.forall(_.forall(_.length == dsub)),
    "codebooks must be non-empty and rectangular per subspace")
  require(subCids.forall(s => s.forall(c => c >= 0 && c < ksub)),
    "codeword cids must lie in [0, ksub)")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.numericElem(prettyName, child.dataType)
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_lut"

  /** row-major (s·Ksub+c)×dsub codeword matrix; dead slots zero */
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](m * ksub * dsub)
    subCids.zip(subCents).zipWithIndex.foreach { case ((cids, cents), s) =>
      cids.zip(cents).foreach { case (c, cent) =>
        var i = 0
        while (i < dsub) {
          out((s * ksub + c.toInt) * dsub + i) = cent(i)
          i += 1
        }
      }
    }
    out
  }
  /** live(s·Ksub+c) — dead slots emit 0.0 without a dot */
  @transient private lazy val live: Array[Boolean] = {
    val out = new Array[Boolean](m * ksub)
    subCids.zipWithIndex.foreach { case (cids, s) =>
      cids.foreach(c => out(s * ksub + c.toInt) = true)
    }
    out
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val et = elemType
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val slot = s * ksub + c
        if (live(slot)) {
          var acc = 0.0
          i = 0
          while (i < dsub) {
            acc += VectorExprs.evalAsDouble(arr, s * dsub + i, et) *
              flat(slot * dsub + i)
            i += 1
          }
          out(slot) = acc
        }
        c += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cRef = ctx.addReferenceObj("lutCents", flat, "double[]")
      val lRef = ctx.addReferenceObj("lutLive", live, "boolean[]")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val slot = ctx.freshName("slot")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val xi = ctx.freshName("xi")
      val getAt = VectorExprs.getAsDouble(arr, xi, elemType)
      s"""
         |boolean $bad = ($arr.numElements() != $dim);
         |if (!$bad) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($arr.isNullAt($i)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else {
         |  double[] $out = new double[${m * ksub}];
         |  for (int $s = 0; $s < $m; $s++) {
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      int $slot = $s * $ksub + $c;
         |      if ($lRef[$slot]) {
         |        double $acc = 0.0;
         |        for (int $i = 0; $i < $dsub; $i++) {
         |          int $xi = $s * $dsub + $i;
         |          $acc += ($getAt) * $cRef[$slot * $dsub + $i];
         |        }
         |        $out[$slot] = $acc;
         |      }
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** The SemDeDup senior-keeper rule over one COLLECTED chunk: input is
  * a vec_id-ascending `array<struct<vec_id, embedding>>` (one hash
  * chunk of one cluster, `sort_array∘collect_list`), output the subset
  * that survives — element j is dropped iff SOME earlier element i has
  * `cosine(e_i, e_j) >= eps` (all earlier elements are seniors, kept or
  * not — the pairwise rule of the join formulation, not the chained
  * one).
  *
  * This replaces the per-level self-join → `distinct` → anti-join
  * pipeline of [[graft.pipeline.Similarity.semDedupChunkedScoped]]
  * with ONE aggregation: where the join shuffles up to k² pair rows
  * per chunk each carrying BOTH embeddings (2·dim floats), this
  * shuffles each chunk's k rows once and runs the k²/2 cosines in a
  * tight in-memory loop with early exit on the first senior hit —
  * strictly fewer cosine evaluations and two fewer shuffles per
  * refinement level. Group state is one chunk (capTarget × dim
  * floats — the same bound the join's per-cell quadratic already
  * assumed).
  *
  * Bit-compatibility: cosine = dot(a,b)/(sqrt(dot(a,a))·sqrt(dot(b,b)))
  * with every element widened to double and summed in index order —
  * exactly [[DotProductExpr]]'s math, so the kept SET matches the join
  * formulation row for row (PropertySpec asserts it on random chunks).
  * Predicate mirror of Catalyst's `cos >= eps` on doubles: true when
  * the primitive compare holds OR cos is NaN (Spark orders NaN above
  * every double; eps is never NaN). Null/mismatch mirror of the join:
  * a pair whose dot is null (null embedding, null element, length
  * mismatch) never drops anything, and an element with null vec_id is
  * always kept and never drops others (a null join/filter key made
  * both sides of the old predicate unknowable). */
case class ChunkKeepersExpr(child: Expression, eps: Double)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _) if st.length >= 2 =>
      VectorExprs.numericElem(prettyName, st(1).dataType)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<vec_id, embedding>>, got ${other.catalogString}")
  }
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_chunk_keepers"

  private lazy val structType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val embElemType =
    structType(1).dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val nf = structType.length
    // unpack once: embeddings widened to double (null = malformed)
    val embs = new Array[Array[Double]](n)
    val vecNull = new Array[Boolean](n)
    val rows = new Array[InternalRow](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, nf)
      rows(i) = row
      vecNull(i) = row.isNullAt(0)
      if (!row.isNullAt(1)) {
        val ea = row.getArray(1)
        val d = ea.numElements()
        var ok = true
        val v = new Array[Double](d)
        var j = 0
        while (ok && j < d) {
          if (ea.isNullAt(j)) ok = false
          else { v(j) = VectorExprs.evalAsDouble(ea, j, embElemType); j += 1 }
        }
        if (ok) embs(i) = v
      }
      i += 1
    }
    val norms = new Array[Double](n)
    i = 0
    while (i < n) {
      if (embs(i) != null) {
        var acc = 0.0
        var j = 0
        val v = embs(i)
        while (j < v.length) { acc += v(j) * v(j); j += 1 }
        norms(i) = math.sqrt(acc)
      }
      i += 1
    }
    val kept = new scala.collection.mutable.ArrayBuffer[Any](n)
    var b = 0
    while (b < n) {
      var dropped = false
      if (!vecNull(b) && embs(b) != null) {
        var a = 0
        while (!dropped && a < b) {
          if (!vecNull(a) && embs(a) != null &&
              embs(a).length == embs(b).length) {
            val va = embs(a); val vb = embs(b)
            var dab = 0.0
            var j = 0
            while (j < va.length) { dab += va(j) * vb(j); j += 1 }
            val cos = dab / (norms(a) * norms(b))
            if (cos >= eps || java.lang.Double.isNaN(cos)) dropped = true
          }
          a += 1
        }
      }
      if (!dropped) kept += rows(b).copy()
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(kept.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkKeepersExpr =
    copy(child = newChild)
}
