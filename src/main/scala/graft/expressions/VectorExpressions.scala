package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * Spark's higher-order array functions (`zip_with` + `aggregate`) are
  * evaluated interpreted — they sit outside whole-stage codegen, so a
  * per-row 64-dim dot product pays lambda-dispatch overhead per element.
  * These expressions generate a tight primitive loop via `doGenCode`
  * (preference order from the build brief: compose built-ins > native
  * Expression > UDF). Both also ship an interpreted `nullSafeEval` so they
  * work under `spark.sql.codegen.factoryMode=NO_CODEGEN`.
  *
  * Semantics notes:
  *  - element count = min(|a|, |b|); null elements are skipped;
  *  - quantized rounding is half-away-from-zero, matching BOTH Spark's
  *    `round()` (BigDecimal HALF_UP: ties away from zero) and DuckDB's
  *    `round()` — oracle-reproducible across engines;
  *  - [[CosineSimilarity]] returns null when either norm is zero.
  */
private[graft] trait VectorPairExpression extends BinaryExpression {
  // DecimalType is excluded on purpose: the generated code reads elements
  // with a primitive (double) cast, which does not compile for Decimal —
  // callers cast decimal arrays to double first.
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: DecimalType, _), _) | (_, ArrayType(_: DecimalType, _)) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName does not support decimal arrays — cast to array<double> first")
    case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two numeric array arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def elemL: DataType = left.dataType.asInstanceOf[ArrayType].elementType
  protected def elemR: DataType = right.dataType.asInstanceOf[ArrayType].elementType

  /** Interpreted accessor: element i as a double. */
  protected def getD(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType   => arr.getFloat(i).toDouble
    case DoubleType  => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case ShortType   => arr.getShort(i).toDouble
    case ByteType    => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }
}

/** Exact integer dot product of two quantized vectors:
  * sum over i of round(a_i * scale) * round(b_i * scale), as a Long.
  * Order-independent integer arithmetic — bit-reproducible across engines
  * and partitionings.
  */
case class QuantizedDot(left: Expression, right: Expression, scale: Int)
    extends VectorPairExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  private def q(x: Double): Long =
    if (x >= 0) math.floor(x * scale + 0.5).toLong else math.ceil(x * scale - 0.5).toLong

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(aa.numElements(), bb.numElements())
    var total = 0L
    var i = 0
    while (i < n) {
      if (!aa.isNullAt(i) && !bb.isNullAt(i))
        total += q(getD(aa, i, elemL)) * q(getD(bb, i, elemR))
      i += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $xa = (double) ${CodeGenerator.getValue(a, elemL, i)};
         |    double $xb = (double) ${CodeGenerator.getValue(b, elemR, i)};
         |    long $qa = $xa >= 0 ? (long) java.lang.Math.floor($xa * $scale + 0.5d)
         |                        : (long) java.lang.Math.ceil($xa * $scale - 0.5d);
         |    long $qb = $xb >= 0 ? (long) java.lang.Math.floor($xb * $scale + 0.5d)
         |                        : (long) java.lang.Math.ceil($xb * $scale - 0.5d);
         |    ${ev.value} += $qa * $qb;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One-pass cosine similarity: dot(a,b) / (||a||·||b||), null when either
  * norm is zero. Replaces three interpreted array folds (dot + two norms)
  * with a single codegen'd loop.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorPairExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(aa.numElements(), bb.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (!aa.isNullAt(i) && !bb.isNullAt(i)) {
        val x = getD(aa, i, elemL); val y = getD(bb, i, elemR)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0d; double $na = 0.0d; double $nb = 0.0d;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $x = (double) ${CodeGenerator.getValue(a, elemL, i)};
         |    double $y = (double) ${CodeGenerator.getValue(b, elemR, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |}
         |if ($na == 0.0d || $nb == 0.0d) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native double dot product with EXACTLY the semantics of the documented
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, +)` fold it replaces (see
  * [[NativeVectorRules]]): a null element or a length mismatch (zip_with
  * pads the shorter array with nulls) yields null — unlike [[QuantizedDot]]
  * and [[CosineSimilarity]], which skip nulls. One codegen'd primitive loop
  * per row instead of interpreted lambda dispatch per element.
  */
case class DotProduct(left: Expression, right: Expression)
    extends VectorPairExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      sum += getD(aa, i, elemL) * getD(bb, i, elemR)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0d;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $sum += ((double) ${CodeGenerator.getValue(a, elemL, i)})
         |            * ((double) ${CodeGenerator.getValue(b, elemR, i)});
         |    }
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All LSH band signatures of a vector in ONE codegen'd pass: for each band,
  * `bitsPerBand` hyperplane sign bits packed into a long; returns
  * `array<bigint>` of length `planes.length / bitsPerBand`. The hyperplane
  * matrix is a driver-side constant shipped once per task via the codegen
  * reference table — the per-row work is a pure fused multiply-add nest, no
  * explode, no aggregate, no shuffle (the former explode + 96-buffer
  * hash-aggregate shape shuffled a row per vector element).
  */
case class LshBandSignatures(child: Expression, planes: Array[Array[Double]],
                             bitsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.nonEmpty && planes.length % bitsPerBand == 0,
    s"planes (${planes.length}) must be a multiple of bitsPerBand ($bitsPerBand)")
  require(planes.forall(_.length == planes(0).length),
    "lsh_band_signatures: all hyperplanes must share one dimension")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_signatures"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: DecimalType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName does not support decimal arrays — cast to array<double> first")
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric array argument, got ${other.catalogString}")
  }

  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  private def nBands: Int = planes.length / bitsPerBand
  private def dim: Int = planes(0).length

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    // A ragged vector would sign a plausible partial signature and land in a
    // wrong-but-believable bucket — fail loudly instead (ADVICE r7
    // convention, same rule as [[SignedIntDots]]/[[PqEncode]]). Callers that
    // tolerate mixed-dimension corpora filter `size(v) === dim` first.
    if (arr.numElements() != dim) throw new IllegalArgumentException(
      s"$prettyName: vector length ${arr.numElements()} != plane dimension $dim")
    val sigs = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var sig = 0L
      var t = 0
      while (t < bitsPerBand) {
        val plane = planes(b * bitsPerBand + t)
        val n = dim
        var dot = 0.0
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) dot += (elem match {
            case FloatType   => arr.getFloat(i).toDouble
            case DoubleType  => arr.getDouble(i)
            case IntegerType => arr.getInt(i).toDouble
            case LongType    => arr.getLong(i).toDouble
            case ShortType   => arr.getShort(i).toDouble
            case ByteType    => arr.getByte(i).toDouble
            case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
            case other => throw new IllegalStateException(s"unsupported element type $other")
          }) * plane(i)
          i += 1
        }
        if (dot > 0) sig |= 1L << t
        t += 1
      }
      sigs(b) = sig
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val sigs = ctx.freshName("sigs")
      val b = ctx.freshName("b")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      val plane = ctx.freshName("plane")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "lsh_band_signatures: vector length " + $v.numElements()
         |      + " != plane dimension $dim");
         |}
         |long[] $sigs = new long[$nBands];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  long $sig = 0L;
         |  for (int $t = 0; $t < $bitsPerBand; $t++) {
         |    double[] $plane = $planesRef[$b * $bitsPerBand + $t];
         |    int $n = $dim;
         |    double $dot = 0.0d;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$v.isNullAt($i)) {
         |        $dot += ((double) ${CodeGenerator.getValue(v, elem, i)}) * $plane[$i];
         |      }
         |    }
         |    if ($dot > 0) $sig |= 1L << $t;
         |  }
         |  $sigs[$b] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer twin of [[LshBandSignatures]] for the ORACLE-PORTABLE LSH path:
  * ±1 sign planes over an integer (quantized) vector, bit rule `dot >= 0`
  * (DuckDB's `sum(...) >= 0` — note [[LshBandSignatures]] uses `> 0`), all
  * arithmetic exact in Long. Composing this from element_at chains instead
  * generates code janino refuses to compile (hundreds of terms), and HOF
  * folds run interpreted — this expression is one tight generated loop.
  */
case class IntLshBandSignatures(child: Expression, signs: Array[Array[Int]],
                                bitsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(bitsPerBand >= 1 && bitsPerBand <= 64,
    s"bitsPerBand ($bitsPerBand) must be in [1, 64] — `1L << t` wraps past 64")
  require(signs.nonEmpty && signs.length % bitsPerBand == 0,
    s"signs (${signs.length}) must be a multiple of bitsPerBand ($bitsPerBand)")
  require(signs.forall(_.length == signs(0).length),
    "int_lsh_band_signatures: all sign planes must share one dimension")

  // Fail-loudly on ragged input (ADVICE r7): a vector shorter or longer
  // than the plane dimension used to silently truncate the dot to the
  // common prefix, yielding a plausible-but-wrong bucket. Callers filter
  // size(vec)===dim today, but a future caller that forgets must get an
  // error, not bad buckets — matching the convention elsewhere.
  private def dim: Int = signs(0).length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "int_lsh_band_signatures"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType | ShortType | ByteType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral array argument, got ${other.catalogString}")
  }

  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  private def nBands: Int = signs.length / bitsPerBand

  private def getL(arr: ArrayData, i: Int): Long = elem match {
    case IntegerType => arr.getInt(i).toLong
    case LongType    => arr.getLong(i)
    case ShortType   => arr.getShort(i).toLong
    case ByteType    => arr.getByte(i).toLong
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) throw new IllegalArgumentException(
      s"$prettyName: vector length ${arr.numElements()} != plane dimension $dim")
    val sigs = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var sig = 0L
      var t = 0
      while (t < bitsPerBand) {
        val s = signs(b * bitsPerBand + t)
        val n = s.length
        var dot = 0L
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) dot += getL(arr, i) * s(i)
          i += 1
        }
        if (dot >= 0) sig |= 1L << t
        t += 1
      }
      sigs(b) = sig
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "int[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val sigs = ctx.freshName("sigs")
      val b = ctx.freshName("b")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      val s = ctx.freshName("s")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "int_lsh_band_signatures: vector length " + $v.numElements() +
         |    " != plane dimension " + $dim);
         |}
         |long[] $sigs = new long[$nBands];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  long $sig = 0L;
         |  for (int $t = 0; $t < $bitsPerBand; $t++) {
         |    int[] $s = $signsRef[$b * $bitsPerBand + $t];
         |    int $n = $s.length;
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$v.isNullAt($i)) {
         |        $dot += ((long) ${CodeGenerator.getValue(v, elem, i)}) * $s[$i];
         |      }
         |    }
         |    if ($dot >= 0) $sig |= 1L << $t;
         |  }
         |  $sigs[$b] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-plane exact integer dots of a quantized vector against ±1 sign
  * planes — array<long>, one entry per plane. The IVF-portable building
  * block: centroid assignment is argmax over this array, probe selection
  * is its top-nProbe. Same janino/HOF rationale as
  * [[IntLshBandSignatures]].
  */
case class SignedIntDots(child: Expression, signs: Array[Array[Int]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(signs.nonEmpty, "SignedIntDots: at least one sign plane")
  require(signs.forall(_.length == signs(0).length),
    "signed_int_dots: all sign planes must share one dimension")

  // Same fail-loudly rule as [[IntLshBandSignatures]]: a ragged vector
  // must error, not yield a truncated partial dot (ADVICE r7).
  private def dim: Int = signs(0).length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "signed_int_dots"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType | ShortType | ByteType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral array argument, got ${other.catalogString}")
  }

  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  private def getL(arr: ArrayData, i: Int): Long = elem match {
    case IntegerType => arr.getInt(i).toLong
    case LongType    => arr.getLong(i)
    case ShortType   => arr.getShort(i).toLong
    case ByteType    => arr.getByte(i).toLong
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) throw new IllegalArgumentException(
      s"$prettyName: vector length ${arr.numElements()} != plane dimension $dim")
    val dots = new Array[Long](signs.length)
    var p = 0
    while (p < signs.length) {
      val s = signs(p)
      val n = s.length
      var dot = 0L
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) dot += getL(arr, i) * s(i)
        i += 1
      }
      dots(p) = dot
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(dots)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "int[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val dots = ctx.freshName("dots")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val s = ctx.freshName("s")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "signed_int_dots: vector length " + $v.numElements() +
         |    " != plane dimension " + $dim);
         |}
         |long[] $dots = new long[${signs.length}];
         |for (int $p = 0; $p < ${signs.length}; $p++) {
         |  int[] $s = $signsRef[$p];
         |  int $n = $s.length;
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      $dot += ((long) ${CodeGenerator.getValue(v, elem, i)}) * $s[$i];
         |    }
         |  }
         |  $dots[$p] = $dot;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($dots);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid assignment: the 0-based index of the plane with the
  * maximal double-precision dot product against the input vector, FIRST
  * index on exact ties — the codegen'd replacement for
  * `array_position(array(dots…), array_max(array(dots…))) - 1` over
  * per-plane interpreted HOF aggregates (which evaluated nCentroids × dim
  * boxed lambdas per row, and the plan duplicated the whole dots array
  * into the argmax terms — 10 s of a 2k-row k-means iteration loop).
  * Bit-equivalent by construction: elements accumulate in ascending index
  * order (the zip_with/aggregate fold order, so every partial sum is the
  * identical double) and the winner is tracked with `Double.compare`
  * (the same total order `array_max`/`array_position` use).
  */
case class DotsArgmax(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.nonEmpty, "DotsArgmax: at least one plane")
  require(planes.forall(_.length == planes(0).length),
    "dots_argmax: all planes must share one dimension")

  private def dim: Int = planes(0).length

  override def dataType: DataType = IntegerType
  override def prettyName: String = "dots_argmax"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: DecimalType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName does not support decimal arrays — cast to array<double> first")
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric array argument, got ${other.catalogString}")
  }

  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  private def getD(arr: ArrayData, i: Int): Double = elem match {
    case FloatType   => arr.getFloat(i).toDouble
    case DoubleType  => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case ShortType   => arr.getShort(i).toDouble
    case ByteType    => arr.getByte(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) throw new IllegalArgumentException(
      s"$prettyName: vector length ${arr.numElements()} != plane dimension $dim")
    var best = Double.NegativeInfinity
    var bestIdx = 0
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      while (i < dim) {
        if (!arr.isNullAt(i)) dot += getD(arr, i) * plane(i)
        i += 1
      }
      if (java.lang.Double.compare(dot, best) > 0) { best = dot; bestIdx = p }
      p += 1
    }
    bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val plane = ctx.freshName("plane")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "dots_argmax: vector length " + $v.numElements() +
         |    " != plane dimension " + $dim);
         |}
         |double $best = Double.NEGATIVE_INFINITY;
         |int $bestIdx = 0;
         |for (int $p = 0; $p < ${planes.length}; $p++) {
         |  double[] $plane = $planesRef[$p];
         |  double $dot = 0.0d;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      $dot += ((double) ${CodeGenerator.getValue(v, elem, i)}) * $plane[$i];
         |    }
         |  }
         |  if (java.lang.Double.compare($dot, $best) > 0) { $best = $dot; $bestIdx = $p; }
         |}
         |${ev.value} = $bestIdx;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encoder: for each of the `m` contiguous subspaces
  * of the input vector, the index (0-based) of the nearest codeword by
  * squared L2 distance, ties broken toward the LOWEST index — the rule an
  * oracle replays with `ORDER BY dist, c LIMIT 1`. `books` is the flattened
  * (m·k) × sub codebook matrix, row `s * k + c` = codeword `c` of subspace
  * `s`. One tight generated loop per row (same janino/HOF rationale as
  * [[IntLshBandSignatures]]: a flat element_at composition of m·k·sub terms
  * doesn't compile, HOF folds run interpreted). Double arithmetic is EXACT
  * when vector and codebook values are integers below 2^26 — the
  * oracle-portable twin feeds int8-quantized vectors and ±64 codebooks, so
  * its codes are bit-reproducible in integer SQL. A ragged vector throws
  * (ADVICE r7 convention); null elements read as 0.
  */
case class PqEncode(child: Expression, books: Array[Array[Double]], k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k >= 1 && books.nonEmpty && books.length % k == 0,
    s"pq_encode: |books| (${books.length}) must be a positive multiple of k ($k)")
  require(books.forall(_.length == books(0).length),
    "pq_encode: all codewords must share one subspace dimension")

  private def m: Int = books.length / k
  private def sub: Int = books(0).length
  private def dim: Int = m * sub

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType |
                   ShortType | ByteType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric array argument, got ${other.catalogString}")
  }

  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  private def getD(arr: ArrayData, i: Int): Double = elem match {
    case FloatType   => arr.getFloat(i).toDouble
    case DoubleType  => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case ShortType   => arr.getShort(i).toDouble
    case ByteType    => arr.getByte(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) throw new IllegalArgumentException(
      s"$prettyName: vector length ${arr.numElements()} != m*sub ($dim)")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cw = books(s * k + c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = if (arr.isNullAt(s * sub + i)) 0.0 else getD(arr, s * sub + i)
          val t = x - cw(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cw = ctx.freshName("cw")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: vector length " + $v.numElements() + " != m*sub ($dim)");
         |}
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double[] $cw = $booksRef[$s * $k + $c];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $x = $v.isNullAt($s * $sub + $i)
         |        ? 0.0 : (double) ${CodeGenerator.getValue(v, elem, s"($s * $sub + $i)")};
         |      double $t = $x - $cw[$i];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Affine matrix-vector transform with the matrix as a plan literal:
  * `out[j] = Σ_i mat(j)(i) · (x(i) − shift(i)) + offset(j)` — the one
  * primitive behind PCA projection (mat = components, shift = mean,
  * offset = 0) and PCA reconstruction (mat = componentsᵀ, shift = 0,
  * offset = mean). Same design as [[LshBandSignatures]]: the model rides
  * as a codegen reference object and the transform is one tight generated
  * loop per row (a `transform`/`aggregate` HOF composition would run
  * interpreted per element). Ragged vectors fail loudly (the
  * [[LshBandSignatures]] rule — a silently-partial projection would land
  * in plausible but wrong coordinates); null elements contribute nothing.
  */
case class AffineMatVec(child: Expression, mat: Array[Array[Double]],
                        shift: Array[Double], offset: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(mat.nonEmpty && mat.forall(_.length == mat(0).length),
    "affine_mat_vec: matrix rows must share one dimension")
  require(shift.length == mat(0).length,
    s"affine_mat_vec: shift length ${shift.length} != input dim ${mat(0).length}")
  require(offset.length == mat.length,
    s"affine_mat_vec: offset length ${offset.length} != output dim ${mat.length}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "affine_mat_vec"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: DecimalType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName does not support decimal arrays — cast to array<double> first")
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric array argument, got ${other.catalogString}")
  }

  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  private def dimIn: Int = mat(0).length
  private def dimOut: Int = mat.length

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dimIn) throw new IllegalArgumentException(
      s"$prettyName: vector length ${arr.numElements()} != input dimension $dimIn")
    val out = new Array[Double](dimOut)
    var j = 0
    while (j < dimOut) {
      val row = mat(j)
      var acc = offset(j)
      var i = 0
      while (i < dimIn) {
        if (!arr.isNullAt(i)) acc += ((elem match {
          case FloatType   => arr.getFloat(i).toDouble
          case DoubleType  => arr.getDouble(i)
          case IntegerType => arr.getInt(i).toDouble
          case LongType    => arr.getLong(i).toDouble
          case ShortType   => arr.getShort(i).toDouble
          case ByteType    => arr.getByte(i).toDouble
          case other => throw new IllegalStateException(s"unsupported element type $other")
        }) - shift(i)) * row(i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
    val shiftRef = ctx.addReferenceObj("shift", shift, "double[]")
    val offsetRef = ctx.addReferenceObj("offset", offset, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |if ($v.numElements() != $dimIn) {
         |  throw new IllegalArgumentException(
         |    "affine_mat_vec: vector length " + $v.numElements()
         |      + " != input dimension $dimIn");
         |}
         |double[] $out = new double[$dimOut];
         |for (int $j = 0; $j < $dimOut; $j++) {
         |  double[] $row = $matRef[$j];
         |  double $acc = $offsetRef[$j];
         |  for (int $i = 0; $i < $dimIn; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      $acc += (((double) ${CodeGenerator.getValue(v, elem, i)}) - $shiftRef[$i]) * $row[$i];
         |    }
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column wrappers (classic API). */
  def quantizedDot(a: Column, b: Column, scale: Int = 1000): Column =
    GraftBridge.column(QuantizedDot(
      GraftBridge.expression(a), GraftBridge.expression(b), scale))

  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def lshBandSignatures(vec: Column, planes: Array[Array[Double]],
                        bitsPerBand: Int): Column =
    GraftBridge.column(LshBandSignatures(
      GraftBridge.expression(vec), planes, bitsPerBand))

  def intLshBandSignatures(vec: Column, signs: Array[Array[Int]],
                           bitsPerBand: Int): Column =
    GraftBridge.column(IntLshBandSignatures(
      GraftBridge.expression(vec), signs, bitsPerBand))

  def dotsArgmax(vec: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(DotsArgmax(GraftBridge.expression(vec), planes))

  def signedIntDots(vec: Column, signs: Array[Array[Int]]): Column =
    GraftBridge.column(SignedIntDots(GraftBridge.expression(vec), signs))

  def pqEncode(vec: Column, books: Array[Array[Double]], k: Int): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), books, k))

  def affineMatVec(vec: Column, mat: Array[Array[Double]],
                   shift: Array[Double], offset: Array[Double]): Column =
    GraftBridge.column(AffineMatVec(
      GraftBridge.expression(vec), mat, shift, offset))

  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
