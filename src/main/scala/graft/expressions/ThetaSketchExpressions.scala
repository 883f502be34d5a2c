package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches (Apache DataSketches) as first-class Spark aggregates —
  * the distinct-count sketch family that, unlike HLL, supports
  * INTERSECTION and DIFFERENCE: "how many distinct URLs appear in BOTH
  * crawl snapshots" / "how many are new this month" are one sketch pass
  * per side plus a driver-side set operation, where the exact answer is
  * a full shuffle join of both corpora. The jar ships with Spark 4
  * (datasketches-java powers hll_sketch_agg); only the theta family
  * lacks a SQL surface, so this is the (b)-tier custom-expression case:
  * a TypedImperativeAggregate producing the standard CompactSketch bytes
  * (interoperable with any DataSketches reader), plus codegen-friendly
  * StaticInvoke scalars for the estimates.
  *
  * Accuracy regime, same shape as the HLL story in
  * [[graft.operators.Profile]]: a theta sketch retains raw hashes until
  * it holds more than its nominal k = 2^lgK entries, so BELOW k every
  * estimate — including union/intersection/difference of such sketches —
  * is EXACT (theta = 1.0, the sketch IS the hashed set). Past k it
  * degrades to the published ~1/sqrt(k) relative error. The
  * q_prof_theta_overlap oracle exploits the exact regime: DuckDB
  * replays the true distinct set algebra and the estimates must LAND on
  * it.
  */
object ThetaOps {

  private def heapify(b: Array[Byte]): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(b))

  /** Rounded distinct estimate of one serialized sketch. */
  def estimate(b: Array[Byte]): Long =
    math.round(heapify(b).getEstimate)

  /** Rounded |A ∪ B| from two serialized sketches. The union op is built
    * at the MAX nominal (2^26) so it can never be the accuracy
    * bottleneck — the default builder nominal is 2^12, which would
    * silently drop a union of two exact 16k-entry sketches into
    * estimation mode; the QuickSelect buffer resizes lazily, so the big
    * nominal costs only what the inputs actually retain.
    */
  def unionEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val u = SetOperation.builder().setLogNominalEntries(26).buildUnion()
    u.union(heapify(a))
    u.union(heapify(b))
    math.round(u.getResult.getEstimate)
  }

  /** Rounded |A ∩ B| from two serialized sketches. */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(heapify(a))
    i.intersect(heapify(b))
    math.round(i.getResult.getEstimate)
  }

  /** Rounded |A \ B| from two serialized sketches. */
  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val op = SetOperation.builder().buildANotB()
    math.round(op.aNotB(heapify(a), heapify(b)).getEstimate)
  }
}

/** Distributed theta-sketch build over one column: per-partition Union
  * buffers absorb raw values, partial results merge as compact sketches
  * (map-side combine — the aggregate never shuffles data rows, only
  * k-bounded sketch bytes), final result is the standard CompactSketch
  * serialization. Accepts the hll_sketch_agg type set (int/long/string/
  * binary); NULLs are ignored (count-distinct semantics). NOTE the
  * DataSketches type contract, same as Spark's own HLL binding: a string
  * "42" and a long 42 hash differently — pin the column type at the
  * caller (the Profile meta-sidecar lesson).
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26,
    s"theta_sketch_agg: lgK must be in [4, 26], got $lgK")

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"theta_sketch_agg accepts int/long/string/binary, got ${dt.typeName}")
    }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case LongType    => buffer.update(v.asInstanceOf[Long])
      case StringType  => buffer.update(v.asInstanceOf[UTF8String].toString)
      case BinaryType  => buffer.update(v.asInstanceOf[Array[Byte]])
      case dt => throw new IllegalStateException(s"unreachable: $dt")
    }
    buffer
  }

  override def merge(buffer: Union, input: Union): Union = {
    buffer.union(input.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Column wrappers. */
object ThetaExpressions {

  /** Aggregate one column into a serialized theta CompactSketch. */
  def thetaSketchAgg(c: Column, lgK: Int = 14): Column =
    GraftBridge.column(
      ThetaSketchAgg(GraftBridge.expression(c), lgK).toAggregateExpression())

  private def scalar2(name: String, a: Column, b: Column): Column =
    GraftBridge.column(StaticInvoke(
      ThetaOps.getClass,
      LongType,
      name,
      Seq(GraftBridge.expression(a), GraftBridge.expression(b)),
      inputTypes = Seq(BinaryType, BinaryType),
      propagateNull = true,
      returnNullable = true))

  def thetaEstimate(sk: Column): Column =
    GraftBridge.column(StaticInvoke(
      ThetaOps.getClass,
      LongType,
      "estimate",
      Seq(GraftBridge.expression(sk)),
      inputTypes = Seq(BinaryType),
      propagateNull = true,
      returnNullable = true))

  def thetaUnionEstimate(a: Column, b: Column): Column =
    scalar2("unionEstimate", a, b)

  def thetaIntersectEstimate(a: Column, b: Column): Column =
    scalar2("intersectEstimate", a, b)

  def thetaANotBEstimate(a: Column, b: Column): Column =
    scalar2("aNotBEstimate", a, b)
}
