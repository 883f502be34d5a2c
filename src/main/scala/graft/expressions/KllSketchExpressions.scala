package graft.expressions

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KLL quantile sketches (Apache DataSketches) as Spark aggregates — the
  * MERGEABLE quantile family completing the sketch trio (HLL: distinct
  * counts; theta: set algebra; KLL: distributions). Spark's own
  * `approx_percentile` answers one query over one scan; a KLL sketch is
  * a VALUE: persist one per shard/day as data lands and any later
  * distribution question (p50/p90/p99 document length corpus-wide, the
  * rank of a proposed truncation threshold) is a merge over stored
  * k-bounded sketches — no corpus rescan (the hllWriteIndex argument,
  * for quantiles).
  *
  * Accuracy regime, the sketch-trio convention: a KLL sketch with
  * parameter k retains EVERY item while n ≤ k (compaction starts only
  * when the level-0 buffer overflows), and merging exact sketches whose
  * combined n ≤ k stays exact — below that bound `getQuantile` is the
  * true order statistic, which is what the q_prof_kll_quantiles oracle
  * replays (`INCLUSIVE` semantics: the smallest item whose cumulative
  * weight ≥ ⌈q·n⌉ — `ORDER BY v LIMIT 1 OFFSET ceil(q*n)-1` in SQL).
  * Past it: the published ~1.65/k^0.86 rank error (~0.27% at k=1024).
  * Long-valued only (lengths, counts, ids — exact compares, no float
  * ordering questions).
  */
object KllOps {

  private def heapify(b: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(b))

  /** INCLUSIVE quantile at rank `q` in [0, 1]; null for an empty sketch
    * (no data has no quantiles — the C7/C8 rule).
    */
  def quantile(b: Array[Byte], q: Double): java.lang.Long = {
    val sk = heapify(b)
    if (sk.isEmpty) null
    else java.lang.Long.valueOf(
      sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE))
  }

  /** INCLUSIVE normalized rank of `value` (fraction of items <= value);
    * null for an empty sketch.
    */
  def rank(b: Array[Byte], value: Long): java.lang.Double = {
    val sk = heapify(b)
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(
      sk.getRank(value, QuantileSearchCriteria.INCLUSIVE))
  }

  /** Items absorbed by the sketch. */
  def n(b: Array[Byte]): Long = heapify(b).getN

  /** Merge an array of serialized sketches into one (KLL mergeability —
    * the read side of the persisted shard index). An empty or all-NULL
    * array yields an empty sketch (whose quantiles are null).
    */
  def mergeAll(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    var merged: KllLongsSketch = null
    var i = 0
    while (i < arr.numElements()) {
      val b = arr.getBinary(i)
      if (b != null) {
        val sk = heapify(b)
        if (merged == null) merged = KllLongsSketch.newHeapInstance(sk.getK)
        merged.merge(sk)
      }
      i += 1
    }
    if (merged == null) KllLongsSketch.newHeapInstance().toByteArray
    else merged.toByteArray
  }
}

/** Distributed KLL build over one integral column: per-partition
  * sketches absorb raw values, partials merge as serialized sketches
  * (map-side combine — only k-bounded bytes shuffle), result is the
  * standard KLL serialization (interoperable with any DataSketches
  * reader). NULLs are ignored.
  */
case class KllLongsSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllLongsSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535,
    s"kll_sketch_agg: k must be in [8, 65535], got $k")

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll_sketch_agg accepts integral columns, got ${dt.typeName}")
    }

  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)

  override def update(buffer: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case LongType    => buffer.update(v.asInstanceOf[Long])
      case ShortType   => buffer.update(v.asInstanceOf[Short].toLong)
      case ByteType    => buffer.update(v.asInstanceOf[Byte].toLong)
      case dt => throw new IllegalStateException(s"unreachable: $dt")
    }
    buffer
  }

  override def merge(buffer: KllLongsSketch, input: KllLongsSketch): KllLongsSketch = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: KllLongsSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllLongsSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllLongsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllLongsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllLongsSketchAgg =
    copy(child = newChild)
}

/** Column wrappers. */
object KllExpressions {

  /** Aggregate one integral column into a serialized KLL sketch. */
  def kllSketchAgg(c: Column, k: Int = 8192): Column =
    GraftBridge.column(
      KllLongsSketchAgg(GraftBridge.expression(c), k).toAggregateExpression())

  def kllQuantile(sk: Column, q: Column): Column =
    GraftBridge.column(StaticInvoke(
      KllOps.getClass,
      LongType,
      "quantile",
      Seq(GraftBridge.expression(sk), GraftBridge.expression(q)),
      inputTypes = Seq(BinaryType, DoubleType),
      propagateNull = true,
      returnNullable = true))

  def kllRank(sk: Column, value: Column): Column =
    GraftBridge.column(StaticInvoke(
      KllOps.getClass,
      DoubleType,
      "rank",
      Seq(GraftBridge.expression(sk), GraftBridge.expression(value)),
      inputTypes = Seq(BinaryType, LongType),
      propagateNull = true,
      returnNullable = true))

  def kllN(sk: Column): Column =
    GraftBridge.column(StaticInvoke(
      KllOps.getClass,
      LongType,
      "n",
      Seq(GraftBridge.expression(sk)),
      inputTypes = Seq(BinaryType),
      propagateNull = true,
      returnNullable = true))

  /** Merge an array column of serialized sketches into one sketch. */
  def kllMergeAll(sks: Column): Column =
    GraftBridge.column(StaticInvoke(
      KllOps.getClass,
      BinaryType,
      "mergeAll",
      Seq(GraftBridge.expression(sks)),
      inputTypes = Seq(ArrayType(BinaryType)),
      propagateNull = true,
      returnNullable = true))
}
