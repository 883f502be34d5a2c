package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Point-in-interval (range containment) join — "which session/config
  * window/IP block contains this event" — without the theta-join trap:
  * `p.t BETWEEN i.start AND i.end` alone gives Spark no equi-key, so it
  * plans a per-key cartesian (BroadcastNestedLoopJoin at best). Here both
  * sides are mapped onto fixed-width buckets: an interval explodes into
  * every bucket it covers, a point computes its single bucket, the join is
  * EQUI on (keys, bucket) — hash-partitioned, AQE-skew-splittable — and an
  * exact containment filter removes the same-bucket near-misses.
  *
  * Cost model: interval fanout = span / bucketWidth rows per interval
  * (guarded by `maxBucketsPerInterval` via a per-row in-plan check that
  * fails loudly BEFORE exploding a year-long interval into 10⁶ rows — no
  * extra pass over the interval side); point side grows not at all. Pick bucketWidth ≈ the typical interval span.
  * Bucketing uses monotone truncation, so containment is never lost across
  * a bucket edge (a contained point's bucket always lies in the interval's
  * bucket range); the exact filter compares the ORIGINAL columns, so
  * truncation never fabricates a match either. Matches are unique per
  * (point, interval): a point has one bucket, an interval lists each
  * bucket once.
  */
object RangeJoin {

  def intervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                   pointCol: String, startCol: String, endCol: String,
                   bucketWidth: Long,
                   maxBucketsPerInterval: Long = 4096): DataFrame = {
    require(keys.nonEmpty, "intervalJoin: at least one equi-key")
    require(bucketWidth > 0, s"intervalJoin: bucketWidth must be > 0")
    val clash = (points.columns.toSet - "__bkt") intersect
      (intervals.columns.toSet -- keys - startCol - endCol)
    require(clash.isEmpty,
      s"intervalJoin: non-key columns $clash exist on both sides — rename first")
    // Temporal columns bucket on their epoch-micros value (bucketWidth is
    // then SECONDS); monotone because the session timezone is pinned to UTC
    // (Sessions.local), so the NTZ→instant cast is the identity on the wall
    // clock. Numerics bucket on their own value. Floor division in DOUBLE is
    // fine: epoch micros ≈ 1.7e15 < 2^53, and rounding is monotone, which is
    // all bucket containment needs (the exact filter uses original columns).
    def bkt(df: DataFrame, c: String): Column = {
      val micros = bucketWidth * 1000000L
      df.schema(c).dataType match {
        case TimestampType    => floor(unix_micros(col(c)) / micros).cast(LongType)
        case TimestampNTZType =>
          floor(unix_micros(col(c).cast(TimestampType)) / micros).cast(LongType)
        case DateType =>
          // days → MICROS (×86400 alone would yield seconds, putting Date
          // buckets 10⁶ off Timestamp buckets: cross-type joins would miss
          // every match and Date/Date sides would all collapse into bucket 0,
          // exactly the per-key cartesian this operator exists to avoid).
          floor(unix_date(col(c)).cast(LongType) * 86400000000L / micros)
            .cast(LongType)
        case _ => floor(col(c).cast(DoubleType) / bucketWidth).cast(LongType)
      }
    }
    // Fanout guard, evaluated PER ROW inside the same pass that explodes
    // the interval (not as a separate eager aggregate: that costs a full
    // extra scan of the interval side plus a driver sync barrier — real
    // money when the interval table is itself huge). The when() short-
    // circuits BEFORE sequence() materializes, so an oversized interval
    // fails loudly instead of allocating its million-element bucket array.
    val span = bkt(intervals, endCol) - bkt(intervals, startCol)
    // NULL-bounded intervals keep their old behavior: sequence(NULL, _) is
    // NULL and explode drops it — they must route to the sequence branch,
    // not the error branch. REVERSED intervals (end < start) match nothing
    // under BETWEEN, but Spark's sequence() would count DOWN and explode a
    // reversed year into 10⁹ rows the filter then throws away — route them
    // to NULL (drop) explicitly, matching the theta-join's empty result.
    val guarded = when(span < 0, lit(null).cast(ArrayType(LongType)))
      .when(span.isNull || span <= maxBucketsPerInterval,
        sequence(bkt(intervals, startCol), bkt(intervals, endCol)))
      .otherwise(raise_error(concat(
        lit("intervalJoin: an interval spans "), span.cast(StringType),
        lit(s" buckets (limit $maxBucketsPerInterval) — raise bucketWidth " +
          "toward the typical interval span, or split oversized intervals " +
          "upstream"))).cast(ArrayType(LongType)))
    val iv = intervals.withColumn("__bkt", explode(guarded))
    points.withColumn("__bkt", bkt(points, pointCol))
      .join(iv, keys :+ "__bkt")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bkt")
  }
}
