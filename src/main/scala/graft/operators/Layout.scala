package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** Multi-column data layout: Z-order (Morton) clustering for scan pruning.
  *
  * Parquet row-group pruning is driven by per-column min/max statistics;
  * sorting by ONE column makes its stats tight but leaves every other
  * column's min/max spanning the whole table. Interleaving the bits of
  * several normalized key columns into one sort key (the Z-value) makes
  * the file/row-group bounding boxes tight on ALL interleaved columns at
  * once, so a 100 TB scan with predicates on any of them skips most of
  * the data — the standard lakehouse layout trick (Delta/Iceberg
  * `ZORDER BY` / `sort_order`), here as a plain write-side operator.
  *
  * Everything is exact integer arithmetic (min/max normalization by
  * integral division, bit interleave by shift/mask) so a SQL oracle
  * replays the Z-values bit-for-bit — no float rounding anywhere.
  *
  * Reference workloads filter `historico` by (period, state) and events
  * by (day, type) — exactly the multi-predicate scans Z-ordering serves
  * (reference query shapes: `compare_historico_mensual.py:56-77`).
  */
object Layout {

  /** Exact integer division of non-negative longs (Spark's `/` on longs
    * returns double, which loses exactness past 2^53 — the overflow guard
    * in [[withZValue]] bounds the numerator to Long but not to 2^53).
    */
  private def div(a: Column, b: Column): Column =
    GraftBridge.column(IntegralDivide(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Interleave the low `bits` bits of each column (non-negative longs in
    * [0, 2^bits)) into one Z-value: bit `i` of column `j` lands at output
    * position `i * n + j`. Pure codegen'd shift/mask terms OR-folded —
    * `bits * n` terms, all inside whole-stage codegen.
    */
  def zorderValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderValue: need at least one column")
    val n = cols.size
    require(bits >= 1 && bits * n <= 63,
      s"zorderValue: bits=$bits over $n columns needs ${bits * n} output " +
        "bits; must fit a signed Long (<= 63)")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Add a Z-value column computed from min/max-normalized integral
    * columns. One aggregation collects `2 * n` scalars to the driver (a
    * bounded metadata pull, like the curation prefix sums) so the scaling
    * and interleave stay literal-driven codegen with no extra join.
    *
    * Normalization: `grid = ((v - min) * (2^bits - 1)) div (max - min)`
    * — exact integral arithmetic, truncating division (operands are
    * non-negative after the `v - min` shift, so truncation == floor and
    * any SQL engine replays it). Constant columns map to grid 0; NULL in
    * any Z-column yields a NULL Z-value (callers order NULLS FIRST or
    * filter). Fails loudly if `(max - min) * (2^bits - 1)` would
    * overflow Long rather than interleaving garbage.
    */
  def withZValue(df: DataFrame, zcols: Seq[String], bits: Int = 16,
                 out: String = "__z"): DataFrame = {
    require(zcols.nonEmpty, "withZValue: need at least one z-column")
    require(!df.columns.contains(out),
      s"withZValue: output column `$out` collides with an input column")
    val levels = (1L << bits) - 1
    val aggs = zcols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__min_$c"),
      max(col(c).cast("long")).as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val grids = zcols.zipWithIndex.map { case (c, idx) =>
      val (lo, hi) = (row.getLong(2 * idx), row.getLong(2 * idx + 1))
      require(hi == lo || (hi - lo) <= Long.MaxValue / levels,
        s"withZValue: range of `$c` ($lo..$hi) * $levels overflows Long — " +
          "lower bits or pre-bucket the column")
      if (hi == lo) lit(0L)
      else div((col(c).cast("long") - lit(lo)) * lit(levels), lit(hi - lo))
    }
    df.withColumn(out, zorderValue(grids, bits))
  }

  /** Write `df` Z-ordered on `zcols`: range-partition by Z-value into
    * `numFiles` output splits, sort within each, drop the key, write
    * parquet. Range partitioning keeps file Z-ranges disjoint (each file
    * is a contiguous Z-curve segment == a tight bounding box on every
    * interleaved column); the within-file sort tightens row-group stats
    * the same way. At 100 TB: one extra shuffle at write time buys
    * min/max pruning on every subsequent multi-predicate scan.
    */
  def writeZOrdered(df: DataFrame, path: String, zcols: Seq[String],
                    bits: Int = 16, numFiles: Int = 32,
                    mode: String = "error"): Unit =
    withZValue(df, zcols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path)
}
