package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling — the data-QA primitive an ETL runs before and
  * after a load (the reference's count-verify step generalized to
  * per-column statistics; cf. `verificar_counts` in
  * `sync_INCREMENTAL.py` — count parity is its only probe, this is the
  * column-level form).
  *
  * Scale shape: ONE aggregate job produces every statistic. The exact
  * distinct counts compile to a single Expand + hash-aggregate pass
  * (Catalyst's multi-count-distinct planning: rows multiply by the
  * profiled column count map-side, but the corpus is scanned once and
  * there is no per-column job loop); approx_count_distinct rides the same
  * pass as an HLL sketch for the 100 TB mode where exact per-column
  * distincts are not worth their shuffle (callers pick a column subset —
  * profiling 3 columns of a 100-column table reads 3 columns, the scan is
  * column-pruned by construction). The wide single-row result is then
  * exploded to one row per column — driver traffic is one row either way.
  *
  * min/max are rendered as strings so heterogeneous column types share
  * one output schema; counts are type-agnostic. NULL-only columns yield
  * NULL min/max and 0 distincts.
  */
object Profile {

  /** Profile `cols` of `df` (default: every column). Returns one row per
    * column: (col_name, n_rows, n_nulls, n_distinct, approx_distinct,
    * min_value, max_value). `n_distinct` is exact and excludes NULLs
    * (count-distinct semantics); `approx_distinct` is the HLL estimate of
    * the same quantity.
    */
  def profileTable(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.isEmpty) df.columns.toSeq else cols
    require(cs.nonEmpty, "profileTable: no columns to profile")
    cs.foreach(c => require(df.columns.contains(c),
      s"profileTable: no such column '$c' (have ${df.columns.mkString(", ")})"))
    val aggs = count(lit(1)).as("__n") +: cs.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      approx_count_distinct(col(c)).as(s"__ad_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cs.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__ad_$c").as("approx_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))): _*)).as("__p"))
      .select(col("__p.*"))
  }
}
