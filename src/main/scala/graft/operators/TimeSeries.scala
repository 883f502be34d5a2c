package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series continuity operators: per-key date-spine densification and
  * forward fill. A presence/attendance pipeline reads "no row for the day"
  * as "state unchanged since the last observation" — turning that implicit
  * convention into explicit rows is what every downstream daily aggregate,
  * rolling window, and as-of join wants (cf. the reference's monthly
  * continuity reports, compare_historico_mensual.py:56-143).
  *
  * Scale shape: the spine derives from ONE per-key min/max hash aggregate,
  * then explodes map-side — rows produced ∝ key-span days, never corpus².
  * The fill is a per-key running window over the spine ordering; with the
  * spine join and the window both hash-partitioned on the key, Catalyst
  * reuses one shuffle. State per key is a single last-seen value — no
  * whole-series buffering.
  */
object TimeSeries {

  /** Densify `df` to one row per key per day between that key's first and
    * last observation, forward-filling `valCol` across the gaps.
    * Output: key, date, `<valCol>` (filled), `is_observed` (false on
    * fabricated rows). Days before a key's first observation never exist
    * (the spine starts at the key's own min), so the fill is total.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, dateCol: String,
                   valCol: String): DataFrame = {
    // The input feeds BOTH the spine min/max aggregate and the join side,
    // and Spark does not reuse a plan subtree across the two — without a
    // pin, an expensive upstream (typically a full-corpus daily aggregate)
    // runs twice. Keyed daily rows are small relative to their source;
    // the entry lives until LRU eviction or `spark.catalog.clearCache()`
    // (the minHashCandidatesPortable trade). When the caller controls the
    // action, prefer [[gapFillDailyScoped]], which releases the pin
    // deterministically instead of leaving it to LRU — at scale a leaked
    // daily frame can evict hotter operator caches mid-plan.
    val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    plan(pinned, keyCol, dateCol, valCol)
  }

  /** [[gapFillDaily]] with deterministic cache release: pins the input,
    * hands the gap-filled frame to `action`, and unpersists the pin in a
    * `finally` once the action returns — no retained storage entry
    * outlives the call (TimeSeriesSpec pins this). Use this form whenever
    * the consumption is a single action (write, collect, aggregate);
    * use [[gapFillDaily]] only when the frame must outlive the call site.
    */
  def gapFillDailyScoped[T](df: DataFrame, keyCol: String, dateCol: String,
                            valCol: String)(action: DataFrame => T): T = {
    val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try action(plan(pinned, keyCol, dateCol, valCol))
    finally pinned.unpersist()
  }

  private def plan(pinned: DataFrame, keyCol: String, dateCol: String,
                   valCol: String): DataFrame = {
    val spine = pinned.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 day"))).as(dateCol))
    val joined = spine.join(pinned, Seq(keyCol, dateCol), "left")
    val w = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("is_observed", col(valCol).isNotNull)
      .withColumn(valCol, last(col(valCol), ignoreNulls = true).over(w))
  }
}
