package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization — the classic lag + cumulative-sum window pair:
  * a new session starts when the gap to the previous event of the same user
  * exceeds `gapSeconds`. One shuffle keyed by user; both window passes share
  * the same (user, ts) sort, so Catalyst plans a single Exchange + Sort.
  *
  * Ordering carries a unique tiebreak column so session boundaries are
  * deterministic under equal timestamps.
  */
object Sessionize {

  /** Tag every event with its session ordinal (1-based per user). */
  def withSessionId(df: DataFrame, userCol: String, tsCol: String,
                    tiebreakCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tiebreakCol))
    val gapUs = gapSeconds * 1000000L
    val prev = lag(col(tsCol), 1).over(w)
    // cast("timestamp"): unix_micros rejects TIMESTAMP_NTZ; under a pinned
    // session timezone the NTZ->TS reinterpretation is stable.
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val isNew = when(prev.isNull || us(col(tsCol)) - us(prev) > gapUs, 1L).otherwise(0L)
    df.withColumn("session_id", sum(isNew).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: event count + span. */
  def sessions(df: DataFrame, userCol: String, tsCol: String,
               tiebreakCol: String, gapSeconds: Long): DataFrame =
    withSessionId(df, userCol, tsCol, tiebreakCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
}
