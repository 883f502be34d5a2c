package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reconciliation analytics (reference §3.3: compare_historico_mensual.py,
  * compare_noviembre_2025.py) — monthly aggregation of two sides plus a
  * full-outer alignment diff, and key-set difference audits.
  *
  * Money sums go through DECIMAL so totals are exact and order-independent
  * (SURVEY.md §7.4 trap 8) — a double sum's low bits would depend on
  * partition merge order.
  */
object Reconcile {

  /** A1/A2: per-month count + money sums (+ optional per-state counts). */
  def monthlyAgg(df: DataFrame, dateCol: String, amountCols: Seq[String]): DataFrame = {
    val month = date_format(col(dateCol), "yyyy-MM").as("month")
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +:
      amountCols.map(c => sum(col(c).cast("decimal(18,4)")).cast("double").as(s"sum_$c"))
    df.filter(col(dateCol).isNotNull)
      .groupBy(month)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** J6/E2: full-outer align two monthly aggregates and diff their counts.
    * Missing months default to 0 (`na.fill`), like the reference's
    * `.get(month, default)` lookups (compare_historico_mensual.py:103-127).
    */
  def alignDiff(a: DataFrame, b: DataFrame, on: String, metric: String): DataFrame = {
    val l = a.select(col(on), col(metric).as(s"${metric}_a"))
    val r = b.select(col(on), col(metric).as(s"${metric}_b"))
    l.join(r, Seq(on), "full_outer")
      .na.fill(0, Seq(s"${metric}_a", s"${metric}_b"))
      .withColumn("diff", col(s"${metric}_a") - col(s"${metric}_b"))
  }

  /** E1: orphan keys — values of `keyA` present in `a` but absent from `b`
    * (both directions give the reference's two orphan lists,
    * compare_noviembre_2025.py:193-214). `except` compiles to the same
    * aggregate+anti-join Catalyst plan; expressed as left_anti to keep
    * duplicates out explicitly.
    */
  def orphanKeys(a: DataFrame, keyA: String, b: DataFrame, keyB: String): DataFrame =
    a.select(col(keyA)).filter(col(keyA).isNotNull).distinct()
      .join(b.select(col(keyB).as(keyA)).distinct(), Seq(keyA), "left_anti")

  /** E1 both directions in one report — the reference emits the two orphan
    * lists together (compare_noviembre_2025.py:193-214: keys only in the
    * source, then keys only in the target). One row per orphan key with a
    * `direction` tag (`only_in_a` / `only_in_b`); the key lands in a single
    * `key` column cast to string so the two sides union cleanly whatever
    * their original types.
    */
  def orphanKeysBoth(a: DataFrame, keyA: String, b: DataFrame, keyB: String): DataFrame =
    orphanKeys(a, keyA, b, keyB)
      .select(col(keyA).cast("string").as("key"), lit("only_in_a").as("direction"))
      .unionByName(orphanKeys(b, keyB, a, keyA)
        .select(col(keyB).cast("string").as("key"), lit("only_in_b").as("direction")))

  /** O3: deterministic top-k by group count (ties broken by key asc). */
  def topKByCount(df: DataFrame, groupCol: Column, k: Int): DataFrame =
    df.groupBy(groupCol.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(k)
}
