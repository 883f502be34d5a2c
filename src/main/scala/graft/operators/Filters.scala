package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven predicate builders (reference F1–F9).
  *
  * The reference applies per-table filter maps post-scan in Python
  * (sync_ALL.py:139-154); here each shape is a `Column` predicate that
  * Catalyst pushes into the parquet scan (PushedFilters), so at 100 TB the
  * filter happens inside the columnar reader, not after materialization.
  */
object Filters {

  /** F1: equality. */
  def eq(field: String, value: String): Column = col(field) === lit(value)

  /** F2: exclusion with the reference's dict-`.get` null semantics —
    * `row.get('BAJA') != '1'` KEEPS rows where the field is null/missing
    * (SURVEY.md §7.4 trap 3). Spark's `=!=` alone would drop nulls.
    */
  def neqKeepNull(field: String, value: String): Column =
    col(field) =!= lit(value) || col(field).isNull

  /** F3: conjunction of a filter map (all AND-ed, like the reference's
    * per-table filter loop).
    */
  def all(preds: Seq[Column]): Column =
    preds.reduceOption(_ && _).getOrElse(lit(true))

  /** F9: python-truthiness non-empty test. */
  def nonEmpty(field: String): Column =
    col(field).isNotNull && col(field).cast("string") =!= ""

  /** F4/J1: membership semi-join — `probe` rows whose `probeKey` appears in
    * (filtered) `build`'s `buildKey`. The reference collects the build side
    * into a Python set (sync_ALL.py:341-345); here it is a left-semi join
    * that Catalyst turns into a broadcast hash join when the build side is
    * small — and a shuffle join at 100 TB, with no driver memory cliff.
    */
  def semiJoinIn(probe: DataFrame, probeKey: String,
                 build: DataFrame, buildKey: String): DataFrame =
    probe.join(
      build.select(col(buildKey).as(probeKey)).distinct(),
      Seq(probeKey), "left_semi")

  /** Anti variant (rows whose key is absent from build). */
  def antiJoinNotIn(probe: DataFrame, probeKey: String,
                    build: DataFrame, buildKey: String): DataFrame =
    probe.join(
      build.select(col(buildKey).as(probeKey)).distinct(),
      Seq(probeKey), "left_anti")
}
