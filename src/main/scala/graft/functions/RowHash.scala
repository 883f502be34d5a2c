package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Row fingerprinting for CDC / idempotent merge.
  *
  * Semantics derived from the reference's `calculate_row_hash`
  * (sync_ALL.py:184-191, sync_INCREMENTAL.py:169-176, spec at
  * context/context.md:1223-1241): SHA-256 over the `'|'`-joined values of the
  * **alphabetically sorted** column names; NULL / empty-string / missing
  * values render as the literal string `"NULL"`.
  *
  * Parity note: the reference renders `str(val) if val else 'NULL'` — Python
  * truthiness — but its rows always come from `csv.DictReader`, so every
  * value is a *string* and the only falsy values are `''` and `None`
  * (the string `'0'` is truthy and hashes as `'0'`). `cell` reproduces
  * exactly that: null/empty → "NULL", everything else its string form. For
  * typed columns we render via `cast(string)`, which means numeric 0 hashes
  * as "0" — same as the reference's CSV string "0". Byte parity therefore
  * holds for the reference's real data flow; it would diverge only if the
  * reference were fed pre-typed numerics, a path it does not have.
  *
  * Implemented as native codegen'd expressions (`sha2(concat_ws(...))`), no
  * UDF — the whole hash stays inside whole-stage codegen, so at 100 TB this
  * is a pure map-side projection with zero shuffle.
  */
object RowHash {

  /** Render one column exactly like the reference renders a CSV cell:
    * null or empty string => "NULL", else the string value.
    * Note: values are rendered from the *string form* of the column —
    * compute hashes before lossy casts when byte parity matters
    * (SURVEY.md §7.4 trap 1).
    */
  def cell(c: Column): Column = {
    val s = c.cast(StringType)
    when(s.isNull || s === "", lit("NULL")).otherwise(s)
  }

  /** SHA-256 hex fingerprint over the given columns, sorted by name. */
  def rowHash(colNames: Seq[String]): Column =
    sha2(concat_ws("|", colNames.sorted.map(n => cell(col(n))): _*), 256)

  /** All-columns fingerprint of a DataFrame. */
  def withRowHash(df: DataFrame, hashCol: String = "row_hash"): DataFrame =
    df.withColumn(hashCol, rowHash(df.columns.toSeq))

  /** Audit columns the reference appends to every sink table
    * (sync_ALL.py:234,242-244): surrogate `id` + `row_hash` +
    * `created_at`/`updated_at`. The hash basis is ALL pre-audit columns —
    * the single hash definition shared with `Merge.classify`. `now` is
    * injectable so tests/oracles can pin a literal timestamp.
    *
    * Ids are dense 1..n in `orderBy` key order via `row_number` — a global
    * sort. For bulk loads where a single-partition window stage would hurt,
    * use `graft.pipeline.Sinks.withDenseId` (zipWithIndex) instead.
    */
  def withAuditColumns(df: DataFrame, orderBy: Seq[String],
                       now: Column = current_timestamp()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // row_hash appended as a tiebreak: id assignment stays deterministic even
    // when the declared key has duplicates (the synthetic lineitem does).
    withRowHash(df)
      .withColumn("id", row_number().over(
        Window.orderBy(orderBy.map(col) :+ col("row_hash"): _*)).cast("long"))
      .withColumn("created_at", now)
      .withColumn("updated_at", now)
      .select((Seq("id") ++ df.columns ++ Seq("row_hash", "created_at", "updated_at")).map(col): _*)
  }
}
