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
    * (sync_ALL.py:242-244): row_hash + created_at/updated_at.
    */
  def withAuditColumns(df: DataFrame): DataFrame =
    withRowHash(df)
      .withColumn("created_at", current_timestamp())
      .withColumn("updated_at", current_timestamp())
}
