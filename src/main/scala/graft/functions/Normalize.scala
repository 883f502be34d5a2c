package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Value normalization / parsing expressions (reference C1, C5, C7, C8).
  *
  * All are pure `Column` expression builders — codegen'd, no UDFs — so they
  * fuse into whole-stage codegen and scale as map-only work.
  */
object Normalize {

  /** Multi-format timestamp parse (reference `convert_date_value`,
    * sync_ALL.py:167-182 / sync_INCREMENTAL.py:150-167): try each format in
    * order, first success wins, NULL if none match. Spark's `to_timestamp`
    * returns null on a per-format mismatch, which composes with `coalesce`
    * to exactly the reference's try/except ladder.
    */
  val ReferenceDateFormats: Seq[String] = Seq(
    "MM/dd/yy HH:mm:ss",
    "MM/dd/yyyy HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "MM/dd/yy",
    "MM/dd/yyyy"
  )

  def parseTimestampMulti(c: Column, formats: Seq[String] = ReferenceDateFormats): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** Empty string => NULL (reference C7: sync_ALL.py:289). */
  def emptyToNull(c: Column): Column =
    when(c === "", lit(null).cast(StringType)).otherwise(c)

  /** Lenient money parse: garbage/NULL => 0.0 (reference C8,
    * compare_historico_mensual.py:68-74 `float(x or 0)`). `try_cast`, not
    * `cast`: Spark 4's default ANSI mode makes a plain cast THROW on
    * malformed input — try_cast restores the null-on-garbage semantics the
    * reference's try/except had.
    */
  def moneyOrZero(c: Column): Column =
    coalesce(c.try_cast(DoubleType), lit(0.0))

  /** Key normalization (reference `normalize_key_value`,
    * sync_INCREMENTAL.py:211-224): trim; an integral float renders without
    * the trailing `.0`; non-numeric strings pass through. Only needed when
    * keys stay string-typed; prefer typed key columns where possible.
    */
  def normalizeKey(c: Column): Column = {
    val t = trim(c.cast(StringType))
    val asD = t.try_cast(DoubleType) // ANSI-safe: null, not throw, on non-numeric
    when(t.isNull, lit("NULL"))
      .when(asD.isNotNull && asD === asD.cast(LongType).cast(DoubleType),
        asD.cast(LongType).cast(StringType))
      .when(asD.isNotNull, asD.cast(StringType))
      .otherwise(t)
  }

  /** Cast-with-empty-null: the reference's sink-side string->type coercion
    * (C6/C7 combined): '' -> NULL -> cast(dt), cast failures -> NULL
    * (try_cast: ANSI-mode-safe).
    */
  def castClean(c: Column, dt: DataType): Column =
    emptyToNull(c.cast(StringType)).try_cast(dt)

  /** The reference's full typed-ingest step in one call: apply a target
    * schema (from `TypeInference.parseDdl` or `inferByName`) to an
    * all-string frame (`Sinks.csvScan` output). Per schema column:
    * '' → NULL → try_cast (malformed cells degrade to NULL, never throw —
    * sync_ALL.py:271-295 semantics). Schema columns missing from the frame
    * appear as typed NULLs (union-of-columns, sync_ALL.py:158-165); frame
    * columns absent from the schema pass through untouched. Name match is
    * case-insensitive, like MySQL's.
    */
  def applySchema(df: org.apache.spark.sql.DataFrame,
                  schema: StructType): org.apache.spark.sql.DataFrame = {
    // Case-colliding headers ("ID" and "Id") cannot be resolved by name
    // under Spark's case-insensitive analysis — fail loudly up front
    // instead of silently dropping one variant.
    val collisions = df.columns.groupBy(_.toLowerCase).filter(_._2.length > 1)
    require(collisions.isEmpty,
      s"applySchema: case-colliding columns ${collisions.values.flatten.mkString(", ")}")
    val have = df.columns.map(c => c.toLowerCase -> c).toMap
    val typed = schema.fields.toIndexedSeq.map { f =>
      have.get(f.name.toLowerCase) match {
        case Some(c) => (f.dataType match {
          // timestamps go through the reference's multi-format parse
          // (convert_date_value) — a plain try_cast rejects the primary
          // mdb-export formats like MM/dd/yy HH:mm:ss
          case TimestampType | TimestampNTZType =>
            parseTimestampMulti(emptyToNull(col(c).cast(StringType)))
              .cast(f.dataType)
          case dt => castClean(col(c), dt)
        }).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    val extras = df.columns.toIndexedSeq
      .filterNot(c => schema.fieldNames.exists(_.equalsIgnoreCase(c)))
      .map(col)
    df.select(typed ++ extras: _*)
  }
}
