package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured extraction: typed field pull-out from a JSON string
  * column (the reference keeps event properties as an opaque JSON text
  * field — `events.props` in the fixture mirrors that shape).
  *
  * `from_json` is a codegen'd native expression, so extraction runs
  * map-side at scan speed — no UDF, no shuffle — and Catalyst prunes the
  * parse away entirely for queries that never touch the extracted fields.
  */
object SemiStructured {

  /** Parse `jsonCol` against a DDL schema ("k INT, tag STRING") and
    * surface each field as a top-level typed column. Malformed documents
    * yield NULL fields (PERMISSIVE semantics — the lenient-parse
    * convention the rest of the cast family follows, e.g.
    * [[graft.functions.Normalize]]'s money parser). Field names that
    * collide with existing columns fail loudly up front instead of
    * silently shadowing.
    */
  def parseJson(df: DataFrame, jsonCol: String, ddl: String): DataFrame = {
    val schema = StructType.fromDDL(ddl)
    // case-INSENSITIVE clash check: withColumn resolves case-insensitively
    // under the default spark.sql.caseSensitive=false, so a field "ID"
    // would silently overwrite an existing "id" past an exact-string guard
    val existing = df.columns.map(_.toLowerCase).toSet
    val clash = schema.fieldNames.filter(f => existing.contains(f.toLowerCase))
    require(clash.isEmpty,
      s"parseJson: extracted fields ${clash.toSet} already exist " +
        "(case-insensitive) — rename first")
    val parsed = df.withColumn("__parsed",
      from_json(col(jsonCol), schema))
    schema.fieldNames
      .foldLeft(parsed)((d, f) => d.withColumn(f, col(s"__parsed.$f")))
      .drop("__parsed")
  }

  /** Infer the JSON column's schema from a bounded sample via Spark's own
    * JSON reader (the idiomatic inference path — no hand-rolled parser).
    * `sampleRows` bounds the scan: inference cost is O(sample), never
    * O(corpus), so this is safe to call on a 100 TB table. The returned
    * schema feeds [[parseJson]] via `.toDDL`.
    */
  def inferJsonSchema(df: DataFrame, jsonCol: String,
                      sampleRows: Int = 1000): StructType =
    df.sparkSession.read
      .json(df.select(col(jsonCol)).limit(sampleRows).as(Encoders.STRING))
      .schema
}
