package graft

import graft.operators.SemiStructured
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SemiStructuredSpec extends SparkSpec {
  import spark.implicits._

  test("parseJson extracts typed fields; malformed rows go NULL, not boom") {
    val df = Seq(
      (1L, """{"k": 7, "tag": "x"}"""),
      (2L, """{"k": 9}"""),
      (3L, """not json at all"""),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "props")
    val out = SemiStructured.parseJson(df, "props", "k INT, tag STRING")
      .orderBy("id").collect()
    assert(out(0).getAs[Int]("k") == 7 && out(0).getAs[String]("tag") == "x")
    assert(out(1).getAs[Int]("k") == 9 && out(1).isNullAt(out(1).fieldIndex("tag")))
    assert(out(2).isNullAt(out(2).fieldIndex("k")))
    assert(out(3).isNullAt(out(3).fieldIndex("k")))
    // typed, not string: downstream arithmetic works without casts
    assert(SemiStructured.parseJson(df, "props", "k INT, tag STRING")
      .schema("k").dataType == IntegerType)
  }

  test("parseJson refuses field names that shadow existing columns") {
    val df = Seq((1L, """{"id": 5}""")).toDF("id", "props")
    val ex = intercept[IllegalArgumentException] {
      SemiStructured.parseJson(df, "props", "id INT")
    }
    assert(ex.getMessage.contains("already exist"))
    // case-INSENSITIVE: withColumn resolves case-insensitively by default,
    // so "ID" would silently overwrite "id" past an exact-string guard
    val ex2 = intercept[IllegalArgumentException] {
      SemiStructured.parseJson(df, "props", "ID INT")
    }
    assert(ex2.getMessage.contains("already exist"))
  }

  test("inferJsonSchema recovers field types from a bounded sample") {
    val df = Seq(
      """{"k": 1, "name": "a", "score": 0.5}""",
      """{"k": 2, "name": "b", "score": 1.5}"""
    ).toDF("props")
    val schema = SemiStructured.inferJsonSchema(df, "props")
    assert(schema("k").dataType == LongType)
    assert(schema("name").dataType == StringType)
    assert(schema("score").dataType == DoubleType)
    // inferred schema round-trips through parseJson via toDDL
    val out = SemiStructured.parseJson(df, "props", schema.toDDL)
    assert(out.select(sum("k")).as[Long].head() == 3L)
  }
}
