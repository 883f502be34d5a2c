package graft

import graft.functions.Normalize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** C1/C5/C7/C8 semantics, including the ANSI-mode trap: every parse must be
  * null-on-garbage, never throw (reference try/except ladders).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String = {
    val r = Seq(1).toDF("x").select(c.cast(StringType).as("r")).as[String].collect()
    Option(r.head).orNull
  }

  test("parseTimestampMulti: each reference format parses; garbage is null") {
    def p(s: String): String =
      one(Normalize.parseTimestampMulti(lit(s)))
    assert(p("03/15/2024 10:30:00") == "2024-03-15 10:30:00")
    assert(p("2024-03-15 10:30:00") == "2024-03-15 10:30:00")
    assert(p("03/15/2024") == "2024-03-15 00:00:00")
    assert(p("not a date") == null)
    assert(p("13/45/2024") == null) // out-of-range month/day
  }

  test("moneyOrZero: numeric passes, garbage and null => 0.0") {
    assert(one(Normalize.moneyOrZero(lit("12.5"))) == "12.5")
    assert(one(Normalize.moneyOrZero(lit("garbage"))) == "0.0")
    assert(one(Normalize.moneyOrZero(lit(null).cast(StringType))) == "0.0")
  }

  test("emptyToNull") {
    assert(one(Normalize.emptyToNull(lit(""))) == null)
    assert(one(Normalize.emptyToNull(lit("x"))) == "x")
  }

  test("normalizeKey: integral floats lose the .0, strings pass through") {
    assert(one(Normalize.normalizeKey(lit("17.0"))) == "17")
    assert(one(Normalize.normalizeKey(lit("17.5"))) == "17.5")
    assert(one(Normalize.normalizeKey(lit("  abc  "))) == "abc")
    assert(one(Normalize.normalizeKey(lit(null).cast(StringType))) == "NULL")
    assert(one(Normalize.normalizeKey(lit("007"))) == "7") // canonical numeric form
  }

  test("castClean: empty => null => typed null; garbage => null not throw") {
    assert(one(Normalize.castClean(lit(""), IntegerType)) == null)
    assert(one(Normalize.castClean(lit("42"), IntegerType)) == "42")
    assert(one(Normalize.castClean(lit("x"), IntegerType)) == null)
  }
}
