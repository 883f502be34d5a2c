package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, Some("b"), None),
    (3L, None, Some(10.0)),
    (4L, Some("a"), Some(30.0))
  ).toDF("id", "s", "x")

  test("profileTable computes per-column nulls, distincts, min/max") {
    val p = Profile.profileTable(df)
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_value",
        "max_value")
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(p("id") == ("id", 4L, 0L, 4L, "1", "4"))
    assert(p("s") == ("s", 4L, 1L, 2L, "a", "b"))
    assert(p("x") == ("x", 4L, 1L, 2L, "10.0", "30.0"))
  }

  test("column subset prunes; approx tracks exact on small data") {
    val p = Profile.profileTable(df, Seq("s"))
      .as[(String, Long, Long, Long, Long, String, String)].collect()
    assert(p.length == 1 && p(0)._1 == "s")
    assert(p(0)._5 == p(0)._4) // HLL exact at these cardinalities
  }

  test("all-NULL column: zero distincts, NULL min/max") {
    val n = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "v")
    val p = Profile.profileTable(n, Seq("v"))
      .select(col("n_nulls"), col("n_distinct"), col("min_value").isNull)
      .as[(Long, Long, Boolean)].head()
    assert(p == ((2L, 0L, true)))
  }

  test("unknown column fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Profile.profileTable(df, Seq("nope"))
    }
    assert(e.getMessage.contains("no such column"), e.getMessage)
  }
}
