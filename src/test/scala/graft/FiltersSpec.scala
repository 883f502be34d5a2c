package graft

import graft.operators.Filters
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("1", "a"), ("2", "b"), (null, "c"), ("", "d")
  ).toDF("baja", "v")

  test("eq / nonEmpty") {
    assert(df.filter(Filters.eq("baja", "1")).count() == 1)
    assert(df.filter(Filters.nonEmpty("baja")).count() == 2) // drops null AND ''
  }

  test("neqKeepNull keeps nulls (dict .get semantics, SURVEY §7.4 trap 3)") {
    val kept = df.filter(Filters.neqKeepNull("baja", "1")).select("v").as[String].collect().toSet
    assert(kept == Set("b", "c", "d")) // null and '' kept, only '1' dropped
  }

  test("all() conjunction; empty predicate list keeps everything") {
    assert(df.filter(Filters.all(Seq(col("v") =!= "a", col("v") =!= "b"))).count() == 2)
    assert(df.filter(Filters.all(Nil)).count() == 4)
  }

  test("semiJoinIn / antiJoinNotIn") {
    val probe = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v")
    val build = Seq((1, "ignored"), (1, "dup"), (3, "w")).toDF("bk", "bv")
    val semi = Filters.semiJoinIn(probe, "k", build.select(col("bk")), "bk")
    assert(semi.select("k").as[Int].collect().toSet == Set(1, 3))
    assert(semi.count() == 2) // build-side duplicates don't multiply rows
    val anti = Filters.antiJoinNotIn(probe, "k", build.select(col("bk")), "bk")
    assert(anti.select("k").as[Int].collect().toSeq == Seq(2))
  }
}
