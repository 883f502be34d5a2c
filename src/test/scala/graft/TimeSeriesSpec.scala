package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillDaily: densifies per-key spans and forward-fills gaps") {
    val df = Seq(
      ("a", "2024-01-01", 1.0),
      ("a", "2024-01-04", 4.0),   // gap 01-02/01-03 -> filled with 1.0
      ("b", "2024-02-10", 9.0)    // single day: spine of one, nothing fabricated
    ).toDF("k", "day", "v").withColumn("day", col("day").cast("date"))
    val rows = TimeSeries.gapFillDaily(df, "k", "day", "v")
      .orderBy("k", "day")
      .select(col("k"), col("day").cast("string"), col("v"), col("is_observed"))
      .as[(String, String, Double, Boolean)].collect().toSeq
    assert(rows == Seq(
      ("a", "2024-01-01", 1.0, true),
      ("a", "2024-01-02", 1.0, false),
      ("a", "2024-01-03", 1.0, false),
      ("a", "2024-01-04", 4.0, true),
      ("b", "2024-02-10", 9.0, true)))
  }

  test("gapFillDaily: spine starts at each key's own first observation") {
    val df = Seq(("a", "2024-01-05", 5.0), ("b", "2024-01-01", 1.0))
      .toDF("k", "day", "v").withColumn("day", col("day").cast("date"))
    val out = TimeSeries.gapFillDaily(df, "k", "day", "v")
    // no fabricated days before a key's min: every filled value is defined
    assert(out.filter(col("v").isNull).count() == 0)
    assert(out.count() == 2)
  }
}
