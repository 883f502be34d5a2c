package graft

import graft.operators.{Aggregates, Reconcile}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val li = Seq(
    (ts("2024-01-05 00:00:00"), 10.0, "A"),
    (ts("2024-01-20 00:00:00"), 20.0, "B"),
    (ts("2024-02-01 00:00:00"), 5.5, "A"),
    (null.asInstanceOf[Timestamp], 99.0, "A") // null date excluded by A1
  ).toDF("d", "amt", "st")

  test("monthlyAgg: per-month count + exact decimal sums, null dates excluded") {
    val m = Reconcile.monthlyAgg(li, "d", Seq("amt")).orderBy("month")
      .as[(String, Long, Double)].collect().toSeq
    assert(m == Seq(("2024-01", 2L, 30.0), ("2024-02", 1L, 5.5)))
  }

  test("alignDiff: full-outer with zero defaults") {
    val a = Seq(("2024-01", 5L), ("2024-02", 3L)).toDF("month", "n")
    val b = Seq(("2024-02", 1L), ("2024-03", 7L)).toDF("month", "n")
    val d = Reconcile.alignDiff(a, b, "month", "n").orderBy("month")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(d == Seq(("2024-01", 5L, 0L, 5L), ("2024-02", 3L, 1L, 2L), ("2024-03", 0L, 7L, -7L)))
  }

  test("orphanKeys both directions") {
    val a = Seq("k1", "k2", "k3").toDF("ka")
    val b = Seq("k2").toDF("kb")
    assert(Reconcile.orphanKeys(a, "ka", b, "kb").as[String].collect().toSet == Set("k1", "k3"))
    assert(Reconcile.orphanKeys(b, "kb", a, "ka").count() == 0)
  }

  test("orphanKeysBoth: one report, direction-tagged, both sides contribute") {
    val a = Seq(1L, 2L, 3L).toDF("ka")
    val b = Seq(2L, 9L).toDF("kb")
    val out = Reconcile.orphanKeysBoth(a, "ka", b, "kb")
      .as[(String, String)].collect().toSet
    assert(out == Set(("1", "only_in_a"), ("3", "only_in_a"), ("9", "only_in_b")))
  }

  test("topKByCount deterministic tiebreak") {
    val df = Seq("x", "x", "y", "y", "z").toDF("v")
    val top = Reconcile.topKByCount(df, col("v"), 2).as[(String, Long)].collect().toSeq
    assert(top == Seq(("x", 2L), ("y", 2L))) // tie x/y broken by key asc
  }

  test("monthStateCounts and pivot agree") {
    val long = Aggregates.monthStateCounts(li, "d", "st")
      .as[(String, String, Long)].collect().toSet
    assert(long == Set(("2024-01", "A", 1L), ("2024-01", "B", 1L), ("2024-02", "A", 1L)))
    val wide = Aggregates.monthStatePivot(li, "d", "st", Seq("A", "B")).orderBy("month")
      .as[(String, Long, Long)].collect().toSeq
    assert(wide == Seq(("2024-01", 1L, 1L), ("2024-02", 1L, 0L)))
  }

  test("globalSums exact decimal totals with derived debt") {
    val g = Aggregates.globalSums(li, "amt", "amt")
    val row = g.select(col("total_charged").cast("double"), col("total_debt").cast("double"),
      col("n_rows")).as[(Double, Double, Long)].head()
    assert(row == ((134.5, 0.0, 4L)))
  }

  test("dateProfile: min/max/distinct-days") {
    val p = Aggregates.dateProfile(li, "d")
      .select(col("first_day").cast("string"), col("last_day").cast("string"),
        col("n_days"), col("n_rows"))
      .as[(String, String, Long, Long)].head()
    assert(p == (("2024-01-05", "2024-02-01", 3L, 3L)))
  }

  test("lastKMonths keeps the k latest re-sorted ascending") {
    val m = Seq(("2024-01", 1L), ("2024-02", 2L), ("2024-03", 3L)).toDF("month", "n")
    assert(Aggregates.lastKMonths(m, "month", 2).as[(String, Long)].collect().toSeq
      == Seq(("2024-02", 2L), ("2024-03", 3L)))
  }

  test("unionDistinct / intersectKeys / valueCounts") {
    val a = Seq("x", "y").toDF("k")
    val b = Seq("y", "z").toDF("k")
    assert(Aggregates.unionDistinct(a, b, "k").as[String].collect().toSet == Set("x", "y", "z"))
    assert(Aggregates.intersectKeys(a, b, "k").as[String].collect().toSeq == Seq("y"))
    val vc = Aggregates.valueCounts(Seq("p", "p", "q").toDF("v"), col("v"))
      .as[(String, Long)].collect().toMap
    assert(vc == Map("p" -> 2L, "q" -> 1L))
  }

  test("rollingDailyAgg: trailing range window skips calendar gaps correctly") {
    val df = Seq(
      ("2024-01-01", 10.0), ("2024-01-02", 20.0),
      ("2024-01-05", 40.0) // 2-day gap: the 3-day window at Jan 5 sees only Jan 5
    ).toDF("d", "v").withColumn("d", to_date(col("d")))
    val out = Aggregates.rollingDailyAgg(df, "d", "v", days = 3)
      .select(col("day").cast("string"), col("day_total"),
        col("total_3d"), col("avg_3d"))
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("2024-01-01", 10.0, 10.0, 10.0),
      ("2024-01-02", 20.0, 30.0, 15.0),  // Jan 1 within 3 days
      ("2024-01-05", 40.0, 40.0, 40.0)   // Jan 2 is 3 days back -> outside
    ), out.mkString(", "))
  }

  test("topKPerGroup keeps k per group and plans with WindowGroupLimit") {
    val df = Seq(("a", 1L, 30L), ("a", 2L, 20L), ("a", 3L, 10L),
      ("b", 4L, 5L)).toDF("g", "id", "score")
    val top = Aggregates.topKPerGroup(df, Seq("g"),
      Seq(col("score").desc, col("id").asc), k = 2)
    assert(top.select("id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    // the scale claim: rank<=k is pushed below the shuffle as a map-side
    // per-group limit — a regression to a full-window sort loses the node
    assert(top.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      top.queryExecution.executedPlan.toString)
  }
}
