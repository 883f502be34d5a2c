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

  test("property: gapFillDaily == in-memory spine+ffill model (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val base = java.time.LocalDate.parse("2024-01-01")
    val gen = for {
      n <- Gen.choose(1, 15)
      obs <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c")
        d <- Gen.choose(0, 20)
        v <- Gen.choose(1, 99)
      } yield (k, d, v.toDouble))
    } yield obs.distinctBy(o => (o._1, o._2)) // one observation per key-day
    val prop = Prop.forAll(gen) { obs =>
      val df = obs.map { case (k, d, v) => (k, base.plusDays(d).toString, v) }
        .toDF("k", "day", "v").withColumn("day", col("day").cast("date"))
      val got = TimeSeries.gapFillDaily(df, "k", "day", "v")
        .select(col("k"), col("day").cast("string"), col("v"), col("is_observed"))
        .as[(String, String, Double, Boolean)].collect().toSet
      val want = obs.groupBy(_._1).flatMap { case (k, os) =>
        val byDay = os.map(o => o._2 -> o._3).toMap
        val (lo, hi) = (os.map(_._2).min, os.map(_._2).max)
        var lastSeen = 0.0
        (lo to hi).map { d =>
          byDay.get(d).foreach(lastSeen = _)
          (k, base.plusDays(d).toString, lastSeen, byDay.contains(d))
        }
      }.toSet
      (got == want) :| s"obs=$obs got=$got want=$want"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("gapFillDaily: spine starts at each key's own first observation") {
    val df = Seq(("a", "2024-01-05", 5.0), ("b", "2024-01-01", 1.0))
      .toDF("k", "day", "v").withColumn("day", col("day").cast("date"))
    val out = TimeSeries.gapFillDaily(df, "k", "day", "v")
    // no fabricated days before a key's min: every filled value is defined
    assert(out.filter(col("v").isNull).count() == 0)
    assert(out.count() == 2)
  }

  test("gapFillDailyScoped: releases the input pin once the action completes") {
    val df = Seq(("a", "2024-01-01", 1.0), ("a", "2024-01-03", 3.0))
      .toDF("k", "day", "v").withColumn("day", col("day").cast("date"))
    var duringLevel: org.apache.spark.storage.StorageLevel = null
    val rows = TimeSeries.gapFillDailyScoped(df, "k", "day", "v") { filled =>
      val n = filled.count()
      duringLevel = df.storageLevel // pinned while the action runs
      n
    }
    assert(rows == 3)
    assert(duringLevel.useMemory || duringLevel.useDisk,
      s"input should be pinned during the action, was $duringLevel")
    // the pin must NOT outlive the call — same result as the merge
    // fixtures' deterministic release, no reliance on LRU
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      s"input still cached after scoped call: ${df.storageLevel}")
  }

  test("gapFillDailyScoped: unpersists even when the action throws") {
    val df = Seq(("a", "2024-01-01", 1.0))
      .toDF("k", "day", "v").withColumn("day", col("day").cast("date"))
    intercept[RuntimeException] {
      TimeSeries.gapFillDailyScoped(df, "k", "day", "v") { _ =>
        throw new RuntimeException("boom")
      }
    }
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  private def series(rows: (String, String, Double)*) =
    rows.toSeq.toDF("k", "day", "v").withColumn("day", col("day").cast("date"))

  test("anomaliesZScore flags the spike against its prior-day baseline") {
    val df = series(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-02", 12.0),
      ("a", "2024-01-03", 8.0), ("a", "2024-01-04", 10.0),
      ("a", "2024-01-05", 100.0))
    val out = TimeSeries.anomaliesZScore(df, "k", "day", "v",
      days = 28, minPoints = 4, threshold = 3.0)
      .orderBy("day")
      .select(col("n_prior"), col("z_score"), col("is_anomaly"))
      .as[(Long, Option[Double], Option[Boolean])].collect()
    // days 1-4: fewer than 4 priors -> NULL scores
    assert(out.take(4).map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.take(4).forall(r => r._2.isEmpty && r._3.isEmpty))
    // day 5: baseline mean 10, var ((0+4+4+0)/4)=2 -> z = 90/sqrt(2)
    val (n5, z5, a5) = out(4)
    assert(n5 == 4L)
    assert(math.abs(z5.get - 90.0 / math.sqrt(2.0)) < 1e-9, z5.toString)
    assert(a5.contains(true))
  }

  test("anomaliesZScore: zero-variance baseline scores NULL, not anomaly") {
    val df = series(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-02", 10.0),
      ("a", "2024-01-03", 10.0), ("a", "2024-01-04", 100.0))
    val last = TimeSeries.anomaliesZScore(df, "k", "day", "v",
      days = 28, minPoints = 3, threshold = 2.0)
      .orderBy("day").select("z_score").as[Option[Double]].collect().last
    assert(last.isEmpty, s"degenerate baseline must score NULL, got $last")
  }

  test("anomaliesZScore: observations beyond the window do not count") {
    val df = series(("a", "2024-01-01", 10.0), ("a", "2024-01-20", 10.0))
    val out = TimeSeries.anomaliesZScore(df, "k", "day", "v",
      days = 7, minPoints = 2, threshold = 2.0)
      .orderBy("day").select("n_prior").as[Long].collect()
    assert(out.toSeq == Seq(0L, 0L)) // day 20's only prior is 19 days back
  }
}
