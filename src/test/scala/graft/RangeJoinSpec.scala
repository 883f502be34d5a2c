package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 99L),  // 99: no interval
    (4L, "b", 10L), (5L, "b", 25L)
  ).toDF("pid", "k", "t")

  private val ivs = Seq(
    ("a", 0L, 9L, "i1"),    // bucket width 10: covers buckets 0..0
    ("a", 10L, 30L, "i2"),  // boundary: t=10 contained inclusively
    ("b", 20L, 29L, "i3")
  ).toDF("k", "s", "e", "name")

  test("intervalJoin: containment matches, boundaries inclusive, no-match drops") {
    val out = RangeJoin.intervalJoin(points, ivs, Seq("k"), "t", "s", "e",
        bucketWidth = 10)
      .select("pid", "name").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "i1"), (2L, "i2"), (5L, "i3")))
  }

  test("intervalJoin: bucket edges never lose a contained point") {
    // interval crossing many buckets; points at the exact start/end
    val p = Seq((1L, "x", 15L), (2L, "x", 44L), (3L, "x", 45L)).toDF("pid", "k", "t")
    val i = Seq(("x", 15L, 44L, "w")).toDF("k", "s", "e", "name")
    val out = RangeJoin.intervalJoin(p, i, Seq("k"), "t", "s", "e", bucketWidth = 7)
      .select("pid").as[Long].collect().toSet
    assert(out == Set(1L, 2L)) // 45 is one past the inclusive end
  }

  test("intervalJoin: timestamp columns bucket on epoch seconds") {
    val p = Seq((1L, "a", "2024-01-01 00:00:30"), (2L, "a", "2024-01-02 12:00:00"))
      .toDF("pid", "k", "t").withColumn("t", col("t").cast("timestamp"))
    val i = Seq(("a", "2024-01-01 00:00:00", "2024-01-01 23:59:59", "d1"),
        ("a", "2024-01-02 00:00:00", "2024-01-02 23:59:59", "d2"))
      .toDF("k", "s", "e", "name")
      .withColumn("s", col("s").cast("timestamp"))
      .withColumn("e", col("e").cast("timestamp"))
    val out = RangeJoin.intervalJoin(p, i, Seq("k"), "t", "s", "e",
        bucketWidth = 3600).select("pid", "name").as[(Long, String)]
      .collect().toSet
    assert(out == Set((1L, "d1"), (2L, "d2")))
  }

  test("intervalJoin: date points against timestamp intervals bucket in one unit") {
    // Regression: DateType used to bucket on epoch SECONDS while timestamps
    // bucket on epoch MICROS — cross-type joins matched nothing and
    // date/date sides all collapsed into bucket 0 (per-key cartesian).
    val p = Seq((1L, "a", "2024-01-01"), (2L, "a", "2024-01-03"),
        (3L, "a", "2024-02-01"))
      .toDF("pid", "k", "t").withColumn("t", col("t").cast("date"))
    val i = Seq(("a", "2023-12-31 00:00:00", "2024-01-02 23:59:59", "w1"),
        ("a", "2024-01-03 00:00:00", "2024-01-04 00:00:00", "w2"))
      .toDF("k", "s", "e", "name")
      .withColumn("s", col("s").cast("timestamp"))
      .withColumn("e", col("e").cast("timestamp"))
    val out = RangeJoin.intervalJoin(p, i, Seq("k"), "t", "s", "e",
        bucketWidth = 86400).select("pid", "name").as[(Long, String)]
      .collect().toSet
    assert(out == Set((1L, "w1"), (2L, "w2")))
  }

  test("intervalJoin: date/date sides spread across buckets (no bucket-0 collapse)") {
    val p = Seq((1L, "a", "2024-01-01"), (2L, "a", "2024-01-15"),
        (3L, "a", "2024-03-01")).toDF("pid", "k", "t")
      .withColumn("t", col("t").cast("date"))
    val i = Seq(("a", "2024-01-01", "2024-01-20", "jan"),
        ("a", "2024-02-25", "2024-03-05", "mar"))
      .toDF("k", "s", "e", "name")
      .withColumn("s", col("s").cast("date"))
      .withColumn("e", col("e").cast("date"))
    // bucketWidth = 1 week of seconds: a date maps to day*86400e6/width
    val out = RangeJoin.intervalJoin(p, i, Seq("k"), "t", "s", "e",
        bucketWidth = 7 * 86400, maxBucketsPerInterval = 16)
      .select("pid", "name").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "jan"), (2L, "jan"), (3L, "mar")))
    // and the buckets genuinely differ: a 2-month gap at weekly width must
    // put jan and mar intervals in disjoint bucket ranges (collapse to a
    // single shared bucket would make the equi-join a per-key cartesian)
    val bkts = RangeJoin.intervalJoin(p, i, Seq("k"), "t", "s", "e",
        bucketWidth = 7 * 86400, maxBucketsPerInterval = 16).count()
    assert(bkts == 3)
  }

  test("intervalJoin: plans as an equi join, never a nested loop") {
    // The operator's entire reason to exist: a containment predicate alone
    // gives Spark no equi-key and degenerates to BroadcastNestedLoopJoin /
    // CartesianProduct — O(points × intervals) at 100 TB. Pin the rewrite.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = RangeJoin.intervalJoin(points, ivs, Seq("k"), "t", "s", "e",
        bucketWidth = 10).queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("intervalJoin: fanout guard trips on oversized intervals") {
    // The guard is a per-row in-plan check (no extra interval-side pass),
    // so it surfaces at ACTION time, wrapped in Spark's task failure.
    val i = Seq(("x", 0L, 1000000L, "huge")).toDF("k", "s", "e", "name")
    val ex = intercept[Exception] {
      RangeJoin.intervalJoin(points.withColumnRenamed("k", "k2")
          .withColumnRenamed("pid", "pid2").withColumnRenamed("k2", "k"),
        i, Seq("k"), "t", "s", "e", bucketWidth = 10,
        maxBucketsPerInterval = 100).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("buckets") && m.contains("raise bucketWidth")), ex.toString)
  }

  test("property: intervalJoin == BETWEEN theta join on random data (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    // Negative coordinates included deliberately: floor division must keep
    // bucketing monotone below zero (a truncating division would not).
    val gen = for {
      nP <- Gen.choose(1, 20)
      nI <- Gen.choose(1, 12)
      width <- Gen.oneOf(1L, 3L, 10L)
      pts <- Gen.listOfN(nP, for {
        k <- Gen.oneOf("a", "b"); t <- Gen.choose(-50L, 100L)
      } yield (k, t))
      ivs <- Gen.listOfN(nI, for {
        k <- Gen.oneOf("a", "b")
        s <- Gen.choose(-50L, 100L)
        len <- Gen.choose(0L, 40L)
      } yield (k, s, s + len))
    } yield (pts, ivs, width)
    val prop = Prop.forAll(gen) { case (pts, ivsIn, width) =>
      val p = pts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("pid", "k", "t")
      val iv = ivsIn.zipWithIndex.map { case ((k, s, e), i) => (k, s, e, i.toLong) }
        .toDF("k", "s", "e", "iid")
      val got = RangeJoin.intervalJoin(p, iv, Seq("k"), "t", "s", "e",
          bucketWidth = width, maxBucketsPerInterval = 200)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = p.join(iv, p("k") === iv("k") &&
          p("t") >= iv("s") && p("t") <= iv("e"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      (got == want) :| s"width=$width got=$got want=$want pts=$pts ivs=$ivsIn"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("intervalJoin: reversed intervals drop like BETWEEN, never explode") {
    // end < start matches nothing under BETWEEN; Spark's sequence() would
    // count DOWN through the whole reversed span — a 1e9-element array per
    // row — unless the guard routes reversed spans to NULL.
    val i = Seq(("a", 1000000000L, 0L, "reversed"), ("a", 5L, 15L, "ok"))
      .toDF("k", "s", "e", "name")
    val p = Seq((1L, "a", 10L)).toDF("pid", "k", "t")
    val out = RangeJoin.intervalJoin(p, i, Seq("k"), "t", "s", "e",
        bucketWidth = 10, maxBucketsPerInterval = 100)
      .select("pid", "name").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "ok")))
  }

  test("intervalJoin: NULL-bounded intervals are dropped, not errored") {
    val i = Seq(("a", Some(0L), Some(100L), "ok"),
        ("a", None, Some(50L), "null-start"))
      .toDF("k", "s", "e", "name")
    val p = Seq((1L, "a", 10L)).toDF("pid", "k", "t")
    val out = RangeJoin.intervalJoin(p, i, Seq("k"), "t", "s", "e",
        bucketWidth = 10, maxBucketsPerInterval = 100)
      .select("pid", "name").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "ok")))
  }
}
