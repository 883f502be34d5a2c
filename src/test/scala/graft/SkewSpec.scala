package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 900 rows of key 1, a few others
  private lazy val probe = ((1 to 900).map(i => (1, s"p$i")) ++
    Seq((2, "x"), (3, "y"))).toDF("k", "pv")
  private lazy val build = Seq((1, "B1"), (2, "B2"), (4, "B4")).toDF("k", "bv")

  test("saltedJoin equals the unsalted join (inner and left)") {
    for (jt <- Seq("inner", "left")) {
      val plain = probe.join(build, Seq("k"), jt)
        .select("k", "pv", "bv").collect().map(_.toString).sorted
      val salted = Skew.saltedJoin(probe, build, Seq("k"), salt = 8, joinType = jt)
        .select("k", "pv", "bv").collect().map(_.toString).sorted
      assert(salted.toSeq == plain.toSeq, s"join type $jt")
    }
  }

  test("saltedCountSum equals the direct aggregation") {
    val df = probe.withColumn("amt", col("k").cast("double") * 1.5)
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("amt").cast("decimal(18,4)")).cast("double").as("sum_amt"))
      .as[(Int, Long, Double)].collect().toSet
    val salted = Skew.saltedCountSum(df, Seq("k"), Seq("amt"), salt = 8)
      .as[(Int, Long, Double)].collect().toSet
    assert(salted == direct)
  }

  test("hotColdJoin equals the plain join (inner and left)") {
    // threshold 100: key 1 (900 rows) is hot, keys 2/3 are cold; build has
    // a no-match key (4) and probe key 3 has no build row — both paths and
    // both unmatched directions exercised.
    for (jt <- Seq("inner", "left")) {
      val plain = probe.join(build, Seq("k"), jt)
        .select("k", "pv", "bv").collect().map(_.toString).sorted
      val split = Skew.hotColdJoin(probe, build, Seq("k"),
        hotThreshold = 100, joinType = jt)
        .select("k", "pv", "bv").collect().map(_.toString).sorted
      assert(split.toSeq == plain.toSeq, s"join type $jt")
    }
  }

  test("hotColdJoin with no hot keys degrades to the plain join") {
    val split = Skew.hotColdJoin(probe, build, Seq("k"), hotThreshold = 10000)
      .select("k", "pv", "bv").collect().map(_.toString).sorted
    val plain = probe.join(build, Seq("k"))
      .select("k", "pv", "bv").collect().map(_.toString).sorted
    assert(split.toSeq == plain.toSeq)
  }

  test("hotColdJoin guardrail trips when the hot set will not broadcast") {
    val e = intercept[IllegalArgumentException] {
      Skew.hotColdJoin(probe, build, Seq("k"), hotThreshold = 1, maxHotKeys = 2)
    }
    assert(e.getMessage.contains("hot keys exceed"), e.getMessage)
  }

  test("skewProfile surfaces the hot key first") {
    val prof = Skew.skewProfile(probe, Seq("k"), 2)
      .as[(Int, Long, Double)].collect()
    assert(prof.head._1 == 1 && prof.head._2 == 900L)
    assert(math.abs(prof.head._3 - 900.0 / 902.0) < 1e-12)
  }

  test("salting actually spreads the hot key across salt buckets") {
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(8)).cast("int"))
    val buckets = salted.filter(col("k") === 1).select("__salt").distinct().count()
    assert(buckets >= 6, s"expected hot key spread over most of 8 buckets, got $buckets")
  }
}
