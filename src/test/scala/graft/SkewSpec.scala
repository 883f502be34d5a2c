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

  test("hotKeyEstimates matches exact counts, zero for absent keys, deterministic") {
    // 1 hot key (500 rows), a spread of cold keys, one candidate absent
    val fact = ((1 to 500).map(_ => 7L) ++ (1L to 50L).flatMap(k => Seq.fill(3)(k)))
      .toDF("k")
    val cands = (1L to 50L).toDF("c").unionByName(Seq(7L, 999L).toDF("c"))
    val est = Skew.hotKeyEstimates(fact, "k", cands, "c")
      .as[(Long, Long)].collect().toMap
    assert(est(7L) == 503L, s"hot key: ${est(7L)}") // 500 + 3 from the spread
    (1L to 50L).filter(_ != 7L).foreach(k =>
      assert(est(k) == 3L, s"cold key $k: ${est(k)}"))
    assert(est(999L) == 0L, "absent candidate must estimate 0")
    val again = Skew.hotKeyEstimates(fact, "k", cands, "c")
      .as[(Long, Long)].collect().toMap
    assert(again == est, "fixed seed must make the estimate deterministic")
  }

  test("hotKeyEstimates guards: non-integral key, bad eps, candidate cap") {
    val fact = Seq(1.5, 2.5).toDF("k")
    val cands = Seq(1L).toDF("c")
    val e1 = intercept[IllegalArgumentException] {
      Skew.hotKeyEstimates(fact, "k", cands, "c")
    }
    assert(e1.getMessage.contains("integral keys only"), e1.getMessage)
    val factI = Seq(1L, 2L).toDF("k")
    val e2 = intercept[IllegalArgumentException] {
      Skew.hotKeyEstimates(factI, "k", cands, "c", eps = 0.0)
    }
    assert(e2.getMessage.contains("eps"), e2.getMessage)
    val bigCands = (1L to 4097L).toDF("c")
    val e3 = intercept[IllegalArgumentException] {
      Skew.hotKeyEstimates(factI, "k", bigCands, "c")
    }
    assert(e3.getMessage.contains("4096"), e3.getMessage)
    // empty fact: every candidate estimates 0 instead of failing
    val empty = Skew.hotKeyEstimates(factI.filter(col("k") < 0), "k",
        Seq(1L, 2L).toDF("c"), "c")
      .as[(Long, Long)].collect().toMap
    assert(empty == Map(1L -> 0L, 2L -> 0L))
    // NULL candidates (nullable dimension keys) drop instead of NPE-ing
    val withNull = Skew.hotKeyEstimates(factI, "k",
        Seq(Some(1L), None, Some(2L)).toDF("c"), "c")
      .as[(Long, Long)].collect().toMap
    assert(withNull.keySet == Set(1L, 2L), withNull.toString)
  }

  test("property: CMS never undercounts; exact at bounded cardinality") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val multisetGen = Gen.listOfN(400, Gen.chooseNum(1L, 60L))
    val prop = Prop.forAll(multisetGen) { keys =>
      val fact = keys.toDF("k")
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cands = (1L to 60L).toDF("c")
      val est = Skew.hotKeyEstimates(fact, "k", cands, "c")
        .as[(Long, Long)].collect().toMap
      val under = est.filter { case (k, e) => e < exact.getOrElse(k, 0L) }
      val off = est.filter { case (k, e) => e != exact.getOrElse(k, 0L) }
      (under.isEmpty :| s"CMS undercounted: ${under.take(3)}") &&
        (off.isEmpty :| s"collision at 60 keys (should be ~impossible): ${off.take(3)}")
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
  test("cms index: write + append estimates == one-shot exact counts; " +
      "compact preserves; guards fail loudly") {
    // late r16: the persisted frequency index — CMS is linear, so
    // merged per-batch sketches ARE the one-shot sketch; at fixture
    // cardinality the fixed-seed estimate equals the exact count.
    def tmp() = java.nio.file.Files
      .createTempDirectory("graft-cmsidx").toString
    val dir = tmp()
    val b1 = Seq.fill(5)(7L) ++ Seq.fill(3)(9L) ++ Seq(11L)
    val b2 = Seq.fill(4)(7L) ++ Seq.fill(2)(13L)
    Skew.cmsWriteIndex(b1.toDF("k"), "k", dir)
    Skew.cmsAppendIndex(b2.toDF("k"), dir)
    val cands = Seq(7L, 9L, 11L, 13L, 99L).toDF("key")
    def est() = Skew.cmsEstimateIndex(spark, dir, cands, "key")
      .as[(Long, Long)].collect().toMap
    val expected = Map(7L -> 9L, 9L -> 3L, 11L -> 1L, 13L -> 2L, 99L -> 0L)
    assert(est() == expected, est().toString)
    // compaction is the merge itself: one row, same answers
    assert(Skew.cmsCompactIndex(spark, dir) == 1L)
    assert(spark.read.parquet(s"$dir/sketches").count() == 1L)
    assert(est() == expected, s"post-compact: ${est()}")
    // appends continue after compaction
    Skew.cmsAppendIndex(Seq(99L, 99L).toDF("k"), dir)
    assert(est()(99L) == 2L)
    // guards: create-over-existing, type drift, missing sidecar,
    // non-integral key
    val e1 = intercept[IllegalArgumentException] {
      Skew.cmsWriteIndex(b1.toDF("k"), "k", dir)
    }
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Skew.cmsAppendIndex(Seq(1).toDF("k"), dir) // int vs long
    }
    assert(e2.getMessage.contains("type-drifted"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Skew.cmsEstimateIndex(spark, tmp(), cands, "key")
    }
    assert(e3.getMessage.contains("not a CMS index"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      Skew.cmsWriteIndex(Seq(1.5).toDF("k"), "k", tmp())
    }
    assert(e4.getMessage.contains("integral keys only"), e4.getMessage)
    // deliberate rebuild drops the history
    Skew.cmsWriteIndex(Seq(7L).toDF("k"), "k", dir, overwrite = true)
    assert(est() == Map(7L -> 1L, 9L -> 0L, 11L -> 0L, 13L -> 0L, 99L -> 0L))
    // an index of EMPTY batches estimates 0 everywhere (the aggregate
    // returns an EMPTY sketch for empty input, which merges as a no-op)
    val dir2 = tmp()
    Skew.cmsWriteIndex(b1.toDF("k").limit(0), "k", dir2)
    assert(Skew.cmsEstimateIndex(spark, dir2, cands, "key")
      .as[(Long, Long)].collect().forall(_._2 == 0L))
    assert(Skew.cmsCompactIndex(spark, dir2) == 1L)
    assert(Skew.cmsEstimateIndex(spark, dir2, cands, "key")
      .as[(Long, Long)].collect().forall(_._2 == 0L))
  }
}

