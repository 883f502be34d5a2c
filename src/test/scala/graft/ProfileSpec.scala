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

  // ----- persisted HLL sketch index -----

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("hll index: write + append estimates == exact distincts (coupon-exact regime)") {
    val dir = tmp("hllidx")
    val base = (1 to 400).map(i => (i.toLong, s"u${i % 97}", s"h${i % 7}"))
      .toDF("id", "url", "host")
    val batch = (301 to 700).map(i => (i.toLong, s"u${i % 131}", s"h${i % 7}"))
      .toDF("id", "url", "host")
    Profile.hllWriteIndex(base, Seq("id", "url", "host"), dir)
    Profile.hllAppendIndex(batch, dir)
    val est = Profile.hllEstimateIndex(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val union = base.unionByName(batch)
    for (c <- Seq("id", "url", "host")) {
      val exact = union.select(countDistinct(col(c))).head.getLong(0)
      assert(est(c)._3 == exact, s"col $c: est ${est(c)._3} vs exact $exact")
      assert(est(c)._2 == 800L, s"col $c n_values")
    }
  }

  test("hll index: 8-batch merged estimate within 1% at 20k (past the coupon-exact regime)") {
    val dir = tmp("hllidx20k")
    val n = 20000
    val all = (1 to n).map(i => Tuple1(s"key$i")).toDF("k")
    // 8 batches land separately; union-of-8 must track exact n within the
    // published HLL error band (lgK=16 RSE ~0.4%; measured 19978 here —
    // the estimator leaves its exact coupon regime around 8k distincts)
    for (b <- 0 until 8) {
      val part = all.filter(abs(xxhash64(col("k"))) % 8 === b)
      if (b == 0) Profile.hllWriteIndex(part, Seq("k"), dir)
      else Profile.hllAppendIndex(part, dir)
    }
    val est = Profile.hllEstimateIndex(spark, dir)
      .as[(String, Long, Long)].head()
    assert(math.abs(est._3 - n.toLong) <= n / 100,
      s"merged estimate ${est._3} not within 1% of $n at lgK=16")
    assert(est._2 == n.toLong) // the non-NULL total stays exact always
  }

  test("hll index: compaction collapses to one row per column, estimates unchanged") {
    val dir = tmp("hllcompact")
    val d = (1 to 300).map(i => (i.toLong, s"h${i % 11}")).toDF("id", "host")
    Profile.hllWriteIndex(d, Seq("id", "host"), dir)
    for (b <- 1 to 5)
      Profile.hllAppendIndex(
        d.filter(col("id") % 5 === b % 5)
          .select((col("id") + b * 1000L).as("id"), col("host")), dir)
    val before = Profile.hllEstimateIndex(spark, dir)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val nRows = Profile.hllCompactIndex(spark, dir)
    assert(nRows == 2L, s"expected one compacted row per column, got $nRows")
    assert(spark.read.parquet(s"$dir/sketches").count() == 2L)
    val after = Profile.hllEstimateIndex(spark, dir)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(after == before, s"compaction changed estimates: $before -> $after")
    // the index stays appendable after compaction
    Profile.hllAppendIndex(
      Seq((99999L, "brand-new-host")).toDF("id", "host"), dir)
    val est = Profile.hllEstimateIndex(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(est("host") == before.find(_._1 == "host").get._3 + 1)
  }

  test("hll index: all-NULL column estimates 0; nulls excluded from n_values") {
    val dir = tmp("hllnull")
    val d = Seq((1L, Option.empty[String]), (2L, None), (3L, Some("a")))
      .toDF("id", "v")
    Profile.hllWriteIndex(d, Seq("id", "v"), dir)
    Profile.hllAppendIndex(d.filter(col("v").isNull), dir)
    val est = Profile.hllEstimateIndex(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(est("v") == (("v", 1L, 1L)))
    assert(est("id") == (("id", 5L, 3L)))
  }

  test("theta overlap: exact set algebra below k, across partitions") {
    // A = 1..3000, B = 2001..5500  ->  |A|=3000 |B|=3500 |A∩B|=1000
    val a = (1 to 3000).map(i => s"url$i").toDF("u").repartition(8)
    val b = (2001 to 5500).map(i => s"url$i").toDF("u").repartition(8)
    val r = Profile.distinctOverlap(a, "u", b, "u")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((3000L, 3500L, 5500L, 1000L, 2000L, 2500L)), r.toString)
    // set identities hold exactly in the raw-hash regime
    assert(r._3 == r._1 + r._2 - r._4)       // |A∪B| = |A|+|B|-|A∩B|
    assert(r._5 == r._1 - r._4)              // |A\B| = |A|-|A∩B|
  }

  test("theta overlap: disjoint, identical, empty sides; long keys") {
    val a = (1L to 50L).toDF("k")
    val empty = a.filter(col("k") < 0)
    val dis = Profile.distinctOverlap(a, "k", (51L to 80L).toDF("k"), "k")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(dis == ((50L, 30L, 80L, 0L, 50L, 30L)), dis.toString)
    val same = Profile.distinctOverlap(a, "k", a, "k")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(same == ((50L, 50L, 50L, 50L, 0L, 0L)), same.toString)
    val emp = Profile.distinctOverlap(a, "k", empty, "k")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(emp == ((50L, 0L, 50L, 0L, 50L, 0L)), emp.toString)
  }

  test("theta snapshots: persisted overlap equals the direct report; guards") {
    val dir = tmp("thetasnap")
    val jan = (1 to 800).map(i => s"u$i").toDF("url")
    val jun = (501 to 1200).map(i => s"u$i").toDF("url")
    Profile.thetaWriteSnapshot(jan, "url", dir, "jan")
    Profile.thetaWriteSnapshot(jun, "url", dir, "jun")
    val stored = Profile.thetaSnapshotOverlap(spark, dir, "jan", "jun")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val direct = Profile.distinctOverlap(jan, "url", jun, "url")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(stored == direct, s"$stored vs $direct")
    assert(stored == ((800L, 700L, 1200L, 300L, 500L, 400L)), stored.toString)
    // immutable-tag, missing-tag, and mixed-type guards
    val e1 = intercept[IllegalArgumentException] {
      Profile.thetaWriteSnapshot(jan, "url", dir, "jan")
    }
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Profile.thetaSnapshotOverlap(spark, dir, "jan", "nope")
    }
    assert(e2.getMessage.contains("no snapshot tagged"), e2.getMessage)
    Profile.thetaWriteSnapshot((1L to 10L).toDF("k"), "k", dir, "longs")
    val e3 = intercept[IllegalArgumentException] {
      Profile.thetaSnapshotOverlap(spark, dir, "jan", "longs")
    }
    assert(e3.getMessage.contains("key types differ"), e3.getMessage)
    // duplicated tag (racing writers passed the check-then-append guard):
    // the read side throws instead of silently picking one (ADVICE r15)
    import graft.expressions.ThetaExpressions._
    jan.agg(thetaSketchAgg(col("url"), 14).as("sk"))
      .select(lit("jan").as("tag"), lit("string").as("col_type"), col("sk"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$dir/snapshots")
    val e4 = intercept[IllegalArgumentException] {
      Profile.thetaSnapshotOverlap(spark, dir, "jan", "jun")
    }
    assert(e4.getMessage.contains("more than once"), e4.getMessage)
  }

  test("hll/kll index: create over an existing index fails loudly; " +
      "overwrite=true rebuilds deliberately (ADVICE r15)") {
    val dir = tmp("hllrecreate")
    val d = Seq(1L, 2L, 3L).toDF("id")
    Profile.hllWriteIndex(d, Seq("id"), dir)
    Profile.hllAppendIndex(Seq(4L, 5L).toDF("id"), dir)
    val e = intercept[IllegalArgumentException] {
      Profile.hllWriteIndex(d, Seq("id"), dir) // would erase the append
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // history intact after the refused create
    assert(Profile.hllEstimateIndex(spark, dir)
      .as[(String, Long, Long)].head()._3 == 5L)
    Profile.hllWriteIndex(d, Seq("id"), dir, overwrite = true)
    assert(Profile.hllEstimateIndex(spark, dir)
      .as[(String, Long, Long)].head()._3 == 3L) // deliberate rebuild
    val kdir = tmp("kllrecreate")
    Profile.kllWriteIndex(d, Seq("id"), kdir)
    val ek = intercept[IllegalArgumentException] {
      Profile.kllWriteIndex(d, Seq("id"), kdir)
    }
    assert(ek.getMessage.contains("already exists"), ek.getMessage)
    Profile.kllWriteIndex(Seq(7L).toDF("id"), Seq("id"), kdir, overwrite = true)
    assert(Profile.kllQuantilesIndex(spark, kdir, Seq(1.0))
      .select("value").as[Long].head() == 7L)
  }

  test("kll quantiles: exact order statistics below k, across partitions") {
    // 1..1000 shuffled across 8 partitions; INCLUSIVE quantile at q is
    // the smallest v with ceil(q*n) items <= v, i.e. value ceil(q*1000)
    val vals = scala.util.Random.shuffle((1 to 1000).toList)
    val df = vals.map(_.toLong).toDF("v").repartition(8)
    val out = Profile.quantileProfile(df, "v", Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0))
      .as[(Double, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0.5) == ((0.5, 500L, 1000L)), out(0.5).toString)
    assert(out(0.25)._2 == 250L && out(0.9)._2 == 900L && out(0.99)._2 == 990L)
    assert(out(0.0)._2 == 1L && out(1.0)._2 == 1000L) // min and max
    // rank is the quantile's inverse in the exact regime
    val sk = df.agg(graft.expressions.KllExpressions
        .kllSketchAgg(col("v")).as("sk"))
      .select(graft.expressions.KllExpressions
        .kllRank(col("sk"), lit(500L)).as("r"))
      .as[Double].head()
    assert(sk == 0.5, sk.toString)
  }

  test("kll shard index: write + append quantiles equal the one-shot profile") {
    val dir = tmp("kllidx")
    val all = scala.util.Random.shuffle((1 to 2000).toList).map(_.toLong)
    val (b1, rest) = all.splitAt(700)
    val (b2, b3) = rest.splitAt(600)
    Profile.kllWriteIndex(b1.toDF("len"), Seq("len"), dir)
    Profile.kllAppendIndex(b2.toDF("len"), dir)
    Profile.kllAppendIndex(b3.toDF("len"), dir)
    val fromIndex = Profile.kllQuantilesIndex(spark, dir, Seq(0.25, 0.5, 0.9))
      .select("q", "value", "n").as[(Double, Long, Long)].collect().sortBy(_._1)
    val direct = Profile.quantileProfile(all.toDF("len"), "len", Seq(0.25, 0.5, 0.9))
      .as[(Double, Long, Long)].collect().sortBy(_._1)
    assert(fromIndex.toSeq == direct.toSeq, s"$fromIndex vs $direct")
    assert(direct.map(_._2).toSeq == Seq(500L, 1000L, 1800L))
    // type drift fails loudly
    val e = intercept[IllegalArgumentException] {
      Profile.kllAppendIndex(Seq(1).toDF("len"), dir) // int vs long
    }
    assert(e.getMessage.contains("type-drifted"), e.getMessage)
  }

  test("kll quantiles: empty input yields null values; guards fail loudly") {
    val empty = (1L to 10L).toDF("v").filter(col("v") < 0)
    val out = Profile.quantileProfile(empty, "v", Seq(0.5))
      .select(col("value").isNull, col("n")).as[(Boolean, Long)].head()
    assert(out == ((true, 0L)), out.toString)
    val e1 = intercept[IllegalArgumentException] {
      Profile.quantileProfile(Seq(1.5).toDF("v"), "v", Seq(0.5))
    }
    assert(e1.getMessage.contains("integral columns only"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Profile.quantileProfile((1L to 5L).toDF("v"), "v", Seq(1.5))
    }
    assert(e2.getMessage.contains("[0,1]"), e2.getMessage)
  }

  test("theta overlap guards: mixed key types and unsketchable types fail loudly") {
    val longs = Seq(1L).toDF("k")
    val strs = Seq("1").toDF("k")
    val e1 = intercept[IllegalArgumentException] {
      Profile.distinctOverlap(longs, "k", strs, "k")
    }
    assert(e1.getMessage.contains("key types differ"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Profile.distinctOverlap(Seq(1.5).toDF("k"), "k", Seq(2.5).toDF("k"), "k")
    }
    assert(e2.getMessage.contains("hll_sketch_agg accepts"), e2.getMessage)
  }

  test("property: randomized batches estimate exactly at bounded cardinality") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val batchGen = Gen.listOfN(3,
      Gen.listOfN(200, Gen.chooseNum(1, 900).map(i => s"key$i")))
    val prop = Prop.forAll(batchGen) { batches =>
      val dir = tmp("hllprop")
      batches.zipWithIndex.foreach { case (b, i) =>
        val df = b.map(Tuple1(_)).toDF("k")
        if (i == 0) Profile.hllWriteIndex(df, Seq("k"), dir)
        else Profile.hllAppendIndex(df, dir)
      }
      val est = Profile.hllEstimateIndex(spark, dir)
        .as[(String, Long, Long)].head()
      val exact = batches.flatten.distinct.size.toLong
      val total = batches.map(_.size).sum.toLong
      ((est._3 == exact) :| s"estimate ${est._3} != exact $exact") &&
        ((est._2 == total) :| s"n_values ${est._2} != $total")
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("hll index: float column, bad lgK, missing column, missing sidecar all fail loudly") {
    val dir = tmp("hllguard")
    val d = Seq((1L, 1.5)).toDF("id", "x")
    val e1 = intercept[IllegalArgumentException] {
      Profile.hllWriteIndex(d, Seq("x"), dir)
    }
    assert(e1.getMessage.contains("hll_sketch_agg accepts"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Profile.hllWriteIndex(d, Seq("id"), dir, lgK = 25)
    }
    assert(e2.getMessage.contains("[4, 21]"), e2.getMessage)
    Profile.hllWriteIndex(d, Seq("id"), dir)
    val e3 = intercept[IllegalArgumentException] {
      Profile.hllAppendIndex(Seq(Tuple1("z")).toDF("other"), dir)
    }
    assert(e3.getMessage.contains("no such column"), e3.getMessage)
    // type drift: same column name at a different type must fail loudly —
    // a string "42" and a long 42 hash to different sketch entries, so a
    // silent append would inflate every later estimate
    val e5 = intercept[IllegalArgumentException] {
      Profile.hllAppendIndex(Seq(Tuple1("42")).toDF("id"), dir)
    }
    assert(e5.getMessage.contains("type-drifted"), e5.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      Profile.hllEstimateIndex(spark, tmp("hllempty"))
    }
    assert(e4.getMessage.contains("not a sketch index"), e4.getMessage)
  }
}
