package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("property: packSequences == sequential prefix-sum model (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 20)
      lens <- Gen.listOfN(n, Gen.choose(0, 12)) // incl. empty docs
      budget <- Gen.oneOf(1L, 5L, 16L)
    } yield (lens, budget)
    val prop = Prop.forAll(gen) { case (lens, budget) =>
      val df = lens.zipWithIndex.map { case (len, i) =>
        (i.toLong, Seq.fill(len)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val got = graft.operators.Curation.packSequences(df, "doc_id", "text", budget)
        .select("doc_id", "pack_id", "pack_offset")
        .as[(Long, Long, Long)].collect().toSet
      // model: docs laid end-to-end in id order; a doc sits in the pack
      // where its first token falls, at the cumulative offset mod budget
      var cum = 0L
      val want = lens.zipWithIndex.map { case (len, i) =>
        val row = (i.toLong, cum / budget, cum % budget)
        cum += len
        row
      }.toSet
      (got == want) :| s"lens=$lens budget=$budget got=$got want=$want"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
  import spark.implicits._

  test("hashSplit: deterministic, stable under corpus growth, ~trainPct split") {
    val a = Curation.hashSplit((1L to 500L).toDF("id"), "id", 90)
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Curation.hashSplit((1L to 1000L).toDF("id"), "id", 90)
      .select("id", "split").as[(Long, String)].collect().toMap
    // growing the corpus never reassigns an existing id
    assert((1L to 500L).forall(i => a(i) == b(i)))
    val trainFrac = b.values.count(_ == "train").toDouble / b.size
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac")
    val bad = intercept[IllegalArgumentException] {
      Curation.hashSplit((1L to 3L).toDF("id"), "id", 100)
    }
    assert(bad.getMessage.contains("trainPct"))
  }

  test("splitLeakage reports straddling clusters; hashSplitByCluster fixes them") {
    import spark.implicits._
    // Two near-dup pairs plus singletons. Plain hashSplit buckets by id,
    // so some cluster straddles splits at trainPct=50 on this id range
    // (checked below rather than assumed); the cluster-granular split is
    // leakage-free by construction and leaves singletons untouched.
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val docs = (1L to 12L).toDF("doc_id")
    val plain = Curation.hashSplit(docs, "doc_id", trainPct = 50)
    val leaks = Curation.splitLeakage(pairs, plain, "doc_id", "split")
      .as[(Long, Long, Long, String)].collect()
    val plainMap = plain.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val straddling = Seq(Seq(1L, 2L), Seq(3L, 4L))
      .filter(c => c.map(plainMap).distinct.size > 1)
    assert(leaks.map(_._1).toSet ==
      straddling.map(_.min).toSet, s"leaks=${leaks.toSeq}")
    assert(leaks.forall(r => r._2 == 2 && r._3 == 2 && r._4 == "eval,train"))

    val fixed = Curation.hashSplitByCluster(docs, "doc_id", pairs, trainPct = 50)
    assert(Curation.splitLeakage(pairs, fixed, "doc_id", "split").isEmpty)
    val fixedRows = fixed.select("doc_id", "split_key", "split")
      .as[(Long, Long, String)].collect().toSeq
    // cluster members inherit the min-id's plain assignment
    for (c <- Seq(Seq(1L, 2L), Seq(3L, 4L)); id <- c) {
      val r = fixedRows.find(_._1 == id).get
      assert(r._2 == c.min && r._3 == plainMap(c.min), s"row $r")
    }
    // singletons: identical to plain hashSplit (same key, same arithmetic)
    for ((id, key, sp) <- fixedRows if id > 4) {
      assert(key == id && sp == plainMap(id), s"singleton $id moved")
    }
  }

  test("packSequences: contiguous prefix-sum packing in id order") {
    // ids 1..10, each with i tokens ("w " * i): cum0 of doc i = sum(1..i-1)
    val docs = (1L to 10L).map(i => (i, ("w " * i.toInt).trim)).toDF("id", "text")
    val packed = Curation.packSequences(docs, "id", "text", budgetTokens = 10)
      .select("id", "n_tok", "pack_id", "pack_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val expected = (1L to 10L).map { i =>
      val cum0 = (i - 1) * i / 2
      (i, i, cum0 / 10, cum0 % 10)
    }
    assert(packed.toSeq == expected, packed.mkString(", "))
    // empty/whitespace docs pack with zero width at the current offset
    val weird = Seq((1L, ""), (2L, "a b"), (3L, "   ")).toDF("id", "text")
    val w = Curation.packSequences(weird, "id", "text", budgetTokens = 5)
      .select("id", "n_tok", "pack_offset").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(w.toSeq == Seq((1L, 0L, 0L), (2L, 2L, 0L), (3L, 0L, 2L)), w.mkString(", "))
  }

  test("packSequencesWithSpans: budget cuts, boundary pieces, padding, NULL guard") {
    import graft.operators.SpecialTokens
    val sp = SpecialTokens.Ids(100) // PAD = 102
    // docs of 4, 7, 3, 2 ids — budget 6 cuts the stream 4|7|3|2 = 16
    // tokens into packs [0,6) [6,12) [12,16): doc 2 spans packs 0→1,
    // doc 3 spans 1→2, the last pack pads 2 slots
    val docs = Seq(
      (1L, Seq(10, 11, 12, 13)),
      (2L, Seq(20, 21, 22, 23, 24, 25, 26)),
      (3L, Seq(30, 31, 32)),
      (4L, Seq(40, 41))).toDF("id", "fids")
    val got = Curation.packSequencesWithSpans(docs, "id", "fids", sp, 6)
      .orderBy("pack_id")
      .as[(Long, Seq[Int], Seq[(Long, Int, Int)])].collect().toSeq
    assert(got == Seq(
      (0L, Seq(10, 11, 12, 13, 20, 21), Seq((1L, 0, 4), (2L, 4, 2))),
      (1L, Seq(22, 23, 24, 25, 26, 30), Seq((2L, 0, 5), (3L, 5, 1))),
      (2L, Seq(31, 32, 40, 41, 102, 102), Seq((3L, 0, 2), (4L, 2, 2)))),
      got.toString)
    // reconstruction across packs: doc 2's pieces concat to its ids
    val doc2 = got.flatMap { case (p, ids, spans) =>
      spans.filter(_._1 == 2L).map { case (_, st, ln) =>
        (p, ids.slice(st, st + ln)) }
    }.sortBy(_._1).flatMap(_._2)
    assert(doc2 == Seq(20, 21, 22, 23, 24, 25, 26))
    // a NULL sequence fails loudly, not silently shifting boundaries
    val ex = intercept[IllegalArgumentException] {
      Curation.packSequencesWithSpans(
        Seq((1L, Seq(1, 2)), (2L, null)).toDF("id", "fids"),
        "id", "fids", sp, 6)
    }
    assert(ex.getMessage.contains("NULL"))
  }

  test("capPerGroup matches the per-group window form exactly") {
    val df = (1L to 400L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "g")
    val capped = Curation.capPerGroup(df, "g", "id", cap = 50)
      .select("id").as[Long].collect().toSet
    // reference semantics: row_number over (g order by md5-pri, id) <= 50
    val pri = df.withColumn("pri",
        conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10).cast("long"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("pri"), col("id"))))
      .filter(col("rk") <= 50).select("id").as[Long].collect().toSet
    assert(capped == pri, s"diff: ${(capped diff pri) ++ (pri diff capped)}")
    assert(capped.size == 100) // both groups have > 50 members -> exactly 50 each
    // cap larger than the group: everything survives
    val all = Curation.capPerGroup(df, "g", "id", cap = 1000).count()
    assert(all == 400)
  }

  test("capPerGroup: five groups ALL over cap — exactly cap from each") {
    // the shape that exposed the keys/values map-literal de-alignment: with
    // every group capped, a scrambled per-group cutoff breaks the counts
    val df = (1L to 1000L).map(i => (i, "g" + (i % 5))).toDF("id", "g")
    val byGroup = Curation.capPerGroup(df, "g", "id", cap = 30)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byGroup == (0 to 4).map(i => s"g$i" -> 30L).toMap, byGroup.toString)
    // and the kept rows are exactly the window form's
    val win = df.withColumn("pri",
        conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10).cast("long"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("pri"), col("id"))))
      .filter(col("rk") <= 30).select("id").as[Long].collect().toSet
    val got = Curation.capPerGroup(df, "g", "id", cap = 30)
      .select("id").as[Long].collect().toSet
    assert(got == win)
  }

  test("sampleStratified: deterministic, nested, per-group fractions") {
    val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "g")
    val half = Curation.sampleStratified(df, "g", "id", Map("a" -> 0.5, "b" -> 0.5))
      .select("id").as[Long].collect().toSet
    val quarter = Curation.sampleStratified(df, "g", "id", Map("a" -> 0.25, "b" -> 0.25))
      .select("id").as[Long].collect().toSet
    assert(quarter.subsetOf(half))            // nested: prefix intervals of one priority
    assert(math.abs(half.size - 500) < 100)   // ~fraction of 1000 (md5 is uniform)
    // unlisted group falls back to defaultFraction: 0 drops it, 1 keeps all
    val onlyA = Curation.sampleStratified(df, "g", "id", Map("a" -> 1.0))
      .select("g").as[String].collect()
    assert(onlyA.nonEmpty && onlyA.forall(_ == "a"))
    assert(Curation.sampleStratified(df, "g", "id", Map.empty, 1.0).count() == 1000)
    // deterministic: same call, same rows
    val again = Curation.sampleStratified(df, "g", "id", Map("a" -> 0.5, "b" -> 0.5))
      .select("id").as[Long].collect().toSet
    assert(again == half)
  }

  test("sampleWeighted: keep rate tracks the weight; deterministic; clamps") {
    val df = (1L to 2000L).map(i => (i, (i % 4) * 0.25)).toDF("id", "w")
    val kept = Curation.sampleWeighted(df, "id", col("w"))
      .select("id", "w").as[(Long, Double)].collect()
    // weight 0 never survives; per-weight keep rates near the weight
    assert(!kept.exists(_._2 == 0.0))
    Seq(0.25, 0.5, 0.75).foreach { w =>
      val n = kept.count(_._2 == w)
      // ±3σ of Binomial(500, w) ≈ ±30: tight enough that a mis-scaled
      // threshold (e.g. rate ~ 2w) cannot slip through
      assert(math.abs(n - 500 * w) < 3 * math.sqrt(500 * w * (1 - w)) + 1,
        s"w=$w kept $n of 500")
    }
    // deterministic
    val again = Curation.sampleWeighted(df, "id", col("w"))
      .select("id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
    // out-of-range weights clamp: >=1 keeps everything, negatives drop, NULL drops
    assert(Curation.sampleWeighted(df, "id", lit(7.0)).count() == 2000)
    assert(Curation.sampleWeighted(df, "id", lit(-3.0)).count() == 0)
    assert(Curation.sampleWeighted(df, "id", lit(null).cast("double")).count() == 0)
  }

  test("property: capPerGroup == window form on random group shapes (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val gen = for {
      nGroups <- Gen.choose(1, 6)
      nRows <- Gen.choose(1, 300)
      cap <- Gen.choose(1L, 60L)
      assign <- Gen.listOfN(nRows, Gen.choose(0, nGroups - 1))
    } yield (assign.zipWithIndex.map { case (g, i) => (i.toLong + 1, s"g$g") }, cap)
    val prop = Prop.forAll(gen) { case (rows, cap) =>
      val df = rows.toDF("id", "g")
      val got = Curation.capPerGroup(df, "g", "id", cap)
        .select("id").as[Long].collect().toSet
      val want = df.withColumn("pri",
          conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10).cast("long"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("g").orderBy(col("pri"), col("id"))))
        .filter(col("rk") <= cap).select("id").as[Long].collect().toSet
      (got == want) :| s"cap=$cap diff=${(got diff want) ++ (want diff got)}"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("filterByGroupQuantile keeps the top (1-q) of each group exactly") {
    // group a: scores 1..10 -> q=0.5 cut is 5.5 -> keep 6..10
    // group b: scores 100..104 -> cut 102 -> keep 102..104 (>= is inclusive)
    val df = ((1 to 10).map(i => ("a", i.toLong, i.toLong)) ++
      (100 to 104).map(i => ("b", i.toLong, i.toLong))).toDF("g", "id", "score")
    val kept = Curation.filterByGroupQuantile(df, "g", "score", 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == ((6L to 10L) ++ (102L to 104L)).toSet, kept.toString)
  }

  test("chunkDocuments: overlapping windows, short tail, empty docs vanish") {
    val df = Seq(
      (1L, "a b c d e f g"), // 7 tokens
      (2L, "x"),             // 1 token -> one short chunk
      (3L, "   ")            // no tokens -> no chunks
    ).toDF("id", "text")
    val out = Curation.chunkDocuments(df, "id", "text",
        chunkTokens = 4, strideTokens = 2)
      .as[(Long, Int, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 0, "a b c d", 4L),
      (1L, 1, "c d e f", 4L),
      (1L, 2, "e f g", 3L),   // final short window kept, true length reported
      (1L, 3, "g", 1L),
      (2L, 0, "x", 1L)
    ), out.mkString(", "))
  }

  test("mixtureSample: caps over-demanded groups, rates the rest, drops unweighted") {
    // g0: 10 rows, g1: 100 rows, g2: 100 rows (unweighted)
    val df = ((1L to 10L).map(i => (i, "g0")) ++
      (11L to 110L).map(i => (i, "g1")) ++
      (111L to 210L).map(i => (i, "g2"))).toDF("id", "g")
    val out = Curation.mixtureSample(df, "g", "id",
        Map("g0" -> 0.5, "g1" -> 0.5), targetRows = 60)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    // g0's target share (30 rows) exceeds its 10-row population: keep all
    assert(out("g0") == 10L, out.toString)
    // g1 samples at ~30/100; md5 uniform so allow slack
    assert(out("g1") >= 15L && out("g1") <= 45L, out.toString)
    assert(!out.contains("g2"), out.toString) // no weight -> dropped
    // nested: a smaller target is a strict subset of a larger one
    val small = Curation.mixtureSample(df, "g", "id",
      Map("g0" -> 0.5, "g1" -> 0.5), targetRows = 20).select("id").as[Long].collect().toSet
    val big = Curation.mixtureSample(df, "g", "id",
      Map("g0" -> 0.5, "g1" -> 0.5), targetRows = 60).select("id").as[Long].collect().toSet
    assert(small.subsetOf(big), s"${small.size} not nested in ${big.size}")
    intercept[IllegalArgumentException] {
      Curation.mixtureSample(df, "g", "id", Map.empty, 10)
    }
    intercept[IllegalArgumentException] {
      Curation.mixtureSample(df, "g", "id", Map("g0" -> -0.1, "g1" -> 0.5), 10)
    }
  }

  test("mixtureSampleTemperature: alpha=1 is proportional; alpha<1 boosts the tail") {
    // head: 400 rows, tail: 25 rows
    val df = ((1L to 400L).map(i => (i, "head")) ++
      (401L to 425L).map(i => (i, "tail"))).toDF("id", "g")
    // alpha = 1: w ∝ n, fractions uniform target/N — both groups keep ~the
    // same FRACTION, and the result equals mixtureSample with w = n
    val t1 = Curation.mixtureSampleTemperature(df, "g", "id",
        alpha = 1.0, targetRows = 100)
      .select("id").as[Long].collect().toSet
    val prop = Curation.mixtureSample(df, "g", "id",
        Map("head" -> 400.0, "tail" -> 25.0), targetRows = 100)
      .select("id").as[Long].collect().toSet
    assert(t1 == prop, s"alpha=1 diverged from proportional")
    // alpha = 0.3 flattens: the tail's keep-FRACTION must exceed the
    // head's (n^0.3/n decreasing in n); exact fractions hand-computed
    val t3 = Curation.mixtureSampleTemperature(df, "g", "id",
        alpha = 0.3, targetRows = 100)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    val wh = math.pow(400.0, 0.3); val wt = math.pow(25.0, 0.3)
    val fh = 100.0 * wh / (wh + wt) / 400.0 // ≈ 0.174
    val ft = 100.0 * wt / (wh + wt) / 25.0  // ≈ 1.19 -> capped at 1
    assert(ft > 1.0 && fh < 0.25, s"$fh / $ft")
    assert(t3("tail") == 25L, t3.toString) // capped group keeps everything
    assert(t3("head") >= 40L && t3("head") <= 100L, t3.toString)
    // nested in targetRows, like the sibling
    val t3small = Curation.mixtureSampleTemperature(df, "g", "id",
        alpha = 0.3, targetRows = 40)
      .select("id").as[Long].collect().toSet
    val t3big = Curation.mixtureSampleTemperature(df, "g", "id",
        alpha = 0.3, targetRows = 100)
      .select("id").as[Long].collect().toSet
    assert(t3small.subsetOf(t3big))
    intercept[IllegalArgumentException] {
      Curation.mixtureSampleTemperature(df, "g", "id", alpha = 0.0, targetRows = 10)
    }
    intercept[IllegalArgumentException] {
      Curation.mixtureSampleTemperature(df, "g", "id", alpha = 1.5, targetRows = 10)
    }
    intercept[IllegalArgumentException] {
      Curation.mixtureSampleTemperature(df, "g", "id", alpha = 0.5, targetRows = -1)
    }
  }

  test("mixtureSampleByTokens: token-mass fractions, cap regime, zero-sum drops") {
    // g0: 10 rows x 100 tokens = 1000; g1: 100 rows x 50 = 5000;
    // g2: zero tokens; g3: unweighted
    val df = ((1L to 10L).map(i => (i, "g0", 100L)) ++
      (11L to 110L).map(i => (i, "g1", 50L)) ++
      (111L to 115L).map(i => (i, "g2", 0L)) ++
      (116L to 120L).map(i => (i, "g3", 10L))).toDF("id", "g", "tok")
    val out = Curation.mixtureSampleByTokens(df, "g", "id", "tok",
        Map("g0" -> 0.5, "g1" -> 0.5, "g2" -> 0.5), targetTokens = 4000)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    // g0 target 4000*0.5/1.5=1333 tokens > its 1000-token mass: keep all
    assert(out("g0") == 10L, out.toString)
    // g1 fraction 1333/5000 ~= 0.27 of 100 rows; md5 uniform, allow slack
    assert(out("g1") >= 10L && out("g1") <= 45L, out.toString)
    assert(!out.contains("g2"), out.toString) // zero token mass -> nothing
    assert(!out.contains("g3"), out.toString) // unweighted -> dropped
    // nested in targetTokens
    val small = Curation.mixtureSampleByTokens(df, "g", "id", "tok",
      Map("g0" -> 0.5, "g1" -> 0.5), 1000).select("id").as[Long].collect().toSet
    val big = Curation.mixtureSampleByTokens(df, "g", "id", "tok",
      Map("g0" -> 0.5, "g1" -> 0.5), 4000).select("id").as[Long].collect().toSet
    assert(small.subsetOf(big), s"${small.size} not nested in ${big.size}")
    intercept[IllegalArgumentException] {
      Curation.mixtureSampleByTokens(df, "g", "id", "tok", Map.empty, 10)
    }
  }

  test("shuffleDeterministic: total permutation, seed-sensitive, matches brute force") {
    val df = (1L to 300L).map(i => (i, s"d$i")).toDF("id", "payload")
    val got = Curation.shuffleDeterministic(df, "id", seed = "a")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    // a permutation of 1..n
    assert(got.values.toSeq.sorted == (1L to 300L))
    // deterministic: second run identical
    val again = Curation.shuffleDeterministic(df, "id", seed = "a")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(got == again)
    // matches the brute-force md5 sort order
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(i: Long) = md.digest(s"a:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = (1L to 300L).sortBy(i => (key(i), i)).zipWithIndex
      .map { case (i, p) => i -> (p + 1L) }.toMap
    assert(got == want)
    // a different seed produces a different order
    val other = Curation.shuffleDeterministic(df, "id", seed = "b")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(other != got)
  }

  test("sampleStratified: five distinct fractions land on their own groups") {
    val df = (1L to 5000L).map(i => (i, "g" + (i % 5))).toDF("id", "g")
    val fr = Map("g0" -> 0.0, "g1" -> 0.1, "g2" -> 0.5, "g3" -> 0.9, "g4" -> 1.0)
    val rates = Curation.sampleStratified(df, "g", "id", fr)
      .groupBy("g").count().as[(String, Long)].collect().toMap
      .map { case (g, n) => g -> n / 1000.0 }
    assert(!rates.contains("g0"))                   // 0.0 -> dropped entirely
    assert(rates("g4") == 1.0)                      // 1.0 -> all kept
    assert(math.abs(rates("g1") - 0.1) < 0.05, rates.toString)
    assert(math.abs(rates("g2") - 0.5) < 0.08, rates.toString)
    assert(math.abs(rates("g3") - 0.9) < 0.05, rates.toString)
  }
}
