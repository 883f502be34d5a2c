package graft

import graft.operators.LangIdNgram
import org.apache.spark.sql.functions._

class LangIdNgramSpec extends SparkSpec {
  import spark.implicits._

  private val labeled = Seq(
    (1L, "aa", "aaa aab baa aaa"),
    (2L, "aa", "aab aaa baa"),
    (3L, "zz", "zzz zzy yzz zzz"),
    (4L, "zz", "zzy zzz yzz")
  ).toDF("doc_id", "lang", "text")

  test("charNgramTopK native equals the relational count/rank profile") {
    // the executable specification the per-row native replaced: gram
    // explode -> count -> row_number(count desc, gram asc) -> top-k
    import org.apache.spark.sql.expressions.Window
    val texts = Seq("the_cat_sat_on_the_mat", "ααβ_ünïcode_ααβ", "aaaa",
      "x", "the_the_the")
    texts.zipWithIndex.foreach { case (t, id) =>
      val df = Seq((id.toLong, t)).toDF("id", "t")
      val rel = df.select(col("id"), explode(
          graft.expressions.TextHashExpressions.charNgrams(col("t"), 3))
          .as("gram"))
        .groupBy("id", "gram").agg(count(lit(1)).as("c"))
        .withColumn("r", row_number().over(
          Window.partitionBy("id").orderBy(col("c").desc, col("gram").asc)))
        .filter(col("r") <= 7).orderBy("r")
        .select("gram").as[String].collect().toSeq
      val native = df.select(
          graft.expressions.TextHashExpressions.charNgramTopK(col("t"), 3, 7))
        .as[Seq[String]].head()
      assert(native == rel, s"text '$t': native $native vs relational $rel")
    }
  }

  test("native classify equals the relational four-stage form row-for-row") {
    val model = LangIdNgram.trainProfiles(labeled, "lang", "text", topK = 16)
    val test = Seq(
      (1L, "the cat and the hat went to the market"),
      (2L, "el gato y la casa en la calle"),
      (3L, ""), // no grams -> und + NULL dist
      (4L, "   "), // whitespace-only canon -> single '_'? trim first: empty
      (5L, "zzzz qqqq xxxx"), // grams all out-of-model: every label ties
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val native = LangIdNgram.classify(test, "doc_id", "text", model)
      .orderBy("doc_id").as[(Long, String, Option[Long])].collect().toSeq
    val rel = LangIdNgram.classifyRelational(test, "doc_id", "text", model)
      .orderBy("doc_id").as[(Long, String, Option[Long])].collect().toSeq
    assert(native == rel, s"\nnative: $native\nrel   : $rel")
  }

  test("classify fails loudly on an empty model instead of NPEing") {
    val e = intercept[IllegalArgumentException] {
      LangIdNgram.classify(
        Seq((1L, "some text")).toDF("doc_id", "text"), "doc_id", "text",
        LangIdNgram.trainProfiles(
          Seq.empty[(String, String)].toDF("lang", "text"), "lang", "text"))
    }
    assert(e.getMessage.contains("empty model"), e.getMessage)
  }

  test("a model with duplicate (label, gram) rows fails loudly") {
    // ADVICE r11: parse kept only the LAST rank for a duplicated gram
    // while the relational spec sums one distance term per matching row
    // — a malformed hand-built model diverged silently between forms.
    import graft.expressions.LangIdOps
    val spec = LangIdOps.encodeRow("en", "th", 1) +
      LangIdOps.encodeRow("en", "th", 2)
    val e = intercept[Exception] {
      Seq((1L, "the text")).toDF("doc_id", "text")
        .select(graft.expressions.TextHashExpressions.langIdClassify(
          col("text"), Seq(("en", "th", 1), ("en", "th", 2)), 2))
        .collect()
    }
    def rootMessage(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => String.valueOf(x.getMessage)).mkString(" | "))
    assert(rootMessage(e).contains("duplicate model row"), rootMessage(e))
    assert(spec.nonEmpty)
  }

  test("trainProfiles ranks grams by frequency with gram-asc ties") {
    val model = LangIdNgram.trainProfiles(labeled, "lang", "text", topK = 16)
    // 'a' dominates the aa-language character mass
    val top = model.filter(col("label") === "aa" && col("rank") === 1)
      .select("gram").as[String].head()
    assert(top == "a", top)
    // ranks are dense 1..k per label, no gaps or duplicates
    val ranks = model.filter(col("label") === "aa")
      .select("rank").as[Int].collect().sorted
    assert(ranks.toSeq == (1 to ranks.length), ranks.mkString(","))
  }

  test("classify recovers the language of held-out same-distribution text") {
    val model = LangIdNgram.trainProfiles(labeled, "lang", "text", topK = 16)
    val test = Seq((10L, "aaa baa aab"), (11L, "zzz yzz zzy"), (12L, "   "))
      .toDF("doc_id", "text")
    val got = LangIdNgram.classify(test, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getString(1), r.isNullAt(2))).toList
    val byId = got.map(x => x._1 -> x).toMap
    assert(byId(10L)._2 == "aa")
    assert(byId(11L)._2 == "zz")
    // no grams -> sentinel, NULL distance
    assert(byId(12L)._2 == "und" && byId(12L)._3)
  }

  test("native charNgrams equals the HOF specification element-for-element") {
    val texts = Seq("", "a", "ab", "abc_def", "café_über",
      "x😀y_z😀", // astral chars: one code point each
      "x" * 40)
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
    val rows = df.select(
        graft.expressions.TextHashExpressions.charNgrams(col("t"), 3).as("a"),
        graft.operators.LangIdNgram.allGramsFold(col("t")).as("b"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1),
      r.toString))
  }

  test("NULL labels are rejected at training time") {
    val bad = Seq((1L, null.asInstanceOf[String], "some text"))
      .toDF("doc_id", "lang", "text")
    val e = intercept[Exception] {
      LangIdNgram.trainProfiles(bad, "lang", "text").collect()
    }
    assert(e.getMessage != null)
  }

  test("filterByLanguage keeps only docs predicted in the allowed set") {
    val docs = Seq((10L, "aaa baa aab", "x"), (11L, "zzz yzz zzy", "x"),
      (12L, "   ", "x")).toDF("doc_id", "text", "source")
    val kept = LangIdNgram.filterByLanguage(docs, "doc_id", "text",
        labeled, "lang", "text", keepLangs = Set("aa"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L), kept.toString)
    // the und sentinel is kept only when listed
    val keptUnd = LangIdNgram.filterByLanguage(docs, "doc_id", "text",
        labeled, "lang", "text", keepLangs = Set("aa", "und"))
      .select("doc_id").as[Long].collect().toSet
    assert(keptUnd == Set(10L, 12L), keptUnd.toString)
    // the recipe step is the same filter with schema preserved
    val viaStep = graft.pipeline.CorpusPipeline.run(docs, "doc_id", "text",
        Seq(graft.pipeline.CorpusPipeline.KeepLanguages(
          labeled, "lang", "text", Set("zz"))))
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(viaStep == Set((11L, "x")), viaStep.toString)
  }

  test("classify guards the label cardinality") {
    val model = LangIdNgram.trainProfiles(labeled, "lang", "text", topK = 4)
    val e = intercept[IllegalArgumentException] {
      LangIdNgram.classify(labeled, "doc_id", "text", model, maxLabels = 1)
    }
    assert(e.getMessage.contains("maxLabels"))
  }
}
