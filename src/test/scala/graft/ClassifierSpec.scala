package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** Multinomial NB semantics: hand-computed posteriors, the priors-only
  * fallback for out-of-vocabulary docs, parquet model round-trip, and the
  * quality-filter composition.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def seed = Seq(
    (1L, "a", "x x y"),
    (2L, "a", "x z"),
    (3L, "b", "y y z"))
    .toDF("doc_id", "label", "text")

  test("trainNaiveBayes: token counts per label + reserved prior rows") {
    val m = Classifier.trainNaiveBayes(seed, "label", "text")
      .as[(String, String, Long)].collect().toSet
    assert(m == Set(
      ("a", "x", 3L), ("a", "y", 1L), ("a", "z", 1L),
      ("b", "y", 2L), ("b", "z", 1L),
      ("a", "", 2L), ("b", "", 1L)))
  }

  test("classifyNaiveBayes: hand-computed argmax, priors fallback, determinism") {
    val model = Classifier.trainNaiveBayes(seed, "label", "text")
    // Hand computation (k=0.5, |V|=3, c(a·)=5, c(b·)=3, priors 2/3 vs 1/3):
    //   doc "x x":  a: ln(2/3)+2·ln(3.5/6.5) = -1.644  b: ln(1/3)+2·ln(0.5/4.5) = -5.493  -> a
    //   doc "y y":  a: ln(2/3)+2·ln(1.5/6.5) = -3.337  b: ln(1/3)+2·ln(2.5/4.5) = -2.274  -> b
    //   doc "q q":  OOV-only -> priors alone: a (2/3 > 1/3), n_scored = 0
    val docs = Seq((10L, "x x"), (11L, "y y"), (12L, "q q"))
      .toDF("doc_id", "text")
    val got = Classifier.classifyNaiveBayes(docs, "doc_id", "text", model)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, "a", 2L), (11L, "b", 2L), (12L, "a", 0L)), got)
    // deterministic across runs
    val again = Classifier.classifyNaiveBayes(docs, "doc_id", "text", model)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(again == got)
  }

  test("model round-trips through parquet (train on A, score B later)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    Classifier.trainNaiveBayes(seed, "label", "text")
      .write.parquet(s"$dir/model")
    val reloaded = spark.read.parquet(s"$dir/model")
    val got = Classifier.classifyNaiveBayes(
        Seq((10L, "x x")).toDF("doc_id", "text"), "doc_id", "text", reloaded)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((10L, "a", 2L)))
  }

  test("prior ties break label-ascending (exact decimal equality)") {
    // two labels, identical priors AND identical token stats -> every
    // score ties exactly; the argmax must still be ONE deterministic label
    val sym = Seq((1L, "a", "x"), (2L, "b", "x")).toDF("doc_id", "label", "text")
    val model = Classifier.trainNaiveBayes(sym, "label", "text")
    val got = Classifier.classifyNaiveBayes(
        Seq((10L, "x")).toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((10L, "a", 1L)))
  }

  test("filterByClassifier keeps exactly the docs predicted as keepLabel") {
    val docs = Seq(
      (1L, "a", "x x x"), (2L, "a", "x x z"),
      (3L, "b", "y y y"), (4L, "b", "y x y"),
      (5L, "a", "y y y y")) // labeled a, but reads like b -> dropped
      .toDF("doc_id", "label", "text")
    val kept = Classifier.filterByClassifier(docs, "doc_id", "label", "text",
        keepLabel = "a")
      .select("doc_id").as[Long].collect().toSet
    val preds = Classifier.classifyNaiveBayes(docs, "doc_id", "text",
        Classifier.trainNaiveBayes(docs, "label", "text"))
      .filter(col("pred_label") === "a").select("doc_id").as[Long].collect().toSet
    assert(kept == preds)
    assert(!kept.contains(5L), s"misfiled doc 5 survived: $kept")
    assert(kept.contains(1L) && kept.contains(2L))
  }

  test("classifyNaiveBayesWithMargin: hand-computed log-odds gaps") {
    val model = Classifier.trainNaiveBayes(seed, "label", "text")
    // Same hand computation as the argmax test; margin = best − runner-up:
    //   "x x": ln(2) + 2·ln(3.5/6.5 · 4.5/0.5) = ln 2 + 2·ln(63/13)
    //          = 3.849518
    //   "q q": priors only, margin = ln(2/3) − ln(1/3) = ln 2 = 0.693147
    val docs = Seq((10L, "x x"), (12L, "q q")).toDF("doc_id", "text")
    val got = Classifier
      .classifyNaiveBayesWithMargin(docs, "doc_id", "text", model)
      .as[(Long, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._2) == Seq("a", "a"), got)
    assert(math.abs(got(0)._4 - 3.849518) < 1e-6, got)
    assert(math.abs(got(1)._4 - 0.693147) < 1e-6, got)
    // exact-tie corpus: margin is exactly 0.0
    val sym = Seq((1L, "a", "x"), (2L, "b", "x")).toDF("doc_id", "label", "text")
    val tie = Classifier.classifyNaiveBayesWithMargin(
        Seq((10L, "x")).toDF("doc_id", "text"), "doc_id", "text",
        Classifier.trainNaiveBayes(sym, "label", "text"))
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(tie == Seq((10L, "a", 1L, 0.0)), tie)
    // single-label model: no runner-up, margin NULL
    val solo = Classifier.classifyNaiveBayesWithMargin(
        Seq((10L, "x")).toDF("doc_id", "text"), "doc_id", "text",
        Classifier.trainNaiveBayes(
          Seq((1L, "a", "x")).toDF("doc_id", "label", "text"), "label", "text"))
      .select("margin").collect()
    assert(solo.length == 1 && solo(0).isNullAt(0), solo.toSeq)
  }

  test("filterByClassifier minMargin keeps only confident wins") {
    val docs = Seq(
      (1L, "a", "x x x"), (2L, "a", "x x z"),
      (3L, "b", "y y y"), (4L, "b", "y x y"),
      (5L, "a", "y y y y"))
      .toDF("doc_id", "label", "text")
    val model = Classifier.trainNaiveBayes(docs, "label", "text")
    val margins = Classifier
      .classifyNaiveBayesWithMargin(docs, "doc_id", "text", model)
      .filter(col("pred_label") === "a")
      .as[(Long, String, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(margins.nonEmpty)
    val cut = margins.values.max // only the most confident doc survives
    val kept = Classifier.filterByClassifier(docs, "doc_id", "label", "text",
        keepLabel = "a", minMargin = cut)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == margins.filter(_._2 >= cut).keySet, s"$kept vs $margins")
    // threshold 0 keeps every argmax win — equals the unthresholded filter
    val all0 = Classifier.filterByClassifier(docs, "doc_id", "label", "text",
        keepLabel = "a", minMargin = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(all0 == margins.keySet)
  }

  test("trainNaiveBayes rejects NULL labels at scan time") {
    val bad = Seq((1L, Some("a"), "x"), (2L, None, "y"))
      .toDF("doc_id", "label", "text")
    val e = intercept[Exception] {
      Classifier.trainNaiveBayes(bad, "label", "text").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("NULL label")), e.getMessage)
  }

  test("guards: NULL-safe labels counted, addK and maxLabels enforced") {
    val model = Classifier.trainNaiveBayes(seed, "label", "text")
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Classifier.classifyNaiveBayes(docs, "doc_id", "text", model, addK = 0.0)
    }
    intercept[IllegalArgumentException] {
      Classifier.classifyNaiveBayes(docs, "doc_id", "text", model,
        maxLabels = 1)
    }
  }

  test("marginToward: signed toward the designated label; two-label symmetry") {
    val model = Classifier.trainNaiveBayes(seed, "label", "text")
    val docs = Seq((10L, "x x"), (11L, "y y")).toDF("doc_id", "text")
    // with exactly two labels, margin toward 'a' is +margin when the
    // argmax is 'a' and -margin when it is 'b'
    val mw = Classifier.classifyNaiveBayesWithMargin(docs, "doc_id", "text", model)
      .select("doc_id", "pred_label", "margin")
      .as[(Long, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val mt = Classifier.marginToward(docs, "doc_id", "text", model, "a")
      .select("doc_id", "margin_keep")
      .as[(Long, Double)].collect().toMap
    assert(mw(10L)._1 == "a" && mt(10L) == mw(10L)._2, (mw, mt).toString)
    assert(mw(11L)._1 == "b" && mt(11L) == -mw(11L)._2, (mw, mt).toString)
    // a keepLabel the model never saw -> NULL margins
    val absent = Classifier.marginToward(docs, "doc_id", "text", model, "zz")
    assert(absent.filter(col("margin_keep").isNotNull).count() == 0)
  }

  test("filterByClassifierPareto matches the hand-replayed log-domain condition") {
    val corpus = Seq(
      (1L, "a", "x x y"), (2L, "a", "x z"), (3L, "b", "y y z"),
      (4L, "a", "x x x"), (5L, "b", "y z y"), (6L, "b", "z z y"))
      .toDF("doc_id", "label", "text")
    val kept = Classifier.filterByClassifierPareto(corpus, "doc_id", "label",
        "text", keepLabel = "a", alpha = 9.0, seed = "t")
      .select("doc_id").as[Long].collect().toSet
    val again = Classifier.filterByClassifierPareto(corpus, "doc_id", "label",
        "text", keepLabel = "a", alpha = 9.0, seed = "t")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == again)
    // replay: margin toward 'a' per doc, md5 uniform, rounded log-domain compare
    val model = Classifier.trainNaiveBayes(corpus, "label", "text")
    val margins = Classifier.marginToward(corpus, "doc_id", "text", model, "a")
      .select("doc_id", "margin_keep").as[(Long, Double)].collect().toMap
    def r6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def uniform(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t:$id".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val expect = margins.keySet.filter { id =>
      r6(-math.log(1.0 - uniform(id)) / 9.0) >
        r6(math.log(2.0 - 1.0 / (1.0 + math.exp(-margins(id)))))
    }
    assert(kept == expect, s"got $kept expected $expect")
    // keepLabel absent from the model -> NULL margins -> nothing kept
    assert(Classifier.filterByClassifierPareto(corpus, "doc_id", "label",
      "text", keepLabel = "zz", seed = "t").count() == 0)
    intercept[IllegalArgumentException] {
      Classifier.filterByClassifierPareto(corpus, "doc_id", "label", "text",
        keepLabel = "a", alpha = 0.0)
    }
  }
}
