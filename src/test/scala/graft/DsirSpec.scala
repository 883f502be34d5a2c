package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance-resampling semantics: feature hashing matches the house
  * md5 convention, weights match a hand-computed Lidstone log-ratio,
  * in-domain docs outscore out-of-domain ones, the model round-trips
  * through parquet, and Gumbel top-k is deterministic + weight-monotone.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  // Two "domains" with disjoint vocabulary: target-looking docs (x/y) and
  // background noise (p/q). Raw corpus holds both.
  private def target = Seq(
    (100L, "x y x"),
    (101L, "y x y")).toDF("doc_id", "text")
  private def raw = Seq(
    (1L, "x y"),
    (2L, "p q"),
    (3L, "x q"),
    (4L, ""),
    (5L, "y")).toDF("doc_id", "text")

  test("hashedNgramFeatures: unigrams + bigrams, md5 buckets, empty docs drop out") {
    val f = Dsir.hashedNgramFeatures(raw, "doc_id", "text", B)
      .as[(Long, Long, Long)].collect()
    // doc 4 is empty -> no rows; doc 5 has one unigram, no bigram
    assert(!f.exists(_._1 == 4L))
    assert(f.filter(_._1 == 5L).map(_._3).sum == 1L)
    // doc 1 "x y": unigrams x, y + bigram "x y" = 3 occurrences
    assert(f.filter(_._1 == 1L).map(_._3).sum == 3L)
    // buckets live in [0, B)
    assert(f.forall(r => r._2 >= 0 && r._2 < B))
    // the house convention: bucket("x") = md5 first-8-hex mod B
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("x".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val expect = java.lang.Long.parseLong(md, 16) % B
    val xBucket = Dsir.hashedNgramFeatures(
        Seq((9L, "x")).toDF("doc_id", "text"), "doc_id", "text", B)
      .as[(Long, Long, Long)].collect().head._2
    assert(xBucket == expect)
  }

  test("featureModel: corpus-level bucket counts, <= B rows") {
    val m = Dsir.featureModel(target, "doc_id", "text", B)
    assert(m.count() <= B)
    // target corpus: 6 unigrams + 4 bigrams = 10 total occurrences
    assert(m.agg(sum("cnt")).as[Long].head() == 10L)
  }

  test("importanceWeights: hand-computed log-ratio on a single-bucket feature") {
    // One-token docs so the feature bag is a single unigram; models tiny
    // enough to hand-compute. Target = {"x"}, raw-model = {"x","p"}.
    val tgt = Seq((50L, "x")).toDF("doc_id", "text")
    val bg = Seq((60L, "x"), (61L, "p")).toDF("doc_id", "text")
    val tm = Dsir.featureModel(tgt, "doc_id", "text", B)
    val rm = Dsir.featureModel(bg, "doc_id", "text", B)
    val w = Dsir.importanceWeights(
        Seq((70L, "x"), (71L, "p"), (72L, "")).toDF("doc_id", "text"),
        "doc_id", "text", tm, rm, B)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val kB = 0.5 * B
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    // doc "x": ln((1+.5)/(1+kB)) - ln((1+.5)/(2+kB))
    val wx = r6(math.log(1.5 / (1 + kB)) - math.log(1.5 / (2 + kB)))
    // doc "p": ln(.5/(1+kB)) - ln(1.5/(2+kB))
    val wp = r6(math.log(0.5 / (1 + kB)) - math.log(1.5 / (2 + kB)))
    assert(w == Seq((70L, 1L, wx), (71L, 1L, wp), (72L, 0L, 0.0)), w)
    // in-domain above empty above out-of-domain for this geometry
    assert(wx > 0.0 && wp < 0.0)
  }

  test("importanceWeights: target-domain docs outscore background docs") {
    val tm = Dsir.featureModel(target, "doc_id", "text", B)
    val rm = Dsir.featureModel(raw, "doc_id", "text", B)
    val w = Dsir.importanceWeights(raw, "doc_id", "text", tm, rm, B)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // doc 1 ("x y") is pure target vocabulary; doc 2 ("p q") pure noise
    assert(w(1L) > w(2L), w)
    assert(w(4L) == 0.0) // empty doc: empty product
    // every doc present exactly once
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("model round-trips through parquet (train on A, score B)") {
    val dir = java.nio.file.Files.createTempDirectory("dsir-model").toString
    Dsir.featureModel(target, "doc_id", "text", B)
      .write.mode("overwrite").parquet(s"$dir/tm")
    Dsir.featureModel(raw, "doc_id", "text", B)
      .write.mode("overwrite").parquet(s"$dir/rm")
    val direct = Dsir.importanceWeights(raw, "doc_id", "text",
        Dsir.featureModel(target, "doc_id", "text", B),
        Dsir.featureModel(raw, "doc_id", "text", B), B)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val loaded = Dsir.importanceWeights(raw, "doc_id", "text",
        spark.read.parquet(s"$dir/tm"), spark.read.parquet(s"$dir/rm"), B)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(direct == loaded)
  }

  test("resampleTopK: deterministic, seed-sensitive, weight-monotone in expectation") {
    val tm = Dsir.featureModel(target, "doc_id", "text", B)
    val rm = Dsir.featureModel(raw, "doc_id", "text", B)
    val w = Dsir.importanceWeights(raw, "doc_id", "text", tm, rm, B)
    val pick = Dsir.resampleTopK(w, "doc_id", "log_weight", 3, "s1")
      .select("doc_id").as[Long].collect().toSet
    val again = Dsir.resampleTopK(w, "doc_id", "log_weight", 3, "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(pick == again && pick.size == 3)
    // an overwhelming weight always survives: boost doc 1 far above the
    // Gumbel noise scale and it must be picked under any seed
    val boosted = w.withColumn("log_weight",
      when(col("doc_id") === 1L, lit(1e6)).otherwise(col("log_weight")))
    Seq("s1", "s2", "s3").foreach { seed =>
      val got = Dsir.resampleTopK(boosted, "doc_id", "log_weight", 1, seed)
        .select("doc_id").as[Long].collect().toSeq
      assert(got == Seq(1L), s"seed $seed -> $got")
    }
  }

  test("updateFeatureModel: incremental fold equals full retrain") {
    val a = raw.filter(col("doc_id") <= 3L)
    val b = raw.filter(col("doc_id") > 3L)
    val incremental = Dsir.updateFeatureModel(
        Dsir.featureModel(a, "doc_id", "text", B), b, "doc_id", "text", B)
      .as[(Long, Long)].collect().toSet
    val full = Dsir.featureModel(raw, "doc_id", "text", B)
      .as[(Long, Long)].collect().toSet
    assert(incremental == full)
    intercept[IllegalArgumentException] {
      Dsir.updateFeatureModel(raw, b, "doc_id", "text", B) // not a model
    }
  }

  test("weights are partitioning-invariant (the DECIMAL-sum order-independence claim)") {
    val tm = Dsir.featureModel(target, "doc_id", "text", B)
    val rm = Dsir.featureModel(raw, "doc_id", "text", B)
    val base = Dsir.importanceWeights(raw, "doc_id", "text", tm, rm, B)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    Seq(1, 3, 7).foreach { n =>
      val shuffled = Dsir.importanceWeights(raw.repartition(n), "doc_id",
          "text", tm, rm, B)
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(shuffled == base, s"repartition($n) changed weights")
    }
  }

  test("bucket-space guard rejects non-broadcastable models") {
    intercept[IllegalArgumentException] {
      Dsir.featureModel(raw, "doc_id", "text", buckets = (1 << 26) + 1)
    }
    intercept[IllegalArgumentException] {
      Dsir.featureModel(raw, "doc_id", "text", buckets = 0)
    }
  }

  test("selectByImportance: end-to-end composition returns k rows") {
    val got = Dsir.selectByImportance(raw, target, "doc_id", "text",
      buckets = B, k = 2, seed = "42")
    assert(got.count() == 2L)
    assert(got.columns.toSeq ==
      Seq("doc_id", "n_features", "log_weight", "gumbel_key"))
  }
}
