package graft

import graft.operators.LanguageModel
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("trainBigramLM counts consecutive lowercased bigrams") {
    val docs = Seq((1L, "The cat sat"), (2L, "the cat ran")).toDF("id", "text")
    val lm = LanguageModel.trainBigramLM(docs, "id", "text")
      .orderBy("w1", "w2").as[(String, String, Long)].collect().toSeq
    assert(lm == Seq(("cat", "ran", 1L), ("cat", "sat", 1L), ("the", "cat", 2L)))
  }

  test("perplexity matches the hand-computed add-k formula") {
    // Corpus: "a b a b" -> bigrams (a,b)x2, (b,a)x1. V = {a, b} = 2, k=0.5.
    // P(b|a) = (2+.5)/(3+.5*2)... careful: c(a.) = c(a,b) = 2; c(b.) = 1.
    // P(b|a) = (2+0.5)/(2+1.0) = 2.5/3 ; P(a|b) = (1+0.5)/(1+1.0) = 1.5/2
    val docs = Seq((1L, "a b a b")).toDF("id", "text")
    val out = LanguageModel.perplexitySelf(docs, "id", "text", addK = 0.5)
      .as[(Long, Long, Double, Double)].head()
    val lpSum = 2 * math.log(2.5 / 3.0) + 1 * math.log(1.5 / 2.0)
    val ce = -lpSum / 3.0
    assert(out._2 == 3L)
    assert(math.abs(out._3 - ce) < 1e-12, s"ce ${out._3} vs $ce")
    assert(math.abs(out._4 - math.exp(ce)) < 1e-12)
  }

  test("short and empty docs get zero bigrams and NULL scores") {
    val docs = Seq((1L, "a b c"), (2L, "solo"), (3L, "")).toDF("id", "text")
    val out = LanguageModel.perplexitySelf(docs, "id", "text")
      .orderBy("doc_id")
      .select(col("doc_id"), col("n_bigrams"), col("perplexity").isNull)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 2L, false), (2L, 0L, true), (3L, 0L, true)))
  }

  test("unseen bigrams and contexts score via the smoothing floor") {
    // Model trained on one corpus, scoring a doc whose bigram (c,d) and
    // context (z) never occur: counts coalesce to 0, P = k/(0 + k*V).
    val train = Seq((1L, "a b c")).toDF("id", "text") // V = {a,b,c} = 3
    val lm = LanguageModel.trainBigramLM(train, "id", "text")
    val out = LanguageModel.perplexity(
      Seq((9L, "z z")).toDF("id", "text"), "id", "text", lm, addK = 0.5)
      .as[(Long, Long, Double, Double)].head()
    val ce = -math.log(0.5 / (0.5 * 3)) // one bigram, unseen context
    assert(out._2 == 1L)
    assert(math.abs(out._3 - ce) < 1e-12, s"ce ${out._3} vs $ce")
  }

  test("perplexityBuckets: thirds partition by score; short docs unscored") {
    // 6 scoreable docs with distinct perplexities -> exactly 2 per bucket;
    // plus one 1-token doc that cannot score.
    val loop = (1 to 30).map(_ => "click here to subscribe").mkString(" ")
    val rnd = new scala.util.Random(11)
    val docs = (1 to 6).map { i =>
      val words = loop.split(" ").toSeq
      (i.toLong, rnd.shuffle(words.take(20 + i * 12)).mkString(" "))
    } :+ (7L -> "solo")
    val out = LanguageModel.perplexityBucketsSelf(
        docs.toDF("id", "text"), "id", "text")
      .orderBy("doc_id").select("doc_id", "perplexity", "bucket")
      .as[(Long, Option[Double], String)].collect()
    val byBucket = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byBucket.getOrElse("unscored", 0) == 1, byBucket.toString)
    assert(byBucket("head") == 2 && byBucket("middle") == 2
      && byBucket("tail") == 2, byBucket.toString)
    // bucket order tracks the score order
    val scored = out.filter(_._2.isDefined).sortBy(_._2.get)
    assert(scored.map(_._3).toSeq ==
      Seq("head", "head", "middle", "middle", "tail", "tail"))
    // sampled cutoffs stay deterministic (same seed -> same buckets)
    val a = LanguageModel.perplexityBucketsSelf(
        docs.toDF("id", "text"), "id", "text", cutoffSample = 0.6)
      .orderBy("doc_id").select("bucket").as[String].collect().toSeq
    val b = LanguageModel.perplexityBucketsSelf(
        docs.toDF("id", "text"), "id", "text", cutoffSample = 0.6)
      .orderBy("doc_id").select("bucket").as[String].collect().toSeq
    assert(a == b)
    // empty-sample guard (ADVICE r10): a cutoffSample so small the md5
    // sample selects zero docs must FAIL LOUDLY, not bucket everything
    // 'tail'
    val e = intercept[Exception] {
      LanguageModel.perplexityBucketsSelf(
          docs.toDF("id", "text"), "id", "text", cutoffSample = 1e-12)
        .collect()
    }
    assert(e.getMessage.contains("selected 0 scoreable docs"),
      e.getMessage.take(200))
  }

  test("Kneser-Ney: hand-computed interpolation, unseen context and continuation") {
    // train "a b a b a c": bigrams ab:2 ba:2 ac:1; c1(a)=3 n1f(a)=2,
    // c1(b)=2 n1f(b)=1; n1b: a<-1, b<-1, c<-1; 3 distinct bigrams; V=3
    val train = Seq((1L, "a b a b a c")).toDF("id", "text")
    val lm = LanguageModel.trainBigramLM(train, "id", "text")
    def score(text: String): (Long, Double) = {
      val r = LanguageModel.perplexityKneserNey(
          Seq((9L, text)).toDF("id", "text"), "id", "text", lm)
        .select("n_bigrams", "cross_entropy").collect().head
      (r.getLong(0), r.getDouble(1))
    }
    def floor(p0: Double) = 0.999999 * p0 + 1e-6 / 3.0
    // seen bigram (a,b): discounted base + lambda * continuation
    val pAB = floor((2.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (1.0 / 3.0))
    val (n1, ce1) = score("a b")
    assert(n1 == 1L && math.abs(ce1 - (-math.log(pAB))) < 1e-12,
      s"$ce1 vs ${-math.log(pAB)}")
    // seen context, unseen bigram (a,a): base 0, lambda * pcont(a)
    val pAA = floor((0.75 * 2.0 / 3.0) * (1.0 / 3.0))
    assert(math.abs(score("a a")._2 - (-math.log(pAA))) < 1e-12)
    // unseen context (z): all mass to continuation, pcont(z)=0 -> floor
    val pZZ = floor(0.0)
    assert(math.abs(score("z z")._2 - (-math.log(pZZ))) < 1e-12)
    // filter direction preserved under KN
    val loop = (1 to 50).map(_ => "click here to subscribe").mkString(" ")
    val mixed = new scala.util.Random(7)
      .shuffle(loop.split(" ").toSeq).mkString(" ")
    val docs = Seq((1L, loop), (2L, mixed)).toDF("id", "text")
    val ppl = LanguageModel.perplexityKneserNeySelf(docs, "id", "text")
      .orderBy("doc_id").select("perplexity").as[Double].collect()
    assert(ppl(0) < ppl(1), s"loop ${ppl(0)} !< mixed ${ppl(1)}")
  }

  test("order-3 KN: hand-computed recursion through the bigram level") {
    // train "a b c a b c a b d": trigrams abc:2 bca:2 cab:2 abd:1;
    // bigrams ab:3 bc:2 ca:2 bd:1 (nb=4 distinct); V=4
    val train = Seq((1L, "a b c a b c a b d")).toDF("id", "text")
    val lm3 = LanguageModel.trainTrigramLM(train, "id", "text")
    val lm2 = LanguageModel.trainBigramLM(train, "id", "text")
    def score(text: String): (Long, Double) = {
      val r = LanguageModel.perplexityKneserNey3(
          Seq((9L, text)).toDF("id", "text"), "id", "text", lm3, lm2)
        .select("n_trigrams", "cross_entropy").collect().head
      (r.getLong(0), if (r.isNullAt(1)) Double.NaN else r.getDouble(1))
    }
    def floor(p: Double) = 0.999999 * p + 1e-6 / 4.0
    // (a,b,c): c3(ab,c)=2, ctx3(a,b): C=3, N=2; bigram (b,c)=2,
    // ctx2(b): C=3, N=2; pcont(c)=1/4
    val p2 = (2.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (1.0 / 4.0)
    val p3 = (2.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * p2
    val (n1, ce1) = score("a b c")
    assert(n1 == 1L && math.abs(ce1 - (-math.log(floor(p3)))) < 1e-12,
      s"$ce1 vs ${-math.log(floor(p3))}")
    // unseen trigram with seen trigram context falls to the bigram level
    // (a,b,z): base3 0, lambda3 = .75*2/3, p2 of unseen (b,z) = lambda2 *
    // pcont(z) = 0 -> p = floor(0)
    assert(math.abs(score("a b z")._2 - (-math.log(floor(0.0)))) < 1e-12)
    // docs under 3 tokens cannot score
    val (n0, ce0) = score("a b")
    assert(n0 == 0L && ce0.isNaN)
  }

  test("stupid backoff: count ratios with 0.4 penalties per backed-off order") {
    // corpus "a b c a b c a b d": trigram abc:2/ctx(a,b)=3; bigrams
    // ab:3 bc:2 ca:2 bd:1; unigrams a:3 b:3 c:2 d:1 (N=9, V=4)
    val train = Seq((1L, "a b c a b c a b d")).toDF("id", "text")
    val lm3 = LanguageModel.trainTrigramLM(train, "id", "text")
    val lm2 = LanguageModel.trainBigramLM(train, "id", "text")
    val lm1 = LanguageModel.trainUnigramLM(train, "id", "text")
    def score(text: String): Double =
      LanguageModel.stupidBackoffScore(
          Seq((9L, text)).toDF("id", "text"), "id", "text", lm3, lm2, lm1)
        .select("neg_log_score").collect().head.getDouble(0)
    def floor(s: Double) = 0.999999 * s + 1e-6 / 4.0
    // seen trigram: plain ratio, no discounting
    assert(math.abs(score("a b c") - (-math.log(floor(2.0 / 3.0)))) < 1e-12)
    // unseen trigram, unseen bigram (y,a): 0.4 * (0.4 * c1(a)/N)
    assert(math.abs(score("x y a")
      - (-math.log(floor(0.4 * (0.4 * (3.0 / 9.0)))))) < 1e-12)
    // fully unseen token: only the floor keeps the log finite
    assert(math.abs(score("a b z") - (-math.log(floor(0.0)))) < 1e-10)
  }

  test("repetitive boilerplate scores lower perplexity than shuffled text") {
    // The filter direction: under a self-trained LM, a doc that is one
    // loop of the same bigram is maximally predictable; a doc of the same
    // tokens in a scrambled order is not.
    val loop = (1 to 50).map(_ => "click here to subscribe").mkString(" ")
    val mixed = new scala.util.Random(7)
      .shuffle(loop.split(" ").toSeq).mkString(" ")
    val docs = Seq((1L, loop), (2L, mixed)).toDF("id", "text")
    val ppl = LanguageModel.perplexitySelf(docs, "id", "text")
      .orderBy("doc_id").select("perplexity").as[Double].collect()
    assert(ppl(0) < ppl(1), s"loop ${ppl(0)} !< mixed ${ppl(1)}")
  }
}
