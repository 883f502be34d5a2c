package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bigram language-model scoring — the perplexity-filter stage of a
  * training-data pipeline (the CCNet/KenLM design point: score every
  * document against an n-gram LM and drop the high-perplexity tail),
  * re-expressed as relational plans. The reference engine has no LM
  * surface (SURVEY §2 extension family); semantics follow the published
  * n-gram smoothing literature (add-k / Lidstone).
  *
  * Scale shape: the MODEL IS A TABLE — (w1, w2, cnt) bigram counts from
  * one map-side bigram construction plus one keyed hash aggregate — so
  * vocabulary size never touches the driver and training is a single
  * shuffle regardless of corpus size. Scoring is three joins keyed by the
  * model's own columns (bigram left-join for counts, context left-join
  * for denominators, one scalar cross-join for |V|) and one per-doc
  * aggregate; every join key is also the upstream aggregate's grouping
  * key, so partial aggregation is map-side everywhere and no stage ever
  * materializes more than a document's own bigram multiset.
  *
  * Oracle parity: the per-bigram log-probability is ONE transcendental on
  * arguments that are exact in double (integer counts, k·|V| with k a
  * small rational), and the per-doc sum runs in DECIMAL(38,18) — exact
  * and summation-order-independent — so the only cross-engine hazards are
  * the last-ulp of ln/exp, inside the comparator's 12-significant-digit
  * contract (the q_text_tfidf/bm25 precedent).
  */
object LanguageModel {

  /** Lowercased whitespace tokens — `lower` folds case so "The"/"the"
    * share a vocabulary entry (the tfidf/bm25 convention, not
    * repetitionStats' case-sensitive one, which measures verbatim repeats).
    */
  private def toks(text: org.apache.spark.sql.Column) =
    TextAnalysis.words(lower(text))

  /** Consecutive-token bigram occurrences, map-side (no self-join, no
    * window): (doc_id, w1, w2), one row per position. The `size >= 2`
    * filter runs BEFORE `sequence()` — `sequence(1, 0)` counts DOWN and
    * would fabricate a reversed bigram for 1-token docs (the
    * repetitionStats lesson).
    */
  private def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("__tk")) - 1),
          i => struct(element_at(col("__tk"), i).as("w1"),
            element_at(col("__tk"), i + 1).as("w2")))).as("__p"))
      .select(col("doc_id"), col("__p.w1"), col("__p.w2"))

  /** Train a bigram LM over a corpus: (w1, w2, cnt). Context totals and
    * vocabulary size are DERIVED from this table at scoring time, so the
    * model round-trips through a plain parquet write and a model trained
    * on corpus A scores corpus B without revisiting A's text.
    */
  def trainBigramLM(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bigrams(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))

  /** Consecutive-token trigram occurrences — the [[bigrams]] shape one
    * order up (docs below 3 tokens contribute nothing).
    */
  private def trigrams(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("__tk")) - 2),
          i => struct(element_at(col("__tk"), i).as("w1"),
            element_at(col("__tk"), i + 1).as("w2"),
            element_at(col("__tk"), i + 2).as("w3")))).as("__p"))
      .select(col("doc_id"), col("__p.w1"), col("__p.w2"), col("__p.w3"))

  /** Train a trigram LM: (w1, w2, w3, cnt) — the order-3 table
    * [[perplexityKneserNey3]] scores against (its lower order comes from
    * [[trainBigramLM]]; KenLM likewise trains every order from the
    * corpus rather than marginalizing, since the highest order misses
    * each document's edge positions).
    */
  def trainTrigramLM(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    trigrams(docs, idCol, textCol)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("cnt"))

  /** Per-document add-k smoothed bigram cross-entropy and perplexity
    * against a trained model: P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·|V|)
    * with c(w1·) = Σ_w2 c(w1,w2) and |V| the model's distinct token count.
    * Unseen bigrams get the k floor; unseen contexts degrade to the
    * uniform 1/|V| — both via left joins, no driver vocabulary.
    *
    * Returns one row per input document: (doc_id, n_bigrams,
    * cross_entropy, perplexity). Docs with < 2 tokens have n_bigrams = 0
    * and NULL scores (nothing to score — the caller's policy decides
    * whether empties pass the filter). perplexity = exp(cross_entropy),
    * cross_entropy = −(Σ n·ln P)/N summed exactly in DECIMAL(38,18)
    * (order-independent; |Σ| ≤ docTokens · ln|V| ≈ 1e5 for a 1M-token
    * doc, far inside the 20 integer digits).
    */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 lm: DataFrame, addK: Double = 0.5): DataFrame = {
    require(addK > 0, s"perplexity: addK must be > 0, got $addK")
    // Context totals: one hash agg of the model keyed by w1 (the model is
    // already (w1, w2)-unique so this never re-reads text). |V| is a
    // scalar aggregate cross-joined onto every row — the repo-wide
    // broadcast-scalar pattern, not a collect.
    val ctx = lm.groupBy("w1").agg(sum("cnt").as("__c1"))
    val vocab = lm.select(explode(array(col("w1"), col("w2"))).as("__w"))
      .agg(countDistinct(col("__w")).as("__v"))
    // Per-doc bigram multiset, grouped BEFORE the model join so the join
    // carries one row per distinct (doc, bigram), not per occurrence.
    val db = bigrams(docs, idCol, textCol)
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("__n"))
    val lp = ln((coalesce(col("cnt"), lit(0L)) + lit(addK)) /
      (coalesce(col("__c1"), lit(0L)) + lit(addK) * col("__v")))
    val scored = db
      .join(lm, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id").agg(
        sum(col("__n")).as("__nb"),
        sum((col("__n") * lp).cast(DecimalType(38, 18))).as("__s"))
    val ce = -(col("__s").cast("double") / col("__nb"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__nb"), lit(0L)).as("n_bigrams"),
        ce.as("cross_entropy"),
        exp(ce).as("perplexity"))
  }

  /** Per-document perplexity under INTERPOLATED KNESER–NEY smoothing
    * (Kneser & Ney 1995; the smoothing KenLM — and therefore the CCNet
    * filter the add-k form approximates — actually uses): absolute
    * discount `d` on seen bigrams, the freed mass interpolated with the
    * CONTINUATION probability (how many distinct contexts a word follows
    * — "Francisco" is frequent but predictable, "glasses" follows
    * anything):
    *
    *   P(w2|w1) = max(c(w1,w2) − d, 0)/c(w1·)
    *              + d·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)
    *
    * with an unseen CONTEXT giving all its mass to the continuation term
    * and a final `(1−ε)·P + ε/|V|` uniform floor (ε = 1e-6, the <unk>
    * analog) keeping every log finite. Every input is an exact integer
    * aggregate of the model table (row counts and sums — no new corpus
    * pass), the formula is a fixed small IEEE expression tree replayed
    * with identical association in the oracle, and the per-doc log sum
    * runs in DECIMAL(38,18) — the [[perplexity]] portability contract.
    * Same output shape and same model-keyed join plan as [[perplexity]];
    * only the probability expression differs.
    */
  def perplexityKneserNey(docs: DataFrame, idCol: String, textCol: String,
                          lm: DataFrame, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"perplexityKneserNey: discount must be in (0,1), got $discount")
    val ctx = lm.groupBy("w1").agg(sum("cnt").as("__c1"),
      count(lit(1)).as("__n1f"))
    val bwd = lm.groupBy("w2").agg(count(lit(1)).as("__n1b"))
    val totals = lm.agg(count(lit(1)).as("__nb"))
    val vocab = lm.select(explode(array(col("w1"), col("w2"))).as("__w"))
      .agg(countDistinct(col("__w")).as("__v"))
    val db = bigrams(docs, idCol, textCol)
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("__n"))
    val d = lit(discount)
    val pcont = coalesce(col("__n1b"), lit(0L)).cast("double") /
      col("__nb").cast("double")
    val seenCtx = col("__c1").isNotNull
    val base = when(seenCtx,
      greatest(coalesce(col("cnt"), lit(0L)).cast("double") - d, lit(0.0)) /
        col("__c1").cast("double")).otherwise(lit(0.0))
    val lam = when(seenCtx,
      d * col("__n1f").cast("double") / col("__c1").cast("double"))
      .otherwise(lit(1.0))
    // 0.999999 as ONE literal, not 1.0 − 1e-6: both engines then take the
    // nearest double of the same decimal, where a subtraction could land
    // an ulp apart depending on the engine's literal typing
    val p = lit(0.999999) * (base + lam * pcont) +
      lit(1e-6) / col("__v").cast("double")
    val scored = db
      .join(lm, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(bwd, Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id").agg(
        sum(col("__n")).as("__nb2"),
        sum((col("__n") * ln(p)).cast(DecimalType(38, 18))).as("__s"))
    val ce = -(col("__s").cast("double") / col("__nb2"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__nb2"), lit(0L)).as("n_bigrams"),
        ce.as("cross_entropy"),
        exp(ce).as("perplexity"))
  }

  /** Train-on-self form of [[perplexityKneserNey]] (the [[perplexitySelf]]
    * convention and pin).
    */
  def perplexityKneserNeySelf(docs: DataFrame, idCol: String,
                              textCol: String,
                              discount: Double = 0.75): DataFrame = {
    val lm = trainBigramLM(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    perplexityKneserNey(docs, idCol, textCol, lm, discount)
  }

  /** ORDER-3 interpolated Kneser–Ney perplexity — the KenLM recursion
    * one order up from [[perplexityKneserNey]]:
    *
    *   P3(w3|w1w2) = max(c3 − d, 0)/c(w1w2·)
    *                 + d·N1+(w1w2·)/c(w1w2·) · P2(w3|w2)
    *
    * with P2 the bigram-level interpolated-KN estimate (discounted raw
    * bigram counts interpolated with the continuation probability — the
    * NON-modified variant: KenLM's "modified" refinement swaps the
    * middle order's raw counts for continuation counts and uses
    * count-banded discounts; stated precisely so the claim matches the
    * code), an unseen trigram context giving all its mass to P2, an
    * unseen bigram context all of P2's to the continuation term, and
    * the same 1e-6 uniform floor. Inputs: the trigram AND bigram model
    * tables (both one-pass keyed aggregates, both parquet-portable);
    * every derived statistic is an integer aggregate of a model table.
    * Scoring is five model-keyed left joins + two broadcast scalars on
    * the doc-keyed trigram frame — the [[perplexity]] plan shape, two
    * joins wider. Docs under 3 tokens have no trigram and score NULL.
    */
  def perplexityKneserNey3(docs: DataFrame, idCol: String, textCol: String,
                           lm3: DataFrame, lm2: DataFrame,
                           discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"perplexityKneserNey3: discount must be in (0,1), got $discount")
    val d = lit(discount)
    val ctx3 = lm3.groupBy("w1", "w2").agg(sum("cnt").as("__c3"),
      count(lit(1)).as("__n3f"))
    val bg = lm2.select(col("w1").as("w2"), col("w2").as("w3"),
      col("cnt").as("__cbg"))
    val ctx2 = lm2.groupBy("w1").agg(sum("cnt").as("__c2"),
      count(lit(1)).as("__n2f")).withColumnRenamed("w1", "w3ctx")
    val bwd = lm2.groupBy("w2").agg(count(lit(1)).as("__n1b"))
      .withColumnRenamed("w2", "w3bwd")
    val totals = lm2.agg(count(lit(1)).as("__nb"))
    val vocab = lm2.select(explode(array(col("w1"), col("w2"))).as("__w"))
      .agg(countDistinct(col("__w")).as("__v"))
    val db = trigrams(docs, idCol, textCol)
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).as("__n"))
    val pcont = coalesce(col("__n1b"), lit(0L)).cast("double") /
      col("__nb").cast("double")
    val seen2 = col("__c2").isNotNull
    val p2 = when(seen2,
      greatest(coalesce(col("__cbg"), lit(0L)).cast("double") - d, lit(0.0)) /
        col("__c2").cast("double") +
        d * col("__n2f").cast("double") / col("__c2").cast("double") * pcont)
      .otherwise(pcont)
    val seen3 = col("__c3").isNotNull
    val p3 = when(seen3,
      greatest(coalesce(col("cnt"), lit(0L)).cast("double") - d, lit(0.0)) /
        col("__c3").cast("double") +
        d * col("__n3f").cast("double") / col("__c3").cast("double") * p2)
      .otherwise(p2)
    val p = lit(0.999999) * p3 + lit(1e-6) / col("__v").cast("double")
    val scored = db
      .join(lm3, Seq("w1", "w2", "w3"), "left")
      .join(ctx3, Seq("w1", "w2"), "left")
      .join(bg, Seq("w2", "w3"), "left")
      .join(ctx2, col("w3ctx") === col("w2"), "left")
      .join(bwd, col("w3bwd") === col("w3"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id").agg(
        sum(col("__n")).as("__ntri"),
        sum((col("__n") * ln(p)).cast(DecimalType(38, 18))).as("__s"))
    val ce = -(col("__s").cast("double") / col("__ntri"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__ntri"), lit(0L)).as("n_trigrams"),
        ce.as("cross_entropy"),
        exp(ce).as("perplexity"))
  }

  /** Unigram token counts: (w, cnt) — the order-1 table STUPID BACKOFF
    * backs off into (token occurrences, one corpus pass).
    */
  def trainUnigramLM(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(explode(toks(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** STUPID BACKOFF scoring (Brants et al. 2007, "Large Language Models
    * in Machine Translation" §4) — the WEB-SCALE smoothing: no
    * discounts, no continuation statistics, just count ratios with a
    * fixed 0.4 backoff penalty per order:
    *
    *   S(w3|w1w2) = c3/c(w1w2·)        if the trigram was seen
    *              = 0.4 · S(w3|w2)     otherwise
    *   S(w3|w2)   = c2/c(w2·), else 0.4 · S(w3)
    *   S(w3)      = c1(w3)/N
    *
    * S is deliberately UNNORMALIZED (the paper's "stupid"): at corpus
    * sizes where KN's continuation counts stop paying for themselves,
    * count ratios alone match its quality — which is exactly the 100 TB
    * regime this engine targets, so both smoothings ship:
    * [[perplexityKneserNey3]] when the model table is modest, this when
    * it is the corpus. Returns (doc_id, n_trigrams, neg_log_score) —
    * the mean negative log SCORE, perplexity-shaped but not a true
    * perplexity, summed in DECIMAL(38,18); the same 1e-6/|V| floor
    * keeps logs finite for fully-unseen tokens. Three model tables, all
    * one-pass integer aggregates; the scoring joins and plan shape are
    * [[perplexityKneserNey3]]'s minus the continuation tables.
    */
  def stupidBackoffScore(docs: DataFrame, idCol: String, textCol: String,
                         lm3: DataFrame, lm2: DataFrame, lm1: DataFrame,
                         alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha < 1,
      s"stupidBackoffScore: alpha must be in (0,1), got $alpha")
    val a = lit(alpha)
    val ctx3 = lm3.groupBy("w1", "w2").agg(sum("cnt").as("__c3"))
    val bg = lm2.select(col("w1").as("w2"), col("w2").as("w3"),
      col("cnt").as("__cbg"))
    val ctx2 = lm2.groupBy("w1").agg(sum("cnt").as("__c2"))
      .withColumnRenamed("w1", "w2k")
    val uni = lm1.select(col("w").as("w3"), col("cnt").as("__c1"))
    val totals = lm1.agg(sum("cnt").as("__n1"))
    val vocab = lm1.agg(count(lit(1)).as("__v"))
    val db = trigrams(docs, idCol, textCol)
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).as("__n"))
    val s1 = coalesce(col("__c1"), lit(0L)).cast("double") /
      col("__n1").cast("double")
    val s2 = when(col("__cbg").isNotNull,
      col("__cbg").cast("double") / col("__c2").cast("double"))
      .otherwise(a * s1)
    val s3 = when(col("cnt").isNotNull,
      col("cnt").cast("double") / col("__c3").cast("double"))
      .otherwise(a * s2)
    val s = lit(0.999999) * s3 + lit(1e-6) / col("__v").cast("double")
    val scored = db
      .join(lm3, Seq("w1", "w2", "w3"), "left")
      .join(ctx3, Seq("w1", "w2"), "left")
      .join(bg, Seq("w2", "w3"), "left")
      .join(ctx2, col("w2k") === col("w2"), "left")
      .join(uni, Seq("w3"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id").agg(
        sum(col("__n")).as("__ntri"),
        sum((col("__n") * ln(s)).cast(DecimalType(38, 18))).as("__s"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__ntri"), lit(0L)).as("n_trigrams"),
        (-(col("__s").cast("double") / col("__ntri"))).as("neg_log_score"))
  }

  /** Train-on-self form of [[stupidBackoffScore]] (all three tables
    * pinned, the [[perplexitySelf]] convention).
    */
  def stupidBackoffScoreSelf(docs: DataFrame, idCol: String,
                             textCol: String,
                             alpha: Double = 0.4): DataFrame = {
    val lm3 = trainTrigramLM(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lm2 = trainBigramLM(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lm1 = trainUnigramLM(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    stupidBackoffScore(docs, idCol, textCol, lm3, lm2, lm1, alpha)
  }

  /** Train-on-self form of [[perplexityKneserNey3]]: both model tables
    * trained on the corpus and pinned (scoring reads each from several
    * subtrees — the [[perplexitySelf]] convention).
    */
  def perplexityKneserNey3Self(docs: DataFrame, idCol: String,
                               textCol: String,
                               discount: Double = 0.75): DataFrame = {
    val lm3 = trainTrigramLM(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lm2 = trainBigramLM(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    perplexityKneserNey3(docs, idCol, textCol, lm3, lm2, discount)
  }

  /** Train-on-self convenience: the corpus scores against its own bigram
    * statistics — the bootstrap form used before a curated reference LM
    * exists (high-perplexity docs are the ones even their OWN corpus
    * finds surprising: mangled encodings, tables, code in a prose crawl).
    *
    * The trained model is PINNED (MEMORY_AND_DISK): `perplexity` reads it
    * from three subtrees (bigram join, context totals, |V|), and without
    * the pin each one re-tokenizes the corpus — four full text scans
    * instead of two. The pinned frame is vocabulary-scale, not
    * corpus-scale; release is LRU (the gapFillDaily convention — callers
    * that need deterministic release train and persist the model
    * themselves via [[trainBigramLM]]).
    */
  def perplexitySelf(docs: DataFrame, idCol: String, textCol: String,
                     addK: Double = 0.5): DataFrame = {
    val lm = trainBigramLM(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    perplexity(docs, idCol, textCol, lm, addK)
  }

  /** CCNet's perplexity bucketing (Wenzek et al. 2020 §4.3): split the
    * corpus into `head` / `middle` / `tail` thirds by LM perplexity —
    * the published shape downstream mixing recipes consume ("train on
    * head+middle, sample tail"). Cutoffs are the exact interpolated 1/3
    * and 2/3 percentiles of the ROUNDED perplexity (the
    * [[Curation.filterByGroupQuantile]] portability precedent: Spark's
    * exact `percentile` matches `quantile_cont` bit-for-bit, and
    * rounding first makes the comparison boundary-stable); assignment is
    * then one map-side comparison against the broadcast cutoffs.
    * Unscoreable docs (< 2 tokens, NULL perplexity) bucket as
    * `unscored`.
    *
    * Scale: the exact percentile gathers its input values on one
    * reducer — fine for cutoffs computed over a SAMPLE, which is what
    * `cutoffSample < 1` does (CCNet's own setup: thresholds from a
    * held-out sample, not the full corpus): the cutoff aggregate then
    * sees `cutoffSample × N` docs, chosen by the house md5 uniform
    * (deterministic, engine-portable), while every doc still gets a
    * bucket. At 100 TB run with `cutoffSample ≈ 1e-3`; the default 1.0
    * is the small-corpus exact form.
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        lm: DataFrame, addK: Double = 0.5,
                        cutoffSample: Double = 1.0,
                        seed: String = "ppl"): DataFrame = {
    require(cutoffSample > 0 && cutoffSample <= 1.0,
      s"perplexityBuckets: cutoffSample must be in (0,1], got $cutoffSample")
    // Pinned: the cutoff aggregate AND the final projection both consume
    // this frame — unpinned, the whole LM score chain (bigram explode +
    // three model joins) executes twice per call (code-review r10).
    // Release is LRU, the perplexitySelf model-pin convention.
    val p = perplexity(docs, idCol, textCol, lm, addK)
      .withColumn("__r", round(col("perplexity"), 6))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = p.filter(col("__r").isNotNull)
    val forCuts =
      if (cutoffSample >= 1.0) base
      else base.filter(
        conv(substring(md5(concat_ws(":", lit(seed),
            col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long").cast("double") / 4294967296.0 < cutoffSample)
    val cuts = forCuts.agg(
      expr("percentile(__r, 0.3333333333333333d)").as("__c1"),
      expr("percentile(__r, 0.6666666666666666d)").as("__c2"),
      count(lit(1)).as("__cn"))
    // Empty-sample guard (ADVICE r10): with cutoffSample < 1 the md5
    // sample can select zero rows; the percentiles are then NULL and the
    // when-chain would silently bucket every scoreable doc as 'tail'.
    // Fail loudly instead — an empty threshold sample is a configuration
    // error (cutoffSample too small for the corpus), not a bucketing.
    // The guard sits AFTER the 'unscored' branch, so an all-unscored
    // corpus (where __cn = 0 is legitimate) still buckets cleanly.
    p.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("n_bigrams"),
        col("__r").as("perplexity"),
        when(col("__r").isNull, lit("unscored"))
          .when(col("__cn") === 0, raise_error(concat(
            lit("perplexityBuckets: cutoffSample="), lit(cutoffSample),
            lit(" selected 0 scoreable docs; raise cutoffSample")))
            .cast("string"))
          .when(col("__r") <= col("__c1"), lit("head"))
          .when(col("__r") <= col("__c2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Train-on-self form of [[perplexityBuckets]] (the
    * [[perplexitySelf]] convention and pin).
    */
  def perplexityBucketsSelf(docs: DataFrame, idCol: String, textCol: String,
                            addK: Double = 0.5, cutoffSample: Double = 1.0,
                            seed: String = "ppl"): DataFrame = {
    val lm = trainBigramLM(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    perplexityBuckets(docs, idCol, textCol, lm, addK, cutoffSample, seed)
  }
}
