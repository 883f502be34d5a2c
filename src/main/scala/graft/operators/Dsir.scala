package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** DSIR-style data selection — importance resampling over hashed n-gram
  * features (Xie et al. 2023, arXiv:2302.03169): score every raw document
  * by how much more likely its hashed-n-gram bag is under a TARGET-domain
  * bag-of-n-grams model than under the RAW-corpus model, then resample
  * with probability ∝ the importance weight (Gumbel top-k). The classic
  * "make 100 TB of web look like Wikipedia" selection stage; the reference
  * engine has no selection surface (SURVEY §2 extension family).
  *
  * Scale shape: both MODELS ARE TABLES of at most `buckets` rows —
  * features hash into a fixed bucket space, so model size is a constant
  * chosen up front (2^16..2^20 in the paper), independent of corpus size.
  * Training is one map-side n-gram explode + one keyed aggregate per
  * corpus; scoring joins the per-doc feature bag against the two models
  * broadcast (≤ buckets rows each), so the raw corpus is touched exactly
  * once and nothing ever shuffles wider than the per-doc feature bags.
  * Resampling is Gumbel top-k: a per-row key and a `TakeOrdered` limit —
  * no global sort, driver traffic bounded by k.
  *
  * Oracle parity (the q_text_lm_perplexity / q_text_nb_margin contract):
  * bucket ids come from the house md5-derived integer (DuckDB:
  * `CAST('0x'||substr(md5(g),1,8) AS BIGINT) % B`); counts are exact
  * integers; each per-bucket term is `cnt · (ln(p̂_t) − ln(p̂_r))` — two
  * transcendentals on arguments exact in double (integer counts + k·B
  * with k a small rational; totals stay far under 2^53 — ~2e13 n-grams
  * at 100 TB) — summed in DECIMAL(38,18) (order-independent), rounded to
  * 6 decimals only at the edge. The Gumbel noise is derived from the same
  * md5 uniform as [[Curation]]'s samplers, so the resample is a pure
  * function of (corpus, seed) on both engines.
  */
object Dsir {

  /** Lowercased whitespace tokens — the tfidf/bm25/LM convention. */
  private def toks(text: Column) = TextAnalysis.words(lower(text))

  /** House md5 bucket: first 8 hex chars of md5(g) as a long, mod B
    * (positive on both engines — the md5 value is in [0, 2^32)).
    */
  private def bucketOf(g: Column, buckets: Int): Column =
    conv(substring(md5(g), 1, 8), 16, 10).cast(LongType) % buckets

  private def checkBuckets(buckets: Int): Unit =
    require(buckets > 0 && buckets <= (1 << 26),
      s"Dsir: buckets must be in [1, 2^26], got $buckets — the models are " +
        "broadcast at scoring time, so the bucket space must stay " +
        "broadcast-sized")

  /** Per-document hashed n-gram bag: (doc_id, bucket, cnt) over unigrams
    * and bigrams (the paper's feature space). Map-side explode + one
    * keyed aggregate; documents with no tokens contribute no rows (the
    * scorer reattaches them with weight 0).
    */
  def hashedNgramFeatures(docs: DataFrame, idCol: String, textCol: String,
                          buckets: Int): DataFrame = {
    checkBuckets(buckets)
    val tk = docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__tk"))
    val uni = tk.select(col("doc_id"), explode(col("__tk")).as("__g"))
    // size >= 2 BEFORE sequence() — sequence(1, 0) counts DOWN and would
    // fabricate a reversed bigram for 1-token docs (the repetitionStats
    // lesson, same as LanguageModel.bigrams)
    val bi = tk.filter(size(col("__tk")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("__tk")) - 1),
          i => concat_ws(" ", element_at(col("__tk"), i),
            element_at(col("__tk"), i + 1)))).as("__g"))
    uni.unionAll(bi)
      .select(col("doc_id"), bucketOf(col("__g"), buckets).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Train a hashed-n-gram bag model: (bucket, cnt), ≤ `buckets` rows.
    * The model IS a table — it round-trips through a plain parquet write,
    * and a model trained on corpus A scores corpus B without revisiting A.
    */
  def featureModel(docs: DataFrame, idCol: String, textCol: String,
                   buckets: Int): DataFrame =
    featureModelFromFeatures(hashedNgramFeatures(docs, idCol, textCol, buckets))

  /** [[featureModel]] over a PRECOMPUTED per-doc feature frame — for
    * callers that also score the same corpus and can share ONE
    * [[hashedNgramFeatures]] pass between model training and
    * [[importanceWeightsFromFeatures]] (r18: the DsirSelect recipe step
    * hashed-featured its pinned corpus twice, once per consumer).
    */
  def featureModelFromFeatures(feats: DataFrame): DataFrame =
    feats.groupBy("bucket").agg(sum("cnt").as("cnt"))

  /** O(batch) model maintenance: fold a new batch's features into an
    * existing bag model — counts are additive, so
    * `updateFeatureModel(featureModel(A), B) ≡ featureModel(A ∪ B)`
    * (spec-pinned) and the persisted-model path ("train once, keep
    * selecting as the corpus grows") never revisits A. One aggregate
    * over the batch plus a ≤ 2·buckets-row merge.
    */
  def updateFeatureModel(model: DataFrame, newDocs: DataFrame, idCol: String,
                         textCol: String, buckets: Int): DataFrame = {
    require(model.columns.toSeq.sorted == Seq("bucket", "cnt"),
      s"updateFeatureModel: not a feature model (want columns bucket, cnt; " +
        s"got ${model.columns.mkString(", ")})")
    model.unionByName(featureModel(newDocs, idCol, textCol, buckets))
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
  }

  /** Per-document log importance weight against two trained models:
    * log w(x) = Σ_b c_x(b) · [ln p̂_t(b) − ln p̂_r(b)] with Lidstone
    * smoothing p̂(b) = (cnt_b + k) / (tot + k·B). Returns one row per
    * input document: (doc_id, n_features, log_weight) — log_weight
    * rounded to 6 decimals (the DECIMAL-sum portability contract);
    * feature-less docs carry n_features = 0 and weight 0 (the empty
    * product).
    *
    * Both model joins broadcast (≤ buckets rows); the totals ride along
    * as broadcast scalar aggregates. One pass over the scored corpus.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetModel: DataFrame, rawModel: DataFrame,
                        buckets: Int, addK: Double = 0.5): DataFrame =
    importanceWeightsFromFeatures(docs, idCol,
      hashedNgramFeatures(docs, idCol, textCol, buckets),
      targetModel, rawModel, buckets, addK)

  /** [[importanceWeights]] over a PRECOMPUTED per-doc feature frame (see
    * [[featureModelFromFeatures]] — one shared feature pass when the raw
    * model trains on the same corpus being scored). `feats` must be
    * exactly `hashedNgramFeatures(docs, idCol, textCol, buckets)`.
    */
  def importanceWeightsFromFeatures(docs: DataFrame, idCol: String,
                                    feats: DataFrame,
                                    targetModel: DataFrame,
                                    rawModel: DataFrame,
                                    buckets: Int,
                                    addK: Double = 0.5): DataFrame = {
    checkBuckets(buckets)
    require(addK > 0, s"Dsir: addK must be > 0, got $addK")
    val k = lit(addK)
    val kB = lit(addK * buckets)
    val tTot = targetModel.agg(sum(col("cnt")).cast(LongType).as("__t_tot"))
    val rTot = rawModel.agg(sum(col("cnt")).cast(LongType).as("__r_tot"))
    val scored = feats
      .join(broadcast(targetModel.select(col("bucket"),
        col("cnt").as("__t_cnt"))), Seq("bucket"), "left")
      .join(broadcast(rawModel.select(col("bucket"),
        col("cnt").as("__r_cnt"))), Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast(LongType).as("n_features"),
        sum((col("cnt").cast("double") *
            (log((coalesce(col("__t_cnt"), lit(0L)) + k)
                / (col("__t_tot") + kB))
              - log((coalesce(col("__r_cnt"), lit(0L)) + k)
                / (col("__r_tot") + kB))))
          .cast(DecimalType(38, 18))).as("__s"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_features"), lit(0L)).as("n_features"),
        round(coalesce(col("__s").cast("double"), lit(0.0)), 6)
          .as("log_weight"))
  }

  /** Gumbel top-k resample WITHOUT replacement, P(keep) ∝ exp(log_weight):
    * key = log_weight + Gumbel(0,1) with the noise −ln(−ln u) derived from
    * the house md5 uniform u(seed, id) ∈ (0, 1) — deterministic, seedable,
    * and replayable in DuckDB. The key is rounded to 6 decimals and ties
    * break on id, so the selection is total and engine-independent.
    * `orderBy(...).limit(k)` plans as TakeOrdered — per-partition top-k,
    * driver traffic O(k), no global sort.
    */
  def resampleTopK(weighted: DataFrame, idCol: String, logWeightCol: String,
                   k: Int, seed: String): DataFrame = {
    require(k > 0, s"Dsir: k must be > 0, got $k")
    // +0.5 keeps u strictly inside (0,1): u=0 would send −ln(−ln u) to
    // −∞ and u=1 to +∞
    val u = (conv(substring(md5(concat_ws(":", lit(seed),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast(LongType)
        .cast("double") + 0.5) / 4294967296.0
    weighted
      .withColumn("gumbel_key", round(col(logWeightCol) + -log(-log(u)), 6))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }

  /** The end-to-end selection: train both models, score the raw corpus,
    * resample k docs. `target` is the small in-domain exemplar corpus
    * (Wikipedia, textbooks); `raw` is the corpus being selected from —
    * which also serves as its own background model, per the paper.
    */
  def selectByImportance(raw: DataFrame, target: DataFrame, idCol: String,
                         textCol: String, buckets: Int, k: Int,
                         seed: String, addK: Double = 0.5): DataFrame = {
    val tm = featureModel(target, idCol, textCol, buckets)
    val rm = featureModel(raw, idCol, textCol, buckets)
    resampleTopK(
      importanceWeights(raw, idCol, textCol, tm, rm, buckets, addK),
      "doc_id", "log_weight", k, seed)
  }
}
