package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multinomial Naive Bayes text classification — the quality-classifier
  * stage of a training-data pipeline (the GPT-3/CCNet design point: score
  * every crawled document with a cheap linear classifier trained on a
  * curated seed corpus, and keep the ones that look like the seed). The
  * reference engine has no classifier surface (SURVEY §2 extension
  * family); semantics follow the standard multinomial NB with add-k
  * (Lidstone) smoothing.
  *
  * Scale shape, same contract as [[LanguageModel]]: the MODEL IS A TABLE —
  * (label, token, cnt) counts from one map-side token explode plus one
  * keyed hash aggregate, with per-label document counts riding along as a
  * reserved empty-token row — so vocabulary never touches the driver, the
  * model round-trips through a plain parquet write, and a model trained on
  * corpus A scores corpus B without revisiting A's text. Scoring joins are
  * keyed by the model's own grouping columns (map-side partial aggregation
  * everywhere), the per-(doc, label) grid is |doc's distinct in-vocab
  * tokens| × |labels| rows with labels guarded small, and the per-doc
  * argmax is one doc-keyed window.
  *
  * Oracle parity: each log-probability is ONE transcendental on arguments
  * exact in double (integer counts, k a small rational; the ratio is one
  * IEEE division), per-(doc, label) sums run in DECIMAL(38,18) — exact and
  * summation-order-independent — and the returned row carries NO floats
  * (the score only decides the argmax; ties break label-ascending), so the
  * driver comparator sees integers and strings only.
  */
object Classifier {

  /** Reserved token key carrying per-label document counts inside the
    * model table. [[TextAnalysis.words]] can never emit an empty string
    * (the split filter drops them), so the key cannot collide with a real
    * vocabulary entry.
    */
  private val PriorKey = ""

  private def toks(text: Column) = TextAnalysis.words(lower(text))

  /** Train a multinomial NB model: (label, token, cnt) token-occurrence
    * counts per label, plus one `(label, "", n_docs)` prior row per label.
    * NULL labels are rejected (coalesce to a sentinel first — the
    * capPerGroup convention); empty-token docs still contribute their
    * prior row.
    */
  def trainNaiveBayes(docs: DataFrame, labelCol: String,
                      textCol: String): DataFrame = {
    // NULL-label rejection, enforced (ADVICE r9: the doc promised it but
    // nothing checked) — as a per-row raise_error INSIDE the label
    // expression, not an eager isEmpty probe: the check rides the train
    // scan map-side, costing zero extra passes at corpus scale, and fails
    // fast with an actionable message instead of minting a silent NULL
    // class (whose NULLS-first window tiebreak would also desync the
    // DuckDB oracle's NULLS-last default).
    val labelExpr = col(labelCol).cast("string")
    val checked = when(labelExpr.isNull, raise_error(lit(
      s"trainNaiveBayes: NULL label in '$labelCol' — coalesce labels to a " +
        "sentinel class first (the capPerGroup convention)"))).otherwise(labelExpr)
    val labeled = docs.select(checked.as("label"),
      col(textCol).as("__text"))
    val counts = labeled
      .select(col("label"), explode(toks(col("__text"))).as("token"))
      .groupBy("label", "token").agg(count(lit(1)).as("cnt"))
    val priors = labeled.groupBy("label")
      .agg(count(lit(1)).as("cnt")).withColumn("token", lit(PriorKey))
      .select("label", "token", "cnt")
    counts.unionByName(priors)
  }

  /** Classify every document against a trained model: per-(doc, label)
    * log-posterior `ln(prior) + Σ_tok n·ln((c(l,tok)+k) / (c(l,·)+k·|V|))`,
    * argmax per doc with ties broken label-ascending.
    *
    * Out-of-vocabulary tokens are IGNORED (the only replayable choice:
    * fasttext's hashed OOV buckets aren't portable, and a per-label k-floor
    * for tokens NO label has seen would shift labels by their denominators
    * — unequal evidence from zero evidence). A doc with no in-vocab tokens
    * scores on priors alone (majority class). Returns one row per input
    * doc: (doc_id, pred_label, n_scored) with `n_scored` the in-vocab
    * token occurrences used — integers and strings only, no floats.
    *
    * Scale: |labels| is metadata (guarded ≤ `maxLabels`); the grid stage
    * is doc-tokens × labels rows keyed by (doc, label) — the shuffle is
    * doc-keyed like every dedup aggregate, never corpus × vocab.
    */
  def classifyNaiveBayes(docs: DataFrame, idCol: String, textCol: String,
                         model: DataFrame, addK: Double = 0.5,
                         maxLabels: Int = 256): DataFrame = {
    val scored = scoreFrame(docs, idCol, textCol, model, addK, maxLabels)
    val w = Window.partitionBy("doc_id")
      .orderBy(col("__score").desc, col("label").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("label").as("pred_label"),
        col("__ns").as("n_scored"))
  }

  /** [[classifyNaiveBayes]] plus the decision MARGIN — the log-odds gap
    * `score(best) − score(runner-up)` — as a portable column (VERDICT r9
    * §missing-2: the GPT-3-style quality filter thresholds on the
    * classifier score, not the hard argmax, so the margin must surface).
    * Rendered `round(·, 6)` double, the [[LanguageModel]] perplexity
    * portability contract: both terms are a DECIMAL(38,18) evidence sum
    * cast to double plus one ln on exact-in-double arguments, so the
    * subtraction replays bit-for-bit in DuckDB. NULL margin when the
    * model has a single label (no runner-up to compare against).
    */
  def classifyNaiveBayesWithMargin(docs: DataFrame, idCol: String,
                                   textCol: String, model: DataFrame,
                                   addK: Double = 0.5,
                                   maxLabels: Int = 256): DataFrame = {
    val scored = scoreFrame(docs, idCol, textCol, model, addK, maxLabels)
    val w = Window.partitionBy("doc_id")
      .orderBy(col("__score").desc, col("label").asc)
    scored.withColumn("__rn", row_number().over(w))
      .withColumn("__next", lead(col("__score"), 1).over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("label").as("pred_label"),
        col("__ns").as("n_scored"),
        round(col("__score") - col("__next"), 6).as("margin"))
  }

  /** Log-odds margin TOWARD one designated label:
    * `margin_keep = score(keepLabel) − max over the other labels` —
    * positive iff the classifier would pick `keepLabel`, and the signed
    * confidence either way (the [[classifyNaiveBayesWithMargin]] margin
    * is unsigned: best vs runner-up, whoever they are). This is the score
    * axis the GPT-3-style stochastic keep prices documents on. Same
    * portability contract: DECIMAL evidence sums, one ln per term,
    * `round(·, 6)` at the edge. A `keepLabel` absent from the model
    * yields NULL margins (nothing to compare against) — and an all-NULL
    * margin column downstream keeps nothing, the conservative default.
    */
  def marginToward(docs: DataFrame, idCol: String, textCol: String,
                   model: DataFrame, keepLabel: String, addK: Double = 0.5,
                   maxLabels: Int = 256): DataFrame =
    scoreFrame(docs, idCol, textCol, model, addK, maxLabels)
      .groupBy("doc_id").agg(
        max(when(col("label") === keepLabel, col("__ns"))).as("n_scored"),
        round(max(when(col("label") === keepLabel, col("__score")))
          - max(when(col("label") =!= keepLabel, col("__score"))), 6)
          .as("margin_keep"))

  /** GPT-3-style PARETO-SAMPLED keep (Brown et al. 2020 §A: a document
    * is kept when `Pareto(α) > 1 − score`): unlike a hard margin
    * threshold, the heavy-tailed draw occasionally keeps low-score
    * documents — the published recipe's hedge against the classifier's
    * own bias. Deterministic and engine-portable: score is the two-class
    * logistic transform of the ROUNDED [[marginToward]] margin
    * (`s = 1/(1+exp(−m))`), the draw comes from the house md5 uniform
    * via the inverse CDF, and the comparison runs in the LOG domain —
    * `−ln(1−u)/α > ln(2−s)` — one ln per side on exact-in-double
    * arguments (no cross-engine `pow`), both sides rounded to 6 decimals
    * before the strict compare so a last-ulp wiggle cannot flip
    * membership. One corpus scoring pass + a codegen'd filter; α=9 is
    * the paper's value (higher α keeps closer to the hard threshold).
    */
  def filterByClassifierPareto(docs: DataFrame, idCol: String,
                               labelCol: String, textCol: String,
                               keepLabel: String, alpha: Double = 9.0,
                               seed: String = "pareto",
                               addK: Double = 0.5): DataFrame = {
    require(alpha > 0, s"filterByClassifierPareto: alpha must be > 0, got $alpha")
    // pinned for the same multi-subtree reason as filterByClassifier
    val model = trainNaiveBayes(docs, labelCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = marginToward(docs, idCol, textCol, model, keepLabel, addK)
    val u = conv(substring(md5(concat_ws(":", lit(seed),
        col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0
    val lhs = round(-log(lit(1.0) - u) / alpha, 6)
    val rhs = round(log(lit(2.0)
      - lit(1.0) / (lit(1.0) + exp(-col("margin_keep")))), 6)
    val picked = m.filter(lhs > rhs).select(col("doc_id").as(idCol))
    docs.join(picked, Seq(idCol), "left_semi")
  }

  /** Per-(doc, label) log-posterior frame — the shared scoring core. */
  private def scoreFrame(docs: DataFrame, idCol: String, textCol: String,
                         model: DataFrame, addK: Double,
                         maxLabels: Int): DataFrame = {
    require(addK > 0, s"classifyNaiveBayes: addK must be > 0, got $addK")
    val tokenRows = model.filter(col("token") =!= PriorKey)
    val priorRows = model.filter(col("token") === PriorKey)
    // Label list + totals are label-cardinality aggregates; |V| and the
    // total doc count are broadcast scalars (the repo-wide pattern).
    val labelTotals = tokenRows.groupBy("label").agg(sum("cnt").as("__ct"))
    val nLabels = labelTotals.count()
    require(nLabels <= maxLabels,
      s"classifyNaiveBayes: $nLabels labels exceeds maxLabels=$maxLabels — " +
        "NB labels are coarse classes (quality tier, language, source)")
    val vocab = tokenRows.agg(countDistinct(col("token")).as("__v"))
    val totalDocs = priorRows.agg(sum("cnt").as("__d"))
    // Per-doc distinct-token counts, restricted to the model vocabulary
    // BEFORE the label grid so OOV tokens never multiply by |labels|.
    val db = docs
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("__n"))
      .join(tokenRows.select("token").distinct(), Seq("token"), "left_semi")
    // (doc, token) × labels grid; the model join fills c(l,tok), absent →
    // the k floor.
    val labels = labelTotals.join(broadcast(vocab))
    val lp = ln((coalesce(col("cnt"), lit(0L)) + lit(addK)) /
      (col("__ct") + lit(addK) * col("__v")))
    val evidence = db.join(broadcast(labels))
      .join(tokenRows, Seq("label", "token"), "left")
      .groupBy("doc_id", "label").agg(
        sum(col("__n")).as("__ns"),
        sum((col("__n") * lp).cast(DecimalType(38, 18))).as("__s"))
    // Every doc scores every label (priors-only when no in-vocab tokens):
    // build the full (doc, label) frame from a broadcast label list, then
    // attach evidence where it exists.
    val allPairs = docs.select(col(idCol).as("doc_id"))
      .join(broadcast(priorRows.select(col("label"), col("cnt").as("__dl"))))
      .join(broadcast(totalDocs))
    allPairs
      .join(evidence, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label"),
        coalesce(col("__ns"), lit(0L)).as("__ns"),
        (coalesce(col("__s").cast("double"), lit(0.0)) +
          ln(col("__dl").cast("double") / col("__d").cast("double")))
          .as("__score"))
  }

  /** Train-on-self + filter composition — the quality-filter shape: train
    * on the corpus's own labels (or a labeled seed), keep documents the
    * classifier assigns to `keepLabel`. With `minMargin` set, keep only
    * documents the classifier assigns CONFIDENTLY — log-odds margin ≥ the
    * threshold — the tunable form the GPT-3-style quality filter needs
    * (threshold 0 keeps every argmax win; higher is stricter). The model
    * is pinned for the same reason as [[LanguageModel.perplexitySelf]]:
    * scoring reads it from several subtrees, and the pinned frame is
    * vocabulary-scale.
    */
  def filterByClassifier(docs: DataFrame, idCol: String, labelCol: String,
                         textCol: String, keepLabel: String,
                         addK: Double = 0.5,
                         minMargin: Double = Double.NegativeInfinity): DataFrame = {
    // The persist is NOT unpersisted here: scoring reads the model from
    // several subtrees of the ONE returned lazy plan, so releasing it
    // before the caller's action would force |subtrees| recomputes of the
    // train aggregate. The frame is vocabulary-scale (bounded, tiny vs the
    // corpus) and the bench harness clears the catalog cache between
    // queries — an accepted, documented residue (ADVICE r9).
    val model = trainNaiveBayes(docs, labelCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val preds =
      (if (minMargin == Double.NegativeInfinity)
        classifyNaiveBayes(docs, idCol, textCol, model, addK)
      else
        classifyNaiveBayesWithMargin(docs, idCol, textCol, model, addK)
          // NULL margin (single-label model) can't clear a real threshold
          .filter(col("margin") >= minMargin))
        .filter(col("pred_label") === keepLabel)
        .select(col("doc_id").as(idCol))
    docs.join(preds, Seq(idCol), "left_semi")
  }
}
