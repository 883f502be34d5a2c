package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained character-n-gram language identification — Cavnar & Trenkle
  * 1994 ("N-Gram-Based Text Categorization"), the rank-profile method
  * fasttext-era language ID descends from, upgrading the stopword-vote
  * heuristic [[TextAnalysis.langId]] to a model TRAINED on labeled text
  * (the reference engine has no language-ID surface; SURVEY §2 extension
  * family).
  *
  * Method: a language's PROFILE is its `topK` most frequent character
  * n-grams (n = 1..3 over lowercased text with whitespace runs collapsed
  * to `_`), ranked by frequency; a document is scored against each
  * profile by the OUT-OF-PLACE distance — Σ over the document's own
  * top-`topK` grams of |doc rank − profile rank|, with grams absent from
  * the profile costing the maximum `topK` — and labeled with the nearest
  * profile.
  *
  * Scale shape, the [[Classifier]] contract: the model IS a table —
  * (label, gram, rank), ≤ labels × topK rows, broadcast everywhere it
  * joins — so training is one map-side gram explode plus one keyed
  * aggregate and one label-partitioned window; scoring is a doc-keyed
  * profile window (topK rows per doc) joined against the broadcast
  * model, never corpus × vocabulary. Oracle parity is total: ranks are
  * `row_number` with a deterministic (count desc, gram asc) order,
  * distances are exact integer sums, ties in the final argmin break
  * label-ascending — no floats anywhere.
  */
object LangIdNgram {

  private val MaxN = 3

  /** Lowercase, trim, collapse whitespace runs to `_` — the classic
    * word-boundary marker, so "the cat" contributes `e_c` and the
    * boundary grams carry signal.
    */
  private def canon(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", "_")

  /** All character n-grams for n = 1..[[MaxN]] of an ALREADY-CANONICAL
    * text column — one native static call per row
    * ([[graft.expressions.TextHashExpressions.charNgrams]]). Two
    * measured traps live here: the higher-order
    * `transform(sequence, substr)` form evaluates its lambda interpreted
    * per element (~9 s per corpus pass at sf0.1 vs sub-second native),
    * and passing the [[canon]] EXPRESSION instead of a projected column
    * re-runs the regexp per element (no CSE across a lambda boundary) —
    * callers project `canon` into a plain column first.
    */
  private def allGrams(txt: Column): Column =
    graft.expressions.TextHashExpressions.charNgrams(txt, MaxN)

  /** The HOF form [[allGrams]] replaced — retained as the executable
    * specification the native is spec-pinned against (the
    * `tokenCountWsFold` convention).
    */
  private[graft] def allGramsFold(txt: Column): Column = {
    val perN = (1 to MaxN).map { n =>
      when(length(txt) >= n,
        transform(sequence(lit(1), length(txt) - (n - 1)),
          i => txt.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
    }
    concat(perN: _*)
  }

  /** Train per-language rank profiles: (label, gram, rank) with rank
    * 1..`topK` by descending frequency (gram-ascending tiebreak). NULL
    * labels are rejected per-row (the [[Classifier.trainNaiveBayes]]
    * convention — a silent NULL class would desync the oracle's NULLS
    * ordering).
    */
  def trainProfiles(docs: DataFrame, labelCol: String, textCol: String,
                    topK: Int = 64): DataFrame = {
    require(topK > 0, s"trainProfiles: topK must be > 0, got $topK")
    val labelExpr = col(labelCol).cast("string")
    val checked = when(labelExpr.isNull, raise_error(lit(
      s"trainProfiles: NULL label in '$labelCol' — coalesce labels to a " +
        "sentinel class first"))).otherwise(labelExpr)
    val counts = docs
      .select(checked.as("label"), canon(col(textCol)).as("__t"))
      .select(col("label"), explode(allGrams(col("__t"))).as("gram"))
      .groupBy("label", "gram").agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy("label")
      .orderBy(col("__cnt").desc, col("gram").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("label"), col("gram"), col("rank").cast("int").as("rank"))
  }

  /** Classify every document against trained profiles: the document's own
    * top-`topK` gram ranking (same ordering contract as training) is
    * compared to each language profile by out-of-place distance; nearest
    * profile wins, ties label-ascending. Returns one row per input doc:
    * (doc_id, pred_label, oop_dist) — documents producing no grams
    * (empty/whitespace text) carry the sentinel `und` and a NULL
    * distance, there being no evidence to rank.
    *
    * `topK` must match the profile's own depth for the distance semantics
    * to be symmetric — it defaults to the model's observed max rank so a
    * round-tripped model can't drift from its training parameter.
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               model: DataFrame, maxLabels: Int = 256): DataFrame = {
    // The model is per-language METADATA (≤ maxLabels × topK rows), so
    // it collects ONCE and rides into codegen as a memoized literal
    // ([[graft.expressions.LangIdOps]]) — scoring is a single map pass:
    // no grid join, no model join, no doc-keyed aggregate, no argmin
    // window (r11; the relational four-stage chain is retained below as
    // [[classifyRelational]], the executable specification this form is
    // spec-pinned against, and the DuckDB oracle replays it unchanged).
    // The collect is LIMIT-bounded (code-review r11): a
    // per-document-scale frame passed as `model` trips the
    // not-a-rank-profile require at ~maxLabels × 4096 rows instead of
    // OOMing the driver, and one bounded action replaces the former
    // guard-count + count + collect triple — which also means a lazily
    // built model's training plan executes exactly ONCE, no pin needed.
    val maxModelRows = maxLabels * 4096
    val rows = model
      .select(col("label").cast("string"), col("gram").cast("string"),
        col("rank").cast("int"))
      .limit(maxModelRows + 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    require(rows.length <= maxModelRows,
      s"classify: more than $maxModelRows model rows is not a " +
        "rank-profile model (expected labels x topK metadata rows)")
    require(rows.nonEmpty,
      "classify: empty model (no profile rows) — train profiles on a " +
        "non-empty labeled corpus first")
    val nLabels = rows.map(_._1).distinct.length
    require(nLabels <= maxLabels,
      s"classify: $nLabels labels exceeds maxLabels=$maxLabels — language " +
        "profiles are per-language metadata, not per-document state")
    // the native's TreeMap label ordering is Java-String ascending; it
    // matches Spark's UTF-8-binary label-asc tie rule only when labels
    // avoid supplementary-plane characters — language codes always do,
    // and anything else fails loudly rather than silently re-tying
    require(rows.forall(r => r._1.codePointCount(0, r._1.length) == r._1.length),
      "classify: supplementary-plane characters in labels would desync " +
        "the tie order — use plain language codes")
    val out = graft.expressions.TextHashExpressions.langIdClassify(
      canon(col(textCol)), rows.toSeq, MaxN)
    docs.select(col(idCol).as("doc_id"), out.as("__r"))
      .select(col("doc_id"),
        coalesce(col("__r.pred_label"), lit("und")).as("pred_label"),
        col("__r.oop_dist").cast("long").as("oop_dist"))
  }

  /** The relational four-stage form [[classify]] replaced — retained as
    * the executable specification (native parity is spec-pinned; the
    * DuckDB oracle replays THIS shape): per-doc top-k profile, doc × label
    * grid with broadcast model join, doc-keyed distance aggregate, argmin
    * window with label-asc ties.
    */
  private[graft] def classifyRelational(docs: DataFrame, idCol: String,
                                        textCol: String, model: DataFrame,
                                        maxLabels: Int = 256): DataFrame = {
    if (model.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      model.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labels = model.select("label").distinct()
    val nLabels = labels.count()
    require(nLabels <= maxLabels,
      s"classify: $nLabels labels exceeds maxLabels=$maxLabels")
    val kRow = model.agg(max(col("rank")).cast("long").as("__k")).head()
    require(!kRow.isNullAt(0),
      "classify: empty model (no profile rows) — train profiles on a " +
        "non-empty labeled corpus first")
    val kVal = kRow.getLong(0)
    val profile = docs
      .select(col(idCol).as("doc_id"), canon(col(textCol)).as("__t"))
      .select(col("doc_id"), posexplode(
        graft.expressions.TextHashExpressions.charNgramTopK(
          col("__t"), MaxN, kVal.toInt)))
      .select(col("doc_id"), col("col").as("gram"),
        (col("pos") + 1).cast("long").as("__dr"))
    val dist = profile.join(broadcast(labels))
      .join(broadcast(model), Seq("label", "gram"), "left")
      .groupBy("doc_id", "label").agg(
        sum(coalesce(abs(col("__dr") - col("rank")), lit(kVal)))
          .as("__dist"))
    val wBest = Window.partitionBy("doc_id")
      .orderBy(col("__dist").asc, col("label").asc)
    val best = dist.withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("label"), col("__dist"))
    docs.select(col(idCol).as("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), lit("und")).as("pred_label"),
        col("__dist").cast("long").as("oop_dist"))
  }

  /** Train-on-seed → keep-predicted composition — the language filter
    * every multilingual crawl pipeline runs (keep `en`, or a set): train
    * profiles on the labeled seed, keep docs whose nearest profile is in
    * `keepLangs`. The `und` sentinel (no grams) is kept only when
    * explicitly listed. [[classify]] consumes the lazily-built model in
    * one bounded collect — training executes exactly once, no pin.
    */
  def filterByLanguage(docs: DataFrame, idCol: String, textCol: String,
                       seed: DataFrame, seedLabelCol: String,
                       seedTextCol: String, keepLangs: Set[String],
                       topK: Int = 64): DataFrame = {
    require(keepLangs.nonEmpty, "filterByLanguage: keepLangs must be non-empty")
    // no caller pin needed: classify consumes the model in one bounded
    // collect, so training executes exactly once
    val model = trainProfiles(seed, seedLabelCol, seedTextCol, topK)
    val picked = classify(docs, idCol, textCol, model)
      .filter(col("pred_label").isInCollection(keepLangs))
      .select(col("doc_id").as(idCol))
    docs.join(picked, Seq(idCol), "left_semi")
  }
}
