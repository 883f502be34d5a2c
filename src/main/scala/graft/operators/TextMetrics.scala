package graft.operators

import graft.expressions.TextHashExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generation-evaluation text metrics — ROUGE-N (Lin, 2004) and corpus
  * BLEU (Papineni et al., ACL 2002): the standard n-gram overlap scores
  * a data pipeline runs when grading synthetic/generated text against
  * references (or any candidate column against any reference column —
  * near-copy scoring, distillation QA, summarization eval).
  *
  * Both ride ONE shared kernel: [[TextHashExpressions.ngramOverlaps]],
  * a codegen'd native computing the clipped overlap `Σ_g min(cnt_cand,
  * cnt_ref)` for every n ≤ maxN in one pass per row over lowercased
  * whitespace tokens (the BM25/Dedup tokenization) — map-only,
  * shuffle-free, scan-projection-safe at 100 TB; the relational
  * explode-and-join form the oracle replays shuffles one row per
  * (pair, gram).
  *
  * Exactness: every per-pair metric is integer counts plus ONE IEEE
  * division + multiply + round at the 1e12 fixed-point scale (the
  * evaluateRanking contract). ROUGE F1 uses the closed form
  * `2m/(c+r)` — algebraically equal to `2PR/(P+R)` but a SINGLE
  * division, so no compounding of two rounded quotients. Corpus BLEU's
  * geometric mean and brevity penalty are genuinely transcendental
  * (ln/exp on data-dependent arguments); they follow the BM25 ln
  * contract — fixed evaluation order, rounded to 6 decimals at the
  * edge — while the p_n precisions stay fixed-point exact.
  */
object TextMetrics {

  /** Fixed-point metric scale (the shared [[FixedPoint.Scale]]). */
  val Scale: Long = FixedPoint.Scale

  /** ROUGE-N per pair: `(keys…, match_ngrams, cand_ngrams, ref_ngrams,
    * rouge_p_scaled, rouge_r_scaled, rouge_f1_scaled)`. Sides with no
    * complete n-gram yield NULL for the metrics whose denominator they
    * are (0/0 is undefined, not zero — the evaluateRanking convention);
    * the raw counts always surface so aggregation over pairs stays
    * possible without re-running the kernel.
    */
  def rougeN(pairs: DataFrame, keyCols: Seq[String], candCol: String,
             refCol: String, n: Int): DataFrame = {
    require(n >= 1, s"rougeN: n must be >= 1, got $n")
    val m = col("match_ngrams").cast("double")
    val c = col("cand_ngrams")
    val r = col("ref_ngrams")
    pairs
      .withColumn("__o",
        TextHashExpressions.ngramOverlaps(col(candCol), col(refCol), n, n))
      .select(keyCols.map(col) ++ Seq(
        element_at(col("__o"), 1).as("match_ngrams"),
        element_at(col("__o"), 2).as("cand_ngrams"),
        element_at(col("__o"), 3).as("ref_ngrams")): _*)
      .select(keyCols.map(col) ++ Seq(col("match_ngrams"),
        col("cand_ngrams"), col("ref_ngrams"),
        when(c > 0, round(lit(Scale.toDouble) * (m / c.cast("double")))
          .cast("long")).as("rouge_p_scaled"),
        when(r > 0, round(lit(Scale.toDouble) * (m / r.cast("double")))
          .cast("long")).as("rouge_r_scaled"),
        when(c + r > 0, round(lit(Scale.toDouble) *
          ((col("match_ngrams") * 2).cast("double") /
            (c + r).cast("double"))).cast("long")).as("rouge_f1_scaled")): _*)
  }

  /** Corpus-level BLEU-maxN: one row — `(n_pairs, cand_len, ref_len,
    * p1_scaled…pmaxN_scaled, bleu_r6)`. Modified n-gram precisions sum
    * clipped matches and candidate gram counts over the WHOLE corpus
    * before dividing (the corpus-BLEU definition — not a mean of
    * sentence BLEUs), fixed-point exact. `bleu_r6` composes the
    * brevity penalty `min(1, e^(1−ref_len/cand_len))` with the
    * geometric mean `e^(Σ ln p_n / maxN)` in a FIXED evaluation order,
    * rounded to 6 decimals (the BM25 ln contract); any p_n = 0 (or an
    * empty candidate side) makes it 0 — unsmoothed, documented.
    */
  def bleuCorpus(pairs: DataFrame, candCol: String, refCol: String,
                 maxN: Int = 4): DataFrame = {
    require(maxN >= 1, s"bleuCorpus: maxN must be >= 1, got $maxN")
    val staged = pairs.withColumn("__o",
      TextHashExpressions.ngramOverlaps(col(candCol), col(refCol), 1, maxN))
    val sums =
      count(lit(1)).cast("long").as("n_pairs") +:
        sum(element_at(col("__o"), 2)).as("cand_len") +:
        sum(element_at(col("__o"), 3)).as("ref_len") +:
        (1 to maxN).flatMap(n => Seq(
          sum(element_at(col("__o"), 3 * n - 2)).as(s"__match_$n"),
          sum(element_at(col("__o"), 3 * n - 1)).as(s"__cand_$n")))
    val agg = staged.agg(sums.head, sums.tail: _*)
    val pns = (1 to maxN).map(n =>
      when(col(s"__cand_$n") > 0, round(lit(Scale.toDouble) *
        (col(s"__match_$n").cast("double") / col(s"__cand_$n").cast("double")))
        .cast("long")).as(s"p${n}_scaled"))
    val allPos = (1 to maxN).map(n =>
      col(s"__match_$n") > 0 && col(s"__cand_$n") > 0).reduce(_ && _)
    val bp = when(col("cand_len") >= col("ref_len"), lit(1.0))
      .otherwise(exp(lit(1.0) -
        col("ref_len").cast("double") / col("cand_len").cast("double")))
    val logMean = (1 to maxN).map(n =>
      log(col(s"__match_$n").cast("double") /
        col(s"__cand_$n").cast("double"))).reduce(_ + _) / maxN
    agg.select(Seq(col("n_pairs"), col("cand_len"), col("ref_len")) ++
      pns :+
      when(col("cand_len") > 0 && allPos, round(bp * exp(logMean), 6))
        .otherwise(lit(0.0)).as("bleu_r6"): _*)
  }
}
