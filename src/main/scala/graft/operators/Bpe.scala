package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and token counting — the
  * subword-vocabulary stage of a training-data pipeline (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units";
  * the merge-table artifact every BPE tokenizer ships). The reference
  * engine has no tokenizer surface (SURVEY §2 extension family).
  *
  * Scale shape — the published trainers' own split, made explicit: BPE
  * training operates on the WORD-FREQUENCY table, not the corpus. The
  * corpus is touched exactly ONCE (a map-side word explode + one keyed
  * hash aggregate → (word, cnt), vocabulary-scale); the merge loop then
  * runs driver-side over that bounded table (guarded by `maxVocab` — the
  * [[Dedup]] union-find precedent: a documented metadata-scale pull, ~tens
  * of MB at a 1M-word cap, NOT corpus-scale), because pair statistics
  * update incrementally per merge and a per-iteration Spark job would pay
  * vocabulary-independent scheduling cost numMerges times. Encoding
  * distributes back out: the merge ranks broadcast into a codegen'd
  * per-word expression, applied map-side — no shuffle, no driver.
  *
  * Determinism: pair argmax ties break (count desc, left asc, right asc);
  * within a word, merges apply leftmost-first; words carry a terminal
  * `</w>` symbol (the Sennrich convention) so "low" and "lower" share
  * prefix pairs but not the word-final unit.
  */
object Bpe {

  /** Word-end marker symbol. Multi-char, so it can never collide with a
    * single-character base symbol.
    */
  val EndOfWord = "</w>"

  /** Trained merge list in rank order, plus the number of times each
    * merge applied to the training word table (weighted by word counts) —
    * `appliedCount` is what the self-consistency gate sums.
    */
  final case class Merge(rank: Int, left: String, right: String,
                        appliedCount: Long)

  /** Lowercased whitespace words — the [[LanguageModel]] tokenization, so
    * LM and tokenizer vocabularies agree.
    */
  private def words(text: Column) = TextAnalysis.words(lower(text))

  /** One corpus pass: (word, cnt). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Split a word into its initial symbol sequence: characters plus the
    * terminal [[EndOfWord]].
    */
  private[graft] def baseSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  /** Apply one merge (left, right) greedily left-to-right to a symbol
    * sequence; returns (merged sequence, number of merges applied).
    */
  private[graft] def applyMerge(symbols: Vector[String], left: String,
                                    right: String): (Vector[String], Int) = {
    val out = Vector.newBuilder[String]
    var applied = 0
    var i = 0
    while (i < symbols.length) {
      if (i + 1 < symbols.length && symbols(i) == left && symbols(i + 1) == right) {
        out += left + right
        applied += 1
        i += 2
      } else {
        out += symbols(i)
        i += 1
      }
    }
    (out.result(), applied)
  }

  /** Train `numMerges` BPE merges over the corpus. Driver-side loop over
    * the collected word-frequency table (bounded by `maxVocab`); merges
    * with fewer than `minPairCount` weighted occurrences stop training
    * early (nothing left worth merging).
    */
  def trainBpe(docs: DataFrame, textCol: String, numMerges: Int,
               minPairCount: Long = 2L,
               maxVocab: Int = 1000000): Seq[Merge] = {
    require(numMerges > 0, s"trainBpe: numMerges must be > 0, got $numMerges")
    require(minPairCount >= 1, s"trainBpe: minPairCount must be >= 1")
    val wc = wordCounts(docs, textCol)
    val n = wc.count()
    require(n <= maxVocab,
      s"trainBpe: $n distinct words exceeds maxVocab=$maxVocab — the " +
        "driver-side merge loop is bounded; cap the corpus vocabulary " +
        "(length-filter garbage tokens) or raise maxVocab deliberately")
    var table: Array[(Vector[String], Long)] = wc.collect()
      .map(r => (baseSymbols(r.getString(0)), r.getLong(1)))
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var continue = true
    while (rank < numMerges && continue) {
      // pair -> weighted count over the whole word table
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      table.foreach { case (syms, cnt) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        // total order: count desc, then (left, right) asc — deterministic
        // across runs and hash-map iteration orders
        val ((left, right), best) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        if (best < minPairCount) continue = false
        else {
          var applied = 0L
          table = table.map { case (syms, cnt) =>
            val (merged, k) = applyMerge(syms, left, right)
            applied += k * cnt
            (merged, cnt)
          }
          merges += Merge(rank, left, right, applied)
          rank += 1
        }
      }
    }
    merges.result()
  }

  /** The merge table as a DataFrame (rank, left, right, applied_count) —
    * the persistable tokenizer artifact (parquet round-trip; a model
    * trained on corpus A tokenizes corpus B).
    */
  def mergesTable(spark: org.apache.spark.sql.SparkSession,
                  merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.appliedCount))
      .toDF("rank", "left", "right", "applied_count")
  }

  /** Load a merge table written by [[mergesTable]]`.write.parquet`. */
  def readMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[Merge] =
    spark.read.parquet(path).select("rank", "left", "right", "applied_count")
      .orderBy("rank").collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  /** Per-document BPE token count under a trained merge list: words split
    * map-side, each word encoded by the codegen'd native expression
    * (apply merges in rank order, leftmost-first — the exact trainer
    * semantics, so encoding the training corpus reproduces its final
    * tokenization), counts summed per document. No shuffle, no driver:
    * the merge ranks ride into codegen as one broadcast reference object.
    */
  def bpeTokenCount(text: Column, merges: Seq[Merge]): Column =
    graft.expressions.TextHashExpressions.bpeTokenCount(
      text, merges.map(m => Array(m.left, m.right)).toArray)

  /** Initial (pre-merge) symbol count of a document: Σ_words (chars + 1
    * end marker) — the left side of the self-consistency invariant
    * `Σ bpe_tokens = Σ initial_tokens − Σ applied_count`.
    */
  def initialTokenCount(text: Column): Column =
    aggregate(transform(words(text), w => length(w) + lit(1)),
      lit(0L), (acc, v) => acc + v)
}
