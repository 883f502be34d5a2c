package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece) subword tokenizer — Kudo 2018, "Subword
  * Regularization" §3: the OTHER production tokenizer family next to
  * [[Bpe]], trained top-down (seed a large candidate vocabulary, EM-fit
  * piece probabilities, prune to the target size) where BPE builds
  * bottom-up. The reference engine has no tokenizer surface (SURVEY §2
  * extension family).
  *
  * Scale shape — the [[Bpe]] contract: everything corpus-scale is ONE
  * Spark pass. Training operates on the word-frequency table (corpus
  * touched once: map-side word explode + keyed aggregate), and the seed
  * CANDIDATE table is also built distributed — substring explode over the
  * word table weighted by word counts, top-`seedSize` by (count desc,
  * piece asc) plus every single character (segmentability guarantee) —
  * before the bounded driver EM loop (`maxVocab`-guarded collect, the BPE
  * precedent). Encoding distributes back out as a codegen'd per-word
  * native ([[graft.expressions.UnigramOps]]) with the model riding along
  * as one memoized spec literal — no shuffle, no driver.
  *
  * Fidelity note, stated precisely because it is a simplification of the
  * paper: the E-step is HARD EM (Viterbi-best segmentation, the same
  * algorithm the encoder runs — trainer and encoder share the literal
  * method, so they cannot diverge), not the forward–backward expectation;
  * and pruning drops the lowest-WEIGHTED-COUNT pieces per round (the
  * frequency approximation of Kudo's likelihood-loss ranking). Both are
  * the standard cheap variants; determinism is total — integer counts,
  * (count desc, piece asc) orderings everywhere, and the only floats are
  * per-piece `ln(cnt/total)` values that serialize as raw IEEE bits into
  * the encode spec.
  */
object Unigram {

  /** One trained piece: id in score order, the piece string, its final
    * weighted count, and `ln(cnt/total)`.
    */
  final case class Piece(id: Int, piece: String, cnt: Long, logProb: Double)

  final case class UnigramVocab(pieces: Vector[Piece]) {
    def vocabSize: Int = pieces.length
    private[graft] def pieceArr: Array[String] = pieces.map(_.piece).toArray
    private[graft] def lpArr: Array[Double] = pieces.map(_.logProb).toArray
  }

  private def words(text: Column) = TextAnalysis.words(lower(text))

  /** Distributed seed-candidate table: (piece, cnt, rank) — every
    * substring of length 1..`maxPieceLen` of every distinct corpus word,
    * weighted by word frequency; rank by (cnt desc, piece asc); kept when
    * `rank <= seedSize` OR the piece is a single character (so every
    * training word stays segmentable). Fully oracle-replayable (exact
    * integer counts, total rank order). The rank is a range-partitioned
    * two-pass mint over the candidate-substring table — VOCABULARY-scale
    * (distinct substrings of distinct words), the same metadata bound as
    * the BPE driver loop, not corpus-scale — with no single-partition
    * window stage.
    */
  def seedCandidates(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
                     seedSize: Int = 512): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"seedCandidates: maxPieceLen must be in [1,16], got $maxPieceLen")
    require(seedSize >= 1, s"seedCandidates: seedSize must be >= 1")
    val wc = docs.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("__wcnt"))
    val perLen = (1 to maxPieceLen).map { len =>
      when(length(col("word")) >= len,
        transform(sequence(lit(1), length(col("word")) - (len - 1)),
          i => col("word").substr(i, lit(len))))
        .otherwise(array().cast("array<string>"))
    }
    val subs = wc.select(col("__wcnt"),
        explode(concat(perLen: _*)).as("piece"))
      .groupBy("piece").agg(sum("__wcnt").as("cnt"))
    // Two-pass partition-offset mint — bit-identical to row_number()
    // over a global window but with no single-partition stage; the
    // candidate-substring frame is vocabulary-scale, yet at web scale
    // that can still be large enough to care (VERDICT r13 §next-4).
    graft.functions.RowHash.orderedDenseId(subs,
        Seq(col("cnt").desc, col("piece").asc), "rank")
      .filter(col("rank") <= seedSize || length(col("piece")) === 1)
      .select(col("piece"), col("cnt").cast("long").as("cnt"),
        col("rank").cast("int").as("rank"))
  }

  /** Train a unigram vocabulary of at most `targetVocab` pieces.
    *
    * Driver loop bounds: the word table collect is `maxVocab`-guarded
    * (the [[Bpe.trainBpeModel]] contract); the seed collect is bounded by
    * `seedSize + |alphabet|`. Each EM iteration is one Viterbi pass over
    * the word table — O(words × len × maxPieceLen); pruning removes up to
    * `pruneFrac` of the excess multi-char pieces per round, so the loop
    * terminates in O(log vocab) rounds. Single-character pieces are never
    * pruned and their counts floor at 1 (segmentability invariant).
    */
  def trainUnigramModel(docs: DataFrame, textCol: String, targetVocab: Int,
                        maxPieceLen: Int = 4, seedSize: Int = 512,
                        emIters: Int = 2, pruneFrac: Double = 0.25,
                        maxVocab: Int = 1000000): UnigramVocab = {
    require(targetVocab >= 1, s"trainUnigramModel: targetVocab must be >= 1")
    require(emIters >= 1, s"trainUnigramModel: emIters must be >= 1")
    require(pruneFrac > 0 && pruneFrac <= 1,
      s"trainUnigramModel: pruneFrac must be in (0,1], got $pruneFrac")
    val wc = docs.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val nWords = wc.count()
    require(nWords <= maxVocab,
      s"trainUnigramModel: $nWords distinct words exceeds maxVocab=" +
        s"$maxVocab — cap the corpus vocabulary or raise maxVocab " +
        "deliberately (the Bpe.trainBpeModel contract)")
    val wordRows = wc.collect()
    val wordArr: Array[String] = wordRows.map(_.getString(0))
    val wCnt: Array[Long] = wordRows.map(_.getLong(1))
    val seedRows = seedCandidates(docs, textCol, maxPieceLen, seedSize)
      .select("piece", "cnt").collect()
    // counts: LinkedHashMap not needed — every ordering below is explicit
    var counts = scala.collection.mutable.HashMap.empty[String, Long]
    seedRows.foreach(r => counts.update(r.getString(0), r.getLong(1)))

    def mkModel(): (Array[String], Array[Double],
        graft.expressions.UnigramOps.Model) = {
      val ordered = counts.toArray.sortBy { case (p, c) => (-c, p) }
      val pieces = ordered.map(_._1)
      val total = ordered.map(_._2).sum.toDouble
      val lps = ordered.map { case (_, c) => math.log(c.toDouble / total) }
      (pieces, lps, new graft.expressions.UnigramOps.Model(pieces, lps))
    }

    def emIteration(): Unit = {
      val (pieces, _, model) = mkModel()
      val newCounts = scala.collection.mutable.HashMap.empty[String, Long]
      val sink = Array.newBuilder[Int]
      var w = 0
      while (w < wordArr.length) {
        sink.clear()
        graft.expressions.UnigramOps.segmentWord(wordArr(w), model, sink)
        sink.result().foreach { id =>
          // id == -1 cannot happen on the training corpus (all single
          // chars are vocab pieces); guarded anyway for safety
          if (id >= 0) {
            val p = pieces(id)
            newCounts.update(p, newCounts.getOrElse(p, 0L) + wCnt(w))
          }
        }
        w += 1
      }
      // single CODE-POINT chars floor at 1 (never dropped; the seed's
      // segmentability alphabet is code-point substrings, so an astral
      // character is one "char" here despite its UTF-16 length of 2);
      // unused multi-char pieces drop out
      counts.keysIterator
        .filter(p => p.codePointCount(0, p.length) == 1).foreach { p =>
          if (!newCounts.contains(p)) newCounts.update(p, 1L)
        }
      counts = newCounts
    }

    (1 to emIters).foreach(_ => emIteration())
    // prune loop: remove lowest-count multi-char pieces until the target
    while (counts.size > targetVocab) {
      val multi = counts.iterator
        .filter(p => p._1.codePointCount(0, p._1.length) > 1).toArray
      if (multi.isEmpty)
        // nothing prunable left: the alphabet alone exceeds the target —
        // fail loudly rather than loop forever or emit an unsegmentable
        // vocabulary (an unconditional throw, stated directly:
        // code-review r10 flagged the vacuous-require form)
        throw new IllegalArgumentException(
          s"trainUnigramModel: alphabet size ${counts.size} exceeds " +
            s"targetVocab=$targetVocab — raise targetVocab above the " +
            "corpus alphabet")
      val excess = counts.size - targetVocab
      val k = math.max(1, math.min(excess,
        math.ceil(pruneFrac * multi.length).toInt))
      // lowest count first, ties piece-DESC so the lexicographically
      // smaller (more reusable) piece survives longer
      multi.sortBy { case (p, c) => (c, p) }(
        Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
        .take(k).foreach { case (p, _) => counts.remove(p) }
      emIteration()
    }
    val (pieces, lps, _) = mkModel()
    UnigramVocab(pieces.zipWithIndex.map { case (p, i) =>
      Piece(i, p, counts(p), lps(i))
    }.toVector)
  }

  /** Piece-id sequence (`array<int>`) of `text` under a trained vocab —
    * the codegen'd native; ids index [[UnigramVocab.pieces]]; characters
    * outside the vocabulary emit −1 (the BPE unknown sentinel).
    */
  def unigramEncodeIds(text: Column, vocab: UnigramVocab): Column =
    graft.expressions.UnigramExpressions.unigramEncodeIds(
      text, vocab.pieceArr, vocab.lpArr)

  /** Decode a [[unigramEncodeIds]] sequence back to text by appending
    * each id's piece. The id stream carries no word-boundary marker
    * (unlike BPE's `</w>` / WordPiece's continuation flags), so the
    * roundtrip identity is against the lowercased words joined WITHOUT
    * spaces: `unigramDecodeIds(unigramEncodeIds(t, v), v) ===
    * concat(words(lower(t)))` whenever no id is unknown — always true
    * on the training corpus; the oracled roundtrip identity
    * (`q_text_decode_roundtrip`). Unknown ids (−1) decode to U+FFFD.
    */
  def unigramDecodeIds(ids: Column, vocab: UnigramVocab): Column =
    graft.expressions.UnigramExpressions.unigramDecodeIds(
      ids, vocab.pieceArr, vocab.lpArr)

  /** Piece count of `text` — `size(unigramEncodeIds)` without the array. */
  def unigramTokenCount(text: Column, vocab: UnigramVocab): Column =
    graft.expressions.UnigramExpressions.unigramTokenCount(
      text, vocab.pieceArr, vocab.lpArr)

  /** The persistable tokenizer artifact: (id, piece, cnt, log_prob).
    * Parquet round-trips doubles bit-exactly, so a reloaded model encodes
    * identically.
    */
  def vocabTable(spark: org.apache.spark.sql.SparkSession,
                 vocab: UnigramVocab): DataFrame = {
    import spark.implicits._
    vocab.pieces.map(p => (p.id, p.piece, p.cnt, p.logProb))
      .toDF("id", "piece", "cnt", "log_prob")
  }

  /** Load a vocab written by [[vocabTable]]`.write.parquet`. */
  def readVocab(spark: org.apache.spark.sql.SparkSession,
                path: String): UnigramVocab =
    // driver-side id sort: a cluster orderBy before a tiny collect pays a
    // range-partitioning sample pass + shuffle per model load (Bpe.readMerges)
    UnigramVocab(spark.read.parquet(path)
      .select("id", "piece", "cnt", "log_prob").collect()
      .map(r => Piece(r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).sortBy(_.id).toVector)
}
