package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer) —
  * the third tokenizer family next to bottom-up [[Bpe]] and top-down
  * [[Unigram]], with the two published differences made explicit:
  *
  *  - TRAINING merges like BPE but ranks candidate pairs by the
  *    LIKELIHOOD score `cnt(pair) / (cnt(left) · cnt(right))` instead of
  *    raw pair frequency (the documented WordPiece objective: merge the
  *    pair whose union most improves a unigram LM over the corpus) —
  *    compared as exact cross-multiplied integers, no float ties;
  *  - ENCODING never replays merges: the model is just the final piece
  *    set, segmented greedy longest-match-first, word-initial and
  *    continuation ("##") forms distinct, and a word with ANY
  *    unmatchable position becomes ONE unknown token (id −1) — BERT
  *    semantics, never a partial segmentation.
  *
  * Scale split is the [[Bpe]] contract: the corpus is touched exactly
  * once (word-frequency table via one keyed agg), the merge loop runs
  * driver-side over that vocabulary-scale table (`maxWordTableRows`-
  * guarded), and encoding distributes back out as one codegen'd static
  * call per row ([[graft.expressions.WordPieceOps]]) with the piece set
  * riding along as a memoized literal. The vocabulary round-trips
  * parquet ([[vocabTable]]/[[readVocab]]: train on A, tokenize B).
  *
  * Reference: the reference engine has no tokenizer surface (SURVEY §2
  * north-star extension family); semantics follow the published
  * WordPiece literature and the BERT tokenizer's documented behavior.
  */
object WordPiece {

  /** One vocabulary entry: `piece` is the RAW text (no "##" marker —
    * continuation-ness is the `isCont` flag, so a corpus token that
    * itself starts with "##" can never collide with a continuation
    * form); `display` renders the conventional BERT form.
    */
  case class WpPiece(id: Int, piece: String, isCont: Boolean) {
    def display: String = if (isCont) "##" + piece else piece
  }

  case class WpVocab(pieces: Vector[WpPiece]) {
    def vocabSize: Int = pieces.length
    private[graft] def pieceArr: Array[String] = pieces.map(_.piece).toArray
    private[graft] def contArr: Array[Boolean] = pieces.map(_.isCont).toArray
    /** Piece span in code points, by id — the conservation gate's unit. */
    def spans: Vector[Long] =
      pieces.map(p => p.piece.codePointCount(0, p.piece.length).toLong)
  }

  private case class Sym(text: String, isCont: Boolean)

  /** Train a WordPiece vocabulary: alphabet pieces (every observed
    * word-initial character as an initial form, every observed interior
    * character as a continuation form — which makes the training corpus
    * fully segmentable, so it can never produce an unknown id), then
    * `numMerges` likelihood-ranked merges. Ties break on the merged
    * pair's display forms ascending (total, engine-independent order);
    * the loop stops early when no pair reaches `minPairCount`.
    */
  def trainWordPiece(docs: DataFrame, textCol: String, numMerges: Int,
                     minPairCount: Long = 2,
                     maxWordTableRows: Int = 1000000): WpVocab = {
    require(numMerges >= 0,
      s"trainWordPiece: numMerges must be >= 0, got $numMerges")
    val wcRows = Bpe.wordCounts(docs, textCol)
      .limit(maxWordTableRows + 1).collect()
    require(wcRows.length <= maxWordTableRows,
      s"trainWordPiece: word table exceeds maxWordTableRows=" +
        s"$maxWordTableRows — the merge loop is driver-side over the " +
        "vocabulary-scale table (the Bpe maxVocab contract)")
    // deterministic iteration order (collect order is partition-dependent)
    val words: Array[(Array[Sym], Long)] = wcRows
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
      .map { case (w, cnt) =>
        val cps = new scala.collection.mutable.ArrayBuffer[String]()
        var u = 0
        while (u < w.length) {
          val c = Character.charCount(w.codePointAt(u))
          cps += w.substring(u, u + c)
          u += c
        }
        (cps.zipWithIndex.map { case (c, i) => Sym(c, i > 0) }.toArray, cnt)
      }
    // alphabet: observed forms, initial first then continuation, text asc
    val alphabet = words.flatMap(_._1).distinct
      .sortBy(s => (s.isCont, s.text)).toVector
    val minted = scala.collection.mutable.LinkedHashSet[Sym](alphabet: _*)
    var seqs = words
    var merges = 0
    var exhausted = false
    while (merges < numMerges && !exhausted) {
      // symbol + leftmost-non-overlapping pair counts in one pass
      val symCnt = scala.collection.mutable.HashMap[Sym, Long]()
      val pairCnt = scala.collection.mutable.HashMap[(Sym, Sym), Long]()
      seqs.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length) {
          symCnt.updateWith(syms(i))(v => Some(v.getOrElse(0L) + cnt))
          i += 1
        }
        // every adjacency counts (the HF trainer's statistics); overlap
        // resolution belongs to the leftmost-greedy APPLY step below
        i = 0
        while (i < syms.length - 1) {
          pairCnt.updateWith((syms(i), syms(i + 1)))(v =>
            Some(v.getOrElse(0L) + cnt))
          i += 1
        }
      }
      val candidates = pairCnt.iterator
        .filter { case (_, c) => c >= minPairCount }.toArray
      if (candidates.isEmpty) exhausted = true
      else {
        // argmax of cnt(pair)/(cnt(l)·cnt(r)) via exact cross
        // multiplication in BigInt; ties on display forms ascending
        var best = candidates(0)
        var bestScoreNum = BigInt(best._2)
        var bestScoreDen = BigInt(symCnt(best._1._1)) * BigInt(symCnt(best._1._2))
        def disp(p: (Sym, Sym)): (String, String) =
          (if (p._1.isCont) "##" + p._1.text else p._1.text,
            if (p._2.isCont) "##" + p._2.text else p._2.text)
        var i = 1
        while (i < candidates.length) {
          val c = candidates(i)
          val num = BigInt(c._2)
          val den = BigInt(symCnt(c._1._1)) * BigInt(symCnt(c._1._2))
          val cmp = (num * bestScoreDen).compare(bestScoreNum * den)
          val take = cmp > 0 || (cmp == 0 &&
            Ordering[(String, String)].lt(disp(c._1), disp(best._1)))
          if (take) { best = c; bestScoreNum = num; bestScoreDen = den }
          i += 1
        }
        val (l, r) = best._1
        val merged = Sym(l.text + r.text, l.isCont)
        minted += merged
        // apply leftmost-first non-overlapping to every word
        seqs = seqs.map { case (syms, cnt) =>
          val out = new scala.collection.mutable.ArrayBuffer[Sym](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, cnt)
        }
        merges += 1
      }
    }
    WpVocab(minted.iterator.zipWithIndex
      .map { case (s, i) => WpPiece(i, s.text, s.isCont) }.toVector)
  }

  /** Per-document WordPiece id sequence (`array<int>`) — codegen'd
    * greedy longest-match native; unknown words emit one −1.
    */
  def wordPieceEncodeIds(text: Column, vocab: WpVocab): Column =
    graft.expressions.WordPieceExpressions.wordPieceEncodeIds(
      text, vocab.pieceArr, vocab.contArr)

  /** Decode a [[wordPieceEncodeIds]] sequence back to text: the
    * continuation flags ARE word boundaries (a word-initial piece opens
    * a new space-separated word, a continuation piece appends), so
    * `wordPieceDecodeIds(wordPieceEncodeIds(t, v), v) ===
    * concat_ws(" ", words(lower(t)))` exactly whenever no word UNK'd —
    * always true on the training corpus (its alphabet is fully
    * segmentable by construction); the oracled roundtrip identity
    * (`q_text_decode_roundtrip`). An unknown id (−1, the whole-word
    * sentinel) decodes to the literal `[UNK]` word.
    */
  def wordPieceDecodeIds(ids: Column, vocab: WpVocab): Column =
    graft.expressions.WordPieceExpressions.wordPieceDecodeIds(
      ids, vocab.pieceArr, vocab.contArr)

  /** Per-document WordPiece token count (`long`). */
  def wordPieceTokenCount(text: Column, vocab: WpVocab): Column =
    graft.expressions.WordPieceExpressions.wordPieceTokenCount(
      text, vocab.pieceArr, vocab.contArr)

  /** The persistable tokenizer artifact: (id, piece, is_cont) — raw
    * piece text plus the form flag (unambiguous even for '#'-bearing
    * corpora, unlike serializing the "##" display form).
    */
  def vocabTable(spark: org.apache.spark.sql.SparkSession,
                 vocab: WpVocab): DataFrame = {
    import spark.implicits._
    vocab.pieces.map(p => (p.id, p.piece, p.isCont))
      .toDF("id", "piece", "is_cont")
  }

  /** Load a vocab written by [[vocabTable]]`.write.parquet`. */
  def readVocab(spark: org.apache.spark.sql.SparkSession,
                path: String): WpVocab =
    // driver-side id sort: a cluster orderBy before a tiny collect pays a
    // range-partitioning sample pass + shuffle per model load (Bpe.readMerges)
    WpVocab(spark.read.parquet(path)
      .select("id", "piece", "is_cont").collect()
      .map(r => WpPiece(r.getInt(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_.id).toVector)
}
