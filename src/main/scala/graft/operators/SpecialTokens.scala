package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Special-token framing and truncation for tokenizer id sequences —
  * the last step between "ids" and "trainer input": every production
  * tokenizer reserves control ids (BOS/EOS/PAD) and bounds sequences to
  * a model's context length. The reference engine has no tokenizer
  * surface (SURVEY §2 extension family); the id scheme follows the
  * universal convention (GPT-2's `<|endoftext|>` = vocab_size,
  * SentencePiece's `--control_symbols`): special ids sit ABOVE the
  * content vocabulary, so every content id keeps its trained value, a
  * vocab prefix stays a valid smaller vocab, and `id >= vocabSize`
  * IS the "is special" predicate — no reserved gaps, no offset shifts.
  *
  * Encoder-agnostic by construction: all four id encoders
  * ([[Bpe.bpeEncodeIds]], [[Bpe.byteBpeEncodeIds]],
  * [[WordPiece.wordPieceEncodeIds]], [[Unigram.unigramEncodeIds]]) emit
  * `array<int>` with ids in `[0, vocabSize)` (−1 unknowns for the
  * char-BPE form), so one combinator set serves them all — wrap the
  * encoder column, never the encoder. Everything here is pure codegen'd
  * column arithmetic (slice/concat/filter/array_repeat): map-only,
  * shuffle-free, scan-projection-safe at any scale.
  */
object SpecialTokens {

  /** The reserved id block above a content vocabulary of `vocabSize`
    * ids: BOS = V, EOS = V+1, PAD = V+2 (rank order fixed so persisted
    * sequences stay decodable across sessions). `extendedVocabSize` is
    * what an embedding table must size to.
    */
  final case class Ids(vocabSize: Int) {
    require(vocabSize >= 1,
      s"SpecialTokens: vocabSize must be >= 1, got $vocabSize")
    val bosId: Int = vocabSize
    val eosId: Int = vocabSize + 1
    val padId: Int = vocabSize + 2
    val extendedVocabSize: Int = vocabSize + 3
  }

  /** `[BOS] + ids(truncated to maxLen − 2) + [EOS]` — the framed,
    * length-bounded sequence a trainer consumes. Truncation keeps the
    * FIRST `maxLen − 2` content ids and ALWAYS re-appends EOS (the
    * standard "truncate then close" rule: a sequence that lost its tail
    * still signals its end), so `size(out) = min(size(ids), maxLen − 2)
    * + 2 ≤ maxLen` exactly. NULL ids stay NULL (a missing document is
    * not an empty one).
    */
  def addSpecials(ids: Column, sp: Ids, maxLen: Int): Column = {
    require(maxLen >= 2,
      s"addSpecials: maxLen must be >= 2 (BOS + EOS), got $maxLen")
    when(ids.isNotNull,
      concat(
        array(lit(sp.bosId)),
        slice(ids, 1, maxLen - 2),
        array(lit(sp.eosId))))
  }

  /** Right-pad to exactly `maxLen` with PAD — the fixed-shape batch
    * form. Input longer than `maxLen` fails the whole job loudly at
    * first evaluation (a silent over-long row would desync a fixed-
    * shape training batch): pass [[addSpecials]] output with the same
    * `maxLen` and the bound holds by construction.
    */
  def padTo(ids: Column, sp: Ids, maxLen: Int): Column = {
    require(maxLen >= 1, s"padTo: maxLen must be >= 1, got $maxLen")
    when(ids.isNull, ids)
      .when(size(ids) <= maxLen,
        concat(ids, array_repeat(lit(sp.padId), lit(maxLen) - size(ids))))
      .otherwise(raise_error(concat(
        lit(s"padTo: sequence of "), size(ids).cast("string"),
        lit(s" ids exceeds maxLen=$maxLen — frame with addSpecials at " +
          "the same maxLen first"))).cast("array<int>"))
  }

  /** Drop every special id (`>= vocabSize`) — the inverse framing step
    * before decode: `decode(stripSpecials(addSpecials(ids, …))) ===
    * decode(ids)` whenever nothing truncated, which keeps the oracled
    * decode-roundtrip identity intact for framed sequences.
    */
  def stripSpecials(ids: Column, sp: Ids): Column =
    filter(ids, i => i < sp.vocabSize)
}
