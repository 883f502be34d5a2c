package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece) Viterbi segmentation under a trained piece
  * vocabulary (see [[graft.operators.Unigram]]) — one static call per row
  * from whole-stage codegen, the [[BpeOps]] pattern. The model travels as
  * one serialized string literal in LENGTH-PREFIXED framing (the BPE
  * framing lesson: piece strings may contain ANY character, so no
  * sentinel separator ever reads a piece character as structure); piece
  * log-probabilities are serialized as RAW IEEE-754 bit patterns (hex),
  * so the executor-side Viterbi sees bit-identical doubles to the
  * driver-side trainer — and because the trainer's E-step calls the SAME
  * [[UnigramOps.segment]] method, training segmentation and encode
  * segmentation cannot diverge by construction.
  */
object UnigramOps {

  /** Parsed model: piece → id map (first id wins; the trainer emits
    * distinct pieces), per-id log-probs, and the max piece length that
    * bounds the Viterbi inner loop.
    */
  final class Model(val pieces: Array[String], val logProbs: Array[Double]) {
    val idOf = new java.util.HashMap[String, Integer]()
    locally {
      var i = 0
      while (i < pieces.length) {
        idOf.putIfAbsent(pieces(i), Integer.valueOf(i))
        i += 1
      }
    }
    /** Longest piece in CODE POINTS — the Viterbi window bound; pieces
      * come from code-point substrings (`Column.substr`), so the
      * segmenter's index space must match.
      */
    val maxLen: Int = {
      var m = 1
      var i = 0
      while (i < pieces.length) {
        val l = pieces(i).codePointCount(0, pieces(i).length)
        if (l > m) m = l
        i += 1
      }
      m
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Model]()

  /** One piece record: `<len>:<piece><16-lowercase-hex logProb bits>;` —
    * after the length-prefixed piece, everything to the next `;` is the
    * hex bit pattern (hex digits only, so the terminator is unambiguous).
    */
  private[graft] def encodePiece(p: String, logProb: Double): String = {
    val bits = java.lang.Long.toHexString(
      java.lang.Double.doubleToRawLongBits(logProb))
    s"${p.length}:$p$bits;"
  }

  private def parse(spec: String): Model =
    cache.computeIfAbsent(spec, s => {
      val ps = Array.newBuilder[String]
      val lps = Array.newBuilder[Double]
      var i = 0
      while (i < s.length) {
        val colon = s.indexOf(':', i)
        val len = s.substring(i, colon).toInt
        ps += s.substring(colon + 1, colon + 1 + len)
        val semi = s.indexOf(';', colon + 1 + len)
        lps += java.lang.Double.longBitsToDouble(
          java.lang.Long.parseUnsignedLong(
            s.substring(colon + 1 + len, semi), 16))
        i = semi + 1
      }
      new Model(ps.result(), lps.result())
    })

  /** Viterbi-best segmentation of one (already lowercased) word; appends
    * the piece ids to `out` and returns the piece count.
    *
    * Determinism contract (shared verbatim by trainer E-step and encode):
    * positions scan left to right; at each end position `j` candidate
    * start positions run ASCENDING from `j − maxLen` (longest piece
    * first) with a strictly-greater comparison, so equal-probability ties
    * keep the LONGEST final piece; characters no in-vocab segmentation
    * can reach fall back to an implicit unknown single-character piece
    * (id −1) — they participate only where the vocabulary has no path,
    * which on the training corpus is never (all its single characters
    * are vocab pieces by construction).
    */
  def segmentWord(word: String, m: Model,
                  out: scala.collection.mutable.ArrayBuilder[Int]): Int = {
    // positions are CODE POINTS (the trainer's pieces come from
    // code-point substrings, and the conservation gate's oracle counts
    // code points) — offs maps code-point index → UTF-16 offset so an
    // astral character is one position, never a split surrogate pair
    val offs = new Array[Int](word.length + 1)
    var n = 0
    var u = 0
    while (u < word.length) {
      offs(n) = u
      u += Character.charCount(word.codePointAt(u))
      n += 1
    }
    offs(n) = word.length
    if (n == 0) return 0
    val NegInf = Double.NegativeInfinity
    val dp = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    val backId = new Array[Int](n + 1)
    var j = 1
    dp(0) = 0.0
    while (j <= n) {
      var best = NegInf
      var bi = -1
      var bid = -2
      var i = if (j - m.maxLen > 0) j - m.maxLen else 0
      while (i < j) {
        if (dp(i) != NegInf || i == 0) {
          val pid = m.idOf.get(word.substring(offs(i), offs(j)))
          if (pid != null) {
            val cand = dp(i) + m.logProbs(pid.intValue())
            if (cand > best) { best = cand; bi = i; bid = pid.intValue() }
          }
        }
        i += 1
      }
      if (bid == -2) {
        // unreachable through the vocabulary: unknown single-char piece
        dp(j) = dp(j - 1)
        back(j) = j - 1
        backId(j) = -1
      } else {
        dp(j) = best
        back(j) = bi
        backId(j) = bid
      }
      j += 1
    }
    // backtrack, reverse in place
    val rev = Array.newBuilder[Int]
    var pos = n
    var count = 0
    while (pos > 0) {
      rev += backId(pos)
      pos = back(pos)
      count += 1
    }
    val arr = rev.result()
    var k = arr.length - 1
    while (k >= 0) { out += arr(k); k -= 1 }
    count
  }

  /** Piece-id sequence of `text`: lowercased whitespace words (the
    * [[BpeOps]] tokenization), each segmented by [[segmentWord]].
    */
  def encodeIds(text: UTF8String, spec: UTF8String): ArrayData = {
    val model = parse(spec.toString)
    val toks = text.toLowerCase.toString.split("\\s+")
    val out = Array.newBuilder[Int]
    var w = 0
    while (w < toks.length) {
      if (toks(w).nonEmpty) segmentWord(toks(w), model, out)
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out.result())
  }

  /** Inverse of [[encodeIds]] under the SAME spec (shared parse cache):
    * each id appends its piece text. Unigram segmentation is per word
    * but the id stream carries no word-boundary marker (unlike BPE's
    * `</w>` or WordPiece's continuation flags), so the roundtrip
    * identity is against the lowercased words joined WITHOUT spaces:
    * `decode(encode(t)) === concat(words(lower(t)))` whenever no id is
    * unknown (always true on the training corpus — its alphabet is
    * in-vocab). The unknown sentinel −1 decodes to U+FFFD: the
    * character was discarded at encode time.
    */
  def decodeIds(ids: ArrayData, spec: UTF8String): UTF8String = {
    val model = parse(spec.toString)
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      val id = ids.getInt(i)
      if (id < 0 || id >= model.pieces.length) sb.append('\uFFFD')
      else sb.append(model.pieces(id))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Total piece count of `text` — [[encodeIds]] without materializing
    * the array.
    */
  def count(text: UTF8String, spec: UTF8String): java.lang.Long = {
    val model = parse(spec.toString)
    val toks = text.toLowerCase.toString.split("\\s+")
    val sink = Array.newBuilder[Int]
    var total = 0L
    var w = 0
    while (w < toks.length) {
      if (toks(w).nonEmpty) {
        sink.clear()
        total += segmentWord(toks(w), model, sink)
      }
      w += 1
    }
    total
  }
}

/** Column builders for [[UnigramOps]]. */
object UnigramExpressions {

  private def spec(pieces: Array[String], logProbs: Array[Double]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pieces.length) {
      sb.append(UnigramOps.encodePiece(pieces(i), logProbs(i)))
      i += 1
    }
    sb.toString
  }

  /** Unigram piece-id sequence (`array<int>`) of `text`. */
  def unigramEncodeIds(text: Column, pieces: Array[String],
                       logProbs: Array[Double]): Column =
    GraftBridge.column(StaticInvoke(
      UnigramOps.getClass,
      ArrayType(IntegerType, containsNull = false),
      "encodeIds",
      Seq(GraftBridge.expression(text),
        Literal(UTF8String.fromString(spec(pieces, logProbs)), StringType)),
      inputTypes = Seq(StringType, StringType),
      propagateNull = true,
      returnNullable = true))

  /** Unigram piece count of `text`. */
  def unigramTokenCount(text: Column, pieces: Array[String],
                        logProbs: Array[Double]): Column =
    GraftBridge.column(StaticInvoke(
      UnigramOps.getClass,
      LongType,
      "count",
      Seq(GraftBridge.expression(text),
        Literal(UTF8String.fromString(spec(pieces, logProbs)), StringType)),
      inputTypes = Seq(StringType, StringType),
      propagateNull = true,
      returnNullable = true))

  /** Decoded text (`string`) of a Unigram id sequence (see
    * [[UnigramOps.decodeIds]]).
    */
  def unigramDecodeIds(ids: Column, pieces: Array[String],
                       logProbs: Array[Double]): Column =
    GraftBridge.column(StaticInvoke(
      UnigramOps.getClass,
      StringType,
      "decodeIds",
      Seq(GraftBridge.expression(ids),
        Literal(UTF8String.fromString(spec(pieces, logProbs)), StringType)),
      inputTypes = Seq(ArrayType(IntegerType, containsNull = false),
        StringType),
      propagateNull = true,
      returnNullable = true))
}
