package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece greedy longest-match-first segmentation under a trained
  * piece vocabulary (see [[graft.operators.WordPiece]]) — one static
  * call per row from whole-stage codegen, the [[UnigramOps]] pattern.
  * Unlike BPE the encoder never replays merges: the model is just the
  * final piece set, probed longest-prefix-first (Schuster & Nakajima
  * 2012; the BERT tokenizer). Word-initial and continuation pieces live
  * in SEPARATE maps keyed by their RAW text (no "##" string prefix
  * inside the model), so a corpus word that itself starts with "##"
  * can never collide with a continuation form — the conservation gate
  * depends on that unambiguity. The model travels as one serialized
  * string literal in length-prefixed framing (the BPE framing lesson)
  * with a one-character continuation flag per piece.
  */
object WordPieceOps {

  /** Parsed model: raw piece text → id, split by form. `maxLen` bounds
    * the longest-match probe window (code points).
    */
  final class Model(val pieces: Array[String], val isCont: Array[Boolean]) {
    val initOf = new java.util.HashMap[String, Integer]()
    val contOf = new java.util.HashMap[String, Integer]()
    locally {
      var i = 0
      while (i < pieces.length) {
        val m = if (isCont(i)) contOf else initOf
        m.putIfAbsent(pieces(i), Integer.valueOf(i))
        i += 1
      }
    }
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

  /** One piece record: `<len>:<piece><flag>;` — flag is `c` for a
    * continuation piece, `i` for word-initial (single non-piece chars,
    * so the terminator after the length-prefixed piece is unambiguous).
    */
  private[graft] def encodePiece(p: String, isCont: Boolean): String =
    s"${p.length}:$p${if (isCont) "c" else "i"};"

  private def parse(spec: String): Model =
    cache.computeIfAbsent(spec, s => {
      val ps = Array.newBuilder[String]
      val cs = Array.newBuilder[Boolean]
      var i = 0
      while (i < s.length) {
        val colon = s.indexOf(':', i)
        val len = s.substring(i, colon).toInt
        ps += s.substring(colon + 1, colon + 1 + len)
        cs += (s.charAt(colon + 1 + len) == 'c')
        i = colon + 1 + len + 2 // flag + ';'
      }
      new Model(ps.result(), cs.result())
    })

  /** Greedy longest-match-first segmentation of one (already lowercased)
    * word; appends piece ids to `out` and returns the emitted count.
    *
    * The BERT rule set, exactly: at each position probe the LONGEST
    * in-vocab prefix first (word-initial map at position 0, continuation
    * map after), shrinking by one code point until a piece matches; if
    * any position matches nothing, the ENTIRE word becomes one unknown
    * token (id −1) — WordPiece never emits a partial segmentation.
    * Positions are code points (the [[UnigramOps.segmentWord]] offs
    * mapping), so astral characters are one position each.
    */
  def segmentWord(word: String, m: Model,
                  out: scala.collection.mutable.ArrayBuilder[Int]): Int = {
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
    val tmp = Array.newBuilder[Int]
    var start = 0
    var count = 0
    while (start < n) {
      val map = if (start == 0) m.initOf else m.contOf
      var end = math.min(n, start + m.maxLen)
      var matched = -2
      while (end > start && matched == -2) {
        val pid = map.get(word.substring(offs(start), offs(end)))
        if (pid != null) matched = pid.intValue() else end -= 1
      }
      if (matched == -2) {
        out += -1 // whole word unknown — discard partial pieces
        return 1
      }
      tmp += matched
      count += 1
      start = end
    }
    val arr = tmp.result()
    var k = 0
    while (k < arr.length) { out += arr(k); k += 1 }
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
    * a word-initial piece opens a new word (space-separated from the
    * previous one), a continuation piece appends to the current word —
    * the is_cont flags ARE the word boundaries, so WordPiece decode
    * restores the full normalized word sequence:
    * `decode(encode(t)) === lowercased words of t joined by spaces`
    * whenever no word UNK'd (the oracled roundtrip identity; on the
    * training corpus nothing can UNK — the conservation gate's
    * argument). The whole-word unknown id −1 decodes to the literal
    * `[UNK]` word (BERT's display convention): the word's characters
    * were discarded at encode time.
    */
  def decodeIds(ids: ArrayData, spec: UTF8String): UTF8String = {
    val model = parse(spec.toString)
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      val id = ids.getInt(i)
      if (id < 0 || id >= model.pieces.length) {
        if (sb.length > 0) sb.append(' ')
        sb.append("[UNK]")
      } else {
        // a leading continuation piece cannot arise from the encoder;
        // for a foreign stream it just appends to the current word
        if (!model.isCont(id) && sb.length > 0) sb.append(' ')
        sb.append(model.pieces(id))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Total piece count of `text` — [[encodeIds]] without the array. */
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

/** Column builders for [[WordPieceOps]]. */
object WordPieceExpressions {

  private def spec(pieces: Array[String], isCont: Array[Boolean]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pieces.length) {
      sb.append(WordPieceOps.encodePiece(pieces(i), isCont(i)))
      i += 1
    }
    sb.toString
  }

  /** WordPiece piece-id sequence (`array<int>`) of `text`. */
  def wordPieceEncodeIds(text: Column, pieces: Array[String],
                         isCont: Array[Boolean]): Column =
    GraftBridge.column(StaticInvoke(
      WordPieceOps.getClass,
      ArrayType(IntegerType, containsNull = false),
      "encodeIds",
      Seq(GraftBridge.expression(text),
        Literal(UTF8String.fromString(spec(pieces, isCont)), StringType)),
      inputTypes = Seq(StringType, StringType),
      propagateNull = true,
      returnNullable = true))

  /** WordPiece token count (`long`) of `text`. */
  def wordPieceTokenCount(text: Column, pieces: Array[String],
                          isCont: Array[Boolean]): Column =
    GraftBridge.column(StaticInvoke(
      WordPieceOps.getClass,
      LongType,
      "count",
      Seq(GraftBridge.expression(text),
        Literal(UTF8String.fromString(spec(pieces, isCont)), StringType)),
      inputTypes = Seq(StringType, StringType),
      propagateNull = true,
      returnNullable = true))

  /** Decoded word text (`string`) of a WordPiece id sequence (see
    * [[WordPieceOps.decodeIds]]).
    */
  def wordPieceDecodeIds(ids: Column, pieces: Array[String],
                         isCont: Array[Boolean]): Column =
    GraftBridge.column(StaticInvoke(
      WordPieceOps.getClass,
      StringType,
      "decodeIds",
      Seq(GraftBridge.expression(ids),
        Literal(UTF8String.fromString(spec(pieces, isCont)), StringType)),
      inputTypes = Seq(ArrayType(IntegerType, containsNull = false),
        StringType),
      propagateNull = true,
      returnNullable = true))
}
