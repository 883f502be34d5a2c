package graft.expressions

import java.nio.charset.StandardCharsets
import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{BooleanType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode hygiene natives — the normalization pass a web corpus runs
  * before ANY text hashing or tokenization, because every downstream
  * equality (exact dedup, MinHash shingles, BPE merges, stopword hits)
  * silently fragments when the same text arrives in different byte
  * forms. Two defects dominate real crawls:
  *
  *   1. CANONICAL-FORM DRIFT — "café" as 5 codepoints (e + COMBINING
  *      ACUTE) vs 4 (U+00E9). Fixed by Unicode NFC, the W3C-recommended
  *      interchange form. `nfc`/`nfkc` are one codegen'd static call per
  *      row over `java.text.Normalizer` with an `isNormalized` fast path
  *      (true for all-ASCII, i.e. for most of any crawl, without
  *      allocating).
  *   2. MOJIBAKE — UTF-8 bytes decoded as a legacy single-byte charset
  *      upstream and re-encoded, so "été" arrives as "Ã©tÃ©". Fixed by
  *      [[UnicodeOps.fixMojibake]]: re-encode through Windows-1252
  *      (superset-of-Latin-1 semantics below) and accept the strict
  *      UTF-8 re-decode iff it is valid and strictly shorter — the
  *      core ftfy heuristic (Speer 2019, ftfy; the "sloppy cp1252"
  *      convention), iterated to a bounded fixpoint for double-encoded
  *      text.
  *
  * NFC is cross-engine replayable (DuckDB `nfc_normalize`, utf8proc) —
  * the q_text_nfc row hash-checks Java-vs-DuckDB normalization
  * end-to-end. The mojibake repair needs charset tables DuckDB doesn't
  * expose, so its row is gate-pinned on fixture pages with
  * literal expected repairs (the q_mm convention: engine-private
  * transform, oracled expected outputs).
  */
object UnicodeOps {

  /** Unicode NFC; the no-op path allocates nothing for already-normal
    * (e.g. all-ASCII) input.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Unicode NFKC — NFC plus compatibility folds (ﬁ → fi, ½ → 1⁄2,
    * fullwidth → ASCII). The aggressive form tokenizer pipelines prefer;
    * NOT replayable in DuckDB (no nfkc function), so engine-private.
    */
  def nfkc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFKC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFKC))
  }

  // Windows-1252 maps bytes 0x80-0x9F to printable codepoints (€ " " …);
  // the five unassigned slots (0x81 8D 8F 90 9D) and every other char
  // <= 0xFF fall back to the Latin-1 identity byte — "sloppy cp1252",
  // exactly the mixed decoding real pipelines produce. Table built once
  // from the JDK charset itself so it cannot drift from the standard.
  private val cp1252Reverse: Map[Char, Int] = {
    val cs = java.nio.charset.Charset.forName("windows-1252")
    (0x80 to 0x9F).flatMap { b =>
      val c = cs.decode(java.nio.ByteBuffer.wrap(Array(b.toByte))).get(0)
      if (c == '�') None else Some(c -> b)
    }.toMap
  }

  /** Encode one char under sloppy-cp1252; -1 if not encodable (meaning
    * the string cannot be single-byte mojibake at all).
    */
  private def sloppyByte(c: Char): Int =
    if (c <= 0xFF) c.toInt
    else cp1252Reverse.getOrElse(c, -1)

  /** One repair step: sloppy-cp1252 encode, strict UTF-8 decode; null if
    * the step does not apply (some char not single-byte encodable, or
    * the re-decode is invalid or not strictly shorter — the
    * "must improve" acceptance rule that keeps legitimately accented
    * text untouched: "naïve" re-encodes to EF 76 …, an invalid UTF-8
    * sequence, and stays as written).
    */
  private def repairOnce(str: String): String = {
    val n = str.length
    if (n < 2) return null
    var hasHigh = false
    val bytes = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = sloppyByte(str.charAt(i))
      if (v < 0) return null
      if (v >= 0x80) hasHigh = true
      bytes(i) = v.toByte
      i += 1
    }
    if (!hasHigh) return null // pure ASCII cannot be mojibake
    val dec = StandardCharsets.UTF_8.newDecoder()
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out.length < str.length) out else null
    } catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** Repair single-byte mojibake to the TRUE fixpoint: iterate until
    * [[repairOnce]] no longer applies (ADVICE r15 — a fixed 3-round cap
    * left quadruple-encoded text isMojibake-positive, breaking the
    * idempotence property `isMojibake(fixMojibake(x)) == false` the
    * specs pin). Termination is structural, not a cap: each accepted
    * round strictly shrinks the string. Returns the input unchanged
    * when no round applies — ASCII and legitimately accented text pass
    * through byte-identical.
    */
  def fixMojibake(s: UTF8String): UTF8String = {
    var cur = s.toString
    var changed = false
    var next = repairOnce(cur)
    while (next != null) { cur = next; changed = true; next = repairOnce(cur) }
    if (changed) UTF8String.fromString(cur) else s
  }

  /** True iff [[fixMojibake]] would change the text — a single static
    * call so a diagnostics FILTER costs one repair pass per row (the
    * CompressOps.ratioInBand lesson).
    */
  def isMojibake(s: UTF8String): Boolean = {
    val str = s.toString
    str.length >= 2 && repairOnce(str) != null
  }
}

/** Column wrappers (the TextHashExpressions convention: StaticInvoke,
  * null-propagating, codegen-friendly).
  */
object UnicodeExpressions {

  def nfcNormalize(text: Column): Column =
    GraftBridge.column(StaticInvoke(
      UnicodeOps.getClass,
      StringType,
      "nfc",
      Seq(GraftBridge.expression(text)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = true))

  def nfkcNormalize(text: Column): Column =
    GraftBridge.column(StaticInvoke(
      UnicodeOps.getClass,
      StringType,
      "nfkc",
      Seq(GraftBridge.expression(text)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = true))

  def fixMojibake(text: Column): Column =
    GraftBridge.column(StaticInvoke(
      UnicodeOps.getClass,
      StringType,
      "fixMojibake",
      Seq(GraftBridge.expression(text)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = true))

  def isMojibake(text: Column): Column =
    GraftBridge.column(StaticInvoke(
      UnicodeOps.getClass,
      BooleanType,
      "isMojibake",
      Seq(GraftBridge.expression(text)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = true))
}
