package graft.expressions

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{BinaryType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset sniffing for raw crawl payload BYTES (r17, VERDICT r16
  * §next-5) — the stage that must run BEFORE any text operator sees a
  * fetched page: a real CommonCrawl slice carries a legacy-charset
  * minority (windows-1252/Shift_JIS/GBK pages), and decoding those as
  * UTF-8 mojibakes them in a way [[UnicodeOps.fixMojibake]] cannot repair
  * (that operator fixes UTF-8 text that was mis-ROUNDTRIPPED upstream;
  * a wrong DECODE here replaces bytes with U+FFFD before any repair can
  * see them). The detector is DETERMINISTIC — no statistical guessing —
  * in the standard precedence order:
  *
  *   1. BOM: EF BB BF → UTF-8, FE FF → UTF-16BE, FF FE → UTF-16LE
  *      (stripped from the decode).
  *   2. Declared charset in the first 4 KiB, scanned byte-transparently
  *      (ISO-8859-1): HTML `<meta … charset=…>` (either the HTML5 short
  *      form or the http-equiv content parameter), then an XML
  *      declaration's `encoding="…"`.
  *   3. Strict UTF-8 validation: a payload that decodes cleanly IS
  *      UTF-8 (ASCII included — UTF-8 is its superset).
  *   4. Script-coherence detection for the UNDECLARED legacy-CJK
  *      minority (late r17): real crawls carry Shift_JIS / EUC-JP /
  *      EUC-KR / GBK pages with no BOM, no header param, and no meta —
  *      the windows-1252 fallback mojibakes all of them. Still
  *      deterministic (fixed candidate order, integer thresholds, no
  *      frequency models): a candidate must decode the 64 KiB head with
  *      at most one replacement (tolerating one boundary-cut character)
  *      AND pass its script test — see [[statDetect]].
  *   5. Fallback: windows-1252, the web's de-facto single-byte default.
  *
  * Declared names canonicalize through the JDK charset registry with the
  * HTML5 compatibility mapping applied first (iso-8859-1 / latin1 /
  * us-ascii label windows-1252 content on the real web — WHATWG Encoding
  * Standard §4.2); an unknown or unsupported label falls back to
  * windows-1252 rather than erroring, and the decode itself uses
  * REPLACE semantics (a meta that lies must yield countable U+FFFDs,
  * not a crashed ingest). All JDK-side statics behind codegen'd
  * StaticInvoke — map-only, shuffle-free, the [[UnicodeOps]] scale shape.
  */
object CharsetOps {

  private val MetaCharsetRe =
    "(?i)<meta[^>]*charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9._:-]+)".r
  private val XmlEncodingRe =
    "(?i)<\\?xml[^>]*encoding\\s*=\\s*[\"']([A-Za-z0-9._:-]+)[\"']".r

  /** WHATWG-mapped, JDK-canonicalized charset name; windows-1252 when the
    * label is unknown or unsupported.
    */
  private def canonical(label: String): String = {
    val n = label.trim.toLowerCase(java.util.Locale.ROOT)
    val mapped = n match {
      // the WHATWG Encoding Standard maps these labels to windows-1252
      case "iso-8859-1" | "iso8859-1" | "latin1" | "latin-1" | "l1" |
           "us-ascii" | "ascii" | "ansi_x3.4-1968" | "cp819" | "iso-ir-100" =>
        "windows-1252"
      case other => other
    }
    try Charset.forName(mapped).name()
    catch { case _: Exception => "windows-1252" }
  }

  private def strictUtf8Valid(b: Array[Byte], off: Int): Boolean = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(b, off, b.length - off)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }

  /** Script-coherence detection of an UNDECLARED legacy-CJK charset —
    * stage 4 of the chain. Deterministic by construction: candidates try
    * in a FIXED order (Shift_JIS → EUC-JP → EUC-KR → GBK → Big5 — each
    * earlier family's bytes happen to be structurally valid under the
    * later ones, so the order must run specific-to-permissive), each over
    * the same 64 KiB head, with integer thresholds and no frequency
    * models.
    * A candidate is accepted when
    *
    *   - its REPLACE decode of the head produces ≤ 1 U+FFFD (one
    *     tolerated replacement: a multi-byte character cut by the 64 KiB
    *     boundary), and
    *   - the decoded text is script-coherent for that charset:
    *     - Shift_JIS / EUC-JP: ≥ 4 FULL-WIDTH kana (U+3040–30FF) and
    *       kana ≥ 25% of script chars — real Japanese is kana-threaded;
    *       Chinese or Korean bytes mis-decoded under these yield kanji or
    *       half-width forms but essentially no full-width kana.
    *     - EUC-KR: ≥ 4 hangul (U+AC00–D7A3 + compat jamo) and hangul
    *       ≥ 75% of script chars — Korean text is nearly all syllables,
    *       while Chinese bytes mis-decoded under EUC-KR land only ~half
    *       in the hangul rows (GB2312 level-1 spans rows 0xB0–0xF7,
    *       EUC-KR hangul stops at 0xC8).
    *     - GBK: ≥ 4 CJK ideographs, and ≥ 90% of its two-byte pairs have
    *       a HIGH trail byte (≥ 0xA1, the GB2312 plane) — genuine
    *       simplified-Chinese text is almost entirely GB2312-range,
    *       while windows-1252 text mis-parsed as GBK (an accented letter
    *       eating the next ASCII letter) produces ASCII-trail pairs
    *       exclusively.
    *     - Big5 (after GBK — GBK claims simplified text first, and Big5's
    *       ASCII-range trails fail GBK's high-trail rule, so the two
    *       don't steal from each other): ≥ 4 CJK ideographs plus an
    *       ADJACENCY rule — ≥ 40% of its two-byte pairs are immediately
    *       followed by another lead byte. Genuine Chinese text runs its
    *       hanzi together; Latin-under-Big5 (ñ/ã eating the next letter
    *       decodes cleanly to isolated hanzi — Spanish and Portuguese
    *       are the measured false-positive risk) always follows a pair
    *       with ASCII, so it scores 0% adjacency.
    *   - every candidate additionally requires script chars ≥ 70% of
    *     decoded non-ASCII chars (a binary-ish payload decodes into
    *     scattered symbols, not one script).
    *
    * Returns None when nothing qualifies — the caller falls back to
    * windows-1252 exactly as before, so Latin-script pages are
    * unaffected (verified: accented-Latin bytes fail every candidate —
    * EUC trails reject ASCII neighbors, Shift_JIS yields no full-width
    * kana, GBK fails the high-trail rule).
    */
  private[expressions] def statDetect(b: Array[Byte]): Option[String] = {
    val n = math.min(b.length, 65536)
    def counts(name: String): Option[(Int, Int, Int, Int, Int)] = {
      val s = new String(b, 0, n, Charset.forName(name)) // REPLACE decode
      var fffd, kana, hangul, cjk, nonAscii = 0
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i).toInt
        if (c == 0xFFFD) fffd += 1
        else if (c > 0x7F) {
          nonAscii += 1
          if (c >= 0x3040 && c <= 0x30FF) kana += 1
          else if ((c >= 0xAC00 && c <= 0xD7A3) ||
                   (c >= 0x3130 && c <= 0x318F)) hangul += 1
          else if (c >= 0x4E00 && c <= 0x9FFF) cjk += 1
        }
        i += 1
      }
      if (fffd > 1) None else Some((kana, hangul, cjk, nonAscii, fffd))
    }
    def coherent(kana: Int, hangul: Int, cjk: Int, nonAscii: Int): Boolean =
      (kana + hangul + cjk) * 10 >= nonAscii * 7
    def japanese(name: String): Boolean = counts(name).exists {
      case (kana, hangul, cjk, nonAscii, _) =>
        kana >= 4 && kana * 4 >= (kana + hangul + cjk) &&
          coherent(kana, hangul, cjk, nonAscii)
    }
    def korean: Boolean = counts("EUC-KR").exists {
      case (kana, hangul, cjk, nonAscii, _) =>
        hangul >= 4 && hangul * 4 >= (kana + hangul + cjk) * 3 &&
          coherent(kana, hangul, cjk, nonAscii)
    }
    def gbk: Boolean = counts("GBK").exists {
      case (kana, hangul, cjk, nonAscii, _) =>
        // high-trail pair rule, computed on the BYTES: GBK leads are
        // 0x81-0xFE, trails 0x40-0xFE minus 0x7F; count trails >= 0xA1
        var pairs, highTrail = 0
        var i = 0
        while (i < n - 1) {
          val lead = b(i) & 0xFF
          if (lead >= 0x81) {
            val t = b(i + 1) & 0xFF
            if (t >= 0x40 && t != 0x7F) {
              pairs += 1
              if (t >= 0xA1) highTrail += 1
            }
            i += 2
          } else i += 1
        }
        cjk >= 4 && coherent(kana, hangul, cjk, nonAscii) &&
          pairs > 0 && highTrail * 10 >= pairs * 9
    }
    def big5: Boolean = counts("Big5").exists {
      case (kana, hangul, cjk, nonAscii, _) =>
        // adjacency rule on the BYTES: Big5 leads 0x81-0xFE, trails
        // 0x40-0x7E | 0xA1-0xFE; count pairs whose next byte is another
        // lead (a hanzi run) vs pairs followed by ASCII (the
        // Latin-false-positive shape)
        var pairs, adjacent = 0
        var i = 0
        while (i < n - 1) {
          val lead = b(i) & 0xFF
          if (lead >= 0x81) {
            val t = b(i + 1) & 0xFF
            if ((t >= 0x40 && t <= 0x7E) || (t >= 0xA1 && t <= 0xFE)) {
              pairs += 1
              if (i + 2 < n && (b(i + 2) & 0xFF) >= 0x81) adjacent += 1
            }
            i += 2
          } else i += 1
        }
        cjk >= 4 && coherent(kana, hangul, cjk, nonAscii) &&
          pairs > 0 && adjacent * 5 >= pairs * 2
    }
    if (japanese("Shift_JIS")) Some("Shift_JIS")
    else if (japanese("EUC-JP")) Some("EUC-JP")
    else if (korean) Some("EUC-KR")
    else if (gbk) Some("GBK")
    else if (big5) Some("Big5")
    else None
  }

  /** (canonical charset name, detection method) — method is one of
    * "bom" | "meta" | "xml" | "utf8" | "stat" | "fallback".
    */
  private def detect(b: Array[Byte]): (String, String) = {
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
        b(2) == 0xBF.toByte) return ("UTF-8", "bom")
    if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
      return ("UTF-16BE", "bom")
    if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte)
      return ("UTF-16LE", "bom")
    // byte-transparent head scan: ISO-8859-1 maps every byte to a char,
    // so the regexes see the raw bytes whatever the true charset is
    val head = new String(b, 0, math.min(b.length, 4096),
      StandardCharsets.ISO_8859_1)
    MetaCharsetRe.findFirstMatchIn(head) match {
      case Some(m) => (canonical(m.group(1)), "meta")
      case None => XmlEncodingRe.findFirstMatchIn(head) match {
        case Some(m) => (canonical(m.group(1)), "xml")
        case None =>
          if (strictUtf8Valid(b, 0)) ("UTF-8", "utf8")
          else statDetect(b) match {
            case Some(name) => (name, "stat")
            case None => ("windows-1252", "fallback")
          }
      }
    }
  }

  private def bomLen(b: Array[Byte]): Int =
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
        b(2) == 0xBF.toByte) 3
    else if (b.length >= 2 &&
        ((b(0) == 0xFE.toByte && b(1) == 0xFF.toByte) ||
         (b(0) == 0xFF.toByte && b(1) == 0xFE.toByte))) 2
    else 0

  private val HeaderCharsetRe =
    "(?i)charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9._:-]+)".r

  /** [[detect]] with an HTTP Content-Type header hint — the transport
    * layer outranks in-document declarations in the HTML5 precedence
    * (BOM → HTTP charset → meta), and the WARC chain carries the header
    * (`http_content_type`) for exactly this. An empty or parameterless
    * hint falls through to the unhinted chain.
    */
  private def detectWithHint(b: Array[Byte], hint: String): (String, String) = {
    if (b.length >= 2 && bomLen(b) > 0) detect(b) // BOM still wins
    else HeaderCharsetRe.findFirstMatchIn(hint) match {
      case Some(m) => (canonical(m.group(1)), "header")
      case None => detect(b)
    }
  }

  /** The detected canonical charset name of a payload. */
  def sniffCharset(b: Array[Byte]): UTF8String =
    UTF8String.fromString(detect(b)._1)

  /** Which detector stage fired: bom | meta | xml | utf8 | fallback. */
  def sniffMethod(b: Array[Byte]): UTF8String =
    UTF8String.fromString(detect(b)._2)

  /** [[sniffCharset]] under an HTTP Content-Type hint ('' = no hint). */
  def sniffCharsetHint(b: Array[Byte], hint: UTF8String): UTF8String =
    UTF8String.fromString(detectWithHint(b, hint.toString)._1)

  /** [[sniffMethod]] under a hint; adds the "header" stage. */
  def sniffMethodHint(b: Array[Byte], hint: UTF8String): UTF8String =
    UTF8String.fromString(detectWithHint(b, hint.toString)._2)

  /** [[decodeSniffed]] under an HTTP Content-Type hint ('' = no hint). */
  def decodeSniffedHint(b: Array[Byte], hint: UTF8String): UTF8String = {
    val (name, method) = detectWithHint(b, hint.toString)
    val off = if (method == "bom") bomLen(b) else 0
    UTF8String.fromString(new String(b, off, b.length - off,
      Charset.forName(name)))
  }

  /** Decode a payload under its detected charset (BOM stripped, REPLACE
    * semantics for bytes the declared charset cannot decode). Detection
    * re-runs per call — it is a bounded 4 KiB head scan, cheap next to
    * the decode itself; select charset/method alongside only for
    * diagnostics, not in the hot path.
    */
  def decodeSniffed(b: Array[Byte]): UTF8String = {
    val (name, method) = detect(b)
    val off = if (method == "bom") bomLen(b) else 0
    UTF8String.fromString(new String(b, off, b.length - off,
      Charset.forName(name)))
  }

  /** Encode text under an explicit charset — the fixture / round-trip-
    * gate side (unsupported charset names throw: this is a test-data
    * constructor, not an ingest path).
    */
  def encodeCharset(s: UTF8String, charset: UTF8String): Array[Byte] =
    s.toString.getBytes(Charset.forName(charset.toString))
}

/** Column wrappers (the TextHashExpressions convention: StaticInvoke,
  * null-propagating, codegen-friendly).
  */
object CharsetExpressions {

  def sniffCharset(bytes: Column): Column =
    GraftBridge.column(StaticInvoke(
      CharsetOps.getClass,
      StringType,
      "sniffCharset",
      Seq(GraftBridge.expression(bytes)),
      inputTypes = Seq(BinaryType),
      propagateNull = true,
      returnNullable = true))

  def sniffMethod(bytes: Column): Column =
    GraftBridge.column(StaticInvoke(
      CharsetOps.getClass,
      StringType,
      "sniffMethod",
      Seq(GraftBridge.expression(bytes)),
      inputTypes = Seq(BinaryType),
      propagateNull = true,
      returnNullable = true))

  def decodeSniffed(bytes: Column): Column =
    GraftBridge.column(StaticInvoke(
      CharsetOps.getClass,
      StringType,
      "decodeSniffed",
      Seq(GraftBridge.expression(bytes)),
      inputTypes = Seq(BinaryType),
      propagateNull = true,
      returnNullable = true))

  def encodeCharset(text: Column, charset: Column): Column =
    GraftBridge.column(StaticInvoke(
      CharsetOps.getClass,
      BinaryType,
      "encodeCharset",
      Seq(GraftBridge.expression(text), GraftBridge.expression(charset)),
      inputTypes = Seq(StringType, StringType),
      propagateNull = true,
      returnNullable = true))

  def sniffCharsetHint(bytes: Column, hint: Column): Column =
    GraftBridge.column(StaticInvoke(
      CharsetOps.getClass,
      StringType,
      "sniffCharsetHint",
      Seq(GraftBridge.expression(bytes), GraftBridge.expression(hint)),
      inputTypes = Seq(BinaryType, StringType),
      propagateNull = true,
      returnNullable = true))

  def sniffMethodHint(bytes: Column, hint: Column): Column =
    GraftBridge.column(StaticInvoke(
      CharsetOps.getClass,
      StringType,
      "sniffMethodHint",
      Seq(GraftBridge.expression(bytes), GraftBridge.expression(hint)),
      inputTypes = Seq(BinaryType, StringType),
      propagateNull = true,
      returnNullable = true))

  def decodeSniffedHint(bytes: Column, hint: Column): Column =
    GraftBridge.column(StaticInvoke(
      CharsetOps.getClass,
      StringType,
      "decodeSniffedHint",
      Seq(GraftBridge.expression(bytes), GraftBridge.expression(hint)),
      inputTypes = Seq(BinaryType, StringType),
      propagateNull = true,
      returnNullable = true))
}
