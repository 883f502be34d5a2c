package graft

import graft.expressions.CharsetExpressions._
import org.apache.spark.sql.functions._

/** Charset sniffing edges beyond the oracled q_warc_charset cases: the
  * UTF-16 BOMs, the XML declaration stage, unknown labels, empty and
  * NULL payloads, and the WHATWG label mapping.
  */
class CharsetSpec extends SparkSpec {
  import spark.implicits._

  private def sniff(bytes: Array[Byte]): (String, String, String) = {
    val r = Seq(Tuple1(bytes)).toDF("b")
      .select(sniffCharset(col("b")), sniffMethod(col("b")),
        decodeSniffed(col("b")))
      .head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("UTF-16 BOMs detect and decode with the BOM stripped") {
    val le = Array(0xFF.toByte, 0xFE.toByte) ++
      "héllo".getBytes("UTF-16LE")
    assert(sniff(le) == (("UTF-16LE", "bom", "héllo")))
    val be = Array(0xFE.toByte, 0xFF.toByte) ++
      "héllo".getBytes("UTF-16BE")
    assert(sniff(be) == (("UTF-16BE", "bom", "héllo")))
  }

  test("XML declaration stage fires after meta, with the WHATWG mapping") {
    val xml = "<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?><r>café</r>"
      .getBytes("windows-1252")
    assert(sniff(xml) == (("windows-1252", "xml",
      "<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?><r>café</r>")))
    // an html meta in the head WINS over a later xml-looking fragment
    val meta = ("<html><head><meta charset=utf-8></head>" +
      "<?xml encoding=\"ISO-8859-1\"?></html>").getBytes("UTF-8")
    assert(sniff(meta)._2 == "meta")
  }

  test("unknown/unsupported labels fall back to windows-1252; decode " +
      "REPLACEs instead of throwing") {
    val b = "<meta charset=\"x-klingon\">café page"
      .getBytes("windows-1252")
    val (cs, m, txt) = sniff(b)
    assert(cs == "windows-1252" && m == "meta")
    assert(txt.contains("café"), txt)
  }

  test("empty payload is valid UTF-8; NULL propagates; ASCII is utf8") {
    assert(sniff(Array.emptyByteArray) == (("UTF-8", "utf8", "")))
    val r = Seq(Tuple1(null.asInstanceOf[Array[Byte]])).toDF("b")
      .select(decodeSniffed(col("b"))).head()
    assert(r.isNullAt(0))
    assert(sniff("plain ascii".getBytes("US-ASCII")) ==
      (("UTF-8", "utf8", "plain ascii")))
  }

  test("Content-Type hint: header outranks meta, BOM outranks header, " +
      "parameterless hints fall through") {
    // header says cp1252, meta LIES utf-8 — the transport layer wins
    // (HTML5 precedence) and the cp1252 bytes decode correctly
    val lying = "<html><head><meta charset=\"utf-8\"></head><body>café</body></html>"
      .getBytes("windows-1252")
    def hinted(b: Array[Byte], h: String): (String, String, String) = {
      val r = Seq(Tuple1(b)).toDF("b")
        .select(sniffCharsetHint(col("b"), lit(h)),
          sniffMethodHint(col("b"), lit(h)),
          decodeSniffedHint(col("b"), lit(h)))
        .head()
      (r.getString(0), r.getString(1), r.getString(2))
    }
    val (cs, m, txt) = hinted(lying, "text/html; charset=iso-8859-1")
    assert(cs == "windows-1252" && m == "header", (cs, m))
    assert(txt.contains("café"), txt)
    // a BOM beats the header hint
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "hé".getBytes("UTF-8")
    assert(hinted(bom, "text/html; charset=iso-8859-1") ==
      (("UTF-8", "bom", "hé")))
    // a hint with no charset parameter falls through to the plain chain
    assert(hinted("plain".getBytes("US-ASCII"), "text/html") ==
      (("UTF-8", "utf8", "plain")))
  }

  test("encodeCharset round-trips through every detector stage it feeds") {
    // Shift_JIS with meta: encode -> sniff -> decode is the identity
    val page = "<html><head><meta charset=\"shift_jis\"></head>" +
      "<body>日本語のページ</body></html>"
    val got = Seq(Tuple1(page)).toDF("t")
      .select(decodeSniffed(encodeCharset(col("t"), lit("Shift_JIS"))))
      .as[String].head()
    assert(got == page)
  }

  // ---- the script-coherence stage (late r17): UNDECLARED legacy-CJK
  // payloads — no BOM, no header, no meta — must detect by 'stat', and
  // Latin-script payloads must NOT be stolen from the cp1252 fallback.

  private def undeclared(body: String, enc: String): Array[Byte] =
    s"<html><head></head><body>$body</body></html>"
      .getBytes(java.nio.charset.Charset.forName(enc))

  test("stat stage: undeclared Shift_JIS / EUC-JP / EUC-KR / GBK / Big5 " +
      "detect and decode exactly") {
    val cases = Seq(
      ("こんにちは、世界のページです", "Shift_JIS"),
      ("こんにちは、世界のページです", "EUC-JP"),
      ("한국어 웹 페이지 내용 예시", "EUC-KR"),
      ("中文网页的内容测试数据示例", "GBK"),
      ("中文網頁的內容測試資料範例", "Big5"))
    for ((body, enc) <- cases) {
      val (cs, m, txt) = sniff(undeclared(body, enc))
      assert(cs == enc && m == "stat", s"$enc -> ($cs, $m)")
      assert(txt.contains(body), s"$enc decode: $txt")
    }
  }

  test("stat stage: accented-Latin payloads stay on the cp1252 fallback " +
      "(Spanish/Portuguese are the measured Big5 false-positive risk)") {
    val latin = Seq(
      "café Grün £ © détente très tôt",    // fr
      "Müller Straße Größe Äpfel Öl für",  // de
      "año señor más allá cañón niño",     // es (ñ+vowel = clean Big5 pair)
      "ação coração não informação")       // pt (ã+o = clean Big5 pair)
    for (body <- latin) {
      val (cs, m, _) = sniff(undeclared(body, "windows-1252"))
      assert(cs == "windows-1252" && m == "fallback", s"'$body' -> ($cs, $m)")
    }
  }

  test("stat stage: a declared charset still outranks it, and a " +
      "boundary-cut character is tolerated (one replacement)") {
    // meta wins even when the stat stage would agree
    val declared = ("<html><head><meta charset=\"shift_jis\"></head>" +
      "<body>こんにちは、世界のページです</body></html>").getBytes("Shift_JIS")
    val (cs, m, _) = sniff(declared)
    assert(cs == "Shift_JIS" && m == "meta", (cs, m))
    // truncate an undeclared Shift_JIS payload mid-character: the REPLACE
    // decode yields exactly one U+FFFD, which the <=1 tolerance accepts
    val full = undeclared("こんにちは、世界のページですこんにちは", "Shift_JIS")
    val bodyEnd = full.length - "</body></html>".length
    val cut = full.take(bodyEnd - 1) // split the last 2-byte character
    val (cs2, m2, txt2) = sniff(cut)
    assert(cs2 == "Shift_JIS" && m2 == "stat", (cs2, m2))
    assert(txt2.count(_ == '�') == 1, txt2)
  }

  test("stat stage: Korean-vs-Chinese disambiguation — Chinese bytes " +
      "mis-decoded under EUC-KR land only ~half in hangul and are " +
      "rejected; kanji-only text routes to GBK, kana-threaded to SJIS") {
    // the GBK fixture body decodes CLEANLY under EUC-KR (mixed
    // hangul+hanja) — only the 75% hangul-dominance rule rejects it
    val zh = undeclared("中文网页的内容测试数据示例", "GBK")
    assert(sniff(zh)._1 == "GBK")
    // kanji-only Japanese is indistinguishable from Chinese without
    // frequency models — documented: it detects as GBK (structurally
    // consistent, and the decode is wrong either way without kana)
    val kanjiOnly = undeclared("東京都内の... 漢字", "Shift_JIS")
    val (csK, mK, _) = sniff(kanjiOnly)
    assert(mK == "stat" || mK == "fallback", (csK, mK))
  }
}
