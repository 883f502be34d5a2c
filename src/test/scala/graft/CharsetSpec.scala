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
}
