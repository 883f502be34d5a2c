package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def on(text: String) = Seq(text).toDF("t")

  test("splitSentences: boundaries, abbreviations, quotes, wraps") {
    def sents(t: String): Seq[String] =
      on(t).select(TextAnalysis.splitSentences(col("t")))
        .as[Seq[String]].head()
    assert(sents("First one. Second two! And third? Yes.") ==
      Seq("First one.", "Second two!", "And third?", "Yes."))
    // protected abbreviations do not split; their dots survive
    assert(sents("Dr. Smith met Mrs. Jones. They left.") ==
      Seq("Dr. Smith met Mrs. Jones.", "They left."))
    assert(sents("It was e.g. a test. Done.") ==
      Seq("It was e.g. a test.", "Done."))
    // closing quote after the terminator still bounds
    assert(sents("He said \"Stop.\" Then ran.") ==
      Seq("He said \"Stop.\"", "Then ran."))
    // lowercase continuation never splits (unlisted abbrev, safe side)
    assert(sents("the fig. was small and b. stayed whole") ==
      Seq("the fig. was small and b. stayed whole"))
    // a mid-sentence wrap stays inside; a wrap after a terminator bounds
    assert(sents("One part\nsame sentence. Next\nline. End") ==
      Seq("One part\nsame sentence.", "Next\nline.", "End"))
    assert(sents("") == Seq.empty)
    assert(sents("   ") == Seq.empty)
  }

  test("token counts: whitespace and regex pre-tokenizer") {
    val df = on("Hello, world 42!")
    assert(df.select(TextAnalysis.tokenCountWs(col("t"))).as[Int].head() == 3)
    // lower: "hello" "," "world" "42" "!"
    assert(df.select(TextAnalysis.tokenCountRegex(col("t"))).as[Int].head() == 5)
  }

  test("qualityFeatures: zero guards on empty text") {
    val feats = TextAnalysis.qualityFeatures(col("t"))
    val row = on("").select(feats.map { case (n, c) => c.as(n) }: _*).collect().head
    assert(row.getAs[Int]("n_chars") == 0 && row.getAs[Int]("n_words") == 0)
    assert(row.isNullAt(row.fieldIndex("avg_word_len")))
    assert(row.isNullAt(row.fieldIndex("stopword_ratio")))
    assert(row.isNullAt(row.fieldIndex("punct_ratio")))
  }

  test("qualityFeatures: ratios on a known sentence") {
    val feats = TextAnalysis.qualityFeatures(col("t"))
    val row = on("the cat sat").select(feats.map { case (n, c) => c.as(n) }: _*).collect().head
    assert(row.getAs[Int]("n_words") == 3)
    assert(math.abs(row.getAs[Double]("stopword_ratio") - 1.0 / 3) < 1e-12)
  }

  test("langId votes by stopword family with deterministic tiebreak") {
    assert(on("the cat of the hat").select(TextAnalysis.langId(col("t"))).as[String].head() == "en")
    assert(on("el gato de la casa").select(TextAnalysis.langId(col("t"))).as[String].head() == "es")
    assert(on("le chat et une souris").select(TextAnalysis.langId(col("t"))).as[String].head() == "fr")
    assert(on("xyzzy plugh").select(TextAnalysis.langId(col("t"))).as[String].head() == "und")
  }

  test("fingerprint is whitespace/case robust") {
    val a = on("Hello   World").select(TextAnalysis.fingerprint(col("t"))).as[String].head()
    val b = on("hello world ").select(TextAnalysis.fingerprint(col("t"))).as[String].head()
    assert(a == b)
  }

  test("tfIdf: ubiquitous terms score zero, rare terms ln(N/df)") {
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdf(docs, "doc_id", "text")
      .select("id", "term", "tf", "tfidf")
      .as[(Long, String, Long, Double)].collect()
      .map { case (i, t, f, s) => (i, t) -> ((f, s)) }.toMap
    assert(got((1L, "a"))._1 == 2L && got((1L, "a"))._2 == 0.0) // df=N => idf 0
    assert(got((2L, "a")) == ((1L, 0.0)))
    assert(got((1L, "b")) == ((1L, math.log(2.0))))
    assert(got((2L, "c")) == ((1L, math.log(2.0))))
  }

  test("topNgrams counts cross-doc bigrams; short docs yield no gram") {
    val docs = Seq((1L, "to be or not to be"), (2L, "to be"), (3L, "be"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.topNgrams(docs, "doc_id", "text", n = 2, k = 3)
      .as[(String, Long)].collect().toSeq
    // "to be" appears 3x: twice in doc 1 (positions 1 and 5), once in doc 2
    assert(got.head == ("to be", 3L))
    assert(got.map(_._1).contains("be or"))
  }

  test("rollingHash matches the reference fold and is order-sensitive") {
    def rh(s: String): Long =
      s.foldLeft(7L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
    val got = on("spark").select(TextAnalysis.rollingHash(col("t"))).as[Long].head()
    assert(got == rh("spark"))
    val ab = on("ab").select(TextAnalysis.rollingHash(col("t"))).as[Long].head()
    val ba = on("ba").select(TextAnalysis.rollingHash(col("t"))).as[Long].head()
    assert(ab != ba)
  }

  test("native rollingHash == HOF fold on ASCII, multibyte, and empty") {
    val samples = Seq("", "a", "spark", "the quick brown fox", "héllo wörld",
      "a b  c", "tab\tsep", "números 123 !?")
    val df = samples.toDF("t")
    val rows = df.select(
        TextAnalysis.rollingHash(col("t")).as("native"),
        TextAnalysis.rollingHashFold(col("t")).as("fold"))
      .as[(Long, Long)].collect()
    samples.zip(rows).foreach { case (s, (n, f)) =>
      assert(n == f, s"mismatch on ${s.take(20).mkString}: native=$n fold=$f")
    }
    // and still order-sensitive
    val Seq(ab, ba) = Seq("ab", "ba").toDF("t")
      .select(TextAnalysis.rollingHash(col("t"))).as[Long].collect().toSeq
    assert(ab != ba)
  }

  test("native token counts == HOF folds (whitespace edges, stopwords)") {
    val samples = Seq("", " ", "a", "  leading", "trailing  ", "a  b\t c",
      "The THE the of and", "héllo the wörld")
    val df = samples.toDF("t")
    val rows = df.select(
        TextAnalysis.tokenCountWs(col("t")).as("n_native"),
        TextAnalysis.tokenCountWsFold(col("t")).as("n_fold"),
        graft.expressions.TextHashExpressions
          .tokenCountIn(col("t"), TextAnalysis.StopwordsEnSet.mkString(","))
          .as("s_native"),
        TextAnalysis.countInFold(col("t"), TextAnalysis.StopwordsEnSet)
          .as("s_fold"))
      .as[(Int, Int, Int, Int)].collect()
    samples.zip(rows).foreach { case (s, (nn, nf, sn, sf)) =>
      assert(nn == nf && sn == sf,
        s"mismatch on '${s.take(20)}': ws $nn/$nf stop $sn/$sf")
    }
  }

  test("repetitionStats: duplicate-bigram and top-bigram fractions") {
    val df = Seq(
      (1L, "a b a b a"),   // bigrams: "a b","b a","a b","b a" -> 4 total, 2 distinct
      (2L, "w x y z"),     // 3 bigrams, all distinct
      (3L, "solo"),        // 1 token: no bigrams, NULL fractions
      (4L, "")             // empty: same
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = rows(0)
    assert(r1.getAs[Long]("n_bigrams") == 4 && r1.getAs[Long]("n_distinct_bigrams") == 2)
    assert(math.abs(r1.getAs[Double]("dup_bigram_frac") - 0.5) < 1e-12)
    assert(math.abs(r1.getAs[Double]("top_bigram_frac") - 0.5) < 1e-12)
    val r2 = rows(1)
    assert(r2.getAs[Long]("n_bigrams") == 3 && r2.getAs[Long]("n_distinct_bigrams") == 3)
    assert(r2.getAs[Double]("dup_bigram_frac") == 0.0)
    assert(math.abs(r2.getAs[Double]("top_bigram_frac") - 1.0 / 3) < 1e-12)
    Seq(rows(2), rows(3)).foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == 0)
      assert(r.isNullAt(r.fieldIndex("dup_bigram_frac")))
      assert(r.isNullAt(r.fieldIndex("top_bigram_frac")))
    }
  }

  test("redactPii: typed placeholders, URL consumes embedded email, text survives") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "server at 192.168.001.1 port open"),
      (3L, "call 555-123-4567 or 555 987 6543 today"),
      (4L, "see https://ex.example/u?mail=a@b.co&x=1 for info"),
      (5L, "no pii here just words"),
      (6L, "version 1.2.3 released"),  // 3-part dotted version: NOT an IP
      (7L, "go to HTTP://Caps.example/Q now")  // scheme case-insensitive
    ).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.redactPii(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "mail <EMAIL> now")
    assert(got(2L) == "server at <IP> port open")
    assert(got(3L) == "call <PHONE> or <PHONE> today")
    // the email inside the URL is consumed by <URL> wholesale (order rule)
    assert(got(4L) == "see <URL> for info")
    assert(got(5L) == "no pii here just words")
    assert(got(6L) == "version 1.2.3 released")
    assert(got(7L) == "go to <URL> now")
  }

  test("canonicalizeUrl: fragment, case, ports, tracking params, slashes") {
    val df = Seq(
      (1L, "HTTP://WWW.Example.COM:80/Path/To?utm_source=a&id=9&utm_x=b#frag"),
      (2L, "https://Site.com:443/"),
      (3L, "http://a.com:8080/x/"),            // non-default port survives
      (4L, "not a url"),                        // pass-through
      (5L, "http://b.com/p?fbclid=abc"),
      (6L, "HTTPS://X.Y/p?a=1&gclid=2&b=3"),   // mid-list removal repairs &
      (7L, "http://c.com/p?utm_a=1&utm_b=2")   // all params tracked -> none
    ).toDF("id", "url")
    val got = df.select(col("id"),
        TextAnalysis.canonicalizeUrl(col("url")).as("u"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "http://www.example.com/Path/To?id=9")
    assert(got(2L) == "https://site.com")
    assert(got(3L) == "http://a.com:8080/x")
    assert(got(4L) == "not a url")
    assert(got(5L) == "http://b.com/p")
    assert(got(6L) == "https://x.y/p?a=1&b=3")
    assert(got(7L) == "http://c.com/p")
  }

  test("filterByBlockedDomains: suffix semantics, ports/userinfo stripped, non-URLs kept") {
    val df = Seq(
      (1L, "https://spam.example/x"),          // exact block
      (2L, "https://a.b.spam.example/y"),      // subdomain of a blocked parent
      (3L, "http://notspam.example/z"),        // NOT a dot-suffix: kept
      (4L, "https://u:p@Tracker.NET:443/q"),   // userinfo+port+case stripped
      (5L, "plain text, no url"),              // kept: no domain
      (6L, "https://clean.org/ok")
    ).toDF("doc_id", "url")
    val bl = Seq("spam.example", "tracker.net").toDF("domain")
    val kept = TextAnalysis.filterByBlockedDomains(df, "doc_id", "url", bl)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L, 6L))
    // domainOf details
    val doms = df.select(col("doc_id"),
        TextAnalysis.domainOf(col("url")).as("d"))
      .as[(Long, String)].collect().toMap
    assert(doms(4L) == "tracker.net")
    assert(doms(5L) == "")
    intercept[IllegalArgumentException] {
      TextAnalysis.filterByBlockedDomains(df, "doc_id", "url",
        Seq(("a", "b")).toDF("x", "y"))
    }
  }

  test("normalizeText: accents stripped, case folded, whitespace collapsed") {
    val df = Seq(
      (1L, "Café  ÜBER naïve"),
      (2L, "cafe uber naive"),          // already-normal text is a fixpoint
      (3L, "señor"),         // DECOMPOSED n + combining tilde
      (4L, "señor"),                    // composed NFC form
      (5L, "  padded\ttabs\nand lines  "),
      (6L, "ø Ø keeps non-decomposable")  // no NFD decomposition for ø
    ).toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.normalizeText(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "cafe uber naive")
    assert(got(2L) == "cafe uber naive")
    assert(got(3L) == "senor")
    assert(got(4L) == "senor")          // composed == decomposed after NFD
    assert(got(5L) == "padded tabs and lines")
    assert(got(6L) == "ø ø keeps non-decomposable")
    // the point: accent/case/space variants now fingerprint identically
    val fps = df.filter(col("id").isin(1L, 2L))
      .select(TextAnalysis.fingerprint(TextAnalysis.normalizeText(col("text"))))
      .distinct().count()
    assert(fps == 1L)
  }

  test("property: canonicalizeUrl is idempotent on messy URLs and non-URLs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val urlGen = for {
      scheme <- Gen.oneOf("http://", "HTTP://", "https://", "HTTPS://", "")
      host   <- Gen.oneOf("Example.COM", "a.b.Example.org", "X.Y", "site.com")
      port   <- Gen.oneOf("", ":80", ":443", ":8080")
      path   <- Gen.oneOf("", "/Path/To", "/p", "/p/", "/")
      ps     <- Gen.listOfN(3, Gen.oneOf("utm_source=x", "utm_campaign=Y",
                  "fbclid=1", "gclid=2", "id=9", "a=1", "b=2", ""))
      frag   <- Gen.oneOf("", "#frag", "#a#b")
      junk   <- Gen.alphaStr
      pick   <- Gen.oneOf(true, true, true, false) // mostly URLs, some junk
    } yield if (pick) {
      val q = ps.filter(_.nonEmpty)
      scheme + host + port + path +
        (if (q.isEmpty) "" else "?" + q.mkString("&")) + frag
    } else junk
    val prop = Prop.forAll(Gen.listOfN(60, urlGen)) { urls =>
      val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("id", "url")
      val bad = df.select(col("id"), col("url"),
          TextAnalysis.canonicalizeUrl(col("url")).as("c1"),
          TextAnalysis.canonicalizeUrl(
            TextAnalysis.canonicalizeUrl(col("url"))).as("c2"))
        .filter(col("c1") =!= col("c2"))
        .as[(Long, String, String, String)].collect()
      bad.isEmpty :| s"non-idempotent: ${bad.take(3).mkString("; ")}"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("hashedTextVector: identical texts agree exactly; empty text null; guards") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "ALPHA  beta\tgamma delta"), // case/whitespace variants agree
      (3L, "totally different words appear here now"),
      (4L, "   ")).toDF("id", "text")
    val v = df.select(col("id"),
        TextAnalysis.hashedTextVector(col("text"), 32).as("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    assert(v(1L) != null && v(1L).length == 32)
    assert(v(1L) == v(2L))       // same token stream => same vector
    assert(v(1L) != v(3L))
    assert(v(4L) == null)        // nothing to vectorize
    // mass bound: 4 unigrams + 3 bigrams = 7 signed increments
    assert(v(1L).map(math.abs).sum <= 7)
    intercept[IllegalArgumentException] {
      TextAnalysis.hashedTextVector(col("text"), 0)
    }
    // the sparse portable twin sums the same gram count (signs aside):
    // per-doc Σ|v| over buckets ≤ grams, and doc 4 contributes no rows
    val sp = TextAnalysis.signedHashedFeaturesPortable(df, "id", "text", 32)
    assert(sp.filter(col("doc_id") === 4L).count() == 0)
    val mass = sp.filter(col("doc_id") === 1L)
      .agg(sum(abs(col("v")))).as[Long].head()
    assert(mass <= 7L, mass.toString)
  }

  test("gopherRules: each named rule fires on its own violation; clean doc passes") {
    import graft.operators.TextAnalysis
    val clean = ("the quick brown fox jumps over that lazy dog with style " * 6).trim
    val docs = Seq(
      1L -> clean,                                    // all rules pass
      2L -> "the and of",                             // too few words
      3L -> (Seq.fill(60)("a b") :+ "the of").mkString(" "), // avg word len < 3
      4L -> (clean + " " + Seq.fill(8)("#").mkString(" ")),  // symbol ratio > 0.1
      5L -> (Seq.fill(10)("• bullet line of the list")
        .mkString("\n")),                             // 100% bullet lines
      6L -> (Seq.fill(10)("the line trails off ...")
        .mkString("\n")),                             // 100% ellipsis lines
      7L -> (clean + " " + Seq.fill(20)("12345").mkString(" ")), // alpha < 80%
      8L -> ("zzz qqq " * 30).trim                    // no gopher stopwords
    ).toDF("doc_id", "text")
    val feats = TextAnalysis.gopherRules(col("text"))
    val got = docs.select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) ->
        feats.map(_._1).zipWithIndex.collect {
          case (n, i) if n.startsWith("r_") && !r.getBoolean(i + 1) => n
        }.toSet).toMap
    assert(got(1L) == Set.empty, got(1L).toString)
    assert(got(2L).contains("r_word_count"))
    assert(got(3L).contains("r_avg_word_len"))
    assert(got(4L).contains("r_symbol_ratio"))
    assert(got(5L).contains("r_bullet_lines"))
    assert(got(6L).contains("r_ellipsis_lines"))
    assert(got(7L).contains("r_alpha_words"))
    assert(got(8L).contains("r_stopwords"))
    // the filter form keeps exactly the all-pass docs
    val kept = TextAnalysis.filterByGopherRules(docs, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), kept.toString)
  }

  test("blockedTermStats: Aho-Corasick all-occurrence substring semantics") {
    import graft.operators.TextAnalysis
    val terms = Seq("aa", "spam", "spam phrase", "casino")
    def statsOf(text: String): (Long, Seq[Int]) = {
      val feats = TextAnalysis.blockedTermStats(col("t"), terms)
      val row = on(text)
        .select(feats.head._2.as("n"), feats(1)._2.as("ids")).collect().head
      (row.getLong(0), row.getSeq[Int](1))
    }
    // overlapping occurrences both count: "aa" at offsets 0 and 1
    assert(statsOf("aaa") == ((2L, Seq(0))))
    // nested patterns both fire via the dict chain; matching is
    // case-insensitive on both sides
    assert(statsOf("a SPAM phrase here") == ((2L, Seq(1, 2))))
    // disjoint hits accumulate; ids are distinct ascending
    assert(statsOf("casino aa casino") == ((3L, Seq(0, 3))))
    assert(statsOf("clean text") == ((0L, Seq())))
    // phrase terms match across word boundaries as substrings
    assert(statsOf("xcasinoy")._1 == 1L)
    // the C4 page filter keeps exactly the hit-free docs
    val docs = Seq(1L -> "all clean here", 2L -> "late night casino run")
      .toDF("doc_id", "text")
    val kept = TextAnalysis.filterByBlockedTerms(docs, "text", terms)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), kept.toString)
    // degenerate inputs are rejected loudly
    intercept[IllegalArgumentException] {
      TextAnalysis.blockedTermStats(col("t"), Seq("ok", ""))
    }
  }

  test("c4Rules: line-level terminal/min-words/javascript rules + page gates") {
    import graft.operators.TextAnalysis
    val l1 = "this line has five words."
    val l2 = "another line with five words!"
    val l3 = "she said the word \"hello\""
    val pass = Seq(l1, l2, l3).mkString("\n")
    val docs = Seq(
      1L -> pass,
      2L -> Seq(l1, "no terminal punctuation here", "short.",
        "you must enable JavaScript to continue.").mkString("\n"),
      3L -> (pass + "\nlorem ipsum dolor sit amet."),
      4L -> (pass + "\nif (x) { return y; }"),
      5L -> ("\n\n  \n" + pass + "\n")
    ).toDF("doc_id", "text")
    val feats = TextAnalysis.c4Rules(col("text"))
    val got = docs.select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_kept_lines") == 3)
    assert(got(1L).getAs[Boolean]("r_min_sentences"))
    // doc 2: only l1 survives — no-terminal, <5-words, and javascript
    // lines each die to their own rule (case-insensitive match)
    assert(got(2L).getAs[Long]("n_lines") == 4)
    assert(got(2L).getAs[Long]("n_kept_lines") == 1)
    assert(!got(2L).getAs[Boolean]("r_min_sentences"))
    assert(!got(3L).getAs[Boolean]("r_no_lorem"))
    assert(!got(4L).getAs[Boolean]("r_no_brace"))
    // blank-after-trim lines are formatting, not sentences
    assert(got(5L).getAs[Long]("n_lines") == 3)
    assert(got(5L).getAs[Long]("n_kept_lines") == 3)
    assert(got(1L).getAs[Long]("cleaned_chars") == pass.length)
    // the transformation form: pages failing any page rule are dropped,
    // survivors carry the line-cleaned text
    val kept = TextAnalysis.filterByC4(docs, "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(kept.keySet == Set(1L, 5L), kept.keySet.toString)
    assert(kept(1L) == pass && kept(5L) == pass)
  }

  test("native gopher/c4 forms equal the column-form specification") {
    // The one-pass natives behind filterByGopherRules / filterByC4
    // (BENCH_NOTES_r12) must match the oracled column forms EXACTLY —
    // crafted boundary docs plus seeded-random corpora over an alphabet
    // rich in rule-relevant characters (whitespace variants, newlines,
    // bullets, ellipses, #, braces, quotes, mixed case, non-ASCII).
    val clean = ("the quick brown fox jumps over that lazy dog with style " * 6).trim
    val crafted = Seq(
      clean,
      "", "   ", "\n\n\n",
      "the and of",
      ("abc " * 50).trim,                   // avg word len exactly 3.0
      ("abcdefghij " * 50).trim,            // exactly 10.0
      (clean + " " + Seq.fill(8)("#").mkString(" ")),
      "\t• tab-padded bullet of the line\n  • spaced bullet of it",
      Seq.fill(10)("the line trails off…").mkString("\n"),
      Seq.fill(10)(" - spaced bullet line of the list ").mkString("\n"),
      "THE BE TO OF AND THAT HAVE WITH " * 10, // case-folded stopwords
      ("été café 中文 " * 30).trim, // non-ASCII words
      "this line has five words.\nanother line with five words!\n" +
        "she said the word \"hello\"",
      "lorem IPSUM dolor.", "code { brace }",
      "\tplease Enable JAVASCRIPT now ok.\nreal line with five words." +
        "\nmore real words in a line.\nthird real line of words here.",
      "one two three four five\n" + ("six words in this line here. " * 3) +
        "\nend of the line here."
    )
    val rng = new scala.util.Random(42)
    val alphabet = "abcdef THE the of and that with…#•{}\"!?.-* \t\né"
    val random = (1 to 60).map(_ =>
      (1 to (1 + rng.nextInt(120))).map(_ =>
        alphabet(rng.nextInt(alphabet.length))).mkString)
    val docs = (crafted ++ random).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // gopher: native pass == column conjunction, row for row
    val g = docs.select(col("doc_id"),
        graft.expressions.TextHashExpressions.gopherPass(col("text")).as("nat"),
        TextAnalysis.gopherPassColumns(col("text")).as("spec"))
      .collect()
    g.foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2),
        s"gopher parity broke on doc ${r.getLong(0)}")
    }
    // gopher: native counts == the column-form count expressions
    val feats = TextAnalysis.gopherRules(col("text"))
    val nWordsSpec = feats.collect { case ("n_words", c) => c }.head
    val cmp = docs.select(
        graft.expressions.TextHashExpressions.gopherCounts(col("text"))
          .getItem(0).as("nat"), nWordsSpec.as("spec"))
      .filter(col("nat") =!= col("spec")).count()
    assert(cmp == 0L, "native n_words diverged from the column form")
    // langId: native one-pass vote == the when-chain cascade (ties and
    // und included — the crafted set has all-zero, en==es, and es==fr
    // tie docs via the shared 'de'/'la'/'un' Spanish-French stopwords)
    val l = docs.select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("nat"),
        TextAnalysis.langIdColumns(col("text")).as("spec"))
      .collect()
    l.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"langId parity broke on doc ${r.getLong(0)}")
    }
    // incl. the NULL-text row: the cascade's conditions all evaluate
    // NULL -> false and fall through to otherwise('fr') — the native's
    // coalesce fallback must replicate it (code-review r12)
    val ties = Seq(700L -> "la de un y", 701L -> "le la de phrase",
        702L -> "xyz qqq", 703L -> "the el le",
        704L -> (null: String))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("nat"),
        TextAnalysis.langIdColumns(col("text")).as("spec"))
      .collect()
    ties.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"langId tie parity broke on doc ${r.getLong(0)}")
    }
    // c4: native cleaned-or-null == column pass + rewrite, value for value
    val passCol = TextAnalysis.c4Rules(col("text")).collect {
      case (n, c) if n.startsWith("r_") => c
    }.reduce(_ && _)
    val c = docs.select(col("doc_id"),
        graft.expressions.TextHashExpressions.c4Clean(col("text")).as("nat"),
        when(passCol, TextAnalysis.c4CleanedText(col("text"))).as("spec"))
      .collect()
    c.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2) &&
        (r.isNullAt(1) || r.getString(1) == r.getString(2)),
        s"c4 parity broke on doc ${r.getLong(0)}: " +
          s"${Option(r.getString(1))} vs ${Option(r.getString(2))}")
    }
  }

  test("native html extraction equals the column form on crafted edges") {
    val crafted = Seq(
      "", "plain text with no markup at all but the words of a block " +
        "that is long enough to clear all of the rules and the floor.",
      // invisible content, incl. the unclosed-script leak
      "<script>var x;</script><p>" + ("the words of the page here " * 6) +
        "and it was done.</p>",
      "<script src=\"x\">junk</script><style>a{}</style><p>" +
        ("some of the text " * 8) + "ended.</p>",
      "<script>leaks <p>because unclosed " + ("the of and to " * 10),
      "<!-- a comment <p>gone</p> --><div>" + ("all of the words " * 8) +
        "stop.</div>",
      "<!-- unterminated comment <p>" + ("the of and " * 10),
      // nested inline + anchors + entities
      "<div><b>Bold</b> and <a href=\"/x\">a link</a> inside " +
        ("the usual words of the block " * 6) + "&amp; more &lt;here&gt;." +
        "</div>",
      "<div class=\"nav\"><a href=\"/a\">Home</a> <a href=\"/b\">About" +
        "</a></div>",
      // unmatched '<', tag-soup, self-closing boundaries, case
      "odd < dangling and été café " +
        ("with all of those words there " * 6) + "done.",
      "<P>" + ("upper case tag with the words " * 6) + "end.</P>",
      "<br/><hr />text after breaks " + ("of the and that " * 8) + "fin.",
      "<pre>" + ("preformatted words of the thing " * 6) + "x.</pre>",
      "<px>not a boundary " + ("but all of the words count " * 6) +
        "done.</px>",
      "<a<b> weird <a href=\"u\">anchor &amp; text</a> " +
        ("the rest of the words of it " * 6) + "end.",
      "<a href=\"unclosed\">no close anchor " + ("the of and with " * 8),
      "line one\nline two with " + ("the words of the line " * 6) + "end.",
      "&amp;lt; double decode edge " + ("the of and that have " * 7) + "x.")
    val docs = crafted.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "t")
    val rows = docs.select(col("doc_id"),
        graft.expressions.TextHashExpressions.htmlExtractNative(
          col("t"), 70, 0.2, 0.2).as("nat"),
        TextAnalysis.extractMainContent(col("t")).as("spec"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"html native parity broke on doc ${r.getLong(0)}:\n" +
          s"nat=${r.getString(1)}\nspec=${r.getString(2)}")
    }
  }

  test("property: native html extraction == column form on random tag soup (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    // random fragments: text runs (with stopwords + entities), open and
    // close tags (block, inline, anchor, invisible), comments, strays —
    // concatenated into pages the two implementations must agree on
    // accented STOPWORDS included (r15): keep decisions that hinge on
    // accented function words must agree between the three tokenizers
    // (Java class / native lookup / — for the oracled queries — RE2)
    val word = Gen.oneOf("the", "of", "and", "words", "page", "café",
      "não", "é", "más", "está", "über", "für", "où", "già", "словo",
      "x1", "B", "&amp;", "&lt;", "&nbsp;", "3×4", "a÷b")
    val textRun = Gen.choose(1, 12).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ") + " "))
    val frag = Gen.frequency(
      6 -> textRun,
      2 -> Gen.oneOf("<p>", "</p>", "<div class=\"c\">", "</div>", "<h2>",
        "</h2>", "<li>", "<br/>", "<hr />", "<P >"),
      2 -> Gen.oneOf("<b>", "</b>", "<span x=\"y\">", "</span>", "<px>",
        "</px>"),
      2 -> Gen.oneOf("<a href=\"/u\">", "</a>", "<A>", "<a>"),
      1 -> Gen.oneOf("<script>", "</script>", "<style>", "</style>",
        "<!--", "-->", "<noscript>", "</noscript>"),
      1 -> Gen.oneOf("<", ">", "\n", "\t", "  ", "< ", "<1>"))
    val page = Gen.choose(1, 40).flatMap(k =>
      Gen.listOfN(k, frag).map(_.mkString))
    val langs = Seq("en", "es", "pt", "de", "fr", "it", "xx")
    val prop = Prop.forAll(Gen.listOfN(12, page)) { pages =>
      val docs = pages.zipWithIndex.map { case (t, i) =>
          (i.toLong, t, langs(i % langs.length)) }
        .toDF("doc_id", "t", "lang")
      val rows = docs.select(col("doc_id"),
          graft.expressions.TextHashExpressions.htmlExtractNative(
            col("t"), 30, 0.3, 0.1).as("nat"),
          TextAnalysis.extractMainContent(col("t"), 30, 0.3, 0.1)
            .as("spec"),
          graft.expressions.TextHashExpressions.htmlExtractNativeLang(
            col("t"), col("lang"), 30, 0.3, 0.1).as("nat_lang"),
          TextAnalysis.extractMainContentByLang(col("t"), col("lang"),
            30, 0.3, 0.1).as("spec_lang"))
        .collect()
      val bad = rows.find(r => r.getString(1) != r.getString(2) ||
        r.getString(3) != r.getString(4))
      bad.isEmpty :| bad.map(r =>
        s"doc=${r.getLong(0)} page=${pages(r.getLong(0).toInt)}\n" +
          s"nat=${r.getString(1)}\nspec=${r.getString(2)}\n" +
          s"nat_lang=${r.getString(3)}\nspec_lang=${r.getString(4)}")
        .getOrElse("")
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("compressionRatio: loops compress hard, noise barely, empty is null") {
    val rng = new scala.util.Random(7)
    val noise = (1 to 400).map(_ => rng.nextPrintableChar()).mkString
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders into a meadow where several unrelated sentences follow " +
      "each describing different events in moderately varied vocabulary " +
      "to resemble ordinary natural language paragraphs of web text"
    val loop = Seq.fill(40)("click here to subscribe now").mkString(" ")
    val rows = Seq((1L, loop), (2L, prose), (3L, noise), (4L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.compressionRatio(col("text")).as("r"))
      .as[(Long, Option[Double])].collect().toMap
    assert(rows(4L).isEmpty) // empty text: no evidence
    val (rl, rp, rn) = (rows(1L).get, rows(2L).get, rows(3L).get)
    assert(rl < rp && rp < rn, s"loop=$rl prose=$rp noise=$rn")
    assert(rl < 0.2 && rn > 0.8, s"loop=$rl noise=$rn")
    assert(rows.values.flatten.forall(r => r > 0 && r <= 1.1))
    // determinism (thread-local deflater reset per call)
    val again = Seq((1L, loop)).toDF("doc_id", "text")
      .select(TextAnalysis.compressionRatio(col("text"))).as[Double].head()
    assert(again == rl)
    // the band filter drops both pathologies, keeps prose (printable-
    // ASCII noise only reaches ~0.87 — ~6.6 of 8 bits/char entropy —
    // so the test band tightens maxRatio; true binary junk sits ~1.0
    // and the 0.9 default catches it)
    // r12: the filter is a single-deflate banded predicate (the old
    // three-conjunct form ran deflate up to 3× per row, ADVICE r11);
    // NULL text must drop like empty text does
    val kept = TextAnalysis.filterByCompressionRatio(
        Seq((1L, loop), (2L, prose), (3L, noise), (4L, ""),
          (5L, null.asInstanceOf[String]))
          .toDF("doc_id", "text"), "text", maxRatio = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), kept.toString)
    intercept[IllegalArgumentException] {
      TextAnalysis.filterByCompressionRatio(
        Seq((1L, "x")).toDF("doc_id", "text"), "text",
        minRatio = 0.5, maxRatio = 0.4)
    }
  }

  test("htmlToBlocks: segmentation, invisible content, nested inline tags") {
    val html =
      "<html><head><title>My Page</title>" +
        "<style>body { color: red; }</style>" +
        "<script type=\"text/javascript\">var x = 1; if (x < 2) go();</script>" +
        "</head><body>" +
        "<!-- a comment with <p>fake tags</p> inside -->" +
        "<h1>The Heading</h1>" +
        "<p>First paragraph with <b>bold</b> and <i>nested <u>deep</u></i> text.</p>" +
        "<ul><li>item one</li><li>item two</li></ul>" +
        "<div>Line a<br/>Line b</div>" +
        "</body></html>"
    val blocks = Seq(Tuple1(html)).toDF("h")
      .select(transform(TextAnalysis.htmlToBlocks(col("h")),
        b => trim(regexp_replace(
          TextAnalysis.decodeHtmlEntities(regexp_replace(b, "<[^>]*>", "")),
          "\\s+", " "))).as("t"))
      .as[Seq[String]].head()
    assert(blocks == Seq("My Page", "The Heading",
      "First paragraph with bold and nested deep text.",
      "item one", "item two", "Line a", "Line b"),
      blocks.mkString("|"))
  }

  test("decodeHtmlEntities: amp-last ordering and the &amp;lt; edge") {
    val got = Seq(Tuple1(
      "Fish &amp; chips, 1 &lt; 2 &gt; 0, &quot;q&quot; &#39;a&#39; " +
        "&apos;b&apos;, x&nbsp;y, literal &amp;lt; stays")).toDF("t")
      .select(TextAnalysis.decodeHtmlEntities(col("t"))).as[String].head()
    // &amp;lt; is the literal text "&lt;" — decoding &amp; first would
    // double-decode it into "<"
    assert(got == "Fish & chips, 1 < 2 > 0, \"q\" 'a' 'b', x y, " +
      "literal &lt; stays", got)
  }

  test("htmlBlockFeatures: link density kills nav/footer, stopword density kills salad") {
    val html =
      "<body>" +
        "<nav><ul><li><a href=\"/\">Home</a></li>" +
        "<li><a href=\"/about\">About our whole company here</a></li></ul></nav>" +
        "<p>It was a calm day and the people of the town were out in the " +
        "streets, and all of them had something they would do before the " +
        "evening came to the houses.</p>" +
        "<p>keyword keyword keyword keyword keyword keyword keyword " +
        "keyword keyword keyword keyword keyword keyword keyword keyword " +
        "keyword keyword keyword keyword keyword</p>" +
        "<footer><a href=\"/privacy\">Privacy policy</a> | " +
        "<a href=\"/terms\">All the terms that we have of use</a></footer>" +
        "</body>"
    val feats = Seq(Tuple1(html)).toDF("h")
      .select(explode(TextAnalysis.htmlBlockFeatures(col("h"),
        minChars = 40)).as("f"))
      .select("f.block_text", "f.keep", "f.link_chars", "f.n_raw_chars")
      .as[(String, Boolean, Long, Long)].collect()
    val kept = feats.filter(_._2).map(_._1)
    assert(kept.length == 1 && kept.head.startsWith("It was a calm day"),
      feats.mkString("\n"))
    // the all-link footer block: every visible char inside <a> except
    // the separator
    val footer = feats.find(_._1.contains("Privacy policy")).get
    assert(footer._3 > 0 && footer._3 <= footer._4 && !footer._2, footer)
    // the keyword-salad block fails stopword density despite length
    val salad = feats.find(_._1.startsWith("keyword")).get
    assert(!salad._2, salad)
  }

  test("multilingual jusText: right list keeps, English list kills, fallback") {
    // r14 (VERDICT r13 §next-2): a Spanish content block is function-
    // word-dense under the Spanish list but nearly stopword-free under
    // the English one; unknown languages fall back to English.
    val esPage = "<body><p>El texto de la pagina era uno de los que la " +
      "gente de la casa iba a leer en el dia, con las palabras de " +
      "todos los dias y por eso era el contenido de la pagina.</p></body>"
    val enPage = "<body><p>It was a calm day and the people of the town " +
      "were out in the streets, and all of them had something they " +
      "would do before the evening came to the houses.</p></body>"
    def kept(html: String, lang: String): Long =
      Seq((html, lang)).toDF("h", "lang")
        .select(size(filter(
          TextAnalysis.htmlBlockFeaturesByLang(col("h"), col("lang")),
          f => f.getField("keep"))).cast("long")).as[Long].head()
    assert(kept(esPage, "es") == 1L, "es page must survive the es list")
    assert(kept(esPage, "en") == 0L, "es page must die under the en list")
    assert(kept(esPage, "ES") == 1L, "language match is case-insensitive")
    assert(kept(enPage, "en") == 1L)
    assert(kept(enPage, "xx") == 1L, "unknown lang falls back to English")
    // NULL lang falls back to English too (CASE otherwise-branch)
    val nullLang = Seq(Tuple1(enPage)).toDF("h")
      .select(size(filter(TextAnalysis.htmlBlockFeaturesByLang(col("h"),
        lit(null).cast("string")), f => f.getField("keep"))).cast("long"))
      .as[Long].head()
    assert(nullLang == 1L)
  }

  test("native lang extraction == column form across languages and soup") {
    // the htmlExtractNative parity contract extended to the language-
    // keyed pair: same pages, every language key (known, unknown-
    // fallback, NULL), native == column form byte-for-byte
    val esText = "El texto de la pagina era uno de los que la gente de " +
      "la casa iba a leer en el dia con las palabras de todos los dias."
    val pages = Seq(
      "<body><p>" + esText + "</p><div class=\"nav\"><a href=\"/a\">" +
        "Inicio</a></div></body>",
      "<p>" + ("the usual words of the page " * 6) + "end.</p>",
      "<div>" + esText + "</div><script>var x = 1;</script>",
      "<p>short</p>")
    val langs = Seq("es", "en", "de", "xx", null)
    val docs = for {
      (p, i) <- pages.zipWithIndex
      (lg, j) <- langs.zipWithIndex
    } yield ((i * 10 + j).toLong, p, lg)
    val rows = docs.toDF("doc_id", "t", "lang")
      .select(col("doc_id"),
        graft.expressions.TextHashExpressions.htmlExtractNativeLang(
          col("t"), col("lang"), 70, 0.2, 0.2).as("nat"),
        TextAnalysis.extractMainContentByLang(col("t"), col("lang"))
          .as("spec"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"lang-native parity broke on doc ${r.getLong(0)}:\n" +
          s"nat=${r.getString(1)}\nspec=${r.getString(2)}")
    }
    // and the production entry point keeps the es page under es only
    val byLang = TextAnalysis.extractHtmlDfByLang(
        Seq((1L, pages.head, "es"), (2L, pages.head, "en"))
          .toDF("doc_id", "text", "lang"), "text", "lang")
      .select("doc_id").as[Long].collect().toSet
    assert(byLang == Set(1L), byLang.toString)
  }

  test("script-routed extraction: Cyrillic/Greek stopwords decide " +
      "survival, CJK blocks take the link-density fallback, " +
      "native == column across scripts and soup") {
    // r16 (VERDICT r15 §next-3): under the r15 Latin-only tokenizer a
    // Russian paragraph had ZERO words (density 0 → dead); now Cyrillic
    // and Greek tokenize and their lists decide. CJK has no cheap
    // segmentation — the ROUTED rule waives the density clause for
    // CJK-dominant blocks.
    val ruText = "в доме было тихо и тепло когда мы пришли с реки и " +
      "все сидели у окна а потом пили чай с медом и хлебом и говорили " +
      "о том как было летом в деревне у бабушки за лесом."
    val elText = "το σπίτι ήταν παλιό και η αυλή με τα δέντρα ήταν " +
      "πολύ μεγάλη και όλοι οι γείτονες έρχονταν εδώ το βράδυ για να " +
      "δουν τη θάλασσα από την πέτρα στην άκρη του δρόμου."
    val zhText = "这个地方的历史可以追溯到很多年以前那时候这里还是一个" +
      "小村庄人们在田里种地在河边打鱼生活虽然简单但是大家都很满足后来" +
      "城市慢慢发展起来道路变宽了房子变高了但是老人们还记得从前的样子。"
    def page(t: String) = "<body><p>" + t + "</p><div class=\"nav\">" +
      "<a href=\"/a\">More links here</a></div></body>"
    def keptRouted(p: String, lg: String): Long =
      Seq(Tuple1(p)).toDF("h")
        .select(size(filter(TextAnalysis.htmlBlockFeaturesRouted(col("h"),
          lit(lg)), f => f.getField("keep"))).cast("long")).as[Long].head()
    def keptPlain(p: String, lg: String): Long =
      Seq(Tuple1(p)).toDF("h")
        .select(size(filter(TextAnalysis.htmlBlockFeaturesByLang(col("h"),
          lit(lg)), f => f.getField("keep"))).cast("long")).as[Long].head()
    // Cyrillic: the ru list decides; English list kills; routing is a
    // no-op for alphabetic scripts (routed == plain)
    assert(keptRouted(page(ruText), "ru") == 1L)
    assert(keptPlain(page(ruText), "ru") == 1L)
    assert(keptPlain(page(ruText), "en") == 0L,
      "a Cyrillic page must DIE under the English list — survival is " +
        "decided by the Cyrillic stopwords")
    // Greek likewise
    assert(keptRouted(page(elText), "el") == 1L)
    assert(keptPlain(page(elText), "el") == 1L)
    assert(keptPlain(page(elText), "en") == 0L)
    // CJK: zero tokenizable words -> the plain rule is structurally
    // unable to keep it; the routed fallback keeps it on length + link
    // density alone
    assert(keptPlain(page(zhText), "zh") == 0L,
      "CJK under the density rule must die (no segmentation)")
    assert(keptRouted(page(zhText), "zh") == 1L,
      "CJK must survive via the link-density-only fallback")
    // ...and the fallback still kills link-dense CJK boilerplate
    val zhNav = "<div><a href=\"/a\">" + zhText.take(40) + "</a>" +
      zhText.take(30) + "</div>"
    assert(keptRouted(zhNav, "zh") == 0L,
      "link-dense CJK boilerplate must still die under the fallback")
    // routing is PER BLOCK: a page mixing a Latin paragraph (judged by
    // density) and a CJK paragraph (fallback) keeps both
    val mixed = "<body><p>" +
      ("the usual words of the page " * 6) + "end.</p><p>" + zhText +
      "</p></body>"
    assert(keptRouted(mixed, "en") == 2L, "mixed-script page: both blocks")
    // native one-pass == column form across scripts, languages, soup
    val pages = Seq(page(ruText), page(elText), page(zhText), mixed,
      "<div>" + ruText + "</div><script>var x = 1;</script>",
      "<p>short</p>", "<p>" + zhText.take(20) + "</p>")
    val langs = Seq("ru", "el", "zh", "en", "xx", null)
    val docs = for {
      (p, i) <- pages.zipWithIndex
      (lg, j) <- langs.zipWithIndex
    } yield ((i * 10 + j).toLong, p, lg)
    val rows = docs.toDF("doc_id", "t", "lang")
      .select(col("doc_id"),
        graft.expressions.TextHashExpressions.htmlExtractNativeRouted(
          col("t"), col("lang"), 70, 0.2, 0.2).as("nat"),
        TextAnalysis.extractMainContentRouted(col("t"), col("lang"))
          .as("spec"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"routed-native parity broke on doc ${r.getLong(0)}:\n" +
          s"nat=${r.getString(1)}\nspec=${r.getString(2)}")
    }
    // the recipe stage keeps the right rows
    val routed = TextAnalysis.extractHtmlDfRouted(
        Seq((1L, page(ruText), "ru"), (2L, page(ruText), "en"),
          (3L, page(zhText), "zh")).toDF("doc_id", "text", "lang"),
        "text", "lang")
      .select("doc_id").as[Long].collect().toSet
    assert(routed == Set(1L, 3L), routed.toString)
    // late r16: Arabic and Hebrew (space-delimited RTL — density rule
    // under their lists, the tokenizer covers their letters now), Thai
    // (space-free — the fallback route like CJK)
    val arText = "كان البيت قديما في وسط المدينة وكان كل من في الحي " +
      "يعرف هذا المكان لأن الناس كانوا يأتون إليه من كل جهة في الصباح " +
      "وفي المساء مع الأولاد بعد يوم طويل."
    val heText = "הבית היה ישן מאוד אבל כל מי שגר שם אהב את המקום כי " +
      "היה בו אור רב וגם גינה קטנה עם עצים ורק מעט רעש מן הרחוב של " +
      "העיר הגדולה שמעבר לחומה."
    val thText = "บ้านหลังนี้อยู่ริมแม่น้ำมานานหลายปีผู้คนในหมู่บ้านมักมาพบกัน" +
      "ที่นี่ในตอนเย็นเพื่อพูดคุยและพักผ่อนหลังจากทำงานมาทั้งวันเด็กๆวิ่งเล่น" +
      "อยู่ริมน้ำจนพระอาทิตย์ตกดิน."
    assert(keptRouted(page(arText), "ar") == 1L)
    assert(keptPlain(page(arText), "ar") == 1L)
    assert(keptPlain(page(arText), "en") == 0L,
      "an Arabic page must DIE under the English list")
    assert(keptRouted(page(heText), "he") == 1L)
    assert(keptPlain(page(heText), "he") == 1L)
    assert(keptPlain(page(heText), "en") == 0L)
    assert(keptPlain(page(thText), "th") == 0L,
      "Thai under the density rule must die (no inter-word spaces)")
    assert(keptRouted(page(thText), "th") == 1L,
      "Thai must survive via the segmentation-free fallback")
    // native parity across the new scripts too
    val rows2 = Seq((100L, page(arText), "ar"), (101L, page(heText), "he"),
        (102L, page(thText), "th"), (103L, page(arText), "en"))
      .toDF("doc_id", "t", "lang")
      .select(col("doc_id"),
        graft.expressions.TextHashExpressions.htmlExtractNativeRouted(
          col("t"), col("lang"), 70, 0.2, 0.2).as("nat"),
        TextAnalysis.extractMainContentRouted(col("t"), col("lang"))
          .as("spec"))
      .collect()
    rows2.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"routed-native parity broke on doc ${r.getLong(0)}")
    }
    // late r17 (ADVICE r16): Korean takes the DENSITY path now — hangul
    // eojeol tokenize as words and hangul-majority blocks score against
    // the ko list BY SCRIPT, whatever the lang column says
    val koText = "이 집은 강가에 오래 서 있었다 그리고 마을 사람들은 " +
      "저녁 때 이곳에 모여 함께 이야기를 나누는 것을 좋아했다 아이들은 " +
      "해가 질 때 까지 강가에서 뛰어 놀았다 모든 날들이 같은 모습으로 " +
      "흘러 갔다"
    assert(keptRouted(page(koText), "xx") == 1L,
      "a Korean page must survive on ko-list density even with an " +
        "unknown lang column — hangul IS the language evidence")
    assert(keptRouted(page(koText), "ko") == 1L)
    assert(keptPlain(page(koText), "xx") == 0L,
      "the lang-keyed plain rule (English fallback) cannot keep it")
    // Korean boilerplate now actually DIES: a hangul noun pile with no
    // function words fails the density rule instead of riding the old
    // segmentation-free waiver
    val koNouns = "<p>" + ("강가 마을 시장 과일 채소 저녁 아침 하루 " +
      "아이 집 해 강 물건 가족 사람 날 모습 풍경 인사 이야기 " * 3) + "</p>"
    assert(keptRouted("<body>" + koNouns + "</body>", "xx") == 0L,
      "a Korean noun pile (zero function words) must die under the " +
        "density rule it now takes")
    // native parity on the Korean cases, both lang values
    val rows3 = Seq((200L, page(koText), "xx"), (201L, page(koText), "ko"),
        (202L, "<body>" + koNouns + "</body>", "xx"))
      .toDF("doc_id", "t", "lang")
      .select(col("doc_id"),
        graft.expressions.TextHashExpressions.htmlExtractNativeRouted(
          col("t"), col("lang"), 70, 0.2, 0.2).as("nat"),
        TextAnalysis.extractMainContentRouted(col("t"), col("lang"))
          .as("spec"))
      .collect()
    rows3.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"routed-native parity broke on doc ${r.getLong(0)}:\n" +
          s"nat=${r.getString(1)}\nspec=${r.getString(2)}")
    }
  }

  test("two-phase jusText: context-free four-way classes, then " +
      "neighbor revision — shorts join good zones, neargood needs a " +
      "good anchor, boilerplate zones stay dead") {
    // late r16 (Pomikálek 2011, the thesis' two thresholds + revision):
    // an engineered page where phase 2 CHANGES outcomes in both
    // directions.
    val nav = "<div class=\"nav\"><ul><li><a href=\"/a\">Home page link" +
      "</a></li><li><a href=\"/b\">Another link here</a></li></ul></div>"
    val h1 = "<h1>a short headline</h1>"                  // short, mixed edge -> bad
    val goodA = "<p>it was the house that all of them had known from " +
      "the days when they were young and it was there that we would go " +
      "in the evening to talk of all that had been and of all that " +
      "would be in the years that were still to come to us all.</p>"
    val caption = "<p>a stone bridge at dawn</p>"         // short, good/good -> good
    val goodB = "<p>and it was in that house that the best of those " +
      "days would come back to them all as if they had never gone " +
      "away at all and there was not one of them who did not know " +
      "that this was the reason they would all return every year.</p>"
    val nearGood = "<p>and it was there that they would sit with all " +
      "of them in the evening light.</p>"                 // neargood, prev good -> good
    val badP = "<p>granite towers marble fountains copper roofs " +
      "cobbled lanes ancient bridges walled gardens stone cloisters " +
      "painted chapels quiet courtyards narrow stairways weathered " +
      "statues</p>"                                       // long, 0 stops -> bad
    val nearGood2 = "<p>but it was not the same for any of them after " +
      "all of that had gone away from here.</p>"          // neargood, bad/edge -> bad
    val tail0 = "<p>the end of the story</p>"             // short, bad/edge -> bad
    val page = "<html><body>" + nav + h1 + goodA + caption + goodB +
      nearGood + badP + nearGood2 + tail0 + "</body></html>"
    val blocks = TextAnalysis.justextBlocks(
        Seq((1L, page, "en")).toDF("doc_id", "html", "lang"),
        Seq("doc_id"), "html", "lang")
      .orderBy("block_idx")
      .select("block_idx", "cf_class", "cs_class")
      .as[(Long, String, String)].collect().toSeq
    val expected = Seq(
      (0L, "bad", "bad"),          // nav link 1 (the li boundaries split it)
      (1L, "bad", "bad"),          // nav link 2: link density
      (2L, "short", "bad"),        // h1: mixed anchors, no neargood near
      (3L, "good", "good"),        // goodA
      (4L, "short", "good"),       // caption BETWEEN good zones
      (5L, "good", "good"),        // goodB
      (6L, "neargood", "good"),    // neargood with a good anchor
      (7L, "bad", "bad"),          // noun pile
      (8L, "neargood", "bad"),     // neargood between bad and the edge
      (9L, "short", "bad"))        // trailing short in a dead zone
    assert(blocks == expected, s"got:\n${blocks.mkString("\n")}")
    // the smoothed rewrite keeps exactly the cs-good blocks in order
    val out = TextAnalysis.extractHtmlDfSmoothed(
        Seq((1L, page, "en")).toDF("doc_id", "html", "lang"),
        Seq("doc_id"), "html", "lang")
      .select("html").as[String].head()
    assert(out.split("\n").length == 4, out)
    assert(out.contains("a stone bridge at dawn") &&
      out.contains("evening light") && !out.contains("granite towers") &&
      !out.contains("end of the story"), out)
    // a page with no short/neargood blocks: phase 2 is the identity
    val plain = "<html><body>" + nav + goodA + badP + "</body></html>"
    val same = TextAnalysis.justextBlocks(
        Seq((1L, plain, "en")).toDF("doc_id", "html", "lang"),
        Seq("doc_id"), "html", "lang")
      .select("cf_class", "cs_class").as[(String, String)].collect()
    assert(same.forall { case (a, b) => a == b }, same.toSeq.toString)
    // pages drop entirely when nothing survives (the extractHtmlDf rule)
    val dead = TextAnalysis.extractHtmlDfSmoothed(
        Seq((9L, "<p>short</p>", "en")).toDF("doc_id", "html", "lang"),
        Seq("doc_id"), "html", "lang")
    assert(dead.count() == 0)
  }

  test("accent-aware stop density: accented function words DECIDE " +
      "survival; native == column on accented pages") {
    // r15 (VERDICT r14 §next-1): the r14 tokenizer was [a-z]+ so "não",
    // "é", "está" could never match a stopword entry — the page below
    // is engineered to cross the 0.2 density threshold ONLY via
    // accented entries (full-pt density ≈ 0.34, ASCII-subset ≈ 0.09).
    val ptText = "Aquele lugar não é grande, já foi capital antiga e " +
      "até hoje guarda praças, torres, pontes, fontes, muros, jardins, " +
      "mercados, ruelas, claustros, também chafarizes; tudo está ali " +
      "há séculos, são marcas visíveis."
    val page = "<body><p>" + ptText + "</p></body>"
    val df = Seq((1L, page, "pt")).toDF("doc_id", "t", "lang")
    val r = df.select(
        TextAnalysis.extractMainContentByLang(col("t"), col("lang"))
          .as("full"),
        element_at(TextAnalysis.htmlBlockFeaturesByLangAscii(col("t"),
          col("lang")), 1).getField("keep").as("keep_ascii"),
        element_at(TextAnalysis.htmlBlockFeaturesByLang(col("t"),
          col("lang")), 1).getField("n_stop").as("n_stop"),
        element_at(TextAnalysis.htmlBlockFeaturesByLang(col("t"),
          col("lang")), 1).getField("n_words").as("n_words"),
        graft.expressions.TextHashExpressions.htmlExtractNativeLang(
          col("t"), col("lang"), 70, 0.2, 0.2).as("nat"))
      .collect()(0)
    assert(r.getAs[String]("full") == ptText,
      s"accented pt page must survive the full list: ${r}")
    assert(!r.getAs[Boolean]("keep_ascii"),
      "the ASCII-subset counterfactual must DROP the page — " +
        "survival is decided by the accented entries")
    // hand-verified counts: 32 words, 11 full-list stops (8 accented)
    assert(r.getAs[Long]("n_words") == 32L, r.toString)
    assert(r.getAs[Long]("n_stop") == 11L, r.toString)
    // native one-pass tokenizer/stop-set == column form on accents
    assert(r.getAs[String]("nat") == ptText,
      s"native diverged on accented page:\nnat=${r.getAs[String]("nat")}")
    // the word tokenizer itself: accented words are ONE token (não),
    // never split at the accent (n + o under the r14 class)
    val toks = Seq(Tuple1("não é más über così")).toDF("t")
      .select(size(regexp_extract_all(lower(col("t")),
        lit(TextAnalysis.wordClassJava + "+"), lit(0))).as("n"))
      .as[Int].head()
    assert(toks == 5, s"accented words split: got $toks tokens, want 5")
  }

  test("extractHtmlDf: rewrites to kept text, drops pages with no content") {
    val good = "<body><p>It was a calm day and the people of the town " +
      "were out in the streets, and all of them had something they " +
      "would do before the evening came.</p></body>"
    val navOnly = "<body><nav><a href=\"/\">Home</a></nav></body>"
    val out = TextAnalysis.extractHtmlDf(
        Seq((1L, good), (2L, navOnly)).toDF("doc_id", "text"), "text",
        minChars = 40)
      .as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L), out.toString)
    assert(out(1L).startsWith("It was a calm day") &&
      !out(1L).contains("<"), out(1L))
  }

  test("html regex-model limits: unclosed script leaks code (documented)") {
    // an UNCLOSED <script> has no </script> for the non-greedy span to
    // stop at — the code text survives as a block (the documented
    // limit; C4Clean's javascript line rule is the downstream net)
    val html = "<body><script>var leaked = 1;<p>after</p></body>"
    val blocks = Seq(Tuple1(html)).toDF("h")
      .select(transform(TextAnalysis.htmlToBlocks(col("h")),
        b => trim(regexp_replace(b, "<[^>]*>", ""))).as("t"))
      .as[Seq[String]].head()
    assert(blocks.exists(_.contains("var leaked")), blocks.mkString("|"))
  }

  // ----- Unicode hygiene (r15) -----

  private def nfc1(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(TextAnalysis.nfcNormalize(col("t")))
      .as[String].head()

  private def moji1(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(TextAnalysis.fixMojibake(col("t")))
      .as[String].head()

  test("nfc composes decomposed accents, Hangul jamo, singleton Angstrom; ascii identity") {
    assert(nfc1("café du parc") == "café du parc")
    assert(nfc1("Ångström") == "Ångström")
    assert(nfc1("각") == "각") // 각
    assert(nfc1("Å sign") == "Å sign")   // ANGSTROM SIGN -> Å
    assert(nfc1("plain ascii") == "plain ascii")
    // NFC does NOT fold compatibility forms — that's NFKC's job
    assert(nfc1("ﬁn") == "ﬁn")
  }

  test("nfkc adds compatibility folds on top of nfc") {
    val out = Seq(Tuple1("ﬁn Å Ａ"))
      .toDF("t").select(TextAnalysis.nfkcNormalize(col("t"))).as[String].head()
    assert(out == "fin Å A", out) // ligature, composition, fullwidth
  }

  test("fixMojibake repairs latin-1, cp1252, and double-encoded forms") {
    // UTF-8 bytes of "café déjà" read back as latin-1
    assert(moji1("cafÃ© dÃ©jÃ  vu")
      == "café déjà vu")
    // em dash E2 80 94 read as cp1252 (0x80 -> €, 0x94 -> ")
    assert(moji1("dash â€” here") == "dash — here")
    // double-encoded é: two repair rounds to the fixpoint
    assert(moji1("ÃƒÂ© twice") == "é twice")
    // quadruple-encoded (ADVICE r15): repair now runs to the TRUE
    // fixpoint, past the old 3-round cap — and the output is provably
    // not-mojibake (isMojibake(fixMojibake(x)) == false, the idempotence
    // property the cap used to break)
    def dmg(x: String) = new String(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val quad = dmg(dmg(dmg(dmg("café du parc"))))
    assert(moji1(quad) == "café du parc")
    val stillBad = Seq(Tuple1(quad)).toDF("t")
      .select(TextAnalysis.isMojibake(TextAnalysis.fixMojibake(col("t"))))
      .as[Boolean].head()
    assert(!stillBad)
  }

  test("fixMojibake leaves legitimate accents and ascii byte-identical") {
    assert(moji1("naïve café") == "naïve café")
    assert(moji1("plain ascii") == "plain ascii")
    assert(moji1("") == "")
    // repaired output is a fixpoint (idempotence)
    val once = moji1("cafÃ©")
    assert(moji1(once) == once)
  }

  test("property: fixMojibake inverts planted latin-1 damage; nfc idempotent") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    // pool: ASCII + Latin accents whose sloppy re-encode can never form a
    // valid UTF-8 sequence (no continuation-range chars), so the CLEAN
    // string is provably unrepairable and repair(damage(s)) == s exactly
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf(
      ('a' to 'z') ++ Seq('é', 'à', 'ü', 'ñ', 'ç', 'ö', 'É', 'ß'))).map(_.mkString)
    val strGen = Gen.listOfN(5, wordGen).map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(40, strGen)) { strs =>
      val rows = strs.zipWithIndex.map { case (s, i) =>
        val damaged = new String(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        (i.toLong, s, damaged)
      }
      val out = rows.toDF("id", "clean", "damaged")
        .select(col("id"),
          TextAnalysis.fixMojibake(col("damaged")).as("repaired"),
          TextAnalysis.fixMojibake(col("clean")).as("cleanKept"),
          TextAnalysis.nfcNormalize(
            TextAnalysis.nfcNormalize(col("clean"))).as("nfc2"),
          TextAnalysis.nfcNormalize(col("clean")).as("nfc1"))
        .as[(Long, String, String, String, String)].collect()
      val byId = rows.map(r => r._1 -> r._2).toMap
      val bad = out.filterNot { case (i, rep, kept, n2, n1) =>
        rep == byId(i) && kept == byId(i) && n2 == n1
      }
      bad.isEmpty :| s"violations: ${bad.take(3).mkString("; ")}"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("isMojibake agrees with fixMojibake; cleanUnicode flags and composes") {
    val rows = Seq(
      (1L, "cafÃ©"),          // mojibake
      (2L, "café"),               // denormalized only
      (3L, "plain"),                    // clean
      (4L, "naïve")                // legit accent
    ).toDF("doc_id", "text")
    val flagged = rows.select(col("doc_id"),
        TextAnalysis.isMojibake(col("text")).as("m"))
      .as[(Long, Boolean)].collect().toMap
    assert(flagged == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    val out = TextAnalysis.cleanUnicode(rows, "text")
      .select("doc_id", "text", "was_mojibake", "was_denormal")
      .as[(Long, String, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == (("café", true, false)))
    assert(out(2L) == (("café", false, true)))
    assert(out(3L) == (("plain", false, false)))
    assert(out(4L) == (("naïve", false, false)))
    // NULL text audits as (false, false), never as null-propagated flags
    // that break typed reads and fall out of both filter branches
    val n = TextAnalysis.cleanUnicode(
        Seq((9L, Option.empty[String])).toDF("doc_id", "text"), "text")
      .select(col("text").isNull, col("was_mojibake"), col("was_denormal"))
      .as[(Boolean, Boolean, Boolean)].head()
    assert(n == ((true, false, false)))
  }
}
