package graft

import graft.operators.Robots
import org.apache.spark.sql.functions._

/** robots.txt parsing (grouping, comments, case), pattern-to-regex
  * translation, and RFC 9309 longest-match / allow-wins evaluation.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val robots =
    """# site robots
      |User-agent: *
      |Disallow: /private/*
      |Allow: /private/open$
      |Crawl-delay: 10
      |
      |User-agent: GraftBot
      |User-agent: altbot
      |Disallow: /page/3*
      |Allow: /page/30
      |Disallow:
      |Sitemap: https://h.example/sitemap.xml
      |stray line without a colon directive
      |""".stripMargin

  private def parsed =
    Robots.parseRobots(Seq(("h.example", robots)).toDF("host", "txt"),
      Seq("host"), "txt")

  test("parseRobots: comments, grouping, consecutive UA lines, case") {
    val rows = parsed.orderBy("line_idx")
      .select("group_id", "directive", "value")
      .as[(Int, String, String)].collect().toSeq
    assert(rows == Seq(
      (1, "user-agent", "*"),
      (1, "disallow", "/private/*"),
      (1, "allow", "/private/open$"),
      (1, "crawl-delay", "10"),
      (2, "user-agent", "GraftBot"),
      (2, "user-agent", "altbot"),
      (2, "disallow", "/page/3*"),
      (2, "allow", "/page/30"),
      (2, "disallow", ""),
      (2, "sitemap", "https://h.example/sitemap.xml")), rows)
  }

  test("parseRobots: CRLF and CR line endings, tab-padded values") {
    val crlf = "User-agent: *\r\nDisallow:\t/private/ \r\nAllow: /a$\rSitemap: x"
    val rows = Robots.parseRobots(
        Seq(("h.example", crlf)).toDF("host", "txt"), Seq("host"), "txt")
      .orderBy("line_idx").select("directive", "value")
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(
      ("user-agent", "*"),
      ("disallow", "/private/"), // no trailing \r, tab/space trimmed
      ("allow", "/a$"),
      ("sitemap", "x")), rows)
    // and the rules actually bite (the failure mode was silent allow)
    val u = Seq((1L, "/private/x", "h.example"))
      .toDF("uid", "url_path", "host")
    val got = Robots.evaluateRobots(
        Robots.parseRobots(Seq(("h.example", crlf)).toDF("host", "txt"),
          Seq("host"), "txt"),
        "host", u, Seq("uid"), "anybot")
      .select("allowed").as[Boolean].collect().toSeq
    assert(got == Seq(false))
  }

  test("patternToRegex: wildcards, trailing anchor, metachar escapes") {
    val got = Seq("/private/*", "/a.b$", "/x(1)+[y]|z^", "*.pdf$")
      .toDF("value")
      .select(Robots.patternToRegex(col("value"))).as[String]
      .collect().toSeq
    assert(got == Seq(
      "^/private/.*",
      "^/a\\.b$",
      "^/x\\(1\\)\\+\\[y\\]\\|z\\^",
      "^.*\\.pdf$"), got)
  }

  private def urls(rows: (Long, String)*) =
    rows.toDF("uid", "url_path").withColumn("host", lit("h.example"))

  test("evaluateRobots: exact agent group, longest match, allow ties") {
    val u = urls((1L, "/page/31"), (2L, "/page/30"), (3L, "/other"),
      (4L, "/private/x"))
    val got = Robots.evaluateRobots(parsed, "host", u, Seq("uid"), "graftbot")
      .orderBy("uid")
      .select("uid", "allowed", "rule_type", "rule_path")
      .as[(Long, Boolean, Option[String], Option[String])].collect().toSeq
    assert(got == Seq(
      // /page/31: only Disallow /page/3* matches
      (1L, false, Some("disallow"), Some("/page/3*")),
      // /page/30: Allow /page/30 (len 8) beats Disallow /page/3* (len 8
      // — equal length, allow wins the tie)
      (2L, true, Some("allow"), Some("/page/30")),
      // no rule in the graftbot group matches -> default allow; the *
      // group's /private rules do NOT apply when an exact group exists
      (3L, true, None, None),
      (4L, true, None, None)), got)
  }

  test("evaluateRobots: star fallback and the anchored allow") {
    val u = urls((1L, "/private/x"), (2L, "/private/open"),
      (3L, "/private/open2"), (4L, "/public"))
    val got = Robots.evaluateRobots(parsed, "host", u, Seq("uid"), "otherbot")
      .orderBy("uid").select("uid", "allowed")
      .as[(Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, false),  // Disallow /private/*
      (2L, true),   // Allow /private/open$ (len 14) beats /private/* (10)
      (3L, false),  // the $ anchor rejects /private/open2 -> disallow wins
      (4L, true)))  // no matching rule
  }

  test("parseSitemap: url/sitemap entries, entity decode, date prefix") {
    val xml =
      "<?xml version=\"1.0\"?><urlset>" +
        "<url><loc> https://h.example/p?a=1&amp;b=2 </loc>" +
        "<lastmod>2024-02-03T04:05:06+00:00</lastmod>" +
        "<changefreq>daily</changefreq><priority>0.8</priority></url>" +
        "<url><loc>https://h.example/q</loc></url>" +
        "<URL><loc>https://h.example/upper</loc>" +
        "<lastmod>not a date</lastmod></URL>" +
        "</urlset><sitemapindex>" +
        "<sitemap><loc>https://h.example/more.xml</loc>" +
        "<lastmod>2024-01-15</lastmod></sitemap></sitemapindex>"
    val got = Robots.parseSitemap(Seq((1L, xml)).toDF("id", "xml"),
        Seq("id"), "xml")
      .orderBy("entry_idx")
      .select("kind", "loc", "lastmod_date", "changefreq", "priority")
      .as[(String, String, Option[java.sql.Date], String, Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      ("url", "https://h.example/p?a=1&b=2",
        Some(java.sql.Date.valueOf("2024-02-03")), "daily", Some(0.8)),
      ("url", "https://h.example/q", None, "", None),
      ("url", "https://h.example/upper", None, "", None),
      ("sitemap", "https://h.example/more.xml",
        Some(java.sql.Date.valueOf("2024-01-15")), "", None)), got)
  }

  test("patternToRegex: seeded-random paths agree with an NFA reference") {
    // Reference wildcard matcher: NFA position set — after consuming
    // the pattern, the set of path indices reachable; '*' fans out to
    // every later index. Non-anchored robots semantics = match at the
    // START of the path (any reachable end); '$' = must reach the end.
    def reachable(s: String, body: String): Set[Int] =
      body.foldLeft(Set(0)) { (cur, c) =>
        if (c == '*') cur.flatMap(i => (i to s.length).toSet)
        else cur.collect { case i if i < s.length && s.charAt(i) == c => i + 1 }
      }
    def ref(path: String, pattern: String): Boolean = {
      val anchored = pattern.endsWith("$")
      val body = if (anchored) pattern.dropRight(1) else pattern
      val r = reachable(path, body)
      if (anchored) r.contains(path.length) else r.nonEmpty
    }
    val rnd = new scala.util.Random(1207L)
    val pathChars = "ab/.x?=1"
    val patChars = "ab/.x*"
    val cases = Seq.tabulate(300) { i =>
      val path = "/" + Seq.fill(rnd.nextInt(10))(
        pathChars(rnd.nextInt(pathChars.length))).mkString
      val pat = "/" + Seq.fill(rnd.nextInt(8))(
        patChars(rnd.nextInt(patChars.length))).mkString +
        (if (rnd.nextBoolean()) "$" else "")
      (i.toLong, path, pat)
    }
    val got = cases.toDF("i", "path", "pat")
      .select(col("i"), regexp_like(col("path"),
        Robots.patternToRegex(col("pat"))).as("m"))
      .orderBy("i").as[(Long, Boolean)].collect().toSeq
    val want = cases.map { case (i, p, q) => (i, ref(p, q)) }
    assert(got == want,
      got.zip(want).zip(cases).filter(t => t._1._1 != t._1._2).take(3))
  }

  test("evaluateRobots: hosts with no robots rows default to allow") {
    val u = Seq((1L, "/anything", "bare.example"))
      .toDF("uid", "url_path", "host")
    val got = Robots.evaluateRobots(parsed, "host", u, Seq("uid"), "graftbot")
      .select("allowed").as[Boolean].collect().toSeq
    assert(got == Seq(true))
  }

  test("crawlDelays: group selection, fractional seconds, max, garbage") {
    val docs = Seq(
      ("h.example", robots), // exact graftbot group exists, NO delay in it
      ("s.example", "User-agent: *\nCrawl-delay: 0.5\nCrawl-delay: 2\n" +
        "Disallow: /x"),     // two in one group -> max
      ("g.example", "User-agent: *\nCrawl-delay: soon\nDisallow: /x"))
      .toDF("host", "txt")
    val p = Robots.parseRobots(docs, Seq("host"), "txt")
    // graftbot selects h.example's exact group (which has no delay), so
    // the star group's Crawl-delay: 10 must NOT leak in; altbot ditto;
    // a generic bot takes the star group's 10 s.
    def delays(agent: String) =
      Robots.crawlDelays(p, "host", agent)
        .as[(String, Long)].collect().toMap
    assert(delays("graftbot") == Map("s.example" -> 2000L))
    assert(delays("nobot") ==
      Map("h.example" -> 10000L, "s.example" -> 2000L))
    // g.example's unparseable value nulls out (absent, never a throw)
  }

  test("recrawlSchedule: interval map, never, unknown, missing lastmod") {
    def dt(s: String) = java.sql.Date.valueOf(s)
    val entries = Seq(
      ("h", 0, "url", "u0", Option(dt("2024-01-01")), "daily"),
      ("h", 1, "url", "u1", Option(dt("2024-01-14")), "never"),
      ("h", 2, "url", "u2", Option.empty[java.sql.Date], "never"),
      ("h", 3, "url", "u3", Option(dt("2024-01-10")), ""),
      ("h", 4, "url", "u4", Option(dt("2024-01-01")), "exotic"),
      ("h", 5, "url", "u5", Option(dt("2024-01-15")), "always"),
      ("h", 6, "sitemap", "u6", Option.empty[java.sql.Date], ""))
      .toDF("host", "entry_idx", "kind", "loc", "lastmod_date", "changefreq")
    val got = Robots.recrawlSchedule(entries, "2024-01-15")
      .select("entry_idx", "interval_hours", "stale_hours", "due")
      .as[(Int, Option[Long], Option[Long], Boolean)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (0, Some(24L), Some(336L), true),   // daily, 14 days stale
      (1, None, Some(24L), false),        // never + known lastmod
      (2, None, None, true),              // never fetched -> fetch once
      (3, Some(168L), Some(120L), false), // default, not yet stale
      (4, Some(168L), Some(336L), true),  // unknown freq -> default
      (5, Some(0L), Some(0L), true)))     // always -> due immediately
    // non-url entries drop; guard fires
    assert(!got.exists(_._1 == 6))
    intercept[IllegalArgumentException] {
      Robots.recrawlSchedule(entries, "2024-01-15", defaultHours = -1)
    }
  }

  test("recrawlSchedule: future lastmod clamps to 0 — always due, rest fresh") {
    // ADVICE r13: a future-dated lastmod used to yield negative
    // stale_hours, which suppressed even changefreq='always' (interval
    // 0). Clamped at 0: 'always' is due whenever seen; positive
    // intervals treat the future date as fresh-now.
    def dt(s: String) = java.sql.Date.valueOf(s)
    val entries = Seq(
      ("h", 0, "url", "u0", Option(dt("2024-06-01")), "always"),
      ("h", 1, "url", "u1", Option(dt("2024-06-01")), "daily"),
      ("h", 2, "url", "u2", Option(dt("2024-06-01")), "never"),
      ("h", 3, "url", "u3", Option.empty[java.sql.Date], "always"))
      .toDF("host", "entry_idx", "kind", "loc", "lastmod_date", "changefreq")
    val got = Robots.recrawlSchedule(entries, "2024-01-15")
      .select("entry_idx", "interval_hours", "stale_hours", "due")
      .as[(Int, Option[Long], Option[Long], Boolean)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (0, Some(0L), Some(0L), true),    // always: due despite future date
      (1, Some(24L), Some(0L), false),  // daily: fresh-now, not negative
      (2, None, Some(0L), false),       // never: still never
      (3, Some(0L), None, true)))       // always + no lastmod: due
  }

  test("scheduleFrontier: per-host slots, default delay, determinism") {
    val delays = Seq(("a.example", 1500L)).toDF("host", "crawl_delay_ms")
    val urls = Seq((3L, "a.example"), (1L, "a.example"), (2L, "a.example"),
      (4L, "b.example")).toDF("uid", "host")
    val got = Robots.scheduleFrontier(urls, "host", delays,
        Seq(col("uid").asc), defaultDelayMs = 100L)
      .select("uid", "crawl_delay_ms", "fetch_rank", "fetch_slot_ms")
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(got == Set(
      (1L, 1500L, 1, 0L), (2L, 1500L, 2, 1500L), (3L, 1500L, 3, 3000L),
      (4L, 100L, 1, 0L)))
  }
}
