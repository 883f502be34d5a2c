package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and allow/deny evaluation — crawl politeness, the
  * stage BEFORE fetching in any crawl pipeline (REP, RFC 9309): which
  * of a frontier's URLs may be fetched at all. The parse is fully
  * relational (line explode + two key-partitioned window passes), the
  * evaluation is the standard longest-match rule with allow winning
  * ties, and every string rule is a fixed-order literal replace /
  * Java∩RE2 regex — the whole family replays in the DuckDB oracle.
  *
  * Scale shape: robots documents are per-HOST (bounded kilobytes each;
  * the RFC caps parseable size at 500 KiB), so everything here is
  * metadata-scale next to the corpus: the parse shuffles once on the
  * host key, and evaluation joins frontier URLs to per-host rules —
  * rules-side small, host-keyed, broadcastable when the host set fits.
  *
  * Documented simplifications (each spec-pinned): agent selection is
  * exact-match-else-`*` (RFC longest-prefix agent matching reduces to
  * this for single-token product names); `Crawl-delay` and unknown
  * directives parse but carry no evaluation semantics; an empty
  * `Allow:`/`Disallow:` value is a no-op per the RFC.
  */
object Robots {

  /** Parse robots.txt documents into directive rows: `(keys…,
    * line_idx, group_id, directive, value)`. Lines lose `#` comments
    * and trim; directives fold to lowercase; values keep case (paths
    * are case-sensitive). Group semantics per the RFC: a run of
    * consecutive `User-agent` lines opens ONE group (all those agents
    * share the group's rules); rules attach to the most recent group.
    * `group_id` is 1-based per document; rules before any User-agent
    * line get group_id 0 (ignored by evaluation — no agent can select
    * them).
    *
    * `keyCols` must uniquely identify ONE robots.txt document (the
    * urlKeyCols uniqueness contract of [[evaluateRobots]]): the group-id
    * window partitions on the keys and orders by line index, so two
    * input rows sharing a key would interleave their directive lines
    * into nonsense groups. One document per host is also what the
    * protocol itself guarantees (robots.txt is a fixed per-host path).
    */
  def parseRobots(docs: DataFrame, keyCols: Seq[String],
                  txtCol: String): DataFrame = {
    require(keyCols.nonEmpty, "parseRobots: at least one key column")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("line_idx"))
    docs
      .select(keys :+
        // CR / LF / CRLF all end lines (RFC 9309 §2.1 — CRLF robots.txt
        // files are common; splitting on \n alone left a trailing \r on
        // every value, silently killing all rules; code-review r12)
        posexplode(split(coalesce(col(txtCol), lit("")), "\r\n|\r|\n"))
          .as(Seq("line_idx", "__raw")): _*)
      .withColumn("__clean", trim(regexp_replace(col("__raw"), "#.*", "")))
      .withColumn("directive",
        lower(regexp_extract(col("__clean"), "^([A-Za-z-]+)\\s*:", 1)))
      // value WS-trims with tabs included (trim strips spaces only)
      .withColumn("value",
        regexp_replace(regexp_replace(col("__clean"),
          "^[A-Za-z-]+\\s*:[ \t]*", ""), "[ \t]+$", ""))
      .filter(col("directive") =!= "")
      .withColumn("__ua", (col("directive") === "user-agent").cast("int"))
      .withColumn("__start",
        (col("__ua") === 1 &&
          coalesce(lag(col("__ua"), 1).over(w), lit(0)) === 0).cast("int"))
      .withColumn("group_id",
        sum(col("__start")).over(w).cast("int"))
      .select(keys ++ Seq(col("line_idx").cast("int").as("line_idx"),
        col("group_id"), col("directive"), col("value")): _*)
  }

  /** Sitemap XML parsing — the other half of crawl discovery (robots
    * names the sitemaps; sitemaps name the URLs, sitemaps.org protocol):
    * one row per `<url>` or `<sitemap>` entry — `(keys…, entry_idx,
    * kind, loc, lastmod_raw, lastmod_date, changefreq, priority)`.
    * `loc` is entity-decoded (the protocol REQUIRES `&` escaped as
    * `&amp;` in URLs); `lastmod_date` is the date prefix of the W3C
    * datetime (`try_cast` — malformed dates null, never throw);
    * `priority` is a nullable double. Regex-model parse (non-greedy
    * tag spans, no nesting — sitemap entries cannot nest per the
    * schema), Java∩RE2-safe and oracle-replayable; map-only, the
    * extractLinks scale shape.
    */
  private[graft] val SitemapEntryRe =
    "(?is)<url>.*?</url>|<sitemap>.*?</sitemap>"
  private[graft] val SitemapLocRe = "(?is)<loc>\\s*(.*?)\\s*</loc>"
  private[graft] val SitemapLastmodRe = "(?is)<lastmod>\\s*(.*?)\\s*</lastmod>"
  private[graft] val SitemapChangefreqRe =
    "(?is)<changefreq>\\s*(.*?)\\s*</changefreq>"
  private[graft] val SitemapPriorityRe =
    "(?is)<priority>\\s*(.*?)\\s*</priority>"

  def parseSitemap(docs: DataFrame, keyCols: Seq[String],
                   xmlCol: String): DataFrame = {
    require(keyCols.nonEmpty, "parseSitemap: at least one key column")
    val keys = keyCols.map(col)
    val entries = regexp_extract_all(coalesce(col(xmlCol), lit("")),
      lit(SitemapEntryRe), lit(0))
    docs
      .select(keys :+ posexplode(entries).as(Seq("entry_idx", "__e")): _*)
      .select(keys ++ Seq(
        col("entry_idx").cast("int").as("entry_idx"),
        when(lower(col("__e")).startsWith("<url>"), lit("url"))
          .otherwise(lit("sitemap")).as("kind"),
        TextAnalysis.decodeHtmlEntities(
          regexp_extract(col("__e"), SitemapLocRe, 1)).as("loc"),
        regexp_extract(col("__e"), SitemapLastmodRe, 1).as("lastmod_raw"),
        regexp_extract(col("__e"), SitemapLastmodRe, 1).substr(1, 10)
          .try_cast("date").as("lastmod_date"),
        regexp_extract(col("__e"), SitemapChangefreqRe, 1).as("changefreq"),
        regexp_extract(col("__e"), SitemapPriorityRe, 1)
          .try_cast("double").as("priority")): _*)
  }

  /** The sitemaps.org changefreq vocabulary, in protocol order. */
  val ChangefreqValues: Seq[String] =
    Seq("always", "hourly", "daily", "weekly", "monthly", "yearly", "never")

  /** changefreq → recrawl interval in integer HOURS (always → 0,
    * hourly → 1, daily → 24, weekly → 168, monthly → 720 (30 d),
    * yearly → 8760 (365 d), never → NULL — protocol hint values;
    * month/year use the fixed civil approximations schedulers
    * conventionally pin so the arithmetic stays exact integers).
    */
  val ChangefreqHours: Seq[(String, Long)] = Seq("always" -> 0L,
    "hourly" -> 1L, "daily" -> 24L, "weekly" -> 168L, "monthly" -> 720L,
    "yearly" -> 8760L)

  /** Default recrawl interval for absent/unknown changefreq (one week) —
    * shared with the oracle generator so the two engines cannot drift.
    */
  val DefaultRecrawlHours: Long = 168L

  /** Recrawl scheduling from sitemap freshness hints (r13): for each
    * `<url>` entry of a parsed sitemap ([[parseSitemap]] output), derive
    * the recrawl interval from `changefreq` (unknown/absent values take
    * `defaultHours`; `never` maps to NULL — no recrawl) and decide
    * whether the URL is DUE at `asOfDate`: stale by at least the
    * interval since `lastmod`, or `lastmod` unknown (no freshness
    * evidence → fetch). All integer date arithmetic
    * (`datediff(asOf, lastmod) · 24 ≥ interval_hours`), so the whole
    * policy replays exactly cross-engine; map-only over the entry rows.
    * Adds `(interval_hours, stale_hours, due)` to the entry columns.
    *
    * Future-dated lastmod (ADVICE r13): `stale_hours` is clamped at 0 —
    * a lastmod after `asOfDate` counts as fresh-NOW, never as negative
    * staleness. Consequence: `changefreq='always'` (interval 0) is due
    * whenever it is seen, future lastmod included; every positive
    * interval treats a future lastmod as not-yet-due.
    */
  def recrawlSchedule(entries: DataFrame, asOfDate: String,
                      defaultHours: Long = DefaultRecrawlHours): DataFrame = {
    require(defaultHours >= 0,
      s"recrawlSchedule: defaultHours must be >= 0, got $defaultHours")
    // fail loudly on an unparseable asOf — to_date would return NULL and
    // leak three-valued logic into the documented boolean `due`
    // (second-pass review r13)
    require(scala.util.Try(java.time.LocalDate.parse(asOfDate)).isSuccess,
      s"recrawlSchedule: asOfDate '$asOfDate' is not an ISO date")
    val asOf = to_date(lit(asOfDate))
    // case-insensitive hint matching (sitemap consumers treat values
    // case-insensitively in the wild — 'Never' must not silently take
    // the default; second-pass review r13)
    val cfLower = lower(col("changefreq"))
    val interval = ChangefreqHours.foldLeft(
        when(cfLower === "never", lit(null).cast("long"))) {
      case (acc, (cf, h)) => acc.when(cfLower === cf, lit(h))
    }.otherwise(lit(defaultHours))
    entries
      .filter(col("kind") === "url")
      .withColumn("interval_hours", interval)
      .withColumn("stale_hours",
        // clamped at 0, NULL preserved for unknown lastmod (Spark's
        // greatest SKIPS nulls, so a bare greatest(0, NULL) would turn
        // no-evidence into zero-staleness)
        when(col("lastmod_date").isNull, lit(null).cast("long"))
          .otherwise(greatest(lit(0L),
            (datediff(asOf, col("lastmod_date")) * 24L).cast("long"))))
      .withColumn("due",
        col("lastmod_date").isNull ||
          (col("interval_hours").isNotNull &&
            col("stale_hours") >= col("interval_hours")))
  }

  /** Escape-and-translate a robots path pattern to a regex: `*` → `.*`,
    * a TRAILING `$` anchors (elsewhere `$` is literal), every other
    * regex metacharacter escaped by a FIXED-ORDER literal replace chain
    * (backslash first — the HtmlEntities convention; literal replaces
    * sidestep replacement-string escape dialects entirely). Shared
    * between both engines via [[RegexEscapes]].
    */
  private[graft] val RegexEscapes: Seq[String] =
    Seq("\\", ".", "[", "]", "{", "}", "(", ")", "+", "?", "^", "$", "|")

  private[graft] def patternToRegex(path: Column): Column = {
    val anchored = path.endsWith("$")
    val body = when(anchored, path.substr(lit(1), length(path) - 1))
      .otherwise(path)
    val escaped = RegexEscapes.foldLeft(body) { (acc, c) =>
      replace(acc, lit(c), lit("\\" + c))
    }
    val wild = replace(escaped, lit("*"), lit(".*"))
    concat(lit("^"), wild, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Allow/deny evaluation: which of `urls` may `userAgent` fetch.
    * `parsed` is [[parseRobots]] output keyed by host; `urls` carries
    * `(urlKeyCols…, host, url_path)` (path+query, `/` for empty — see
    * [[TextAnalysis.domainOf]] for the host). Per host the applicable
    * group set is the exact-agent groups when any exist, else the `*`
    * groups; within them the LONGEST matching pattern wins and `allow`
    * beats `disallow` on equal length (RFC 9309 §2.2.2); no matching
    * rule → allowed. Returns `(urlKeyCols…, host, url_path, allowed,
    * rule_type, rule_path)` with NULL rule columns on the
    * no-matching-rule default.
    */
  /** The groups `userAgent` selects per host: the exact-agent groups
    * when any exist for the host, else the `*` groups — the agent-
    * selection rule shared by allow/deny evaluation and crawl-delay
    * extraction (they must agree, or a bot could obey one group's rules
    * and another group's delay).
    */
  private def selectGroups(parsed: DataFrame, hostCol: String,
                           userAgent: String): DataFrame = {
    val agent = userAgent.toLowerCase(java.util.Locale.ROOT)
    val agents = parsed.filter(col("directive") === "user-agent" &&
        col("group_id") > 0)
      .select(col(hostCol), col("group_id"), lower(col("value")).as("agent"))
    val exactHosts = agents.filter(col("agent") === agent)
      .select(col(hostCol)).distinct()
      .withColumn("__has_exact", lit(true))
    agents
      .join(exactHosts, Seq(hostCol), "left")
      .filter(when(col("__has_exact"), col("agent") === agent)
        .otherwise(col("agent") === "*"))
      .select(col(hostCol), col("group_id")).distinct()
  }

  /** Per-host crawl delay for `userAgent`, in integer MILLISECONDS:
    * the `Crawl-delay` directives of the agent's selected groups (the
    * [[selectGroups]] rule — same selection the allow/deny evaluation
    * uses), fractional seconds parsed with `try_cast` (malformed values
    * null out, never throw), the MAX over a host's selected groups when
    * several carry one (the conservative pick, deterministic). Hosts
    * with no parseable delay are absent — callers coalesce to their
    * default. Crawl-delay is de-facto (Google ignores it, Bing/Yandex
    * honor it; it is not in RFC 9309) but frontier schedulers need it
    * wherever it exists. Returns `(hostCol, crawl_delay_ms)`.
    */
  def crawlDelays(parsed: DataFrame, hostCol: String,
                  userAgent: String): DataFrame =
    parsed
      .filter(col("directive") === "crawl-delay")
      .join(selectGroups(parsed, hostCol, userAgent),
        Seq(hostCol, "group_id"))
      .select(col(hostCol), col("value").try_cast("double").as("__d"))
      .filter(col("__d").isNotNull)
      .groupBy(hostCol)
      .agg(round(max(col("__d")) * 1000).cast("long").as("crawl_delay_ms"))

  /** Space each host's frontier URLs into politeness fetch slots:
    * `fetch_rank` ranks the host's URLs by `orderCols` (1-based,
    * deterministic — pass a total order), and `fetch_slot_ms =
    * (fetch_rank − 1) × crawl_delay_ms` is the earliest offset (ms from
    * the host's first fetch) at which the URL may be fetched under the
    * host's delay ([[crawlDelays]] output joined on `hostCol`; hosts
    * without one take `defaultDelayMs`). Pure window arithmetic over
    * host-keyed partitions — one shuffle on the host key, no state; a
    * fetcher turns slots into wall-clock by adding its per-host start
    * time. Returns the url rows + `(crawl_delay_ms, fetch_rank,
    * fetch_slot_ms)`.
    */
  def scheduleFrontier(urls: DataFrame, hostCol: String,
                       delays: DataFrame, orderCols: Seq[Column],
                       defaultDelayMs: Long = 0L): DataFrame = {
    require(orderCols.nonEmpty, "scheduleFrontier: orderCols required")
    require(defaultDelayMs >= 0,
      s"scheduleFrontier: defaultDelayMs must be >= 0, got $defaultDelayMs")
    urls
      .join(delays, Seq(hostCol), "left")
      .withColumn("crawl_delay_ms",
        coalesce(col("crawl_delay_ms"), lit(defaultDelayMs)))
      .withColumn("fetch_rank", row_number()
        .over(Window.partitionBy(col(hostCol)).orderBy(orderCols: _*))
        .cast("int"))
      .withColumn("fetch_slot_ms",
        (col("fetch_rank") - 1).cast("long") * col("crawl_delay_ms"))
  }

  def evaluateRobots(parsed: DataFrame, hostCol: String,
                     urls: DataFrame, urlKeyCols: Seq[String],
                     userAgent: String): DataFrame = {
    val chosenGroups = selectGroups(parsed, hostCol, userAgent)
    val rules = parsed
      .filter(col("directive").isin("allow", "disallow") &&
        col("value") =!= "")
      .join(chosenGroups, Seq(hostCol, "group_id"))
      .select(col(hostCol), col("directive").as("rule_type"),
        col("value"), patternToRegex(col("value")).as("__re"),
        length(col("value")).as("__len"))
    val u = urls.select(urlKeyCols.map(col) :+ col(hostCol) :+
      col("url_path"): _*)
    // best MATCHING rule per URL; URLs with no matching rule (or no
    // rules at all) fall out of `best` and take the default-allow row
    // in the final left join — they must not vanish. `urlKeyCols` must
    // uniquely key the url rows (the window partitions on them).
    val best = u.join(rules, Seq(hostCol))
      .filter(regexp_like(col("url_path"), col("__re")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(urlKeyCols.map(col): _*)
          .orderBy(col("__len").desc,
            col("rule_type").asc, col("value").asc)))
      .filter(col("__rk") === 1)
      .select(urlKeyCols.map(col) ++
        Seq(col("rule_type"), col("value").as("rule_path")): _*)
    u.join(best, urlKeyCols, "left")
      .select(urlKeyCols.map(col) ++ Seq(col(hostCol), col("url_path"),
        coalesce(col("rule_type") === "allow", lit(true)).as("allowed"),
        col("rule_type"), col("rule_path")): _*)
  }
}
