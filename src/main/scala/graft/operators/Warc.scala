package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** WARC (Web ARChive, ISO 28500) record extraction — the stage BEFORE
  * everything else in a raw-crawl corpus: CommonCrawl ships WARC files,
  * and the first thing a pipeline does is turn records into
  * (url, fetch date, HTML payload) rows for [[TextAnalysis.extractHtmlDf]]
  * and the FineWeb-shaped chain after it. The reference engine has no
  * crawl surface (SURVEY §2 extension family, the htmlToBlocks
  * precedent).
  *
  * Parse model — marker-delimited, like the HTML tag model, with its
  * limits documented and spec-pinned rather than hidden: a chunk is one
  * or more CONCATENATED records, each `WARC/1.0\r\n` + header lines +
  * `\r\n\r\n` + content block + `\r\n\r\n`. Records are split on the
  * version marker, not on `Content-Length` byte offsets, so a payload
  * that contains the literal marker sequence splits early (real HTTP
  * payloads do not start lines with it; the spec test pins the
  * behavior). Header names match case-insensitively (`(?i)` —
  * ASCII-only in both Java and RE2); a header whose value embeds a
  * newline is outside the model (header folding was removed in
  * WARC/1.1). Everything is Java∩RE2-safe string ops (no lookaround,
  * no backreferences), so the WHOLE chain replays in DuckDB — the
  * q_text_html_blocks oracle convention.
  *
  * Scale shape: pure per-row column expressions over chunk strings —
  * map-only, shuffle-free; one input chunk explodes to its records and
  * nothing else. At 100 TB the chunks arrive one-per-row from a
  * WARC-aware reader (CommonCrawl's ~1 GiB files split at record
  * boundaries); the parse itself never needs cross-row state. The
  * per-record gzip members of `.warc.gz` files are a DECOMPRESSION
  * concern (a codec, not a parser): feed decompressed text here.
  *
  * Per-record intermediates are staged across chained `transform`s so
  * each heavy substring/regex evaluates exactly once — Catalyst HOF
  * lambdas run interpreted with no subexpression elimination (the
  * htmlBlockFeatures lesson, BENCH_NOTES_r12).
  */
object Warc {

  /** The record-start marker (version line). Shared with the oracle SQL
    * generator so the two engines split on the same delimiter.
    */
  private[graft] val RecordMarker = "WARC/1.0\r\n"
  private val RecordMarkerRe = "WARC/1\\.0\\r\\n"

  /** Header/block and block-terminator separator: one empty line. */
  private[graft] val Sep = "\r\n\r\n"

  // Shared header-extraction patterns (Java∩RE2; the SQL generator
  // interpolates these same constants, so the engines cannot drift).
  private[graft] val WarcTypeRe = "(?im)^warc-type: *([^\\r\\n]*)"
  private[graft] val TargetUriRe = "(?im)^warc-target-uri: *([^\\r\\n]*)"
  private[graft] val WarcDateRe = "(?im)^warc-date: *([^\\r\\n]*)"
  private[graft] val RecordIdRe = "(?im)^warc-record-id: *([^\\r\\n]*)"
  private[graft] val ContentTypeRe = "(?im)^content-type: *([^\\r\\n]*)"
  private[graft] val ContentLengthRe = "(?im)^content-length: *([0-9]+)"
  private[graft] val HttpStatusRe = "^HTTP/1\\.[01] ([0-9]{3})"

  /** Raw per-record strings of a chunk (version markers consumed by the
    * split; a non-record preamble before the first marker would surface
    * as a record whose fields parse empty — observable, not swallowed).
    */
  def warcRecords(chunk: Column): Column =
    filter(split(chunk, RecordMarkerRe), r => r =!= "")

  /** Parse every record of a chunk into its standard fields, as
    * `array<struct>` aligned with [[warcRecords]]:
    *
    *   - `warc_type` / `target_uri` / `warc_date` / `record_id` /
    *     `content_type`: the WARC header values ('' when absent — the
    *     regexp_extract no-match convention, identical in DuckDB)
    *   - `content_length`: the declared length, NULL when absent or
    *     malformed (`try_cast`)
    *   - `http_status` / `http_content_type`: parsed from the content
    *     block when it is an HTTP response message (NULL / '' otherwise)
    *   - `payload`: the content past the HTTP headers for HTTP blocks,
    *     the raw block otherwise, with the record's closing `\r\n\r\n`
    *     terminator stripped — exactly once, so a payload genuinely
    *     ending in one CRLF keeps it
    */
  def warcRecordFields(chunk: Column): Column = {
    // stage 1: head/block at the FIRST empty line
    val st1 = transform(warcRecords(chunk), r => {
      val p = instr(r, Sep)
      struct(
        when(p > 0, r.substr(lit(1), p - 1)).otherwise(r).as("head"),
        when(p > 0, r.substr(p + 4, length(r))).otherwise(lit(""))
          .as("block"))
    })
    // stage 2: WARC headers from the head
    val st2 = transform(st1, s => {
      val h = s.getField("head")
      struct(
        s.getField("block").as("block"),
        regexp_extract(h, WarcTypeRe, 1).as("warc_type"),
        regexp_extract(h, TargetUriRe, 1).as("target_uri"),
        regexp_extract(h, WarcDateRe, 1).as("warc_date"),
        regexp_extract(h, RecordIdRe, 1).as("record_id"),
        regexp_extract(h, ContentTypeRe, 1).as("content_type"),
        regexp_extract(h, ContentLengthRe, 1).as("cl_raw"))
    })
    // stage 3: HTTP envelope of the block (when present)
    val st3 = transform(st2, s => {
      val b = s.getField("block")
      val isHttp = b.startsWith("HTTP/1.")
      val hp = instr(b, Sep)
      struct(
        s.getField("warc_type").as("warc_type"),
        s.getField("target_uri").as("target_uri"),
        s.getField("warc_date").as("warc_date"),
        s.getField("record_id").as("record_id"),
        s.getField("content_type").as("content_type"),
        s.getField("cl_raw").as("cl_raw"),
        when(isHttp, regexp_extract(b, HttpStatusRe, 1)).otherwise(lit(""))
          .as("st_raw"),
        when(isHttp && hp > 0, b.substr(lit(1), hp - 1)).otherwise(lit(""))
          .as("http_head"),
        when(isHttp && hp > 0, b.substr(hp + 4, length(b))).otherwise(b)
          .as("body_raw"))
    })
    // stage 4: final fields (typed casts, the terminator strip)
    transform(st3, s => struct(
      s.getField("warc_type").as("warc_type"),
      s.getField("target_uri").as("target_uri"),
      s.getField("warc_date").as("warc_date"),
      s.getField("record_id").as("record_id"),
      s.getField("content_type").as("content_type"),
      s.getField("cl_raw").try_cast(LongType).as("content_length"),
      s.getField("st_raw").try_cast(LongType).as("http_status"),
      regexp_extract(s.getField("http_head"), ContentTypeRe, 1)
        .as("http_content_type"),
      // \z, not $: Java's non-multiline $ ALSO matches before a final
      // line terminator, so a malformed record tail like "…\r\n\r\n\n"
      // would strip a Sep that is not at the true end — where RE2's $
      // (the oracle side) is end-of-text only. \z pins Java to the same
      // end-of-text semantics (code-review r12, spec-pinned).
      regexp_replace(s.getField("body_raw"), "\\r\\n\\r\\n\\z", "")
        .as("payload")))
  }

  /** One row per record: `(idCol, record_idx, <fields>, n_payload_chars)`.
    * The posexplode keeps record order within each chunk.
    */
  def parseRecords(df: DataFrame, idCol: String, warcCol: String): DataFrame =
    df.select(col(idCol), posexplode(warcRecordFields(col(warcCol))))
      .select(col(idCol), col("pos").cast("long").as("record_idx"),
        col("col.warc_type"), col("col.target_uri"), col("col.warc_date"),
        col("col.record_id"), col("col.content_type"),
        col("col.content_length"), col("col.http_status"),
        col("col.http_content_type"), col("col.payload"))
      .withColumn("n_payload_chars", length(col("payload")).cast("long"))

  /** Concatenated-member gunzip of a `.warc.gz` byte column to the WARC
    * text [[parseRecords]] splits — real crawl archives are per-record
    * gzip members back to back, and the JDK stream reads them all in
    * one pass ([[graft.expressions.GzipOps]]). NULL (countable, not
    * fatal) on a corrupt stream. JDK-side, so consuming queries are
    * rows-only; the exact round trip is gate-pinned.
    */
  def gunzipChunk(bytes: Column): Column =
    graft.expressions.TextHashExpressions.gunzipText(bytes)

  /** One gzip member of `text` — the fixture / round-trip-gate side;
    * members concatenate with binary `concat`.
    */
  def gzipChunk(text: Column): Column =
    graft.expressions.TextHashExpressions.gzipMember(text)

  /** A chunk's `.warc.gz` FILE BYTES in the real CommonCrawl layout: one
    * gzip member PER RECORD, back to back (the per-record members are
    * what make WARC archives splittable — a reader can cut at any member
    * boundary without decompressing its neighbors). Built per row from
    * the parse model's own record split, each record re-prefixed with
    * the version marker it lost to the split, so
    * `gunzipChunk(warcGzBytes(chunk)) === chunk` exactly for any chunk
    * that starts at a record marker (the [[warcRecords]] contract).
    */
  def warcGzBytes(chunk: Column): Column =
    aggregate(
      transform(warcRecords(chunk),
        r => gzipChunk(concat(lit(RecordMarker), r))),
      lit(Array.emptyByteArray),
      (acc, m) => concat(acc, m))

  /** Write each chunk as its own `<dir>/chunk-<id>.warc.gz` file — real
    * multi-member WARC archives on disk, the interchange format a crawl
    * dump arrives in. Distributed: the gzip encode is the per-row
    * [[warcGzBytes]] expression and each partition writes its own files
    * through the Hadoop FileSystem API (resolved per path, so `file://`,
    * HDFS, and object stores all work with the executors' own Hadoop
    * configuration). File count = chunk count by contract — callers
    * size chunks like CommonCrawl does (~1 GiB), not one per page.
    * A `_SUCCESS` marker is written after ALL archives landed; readers
    * that must not see a partially-written archive set gate on it
    * (an interrupted job leaves no marker).
    */
  def writeWarcGzFiles(chunks: DataFrame, idCol: String, warcCol: String,
                       dir: String): Unit = {
    val bytes = chunks.select(col(idCol).cast("string").as("__id"),
      warcGzBytes(col(warcCol)).as("__bytes"))
    // the SESSION's Hadoop configuration, shipped as serializable
    // entries and rebuilt per partition — a bare Configuration() on the
    // executor has none of the spark.hadoop.* credentials/nameservice
    // settings an s3a:// or HA hdfs:// dir needs (second-pass review
    // r13; Spark's own SerializableConfiguration is private[spark])
    val confEntries: Array[(String, String)] = {
      val hc = chunks.sparkSession.sparkContext.hadoopConfiguration
      val it = hc.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    bytes.foreachPartition { it: Iterator[Row] =>
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confEntries.foreach { case (k, v) => conf.set(k, v) }
      it.foreach { row =>
        val p = new org.apache.hadoop.fs.Path(
          s"$dir/chunk-${row.getString(0)}.warc.gz")
        val out = p.getFileSystem(conf).create(p, true)
        try out.write(row.getAs[Array[Byte]](1)) finally out.close()
      }
    }
    // Completion marker, written only after every partition's archives
    // landed (the file-commit _SUCCESS convention): an interrupted job
    // must not leave a partial archive set that a later
    // [[readWarcGzFiles]] glob picks up silently — callers gate on this
    // file (ADVICE r13).
    val success = new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")
    val fs = success.getFileSystem(
      chunks.sparkSession.sparkContext.hadoopConfiguration)
    fs.create(success, true).close()
  }

  /** Read `.warc.gz` files from disk into `(path, file_length, warc)` —
    * the missing hop between a crawl dump on disk and [[parseRecords]]:
    * Spark's `binaryFile` source lists + reads each archive as one
    * binary row (distributed by file, like CommonCrawl's one-task-per-
    * archive convention), and the concatenated-member gunzip restores
    * the full WARC text. `warc` is NULL on a corrupt stream — countable
    * downstream, never fatal (the [[gunzipChunk]] contract).
    *
    * Scale shape: one row per archive file, so parallelism = file count
    * — exactly how CommonCrawl shards (tens of thousands of ~1 GiB
    * segment files). A single giant archive would serialize; the
    * per-record gzip members make record-boundary FILE SPLITTING
    * possible (cut at any member boundary), which is the custom-
    * FileFormat upgrade path if archives ever arrive unsharded.
    */
  def readWarcGzFiles(spark: SparkSession, glob: String): DataFrame = {
    // A glob that expands to thousands of archive paths makes the file
    // index fire a parallel-discovery JOB with one task per matched path
    // (r17 opt: ~1000 tasks of pure listing per run on the fixture set;
    // at crawl scale, per-file tasks on the driver's listing pool). When
    // the glob is the common `<dir>/*.<ext>` shape, load the DIRECTORY and
    // push the pattern down as pathGlobFilter — one directory listing,
    // same file set.
    val m = "^(.*)/(\\*[^/]*)$".r
    val reader = spark.read.format("binaryFile")
    val df = glob match {
      case m(dir, pat) => reader.option("pathGlobFilter", pat).load(dir)
      case _ => reader.load(glob)
    }
    df.select(col("path"), col("length").as("file_length"),
      gunzipChunk(col("content")).as("warc"))
  }

  /** Charset-sniffed decode of raw payload BYTES (r17, VERDICT r16
    * §next-5) — the stage between "fetched bytes" and every text
    * operator: BOM → declared HTML meta / XML encoding → strict-UTF-8
    * validation → windows-1252 fallback, deterministic and map-only
    * ([[graft.expressions.CharsetOps]]). Decoding a legacy-charset page
    * as UTF-8 mojibakes it BEFORE `fixMojibake` can help (that operator
    * repairs mis-roundtripped UTF-8 text, not a wrong decode), so a
    * real-crawl ingest runs this first: bytes → [[decodePayload]] →
    * extraction. The q_warc_charset gate pins every detector stage
    * against literal round trips in both engines.
    */
  def decodePayload(bytes: Column): Column =
    graft.expressions.CharsetExpressions.decodeSniffed(bytes)

  /** The detected canonical charset of a raw payload (diagnostics /
    * corpus profiling side of [[decodePayload]]).
    */
  def payloadCharset(bytes: Column): Column =
    graft.expressions.CharsetExpressions.sniffCharset(bytes)

  /** Which detector stage fired: bom | meta | xml | utf8 | fallback. */
  def payloadCharsetMethod(bytes: Column): Column =
    graft.expressions.CharsetExpressions.sniffMethod(bytes)

  /** [[decodePayload]] with the HTTP Content-Type header as a hint —
    * the transport layer outranks in-document declarations in the HTML5
    * precedence (BOM → HTTP charset param → meta → XML decl →
    * validation), and [[parseRecords]] carries the header
    * (`http_content_type`) for exactly this. An empty or
    * charset-parameter-less hint falls through to [[decodePayload]]'s
    * chain; the "header" method surfaces in
    * [[payloadCharsetMethodWithHint]].
    */
  def decodePayloadWithHint(bytes: Column, contentType: Column): Column =
    graft.expressions.CharsetExpressions.decodeSniffedHint(bytes,
      contentType)

  /** The detected charset under a Content-Type hint. */
  def payloadCharsetWithHint(bytes: Column, contentType: Column): Column =
    graft.expressions.CharsetExpressions.sniffCharsetHint(bytes,
      contentType)

  /** Detector stage under a hint: bom | header | meta | xml | utf8 |
    * fallback.
    */
  def payloadCharsetMethodWithHint(bytes: Column,
                                   contentType: Column): Column =
    graft.expressions.CharsetExpressions.sniffMethodHint(bytes, contentType)

  /** The crawl front door: successful (200) HTML response records as
    * `(idCol, record_idx, record_id, url, fetched_at, html)` — the
    * exact input shape of [[TextAnalysis.extractHtmlDf]] and the
    * FineWeb chain behind it (`record_id` is the WARC record's own
    * identity, the natural document key downstream). Requests,
    * warcinfo/metadata records, non-200 fetches, and non-HTML content
    * types drop here.
    */
  def responseDocuments(df: DataFrame, idCol: String,
                        warcCol: String): DataFrame =
    parseRecords(df, idCol, warcCol)
      .filter(col("warc_type") === "response" &&
        col("http_status") === 200L &&
        col("http_content_type").startsWith("text/html"))
      .select(col(idCol), col("record_idx"), col("record_id"),
        col("target_uri").as("url"), col("warc_date").as("fetched_at"),
        col("payload").as("html"))
}
