package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Structured Streaming semantics: windowed aggregation over a memory
  * stream matches the equivalent batch aggregation, and the foreachBatch-
  * hosted merge preserves the batch pipeline's invariants across
  * micro-batches.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts over a stream matches the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val rows = Seq(
      (ts("2024-01-01 01:00:00"), "click", 1.0),
      (ts("2024-01-01 02:00:00"), "click", 2.0),
      (ts("2024-01-01 03:00:00"), "view", 3.0),
      (ts("2024-01-02 01:00:00"), "click", 4.0))
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streams.windowedCounts(df, "ts", "event_type",
        windowLen = "1 day", lateness = "1 hour", amountCol = Some("value"))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .select(col("window_start").cast("string"), col("event_type"), col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      val batch = rows.toDF("ts", "event_type", "value")
        .groupBy(window(col("ts"), "1 day").getField("start").cast("string").as("ws"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("s"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(got == batch)
      assert(got.contains(("2024-01-01 00:00:00", "click", 2L, 3.0)))
    } finally q.stop()
  }

  test("dedupByContent drops same-token-stream docs within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "text")
    val q = Streams.dedupByContent(df, "ts", "text")
      .writeStream.format("memory").queryName("content_dedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2024-01-01 01:00:00"), 1L, "the quick brown fox"),
        (ts("2024-01-01 01:10:00"), 2L, "THE  quick brown\tfox"), // same tokens
        (ts("2024-01-01 01:20:00"), 3L, "a different document"))
      q.processAllAvailable()
      val got = spark.table("content_dedup").select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 3L)) // doc 2 deduplicated against doc 1
    } finally q.stop()
  }

  test("dedupWithinWatermark drops in-horizon duplicate keys") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Int)]
    val df = mem.toDF().toDF("ts", "k")
    val q = Streams.dedupWithinWatermark(df, "ts", Seq("k"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 00:00:00"), 1), (ts("2024-01-01 00:00:00"), 1),
        (ts("2024-01-01 00:00:01"), 2))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
    } finally q.stop()
  }

  test("joinWithinHorizon: stream-stream join matches the batch theta join") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Int, Long)]
    val imps = MemoryStream[(Timestamp, Int, Long)]
    val cRows = Seq(
      (ts("2024-01-01 00:05:00"), 1, 101L), // 5 min after imp 11 → match
      (ts("2024-01-01 01:30:00"), 1, 102L), // >1h after imp 11 → no match
      (ts("2024-01-01 00:04:00"), 2, 103L), // 1 min BEFORE imp 22 → no match
      (ts("2024-01-01 00:20:00"), 2, 104L)) // 15 min after imp 22 → match
    val iRows = Seq(
      (ts("2024-01-01 00:00:00"), 1, 11L),
      (ts("2024-01-01 00:05:00"), 2, 22L))
    val joined = Streams.joinWithinHorizon(
      clicks.toDF().toDF("click_ts", "k", "click_id"),
      imps.toDF().toDF("imp_ts", "k", "imp_id"),
      Seq("k"), "click_ts", "imp_ts", maxLag = "1 hour")
    val q = joined.writeStream.format("memory").queryName("hjoin")
      .outputMode("append").start()
    try {
      imps.addData(iRows: _*)
      clicks.addData(cRows: _*)
      q.processAllAvailable()
      val got = spark.table("hjoin").select("click_id", "imp_id")
        .as[(Long, Long)].collect().toSet
      val batch = cRows.toDF("click_ts", "k", "click_id")
        .join(iRows.toDF("imp_ts", "k2", "imp_id"),
          col("k") === col("k2") &&
            col("imp_ts") >= col("click_ts") - expr("INTERVAL 1 hour") &&
            col("imp_ts") <= col("click_ts"))
        .select("click_id", "imp_id").as[(Long, Long)].collect().toSet
      assert(got == batch)
      assert(got == Set((101L, 11L), (104L, 22L)))
    } finally q.stop()
  }

  test("foreachBatch merge: micro-batches upsert into the parquet target") {
    implicit val sqlCtx = spark.sqlContext
    val target = Files.createTempDirectory("graft-stream").resolve("tgt").toString
    val mem = MemoryStream[(Int, String)]
    val doMerge = Streams.mergeEachBatch(target, Seq("k"))
    val q = mem.toDF().toDF("k", "v").writeStream.foreachBatch(doMerge).start()
    try {
      mem.addData((1, "a"), (2, "b"))
      q.processAllAvailable()
      mem.addData((2, "B2"), (3, "c")) // update + insert in batch 2
      q.processAllAvailable()
      val tgt = spark.read.parquet(target)
      val got = tgt.select("k", "v").as[(Int, String)].collect().toMap
      assert(got == Map(1 -> "a", 2 -> "B2", 3 -> "c")) // no-delete + upsert
      assert(tgt.select("id").as[Long].collect().toSet.size == 3)
    } finally q.stop()
  }

  test("mergeEachBatchBucketed: equals the full-rewrite merge, touches " +
      "only changed buckets, ids never collide across buckets") {
    // r15 (VERDICT r14 §next-6): the O(changes) parquet target. Drive
    // both sinks with the SAME batch sequence and pin result equality
    // on (k, v, id, row_hash); then pin that an untouched bucket's
    // files are bit-identical after a batch that doesn't hit it.
    val dir = Files.createTempDirectory("graft-bkt-merge").toString
    val (full, bkt) = (s"$dir/full", s"$dir/bkt")
    val doFull = Streams.mergeEachBatch(full, Seq("k"))
    val doBkt = Streams.mergeEachBatchBucketed(bkt, Seq("k"), nBuckets = 8)
    val b1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (10L, "j"), (11L, "k"))
      .toDF("k", "v")
    doFull(b1, 0L); doBkt(b1, 0L)
    // snapshot every bucket dir's file list + sizes before batch 2
    def bucketFiles(): Map[String, Seq[(String, Long)]] = {
      val base = new java.io.File(bkt)
      base.listFiles().filter(_.getName.startsWith("__kb=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toSeq.sortBy(_._1)
      }.toMap
    }
    val before = bucketFiles()
    // batch 2: update k=1, insert k=4 — buckets of other keys untouched
    val b2 = Seq((1L, "A2"), (4L, "d")).toDF("k", "v")
    Thread.sleep(20) // mtime resolution guard
    doFull(b2, 1L); doBkt(b2, 1L)
    val after = bucketFiles()
    def kb(k: Long): Int = {
      import org.apache.spark.sql.functions.{pmod, xxhash64, lit => l}
      Seq(Tuple1(k)).toDF("k")
        .select(pmod(xxhash64(col("k")), l(8L)).cast("int")).as[Int].head()
    }
    val touched = Set(kb(1L), kb(4L)).map(c => s"__kb=$c")
    before.keys.filterNot(touched).foreach { d =>
      assert(after(d) == before(d),
        s"untouched bucket $d was rewritten: ${before(d)} -> ${after(d)}")
    }
    touched.foreach { d =>
      assert(after.contains(d), s"changed bucket $d missing after merge")
    }
    // result equality with the full-rewrite sink (timestamps excluded:
    // the two sinks stamp at their own instants)
    val a = spark.read.parquet(full).select("k", "v", "id", "row_hash")
      .as[(Long, String, Long, String)].collect().toSet
    val b = spark.read.parquet(bkt).select("k", "v", "id", "row_hash")
      .as[(Long, String, Long, String)].collect().toSet
    assert(a == b, s"full $a\nbucketed $b")
    // global id minting: k=4's id is above EVERY bucket's max, not the
    // slice's (6 distinct ids for 6 keys)
    assert(spark.read.parquet(bkt).select("id").as[Long].collect().toSet
      .size == 6)
  }

  test("mergeEachBatchBucketed: id watermark sidecar == full-scan max " +
      "after every batch; migration from a sidecar-less target repairs " +
      "from footer stats") {
    // r16 (VERDICT r15 §next-2): minting is metadata-cheap — the sidecar
    // IS the watermark, pinned equal to the O(target) scan it replaces.
    val dir = Files.createTempDirectory("graft-bkt-sidecar").toString
    val tgt = s"$dir/t"
    val fn = Streams.mergeEachBatchBucketed(tgt, Seq("k"), nBuckets = 8)
    def scanMax() = spark.read.parquet(tgt).agg(max("id")).head().getLong(0)
    def sidecar() = Streams.readMaxIdSidecar(spark, tgt)
    fn(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), 0L)
    assert(sidecar().contains(scanMax()), s"${sidecar()} vs ${scanMax()}")
    fn(Seq((2L, "B"), (4L, "d"), (5L, "e")).toDF("k", "v"), 1L) // upd + 2 ins
    assert(sidecar().contains(scanMax()), s"${sidecar()} vs ${scanMax()}")
    assert(sidecar().contains(5L))
    // migration: an r15-era target has no sidecar — delete it; the next
    // batch must repair the watermark from parquet footer statistics
    // (Sinks.parquetMaxLong), not mint colliding ids
    assert(new java.io.File(tgt, "_graft_max_id").delete())
    assert(graft.pipeline.Sinks.parquetMaxLong(spark, tgt, "id")
      .contains(5L)) // footers alone recover the true max
    fn(Seq((6L, "f")).toDF("k", "v"), 2L)
    assert(sidecar().contains(6L) && scanMax() == 6L)
    val ids = spark.read.parquet(tgt).select("id").as[Long].collect()
    assert(ids.length == 6 && ids.toSet.size == 6, ids.toSeq)
  }

  test("mergeEachBatchBucketed: foreachBatch replay converges to the " +
      "full-rewrite truth from every crash point, ids never collide") {
    // r16 (VERDICT r15 §next-5): the q_stream_jdbc_cdc_gate treatment for
    // the parquet sink — simulate the crash states our commit protocol
    // can leave (sidecar reserved but nothing committed; PARTIAL dynamic-
    // partition commit with only one changed bucket swapped), then let
    // the foreachBatch replay run and pin convergence.
    def copyTree(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        src.listFiles().foreach(f => copyTree(f, new java.io.File(dst, f.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // plant a sidecar value out-of-band (the crash simulator's hand):
    // drop Hadoop's local-FS .crc twin too, or the next read trips a
    // ChecksumException instead of reading the planted value
    def plantSidecar(target: String, v: Long): Unit = {
      new java.io.File(target, "._graft_max_id.crc").delete()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(target, "_graft_max_id"),
        v.toString.getBytes)
    }
    val dir = Files.createTempDirectory("graft-bkt-crash").toString
    val b1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (10L, "j")).toDF("k", "v")
    val b2 = Seq((1L, "A2"), (4L, "d"), (5L, "e")).toDF("k", "v")
    // truth: the same batches through the sink with no crash
    val truthT = s"$dir/truth"
    val truthFn = Streams.mergeEachBatchBucketed(truthT, Seq("k"), 8)
    truthFn(b1, 0L); truthFn(b2, 1L)
    def state(p: String) = spark.read.parquet(p)
      .select("k", "v", "row_hash").as[(Long, String, String)].collect().toSet
    val truth = state(truthT)
    def assertConverged(p: String): Unit = {
      assert(state(p) == truth, s"diverged: ${state(p)}\nvs $truth")
      val ids = spark.read.parquet(p).select("id").as[Long].collect()
      assert(ids.toSet.size == ids.length, s"id collision: ${ids.toSeq}")
      assert(Streams.readMaxIdSidecar(spark, p).exists(_ >= ids.max))
    }
    // crash point A: sidecar bumped (range reserved), commit never ran.
    // Replay sees the old data + an inflated watermark -> id gap, no dupes.
    val tA = s"$dir/crashA"
    val fnA = Streams.mergeEachBatchBucketed(tA, Seq("k"), 8)
    fnA(b1, 0L)
    plantSidecar(tA, 7L) // 4 rows committed, batch 2's 3-id range reserved
    fnA(b2, 1L) // the replay
    assertConverged(tA)
    // crash point B: partial dynamic-partition commit — build the state
    // "sidecar bumped + exactly ONE changed bucket swapped in" by copying
    // that bucket dir from a completed run over a pre-batch-2 copy.
    val (tDone, tB) = (s"$dir/done", s"$dir/crashB")
    val doneFn = Streams.mergeEachBatchBucketed(tDone, Seq("k"), 8)
    doneFn(b1, 0L)
    copyTree(new java.io.File(tDone), new java.io.File(tB)) // pre-batch-2
    doneFn(b2, 1L) // complete the real run
    val changedBuckets = new java.io.File(tDone).listFiles()
      .filter(_.getName.startsWith("__kb=")).map(_.getName).filter { n =>
        val pre = new java.io.File(tB, n)
        !pre.exists() ||
          pre.listFiles().map(_.getName).toSet !=
            new java.io.File(tDone, n).listFiles().map(_.getName).toSet
      }
    assert(changedBuckets.length >= 2, // need a genuinely partial state
      s"fixture too small: ${changedBuckets.toSeq}")
    val committed = changedBuckets.head
    val pre = new java.io.File(tB, committed)
    if (pre.exists()) pre.listFiles().foreach(_.delete())
    copyTree(new java.io.File(tDone, committed), pre)
    plantSidecar(tB, // the bumped (reserved) watermark of the real run
      Streams.readMaxIdSidecar(spark, tDone).get)
    val fnB = Streams.mergeEachBatchBucketed(tB, Seq("k"), 8)
    fnB(b2, 1L) // the replay over the half-committed state
    assertConverged(tB)
    // sanity: a plain replay of a fully committed batch is also stable
    fnB(b2, 1L)
    assertConverged(tB)
  }

  test("cdcToJdbcEachBatchExactlyOnce: replayed batch ids are no-ops, " +
      "per-batch timestamps, converged target") {
    // r15 (VERDICT r14 §next-4): the exactly-once JDBC CDC sink — drive
    // the foreachBatch function directly (the replay semantics live in
    // the function, not the stream machinery) with an explicit replay
    // of a committed batch id, the crash foreachBatch can hand us.
    val url = s"jdbc:derby:memory:graftxostrm${System.nanoTime()};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
    val tgt0 = graft.functions.RowHash.withAuditColumns(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"), t0)
    graft.pipeline.Sinks.jdbcWrite(tgt0, url, "TGT", props,
      columnTypes = Some("k BIGINT, v VARCHAR(32), id BIGINT, " +
        "row_hash VARCHAR(64)"))
    // per-batch timestamp supplier (ADVICE r14): batch n stamps month n+2
    val nowFor = (batchId: Long) => java.sql.Timestamp.from(
      java.time.Instant.parse(f"2026-${batchId + 2}%02d-01T00:00:00Z"))
    val fn = Streams.cdcToJdbcEachBatchExactlyOnce(url, "TGT", Seq("k"),
      props, nowFor)
    fn(Seq((1L, "A"), (3L, "c")).toDF("k", "v"), 0L) // update + insert
    fn(Seq((1L, "A"), (3L, "c")).toDF("k", "v"), 0L) // foreachBatch replay
    fn(Seq((4L, "d")).toDF("k", "v"), 1L)
    val back = spark.read.jdbc(url, "TGT", props)
    val rows = back.select(col("k"), col("v"),
        col("updated_at").cast("string"))
      .as[(Long, String, String)].collect()
    assert(rows.length == 4, s"replay duplicated rows: ${rows.toSeq}")
    val byK = rows.map(r => r._1 -> r).toMap
    assert(byK(1L)._2 == "A" && byK(1L)._3.startsWith("2026-02"))
    assert(byK(2L)._2 == "b" && byK(2L)._3.startsWith("2026-01"))
    assert(byK(3L)._3.startsWith("2026-02")) // batch 0's stamp
    assert(byK(4L)._3.startsWith("2026-03")) // batch 1's stamp, not batch 0's
    // ids stayed unique and dense above the bootstrap max
    val ids = back.select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L), ids.toSeq)
  }

  test("dedupAgainstIndexEachBatch drops cross-batch and in-batch dups") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream-dedup").toString
    val (idx, acc) = (s"$dir/idx", s"$dir/accepted")
    val mem = MemoryStream[(Long, String)]
    val ingest = Streams.dedupAgainstIndexEachBatch(idx, acc, "doc_id", "text")
    val q = mem.toDF().toDF("doc_id", "text").writeStream.foreachBatch(ingest).start()
    try {
      mem.addData(
        1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "the quick brown fox jumps over the lazy dog", // in-batch dup of 1
        3L -> "completely different text about spark engines")
      q.processAllAvailable()
      mem.addData(
        4L -> "the quick brown fox jumps over the lazy dog", // dup of accepted 1
        5L -> "fresh content that matches nothing accepted so far")
      q.processAllAvailable()
      val ids = spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L, 5L), ids.toSeq.sorted.mkString(", "))
      // index carries exactly the accepted docs' signatures
      val idxIds = spark.read.parquet(idx).select("id").as[Long].collect().toSet
      assert(idxIds == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("dedupAgainstIndexEachBatch: clean hook scrubs before dedup; PII variants merge") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream-dedup-clean").toString
    val (idx, acc) = (s"$dir/idx", s"$dir/accepted")
    val mem = MemoryStream[(Long, String)]
    val ingest = Streams.dedupAgainstIndexEachBatch(idx, acc, "doc_id", "text",
      clean = df => df.withColumn("text",
        graft.operators.TextAnalysis.redactPii(col("text"))))
    val q = mem.toDF().toDF("doc_id", "text").writeStream.foreachBatch(ingest).start()
    try {
      // same page scraped twice with different visitor emails: identical
      // AFTER the scrub, so the second copy dedups; raw dedup would keep both
      mem.addData(
        1L -> "contact alice@a.example for the offer details today",
        2L -> "contact bob.b@b.example for the offer details today",
        3L -> "totally unrelated document body with no addresses")
      q.processAllAvailable()
      val rows = spark.read.parquet(acc).select("doc_id", "text")
        .as[(Long, String)].collect().toMap
      assert(rows.keySet == Set(1L, 3L), rows.keys.toSeq.sorted.mkString(", "))
      // accepted text is the CLEANED text (scrub happened before the write)
      assert(rows(1L) == "contact <EMAIL> for the offer details today")
      // a clean() that drops the text column fails loudly
      val bad = Streams.dedupAgainstIndexEachBatch(idx, s"$dir/acc2", "doc_id",
        "text", clean = df => df.drop("text"))
      val ex = intercept[IllegalArgumentException] {
        bad(Seq(9L -> "x").toDF("doc_id", "text"), 99L)
      }
      assert(ex.getMessage.contains("must preserve"))
    } finally q.stop()
  }

  test("dedupAgainstIndexEachBatch: replayed batch ids are idempotent (at-least-once safe)") {
    val dir = Files.createTempDirectory("stream-dedup-replay").toString
    val (idx, acc) = (s"$dir/idx", s"$dir/accepted")
    val ingest = Streams.dedupAgainstIndexEachBatch(idx, acc, "doc_id", "text")
    val b0 = Seq(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "completely different text about spark engines")
      .toDF("doc_id", "text")
    ingest(b0, 0L)
    ingest(b0, 0L) // foreachBatch replay after a crash: same batch id again
    val ids = spark.read.parquet(acc).select("doc_id").as[Long].collect().toList
    assert(ids.sorted == List(1L, 2L), s"replay duplicated accepted rows: $ids")
    val idxRows = spark.read.parquet(idx).select("id").as[Long].collect().toList
    assert(idxRows.sorted == List(1L, 2L), s"replay duplicated index rows: $idxRows")
    // crash between the two writes: accepted committed, index partition
    // missing — the replay must complete the index from the accepted data
    graft.pipeline.Sinks.drop(spark, s"$idx/__ingest_batch=0")
    ingest(b0, 0L)
    val healed = spark.read.parquet(idx).select("id").as[Long].collect().toList
    assert(healed.sorted == List(1L, 2L), s"index not healed: $healed")
    // and accepted rows were not touched by the healing replay
    val ids2 = spark.read.parquet(acc).select("doc_id").as[Long].collect().toList
    assert(ids2.sorted == List(1L, 2L))
  }

  test("dedupAgainstIndexEachBatch: manifest commits BEFORE _SUCCESS; marker-less dirs replay clean") {
    val dir = Files.createTempDirectory("stream-dedup-atomic").toString
    val (idx, acc) = (s"$dir/idx", s"$dir/accepted")
    val ingest = Streams.dedupAgainstIndexEachBatch(idx, acc, "doc_id", "text")
    val b0 = Seq(1L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    ingest(b0, 0L)
    val bdir = new java.io.File(s"$acc/__ingest_batch=0")
    def names() = bdir.listFiles().map(_.getName).toSet
    // commit protocol invariant: a committed dir carries BOTH markers
    // (v2 format since r16 — ADVICE r15 manifest versioning)
    assert(names().exists(_.startsWith("_manifest2-")), names().mkString(", "))
    assert(names().contains("_SUCCESS"))
    // simulate a crash just before the _SUCCESS touch: data + manifest
    // written, marker missing, index partition never written
    assert(new java.io.File(bdir, "_SUCCESS").delete())
    graft.pipeline.Sinks.drop(spark, s"$idx/__ingest_batch=0")
    ingest(b0, 0L) // replay treats the dir as uncommitted and overwrites it
    assert(names().contains("_SUCCESS"))
    assert(names().exists(_.startsWith("_manifest2-")))
    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().toList == List(1L))
    assert(spark.read.parquet(idx).select("id").as[Long].collect().toList == List(1L))
  }

  test("dedupAgainstIndexEachBatch: _SUCCESS without a manifest fails loudly (no backfill)") {
    // ADVICE r7: the old backfill stamped the CURRENT batch's content over
    // the hole, so a reset-lineage id colliding with such a dir silently
    // dropped its own data. The commit order now makes the state
    // unreachable from this code; encountering it means foreign writes.
    val dir = Files.createTempDirectory("stream-dedup-nomanifest").toString
    val (idx, acc) = (s"$dir/idx", s"$dir/accepted")
    val ingest = Streams.dedupAgainstIndexEachBatch(idx, acc, "doc_id", "text")
    val b0 = Seq(1L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    ingest(b0, 0L)
    val bdir = new java.io.File(s"$acc/__ingest_batch=0")
    bdir.listFiles().filter(_.getName.startsWith("_manifest")).foreach(f => assert(f.delete()))
    val ex = intercept[IllegalStateException] { ingest(b0, 0L) }
    assert(ex.getMessage.contains("no _manifest"), ex.getMessage)
    // operator-blessed migration marker waives the content check instead
    new java.io.File(bdir, "_manifest-migrated").createNewFile()
    ingest(b0, 0L) // replay-skip, no exception
    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().toList == List(1L))
  }

  test("dedupAgainstIndexEachBatch: a legacy v1 manifest (pre-upgrade " +
      "space-separator formula) is accepted on replay and upgraded to v2") {
    // ADVICE r15 (medium): changing the signature separator invalidated
    // every pre-upgrade marker — a legitimate replay of an already-
    // committed batch then halted with the lineage error. The format is
    // now versioned: a v1 marker matching EITHER historical formula is
    // accepted and the dir upgraded in place.
    val dir = Files.createTempDirectory("stream-dedup-v1manifest").toString
    val (idx, acc) = (s"$dir/idx", s"$dir/accepted")
    val ingest = Streams.dedupAgainstIndexEachBatch(idx, acc, "doc_id", "text")
    val b0 = Seq(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "completely different text about spark engines").toDF("doc_id", "text")
    ingest(b0, 0L)
    val bdir = new java.io.File(s"$acc/__ingest_batch=0")
    // rewrite the committed dir as a pre-upgrade build would have left it:
    // v1 marker name, space-separated signature formula
    val legacySig = {
      val r = b0.agg(
        sum(xxhash64(concat_ws(" ", col("doc_id").cast("string"), col("text")))
          .cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n")).head()
      s"${r.getDecimal(0).toBigInteger.toString}_${r.getLong(1)}"
    }
    bdir.listFiles().filter(_.getName.startsWith("_manifest"))
      .foreach(f => assert(f.delete()))
    assert(new java.io.File(bdir, s"_manifest-$legacySig").createNewFile())
    ingest(b0, 0L) // the first replay after the upgrade: must NOT halt
    val names = bdir.listFiles().map(_.getName).toSet
    assert(names.exists(_.startsWith("_manifest2-")), names.mkString(", "))
    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().sorted
      .toList == List(1L, 2L))
    // but a v1 marker matching NEITHER formula is still a foreign lineage
    bdir.listFiles().filter(_.getName.startsWith("_manifest"))
      .foreach(f => assert(f.delete()))
    assert(new java.io.File(bdir, "_manifest-12345_2").createNewFile())
    val ex = intercept[IllegalStateException] { ingest(b0, 0L) }
    assert(ex.getMessage.contains("neither signature formula"), ex.getMessage)
  }

  test("dedupAgainstIndexEachBatch: legacy flat sink layout fails with a migration message") {
    val dir = Files.createTempDirectory("stream-dedup-flat").toString
    val (idx, acc) = (s"$dir/idx", s"$dir/accepted")
    // a pre-batch-dir sink: root-level part files, no __ingest_batch dirs
    Seq(1L -> "old flat layout doc").toDF("doc_id", "text")
      .write.mode("overwrite").parquet(acc)
    val ingest = Streams.dedupAgainstIndexEachBatch(idx, acc, "doc_id", "text")
    val ex = intercept[IllegalStateException] {
      ingest(Seq(2L -> "new doc").toDF("doc_id", "text"), 0L)
    }
    assert(ex.getMessage.contains("root-level part files"), ex.getMessage)
    assert(ex.getMessage.contains("__ingest_batch=-1"), ex.getMessage)
  }

  test("dedupAgainstIndexEachBatch: a colliding batch id with different content fails loudly") {
    // a stream restarted from a lost checkpoint renumbers batches from 0 —
    // re-using old sink dirs must NOT silently skip the new data as a replay
    val dir = Files.createTempDirectory("stream-dedup-lineage").toString
    val (idx, acc) = (s"$dir/idx", s"$dir/accepted")
    val ingest = Streams.dedupAgainstIndexEachBatch(idx, acc, "doc_id", "text")
    ingest(Seq(1L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text"), 0L)
    val ex = intercept[IllegalStateException] {
      ingest(Seq(99L -> "entirely new content from a different stream lineage")
        .toDF("doc_id", "text"), 0L)
    }
    assert(ex.getMessage.contains("checkpoint lineage"), ex.getMessage)
  }

  test("compact: per-batch index dirs collapse; probe results unchanged; appends continue") {
    val dir = Files.createTempDirectory("stream-dedup-compact").toString
    val (idx, acc) = (s"$dir/idx", s"$dir/accepted")
    val ingest = Streams.dedupAgainstIndexEachBatch(idx, acc, "doc_id", "text")
    ingest(Seq(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "completely different text about spark engines").toDF("doc_id", "text"), 0L)
    ingest(Seq(3L -> "yet another body of text that matches nothing").toDF("doc_id", "text"), 1L)
    def probeIds() = graft.operators.Dedup.minHashProbeIndex(spark, idx,
        Seq(10L -> "the quick brown fox jumps over the lazy dog").toDF("doc_id", "text"),
        "doc_id", "text", minEstJaccard = 0.9)
      .select("corpus_id").as[Long].collect().toSet
    val before = spark.read.parquet(idx).select("id", "sig").collect().toSet
    val probesBefore = probeIds()
    assert(probesBefore == Set(1L))
    val n = graft.pipeline.Sinks.compact(spark, idx)
    assert(n == 3)
    // layout collapsed into the reserved compaction partition
    val parts = new java.io.File(idx).listFiles().map(_.getName)
      .filter(_.startsWith("__ingest_batch=")).toSet
    assert(parts == Set("__ingest_batch=-1"), parts.mkString(", "))
    assert(spark.read.parquet(idx).select("id", "sig").collect().toSet == before)
    assert(probeIds() == probesBefore)
    // ingest keeps working against the compacted index
    ingest(Seq(4L -> "the quick brown fox jumps over the lazy dog").toDF("doc_id", "text"), 2L)
    val ids = spark.read.parquet(idx).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L)) // 4 is a dup of 1 -> rejected by the probe
  }

  test("readTableStream normalizes NTZ, nanos-Long, and LTZ ts through the watermark path") {
    // VERDICT r8 §next-3: a fixture regeneration flipped events.ts from
    // nanos-as-Long to TIMESTAMP_NTZ and `withWatermark` rejected it with
    // no in-repo signal. Pin all three physical encodings a parquet writer
    // can produce: each must scan to TIMESTAMP (LTZ) and drain the SAME
    // windowed answer end-to-end (session TZ is UTC, so wall-clock — and
    // the window boundaries — are identical across encodings).
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType, LongType}
    val root = Files.createTempDirectory("graft-ts-types")
    val base = Seq(
      (1L, 10L, "click", ts("2024-01-01 01:00:00"), 1.5),
      (2L, 10L, "click", ts("2024-01-01 02:00:00"), 2.5),
      (3L, 11L, "view", ts("2024-01-01 03:00:00"), 3.0),
      (4L, 11L, "click", ts("2024-01-02 01:00:00"), 4.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val encodings = Map(
      "ntz" -> base.withColumn("ts", col("ts").cast("timestamp_ntz")),
      "ltz" -> base,
      "nanos" -> base.withColumn("ts",
        unix_micros(col("ts")) * 1000)) // epoch-nanos as Long
    val expectedScanTypes =
      Map("ntz" -> TimestampNTZType, "ltz" -> TimestampType, "nanos" -> LongType)
    val drained = encodings.map { case (enc, df) =>
      val dir = s"$root/$enc"
      // the driver fixture is a single FILE named events.parquet (the
      // readTableStream glob matches leaf file names) — collapse the
      // df.write directory to that shape
      df.coalesce(1).write.parquet(s"$dir/__staging")
      val part = new java.io.File(s"$dir/__staging").listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.createDirectories(java.nio.file.Paths.get(dir))
      assert(part.renameTo(new java.io.File(s"$dir/events.parquet")))
      // the raw scan really exercises the encoding under test …
      assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
        expectedScanTypes(enc), s"fixture encoding drifted for $enc")
      val stream = Streams.readTableStream(spark, dir, "events")
      // … and the normalized stream is always watermark-legal TIMESTAMP
      assert(stream.schema("ts").dataType == TimestampType,
        s"$enc: ts is ${stream.schema("ts").dataType}, watermark would reject it")
      val sink = s"ts_types_$enc"
      val q = Streams.windowedCounts(stream, "ts", "event_type",
          windowLen = "1 day", lateness = "1 hour", amountCol = Some("value"))
        .writeStream.format("memory").queryName(sink).outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      enc -> spark.table(sink)
        .select(col("window_start").cast("string"), col("event_type"),
          col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
    }
    assert(drained("ntz") == drained("ltz"), "NTZ and LTZ windows disagree")
    assert(drained("nanos") == drained("ltz"), "nanos-Long and LTZ windows disagree")
    assert(drained("ltz").contains(("2024-01-01 00:00:00", "click", 2L, 4.0)))
    // the stream-stream horizon join accepts the normalized NTZ source too
    val ntzDir = s"$root/ntz"
    val clicks = Streams.readTableStream(spark, ntzDir, "events")
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val views = Streams.readTableStream(spark, ntzDir, "events")
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
    val jq = Streams.joinWithinHorizon(clicks, views, Seq("user_id"),
        "click_ts", "view_ts", maxLag = "30 minutes", lateness = "3650 days")
      .writeStream.format("memory").queryName("ts_types_join").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    jq.awaitTermination()
    // no view within 30 min before any click in the fixture → 0 matches,
    // but the query PLANNED and DRAINED over the NTZ-scanned source
    assert(spark.table("ts_types_join").count() == 0)
  }

  test("q_stream_daily_window: file-stream execution equals the batch answer") {
    val d = "/root/testdata/sf0.001"
    val streamed = SparkEntry.queries("q_stream_daily_window")(spark, d)
      .select(col("day").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    val batch = SparkEntry.queries("q_events_daily_window")(spark, d)
      .select(col("day").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  // ---- exactly-once appends for the ADDITIVE sketch indexes (r17,
  // VERDICT r16 §next-3): a foreachBatch crash hands the replay the same
  // batch id — for each family, drive the double delivery AND the
  // crash-between-data-and-marker state through the tagged append, and
  // pin estimate-before == estimate-after. The marker deletion below IS
  // the crash simulator's hand: data files committed, marker never
  // written (the widest double-append window the protocol closes).

  /** Delete the `_committed` marker(s) for `tag` — the crash state. */
  private def dropMarker(dir: String, tag: String): Unit = {
    val d = new java.io.File(dir, "_committed")
    d.listFiles().filter(_.getName.startsWith(s"$tag-")).foreach { f =>
      assert(f.delete(), f.toString)
    }
  }

  test("cmsAppendIndex batchTag: replay no-ops, crash state converges, " +
      "marker survives compaction, lineage mismatch is loud") {
    import graft.operators.Skew
    val dir = Files.createTempDirectory("graft-cms-replay").toString
    Skew.cmsWriteIndex(Seq(1L, 1L, 2L).toDF("k"), "k", dir)
    val b1 = Seq(1L, 3L, 3L).toDF("k")
    def est() = Skew.cmsEstimateIndex(spark, dir,
        Seq(1L, 2L, 3L).toDF("k"), "k")
      .as[(Long, Long)].collect().toMap
    Skew.cmsAppendIndex(b1, dir, Some("0"))
    val truth = est()
    assert(truth == Map(1L -> 3L, 2L -> 1L, 3L -> 2L), truth)
    // double delivery of a committed batch: no-op
    Skew.cmsAppendIndex(b1, dir, Some("0"))
    assert(est() == truth)
    // crash point: batch data committed, marker never written — the
    // replay must first clear the partial commit, then land exactly once
    dropMarker(dir, "0")
    Skew.cmsAppendIndex(b1, dir, Some("0"))
    assert(est() == truth)
    // compaction folds the batch files; the marker SURVIVES in
    // _committed, so a post-compaction replay is still a no-op (without
    // this, a crash in the same foreachBatch that ran the compaction
    // would re-append rows the compacted sketch already contains)
    Skew.cmsCompactIndex(spark, dir)
    Skew.cmsAppendIndex(b1, dir, Some("0"))
    assert(est() == truth)
    // reset-lineage guard: same tag, different content fails loudly
    val e = intercept[IllegalStateException] {
      Skew.cmsAppendIndex(Seq(9L).toDF("k"), dir, Some("0"))
    }
    assert(e.getMessage.contains("DIFFERENT content"), e.getMessage)
    // an untagged append still works alongside (single-writer semantics)
    Skew.cmsAppendIndex(Seq(2L).toDF("k"), dir)
    assert(est() == Map(1L -> 3L, 2L -> 2L, 3L -> 2L))
  }

  test("kllAppendIndex batchTag: replayed batch does not double-weight " +
      "the distribution") {
    import graft.operators.Profile
    val dir = Files.createTempDirectory("graft-kll-replay").toString
    Profile.kllWriteIndex(Seq(1L, 2L, 3L).toDF("v"), Seq("v"), dir)
    val b1 = Seq(10L, 11L).toDF("v")
    def q() = Profile.kllQuantilesIndex(spark, dir, Seq(0.5, 1.0))
      .select("q", "value", "n").as[(Double, Long, Long)].collect().toSeq
    Profile.kllAppendIndex(b1, dir, Some("7"))
    val truth = q()
    assert(truth.forall(_._3 == 5L), truth) // 3 base + 2 appended, once
    Profile.kllAppendIndex(b1, dir, Some("7")) // replay: no-op
    assert(q() == truth)
    dropMarker(dir, "7") // crash state: data landed, marker lost
    Profile.kllAppendIndex(b1, dir, Some("7"))
    assert(q() == truth)
    val e = intercept[IllegalStateException] {
      Profile.kllAppendIndex(Seq(99L).toDF("v"), dir, Some("7"))
    }
    assert(e.getMessage.contains("DIFFERENT content"), e.getMessage)
  }

  test("webGraph appendIndex batchTag: replayed edge partials do not " +
      "double weights; crash state converges") {
    import graft.operators.WebGraph
    val dir = Files.createTempDirectory("graft-web-replay").toString
    WebGraph.writeIndex(
      Seq(("a", "b", 2L)).toDF("src_host", "dst_host", "weight"), dir)
    val b1 = Seq(("a", "b", 3L), ("b", "c", 1L))
      .toDF("src_host", "dst_host", "weight")
    def edges() = WebGraph.readIndexEdges(spark, dir)
      .as[(String, String, Long)].collect().toSet
    WebGraph.appendIndex(b1, dir, batchTag = Some("0"))
    val truth = Set(("a", "b", 5L), ("b", "c", 1L))
    assert(edges() == truth)
    WebGraph.appendIndex(b1, dir, batchTag = Some("0")) // replay: no-op
    assert(edges() == truth)
    dropMarker(dir, "0") // crash: data committed, marker lost
    WebGraph.appendIndex(b1, dir, batchTag = Some("0"))
    assert(edges() == truth)
    WebGraph.compactIndex(spark, dir)
    WebGraph.appendIndex(b1, dir, batchTag = Some("0")) // post-compact
    assert(edges() == truth)
    val e = intercept[IllegalStateException] {
      WebGraph.appendIndex(Seq(("x", "y", 9L))
        .toDF("src_host", "dst_host", "weight"), dir, batchTag = Some("0"))
    }
    assert(e.getMessage.contains("DIFFERENT content"), e.getMessage)
  }

  test("bm25AppendIndex batchTag: replay no-ops across all THREE dirs " +
      "(bucketed postings/terms + stats); crash state converges") {
    import graft.operators.TextAnalysis
    val dir = Files.createTempDirectory("graft-bm25-replay").toString + "/idx"
    TextAnalysis.bm25WriteIndex(
      Seq((1L, "alpha beta gamma"), (2L, "beta delta"))
        .toDF("doc_id", "text"), "doc_id", "text", dir, nBuckets = 4)
    val b1 = Seq((3L, "alpha alpha epsilon")).toDF("doc_id", "text")
    def state() = (
      spark.read.parquet(s"$dir/postings").count(),
      spark.read.parquet(s"$dir/terms")
        .groupBy("term").agg(sum("dfreq").as("df"))
        .as[(String, Long)].collect().toMap,
      spark.read.parquet(s"$dir/stats")
        .agg(sum("n_docs"), sum("total_dl")).as[(Long, Long)].head())
    TextAnalysis.bm25AppendIndex(b1, "doc_id", "text", dir, Some("5"))
    val truth = state()
    assert(truth._3 == ((3L, 8L)), truth._3) // 3 docs, 8 tokens total
    assert(truth._2("alpha") == 2L, truth._2)
    TextAnalysis.bm25AppendIndex(b1, "doc_id", "text", dir, Some("5"))
    assert(state() == truth) // replay: no-op in every dir
    dropMarker(dir, "5") // crash after data, before marker
    TextAnalysis.bm25AppendIndex(b1, "doc_id", "text", dir, Some("5"))
    assert(state() == truth)
    val e = intercept[IllegalStateException] {
      TextAnalysis.bm25AppendIndex(Seq((9L, "zeta")).toDF("doc_id", "text"),
        "doc_id", "text", dir, Some("5"))
    }
    assert(e.getMessage.contains("DIFFERENT content"), e.getMessage)
  }

  test("substringAppendIndex batchTag: replayed fp partials do not " +
      "double window counts") {
    import graft.operators.Dedup
    val dir = Files.createTempDirectory("graft-sub-replay").toString
    Dedup.substringWriteIndex(
      Seq((1L, "one two three four five")).toDF("doc_id", "text"),
      "doc_id", "text", minTokens = 4, dir)
    val b1 = Seq((2L, "six seven eight nine ten")).toDF("doc_id", "text")
    def cnt() = spark.read.parquet(s"$dir/fps")
      .agg(sum("cnt")).as[Long].head()
    Dedup.substringAppendIndex(b1, "doc_id", "text", dir, Some("0"))
    val truth = cnt()
    Dedup.substringAppendIndex(b1, "doc_id", "text", dir, Some("0"))
    assert(cnt() == truth) // replay: no-op
    dropMarker(dir, "0")
    Dedup.substringAppendIndex(b1, "doc_id", "text", dir, Some("0"))
    assert(cnt() == truth)
    val e = intercept[IllegalStateException] {
      Dedup.substringAppendIndex(Seq((3L, "a b c d e"))
        .toDF("doc_id", "text"), "doc_id", "text", dir, Some("0"))
    }
    assert(e.getMessage.contains("DIFFERENT content"), e.getMessage)
  }

  test("componentsAppendIndex batchTag: replay no-ops over both dirs, " +
      "crash state converges, no duplicate label rows") {
    import graft.operators.Dedup
    val dir = Files.createTempDirectory("graft-cc-replay").toString
    Dedup.componentsWriteIndex(
      Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b"), dir)
    val b1 = Seq((20L, 21L), (2L, 10L)).toDF("id_a", "id_b")
    def groups() = Dedup.componentsIndexedGroups(spark, dir)
      .as[(Long, Long)].collect().toMap
    def labelRows() = spark.read.parquet(s"$dir/labels").count()
    val (n1, m1) = Dedup.componentsAppendIndex(b1, dir, batchTag = Some("0"))
    assert((n1, m1) == ((2L, 1L)), s"($n1, $m1)")
    val truth = groups()
    assert(truth == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 20L, 21L -> 20L), truth)
    val nLabels = labelRows()
    // double delivery: (0, 0), nothing duplicated
    assert(Dedup.componentsAppendIndex(b1, dir, batchTag = Some("0")) ==
      ((0L, 0L)))
    assert(groups() == truth && labelRows() == nLabels)
    // crash state: labels + relabels committed, marker lost — the replay
    // clears the partial files FIRST (so its recomputation reads the
    // pre-batch state) and lands exactly one copy of both
    dropMarker(dir, "0")
    Dedup.componentsAppendIndex(b1, dir, batchTag = Some("0"))
    assert(groups() == truth && labelRows() == nLabels)
    val e = intercept[IllegalStateException] {
      Dedup.componentsAppendIndex(Seq((5L, 6L)).toDF("id_a", "id_b"), dir,
        batchTag = Some("0"))
    }
    assert(e.getMessage.contains("DIFFERENT content"), e.getMessage)
  }

  // ---- exactly-once for the ROW-append vector-index families (late r17):
  // IVF vectors, PQ/OPQ codes, SemDeDup assignments. Unlike the additive
  // sketches, a double-appended batch here duplicates whole rows — the
  // same id fills two top-k slots (displacing a true neighbor), and a
  // SemDeDup duplicate is its own nearest neighbor at cosine 1.0, so it
  // deletes a unique document from the kept set. The marker contract adds
  // one family-specific leg: these indexes keep data AT the root, so the
  // RETRAIN compaction's staged swap must carry `_committed` forward
  // (preserveMarkers) or a post-retrain replay re-appends rows the
  // retrain already folded in.

  test("ivfAppendIndex batchTag: replayed vector batch does not duplicate " +
      "rows; markers survive ivfRetrainCompact's staged swap") {
    import graft.operators.Similarity
    val dir = Files.createTempDirectory("graft-ivf-replay").toString + "/idx"
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 8, dim = 8)
    Similarity.ivfWriteIndex(fix.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", dim = 8, nCentroids = 4, dir)
    val b1 = fix.filter($"vec_id" % 2 =!= 0)
    def rowCounts() = spark.read.parquet(dir).groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    Similarity.ivfAppendIndex(b1, "vec_id", "embedding", dir, Some("0"))
    val truth = rowCounts()
    assert(truth.size == 32 && truth.values.forall(_ == 1L), truth)
    Similarity.ivfAppendIndex(b1, "vec_id", "embedding", dir, Some("0"))
    assert(rowCounts() == truth) // replay: no-op
    dropMarker(dir, "0") // crash: cell files committed, marker lost
    Similarity.ivfAppendIndex(b1, "vec_id", "embedding", dir, Some("0"))
    assert(rowCounts() == truth)
    // retrain reassigns every row and swaps the root; the marker must
    // ride the swap so the replay below still no-ops
    Similarity.ivfRetrainCompact(spark, dir, dim = 8)
    Similarity.ivfAppendIndex(b1, "vec_id", "embedding", dir, Some("0"))
    assert(rowCounts().values.toSeq.sorted ==
      truth.values.toSeq.sorted && rowCounts().size == 32)
    val e = intercept[IllegalStateException] {
      Similarity.ivfAppendIndex(b1.limit(3), "vec_id", "embedding", dir,
        Some("0"))
    }
    assert(e.getMessage.contains("DIFFERENT content"), e.getMessage)
  }

  test("pq/opqAppendIndex batchTag: replayed code batch does not " +
      "duplicate ADC candidates; markers survive retrain compaction") {
    import graft.operators.{ProductQuantization => PQ, Similarity}
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 8, dim = 8)
    val base = fix.filter($"vec_id" % 2 === 0)
    val b1 = fix.filter($"vec_id" % 2 =!= 0)
    for (rotated <- Seq(false, true)) {
      val dir = Files.createTempDirectory(
        s"graft-pq-replay-$rotated").toString + "/idx"
      def append(tag: Option[String]) =
        if (rotated) PQ.opqAppendIndex(b1, "vec_id", "embedding", dir, tag)
        else PQ.pqAppendIndex(b1, "vec_id", "embedding", dir, tag)
      if (rotated)
        PQ.opqWriteIndex(base, "vec_id", "embedding", dim = 8, dir,
          m = 4, kCodewords = 8)
      else
        PQ.pqWriteIndex(base, "vec_id", "embedding", dim = 8, dir,
          m = 4, kCodewords = 8)
      def rowCounts() = spark.read.parquet(dir).groupBy("id").count()
        .as[(Long, Long)].collect().toMap
      append(Some("3"))
      val truth = rowCounts()
      assert(truth.size == 32 && truth.values.forall(_ == 1L), truth)
      append(Some("3")) // replay: no-op
      assert(rowCounts() == truth)
      dropMarker(dir, "3") // crash: codes committed, marker lost
      append(Some("3"))
      assert(rowCounts() == truth)
      // retrain re-encodes everything and swaps the root; markers ride
      if (rotated)
        PQ.opqRetrainCompact(fix, "vec_id", "embedding", dim = 8, dir,
          m = 4, kCodewords = 8)
      else
        PQ.pqRetrainCompact(fix, "vec_id", "embedding", dim = 8, dir,
          m = 4, kCodewords = 8)
      append(Some("3"))
      assert(rowCounts().size == 32 && // retrain encoded the full union
        rowCounts().values.forall(_ == 1L))
      val e = intercept[IllegalStateException] {
        if (rotated)
          PQ.opqAppendIndex(b1.limit(3), "vec_id", "embedding", dir, Some("3"))
        else PQ.pqAppendIndex(b1.limit(3), "vec_id", "embedding", dir, Some("3"))
      }
      assert(e.getMessage.contains("DIFFERENT content"), e.getMessage)
    }
  }

  test("semDedupAppendIndex batchTag: a replayed batch must not make a " +
      "document its own duplicate; markers survive retrain compaction") {
    import graft.operators.{SemDedup, Similarity}
    val dir = Files.createTempDirectory("graft-sem-replay").toString + "/idx"
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 8, dim = 8)
    SemDedup.semDedupWriteIndex(fix.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", dim = 8, nCentroids = 4, dir)
    val b1 = fix.filter($"vec_id" % 2 =!= 0)
    def rowCounts() = spark.read.parquet(dir).groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    SemDedup.semDedupAppendIndex(b1, "vec_id", "embedding", dir, Some("0"))
    val truth = rowCounts()
    assert(truth.size == 32 && truth.values.forall(_ == 1L), truth)
    SemDedup.semDedupAppendIndex(b1, "vec_id", "embedding", dir, Some("0"))
    assert(rowCounts() == truth) // replay: no-op — no self-duplicates
    dropMarker(dir, "0")
    SemDedup.semDedupAppendIndex(b1, "vec_id", "embedding", dir, Some("0"))
    assert(rowCounts() == truth)
    SemDedup.semDedupRetrainCompact(spark, dir)
    SemDedup.semDedupAppendIndex(b1, "vec_id", "embedding", dir, Some("0"))
    assert(rowCounts().size == 32 && rowCounts().values.forall(_ == 1L))
    val e = intercept[IllegalStateException] {
      SemDedup.semDedupAppendIndex(b1.limit(3), "vec_id", "embedding", dir,
        Some("0"))
    }
    assert(e.getMessage.contains("DIFFERENT content"), e.getMessage)
  }
}
