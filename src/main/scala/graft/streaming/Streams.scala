package graft.streaming

import graft.operators.Merge
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface.
  *
  * The reference has no streaming engine — its incremental sync is a
  * cron-able micro-batch (context/context.md:686-697). Here the same merge
  * semantics are hosted inside Structured Streaming: each micro-batch runs
  * the J2 hash-diff merge via `foreachBatch` (exactly the SURVEY.md §2.9
  * plan), and the analytics side gets event-time windowed aggregation with
  * watermarked late-data handling.
  *
  * Everything is expressed on the streaming DataFrame API, so the planner
  * runs the same incremental hash-aggregates at 100 TB/day rates: state is
  * bounded by (watermark horizon × group cardinality), never by stream
  * length.
  */
object Streams {

  /** Streaming scan of a fixture table — the file-source form of
    * [[graft.pipeline.TableSpec.read]], with the same TIMESTAMP(NANOS)→
    * micros conversion (sessions read nanos as Long; integer `div` keeps
    * epoch-nanos exact). The file source is the 100 TB ingest shape: new
    * parquet files land in the directory and each becomes (part of) a
    * micro-batch, with exactly-once tracking in the source log.
    *
    * Unlike the batch reader, `ts` must surface as TIMESTAMP (with
    * timezone): `withWatermark` rejects TIMESTAMP_NTZ. Depending on how the
    * fixture was written, the scan may yield nanos-as-Long or
    * TIMESTAMP_NTZ — both are normalized here. The session pins
    * `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast preserves
    * wall-clock values and window boundaries / date casts agree exactly
    * with the batch NTZ form (and the DuckDB oracle).
    */
  def readTableStream(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                      table: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val schema = spark.read.parquet(s"$sfDir/$table.parquet").schema
    val df = spark.readStream.schema(schema)
      .option("pathGlobFilter", s"$table.parquet").parquet(sfDir)
    if (table == "events" && schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (table == "events" && schema("ts").dataType == TimestampNTZType)
      df.withColumn("ts", col("ts").cast("timestamp"))
    else df
  }

  /** Event-time tumbling-window aggregation with a watermark: per
    * (window, key) row count + money sum. Late rows beyond `lateness` are
    * dropped deterministically; state is evicted once the watermark passes
    * the window end.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String = "1 day",
                     lateness: String = "1 hour",
                     amountCol: Option[String] = None): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n") +: amountCol.toSeq.map(a =>
      sum(col(a).cast("decimal(18,4)")).cast("double").as(s"sum_$a"))
    events.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start"))
      .drop("w")
  }

  /** Streaming dedup: drop duplicate KEYS within the watermark horizon —
    * the streaming analogue of exact dedup (state bounded by horizon).
    * Key-only: two events with the same key and different timestamps
    * count as duplicates (`dropDuplicatesWithinWatermark`), unlike
    * `dropDuplicates(keys :+ ts)` which only drops byte-identical replays.
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           keys: Seq[String], lateness: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, lateness).dropDuplicatesWithinWatermark(keys)

  /** Streaming CONTENT dedup: drop documents whose 64-bit SimHash already
    * arrived within the watermark horizon — catches byte-identical and
    * same-token-stream duplicates of streamed-in documents (the streaming
    * face of the batch dedup family). The signature is the native one-pass
    * expression, so the only added state is one long per distinct doc in
    * the horizon. Docs with no tokens share one dedup class (empty content
    * IS duplicate content): the first passes, later ones drop.
    */
  def dedupByContent(docs: DataFrame, tsCol: String, textCol: String,
                     lateness: String = "1 hour"): DataFrame = {
    val sig = graft.expressions.TextHashExpressions.simHash(col(textCol))
    val keyed = docs.withColumn("__sig", coalesce(sig, lit(Long.MinValue)))
      .withWatermark(tsCol, lateness)
    keyed.dropDuplicatesWithinWatermark(Seq("__sig")).drop("__sig")
  }

  /** Stream-static dimension enrichment: join a (possibly unbounded) event
    * stream against a bounded dimension table. The dim side is broadcast
    * per micro-batch — no stream-side shuffle, the standard enrich shape.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, keys: Seq[String],
                    joinType: String = "left_outer"): DataFrame =
    stream.join(broadcast(dim), keys, joinType)

  /** Stream-STREAM equi-join bounded by an event-time horizon: a left event
    * matches right events with the same keys whose timestamp lies in
    * [left.ts - maxLag, left.ts]. Both sides carry watermarks and the join
    * condition bounds the two event times against each other — exactly what
    * Spark's state cleanup needs to evict rows once the watermark passes
    * them, so state stays O(horizon × rate), not O(stream). Without the
    * time bound the state grows forever; this function makes the bound
    * unforgettable. Column names must be disjoint apart from `keys`.
    */
  def joinWithinHorizon(left: DataFrame, right: DataFrame, keys: Seq[String],
                        leftTs: String, rightTs: String, maxLag: String,
                        lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $maxLag") &&
      r(rightTs) <= l(leftTs)
    keys.foldLeft(l.join(r, cond, "inner"))((d, k) => d.drop(r(k)))
  }

  /** Open-session state for [[sessionizeStream]]. */
  case class SessionState(n: Long, start: java.sql.Timestamp, end: java.sql.Timestamp)
  /** A closed session emitted by [[sessionizeStream]]. */
  case class ClosedSession(user_id: Long, n_events: Long,
                           session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp)

  /** Streaming sessionization with custom state (`flatMapGroupsWithState`):
    * per user, events accumulate into an open session; a gap beyond
    * `gapSeconds` (or processing-time timeout when the stream goes quiet)
    * closes it and emits a [[ClosedSession]]. State per key is one open
    * session — bounded regardless of stream length.
    */
  def sessionizeStream(events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)],
                       gapSeconds: Long,
                       idleTimeout: Boolean = true): org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
    implicit val outEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    // idleTimeout=false: no timeout-check batches — lets tests drain with
    // processAllAvailable(); production keeps it on so quiet users flush.
    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), timeoutConf) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => ClosedSession(user, s.n, s.start, s.end)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.map(_._2).toSeq.sortBy(_.getTime)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { ts =>
              cur match {
                case Some(SessionState(n, start, end)) if ts.getTime - end.getTime <= gapSeconds * 1000 =>
                  // late out-of-order events must not regress the span
                  val s = if (ts.before(start)) ts else start
                  val e = if (ts.after(end)) ts else end
                  cur = Some(SessionState(n + 1, s, e))
                case Some(SessionState(n, start, end)) =>
                  closed ::= ClosedSession(user, n, start, end)
                  cur = Some(SessionState(1L, ts, ts))
                case None =>
                  cur = Some(SessionState(1L, ts, ts))
              }
            }
            cur.foreach(state.update)
            if (idleTimeout) state.setTimeoutDuration(gapSeconds * 1000)
            closed.reverseIterator
          }
      }
  }

  /** Host the CDC merge inside a stream with the target living in a
    * DATABASE (r14): every micro-batch ships only its deltas over JDBC
    * — classify against the remote state, batched per-row UPDATE +
    * batched INSERT ([[graft.pipeline.Sinks.jdbcApplyIncremental]]).
    * The canonical "Structured Streaming into an upsert sink"
    * composition; the caller bootstraps the target table once
    * (`Sinks.jdbcWrite`) before starting the stream.
    *
    * Micro-batch keys are collapsed first with `dropDuplicates(keys)`
    * (the [[mergeEachBatch]] contract — several versions of one key in
    * a batch would fan out the classify join). dropDuplicates keeps an
    * ARBITRARY version of a key; pre-dedup the stream (e.g.
    * [[graft.operators.Dedup.latestPerKeyOrdered]] on a version
    * column) when "latest wins" matters — the caveat restated here
    * from [[mergeEachBatch]] (ADVICE r14).
    *
    * `nowFor` supplies the audit timestamp PER BATCH (batchId →
    * Timestamp), so a long-lived stream's created_at/updated_at track
    * batch time; the fixed-`now` overload below freezes one instant
    * across the stream's whole lifetime (fixture/replay determinism —
    * that frozen-instant semantics is intentional there and documented).
    *
    * Replay note: `foreachBatch` is AT-LEAST-ONCE; a replayed batch's
    * UPDATE leg re-applies idempotently and its classify re-runs
    * against the post-crash state (already-applied changes reclassify
    * as skip), but a TASK RETRY mid-INSERT can duplicate keys — the
    * jdbcWrite at-least-once residue, documented there. For
    * exactly-once inserts use [[cdcToJdbcEachBatchExactlyOnce]].
    *
    * Returns a function suitable for `writeStream.foreachBatch`.
    */
  def cdcToJdbcEachBatch(url: String, table: String, keys: Seq[String],
                         props: java.util.Properties,
                         nowFor: Long => java.sql.Timestamp,
                         batchSize: Int,
                         updateParallelism: Int)
      : (DataFrame, Long) => Unit = { (batch0, batchId) =>
    val batch = batch0.dropDuplicates(keys)
    graft.pipeline.Sinks.jdbcApplyIncremental(batch, url, table, keys,
      props, nowFor(batchId), batchSize, updateParallelism): Unit
  }

  /** Fixed-instant form: every micro-batch stamps the SAME `now` —
    * deterministic fixtures and replays. See the supplier overload's
    * doc for the per-batch form and the latest-wins caveat.
    */
  def cdcToJdbcEachBatch(url: String, table: String, keys: Seq[String],
                         props: java.util.Properties,
                         now: java.sql.Timestamp,
                         batchSize: Int = 1000,
                         updateParallelism: Int = 1)
      : (DataFrame, Long) => Unit =
    cdcToJdbcEachBatch(url, table, keys, props, (_: Long) => now,
      batchSize, updateParallelism)

  /** [[cdcToJdbcEachBatch]] with EXACTLY-ONCE batch semantics
    * (VERDICT r14 §missing-4): each micro-batch routes through
    * [[graft.pipeline.Sinks.jdbcApplyIncrementalExactlyOnce]] — the
    * transactional batch ledger (`<table>__BATCHES`) makes a replayed
    * batch id a no-op, and the conditional-INSERT leg makes a task
    * retry mid-insert idempotent. The pre-dedup/latest-wins caveat
    * from the at-least-once form applies unchanged. `dualTable` is the
    * store's one-row dummy table (see the Sinks doc).
    */
  def cdcToJdbcEachBatchExactlyOnce(url: String, table: String,
                                    keys: Seq[String],
                                    props: java.util.Properties,
                                    nowFor: Long => java.sql.Timestamp,
                                    batchSize: Int = 1000,
                                    updateParallelism: Int = 1,
                                    dualTable: String = "SYSIBM.SYSDUMMY1")
      : (DataFrame, Long) => Unit = { (batch0, batchId) =>
    val batch = batch0.dropDuplicates(keys)
    graft.pipeline.Sinks.jdbcApplyIncrementalExactlyOnce(batch, url,
      table, keys, props, nowFor(batchId), batchId, batchSize,
      updateParallelism, dualTable = dualTable): Unit
  }

  /** Host the J2 hash-diff merge inside a stream: every micro-batch is
    * merged into the parquet target at `targetPath` (create-on-first-batch),
    * preserving the batch pipeline's no-delete/idempotence invariants.
    * O(target) PER BATCH: the whole target rewrites twice through a
    * staging dir every micro-batch — correct, and fine for small
    * targets, but use [[mergeEachBatchBucketed]] when the target
    * outgrows its change rate (the JDBC path's O(changes) treatment on
    * parquet). Returns a function suitable for `writeStream.foreachBatch`.
    */
  def mergeEachBatch(targetPath: String, keys: Seq[String])
      : (DataFrame, Long) => Unit = { (batch0, _) =>
    val spark = batch0.sparkSession
    // Merge.classify requires unique keys; a micro-batch can legally carry
    // several versions of one key (retries, rapid updates) — collapse to one
    // row per key first or the classify/apply joins fan out and corrupt the
    // target. dropDuplicates keeps an arbitrary version; pass a pre-deduped
    // batch (e.g. Dedup.latestPerKeyOrdered on a version column) when
    // "latest wins" matters.
    val batch = batch0.dropDuplicates(keys)
    val exists = graft.pipeline.Sinks.exists(spark, targetPath)
    val merged =
      if (!exists) graft.functions.RowHash.withAuditColumns(batch, keys)
      else Merge.apply(batch, spark.read.parquet(targetPath), keys)
    // Rewrite via a temp dir: the plan reads the same path it overwrites.
    val tmpPath = targetPath + "__staging"
    merged.write.mode("overwrite").parquet(tmpPath)
    spark.read.parquet(tmpPath).write.mode("overwrite").parquet(targetPath)
    graft.pipeline.Sinks.drop(spark, tmpPath)
  }

  /** [[mergeEachBatch]] with an O(changes) target (r15, VERDICT r14
    * §next-6 — the JDBC sink's incremental treatment applied to the
    * parquet target): the target lives PARTITIONED by a stable key
    * bucket (`__kb = pmod(xxhash64(keys…), nBuckets)` directory
    * column), and each micro-batch overwrites ONLY the buckets
    * containing its changed keys (dynamic partition overwrite) instead
    * of rewriting the whole target twice through a staging dir.
    *
    * Per-batch work: one partition-PRUNED scan of the changed buckets
    * (the classify/merge build side), an O(1) id-watermark read for
    * insert minting ([[Merge.applyAbove]] — the slice's max id is not
    * the table's), and a rewrite of the changed buckets only. Key→bucket
    * is deterministic, so a key never moves buckets; a no-change batch
    * rewrites nothing but its keys' buckets. The merged slice is
    * MATERIALIZED (eager localCheckpoint) before the overwrite — the
    * plan reads the very partitions it replaces, the mergeEachBatch
    * staging problem solved without the second full copy (a lost
    * checkpoint block fails loudly, the jdbcApplyIncremental ruling).
    *
    * Id minting is METADATA-CHEAP (VERDICT r15's one `weak` term
    * closed): the global id watermark lives in a `_graft_max_id`
    * sidecar file at the target root (invisible to readers — Spark's
    * data-file rule skips `_`-prefixed names; untouched by dynamic
    * partition overwrite, which replaces only `__kb=` directories).
    * The sidecar is a RESERVATION watermark, bumped to cover the
    * batch's minted ids BEFORE the partition overwrite commits: a
    * crash between the bump and the commit wastes an id range (the
    * AUTO_INCREMENT-after-rollback gap — ids are unique, not gapless)
    * but can never collide, while the reverse order would re-mint
    * already-committed ids on replay. A missing sidecar (migration
    * from an r15 target, or a crash at create time) self-repairs from
    * parquet FOOTER statistics ([[graft.pipeline.Sinks
    * .parquetMaxLong]] — row-group metadata, no data pages), falling
    * back to a one-time full `max(id)` scan only when some footer
    * lacks stats. StreamingSpec pins sidecar == full-scan max after
    * every batch, and replay convergence from each crash point.
    * Single-writer, like every sidecar/index maintenance path in this
    * repo: the stream owns the target.
    *
    * Readers see one extra `__kb` partition column via partition
    * discovery; consumers select columns by name (the __ingest_batch
    * convention). Size `nBuckets` so a bucket ≈ a comfortable rewrite
    * unit (target_size / nBuckets); at 100 TB with nBuckets = 4096 a
    * single-key batch rewrites 1/4096 of the table instead of 2×.
    * The pre-dedup/latest-wins caveat is [[mergeEachBatch]]'s.
    */
  def mergeEachBatchBucketed(targetPath: String, keys: Seq[String],
                             nBuckets: Int = 64)
      : (DataFrame, Long) => Unit = { (batch0, _) =>
    require(nBuckets >= 1, s"mergeEachBatchBucketed: nBuckets >= 1")
    val spark = batch0.sparkSession
    val batch = batch0.dropDuplicates(keys)
    def kbOf(c: Seq[org.apache.spark.sql.Column]) =
      pmod(xxhash64(c: _*), lit(nBuckets.toLong)).cast("int")
    // An EMPTY first micro-batch must be a no-op: a partitionBy write
    // of zero rows creates a directory with no schema-bearing data
    // file, and every later batch would then die on read ("unable to
    // infer schema") — the no-data batch 0 every stream can hand a
    // sink (code-review r15). The non-partitioned mergeEachBatch never
    // had this edge (an empty plain write leaves a schema-bearing
    // file).
    if (batch.isEmpty) ()
    else if (!graft.pipeline.Sinks.exists(spark, targetPath)) {
      graft.functions.RowHash.withAuditColumns(batch, keys)
        .withColumn("__kb", kbOf(keys.map(col)))
        .write.mode("overwrite").partitionBy("__kb").parquet(targetPath)
      // first sidecar: footer stats of the just-written batch (O(batch
      // files) metadata); a crash before this lands is the "missing
      // sidecar" case the else-branch self-repairs from the same footers.
      writeMaxIdSidecar(spark, targetPath,
        readTargetMaxId(spark, targetPath))
    } else {
      val changed = batch.select(kbOf(keys.map(col)).as("__kb"))
        .distinct().collect().map(_.getInt(0)).toSeq // bounded by nBuckets
      if (changed.nonEmpty) {
        val target = spark.read.parquet(targetPath)
        val slice = target.filter(col("__kb").isin(changed: _*))
          .drop("__kb")
        // O(1) watermark read; footer-stats (then scan) repair when absent
        val baseMax = readMaxIdSidecar(spark, targetPath).getOrElse(
          readTargetMaxId(spark, targetPath))
        val maxIdDf = spark.range(1).select(lit(baseMax).as("__max_id"))
        val merged = Merge.applyAbove(batch, slice, keys, maxIdDf)
          .withColumn("__kb", kbOf(keys.map(col)))
          .localCheckpoint(true)
        try {
          // merged is slice-sized, so this max is O(changes); reserve the
          // range BEFORE the commit (crash between = id gap, never a
          // collision — see the scaladoc protocol)
          val mintedMax = merged.agg(coalesce(max(col("id")),
            lit(baseMax)).as("m")).head().getLong(0)
          writeMaxIdSidecar(spark, targetPath, math.max(baseMax, mintedMax))
          graft.pipeline.Sinks.overwritePartitions(merged, targetPath,
            Seq("__kb"))
        } finally merged.unpersist(): Unit
      }
    }
  }

  /** The bucketed sink's id watermark sidecar: a one-line text file at
    * `<target>/_graft_max_id` holding a long ≥ every id ever minted into
    * the target (a reservation watermark — may exceed the true max by
    * crash-abandoned ranges, never undershoots it). `_`-prefixed, so
    * Spark's reader and partition discovery never see it.
    */
  private def maxIdSidecarPath(targetPath: String) =
    new org.apache.hadoop.fs.Path(s"$targetPath/_graft_max_id")

  private[graft] def readMaxIdSidecar(spark: org.apache.spark.sql.SparkSession,
                                      targetPath: String): Option[Long] = {
    val p = maxIdSidecarPath(targetPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        // Loop to EOF: a single in.read() may legally return a partial
        // buffer (ADVICE r16), and parsing a truncated prefix would yield a
        // LOWER watermark — colliding ids, the exact failure this sidecar
        // exists to prevent. The file is ≤20 bytes; cap defensively anyway.
        val buf = new java.io.ByteArrayOutputStream(64)
        val chunk = new Array[Byte](64)
        var n = in.read(chunk)
        while (n > 0 && buf.size <= 4096) {
          buf.write(chunk, 0, n)
          n = in.read(chunk)
        }
        Some(new String(buf.toByteArray, "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  /** Write-temp-then-rename: a crash mid-write leaves the old sidecar (or
    * none, at create time) — both states the read path self-repairs from
    * footer stats. The brief delete-before-rename window reads as
    * "missing", which repairs to a value ≥ the one being written; safe.
    */
  private def writeMaxIdSidecar(spark: org.apache.spark.sql.SparkSession,
                                targetPath: String, v: Long): Unit = {
    val p = maxIdSidecarPath(targetPath)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$targetPath/._graft_max_id.tmp-${java.util.UUID.randomUUID()}")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p)) throw new java.io.IOException(
      s"mergeEachBatchBucketed: failed to commit id-watermark sidecar $p")
  }

  /** Migration/repair read of the target's max id: parquet footer
    * statistics first (metadata-only), full column scan only when some
    * footer lacks usable stats. Empty target → 0.
    */
  private def readTargetMaxId(spark: org.apache.spark.sql.SparkSession,
                              targetPath: String): Long =
    graft.pipeline.Sinks.parquetMaxLong(spark, targetPath, "id").getOrElse {
      val t = spark.read.parquet(targetPath)
      t.agg(coalesce(max(col("id")), lit(0L)).as("m")).head().getLong(0)
    }

  /** Dedup-on-ingest: every micro-batch is probed against the PERSISTED
    * MinHash index ([[graft.operators.Dedup.minHashProbeIndex]]); docs whose
    * estimator similarity to any already-accepted doc reaches `minEst` are
    * dropped, survivors append to `acceptedPath` AND their signatures append
    * to the index — so later batches (and later restarts) dedup against
    * everything accepted so far without ever re-reading accepted text. The
    * batch also dedups against itself first (exact signature equality) so
    * two copies inside one micro-batch cannot both pass the index probe.
    *
    * This is the 100 TB ingest shape: per batch, work is proportional to
    * |batch| signatures + one banded join against the (constant-width)
    * index — never to the accepted corpus's text.
    *
    * Restart safety: `foreachBatch` side effects are AT-LEAST-ONCE — after
    * a crash the engine replays the last batch id — so both sinks write
    * into per-batch partition directories (`__ingest_batch=<id>`) and a
    * replayed id whose directory already committed (has _SUCCESS) is
    * skipped, not re-appended. The two writes are ordered accepted-first;
    * a crash between them replays into "accepted committed, index missing",
    * which the replay completes by re-deriving the index rows FROM the
    * committed accepted partition (not by re-running the probe, whose
    * answer could differ once the index moved). Partially-written
    * directories (no _SUCCESS) are overwritten wholesale. The sink
    * directories are bound to ONE checkpoint lineage: every committed
    * batch carries an input-content manifest, and a colliding batch id
    * with DIFFERENT content — a stream restarted from a lost/reset
    * checkpoint over old sink dirs, where ids renumber from 0 — fails
    * loudly instead of being silently skipped as a replay. Readers are
    * unaffected: partition discovery surfaces one extra `__ingest_batch`
    * column, and every consumer (including [[graft.operators.Dedup
    * .minHashProbeIndex]]) selects its columns by name.
    *
    * Returns a function suitable for `writeStream.foreachBatch`.
    */
  def dedupAgainstIndexEachBatch(indexPath: String, acceptedPath: String,
                                 idCol: String, textCol: String,
                                 shingleN: Int = 3, bands: Int = 8,
                                 rowsPerBand: Int = 4, minEst: Double = 0.9,
                                 clean: DataFrame => DataFrame = identity)
      : (DataFrame, Long) => Unit = { (batch0, batchId) =>
    val spark = batch0.sparkSession
    import org.apache.spark.sql.functions._
    val acceptedBatchDir = s"$acceptedPath/__ingest_batch=$batchId"
    val indexBatchDir = s"$indexPath/__ingest_batch=$batchId"
    def committed(dir: String) =
      graft.pipeline.Sinks.exists(spark, s"$dir/_SUCCESS")
    // Legacy-layout guard (ADVICE r7): a sink dir with ROOT-LEVEL part
    // files (the pre-partition-dir flat append layout, or any foreign
    // parquet dir) mixed with __ingest_batch=<id> subdirs fails Spark
    // partition discovery with a conflicting-directory error at read time,
    // and flat-layout batches have no per-batch _SUCCESS/manifest, so
    // replay detection would misbehave. Fail at the WRITE with a migration
    // message instead of corrupting the sink.
    def requireBatchLayout(dir: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) {
        val flat = fs.listStatus(p).filter(s =>
          s.isFile && s.getPath.getName.startsWith("part-"))
        if (flat.nonEmpty) throw new IllegalStateException(
          s"dedupAgainstIndexEachBatch: $dir contains ${flat.length} root-level " +
            "part files — a flat (non-batch-partitioned) layout this sink " +
            "cannot append to. Migrate by moving the old files into a " +
            s"$dir/__ingest_batch=-1/ subdirectory (with an empty _SUCCESS " +
            "and _manifest-migrated marker), or point the stream at a fresh " +
            "directory")
      }
    }
    requireBatchLayout(acceptedPath)
    requireBatchLayout(indexPath)
    def writeIndexRowsFrom(accepted: DataFrame): Unit =
      accepted.select(col(idCol).as("id"),
          graft.expressions.TextHashExpressions
            .minHashSignature(col(textCol), shingleN, bands * rowsPerBand).as("sig"))
        .filter(col("sig").isNotNull)
        .write.mode("overwrite").parquet(indexBatchDir)
    // Order-independent signature of the batch's INPUT rows — id AND text,
    // because a reset-lineage stream typically renumbers doc ids from 0
    // too, so an id-only signature would collide exactly when the guard is
    // needed. A genuine foreachBatch replay re-delivers byte-identical
    // content (same source offsets from the checkpoint), so the signature
    // matches; a stream RESTARTED WITH A LOST/RESET CHECKPOINT re-numbers
    // batches from 0 with different content, and without this check a
    // colliding id would be "skipped as committed" — silently DROPPING the
    // new data. Mismatch fails loudly instead: the sink dirs are bound to
    // one checkpoint lineage.
    // The manifest FORMAT is versioned (ADVICE r15): new markers are
    // `_manifest2-<sig>` with the NUL-separated formula. Legacy
    // `_manifest-<sig>` markers exist in two historical generations —
    // a space-separated formula (pre-r15 builds), then a NUL one — so
    // a v1 marker is accepted iff it matches EITHER, then upgraded to
    // v2 in place. Without this, the first replay after upgrading a
    // pre-v2 sink would compute a different signature for
    // byte-identical content and halt the stream with the lineage
    // error (ADVICE r15, medium).
    def batchSigWith(sep: String): String = {
      // decimal sum: full-range xxhash64 longs overflow a long sum under ANSI
      val r = batch0.agg(
        sum(xxhash64(concat_ws(sep, col(idCol).cast("string"),
            col(textCol))).cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n")).head()
      s"${if (r.isNullAt(0)) "0" else r.getDecimal(0).toBigInteger.toString}_${r.getLong(1)}"
    }
    def batchSig(): String = batchSigWith("\u0000")
    def legacyBatchSig(): String = batchSigWith(" ")
    /** (version, sig); v2 wins when both generations are present. */
    def manifestOf(dir: String): Option[(Int, String)] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val names = fs.listStatus(p).map(_.getPath.getName)
        names.collectFirst { case n if n.startsWith("_manifest2-") =>
            (2, n.stripPrefix("_manifest2-")) }
          .orElse(names.collectFirst { case n if n.startsWith("_manifest-") =>
            (1, n.stripPrefix("_manifest-")) })
      }
    }
    def writeManifest(dir: String, sig: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/_manifest2-$sig")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(p, true).close()
    }
    if (committed(acceptedBatchDir)) {
      // replayed batch: the accepted set is already decided and durable —
      // only the index append may still be missing (crash between writes).
      // But first prove this IS a replay of the same content, not a fresh
      // checkpoint lineage re-using the id.
      manifestOf(acceptedBatchDir) match {
        case Some((1, "migrated")) =>
          // operator-blessed pre-manifest dir (see requireBatchLayout's
          // migration note): content check waived, replay-skip stands
          ()
        case Some((2, prev)) =>
          val cur = batchSig()
          if (prev != cur) throw new IllegalStateException(
            s"dedupAgainstIndexEachBatch: batch $batchId is already committed " +
              s"at $acceptedBatchDir with DIFFERENT content (manifest $prev != " +
              s"$cur) — this sink belongs to another checkpoint lineage. " +
              "Restarting a stream from a fresh checkpoint requires fresh " +
              "accepted/index directories (or removing the old ones); " +
              "skipping would silently drop the new batch")
        case Some((1, prev)) =>
          // legacy v1 marker from a pre-upgrade build: accept the replay
          // under EITHER historical v1 formula (ADVICE r15 — a genuine
          // replay of identical content must not halt just because the
          // signature format moved), then upgrade the dir to v2 so later
          // replays compare one formula.
          val cur = batchSig()
          if (prev != cur && prev != legacyBatchSig())
            throw new IllegalStateException(
              s"dedupAgainstIndexEachBatch: batch $batchId is already " +
                s"committed at $acceptedBatchDir with DIFFERENT content " +
                s"(legacy manifest $prev matches neither signature formula) " +
                "— this sink belongs to another checkpoint lineage. " +
                "Restarting a stream from a fresh checkpoint requires fresh " +
                "accepted/index directories (or removing the old ones); " +
                "skipping would silently drop the new batch")
          writeManifest(acceptedBatchDir, cur)
        case None =>
          // The commit protocol below writes the manifest BEFORE _SUCCESS,
          // so _SUCCESS-without-manifest cannot arise from any crash of
          // this code (ADVICE r7 — the old backfill here let a reset-
          // lineage batch id stamp ITS content over the hole and silently
          // drop its own data). A dir in this state was written by
          // something else; refuse to guess whose content it holds.
          throw new IllegalStateException(
            s"dedupAgainstIndexEachBatch: $acceptedBatchDir has _SUCCESS but " +
              "no _manifest-* marker — not a state this sink's commit " +
              "protocol produces. If the dir is a trusted pre-manifest " +
              "migration, add an empty _manifest-migrated file; otherwise " +
              "remove the dir and let the stream replay the batch")
      }
      if (!committed(indexBatchDir))
        writeIndexRowsFrom(spark.read.parquet(acceptedBatchDir))
    } else {
      // Cleanup-on-ingest hook: `clean` (PII scrub, normalization, span
      // dedup, ...) runs BEFORE signatures, so near-dup detection sees
      // cleaned text — two copies of a page differing only in scrubbed
      // content dedup. The replay manifest above is computed on the RAW
      // batch (source identity): changing `clean` mid-lineage does NOT
      // rewrite batches that already committed — replays of decided
      // batches stand, at-least-once semantics unchanged. `clean` must be
      // deterministic and preserve the id and text columns.
      val cleaned = clean(batch0)
      require(cleaned.columns.contains(idCol) && cleaned.columns.contains(textCol),
        s"dedupAgainstIndexEachBatch: clean() must preserve '$idCol' and " +
          s"'$textCol', got [${cleaned.columns.mkString(", ")}]")
      // In-batch exact-content dedup: keep the min-id holder per signature.
      // (Near-dups WITHIN one batch ride the next batch's probe; exactness
      // here keeps the step one hash-aggregate, no self-join.)
      val sigged = cleaned.withColumn("__sig",
          graft.expressions.TextHashExpressions
            .minHashSignature(col(textCol), shingleN, bands * rowsPerBand))
        .withColumn("__rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("__sig").orderBy(col(idCol))))
        .filter(col("__rk") === 1 || col("__sig").isNull)
        .drop("__rk")
      val batch = sigged.drop("__sig")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      batch.count()
      // "index exists" must mean "has at least one committed batch dir" —
      // a bare/empty directory (pre-created by an operator, or left by a
      // crash before any batch committed) would fail parquet schema
      // inference in the probe rather than meaning "nothing to dedup
      // against yet".
      val indexHasData = {
        val p = new org.apache.hadoop.fs.Path(indexPath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.exists(p) && fs.listStatus(p).exists(s =>
          s.isDirectory && s.getPath.getName.startsWith("__ingest_batch="))
      }
      val losers =
        if (!indexHasData) batch.limit(0).select(col(idCol))
        else graft.operators.Dedup
          .minHashProbeIndex(spark, indexPath, batch, idCol, textCol,
            shingleN, bands, rowsPerBand, minEstJaccard = minEst)
          .select(col("new_id").as(idCol)).distinct()
      val accepted = batch.join(losers, Seq(idCol), "left_anti")
        .localCheckpoint(true) // pin before the two writes below
      // Atomic commit, manifest included (ADVICE r7): data files first
      // WITHOUT the _SUCCESS marker, then the manifest, then _SUCCESS by
      // hand — so `committed` (= _SUCCESS present) implies the manifest
      // exists and no crash can leave a committed-but-unguarded batch id.
      // A crash anywhere before the touch leaves a marker-less dir that
      // the replay overwrites wholesale (probe re-run is safe there: the
      // index append is ordered after _SUCCESS, so the index cannot have
      // moved for this batch).
      accepted.write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(acceptedBatchDir)
      writeManifest(acceptedBatchDir, batchSig())
      val successPath = new org.apache.hadoop.fs.Path(s"$acceptedBatchDir/_SUCCESS")
      successPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .create(successPath, true).close()
      writeIndexRowsFrom(accepted)
      batch.unpersist()
    }
  }
}
