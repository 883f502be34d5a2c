package graft

import graft.operators.{Filters, Merge, Reconcile, Sessionize}
import graft.pipeline._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end pipeline demo — the reference's three workloads (SURVEY §0)
  * on one command:
  *
  *   sbt "runMain graft.Demo /root/testdata/sf0.01 /tmp/graft-demo"
  *
  * 1. full load (scan -> filter -> semi-join -> audit cols -> overwrite),
  * 2. incremental hash-diff merge re-run (idempotence: all SKIP),
  * 3. monthly reconciliation report (align + diff),
  * plus the streaming-shape daily/session analytics.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))

    // --- 1. full load (the reference's TABLES + filters config surface) ---
    val specs = Seq(
      TableSpec("orders", keys = Seq("o_orderkey"),
        refreshMode = RefreshMode.Incremental),
      // no reliable unique key (duplicate (orderkey, linenumber) pairs) ->
      // full refresh, like the reference's PlaCobranzas
      TableSpec("lineitem",
        filters = Seq(Filters.neqKeepNull("l_returnflag", "N")),
        semiJoin = Some(("orders", "o_orderkey", "l_orderkey"))),
      TableSpec("customer"), TableSpec("supplier"), TableSpec("part"),
      TableSpec("nation"), TableSpec("region"), TableSpec("events"))
    println("== Full load ==")
    val t0 = System.nanoTime()
    val results = Runner.runAll(spark, sfDir, specs) { (spec, df) =>
      Sinks.fullRefresh(df, s"$outDir/${spec.name}")
    }
    results.foreach { r =>
      println(f"  ${r.table}%-10s ${if (r.error.isEmpty) r.rows.toString else "ERROR " + r.error.get}")
    }
    println(f"  total ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // --- 2. incremental re-run: hash-diff merge must be a no-op -----------
    println("== Incremental re-run (syncIncremental; idempotence) ==")
    val inc = Runner.syncIncremental(spark, sfDir, specs, outDir)
    inc.foreach { r =>
      println(f"  ${r.table}%-10s ${if (r.error.isEmpty) r.rows.toString else "ERROR " + r.error.get}")
    }
    require(inc.forall(_.error.isEmpty), "incremental run had errors")
    require(inc.map(_.rows) == results.map(_.rows), "incremental run changed counts")
    val src = Runner.loadTable(spark, sfDir, specs.head)
    val tgt = spark.read.parquet(s"$outDir/orders")
    val tally = Merge.outcomeTally(Merge.classify(
        src.drop("id", "row_hash", "created_at", "updated_at"), tgt, Seq("o_orderkey")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"  classify outcome: $tally")
    require(tally.keySet == Set(Merge.Skip), s"expected all-skip, got $tally")

    // --- 3. reconciliation report (compare_historico_mensual shape) -------
    println("== Monthly reconciliation (target vs source-of-truth) ==")
    val liTgt = Reconcile.monthlyAgg(
      spark.read.parquet(s"$outDir/lineitem"), "l_shipdate", Seq("l_extendedprice"))
    val liSrc = Reconcile.monthlyAgg(
      Runner.loadTable(spark, sfDir, specs(1)), "l_shipdate", Seq("l_extendedprice"))
    val diff = Reconcile.alignDiff(liTgt, liSrc, "month", "n_rows")
    val nonZero = diff.filter(col("diff") =!= 0).count()
    println(s"  months compared: ${diff.count()}, months with diff != 0: $nonZero")
    require(nonZero == 0, "reconciliation must be clean after a full load")

    // --- 4. event analytics (streaming-shape batch) -----------------------
    val sessions = Sessionize.sessions(
      TableSpec.read(spark, sfDir, "events"), "user_id", "ts", "event_id", 86400)
    println(s"== Event sessions == ${sessions.count()} sessions over " +
      s"${sessions.select("user_id").distinct().count()} users")

    // --- 5. training-corpus curation (LLM-pipeline shape) -----------------
    println("== Corpus curation: scrub -> dedup -> quality filter -> mix -> split -> JSONL ==")
    val docs = TableSpec.read(spark, sfDir, "documents")
    // The whole cleanup is ONE declarative recipe — scrub first (nothing
    // downstream sees raw addresses), near-dup removal, quality floor
    import graft.pipeline.CorpusPipeline
    val kept = CorpusPipeline.run(docs, "doc_id", "text", Seq(
      CorpusPipeline.RedactPii,
      CorpusPipeline.DedupNear,
      CorpusPipeline.QualityFloor(minTokens = 10)))
    // rebalance the surviving mix toward equal source shares at half size
    val mixed = graft.operators.Curation.mixtureSample(kept, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 1.0, "src2" -> 1.0),
      targetRows = kept.count() / 2)
    val mixShares = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"  source mix after rebalance: $mixShares")
    require(mixShares.keySet == Set("src0", "src1", "src2"),
      s"every source must survive the mix, got $mixShares")
    val split = graft.operators.Curation.hashSplit(mixed, "doc_id", trainPct = 90)
    Sinks.writeJsonl(split.filter(col("split") === "train"),
      s"$outDir/corpus_train")
    val nTrain = Sinks.jsonlScan(spark, s"$outDir/corpus_train",
        "doc_id BIGINT, text STRING, lang STRING, source STRING, " +
          "n_chars BIGINT, split_bucket INT, split STRING")
      .filter(col("doc_id").isNotNull).count()
    println(s"  ${docs.count()} docs -> ${kept.count()} after the " +
      s"scrub/near-dup/floor recipe -> " +
      s"${mixed.count()} after source rebalance -> " +
      s"$nTrain train docs round-tripped through gzip JSONL")
    require(nTrain > 0, "train split must not be empty")

    // --- 6. warehouse continuity: SCD2 history + daily gap-fill -----------
    println("== SCD2 history + gap-filled daily continuity ==")
    val histNow = to_timestamp(lit("2026-01-01 00:00:00"))
    val hist0 = graft.functions.RowHash
      .withRowHash(src.drop("id", "row_hash", "created_at", "updated_at"))
      .withColumn("valid_from", to_timestamp(lit("2025-01-01 00:00:00")))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val hist1 = Merge.scd2Apply(
      src.drop("id", "row_hash", "created_at", "updated_at"), hist0,
      Seq("o_orderkey"), histNow)
    println(s"  SCD2 fixpoint on unchanged source: ${hist1.count()} versions " +
      s"(${hist1.filter(col("valid_to").isNull).count()} open)")
    val daily = TableSpec.read(spark, sfDir, "events")
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val filled = graft.operators.TimeSeries.gapFillDaily(daily, "user_id", "day", "n")
    println(s"  gap-fill: ${daily.count()} observed days -> ${filled.count()} " +
      s"continuous days (${filled.filter(!col("is_observed")).count()} filled)")

    // --- 7. crawl loop: .warc.gz archives -> pages -> ranked budget -------
    println("== Crawl loop: archives -> ingest -> link graph -> budget ==")
    val S = "\r\n\r\n"
    val id = col("doc_id")
    val pageUrl = concat(lit("https://site"), (id % 7).cast("string"),
      lit(".example.com/page/"), id.cast("string"))
    val pageHtml = concat(
      lit("<html><body><p>"), substring(coalesce(col("text"), lit("")), 1, 80),
      lit("</p><a href=\"https://site"), ((id * 3 + 1) % 7).cast("string"),
      lit(".example.com/a/"), (id % 9).cast("string"),
      lit("\">more</a><a href=\"https://ext0.example.org/r\">out</a>"),
      lit("</body></html>"))
    val httpBlock = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), pageHtml)
    val warcRec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), pageUrl,
      lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Record-ID: <rec-"),
      id.cast("string"),
      lit(">\r\nContent-Type: application/http; msgtype=response" +
        "\r\nContent-Length: "),
      // WARC Content-Length is OCTETS — length() counts chars and
      // undercounts non-ASCII payloads (second-pass review r13)
      octet_length(httpBlock).cast("string"), lit(S), httpBlock, lit(S))
    val chunks = docs.filter(id < 50)
      .select(expr("doc_id div 10").as("chunk_id"), id, warcRec.as("rec"))
      .groupBy("chunk_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("doc_id"), col("rec")))),
        s => s.getField("rec")), "").as("warc"))
    val crawlDir = s"$outDir/warc"
    graft.operators.Warc.writeWarcGzFiles(chunks, "chunk_id", "warc",
      crawlDir)
    val ingested = graft.operators.Warc.responseDocuments(
      graft.operators.Warc.readWarcGzFiles(spark, s"$crawlDir/*.warc.gz")
        .select(regexp_extract(col("path"), "chunk-([0-9]+)\\.warc\\.gz$", 1)
          .cast("long").as("chunk_id"), col("warc")),
      "chunk_id", "warc")
    require(ingested.count() == 50, "every archived page must ingest back")
    val links = graft.operators.WebGraph.extractLinks(
        ingested.select(col("record_id"), col("url"), col("html")),
        Seq("record_id", "url"), "html")
      .withColumn("resolved",
        graft.operators.WebGraph.resolveUrl(col("url"), col("href")))
    val ranks = graft.operators.WebGraph.pageRank(
      graft.operators.WebGraph.hostLinkGraph(links, "url", "resolved"),
      iterations = 5)
    val budget = graft.operators.WebGraph.apportionBudget(
      ranks, "host", "rank_scaled", total = 100L)
    val alloc = budget.select("host", "budget_raw")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"  50 pages from ${chunks.count()} .warc.gz archives -> " +
      s"${alloc.size} ranked hosts; fetch budget: $alloc")
    require(alloc.values.sum == 100L, "budget must apportion exactly")

    // --- 8. real database target: the reference's MySQL shape on Derby ----
    // Bootstrap over JDBC (truncate-overwrite batched INSERT), then the
    // DAILY write: classify against the remote state and ship only the
    // deltas (per-row UPDATE + INSERT). Re-applying the same day writes
    // nothing — the reference's idempotence invariant, through a real
    // database (r14).
    println("== JDBC target (embedded Derby): bootstrap + daily deltas ==")
    val jdbcUrl = s"jdbc:derby:memory:demo${System.nanoTime()};create=true"
    val jdbcProps = new java.util.Properties()
    jdbcProps.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val customers = spark.read.parquet(s"$sfDir/customer.parquet")
    Sinks.jdbcWrite(
      graft.functions.RowHash.withAuditColumns(customers, Seq("c_custkey")),
      jdbcUrl, "CUSTOMER", jdbcProps)
    val drifted = customers.withColumn("c_acctbal",
      when(col("c_custkey") % 100 === 0, col("c_acctbal") + 1.0)
        .otherwise(col("c_acctbal")))
    val (nIns, nUpd) = Sinks.jdbcApplyIncremental(drifted, jdbcUrl,
      "CUSTOMER", Seq("c_custkey"), jdbcProps,
      java.sql.Timestamp.from(
        java.time.Instant.parse("2026-02-01T00:00:00Z")))
    println(s"  day-1 deltas over JDBC: inserted=$nIns updated=$nUpd")
    require(nIns == 0 &&
      nUpd == customers.filter(col("c_custkey") % 100 === 0).count(),
      s"unexpected delta $nIns/$nUpd")
    val (nIns2, nUpd2) = Sinks.jdbcApplyIncremental(drifted, jdbcUrl,
      "CUSTOMER", Seq("c_custkey"), jdbcProps,
      java.sql.Timestamp.from(
        java.time.Instant.parse("2026-03-01T00:00:00Z")))
    require(nIns2 == 0 && nUpd2 == 0, "re-apply must write nothing")
    val backJdbc = Sinks.jdbcScan(spark, jdbcUrl, "CUSTOMER", jdbcProps)
    require(backJdbc.count() == customers.count(), "JDBC row count drifted")
    println(s"  converged: ${backJdbc.count()} rows; re-apply wrote nothing")

    println("DEMO OK")
    spark.stop()
  }
}
