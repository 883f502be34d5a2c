package graft

import graft.functions.RowHash
import graft.operators.Merge
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-merge scenario benchmark, mirroring the reference's published
  * ETL numbers (BASELINE.md: no-change ~8–10 s, 100 changed ~12 s, 1,000
  * ~20 s, 10,000 ~45 s on 88k–246k rows): bootstrap a parquet target from
  * `orders`, then time a full hash-diff merge (classify + apply + parquet
  * write + count-verify) for each change size.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.MergeBench"
  *
  * Prints one JSON line: {"metric":"merge","scenarios":{"changed_0":s,...}}
  */
object MergeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = java.nio.file.Files.createTempDirectory("graft-mergebench").toString
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val nRows = orders.count()
    // Bootstrap the target once (audit columns + parquet), like sync_ALL.
    val tgtPath = s"$out/orders"
    RowHash.withAuditColumns(orders, Seq("o_orderkey"))
      .write.mode(SaveMode.Overwrite).parquet(tgtPath)

    def mergeRun(changed: Long): Double = {
      // Deterministic change set: bump o_totalprice on the `changed`
      // lowest keys (keys are unique in orders).
      val keys = broadcast(orders.select("o_orderkey")
        .orderBy("o_orderkey").limit(changed.toInt))
      val src =
        if (changed == 0) orders
        else orders.join(keys.withColumnRenamed("o_orderkey", "__k"),
            col("o_orderkey") === col("__k"), "left_outer")
          .withColumn("o_totalprice",
            when(col("__k").isNotNull, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")))
          .drop("__k")
      val tgt = spark.read.parquet(tgtPath)
      val t0 = System.nanoTime()
      val merged = Merge.apply(src, tgt, Seq("o_orderkey"))
      merged.write.mode(SaveMode.Overwrite).parquet(s"$out/orders_next")
      val n = spark.read.parquet(s"$out/orders_next").count()
      val sec = (System.nanoTime() - t0) / 1e9
      require(n == nRows, s"row count drifted: $n != $nRows")
      sec
    }

    mergeRun(0) // warm-up (session/codegen init not billed to a scenario)
    val scenarios = Seq(0L, 100L, 1000L, 10000L)
      .map(c => s"changed_$c" -> mergeRun(c))

    // The SAME cycle against a REAL database (r14): target lives in
    // embedded Derby, the classify build side comes over JDBC, the
    // result swaps in via the staged RENAME — the reference's actual
    // deployment shape (MySQL), so these numbers are the like-for-like
    // comparison against BASELINE.md's published merge walls (its ~8-45 s
    // include exactly this database round trip).
    val url = s"jdbc:derby:memory:mergebench${System.nanoTime()};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val ddl = "o_orderstatus VARCHAR(8), o_orderpriority VARCHAR(32), " +
      "row_hash VARCHAR(64)"
    graft.pipeline.Sinks.jdbcWrite(
      RowHash.withAuditColumns(orders, Seq("o_orderkey")),
      url, "ORDERS_TGT", props, columnTypes = Some(ddl))

    def jdbcSrc(changed: Long): DataFrame = {
      val keys = broadcast(orders.select("o_orderkey")
        .orderBy("o_orderkey").limit(changed.toInt))
      if (changed == 0) orders
      else orders.join(keys.withColumnRenamed("o_orderkey", "__k"),
          col("o_orderkey") === col("__k"), "left_outer")
        .withColumn("o_totalprice",
          when(col("__k").isNotNull, col("o_totalprice") + changed / 1e3)
            .otherwise(col("o_totalprice")))
        .drop("__k")
    }

    // The DAILY path: classify against the remote state, write ONLY the
    // deltas (batched per-row UPDATE + batched INSERT) — the reference's
    // exact write pattern, so these scale with `changed`, not the table.
    def jdbcRun(changed: Long): Double = {
      val t0 = System.nanoTime()
      val (ni, nu) = graft.pipeline.Sinks.jdbcApplyIncremental(
        jdbcSrc(changed), url, "ORDERS_TGT", Seq("o_orderkey"), props,
        now = java.sql.Timestamp.from(
          java.time.Instant.parse("2026-03-01T00:00:00Z")))
      // the scenario bills the WRITE path only — the full-table
      // verification readback below is O(table) and would swamp the
      // O(changes) scaling the series exists to demonstrate
      // (code-review r14)
      val sec = (System.nanoTime() - t0) / 1e9
      val n = graft.pipeline.Sinks.jdbcScan(spark, url, "ORDERS_TGT", props)
        .count()
      require(n == nRows, s"JDBC row count drifted: $n != $nRows")
      require(ni == 0 && nu == changed,
        s"unexpected delta: inserted=$ni updated=$nu expected 0/$changed")
      sec
    }

    jdbcRun(0) // warm-up
    val jdbcScenarios = Seq(0L, 100L, 1000L, 10000L)
      .map(c => s"jdbc_changed_$c" -> jdbcRun(c))

    // The parquet O(changes) path (r15, VERDICT r14 §next-6): the
    // bucketed incremental target — each run ships ONLY its delta rows
    // (the CDC micro-batch shape; feeding the whole perturbed table
    // here made every run derive all 64 buckets as changed and
    // measured O(table) vacuously — code-review r15) and rewrites only
    // the buckets those keys hash into. changed=1 touches ONE bucket
    // (1/64 of the table); uniformly-hashed key sets touch
    // min(changed, 64) buckets, so the series climbs toward the
    // all-buckets ceiling as change count grows — the proportionality
    // the sink exists for. A changed=0 batch is a no-op by
    // construction. Fixture-scale honesty: fixed costs (max-id scan,
    // checkpoint, per-partition commit) dominate at 150k rows; the
    // mechanism pays when target_size/nBuckets ≫ batch reach.
    // StreamingSpec pins untouched buckets byte-stable.
    val bktPath = s"$out/orders_bkt"
    val doBkt = graft.streaming.Streams.mergeEachBatchBucketed(
      bktPath, Seq("o_orderkey"), nBuckets = 64)
    doBkt(orders, 0L) // bootstrap (creates the partitioned target)
    def bktSrc(changed: Long): DataFrame = {
      val keys = broadcast(orders.select("o_orderkey")
        .orderBy("o_orderkey").limit(changed.toInt))
      orders.join(keys.withColumnRenamed("o_orderkey", "__k"),
          col("o_orderkey") === col("__k")) // inner: deltas ONLY
        .withColumn("o_totalprice", col("o_totalprice") + changed / 1e3)
        .drop("__k")
    }
    def bktRun(changed: Long): Double = {
      val src = if (changed == 0) orders.limit(0) else bktSrc(changed)
      val t0 = System.nanoTime()
      doBkt(src, changed)
      val sec = (System.nanoTime() - t0) / 1e9
      val n = spark.read.parquet(bktPath).count()
      require(n == nRows, s"bucketed row count drifted: $n != $nRows")
      sec
    }
    bktRun(1) // warm-up (the no-op 0-run would warm nothing)
    val bktScenarios = Seq(0L, 1L, 100L, 1000L, 10000L)
      .map(c => s"parquet_bucketed_changed_$c" -> bktRun(c))

    // The REBUILD path for contrast: full merge + staged-overwrite
    // rewrite of the whole table through JDBC (what a schema change or
    // hash-basis change forces) — O(table) regardless of change count.
    val rebuild = {
      val t0 = System.nanoTime()
      val tgt = graft.pipeline.Sinks.jdbcScan(spark, url, "ORDERS_TGT",
        props, partitionColumn = Some("id"), lowerBound = 1L,
        upperBound = math.max(2L, nRows), numPartitions = 8)
      val merged = Merge.apply(jdbcSrc(100), tgt, Seq("o_orderkey"))
      graft.pipeline.Sinks.overwriteJdbcViaStaging(merged, url,
        "ORDERS_TGT", props, columnTypes = Some(ddl))
      (System.nanoTime() - t0) / 1e9
    }

    // Warm-start rank maintenance (r16, VERDICT r15 §next-4): the
    // persisted-graph append is O(batch); these rows measure whether the
    // RANK upkeep is too. Build the residue graph from half the docs,
    // converge cold and snapshot, append the other half (additive weight
    // partials on the same pairs — the steady-state crawl shape), then
    // reconverge warm from the stored vector vs cold from the uniform
    // base. The win is ITERATIONS (each iteration is a fixed amount of
    // work at any scale), reported alongside wall seconds.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def graphEdges(cond: org.apache.spark.sql.Column): DataFrame = docs
      .filter(cond)
      .select(
        concat(lit("s"), (col("doc_id") % 7).cast("string")).as("src_host"),
        concat(lit("t"), ((col("doc_id") * col("doc_id") + 3) % 11)
          .cast("string")).as("dst_host"))
      .groupBy("src_host", "dst_host").agg(count(lit(1)).as("weight"))
    val grPath = s"$out/graph_idx"
    val wg = graft.operators.WebGraph
    wg.writeIndex(graphEdges(col("doc_id") % 2 === 0), grPath)
    val t0w = System.nanoTime()
    val (_, itCold0) = wg.pageRankIndexedWarm(spark, grPath) // cold + snapshot
    val coldSec = (System.nanoTime() - t0w) / 1e9
    wg.appendIndex(graphEdges(col("doc_id") % 2 =!= 0), grPath)
    val t1w = System.nanoTime()
    val (_, itWarm) = wg.pageRankIndexedWarm(spark, grPath) // warm reconverge
    val warmSec = (System.nanoTime() - t1w) / 1e9
    val t2w = System.nanoTime()
    val (_, itCold) = wg.pageRankFrom(wg.readIndexEdges(spark, grPath),
      maxIterations = 400) // cold baseline on the appended graph
    val coldFullSec = (System.nanoTime() - t2w) / 1e9
    require(itWarm < itCold,
      s"warm reconvergence lost: warm=$itWarm cold=$itCold")
    // Full-depth DISTRIBUTED rank cost (ADVICE r16): the official bench
    // rows run the distributed iteration at depth 3 (correctness stays
    // full-depth spec-pinned), so per-iteration depth regressions —
    // lineage/checkpoint growth with iteration count — are priced HERE
    // at depth 10 on the forced-distributed path instead of silently
    // dropping out of the record.
    val t3w = System.nanoTime()
    wg.pageRankFrom(wg.readIndexEdges(spark, grPath), maxIterations = 10,
      localEdgeLimit = 0L, stopTol = None)
    val distDepthSec = (System.nanoTime() - t3w) / 1e9
    val prScenarios = Seq(
      "pagerank_cold_bootstrap_iters" -> itCold0.toDouble,
      "pagerank_cold_bootstrap_sec" -> coldSec,
      "pagerank_warm_reconverge_iters" -> itWarm.toDouble,
      "pagerank_warm_reconverge_sec" -> warmSec,
      "pagerank_cold_reconverge_iters" -> itCold.toDouble,
      "pagerank_cold_reconverge_sec" -> coldFullSec,
      "pagerank_dist_depth10_sec" -> distDepthSec)

    val js = (scenarios ++ jdbcScenarios ++ bktScenarios ++ prScenarios :+
        ("jdbc_rebuild" -> rebuild))
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"merge","rows":$nRows,"scenarios":$js,"sf":"$sfDir"}""")
    spark.stop()
  }
}
