package graft

import graft.pipeline.{RefreshMode, Runner, Sinks, TableSpec}
import graft.operators.Filters
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sink").resolve("t").toString

  test("fullRefresh writes, count-verifies, exists, drop removes") {
    val p = tmp()
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    assert(Sinks.fullRefresh(df, p) == 2L)            // S5 + S12
    assert(Sinks.exists(spark, p))                    // S11
    assert(Sinks.countVerify(spark, p) == 2L)
    Sinks.append(Seq((3, "c")).toDF("k", "v"), p)     // S6
    assert(Sinks.countVerify(spark, p) == 3L)
    assert(Sinks.drop(spark, p))                      // S9
    assert(!Sinks.exists(spark, p))
  }

  test("targetState projects id/keys/row_hash for the merge build side") {
    val p = tmp()
    val tgt = graft.functions.RowHash.withAuditColumns(
      Seq((1, "a")).toDF("k", "v"), Seq("k"))
    Sinks.fullRefresh(tgt, p)
    assert(Sinks.targetState(spark, p, Seq("k")).columns.toSeq == Seq("id", "k", "row_hash"))
  }

  test("analyticalScan pushes predicate + projection") {
    val p = tmp()
    Sinks.fullRefresh(Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("k", "v", "amt"), p)
    val out = Sinks.analyticalScan(spark, p, Seq("k", "amt"), "amt > 15.0")
    assert(out.columns.toSeq == Seq("k", "amt"))
    assert(out.as[(Int, Double)].collect().toSeq == Seq((2, 20.0)))
    // the filter must reach the parquet scan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(amt,15.0)"), plan)
  }

  test("withDenseId: dense 1..n ids, no shuffle, offset respected") {
    val df = spark.range(100).toDF("x").repartition(7)
    val ids = Sinks.withDenseId(df).select("id").as[Long].collect().sorted
    assert(ids.toSeq == (1L to 100L))
    val off = Sinks.withDenseId(df, offset = 50).select("id").as[Long].collect().sorted
    assert(off.toSeq == (51L to 150L))
  }

  test("csvScan: header, all-string schema, quoted fields (mdb-export shape)") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.write(dir.resolve("t.csv"),
      "ID,Nombre,Importe\n1,\"Pérez, Juan\",1234.50\n2,,99\n".getBytes("UTF-8"))
    val df = Sinks.csvScan(spark, dir.toString)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.columns.toSeq == Seq("ID", "Nombre", "Importe"))
    val rows = df.orderBy("ID").collect()
    assert(rows(0).getString(1) == "Pérez, Juan") // quoted comma survives
    assert(rows(1).isNullAt(1))                   // empty field → null (C7-equivalent)
    // downstream typing is the reference's load path: name-based inference + try_cast
    val typed = df.withColumn("Importe",
      graft.functions.Normalize.moneyOrZero(col("Importe")))
    assert(typed.orderBy("ID").select("Importe").as[Double].collect().toSeq
      == Seq(1234.5, 99.0))
  }

  test("csvScan + parseDdl + applySchema: the reference's full typed ingest") {
    val dir = Files.createTempDirectory("graft-ingest")
    Files.write(dir.resolve("t.csv"),
      "ID,FECCOBRO,IMPORTE,NOTAS\n1,03/01/25 00:00:00,10.5,ok\n2,,bogus,\n".getBytes("UTF-8"))
    val ddl = """CREATE TABLE [Liquidaciones] (
      |  [ID] Long Integer,
      |  [FECCOBRO] DateTime,
      |  [IMPORTE] Double,
      |  [EXTRA_COL] Text (50)
      |);""".stripMargin
    val schema = graft.schema.TypeInference.parseDdl(ddl)
    val typed = graft.functions.Normalize.applySchema(
      Sinks.csvScan(spark, dir.toString), schema)
    assert(typed.schema("ID").dataType.typeName == "integer") // Access Long Integer = 32-bit
    assert(typed.schema("FECCOBRO").dataType.typeName.startsWith("timestamp"))
    assert(typed.columns.toSeq ==
      Seq("ID", "FECCOBRO", "IMPORTE", "EXTRA_COL", "NOTAS"))
    val rows = typed.orderBy("ID").collect()
    assert(rows(0).getDouble(2) == 10.5)
    // mdb-export's MM/dd/yy form parses via the C1 multi-format chain
    assert(rows(0).getTimestamp(1).toString.startsWith("2025-03-01 00:00:00"))
    assert(rows(1).isNullAt(1)) // empty -> null
    assert(rows(1).isNullAt(2)) // malformed 'bogus' -> null, not throw (ANSI-safe)
    assert(rows(0).isNullAt(3)) // schema-only column present as typed null
    assert(rows(0).getString(4) == "ok") // extra frame column passes through
  }

  test("overwritePartitions rewrites only the partitions present in the frame") {
    val p = tmp()
    Sinks.overwritePartitions(
      Seq(("2025-01", 1, "jan"), ("2025-02", 2, "feb")).toDF("month", "k", "v"),
      p, Seq("month"))
    // second load touches ONLY 2025-02; 2025-01 must survive untouched
    Sinks.overwritePartitions(
      Seq(("2025-02", 9, "feb2")).toDF("month", "k", "v"), p, Seq("month"))
    val out = spark.read.parquet(p).select("month", "k", "v")
      .as[(String, Int, String)].collect().toSet
    assert(out == Set(("2025-01", 1, "jan"), ("2025-02", 9, "feb2")))
  }

  test("compact: collapses a many-small-file table, data intact") {
    val p = tmp()
    val df = spark.range(1000).toDF("x")
    df.repartition(40).write.parquet(p) // 40 tiny files
    def files = new java.io.File(p).listFiles.count(_.getName.endsWith(".parquet"))
    assert(files >= 40)
    assert(Sinks.compact(spark, p) == 1000L)
    assert(files == 1) // ~10KB of data => one target-size file
    assert(spark.read.parquet(p).as[Long].collect().sorted.toSeq == (0L until 1000L))
  }

  test("syncIncremental: bootstrap, then no-change re-runs are byte-stable") {
    val base = tmp()
    val specs = Seq(
      TableSpec("orders", keys = Seq("o_orderkey"),
        refreshMode = RefreshMode.Incremental),
      TableSpec("region"))
    val r1 = Runner.syncIncremental(spark, "/root/testdata/sf0.001", specs, base)
    assert(r1.forall(_.error.isEmpty), r1.mkString("; "))
    assert(r1.forall(_.rows > 0))
    val snap = spark.read.parquet(s"$base/orders")
      .orderBy("id").collect().map(_.toString).toSeq
    for (run <- 1 to 2) {
      val r = Runner.syncIncremental(spark, "/root/testdata/sf0.001", specs, base)
      assert(r.forall(_.error.isEmpty), s"run $run: " + r.mkString("; "))
      assert(r.map(_.rows) == r1.map(_.rows), s"run $run: counts drifted")
      assert(spark.read.parquet(s"$base/orders")
        .orderBy("id").collect().map(_.toString).toSeq == snap,
        s"run $run: target drifted")
    }
  }

  test("compact preserves a Hive-partitioned layout (and so partition pruning)") {
    val p = tmp()
    Seq(("a", 1), ("a", 2), ("b", 3)).toDF("part", "v")
      .repartition(10).write.partitionBy("part").parquet(p)
    assert(Sinks.compact(spark, p) == 3L)
    assert(new java.io.File(p, "part=a").isDirectory) // layout survived
    val scan = spark.read.parquet(p).filter(col("part") === "a")
    assert(scan.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(scan.select("v").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("syncIncremental falls back to full refresh when the key has duplicates") {
    val base = tmp()
    // lineitem's (l_orderkey) is NOT unique — the reference's PlaCobranzas case
    val specs = Seq(TableSpec("lineitem", keys = Seq("l_orderkey"),
      refreshMode = RefreshMode.Incremental))
    // bootstrap full-refreshes regardless, so the audit is skipped there
    val r = Runner.syncIncremental(spark, "/root/testdata/sf0.001", specs, base)
    assert(r.head.error.isEmpty, r.head.toString)
    assert(r.head.mode == "full_refresh")
    // with a target in place, the dup-key audit forces the fallback
    val r2 = Runner.syncIncremental(spark, "/root/testdata/sf0.001", specs, base)
    assert(r2.head.mode == "full_refresh_fallback_dup_keys")
    assert(r2.head.rows == r.head.rows)
  }

  test("real JDBC round-trip: Derby state scan -> merge -> JDBC overwrite") {
    // The documented "one-line swap" (Sinks.scala header) exercised for
    // real: Derby's embedded driver ships with Spark (pure JVM, no new
    // dependency), standing in for the reference's MySQL
    // (sync_INCREMENTAL.py:226-268, sync_ALL.py:259-320).
    val url = s"jdbc:derby:memory:graft${System.nanoTime()};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
    val t1 = lit("2026-02-01 00:00:00").cast("timestamp")
    // target: k=1 stale (-> update), k=2 current (-> skip), k=3 absent from
    // source (-> kept, no-delete); source adds k=4 (-> insert)
    val tgt0 = graft.functions.RowHash.withAuditColumns(
      Seq((1L, "old"), (2L, "b"), (3L, "c")).toDF("k", "v"), Seq("k"), t0)
    tgt0.write.mode("overwrite").jdbc(url, "TGT", props)
    val src = Seq((1L, "new"), (2L, "b"), (4L, "d")).toDF("k", "v")
    // S3 swap: the classify build side comes straight from read.jdbc
    val merged = graft.operators.Merge.apply(
      src, spark.read.jdbc(url, "TGT", props), Seq("k"), now = t1)
    // the merge plan reads TGT — plain overwrite would drop it mid-read;
    // the staged swap is the JDBC form of overwriteViaStaging
    Sinks.overwriteJdbcViaStaging(merged, url, "TGT", props)
    val back = spark.read.jdbc(url, "TGT", props)
    val rows = back.select("k", "v", "id").as[(Long, String, Long)]
      .collect().toSet
    assert(rows.map(r => r._1 -> r._2) ==
      Set(1L -> "new", 2L -> "b", 3L -> "c", 4L -> "d"))
    assert(rows.find(_._1 == 4L).get._3 == 4L) // fresh id above target max
    // audit semantics survive the JDBC round-trip: update bumped, skip kept
    val ts = back.select("k", "updated_at").as[(Long, java.sql.Timestamp)]
      .collect().toMap
    assert(ts(1L).toString.startsWith("2026-02-01"))
    assert(ts(2L).toString.startsWith("2026-01-01"))
    // idempotence through JDBC: re-merging the same source is all-skip
    val tally = graft.operators.Merge.outcomeTally(
      graft.operators.Merge.classify(src,
        spark.read.jdbc(url, "TGT", props), Seq("k")))
      .as[(String, Long)].collect().toMap
    assert(tally.keySet == Set("skip"), tally.toString)
    // S4 over JDBC is not just "it reads": the filter must COMPILE INTO the
    // remote query (PushedFilters in the scan node), not run Spark-side
    // after a full-table fetch — the claim Sinks.analyticalScan's doc makes
    // for the JDBC swap, now checked against a real store.
    val pushed = spark.read.jdbc(url, "TGT", props)
      .where("k > 2").select("k", "v")
    val scanPlan = pushed.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scanPlan.contains("PushedFilters") && scanPlan.contains("k"),
      s"JDBC scan did not push the predicate:\n$scanPlan")
    assert(!scanPlan.contains("PushedFilters: []"),
      s"JDBC scan pushed NO filters:\n$scanPlan")
    assert(pushed.as[(Long, String)].collect().toSet ==
      Set(3L -> "c", 4L -> "d"))
  }

  test("overwriteJdbcViaStagingDelta == overwriteJdbcViaStaging (store-side " +
      "kept-row copy, r18)") {
    // two identical Derby targets, one rebuilt by each protocol from the
    // same merge — final contents must match byte-for-byte, including the
    // audit columns, and the delta table's DDL must survive the store-side
    // INSERT..SELECT (the swapped-in table is readable and index-free)
    val url = s"jdbc:derby:memory:graftdelta${System.nanoTime()};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
    val t1 = lit("2026-02-01 00:00:00").cast("timestamp")
    // skips, updates, target-only kept rows, inserts — every branch present
    val tgt0 = graft.functions.RowHash.withAuditColumns(
      (1 to 60).filter(_ % 7 != 0)
        .map(k => k.toLong -> (if (k % 5 == 0) s"v$k!" else s"v$k"))
        .toDF("k", "v"), Seq("k"), t0)
    tgt0.write.mode("overwrite").jdbc(url, "TGT_FULL", props)
    tgt0.write.mode("overwrite").jdbc(url, "TGT_DELTA", props)
    val src = (1 to 60).map(k => k.toLong -> s"v$k").toDF("k", "v")
    Sinks.overwriteJdbcViaStaging(
      graft.operators.Merge.apply(
        src, spark.read.jdbc(url, "TGT_FULL", props), Seq("k"), now = t1),
      url, "TGT_FULL", props)
    Sinks.overwriteJdbcViaStagingDelta(
      graft.operators.Merge.applyChanged(
        src, spark.read.jdbc(url, "TGT_DELTA", props), Seq("k"), now = t1),
      url, "TGT_DELTA", Seq("k"), props)
    def snap(t: String) = spark.read.jdbc(url, t, props)
      .select(col("id"), col("k"), col("v"), col("row_hash"),
        col("created_at").cast("string"), col("updated_at").cast("string"))
      .as[(Long, Long, String, String, String, String)].collect().toSet
    assert(snap("TGT_DELTA") == snap("TGT_FULL"))
    // the probe index must not survive onto the swapped-in table
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getIndexInfo(null, null, "TGT_DELTA",
        false, false)
      val idxNames = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("INDEX_NAME")).toList
      rs.close()
      assert(!idxNames.exists(n => n != null && n.contains("KEYIDX")),
        s"probe index leaked onto the swapped-in table: $idxNames")
    } finally conn.close()
  }

  test("jdbcApplyIncremental: delta-only writes, audit semantics, idempotent") {
    // the reference's DAILY write shape (r14): per-row UPDATE + batched
    // INSERT of the deltas only, skips and no-delete rows untouched
    val url = s"jdbc:derby:memory:graftinc${System.nanoTime()};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
    // Instant-parsed, not valueOf: valueOf reads the JVM default TZ
    // while the session (and t0) is UTC-pinned (code-review r14)
    val now1 = java.sql.Timestamp.from(
      java.time.Instant.parse("2026-02-01T00:00:00Z"))
    val tgt0 = graft.functions.RowHash.withAuditColumns(
      Seq((1L, "old"), (2L, "b"), (3L, "c")).toDF("k", "v"), Seq("k"), t0)
    tgt0.write.mode("overwrite").jdbc(url, "TGT", props)
    val src = Seq((1L, "new"), (2L, "b"), (4L, "d")).toDF("k", "v")
    val (ni, nu) = Sinks.jdbcApplyIncremental(src, url, "TGT", Seq("k"),
      props, now1)
    assert((ni, nu) == ((1L, 1L)), s"inserted=$ni updated=$nu")
    val back = spark.read.jdbc(url, "TGT", props)
    val rows = back
      .select(col("k"), col("v"), col("id"),
        col("created_at").cast("string"), col("updated_at").cast("string"))
      .as[(Long, String, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    // update: source data, kept id/created_at, bumped updated_at
    assert(rows(1L)._2 == "new" && rows(1L)._3 == tgt0
      .filter(col("k") === 1).select("id").as[Long].head())
    assert(rows(1L)._4.startsWith("2026-01-01") &&
      rows(1L)._5.startsWith("2026-02-01"))
    // skip + no-delete rows byte-identical (timestamps unchanged)
    assert(rows(2L)._2 == "b" && rows(2L)._5.startsWith("2026-01-01"))
    assert(rows(3L)._2 == "c" && rows(3L)._5.startsWith("2026-01-01"))
    // insert: fresh id above the remote max, created = updated = now
    assert(rows(4L)._2 == "d" && rows(4L)._3 == 4L &&
      rows(4L)._4.startsWith("2026-02-01"))
    // idempotence: re-applying the same source writes NOTHING
    val (ni2, nu2) = Sinks.jdbcApplyIncremental(src, url, "TGT", Seq("k"),
      props, java.sql.Timestamp.from(
      java.time.Instant.parse("2026-03-01T00:00:00Z")))
    assert((ni2, nu2) == ((0L, 0L)), s"re-apply wrote: $ni2/$nu2")
    assert(spark.read.jdbc(url, "TGT", props)
      .filter(col("updated_at") >= lit("2026-03-01").cast("timestamp"))
      .count() == 0L)
    // the incremental result equals the full Merge.apply rebuild
    val rebuilt = graft.operators.Merge.apply(src, tgt0, Seq("k"),
      now = lit("2026-02-01 00:00:00").cast("timestamp"))
    val a = back.select("k", "v", "id", "row_hash")
      .as[(Long, String, Long, String)].collect().toSet
    val b = rebuilt.select("k", "v", "id", "row_hash")
      .as[(Long, String, Long, String)].collect().toSet
    assert(a == b, s"incremental $a\nrebuild $b")
  }

  test("jdbcApplyIncrementalExactlyOnce: ledger replay skip, crash " +
      "convergence, PK coverage suppresses index DDL") {
    val url = s"jdbc:derby:memory:graftxo${System.nanoTime()};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    // target created with a PRIMARY KEY on the merge key — the ADVICE r14
    // case: the coverage scan must see the PK's backing index and NOT
    // issue CREATE INDEX DDL on the production target
    val c0 = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = c0.createStatement()
      try st.executeUpdate(
        """CREATE TABLE TGT ("k" BIGINT NOT NULL PRIMARY KEY,
          | "v" VARCHAR(32), "id" BIGINT, "row_hash" VARCHAR(64),
          | "created_at" TIMESTAMP, "updated_at" TIMESTAMP)"""
          .stripMargin.replace("\n", " "))
      finally st.close()
    } finally c0.close()
    val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
    val tgt0 = graft.functions.RowHash.withAuditColumns(
      Seq((1L, "old"), (2L, "b")).toDF("k", "v"), Seq("k"), t0)
    tgt0.select("k", "v", "id", "row_hash", "created_at", "updated_at")
      .write.mode("append").jdbc(url, "TGT", props)
    val now1 = java.sql.Timestamp.from(
      java.time.Instant.parse("2026-02-01T00:00:00Z"))
    val src = Seq((1L, "new"), (2L, "b"), (4L, "d")).toDF("k", "v")
    val (ni, nu) = Sinks.jdbcApplyIncrementalExactlyOnce(src, url, "TGT",
      Seq("k"), props, now1, batchId = 0L)
    assert((ni, nu) == ((1L, 1L)), s"inserted=$ni updated=$nu")
    // the PK covered the key: no TGT__KEYIDX duplicate index appeared
    val c1 = java.sql.DriverManager.getConnection(url, props)
    val idxNames = try {
      val rs = c1.getMetaData.getIndexInfo(null, null, "TGT", false, false)
      val b = scala.collection.mutable.Set.empty[String]
      try { while (rs.next()) Option(rs.getString("INDEX_NAME")).foreach(n => b += n) }
      finally rs.close()
      b.toSet
    } finally c1.close()
    assert(!idxNames.exists(_.equalsIgnoreCase("TGT__KEYIDX")),
      s"coverage scan missed the PK; created a duplicate index: $idxNames")
    def snapshot(): Set[String] =
      spark.read.jdbc(url, "TGT", props)
        .select(col("k"), col("v"), col("id"),
          col("updated_at").cast("string"))
        .as[(Long, String, Long, String)].collect().map(_.toString).toSet
    val after0 = snapshot()
    assert(after0.size == 3)
    // replay of a COMMITTED batch id is a no-op — even with a source
    // that WOULD write (the ledger gates before classify)
    val (ri, ru) = Sinks.jdbcApplyIncrementalExactlyOnce(
      Seq((1L, "evil"), (9L, "x")).toDF("k", "v"), url, "TGT", Seq("k"),
      props, java.sql.Timestamp.from(
        java.time.Instant.parse("2026-03-01T00:00:00Z")), batchId = 0L)
    assert((ri, ru) == ((0L, 0L)), s"replayed batch wrote: $ri/$ru")
    assert(snapshot() == after0, "replayed batch mutated the target")
    // crash simulation: batch 1 inserts k=5 and k=6; the "crash" left
    // k=5's insert committed (with the exact row the mint would
    // produce: id above the remote max, created=updated=now) but the
    // ledger row unwritten. The replay must converge — k=5 reclassifies
    // as skip, k=6 inserts once, ledger commits.
    val now2 = java.sql.Timestamp.from(
      java.time.Instant.parse("2026-04-01T00:00:00Z"))
    graft.functions.RowHash.withAuditColumns(
        Seq((5L, "e")).toDF("k", "v"), Seq("k"),
        lit("2026-04-01 00:00:00").cast("timestamp"))
      .withColumn("id", col("id") + lit(3L)) // id 4, above the remote max 3
      .select("k", "v", "id", "row_hash", "created_at", "updated_at")
      .write.mode("append").jdbc(url, "TGT", props)
    val src2 = Seq((1L, "new"), (5L, "e"), (6L, "f")).toDF("k", "v")
    val (ci, cu) = Sinks.jdbcApplyIncrementalExactlyOnce(src2, url, "TGT",
      Seq("k"), props, now2, batchId = 1L)
    assert((ci, cu) == ((1L, 0L)), s"crash replay wrote: $ci/$cu")
    val rows = spark.read.jdbc(url, "TGT", props)
      .groupBy("k").count().as[(Long, Long)].collect().toMap
    assert(rows.values.forall(_ == 1L), s"duplicate keys after replay: $rows")
    assert(rows.keySet == Set(1L, 2L, 4L, 5L, 6L))
    // and the ledger now remembers batch 1
    val (xi, xu) = Sinks.jdbcApplyIncrementalExactlyOnce(src2, url, "TGT",
      Seq("k"), props, now2, batchId = 1L)
    assert((xi, xu) == ((0L, 0L)))
  }

  test("Runner end-to-end: full refresh then incremental merge is idempotent") {
    // orders: unique natural key. (The synthetic lineitem has duplicate
    // (l_orderkey, l_linenumber) pairs — a full-refresh-only table, like the
    // reference's PlaCobranzas.)
    val base = tmp()
    val specs = Seq(
      TableSpec("orders", keys = Seq("o_orderkey"),
        filters = Seq(Filters.eq("o_orderstatus", "O")),
        refreshMode = RefreshMode.Incremental),
      TableSpec("region"))
    val results = Runner.runAll(spark, "/root/testdata/sf0.001", specs) { (spec, df) =>
      Sinks.fullRefresh(df, s"$base/${spec.name}")
    }
    assert(results.forall(_.error.isEmpty), results.mkString("; "))
    assert(results.map(_.rows).forall(_ > 0))

    // repeated re-runs (the reference verified 7x, context/context.md:1552):
    // every merge of the same source must be all-skip and leave the target
    // byte-stable
    val src = Runner.loadTable(spark, "/root/testdata/sf0.001", specs.head)
    val baseline = spark.read.parquet(s"$base/orders")
      .orderBy("id").collect().map(_.toString).toSeq
    for (run <- 1 to 3) {
      val tgt = spark.read.parquet(s"$base/orders")
      val tally = graft.operators.Merge.outcomeTally(
        graft.operators.Merge.classify(
          src.drop("id", "row_hash", "created_at", "updated_at"),
          tgt, Seq("o_orderkey")))
        .as[(String, Long)].collect().toMap
      assert(tally.keySet == Set("skip"), s"run $run: expected all-skip, got $tally")
      val merged = Runner.mergeInto(src, tgt, Seq("o_orderkey"))
        .select(tgt.columns.map(col): _*) // Merge.apply reorders; restore layout
      Sinks.fullRefresh(merged, s"$base/orders_next")
      spark.read.parquet(s"$base/orders_next").write.mode("overwrite")
        .parquet(s"$base/orders")
      assert(spark.read.parquet(s"$base/orders").orderBy("id")
        .collect().map(_.toString).toSeq == baseline, s"run $run: target drifted")
    }
  }

  test("jsonl: write/scan round trip preserves rows; gzip on disk") {
    val p = tmp()
    val df = Seq((1L, "hello world", "en"), (2L, "hola", "es"))
      .toDF("doc_id", "text", "lang")
    Sinks.writeJsonl(df, p)
    // the sink really is gzip JSONL, not parquet-in-disguise
    assert(new java.io.File(p).listFiles().exists(_.getName.endsWith(".json.gz")))
    // cache: Spark refuses plans pruned down to ONLY _corrupt_record
    val back = Sinks.jsonlScan(spark, p, "doc_id BIGINT, text STRING, lang STRING")
      .cache()
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 0)
    assert(back.select("doc_id", "text", "lang").as[(Long, String, String)]
      .collect().toSet == Set((1L, "hello world", "en"), (2L, "hola", "es")))
    back.unpersist()
  }

  test("jsonl: malformed lines land in _corrupt_record, not a failed job") {
    val p = Files.createTempDirectory("graft-jsonl-bad").toString
    Files.writeString(java.nio.file.Paths.get(p, "part-0.json"),
      """{"doc_id": 1, "text": "ok"}
        |this is not json
        |{"doc_id": 2, "text": "also ok"}
        |""".stripMargin)
    val back = Sinks.jsonlScan(spark, p, "doc_id BIGINT, text STRING").cache()
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(back.filter(col("_corrupt_record").isNull).count() == 2)
    back.unpersist()
    // FAILFAST surfaces the malformed line loudly instead
    val ex = intercept[Exception] {
      Sinks.jsonlScan(spark, p, "doc_id BIGINT, text STRING", mode = "FAILFAST")
        .count()
    }
    assert(ex.getMessage != null)
  }

  test("writeSharded: bounded shards in shuffle order, lossless round trip") {
    import java.nio.file.Files
    val df = (1L to 300L).map(i => (i, s"payload$i")).toDF("id", "payload")
    val p = Files.createTempDirectory("graft-shards").toString + "/out"
    val nShards = Sinks.writeSharded(df, "id", p, seed = "t", rowsPerShard = 64)
    assert(nShards == 5) // ceil(300/64)
    val back = spark.read.parquet(p)
      .select(col("id"), col("shuffle_pos"), col("shard").cast("long"))
      .as[(Long, Long, Long)].collect()
    // lossless: every input row exactly once
    assert(back.map(_._1).sorted.toSeq == (1L to 300L))
    // bounded and consistent: shard = floor((pos-1)/64), so each shard
    // holds <= 64 rows and positions partition into contiguous ranges
    back.foreach { case (_, pos, sh) => assert(sh == (pos - 1) / 64) }
    val sizes = back.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.values.forall(_ <= 64) && sizes(4L) == 300 - 4 * 64)
    // deterministic: rewriting with the same seed yields the same layout
    val p2 = Files.createTempDirectory("graft-shards2").toString + "/out"
    Sinks.writeSharded(df, "id", p2, seed = "t", rowsPerShard = 64)
    val back2 = spark.read.parquet(p2)
      .select(col("id"), col("shuffle_pos"), col("shard").cast("long"))
      .as[(Long, Long, Long)].collect()
    assert(back.sortBy(_._1).toSeq == back2.sortBy(_._1).toSeq)
    intercept[IllegalArgumentException] {
      Sinks.writeSharded(df, "id", p2, seed = "t", rowsPerShard = 0)
    }
  }

  test("parquetMaxLong: footer-stats max == full-scan max; metadata files " +
      "skipped; partition dirs descended; honest None on unknowns") {
    // r16 (VERDICT r15 §next-2): the metadata-only watermark read behind
    // mergeEachBatchBucketed's sidecar repair. Multi-file partitioned
    // layout (the bucketed target's exact shape), with sidecar-style
    // `_`-files present to prove the data-file rule skips them.
    val p = tmp()
    val df = (1L to 500L).toDF("id")
      .withColumn("__kb", pmod(col("id"), lit(7L)).cast("int"))
      .repartition(4)
    df.write.partitionBy("__kb").parquet(p)
    // plant metadata-looking files a naive lister would read
    java.nio.file.Files.write(java.nio.file.Paths.get(p, "_graft_max_id"),
      "999999".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(p, ".hidden"),
      "junk".getBytes)
    assert(Sinks.parquetMaxLong(spark, p, "id") == Some(500L))
    // parity with the scan, the gate the VERDICT asked for
    val scanned = spark.read.parquet(p).agg(max("id")).head().getLong(0)
    assert(Sinks.parquetMaxLong(spark, p, "id").contains(scanned))
    // int32 columns also read exactly
    val p2 = tmp()
    Seq(3, 41, 7).toDF("n").write.parquet(p2)
    assert(Sinks.parquetMaxLong(spark, p2, "n") == Some(41L))
    // honest None: absent path, absent column, non-integral physical type
    assert(Sinks.parquetMaxLong(spark, tmp(), "id").isEmpty)
    assert(Sinks.parquetMaxLong(spark, p, "nope").isEmpty)
    val p3 = tmp()
    Seq("a", "b").toDF("s").write.parquet(p3)
    assert(Sinks.parquetMaxLong(spark, p3, "s").isEmpty)
    // all-NULL column: no non-null value anywhere -> None (caller's scan
    // fallback returns its coalesce default)
    val p4 = tmp()
    Seq(1L, 2L).toDF("k").withColumn("id", lit(null).cast("long"))
      .write.parquet(p4)
    assert(Sinks.parquetMaxLong(spark, p4, "id").isEmpty)
  }

  test("ORC roundtrip preserves data; filter + projection push into the ORC scan") {
    val p = tmp()
    val df = Seq((1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0))
      .toDF("k", "name", "amt")
    Sinks.writeOrc(df, p)
    val back = Sinks.orcScan(spark, p)
    assert(back.orderBy("k").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0)))
    val pruned = back.filter(col("amt") > 15.0).select("k", "amt")
    assert(pruned.as[(Long, Double)].collect().sortBy(_._1).toSeq ==
      Seq((2L, 20.0), (3L, 30.0)))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(amt,15.0)"),
      plan)
    // projection pruned to the two referenced columns
    assert(plan.contains("ReadSchema") && !plan.contains("name"), plan)
  }
}
