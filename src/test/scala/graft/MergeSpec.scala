package graft

import graft.functions.RowHash
import graft.operators.Merge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

/** J2/J3 invariants (SURVEY.md §5, context/context.md:1292-1306):
  * idempotence (re-merging an already-merged source is a fixpoint) and
  * no-delete (target rows absent from the source survive), plus the audit
  * semantics of sync_INCREMENTAL.py:479-502 — updates keep id/created_at and
  * bump updated_at; inserts mint ids above the target max.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = to_timestamp(lit("2026-01-01 00:00:00"))
  private val t1 = to_timestamp(lit("2026-02-02 00:00:00"))

  private def asTarget(rows: Seq[(Int, String)]): DataFrame =
    RowHash.withAuditColumns(rows.toDF("k", "v"), Seq("k"), t0)

  private def snapshot(df: DataFrame): Set[(Long, Int, String, String, String, String)] =
    df.select(col("id"), col("k"), col("v"), col("row_hash"),
        col("created_at").cast("string"), col("updated_at").cast("string"))
      .as[(Long, Int, String, String, String, String)].collect().toSet

  test("classify splits insert / update / skip correctly") {
    val tgt = asTarget(Seq(1 -> "a", 2 -> "b", 3 -> "c"))
    val src = Seq(1 -> "a", 2 -> "B", 4 -> "d").toDF("k", "v")
    val got = Merge.classify(src, tgt, Seq("k"))
      .select(col("k"), col(Merge.ActionCol)).as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "skip", 2 -> "update", 4 -> "insert"))
  }

  test("no-delete: target rows absent from source survive byte-identical") {
    val tgt = asTarget(Seq(1 -> "a", 2 -> "b"))
    val merged = Merge.apply(Seq(1 -> "a").toDF("k", "v"), tgt, Seq("k"), t1)
    assert(snapshot(merged) == snapshot(tgt)) // src row 1 is a skip; row 2 untouched
  }

  test("update keeps target id/created_at, bumps updated_at, takes source data") {
    val tgt = asTarget(Seq(1 -> "a", 2 -> "b"))
    val before = snapshot(tgt).map(r => r._2 -> r).toMap
    val merged = Merge.apply(Seq(1 -> "a", 2 -> "B2").toDF("k", "v"), tgt, Seq("k"), t1)
    val after = snapshot(merged).map(r => r._2 -> r).toMap
    assert(after(1) == before(1))                      // skip: identical
    assert(after(2)._1 == before(2)._1)                // id preserved
    assert(after(2)._3 == "B2")                        // source value
    assert(after(2)._5 == before(2)._5)                // created_at preserved
    assert(after(2)._6 == "2026-02-02 00:00:00")       // updated_at bumped
    assert(after(2)._4 != before(2)._4)                // row_hash refreshed
  }

  test("insert mints ids above the target max, created=updated=now") {
    val tgt = asTarget(Seq(10 -> "a", 20 -> "b")) // ids 1, 2
    val merged = Merge.apply(
      Seq(10 -> "a", 20 -> "b", 5 -> "new1", 30 -> "new2").toDF("k", "v"),
      tgt, Seq("k"), t1)
    val byK = snapshot(merged).map(r => r._2 -> r).toMap
    assert(byK.keySet == Set(5, 10, 20, 30))
    assert(Set(byK(5)._1, byK(30)._1) == Set(3L, 4L)) // fresh ids above max=2
    assert(byK(5)._1 == 3L)                           // deterministic by key order
    assert(byK(5)._5 == "2026-02-02 00:00:00" && byK(5)._6 == "2026-02-02 00:00:00")
  }

  test("property: merge is idempotent and never deletes (ScalaCheck)") {
    val kv = Gen.mapOf(Gen.zip(Gen.choose(0, 15), Gen.alphaStr.map(_.take(4))))
    val prop = Prop.forAll(kv, kv) { (tgtM: Map[Int, String], srcM: Map[Int, String]) =>
      val tgt = asTarget(tgtM.toSeq)
      val src = srcM.toSeq.toDF("k", "v")
      val once = Merge.apply(src, tgt, Seq("k"), t1)
      val twice = Merge.apply(src, once, Seq("k"), t1)
      val s1 = snapshot(once)
      (snapshot(twice) == s1) :| "idempotent fixpoint" &&
        (tgtM.keySet subsetOf s1.map(_._2)) :| "no-delete" &&
        (s1.map(_._2) == tgtM.keySet ++ srcM.keySet) :| "exactly union of keys" &&
        (s1.toSeq.map(_._1).distinct.size == s1.size) :| "ids unique"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("applyChanged ∪ kept-from-target == apply exactly (delta-ship contract)") {
    // mix of skip (1), update (2), target-only kept (3,4), inserts (5,6) —
    // plus a larger modular case below, so the decomposition
    //   apply == applyChanged ∪ { tgt rows with key ∉ applyChanged keys }
    // is checked on every classification branch, byte-for-byte.
    val tgt = asTarget(Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d"))
    val src = Seq(1 -> "a", 2 -> "B2", 5 -> "e", 6 -> "f").toDF("k", "v")
    val full = Merge.apply(src, tgt, Seq("k"), t1)
    val changed = Merge.applyChanged(src, tgt, Seq("k"), t1)
    val kept = tgt.join(changed.select("k"), Seq("k"), "left_anti")
      .select(full.columns.map(col).toSeq: _*)
    assert(snapshot(changed.unionByName(kept)) == snapshot(full))
    assert(changed.select("k").as[Int].collect().toSet == Set(2, 5, 6))

    // the jdbc fixture's exact shape: every 7th key absent from target
    // (insert), every 5th surviving key's value bumped (update)
    val srcBig = (1 to 200).map(k => k -> s"v$k").toDF("k", "v")
    val tgtBig = asTarget((1 to 200).filter(_ % 7 != 0)
      .map(k => k -> (if (k % 5 == 0) s"v$k!" else s"v$k")))
    val fullBig = Merge.apply(srcBig, tgtBig, Seq("k"), t1)
    val changedBig = Merge.applyChanged(srcBig, tgtBig, Seq("k"), t1)
    val keptBig = tgtBig.join(changedBig.select("k"), Seq("k"), "left_anti")
      .select(fullBig.columns.map(col).toSeq: _*)
    assert(snapshot(changedBig.unionByName(keptBig)) == snapshot(fullBig))
  }

  test("applyBulk: same row set as apply, dense ids above target max, no window") {
    // parquet roundtrip cuts the fixture's own window lineage out of the plan
    val p = java.nio.file.Files.createTempDirectory("merge-bulk").resolve("t").toString
    asTarget(Seq(10 -> "a", 20 -> "b")).write.parquet(p)
    val tgt = spark.read.parquet(p)
    val src = Seq(10 -> "a", 20 -> "B2", 5 -> "n1", 30 -> "n2", 40 -> "n3").toDF("k", "v")
    val viaWindow = Merge.apply(src, tgt, Seq("k"), t1)
    val viaBulk = Merge.applyBulk(src, tgt, Seq("k"), t1)
    // identical data; ids may be assigned in different order among inserts
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("v"), col("row_hash")).as[(Int, String, String)].collect().toSet
    assert(rows(viaBulk) == rows(viaWindow))
    val ids = viaBulk.select("id").as[Long].collect().sorted.toSeq
    assert(ids == (1L to 5L)) // dense: 2 target ids + 3 minted above max
    assert(!viaBulk.queryExecution.executedPlan.toString.contains("Window"))
    // r16: the explicit-watermark form (footer-stats/sidecar callers) is
    // the same merge — and mints above the GIVEN watermark, not the scan
    val viaAbove = Merge.applyBulkAbove(src, tgt, Seq("k"), maxId = 2L, t1)
    assert(rows(viaAbove) == rows(viaBulk))
    assert(viaAbove.select("id").as[Long].collect().sorted.toSeq == (1L to 5L))
    val gapped = Merge.applyBulkAbove(src, tgt, Seq("k"), maxId = 100L, t1)
    assert(gapped.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 101L, 102L, 103L)) // reserved-range gap, never a collision
  }

  test("evolveTarget: added source column backfills via one update pass, then fixpoint") {
    val tgt = asTarget(Seq(1 -> "a", 2 -> "b"))
    val src = Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "w") // new column w
    val evolved = Merge.evolveTarget(src, tgt)
    assert(evolved.schema("w").dataType.typeName == "integer")
    val before = snapshot(tgt).map(r => r._2 -> r).toMap
    val merged = Merge.apply(src, evolved, Seq("k"), t1)
    val after = merged.select(col("id"), col("k"), col("v"), col("w"),
        col("created_at").cast("string"), col("updated_at").cast("string"))
      .as[(Long, Int, String, Int, String, String)].collect().map(r => r._2 -> r).toMap
    // hash basis now includes w -> both rows update and backfill w,
    // keeping id/created_at, bumping updated_at (reference's post-ALTER pass)
    assert(after(1)._4 == 10 && after(2)._4 == 20)
    assert(after(1)._1 == before(1)._1 && after(1)._5 == before(1)._5)
    assert(after(1)._6 == "2026-02-02 00:00:00")
    // second merge of the same evolved source is all-skip again
    val again = Merge.apply(src, merged, Seq("k"), t1)
    assert(again.orderBy("id").collect().toSeq == merged.orderBy("id").collect().toSeq)
  }

  test("duplicate and null key audits") {
    val df = Seq(Some(1) -> "a", Some(1) -> "b", Some(2) -> "c", None -> "d")
      .map { case (k, v) => (k.map(_.toString).orNull, v) }.toDF("k", "v")
    assert(Merge.duplicateKeyAudit(df, Seq("k")).select("k").as[String].collect().toSeq == Seq("1"))
    assert(Merge.nullKeyAudit(df, Seq("k")).count() == 1)
  }

  test("classify+apply against a real JDBC target (Derby), composite key + evolution") {
    // The CDC cycle with the target LIVING in a database end-to-end
    // (VERDICT r13 §next-1): bootstrap via Sinks.jdbcWrite (truncate
    // overwrite), classify against Sinks.jdbcTargetState (the pruned
    // remote SELECT), apply reading the full JDBC target, swap via the
    // staged RENAME, then evolve the source schema and merge again.
    val url = s"jdbc:derby:memory:graftmerge${System.nanoTime()};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val keys = Seq("k1", "k2")
    val tgt0 = RowHash.withAuditColumns(
      Seq((1, "a", "x"), (1, "b", "y"), (2, "a", "z")).toDF("k1", "k2", "v"),
      keys, t0)
    graft.pipeline.Sinks.jdbcWrite(tgt0, url, "TGT", props)
    val src = Seq((1, "a", "x"), (1, "b", "Y"), (3, "c", "w")).toDF("k1", "k2", "v")
    val cls = Merge.classify(src,
        graft.pipeline.Sinks.jdbcTargetState(spark, url, "TGT", keys, props), keys)
      .select(col("k1"), col("k2"), col(Merge.ActionCol))
      .as[(Int, String, String)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(cls == Map((1, "a") -> "skip", (1, "b") -> "update", (3, "c") -> "insert"))
    val merged = Merge.apply(src,
      graft.pipeline.Sinks.jdbcScan(spark, url, "TGT", props), keys, t1)
    graft.pipeline.Sinks.overwriteJdbcViaStaging(merged, url, "TGT", props)
    val back = graft.pipeline.Sinks.jdbcScan(spark, url, "TGT", props)
    assert(back.select("k1", "k2", "v").as[(Int, String, String)].collect().toSet ==
      Set((1, "a", "x"), (1, "b", "Y"), (2, "a", "z"), (3, "c", "w")))
    // no-delete: (2,"a") survived; update kept its id; insert minted above max
    val ids = back.select("k1", "k2", "id").as[(Int, String, Long)]
      .collect().map { case (a, b, i) => (a, b) -> i }.toMap
    assert(ids((3, "c")) == 4L)
    // schema evolution THROUGH the database: source grows a column, the
    // JDBC target is aligned with a typed NULL, every matched row
    // reclassifies as update (new hash basis) and backfills
    val src2 = src.withColumn("extra", concat(col("v"), lit("!")))
    val evolved = Merge.evolveTarget(src2,
      graft.pipeline.Sinks.jdbcScan(spark, url, "TGT", props))
    val merged2 = Merge.apply(src2, evolved, keys, t1)
    graft.pipeline.Sinks.overwriteJdbcViaStaging(merged2, url, "TGT", props)
    val back2 = graft.pipeline.Sinks.jdbcScan(spark, url, "TGT", props)
    assert(back2.filter(col("k1") === 3).select("extra").as[String].head() == "w!")
    // the no-delete row has no source match — its evolved column is NULL
    assert(back2.filter(col("k1") === 2).select("extra").as[String]
      .collect().toSeq == Seq(null))
    // idempotence through JDBC after evolution: all-skip
    val tally = Merge.outcomeTally(Merge.classify(src2,
        graft.pipeline.Sinks.jdbcTargetState(spark, url, "TGT", keys, props), keys))
      .as[(String, Long)].collect().toMap
    assert(tally.keySet == Set(Merge.Skip), tally.toString)
  }

  test("property: scd2Apply == in-memory version model on random states (ScalaCheck)") {
    val gen = for {
      nKeys <- Gen.choose(1, 10)
      histKeys <- Gen.someOf(0 until nKeys)
      srcKeys <- Gen.someOf(0 until nKeys)
      if histKeys.nonEmpty || srcKeys.nonEmpty
      histVals <- Gen.listOfN(histKeys.size, Gen.oneOf("a", "b"))
      srcVals <- Gen.listOfN(srcKeys.size, Gen.oneOf("a", "b"))
    } yield (histKeys.zip(histVals).toMap, srcKeys.zip(srcVals).toMap)
    val prop = Prop.forAll(gen) { case (histM, srcM) =>
      (histM.nonEmpty && srcM.nonEmpty) ==> {
        val hist = RowHash.withRowHash(histM.toSeq.map { case (k, v) => (k, v) }
            .toDF("k", "v"))
          .withColumn("valid_from", t0)
          .withColumn("valid_to", lit(null).cast("timestamp"))
        val src = srcM.toSeq.map { case (k, v) => (k, v) }.toDF("k", "v")
        val got = Merge.scd2Apply(src, hist, Seq("k"), t1)
          .select(col("k"), col("v"), col("valid_to").cast("string"))
          .as[(Int, String, String)].collect().toSet
        // model: changed keys -> closed old + open new; src-only -> open
        // new; hist-only (no-delete) and unchanged -> open old
        val want = (histM.keySet ++ srcM.keySet).flatMap { k =>
          (histM.get(k), srcM.get(k)) match {
            case (Some(h), Some(s)) if h != s =>
              Set((k, h, "2026-02-02 00:00:00"), (k, s, null: String))
            case (Some(h), _) => Set((k, h, null: String)) // unchanged / no-delete
            case (None, Some(s)) => Set((k, s, null: String))
            case _ => Set.empty[(Int, String, String)]
          }
        }
        (got == want) :| s"hist=$histM src=$srcM got=$got want=$want"
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("scd2Apply: changes close the open version and open a new one") {
    // history: key 1 has a closed pre-2025 version + an open one; key 2 open
    val hist0 = RowHash.withRowHash(Seq(1 -> "old", 2 -> "b").toDF("k", "v"))
      .withColumn("valid_from", to_timestamp(lit("2025-01-01 00:00:00")))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val ancient = RowHash.withRowHash(Seq(1 -> "ancient").toDF("k", "v"))
      .withColumn("valid_from", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("valid_to", to_timestamp(lit("2025-01-01 00:00:00")))
    val hist = hist0.unionByName(ancient)
    // source: key 1 changed, key 2 absent (no-delete), key 3 new
    val src = Seq(1 -> "new", 3 -> "c").toDF("k", "v")
    val out = Merge.scd2Apply(src, hist, Seq("k"), t1)
      .select(col("k"), col("v"), col("valid_from").cast("string"),
        col("valid_to").cast("string"))
      .as[(Int, String, String, String)].collect().toSet
    assert(out == Set(
      (1, "ancient", "2024-01-01 00:00:00", "2025-01-01 00:00:00"), // history kept
      (1, "old", "2025-01-01 00:00:00", "2026-02-02 00:00:00"),     // closed now
      (1, "new", "2026-02-02 00:00:00", null),                      // new open
      (2, "b", "2025-01-01 00:00:00", null),                        // no-delete
      (3, "c", "2026-02-02 00:00:00", null)))                       // insert
    // fixpoint: re-applying the same source only skips
    val again = Merge.scd2Apply(src, Merge.scd2Apply(src, hist, Seq("k"), t1),
      Seq("k"), to_timestamp(lit("2026-03-03 00:00:00")))
    assert(again.count() == 5)

    // scd2AsOf: point-in-time reads of the same history — at most one row
    // per key (intervals are disjoint by construction)
    def asOfMap(at: String) =
      Merge.scd2AsOf(out.toSeq.toDF("k", "v", "valid_from", "valid_to")
          .withColumn("valid_from", to_timestamp(col("valid_from")))
          .withColumn("valid_to", to_timestamp(col("valid_to"))),
          to_timestamp(lit(at)))
        .select(col("k"), col("v")).as[(Int, String)].collect().toMap
    assert(asOfMap("2024-06-01 00:00:00") == Map(1 -> "ancient"))
    assert(asOfMap("2025-06-01 00:00:00") == Map(1 -> "old", 2 -> "b"))
    assert(asOfMap("2026-06-01 00:00:00") == Map(1 -> "new", 2 -> "b", 3 -> "c"))
    // boundary semantics: valid_from inclusive, valid_to exclusive
    assert(asOfMap("2025-01-01 00:00:00").get(1).contains("old"))
    // before any version: key absent
    assert(asOfMap("2023-01-01 00:00:00") == Map.empty[Int, String])
  }
}
