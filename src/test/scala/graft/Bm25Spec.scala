package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 retrieval: scratch search semantics, persisted-index probe parity,
  * O(batch) append maintenance, and the partition-pruned probe plan.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame = Seq(
    (1L, "spark shuffle join hash join"),
    (2L, "hash table probe build"),
    (3L, "sort merge join large table"),
    (4L, "the quick brown fox"),
    (5L, "hash hash hash hash hash"),
    (6L, "")
  ).toDF("doc_id", "text")

  private def q(rows: (Long, String)*): DataFrame =
    rows.toDF("query_id", "qtext")

  private def rowsOf(df: DataFrame): Seq[(Long, Long, Int, Double)] =
    df.select("query_id", "doc_id", "rank", "score")
      .as[(Long, Long, Int, Double)].collect().toSeq.sorted

  test("bm25Search: multi-term coverage beats single-term saturation; ranks are dense per query") {
    val r = TextAnalysis.bm25Search(docs, "doc_id", "text",
      q(1L -> "hash join table"), "query_id", "qtext", k = 10)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect().toSeq
    // doc 1 covers two query terms (join twice + hash); doc 5's five
    // repeats of one term saturate (k1) and idf-weight only one term.
    assert(r.head._2 == 1L, r)
    assert(r.map(_._3) == (1 to r.length), r)
    // doc 4 and 6 share no term with the query: absent.
    assert(!r.map(_._2).contains(4L) && !r.map(_._2).contains(6L), r)
  }

  test("bm25Search: repeated query terms score once (distinct-term query model)") {
    val a = rowsOf(TextAnalysis.bm25Search(docs, "doc_id", "text",
      q(1L -> "hash"), "query_id", "qtext"))
    val b = rowsOf(TextAnalysis.bm25Search(docs, "doc_id", "text",
      q(1L -> "hash hash HASH"), "query_id", "qtext"))
    assert(a == b)
  }

  test("bm25Probe == bm25Search on the same corpus (bit-for-bit)") {
    val path = java.nio.file.Files.createTempDirectory("graft-bm25-spec")
      .resolve("idx").toString
    TextAnalysis.bm25WriteIndex(docs, "doc_id", "text", path, nBuckets = 4)
    val queries = q(1L -> "hash join table", 2L -> "fox", 3L -> "zzz absent")
    val scratch = rowsOf(TextAnalysis.bm25Search(docs, "doc_id", "text",
      queries, "query_id", "qtext", k = 5))
    val probe = rowsOf(TextAnalysis.bm25Probe(spark, path,
      queries, "query_id", "qtext", k = 5))
    assert(probe == scratch)
    assert(scratch.exists(_._1 == 2L) && !scratch.exists(_._1 == 3L))
  }

  test("bm25AppendIndex: probe after append == rebuild over the union") {
    val base = java.nio.file.Files.createTempDirectory("graft-bm25-app")
    val incremental = base.resolve("inc").toString
    val rebuilt = base.resolve("full").toString
    TextAnalysis.bm25WriteIndex(docs.filter($"doc_id" <= 3), "doc_id",
      "text", incremental, nBuckets = 4)
    TextAnalysis.bm25AppendIndex(docs.filter($"doc_id" > 3), "doc_id",
      "text", incremental)
    TextAnalysis.bm25WriteIndex(docs, "doc_id", "text", rebuilt, nBuckets = 4)
    val queries = q(1L -> "hash join", 2L -> "quick fox")
    val inc = rowsOf(TextAnalysis.bm25Probe(spark, incremental,
      queries, "query_id", "qtext"))
    val full = rowsOf(TextAnalysis.bm25Probe(spark, rebuilt,
      queries, "query_id", "qtext"))
    assert(inc == full && inc.nonEmpty)
  }

  test("bm25CompactIndex: probe-before == probe-after, partials fold to one row") {
    val path = java.nio.file.Files.createTempDirectory("graft-bm25-cmp")
      .toString + "/idx"
    TextAnalysis.bm25WriteIndex(docs.filter($"doc_id" <= 3), "doc_id",
      "text", path, nBuckets = 4)
    TextAnalysis.bm25AppendIndex(docs.filter($"doc_id" > 3), "doc_id",
      "text", path)
    val queries = q(1L -> "hash join", 2L -> "quick fox")
    val before = rowsOf(TextAnalysis.bm25Probe(spark, path,
      queries, "query_id", "qtext"))
    val termsBefore = spark.read.parquet(s"$path/terms").count()
    val statsBefore = spark.read.parquet(s"$path/stats").count()
    TextAnalysis.bm25CompactIndex(spark, path)
    // identical probe results (integer-sum commutativity, bit-for-bit)
    val after = rowsOf(TextAnalysis.bm25Probe(spark, path,
      queries, "query_id", "qtext"))
    assert(after == before && after.nonEmpty)
    // partials folded: one terms row per (term, bucket), one stats row
    val terms = spark.read.parquet(s"$path/terms")
    assert(terms.count() ==
      terms.select("term", "bucket").distinct().count())
    assert(terms.count() < termsBefore,
      s"terms ${terms.count()} not below pre-compact $termsBefore")
    assert(spark.read.parquet(s"$path/stats").count() == 1L &&
      statsBefore == 2L)
    // an append AFTER compaction still folds in (the marker protocol
    // leaves a normal appendable index behind)
    TextAnalysis.bm25AppendIndex(docs.limit(0), "doc_id", "text", path)
    assert(rowsOf(TextAnalysis.bm25Probe(spark, path, queries,
      "query_id", "qtext")) == before)
  }

  test("bm25Probe: postings scan is partition-pruned to the query terms' buckets") {
    val path = java.nio.file.Files.createTempDirectory("graft-bm25-prune")
      .resolve("idx").toString
    TextAnalysis.bm25WriteIndex(docs, "doc_id", "text", path, nBuckets = 8)
    val probe = TextAnalysis.bm25Probe(spark, path,
      q(1L -> "fox"), "query_id", "qtext")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
  }

  test("bm25Probe: no-term query batch returns the empty typed frame") {
    val path = java.nio.file.Files.createTempDirectory("graft-bm25-empty")
      .resolve("idx").toString
    TextAnalysis.bm25WriteIndex(docs, "doc_id", "text", path, nBuckets = 4)
    val r = TextAnalysis.bm25Probe(spark, path,
      q(1L -> "   "), "query_id", "qtext")
    assert(r.columns.toSeq == Seq("query_id", "doc_id", "rank", "score"))
    assert(r.count() == 0L)
  }

  test("bm25Probe: fails loudly above maxQueryTerms (bounded-probe contract)") {
    val path = java.nio.file.Files.createTempDirectory("graft-bm25-guard")
      .resolve("idx").toString
    TextAnalysis.bm25WriteIndex(docs, "doc_id", "text", path, nBuckets = 4)
    val wide = q(1L -> (1 to 40).map(i => s"t$i").mkString(" "))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bm25Probe(spark, path, wide, "query_id", "qtext",
        maxQueryTerms = 10)
    }
    assert(e.getMessage.contains("maxQueryTerms") ||
      e.getMessage.contains("bounded"), e.getMessage)
  }

  test("phraseSearch: anchor semantics — overlaps count, order matters, repeats work") {
    val d = Seq(
      (1L, "a b a b a"),
      (2L, "b a"),
      (3L, "a a a")
    ).toDF("doc_id", "text")
    def m(phrase: String): Map[Long, Long] =
      TextAnalysis.phraseSearch(d, "doc_id", "text",
        q(1L -> phrase), "query_id", "qtext")
        .select("doc_id", "n_matches").as[(Long, Long)].collect().toMap
    assert(m("a b") == Map(1L -> 2L))            // positions 0,2
    assert(m("b a") == Map(1L -> 2L, 2L -> 1L))  // order-sensitive
    assert(m("b a b") == Map(1L -> 1L))
    assert(m("a a") == Map(3L -> 2L))            // overlapping repeats
    assert(m("a c") == Map.empty[Long, Long])    // absent term
  }

  test("phraseProbe == phraseSearch on the indexed corpus; empty phrase batch is empty") {
    val path = java.nio.file.Files.createTempDirectory("graft-phrase-spec")
      .resolve("idx").toString
    TextAnalysis.bm25WriteIndex(docs, "doc_id", "text", path, nBuckets = 4)
    val queries = q(1L -> "hash join", 2L -> "hash hash", 3L -> "quick brown fox")
    val scratch = TextAnalysis.phraseSearch(docs, "doc_id", "text",
      queries, "query_id", "qtext")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val probe = TextAnalysis.phraseProbe(spark, path,
      queries, "query_id", "qtext")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(probe == scratch && scratch.nonEmpty)
    // doc 5 = five "hash" repeats: "hash hash" overlaps 4 times
    assert(scratch.contains((2L, 5L, 4L)), scratch)
    val empty = TextAnalysis.phraseProbe(spark, path,
      q(1L -> "  "), "query_id", "qtext")
    assert(empty.columns.toSeq == Seq("query_id", "doc_id", "n_matches"))
    assert(empty.count() == 0L)
  }

  test("bm25AppendIndex: mixed bucketing modulus fails loudly") {
    val path = java.nio.file.Files.createTempDirectory("graft-bm25-mix")
      .resolve("idx").toString
    TextAnalysis.bm25WriteIndex(docs, "doc_id", "text", path, nBuckets = 4)
    // forge a partial stats row with a different modulus, then append
    spark.read.parquet(s"$path/stats")
      .withColumn("n_buckets", lit(8))
      .write.mode("append").parquet(s"$path/stats")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bm25AppendIndex(docs, "doc_id", "text", path)
    }
    assert(e.getMessage.contains("n_buckets"), e.getMessage)
  }
}
