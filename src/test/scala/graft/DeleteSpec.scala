package graft

import graft.operators.{Dedup, ProductQuantization => PQ, SemDedup, Similarity, TextAnalysis}
import graft.pipeline.Tombstones
import org.apache.spark.sql.functions._

/** DELETES across the persisted index families (late r17): tombstone
  * batches are exactly-once, probes exclude tombstoned rows, purge /
  * retrain / compaction physically remove them with sidecars and
  * markers preserved, and probe-after-delete equals a fresh index built
  * without the deleted rows.
  */
class DeleteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files
    .createTempDirectory(p).toString + "/idx"

  private def dropMarker(dir: String, tag: String): Unit = {
    val d = new java.io.File(dir, "_committed")
    d.listFiles().filter(_.getName.startsWith(s"$tag-")).foreach { f =>
      assert(f.delete(), f.toString)
    }
  }

  private val docs = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat",
    3L -> "completely different text about spark engines",
    4L -> "the quick brown fox jumps over the lazy dog"
  ).toDF("doc_id", "text")

  test("minHash delete: probe excludes tombstoned docs; purge removes " +
      "them physically with _meta and markers preserved; exactly-once") {
    val dir = tmp("del-mh")
    Dedup.minHashWriteIndex(docs, "doc_id", "text", dir)
    val batch = Seq(10L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    def probeIds() = Dedup.minHashProbeIndex(spark, dir, batch, "doc_id",
        "text", minEstJaccard = 0.9)
      .select("corpus_id").as[Long].collect().toSet
    assert(probeIds() == Set(1L, 4L))
    // delete doc 4 (tagged): the probe must stop returning it
    val doomed = Seq(Tuple1(4L)).toDF("doc_id")
    Tombstones.delete(doomed, "doc_id", dir, Some("7"))
    assert(probeIds() == Set(1L))
    // replay no-ops; marker-lost crash state converges
    Tombstones.delete(doomed, "doc_id", dir, Some("7"))
    assert(spark.read.parquet(s"$dir/_tombstones").count() == 1)
    dropMarker(dir, "del-7")
    Tombstones.delete(doomed, "doc_id", dir, Some("7"))
    assert(spark.read.parquet(s"$dir/_tombstones").count() == 1)
    // lineage mismatch is loud
    val e = intercept[IllegalStateException] {
      Tombstones.delete(Seq(Tuple1(3L)).toDF("doc_id"), "doc_id", dir,
        Some("7"))
    }
    assert(e.getMessage.contains("DIFFERENT content"), e.getMessage)
    // purge: physical removal, probe unchanged, _meta survives so
    // appends still work, and the replayed delete STILL no-ops (markers
    // rode the swap)
    assert(Tombstones.purge(spark, dir) == 1L)
    assert(spark.read.parquet(dir).count() == 3)
    assert(!graft.pipeline.Sinks.exists(spark, s"$dir/_tombstones"))
    assert(probeIds() == Set(1L))
    Tombstones.delete(doomed, "doc_id", dir, Some("7")) // replay post-purge
    assert(!graft.pipeline.Sinks.exists(spark, s"$dir/_tombstones"),
      "a committed delete replayed after its purge must be a no-op")
    // a RE-APPEND of the deleted id after the purge is a fresh row
    Dedup.minHashAppendIndex(
      Seq(4L -> "the quick brown fox jumps over the lazy dog")
        .toDF("doc_id", "text"), "doc_id", "text", dir)
    assert(probeIds() == Set(1L, 4L))
    // purge with nothing pending is a no-op
    assert(Tombstones.purge(spark, dir) == 0L)
  }

  test("simHash delete: tombstoned docs leave the probe; purge clears") {
    val dir = tmp("del-sh")
    Dedup.simHashWriteIndex(docs, "doc_id", "text", dir)
    val batch = Seq(10L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    def probeIds() = Dedup.simHashProbeIndex(spark, dir, batch, "doc_id",
        "text", maxHamming = 0)
      .select("corpus_id").as[Long].collect().toSet
    assert(probeIds() == Set(1L, 4L))
    Tombstones.delete(Seq(Tuple1(1L)).toDF("doc_id"), "doc_id", dir)
    assert(probeIds() == Set(4L))
    assert(Tombstones.purge(spark, dir) == 1L)
    assert(probeIds() == Set(4L) && spark.read.parquet(dir).count() == 3)
  }

  test("IVF delete: tombstoned vectors never fill a top-k slot; purge " +
      "keeps the cell layout; retrain consumes tombstones") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 8, dim = 8)
    val dir = tmp("del-ivf")
    Similarity.ivfWriteIndex(fix, "vec_id", "embedding", dim = 8,
      nCentroids = 4, dir)
    // query 0's own-cluster neighbors are ids 1..7; delete two of them
    def topk() = Similarity.ivfTopKIndexed(spark, dir, dim = 8,
        queryId = 0L, k = 5, nProbe = 4)
      .select("id").as[Long].collect().toSet
    val before = topk()
    val victims = before.take(2)
    Tombstones.delete(victims.toSeq.toDF("id"), "id", dir, Some("1"))
    val after = topk()
    assert(victims.forall(v => !after.contains(v)), s"$victims -> $after")
    // equality with the fresh-built index minus the victims
    val fresh = tmp("del-ivf-fresh")
    Similarity.ivfWriteIndex(
      fix.filter(!col("vec_id").isin(victims.toSeq: _*)),
      "vec_id", "embedding", dim = 8, nCentroids = 4, fresh)
    assert(after == Similarity.ivfTopKIndexed(spark, fresh, dim = 8,
      queryId = 0L, k = 5, nProbe = 4).select("id").as[Long].collect().toSet)
    // cell stats see the live set only
    assert(Similarity.ivfCellStats(spark, dir)
      .select("n_rows").as[Long].head() == 30L)
    // purge keeps the partition layout and the probe result
    assert(Tombstones.purge(spark, dir, partitionCols = Seq("cell")) == 2L)
    assert(spark.read.parquet(dir).columns.contains("cell"))
    assert(topk() == after)
    // a new delete followed by RETRAIN (not purge): the retrain consumes
    // the tombstones — gone from the rebuilt cells and the table
    val victim2 = after.head
    Tombstones.delete(Seq(victim2).toDF("id"), "id", dir)
    Similarity.ivfRetrainCompact(spark, dir, dim = 8)
    assert(!graft.pipeline.Sinks.exists(spark, s"$dir/_tombstones"))
    assert(spark.read.parquet(dir).count() == 29L)
    assert(!topk().contains(victim2))
  }

  test("PQ/OPQ delete: ADC top-k excludes tombstoned codes; retrain " +
      "consumes tombstones from the source-of-truth re-encode") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 8, dim = 8)
    for (rotated <- Seq(false, true)) {
      val dir = tmp(s"del-pq-$rotated")
      if (rotated)
        PQ.opqWriteIndex(fix, "vec_id", "embedding", dim = 8, dir,
          m = 4, kCodewords = 8)
      else
        PQ.pqWriteIndex(fix, "vec_id", "embedding", dim = 8, dir,
          m = 4, kCodewords = 8)
      val q = fix.filter(col("vec_id") === 0L)
        .select("embedding").as[Array[Float]].head().map(_.toDouble)
      def topk() =
        (if (rotated) PQ.opqTopKIndexed(spark, dir, q, k = 5, excludeId = 0L)
         else PQ.pqTopKIndexed(spark, dir, q, k = 5, excludeId = 0L))
          .select("vec_id").as[Long].collect().toSet
      val victims = topk().take(2)
      Tombstones.delete(victims.toSeq.toDF("id"), "id", dir)
      val after = topk()
      assert(victims.forall(v => !after.contains(v)), s"$victims -> $after")
      // retrain re-encodes from the source table MINUS the index's
      // tombstones and clears them
      if (rotated)
        PQ.opqRetrainCompact(fix, "vec_id", "embedding", dim = 8, dir,
          m = 4, kCodewords = 8)
      else
        PQ.pqRetrainCompact(fix, "vec_id", "embedding", dim = 8, dir,
          m = 4, kCodewords = 8)
      assert(!graft.pipeline.Sinks.exists(spark, s"$dir/_tombstones"))
      assert(spark.read.parquet(dir).count() == 30L)
      assert(victims.forall(v => !topk().contains(v)))
    }
  }

  test("SemDedup delete: a deleted doc neither survives nor marks " +
      "another doc as its duplicate") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 3,
      perCluster = 4, dim = 8, noise = 0.0) // exact duplicates per cluster
    val dir = tmp("del-sem")
    SemDedup.semDedupWriteIndex(fix, "vec_id", "embedding", dim = 8,
      nCentroids = 3, dir)
    def survivors() = SemDedup.dedupSemanticIndexed(spark, dir,
        minCosNum = 99, minCosDen = 100)
      .select("id").as[Long].collect().toSet
    val s0 = survivors()
    // the min-id survivor of cluster 0 is id 0; deleting it must
    // promote another member, not leave the cluster unrepresented
    assert(s0.contains(0L))
    Tombstones.delete(Seq(0L).toDF("id"), "id", dir)
    val s1 = survivors()
    assert(!s1.contains(0L))
    assert(s1.exists(id => id >= 1L && id <= 3L),
      s"cluster 0 lost all representatives: $s1")
    // purge keeps the cell layout; dedup unchanged
    assert(Tombstones.purge(spark, dir, partitionCols = Seq("cell")) == 1L)
    assert(survivors() == s1)
  }

  test("BM25 delete: id-keyed correction tables make probes exact and " +
      "replay order-independent; compaction is one atomic root swap") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "beta delta epsilon"),
      (3L, "alpha alpha zeta"),
      (4L, "beta gamma gamma eta")).toDF("doc_id", "text")
    val queries = Seq((100L, "alpha beta"), (101L, "gamma")).toDF("qid", "qt")
    val dir = tmp("del-bm25")
    TextAnalysis.bm25WriteIndex(corpus, "doc_id", "text", dir, nBuckets = 4)
    def probe() = TextAnalysis.bm25Probe(spark, dir, queries, "qid", "qt",
        k = 10)
      .select("query_id", "doc_id", "rank", "score")
      .as[(Long, Long, Int, Double)].collect().toSet
    // the truth: scratch search over the corpus WITHOUT docs 2 and 3
    val truth = TextAnalysis.bm25Search(
        corpus.filter(!col("doc_id").isin(2L, 3L)), "doc_id", "text",
        queries, "qid", "qt", k = 10)
      .select("query_id", "doc_id", "rank", "score")
      .as[(Long, Long, Int, Double)].collect().toSet
    val doomed = Seq(2L, 3L).toDF("doc_id")
    TextAnalysis.bm25DeleteIndex(doomed, "doc_id", dir, Some("9"))
    assert(probe() == truth,
      "probe-after-delete must equal the fresh corpus-without-deleted " +
        "search bit-for-bit (df, avgdl and N all corrected)")
    // idempotence: replay no-ops; deleting again (new tag) subtracts
    // NOTHING (the dead rows are measured against live-minus-tombstoned)
    TextAnalysis.bm25DeleteIndex(doomed, "doc_id", dir, Some("9"))
    assert(probe() == truth)
    TextAnalysis.bm25DeleteIndex(Seq(2L).toDF("doc_id"), "doc_id", dir,
      Some("10"))
    assert(probe() == truth)
    // deleting an id never indexed is a no-op too
    TextAnalysis.bm25DeleteIndex(Seq(999L).toDF("doc_id"), "doc_id", dir)
    assert(probe() == truth)
    // marker-lost crash state converges
    dropMarker(dir, "del-9")
    TextAnalysis.bm25DeleteIndex(doomed, "doc_id", dir, Some("9"))
    assert(probe() == truth)
    // compaction physically removes the dead postings, folds the
    // negative partials, clears tombstones — probe still identical,
    // and the replayed committed delete STILL no-ops afterwards
    TextAnalysis.bm25CompactIndex(spark, dir)
    assert(!graft.pipeline.Sinks.exists(spark, s"$dir/_tombstones"))
    assert(spark.read.parquet(s"$dir/postings")
      .select("id").distinct().as[Long].collect().toSet == Set(1L, 4L))
    assert(probe() == truth)
    TextAnalysis.bm25DeleteIndex(doomed, "doc_id", dir, Some("9"))
    assert(probe() == truth)
    assert(!graft.pipeline.Sinks.exists(spark, s"$dir/_tombstones"))
    // the phrase probe excludes deleted docs the same way: "beta gamma"
    // lives in docs 1 and 4; deleting 4 must leave only 1
    def phrase() = TextAnalysis.phraseProbe(spark, dir,
        Seq((200L, "beta gamma")).toDF("qid", "qt"), "qid", "qt")
      .select("doc_id").as[Long].collect().toSet
    assert(phrase() == Set(1L, 4L), phrase())
    Tombstones.delete(Seq(4L).toDF("doc_id"), "doc_id", dir)
    assert(phrase() == Set(1L), phrase())
  }
}
