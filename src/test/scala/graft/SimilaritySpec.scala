package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(1.0f, 0.0f, 0.0f))    // identical direction to 0
  ).toDF("vec_id", "embedding")

  test("dot / cosine expressions") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val d = df.select(Similarity.dot(col("a"), col("b")).as("d")).as[Double].head()
    assert(d == 32.0)
    val c = df.select(Similarity.cosine(col("a"), col("a")).as("c")).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("dotQuantized is exact integer arithmetic") {
    val df = Seq((Array(0.001f, 0.002f), Array(0.003f, 0.004f))).toDF("a", "b")
    val d = df.select(Similarity.dotQuantized(col("a"), col("b")).as("d")).as[Long].head()
    assert(d == 1L * 3 + 2L * 4)
  }

  test("bruteForceTopK ranks by score with id tiebreak, excludes the query") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", queryId = 0, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(4L, 1L, 2L)) // 4 identical (1e6), 1 close (9e5), 2/3 zero -> id asc
  }

  test("annLsh buckets identical-direction vectors together") {
    val pairs = Similarity.annLsh(vecs, "vec_id", "embedding", dim = 3,
        bands = 4, bitsPerBand = 4, minCosine = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 4L))) // identical direction always collides
  }

  test("ivfTopK returns k results and finds the identical vector") {
    val top = Similarity.ivfTopK(vecs, "vec_id", "embedding", dim = 3,
        queryId = 0, k = 2, nCentroids = 4, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(top.head == 4L) // nProbe=all cells => equivalent to brute force top
  }

  test("ivfWriteIndex + ivfTopKIndexed: partition-pruned probe matches ivfTopK") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivf")
      .resolve("idx").toString
    Similarity.ivfWriteIndex(vecs, "vec_id", "embedding", dim = 3,
      nCentroids = 4, path = path)
    val probe = Similarity.ivfTopKIndexed(spark, path, dim = 3,
      queryId = 0, k = 2, nCentroids = 4, nProbe = 4)
    // nProbe = all cells => identical ranking to the unindexed form
    val expected = Similarity.ivfTopK(vecs, "vec_id", "embedding", dim = 3,
        queryId = 0, k = 2, nCentroids = 4, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(probe.select("id").as[Long].collect().toSeq == expected)
    // a narrow probe must prune the scan to the probed cell directories
    val narrow = Similarity.ivfTopKIndexed(spark, path, dim = 3,
      queryId = 0, k = 2, nCentroids = 4, nProbe = 1)
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
  }

  test("cosineNearDupPairs finds the identical pair at threshold ~1") {
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
        maxId = 100, minCos = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 4L)))
  }
}
