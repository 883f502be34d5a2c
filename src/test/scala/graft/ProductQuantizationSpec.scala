package graft

import graft.operators.{ProductQuantization => PQ, Similarity}
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("encodeColumn picks the nearest codeword per subspace, ties to lowest") {
    // dim 4, m 2, k 2: subspace codebooks [(0,0),(10,10)]
    val books: PQ.Codebooks = Array.fill(2)(Array(
      Array(0.0, 0.0), Array(10.0, 10.0)))
    val df = Seq(
      (1L, Seq(1.0, 1.0, 9.0, 9.0)),   // near (0,0) then (10,10) -> [0,1]
      (2L, Seq(10.0, 10.0, 0.0, 1.0)), // -> [1,0]
      (3L, Seq(5.0, 5.0, 5.0, 5.0))    // equidistant -> ties to [0,0]
    ).toDF("id", "v")
    val got = df.select(col("id"), PQ.encodeColumn(col("v"), books).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got(1L) == Seq(0, 1))
    assert(got(2L) == Seq(1, 0))
    assert(got(3L) == Seq(0, 0))
  }

  test("encodeColumn throws on ragged vectors (fail-loudly convention)") {
    val books: PQ.Codebooks = Array.fill(2)(Array(Array(0.0, 0.0)))
    val df = Seq(Seq(1.0, 2.0, 3.0)).toDF("v") // length 3, dim = 4
    val e = intercept[Exception] {
      df.select(PQ.encodeColumn(col("v"), books)).collect()
    }
    assert(e.getMessage != null)
  }

  test("decode(encode(v)) reconstructs planted clusters with high cosine") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 8,
      perCluster = 20, dim = 32, noise = 0.05)
    val books = PQ.trainCodebooks(fix, "vec_id", "embedding", dim = 32,
      m = 4, k = 8, maxIter = 6)
    val codes = PQ.encode(fix, "vec_id", "embedding", books)
    val recon = fix.select(col("vec_id").as("id"), col("embedding"))
      .join(codes, "id")
      .select(Similarity.cosine(col("embedding"),
        PQ.decodeColumn(col("codes"), books)).as("cos"))
    val (minCos, avgCos) = recon.agg(min("cos"), avg("cos"))
      .as[(Double, Double)].collect().head
    // 8 planted clusters, 8 codewords per subspace: near-lossless
    assert(avgCos > 0.95, s"avg reconstruction cosine $avgCos")
    assert(minCos > 0.8, s"min reconstruction cosine $minCos")
  }

  test("pqTopK recall vs brute force on planted clusters") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 8,
      perCluster = 20, dim = 32, noise = 0.05)
    val exact = Similarity.bruteForceTopK(fix, "vec_id", "embedding",
      queryId = 5, k = 10).select("vec_id").as[Long].collect().toSet
    val approx = PQ.pqTopK(fix, "vec_id", "embedding", dim = 32,
      queryId = 5, k = 10, m = 4, kCodewords = 8)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"PQ ADC+rerank recall@10 $recall")
    // and the in-cluster sanity: query 5 is in cluster 0 (ids 0..19)
    assert(approx.count(_ < 20) >= 8, s"cluster hits ${approx.count(_ < 20)}")
  }

  test("pqTopKRotated: OPQ-style rotation keeps recall at the PQ floor") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 8,
      perCluster = 20, dim = 32, noise = 0.05)
    val exact = Similarity.bruteForceTopK(fix, "vec_id", "embedding",
      queryId = 5, k = 10).select("vec_id").as[Long].collect().toSet
    val approx = PQ.pqTopKRotated(fix, "vec_id", "embedding", dim = 32,
      queryId = 5, k = 10, m = 4, kCodewords = 8)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"rotated-PQ ADC+rerank recall@10 $recall")
    assert(approx.count(_ < 20) >= 8, s"cluster hits ${approx.count(_ < 20)}")
    // determinism: PCA sign normalization + deterministic book training
    val again = PQ.pqTopKRotated(fix, "vec_id", "embedding", dim = 32,
      queryId = 5, k = 10, m = 4, kCodewords = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(again == approx)
  }

  test("ivfPqTopK prunes to probed cells and keeps cluster recall") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 8,
      perCluster = 20, dim = 32, noise = 0.05)
    val got = PQ.ivfPqTopK(fix, "vec_id", "embedding", dim = 32,
      queryId = 5, k = 10, nCentroids = 8, nProbe = 4, m = 4, kCodewords = 8)
      .select("vec_id").as[Long].collect()
    assert(got.length == 10)
    // the query's own planted cluster dominates the result
    assert(got.count(_ < 20) >= 7, s"cluster hits ${got.count(_ < 20)} of 10")
  }

  test("ivfPqTopK with trained centroids + re-rank recovers brute-force top-k") {
    // The gate configuration: k-means cells align probes with the planted
    // clusters, and the exact re-rank fixes ADC's intra-cluster blur —
    // measured 10/10 here vs 6/10 pseudo-centroid and 4/10 no-re-rank.
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 32,
      perCluster = 32, dim = 64)
    val exact = Similarity.bruteForceTopK(fix, "vec_id", "embedding",
      queryId = 1, k = 10).select("vec_id")
    val trained = Similarity.kMeansCentroids(fix, "embedding", dim = 64, k = 16)
    val approx = PQ.ivfPqTopK(fix, "vec_id", "embedding", dim = 64,
      queryId = 1, k = 10, nCentroids = 16, nProbe = 4, m = 8,
      kCodewords = 16, centroids = trained).select("vec_id")
    val hits = exact.join(approx, "vec_id").count()
    assert(hits >= 9, s"trained+re-rank recall $hits of 10")
  }

  test("pqTopKPortable is deterministic and integer-scored") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 10, dim = 16, noise = 0.05)
    val a = PQ.pqTopKPortable(fix, "vec_id", "embedding", dim = 16,
      queryId = 1, k = 8, m = 4, kCodewords = 8)
      .as[(Long, Long)].collect().toSeq
    val b = PQ.pqTopKPortable(fix, "vec_id", "embedding", dim = 16,
      queryId = 1, k = 8, m = 4, kCodewords = 8)
      .as[(Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.length == 8)
    // scores non-increasing with id tiebreak
    assert(a.sliding(2).forall(p =>
      p(0)._2 > p(1)._2 || (p(0)._2 == p(1)._2 && p(0)._1 < p(1)._1)))
  }

  test("ivfPqTopKPortable: deterministic, integer-scored, score decomposition holds") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 10, dim = 16, noise = 0.05)
    val a = PQ.ivfPqTopKPortable(fix, "vec_id", "embedding", dim = 16,
      queryId = 1, k = 8, nCentroids = 8, nProbe = 3, m = 4, kCodewords = 8)
      .as[(Long, Long)].collect().toSeq
    val b = PQ.ivfPqTopKPortable(fix, "vec_id", "embedding", dim = 16,
      queryId = 1, k = 8, nCentroids = 8, nProbe = 3, m = 4, kCodewords = 8)
      .as[(Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.length == 8)
    assert(a.sliding(2).forall(p =>
      p(0)._2 > p(1)._2 || (p(0)._2 == p(1)._2 && p(0)._1 < p(1)._1)))
    // probing every cell must reproduce each returned row's score exactly
    // (nProbe only prunes candidates, it never changes a kept row's score)
    val full = PQ.ivfPqTopKPortable(fix, "vec_id", "embedding", dim = 16,
      queryId = 1, k = 40, nCentroids = 8, nProbe = 8, m = 4, kCodewords = 8)
      .as[(Long, Long)].collect().toMap
    assert(a.forall { case (id, sc) => full(id) == sc },
      a.filterNot { case (id, sc) => full(id) == sc }.toString)
  }

  test("ivfPqTopKPortable releases its internal pin (no storage entry outlives the call)") {
    // r11 (VERDICT r10 §next-5, the gapFillDailyScoped contract applied
    // to the portable twin): the one MEMORY_AND_DISK pin inside the
    // operator is released before return, so repeated harness executions
    // cannot accumulate storage entries.
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 10, dim = 16, noise = 0.05)
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    PQ.ivfPqTopKPortable(fix, "vec_id", "embedding", dim = 16,
      queryId = 1, k = 8, nCentroids = 8, nProbe = 3, m = 4, kCodewords = 8)
      .collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"persistent RDDs leaked by the call: $leaked")
  }

  test("trainCodebooksSampled: deterministic, guarded, quality holds vs full") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 8,
      perCluster = 16, dim = 16, noise = 0.05)
    val a = PQ.trainCodebooksSampled(fix, "vec_id", "embedding", dim = 16,
      m = 4, k = 8, sampleFraction = 0.5)
    val b = PQ.trainCodebooksSampled(fix, "vec_id", "embedding", dim = 16,
      m = 4, k = 8, sampleFraction = 0.5)
    assert(a.length == 4 && a(0).length == 8 && a(0)(0).length == 4)
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq) // no RNG
    // sampled books reconstruct about as well as full-trained ones: mean
    // squared reconstruction error within 2x on the fixture
    val full = PQ.trainCodebooks(fix, "vec_id", "embedding", dim = 16,
      m = 4, k = 8)
    def mse(books: PQ.Codebooks): Double = {
      val vs = fix.select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
      vs.map { v =>
        (0 until 4).map { s =>
          val cands = books(s)
          cands.map(cw => (0 until 4).map(i =>
            math.pow(v(s * 4 + i) - cw(i), 2)).sum).min
        }.sum
      }.sum / vs.length
    }
    assert(mse(a) <= mse(full) * 2.0, s"sampled mse ${mse(a)} vs ${mse(full)}")
    // mis-sized fraction fails loudly instead of collecting the corpus
    val e = intercept[IllegalArgumentException] {
      PQ.trainCodebooksSampled(fix, "vec_id", "embedding", dim = 16,
        m = 4, k = 8, sampleFraction = 1.0, maxSampleRows = 10)
    }
    assert(e.getMessage.contains("maxSampleRows"), e.getMessage)
    // tiny corpora where the md5 sample selects nothing fall back to
    // full driver training instead of throwing (code-review r11) — the
    // default-parameter pqTopK call keeps working on a 5-row corpus
    val tiny = Seq.tabulate(5)(i =>
      (i.toLong, Seq.tabulate(16)(j => (i + j).toFloat)))
      .toDF("vec_id", "embedding")
    val books = PQ.trainCodebooksSampled(tiny, "vec_id", "embedding",
      dim = 16, m = 4, k = 4, sampleFraction = 1e-9)
    assert(books.length == 4)
    assert(PQ.pqTopK(tiny, "vec_id", "embedding", dim = 16, queryId = 1,
      k = 2, m = 4, kCodewords = 4).count() == 2)
  }

  test("trainCodebooks: empty cells keep codewords; wrong dim rejected") {
    intercept[IllegalArgumentException] {
      PQ.trainCodebooks(Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v"),
        "id", "v", dim = 2, m = 3, k = 2)
    }
    // k larger than distinct points: some cells stay empty, still valid
    val tiny = Seq((1L, Seq.fill(4)(1.0f)), (2L, Seq.fill(4)(2.0f)))
      .toDF("vec_id", "embedding")
    val books = PQ.trainCodebooks(tiny, "vec_id", "embedding", dim = 4,
      m = 2, k = 4, maxIter = 3)
    assert(books.length == 2 && books(0).length == 4 &&
      books(0)(0).length == 2)
  }

  test("pq index: write/read round-trips books; append encodes consistently") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 10, dim = 16, noise = 0.05)
    val path = java.nio.file.Files
      .createTempDirectory("graft-pqidx").toString + "/idx"
    PQ.pqWriteIndex(fix, "vec_id", "embedding", dim = 16, path,
      m = 4, kCodewords = 4, maxIter = 3)
    // sidecar round-trip is EXACT (parquet doubles are lossless), so an
    // appended copy of the same vectors must produce identical codes
    PQ.pqAppendIndex(
      fix.withColumn("vec_id", col("vec_id") + 1000L),
      "vec_id", "embedding", path)
    val codesStr = array_join(col("codes").cast("array<string>"), ",")
    val byKey = spark.read.parquet(path)
      .select(pmod(col("id"), lit(1000L)).as("k"), codesStr.as("cs"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), countDistinct(col("cs")).as("nc"))
      .as[(Long, Long, Long)].collect()
    assert(byKey.length == 40)
    assert(byKey.forall { case (_, n, nc) => n == 2 && nc == 1 }, byKey.take(3).toSeq)
  }

  test("opq index: rotation sidecar round-trips; append + probe consistent") {
    // r14 (VERDICT r13 §next-6): the rotated-PQ path persisted. The
    // rotation model stores as doubles (lossless), so an appended copy
    // of the same vectors rotates and encodes to IDENTICAL codes; the
    // probe rotates the query into the stored geometry and must equal
    // the in-memory ADC ranking computed from the sidecars directly.
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 10, dim = 16, noise = 0.05)
    val path = java.nio.file.Files
      .createTempDirectory("graft-opqidx").toString + "/idx"
    PQ.opqWriteIndex(fix, "vec_id", "embedding", dim = 16, path,
      m = 4, kCodewords = 4, maxIter = 3)
    PQ.opqAppendIndex(
      fix.withColumn("vec_id", col("vec_id") + 1000L),
      "vec_id", "embedding", path)
    val codesStr = array_join(col("codes").cast("array<string>"), ",")
    val byKey = spark.read.parquet(path)
      .select(pmod(col("id"), lit(1000L)).as("k"), codesStr.as("cs"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), countDistinct(col("cs")).as("nc"))
      .as[(Long, Long, Long)].collect()
    assert(byKey.length == 40)
    assert(byKey.forall { case (_, n, nc) => n == 2 && nc == 1 },
      byKey.take(3).toSeq)
    // probe == sidecar-derived ADC ranking (rotated query, rotated books)
    val q = fix.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val got = PQ.opqTopKIndexed(spark, path, q, k = 5, excludeId = 7)
      .as[(Long, Double)].collect().toSeq
    val lut = PQ.adcLut(
      PQ.rotateQuery(q, PQ.opqReadRotation(spark, path)),
      PQ.pqReadBooks(spark, path))
    val want = spark.read.parquet(path).filter(col("id") =!= 7)
      .select(col("id").as("vec_id"), PQ.adcScore(col("codes"), lut).as("adc"))
      .orderBy(col("adc").desc, col("vec_id").asc).limit(5)
      .as[(Long, Double)].collect().toSeq
    assert(got == want && got.length == 5)
    // a plain PQ index (no _rotation) fails the OPQ probe loudly
    val plain = java.nio.file.Files
      .createTempDirectory("graft-opqplain").toString + "/idx"
    PQ.pqWriteIndex(fix, "vec_id", "embedding", dim = 16, plain,
      m = 4, kCodewords = 4, maxIter = 3)
    val e = intercept[IllegalStateException] {
      PQ.opqTopKIndexed(spark, plain, q, k = 5)
    }
    assert(e.getMessage.contains("_rotation"), e.getMessage)
  }

  test("pqTopKIndexed matches in-memory ADC ranking for the same query") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 10, dim = 16, noise = 0.05)
    val path = java.nio.file.Files
      .createTempDirectory("graft-pqidx2").toString + "/idx"
    PQ.pqWriteIndex(fix, "vec_id", "embedding", dim = 16, path,
      m = 4, kCodewords = 4, maxIter = 3)
    val q = fix.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val got = PQ.pqTopKIndexed(spark, path, q, k = 5, excludeId = 7)
      .as[(Long, Double)].collect().toSeq
    // recompute the expected ADC ranking from the sidecar books directly
    val books = PQ.pqReadBooks(spark, path)
    val lut = PQ.adcLut(q, books)
    val want = spark.read.parquet(path).filter(col("id") =!= 7)
      .select(col("id").as("vec_id"), PQ.adcScore(col("codes"), lut).as("adc"))
      .orderBy(col("adc").desc, col("vec_id").asc).limit(5)
      .as[(Long, Double)].collect().toSeq
    assert(got == want)
    assert(got.length == 5)
  }

  test("pqReadBooks fails loudly when the sidecar is missing") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pqnoside").toString
    // a data-only dir (no _books)
    Seq((1L, Seq(0, 1))).toDF("id", "codes").write.parquet(s"$dir/idx")
    val e = intercept[IllegalStateException] {
      PQ.pqReadBooks(spark, s"$dir/idx")
    }
    assert(e.getMessage.contains("_books"), e.getMessage)
  }

  test("pq/opqRetrainCompact: build-half + append + retrain equals a " +
      "fresh build over the union, code-for-code (r17)") {
    val fix = Similarity.clusteredEmbeddings(spark, nClusters = 8,
      perCluster = 16, dim = 16, noise = 0.05)
    val half = fix.filter(col("vec_id") % 2 === 0)
    val other = fix.filter(col("vec_id") % 2 =!= 0)
    def codes(p: String) = spark.read.parquet(p)
      .select(col("id"), col("codes").cast("array<int>"))
      .as[(Long, Seq[Int])].collect().toMap
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pqretr").toString
    PQ.pqWriteIndex(half, "vec_id", "embedding", dim = 16, s"$dir/a",
      m = 4, kCodewords = 8)
    PQ.pqAppendIndex(other, "vec_id", "embedding", s"$dir/a")
    PQ.pqRetrainCompact(fix, "vec_id", "embedding", dim = 16, s"$dir/a",
      m = 4, kCodewords = 8)
    PQ.pqWriteIndex(fix, "vec_id", "embedding", dim = 16, s"$dir/b",
      m = 4, kCodewords = 8)
    assert(codes(s"$dir/a") == codes(s"$dir/b"))
    // the swapped index stays probeable, every id exactly once
    assert(codes(s"$dir/a").size == fix.count())
    val q = fix.filter(col("vec_id") === 1)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    assert(PQ.pqTopKIndexed(spark, s"$dir/a", q, k = 5, excludeId = 1)
      .count() == 5)
    // rotated family: both sidecars retrain and swap with the codes
    PQ.opqWriteIndex(half, "vec_id", "embedding", dim = 16, s"$dir/oa",
      m = 4, kCodewords = 8)
    PQ.opqAppendIndex(other, "vec_id", "embedding", s"$dir/oa")
    PQ.opqRetrainCompact(fix, "vec_id", "embedding", dim = 16, s"$dir/oa",
      m = 4, kCodewords = 8)
    PQ.opqWriteIndex(fix, "vec_id", "embedding", dim = 16, s"$dir/ob",
      m = 4, kCodewords = 8)
    assert(codes(s"$dir/oa") == codes(s"$dir/ob"))
    assert(PQ.opqTopKIndexed(spark, s"$dir/oa", q, k = 5, excludeId = 1)
      .count() == 5)
    // retrain on a non-index path fails loudly, not a silent create
    val e = intercept[IllegalStateException] {
      PQ.pqRetrainCompact(fix, "vec_id", "embedding", dim = 16,
        s"$dir/missing")
    }
    assert(e.getMessage.contains("_books"), e.getMessage)
  }
}
