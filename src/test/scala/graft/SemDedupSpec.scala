package graft

import graft.operators.{SemDedup, Similarity}
import org.apache.spark.sql.functions._

/** SemDeDup semantics: within-cell pairing equals the brute-force
  * same-cell threshold relation, planted clusters collapse to one
  * survivor each, and the portable twin is deterministic.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def fix = Similarity.clusteredEmbeddings(spark, nClusters = 8,
    perCluster = 6, dim = 16, noise = 0.03)

  test("candidatesPortable equals brute-force same-cell rational-cosine pairs") {
    val got = SemDedup.candidatesPortable(fix, "vec_id", "embedding",
        dim = 16, nCentroids = 8)
      .as[(Long, Long, Int)].collect().toSet
    // independent truth: quantize, assign by the same signed-dot argmax,
    // then ALL-pairs (48 vectors) with the integer threshold
    val q = Similarity.quantizeEmbeddings(fix, "vec_id", "embedding")
      .select(col("id"), col("qvec").cast("array<long>")).as[(Long, Seq[Long])]
      .collect().toMap
    // same ±1 family as the operator (md5 first-nibble parity), recomputed
    // independently here — the spec must not call the code under test
    def paritySign(key: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      if (((d(0) >> 4) & 1) == 0) 1L else -1L
    }
    val signs = Array.tabulate(8)(c => Array.tabulate(16)(i =>
      paritySign(s"c$c:$i")))
    def cell(v: Seq[Long]): Int = {
      val dots = signs.map(p => v.indices.map(i => p(i) * v(i)).sum)
      dots.indexOf(dots.max)
    }
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val want = (for {
      (ia, va) <- q; (ib, vb) <- q
      if ia < ib && cell(va) == cell(vb)
      d = dot(va, vb); na = dot(va, va); nb = dot(vb, vb)
      if na > 0 && nb > 0 && d > 0 && 100L * d * d >= 81L * na * nb
    } yield (ia, ib, cell(va))).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture produced no in-cell near-dup pairs")
  }

  test("dedupSemantic collapses planted clusters toward one survivor each") {
    val emb = fix
    val survivors = SemDedup.dedupSemantic(emb, "vec_id", "embedding",
        dim = 16, nCentroids = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors.subsetOf(
      emb.select("vec_id").as[Long].collect().toSet))
    // 8 planted clusters of 6: most clusters collapse; allow boundary
    // splits (a member quantized across the 0.9 line, or a cluster split
    // across cells) but demand REAL dedup: at least half the corpus gone,
    // at least one survivor per planted cluster
    assert(survivors.size >= 8, s"over-merged: ${survivors.size} survivors")
    assert(survivors.size <= 24, s"under-deduped: ${survivors.size} of 48")
    val clustersLeft = survivors.map(_ / 6).size
    assert(clustersLeft == 8, s"a whole planted cluster vanished: $survivors")
  }

  test("sample-trained cells still collapse planted clusters") {
    val emb = Similarity.clusteredEmbeddings(spark, nClusters = 8,
      perCluster = 16, dim = 16, noise = 0.03)
    // train on ~half the corpus, assign + dedup the whole of it
    val survivors = SemDedup.dedupSemantic(emb, "vec_id", "embedding",
        dim = 16, nCentroids = 8, trainFraction = 0.5)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors.size >= 8 && survivors.size <= 48,
      s"sampled training broke collapse: ${survivors.size} of 128")
    assert(survivors.map(_ / 16).size == 8, "a planted cluster vanished")
    // deterministic: the md5 sample has no RNG
    val again = SemDedup.dedupSemantic(emb, "vec_id", "embedding",
        dim = 16, nCentroids = 8, trainFraction = 0.5)
      .select("vec_id").as[Long].collect().toSet
    assert(again == survivors)
  }

  test("sampled-by-default training yields the same survivor set as full training") {
    // r11 (VERDICT r10 §next-4): the production default is SAMPLED
    // k-means; this pins that the centroid family does not decide the
    // outcome at fixture scale — duplicates are near-identical vectors,
    // so they share an argmax cell under either family and the threshold
    // filter (centroid-independent) decides membership.
    val emb = Similarity.clusteredEmbeddings(spark, nClusters = 8,
      perCluster = 16, dim = 16, noise = 0.03)
    def survivors(frac: Double) = SemDedup.dedupSemantic(emb, "vec_id",
        "embedding", dim = 16, nCentroids = 8, trainFraction = frac)
      .select("vec_id").as[Long].collect().toSet
    val sampledDefault = SemDedup.dedupSemantic(emb, "vec_id", "embedding",
        dim = 16, nCentroids = 8) // default trainFraction
      .select("vec_id").as[Long].collect().toSet
    assert(survivors(1.0) == sampledDefault,
      s"full ${survivors(1.0).size} vs sampled-default ${sampledDefault.size}")
    assert(survivors(0.25) == sampledDefault, "default is not the 0.25 sample")
  }

  test("kMeansCentroidsSampled: empty md5 sample falls back to full training") {
    // a fraction too small for the corpus must not silently hand back
    // untrained pseudo-centroids (code-review r11)
    val emb = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 8, dim = 16, noise = 0.03)
    val sampled = Similarity.kMeansCentroidsSampled(emb, "vec_id",
      "embedding", dim = 16, k = 4, sampleFraction = 1e-9)
    val full = Similarity.kMeansCentroidsSampled(emb, "vec_id",
      "embedding", dim = 16, k = 4, sampleFraction = 1.0)
    assert(sampled.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
    val pseudo = Similarity.pseudoCentroids(16, 4)
    assert(sampled.map(_.toSeq).toSeq != pseudo.map(_.toSeq).toSeq,
      "fallback did not train")
  }

  test("dedupSemanticScoped releases the pin: no cache entry outlives the call") {
    // VERDICT r11 §wrong-2: the q_dedup_semantic_text body persisted its
    // quantized frame with no scoped release, so a composing caller saw
    // a retained MEMORY_AND_DISK entry outlive the query. The scoped
    // form must leave the CacheManager exactly as it found it.
    spark.catalog.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty, "precondition: cache dirty")
    val emb = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 6, dim = 16, noise = 0.03)
    // a computed (non-scan) input, the case the pin exists for
    val computed = emb.withColumn("embedding",
      transform(col("embedding"), x => x * 1.0f))
    val n = SemDedup.dedupSemanticScoped(computed, "vec_id", "embedding",
      dim = 16, nCentroids = 4)(_.count())
    assert(n >= 4 && n <= 24, s"scoped dedup returned $n survivors")
    assert(spark.sharedState.cacheManager.isEmpty,
      "a storage entry outlived dedupSemanticScoped")
    // the action's result may be an eagerly-checkpointed frame that
    // outlives the pin — the q_dedup_semantic_text shape
    val surv = SemDedup.dedupSemanticScoped(computed, "vec_id", "embedding",
      dim = 16, nCentroids = 4)(_.select("vec_id").localCheckpoint(true))
    assert(spark.sharedState.cacheManager.isEmpty,
      "a cache entry outlived the checkpointing action")
    assert(surv.count() >= 4) // checkpointed frame stays usable after release
  }

  test("guardrail: a degenerate single-cell corpus fails loudly") {
    // identical vectors all land in one cell; maxCellRows=3 must trip
    val flat = Seq.tabulate(8)(i => (i.toLong, Seq.fill(16)(1.0f)))
      .toDF("vec_id", "embedding")
    // r18: the guard is FUSED into the pair pass (no separate measuring
    // job), so it trips at first materialization; rethrowBucketGuard
    // restores the classic IllegalArgumentException (dedupSemantic and
    // every duplicateGroups consumer get this wrapping for free).
    val e = intercept[IllegalArgumentException] {
      graft.operators.Guardrails.rethrowBucketGuard(
        SemDedup.candidatesPortable(flat, "vec_id", "embedding", dim = 16,
          nCentroids = 4, maxCellRows = 3).count())
    }
    assert(e.getMessage.contains("nCentroids"), e.getMessage)
  }

  test("persisted index: probe survivors equal dedupSemantic from scratch") {
    // r12 (VERDICT r11 §next-8): the amortized form — writeIndex pays
    // the train+assign once; dedupSemanticIndexed must return EXACTLY
    // the scratch form's survivor set (same deterministic sampled train,
    // same integer-exact pair stage), not an approximation of it.
    val emb = Similarity.clusteredEmbeddings(spark, nClusters = 8,
      perCluster = 6, dim = 16, noise = 0.03)
    val dir = java.nio.file.Files.createTempDirectory("semidx-spec").toString
    SemDedup.semDedupWriteIndex(emb, "vec_id", "embedding", dim = 16,
      nCentroids = 8, path = s"$dir/idx")
    val probe = SemDedup.dedupSemanticIndexed(spark, s"$dir/idx")
      .select("id").as[Long].collect().toSet
    val scratch = SemDedup.dedupSemantic(emb, "vec_id", "embedding",
        dim = 16, nCentroids = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(probe == scratch, s"probe ${probe.size} vs scratch ${scratch.size}")
    // the index schema carries the assignment: every cell within range
    val cells = spark.read.parquet(s"$dir/idx").select("cell")
      .as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < 8))
  }

  test("persisted index: O(batch) append joins the next dedup pass") {
    // half the corpus indexed, the other half appended under the SIDECAR
    // centroids — the post-append probe must collapse a planted copy that
    // straddles the write/append boundary.
    val base = (1L to 8L).map(i =>
      (i, s"indexed doc $i about subject $i with words a$i b$i c$i d$i"))
    val docs = base.toDF("doc_id", "text")
    val vecs = docs.select(col("doc_id"),
        graft.operators.TextAnalysis.hashedTextVector(col("text"), 32).as("hv"))
      .filter(col("hv").isNotNull)
    val q = Similarity.quantizeEmbeddings(vecs, "doc_id", "hv")
      .select(col("id").as("doc_id"), col("qvec"))
    val dir = java.nio.file.Files.createTempDirectory("semidx-app").toString
    SemDedup.semDedupWriteIndex(q, "doc_id", "qvec", dim = 32,
      nCentroids = 2, path = s"$dir/idx")
    // the appended batch: verbatim copies of docs 1 and 4 under new ids
    val copies = Seq(101L -> base(0)._2, 104L -> base(3)._2)
      .toDF("doc_id", "text")
    val cvecs = copies.select(col("doc_id"),
        graft.operators.TextAnalysis.hashedTextVector(col("text"), 32).as("hv"))
      .filter(col("hv").isNotNull)
    val cq = Similarity.quantizeEmbeddings(cvecs, "doc_id", "hv")
      .select(col("id").as("doc_id"), col("qvec"))
    SemDedup.semDedupAppendIndex(cq, "doc_id", "qvec", s"$dir/idx")
    val kept = SemDedup.dedupSemanticIndexed(spark, s"$dir/idx")
      .select("id").as[Long].collect().toSet
    assert(!kept.contains(101L) && !kept.contains(104L),
      s"appended verbatim copies survived: $kept") // identical vector, same cell
    assert(kept.contains(1L) && kept.contains(4L), kept.toString)
  }

  test("persisted index: a missing centroid sidecar fails loudly") {
    val emb = Similarity.clusteredEmbeddings(spark, nClusters = 4,
      perCluster = 4, dim = 16, noise = 0.03)
    val dir = java.nio.file.Files.createTempDirectory("semidx-bad").toString
    // data without the sidecar — e.g. a crash between the two writes
    Similarity.quantizeEmbeddings(emb, "vec_id", "embedding")
      .withColumn("cell", lit(0)).write.partitionBy("cell")
      .parquet(s"$dir/idx")
    val e = intercept[IllegalStateException] {
      SemDedup.dedupSemanticIndexed(spark, s"$dir/idx").count()
    }
    assert(e.getMessage.contains("semDedupWriteIndex"), e.getMessage)
  }

  test("embedding-free path: hashed text vectors collapse verbatim copies") {
    // 8 distinct docs + verbatim copies of 3 — identical text means an
    // identical hashed vector, the same cell, cosine exactly 1, so the
    // copy ALWAYS collapses onto the min-id original (engine invariant,
    // not clustering luck)
    val base = (1L to 8L).map(i =>
      (i, s"document number $i speaks about topic $i with words w${i}a w${i}b w${i}c w${i}d"))
    val copies = Seq(101L -> base(0)._2, 102L -> base(3)._2, 103L -> base(6)._2)
    val docs = (base ++ copies).toDF("doc_id", "text")
    val vecs = docs.select(col("doc_id"),
        graft.operators.TextAnalysis.hashedTextVector(col("text"), 32).as("hv"))
      .filter(col("hv").isNotNull)
    val q = Similarity.quantizeEmbeddings(vecs, "doc_id", "hv")
      .select(col("id").as("doc_id"), col("qvec"))
    val kept = SemDedup.dedupSemantic(q, "doc_id", "qvec", dim = 32,
        nCentroids = 2, minCosNum = 9, minCosDen = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.exists(_ > 100L), kept.toString) // every copy collapsed
    assert((1L to 8L).toSet.subsetOf(kept) ||
      kept.size >= 5, kept.toString) // distinct docs mostly survive
  }

  test("semDedupRetrainCompact: duplicate pairs split across frozen " +
      "cells survive silently until retrain collapses them (r17)") {
    def pt(id: Long, a: Double, b: Double, c: Double): (Long, Array[Float]) =
      (id, Array(a.toFloat, b.toFloat, c.toFloat, 0.0f))
    // two clean axis clusters, plus ONE semantic cluster of ten mutually
    // near-identical vectors (pairwise cosine >= 0.98, far above the 9/10
    // bar) on the Voronoi boundary of the frozen centroids with
    // alternating ±tilt — the frozen assignment splits it 5/5 across the
    // two cells
    val base = (0 until 10).map(i => pt(i, 1.0, 0.001 * i, 0.0)) ++
      (0 until 10).map(i => pt(100 + i, 0.001 * i, 1.0, 0.0))
    val drift = (0 until 5).flatMap { j =>
      val d = 0.02
      Seq(pt(200L + 2 * j, 0.7071 + d, 0.7071 - d, 0.05 * j),
        pt(201L + 2 * j, 0.7071 - d, 0.7071 + d, 0.05 * j))
    }
    val all = (base ++ drift).toDF("vec_id", "embedding")
    // construct the drifted index state EXPLICITLY (appends froze these
    // centroids; hand-planting them pins the geometry instead of hoping
    // a k=2 training run lands on the axes)
    val planted = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val path = java.nio.file.Files
      .createTempDirectory("graft-semretr").toString + "/idx"
    Similarity.quantizeEmbeddings(all, "vec_id", "embedding")
      .select(col("id"), col("qvec"),
        Similarity.ivfAssignTo(col("qvec"), planted).as("cell"))
      .write.partitionBy("cell").parquet(path)
    Similarity.writeCentroidSidecar(spark, planted, path)
    def driftSurvivors() = SemDedup.dedupSemanticIndexed(spark, path)
      .select("id").as[Long].collect().filter(_ >= 200L).toSet
    // the silent-decay state: ONE semantic cluster keeps TWO survivors —
    // each cell's five members collapse among themselves, but the
    // cross-cell half of the cluster is never compared
    assert(driftSurvivors() == Set(200L, 201L), driftSurvivors().toString)
    // retrain with a cell budget covering the new cluster: the whole
    // cluster is co-located again and collapses to its true min id
    SemDedup.semDedupRetrainCompact(spark, path, nCentroids = 3)
    assert(driftSurvivors() == Set(200L), driftSurvivors().toString)
    // the base clusters still dedup to their own min-id survivors
    val kept = SemDedup.dedupSemanticIndexed(spark, path)
      .select("id").as[Long].collect().toSet
    assert(kept.contains(0L) && kept.contains(100L), kept.toString)
  }
}
