package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** RRF fusion semantics: hand-computed fixed-point scores, agreement
  * counting, deterministic ties, and the integer-exact dense arm.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def ranked(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "id", "rank")

  private def c(rank: Int, k: Int = 60): Long =
    math.round(1e12 / (k + rank))

  test("marginMine: hub demotion, hand-computed margins, guards") {
    // r14 (Artetxe & Schwenk 2019): the margin must demote a HUB — a
    // target close to every source — below an exclusive partner, even
    // when raw similarities are comparable. src x1=(1,0) has exclusive
    // partner y1=(1,0); yh=(0.8,0.8) is near both sources.
    val src = Seq((0L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((1L, Seq(1.0, 0.0)), (3L, Seq(0.8, 0.8)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Retrieval.marginMine(src, tgt, "vec_id",
        "embedding", queryIds = Seq(0L), k = 2, topM = 2)
      .orderBy("rank").as[(Long, Long, Long, Long, Int)].collect().toSeq
    // quantized dots (scale 1000): s(x1,y1)=1e6, s(x1,yh)=8e5,
    // s(x2,y1)=0, s(x2,yh)=8e5. fwd_mass(x1)=1.8e6;
    // bwd_mass(y1)=1e6+0=1e6, bwd_mass(yh)=8e5+8e5=1.6e6.
    // margin(y1) = 4e3·1e6 div 2.8e6 = 1428;
    // margin(yh) = 4e3·8e5 div 3.4e6 = 941 — exclusive partner wins.
    assert(got == Seq(
      (0L, 1L, 1000000L, 1428L, 1),
      (0L, 3L, 800000L, 941L, 2)), got.toString)
    // guards: empty batch, over-wide batch, overflow
    intercept[IllegalArgumentException] {
      graft.operators.Retrieval.marginMine(src, tgt, "vec_id", "embedding",
        Seq.empty, k = 2)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Retrieval.marginMine(src, tgt, "vec_id", "embedding",
        Seq(0L), k = 2, maxQueryIds = 0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Retrieval.marginMine(
        Seq((0L, Seq(3.0e6, 0.0))).toDF("vec_id", "embedding"),
        Seq((1L, Seq(3.0e6, 0.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", Seq(0L), k = 2)
    }
  }

  test("marginMineIndexed: equals brute marginMine at full probe recall; " +
      "overflow guard fails loudly") {
    // r15 (VERDICT r14 §next-3): the corpus×corpus composition — both
    // neighborhood passes on persisted IVF indexes. With nProbe =
    // nCentroids the probes have exact recall, so the result must be
    // BIT-IDENTICAL to the brute form (shared marginTail arithmetic).
    val fix = graft.operators.Similarity.clusteredEmbeddings(spark,
      nClusters = 4, perCluster = 8, dim = 8)
    val src = fix.filter(col("vec_id") % 2 === 0)
    val tgt = fix.filter(col("vec_id") % 2 =!= 0)
    val base = java.nio.file.Files.createTempDirectory("graft-mmi").toString
    graft.operators.Similarity.ivfWriteIndex(src, "vec_id", "embedding",
      dim = 8, nCentroids = 4, path = s"$base/src")
    graft.operators.Similarity.ivfWriteIndex(tgt, "vec_id", "embedding",
      dim = 8, nCentroids = 4, path = s"$base/tgt")
    val qids = Seq(0L, 2L, 4L)
    val brute = Retrieval.marginMine(src, tgt, "vec_id", "embedding",
        qids, k = 4, topM = 3)
      .orderBy("src_id", "rank")
      .as[(Long, Long, Long, Long, Int)].collect().toSeq
    val indexed = Retrieval.marginMineIndexed(spark, s"$base/src",
        s"$base/tgt", qids, k = 4, topM = 3, nProbe = 4)
      .orderBy("src_id", "rank")
      .as[(Long, Long, Long, Long, Int)].collect().toSeq
    assert(brute.nonEmpty)
    assert(indexed == brute, s"indexed $indexed\nbrute $brute")
    // the reduced-probe path keeps the schema/tie contract (recall is
    // the tradeoff, the shape is not)
    val narrow = Retrieval.marginMineIndexed(spark, s"$base/src",
      s"$base/tgt", qids, k = 4, topM = 3, nProbe = 1)
    assert(narrow.columns.toSeq ==
      Seq("src_id", "tgt_id", "score", "margin_scaled", "rank"))
    // overflow guard (ADVICE r14): an extreme marginScale used to WRAP
    // 2k·marginScale and silently vacate the guard — it must now throw
    intercept[IllegalArgumentException] {
      Retrieval.marginMine(src, tgt, "vec_id", "embedding", Seq(0L),
        k = 4, marginScale = Long.MaxValue / 2)
    }
  }

  test("rrfFuse: hand-computed fixed-point scores and agreement counts") {
    // query 1: doc 10 is rank 1 lexically and rank 2 densely; doc 20
    // only lexical (rank 2); doc 30 only dense (rank 1)
    val lex = ranked((1L, 10L, 1), (1L, 20L, 2))
    val den = ranked((1L, 30L, 1), (1L, 10L, 2))
    val got = Retrieval.rrfFuse(Seq(lex, den), topK = 10)
      .orderBy("rank").as[(Long, Int, Long, Long, Int)].collect().toSeq
    val both = c(1) + c(2)   // doc 10: 1/61 + 1/62 scaled
    val one1 = c(1)          // doc 30
    val one2 = c(2)          // doc 20
    assert(both > one1 && one1 > one2) // two-list doc wins
    assert(got == Seq(
      (1L, 1, 10L, both, 2),
      (1L, 2, 30L, one1, 1),
      (1L, 3, 20L, one2, 1)), got)
  }

  test("rrfFuse: equal single-list scores tie-break id ascending") {
    val lex = ranked((1L, 50L, 1))
    val den = ranked((1L, 7L, 1))
    val got = Retrieval.rrfFuse(Seq(lex, den), topK = 10)
      .orderBy("rank").as[(Long, Int, Long, Long, Int)].collect().toSeq
    // identical contribution c(1) for both docs -> lower id first
    assert(got.map(r => (r._2, r._3)) == Seq((1, 7L), (2, 50L)), got)
    assert(got.forall(_._4 == c(1)))
  }

  test("rrfFuse: topK truncation, per-query isolation, custom kRrf") {
    val lex = ranked((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3), (2L, 9L, 1))
    val got = Retrieval.rrfFuse(Seq(lex), topK = 2, kRrf = 10)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Long, Int)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 1, 1L), (1L, 2, 2L), (2L, 1, 9L)), got)
    assert(got.head._4 == math.round(1e12 / 11))
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Nil, 5) }
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq(lex), 0) }
  }

  test("ndcgDiscounts: exact fixed-point anchors") {
    val d = Retrieval.ndcgDiscounts(3).toMap
    assert(d(1) == 1000000000000L)      // 1/log2(2) = 1
    assert(d(3) == 500000000000L)       // 1/log2(4) = 1/2 exactly
    assert(d(2) == math.round(1e12 / (math.log(3.0) / math.log(2.0))))
  }

  test("evaluateRanking: hand-computed metrics and the 0/0 NULL branch") {
    val d = Retrieval.ndcgDiscounts(3).toMap
    // query 1: judged docs 10(rel 3) / 30(rel 2) / 20(rel 1) / 40(rel 0);
    // ranking 10, 99 (unjudged), 30. query 2: ranked but judgment-free.
    val qrels = Seq((1L, 10L, 3), (1L, 20L, 1), (1L, 30L, 2), (1L, 40L, 0))
      .toDF("query_id", "id", "rel")
    val ranking = Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 30L, 3),
      (2L, 10L, 1)).toDF("query_id", "id", "rank")
    val got = Retrieval.evaluateRanking(ranking, qrels, k = 3)
      .orderBy("query_id").collect()
    val dcg = 3 * d(1) + 2 * d(3)
    val idcg = 3 * d(1) + 2 * d(2) + 1 * d(3)
    val r1 = got(0)
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 2L) // n_rel, hits
    assert(r1.getLong(3) == math.round(1e12 * (2.0 / 3.0)))
    assert(r1.getLong(4) == 1000000000000L) // MRR: relevant at rank 1
    assert(r1.getLong(5) == dcg && r1.getLong(6) == idcg)
    assert(r1.getLong(7) == math.round(1e12 * (dcg.toDouble / idcg.toDouble)))
    val r2 = got(1)
    assert(r2.getLong(1) == 0L && r2.getLong(2) == 0L)
    // 0/0 undefined, not zero — for MRR too (judgment-free queries must
    // not deflate the macro mean; code-review r12)
    assert(r2.isNullAt(3) && r2.isNullAt(4) && r2.isNullAt(7))
    assert(r2.getLong(5) == 0L && r2.getLong(6) == 0L)
    intercept[IllegalArgumentException] {
      Retrieval.evaluateRanking(ranking, qrels, 0)
    }
  }

  test("evaluateRanking: a judged query with no ranking rows scores 0") {
    // trec_eval behavior: query 9 has qrels but retrieval returned
    // nothing — it must appear with zeros, not vanish (a system
    // answering nothing on hard queries must not outscore one
    // answering them poorly; code-review r12)
    val qrels = Seq((1L, 10L, 1), (9L, 20L, 2)).toDF("query_id", "id", "rel")
    val ranking = Seq((1L, 10L, 1)).toDF("query_id", "id", "rank")
    val got = Retrieval.evaluateRanking(ranking, qrels, k = 3)
      .orderBy("query_id").collect()
    assert(got.length == 2)
    val r9 = got(1)
    assert(r9.getLong(0) == 9L && r9.getLong(1) == 1L)
    assert(r9.getLong(2) == 0L && r9.getLong(3) == 0L) // hits, recall 0
    assert(r9.getLong(4) == 0L)                        // judged: mrr 0
    assert(r9.getLong(7) == 0L)                        // ndcg 0
  }

  test("evaluateRanking: MRR takes the FIRST relevant rank; cutoff bites") {
    val qrels = Seq((1L, 30L, 1), (1L, 50L, 2)).toDF("query_id", "id", "rel")
    val ranking = Seq((1L, 10L, 1), (1L, 30L, 2), (1L, 50L, 3))
      .toDF("query_id", "id", "rank")
    val got = Retrieval.evaluateRanking(ranking, qrels, k = 2)
      .collect().head
    assert(got.getLong(2) == 1L)                       // only rank 2 ≤ k
    assert(got.getLong(4) == math.round(1e12 / 2.0))   // first hit at 2
  }

  test("macroAverages: NULL metrics of unjudged queries are skipped") {
    val qrels = Seq((1L, 10L, 2)).toDF("query_id", "id", "rel")
    val ranking = Seq((1L, 10L, 1), (2L, 10L, 1))
      .toDF("query_id", "id", "rank")
    val m = Retrieval.evaluateRanking(ranking, qrels, k = 3)
    val got = Retrieval.macroAverages(m).collect().head
    assert(got.getLong(0) == 2L)
    assert(got.getLong(1) == 1000000000000L) // recall mean over 1 defined
    assert(got.getLong(2) == 1000000000000L) // mrr: the unjudged query's
    assert(got.getLong(3) == 1000000000000L) // NULL is skipped, like ndcg
  }

  test("mmrRerank: redundancy penalized, hand-computed greedy picks") {
    // id 2 duplicates id 1's vector; id 3 is orthogonal — MMR must
    // pick the diverse id 3 second despite its lower relevance
    val cands = Seq(
      (1L, 1L, 100L, Array(1.0f, 0.0f)),
      (1L, 2L, 90L, Array(1.0f, 0.0f)),
      (1L, 3L, 80L, Array(0.0f, 1.0f)))
      .toDF("query_id", "id", "rel", "vec")
    val got = Retrieval.mmrRerank(cands, k = 3)
      .orderBy("pos").as[(Long, Int, Long, Long)].collect().toSeq
    // sim(1,2) = 1000*1000 = 1e6; sim(*,3) = 0; lambda 50
    assert(got == Seq(
      (1L, 1, 1L, 50L * 100),                 // max rel, maxsim 0
      (1L, 2, 3L, 50L * 80),                  // diverse beats redundant
      (1L, 3, 2L, 50L * 90 - 50L * 1000000)), // the near-dup, penalized
      got)
  }

  test("mmrRerank: pure-relevance at lambda 100, ties id asc, guards") {
    val cands = Seq(
      (1L, 5L, 10L, Array(1.0f, 0.0f)),
      (1L, 4L, 10L, Array(0.0f, 1.0f)),
      (2L, 9L, 7L, Array(1.0f, 0.0f)))
      .toDF("query_id", "id", "rel", "vec")
    val got = Retrieval.mmrRerank(cands, k = 1, lambdaPct = 100)
      .orderBy("query_id").as[(Long, Int, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1, 4L, 1000L), (2L, 1, 9L, 700L)), got)
    intercept[IllegalArgumentException] {
      Retrieval.mmrRerank(cands, k = 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.mmrRerank(cands, lambdaPct = 101)
    }
    intercept[IllegalArgumentException] {
      Retrieval.mmrRerank(cands, maxCandidates = 1) // per-QUERY bound
    }
    // the per-query bound, not the total: 2 per query passes at 2
    assert(Retrieval.mmrRerank(cands, k = 2, maxCandidates = 2)
      .count() == 3)
  }

  test("denseTopKQuantized: exact quantized ranking, self excluded") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val got = Retrieval.denseTopKQuantized(emb, "vec_id", "embedding",
        Seq(0L), k = 3)
      .orderBy("rank").as[(Long, Long, Int, Long)].collect().toSeq
    // dots vs [1000, 0]: id1 = 900*1000 = 900000, id3 = 500000, id2 = 0
    assert(got == Seq((0L, 1L, 1, 900000L), (0L, 3L, 2, 500000L),
      (0L, 2L, 3, 0L)), got)
  }
}
