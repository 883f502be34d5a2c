package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE semantics: the classic Sennrich word-frequency example trains the
  * expected merges, the native encode expression reproduces the trainer's
  * tokenization (the Σ self-consistency invariant), and the merge table
  * round-trips through parquet.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al. (2016) §3.2 example vocabulary: low×5, lower×2,
  // newest×6, widest×3 — one word per row, repeated by frequency
  private def sennrich = {
    val words =
      List.fill(5)("low") ++ List.fill(2)("lower") ++
        List.fill(6)("newest") ++ List.fill(3)("widest")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("trainBpe reproduces the hand-computed Sennrich merges") {
    val merges = Bpe.trainBpe(sennrich, "text", numMerges = 4)
    // hand computation with the </w> marker:
    //   pair counts round 1: (e,s) 9 (newest 6 + widest 3) is the max
    //   round 2: (es,t) 9 ; round 3: (est,</w>) 9 ; round 4: (l,o) 7
    val got = merges.map(m => (m.rank, m.left, m.right, m.appliedCount))
    assert(got == Seq(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "est", "</w>", 9L),
      (3, "l", "o", 7L)), got)
  }

  test("native encode reproduces the trainer's tokenization: Σ invariant exact") {
    val docs = sennrich
    val merges = Bpe.trainBpe(docs, "text", numMerges = 10)
    val init = docs.agg(sum(Bpe.initialTokenCount(col("text"))))
      .as[Long].head()
    val after = docs.agg(sum(Bpe.bpeTokenCount(col("text"), merges)))
      .as[Long].head()
    assert(init == after + merges.map(_.appliedCount).sum,
      s"init=$init after=$after merges=${merges.map(_.appliedCount).sum}")
    // spot-check one word: "newest" under the first 3 merges is
    // [n, e, w, est</w>] = 4 tokens
    val one = Seq((1L, "newest")).toDF("doc_id", "text")
      .select(Bpe.bpeTokenCount(col("text"), merges.take(3)))
      .as[Long].head()
    assert(one == 4L, s"newest encoded to $one tokens")
  }

  test("merge table round-trips through parquet; encode on corpus B") {
    val merges = Bpe.trainBpe(sennrich, "text", numMerges = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Bpe.mergesTable(spark, merges).write.parquet(s"$dir/merges")
    val reloaded = Bpe.readMerges(spark, s"$dir/merges")
    assert(reloaded == merges)
    // tokenize UNSEEN text with the trained merges: "lowest" = l+o merged,
    // w, est</w> merged → [lo, w, est</w>] = 3 tokens
    val n = Seq((1L, "lowest")).toDF("doc_id", "text")
      .select(Bpe.bpeTokenCount(col("text"), reloaded)).as[Long].head()
    assert(n == 3L, s"lowest encoded to $n tokens")
  }

  test("determinism, early stop, and the vocab guard") {
    val merges1 = Bpe.trainBpe(sennrich, "text", numMerges = 4)
    val merges2 = Bpe.trainBpe(sennrich, "text", numMerges = 4)
    assert(merges1 == merges2)
    // a corpus that exhausts useful merges stops early
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val m = Bpe.trainBpe(tiny, "text", numMerges = 50, minPairCount = 1)
    assert(m.length < 50, s"did not stop: ${m.length}")
    intercept[IllegalArgumentException] {
      Bpe.trainBpe(sennrich, "text", numMerges = 2, maxVocab = 2)
    }
  }

  test("greedy leftmost within a word: overlapping pair runs") {
    // word "aaaa": pair (a,a) applies greedily -> [aa, aa, </w>], i.e.
    // 2 applications, not 3 (matches at overlapping positions skip)
    val (syms, n) = Bpe.applyMerge(Bpe.baseSymbols("aaaa"), "a", "a")
    assert(syms == Vector("aa", "aa", "</w>") && n == 2, s"$syms/$n")
  }
}
