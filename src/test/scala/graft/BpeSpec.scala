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

  /** The r9 full-recount trainer, kept verbatim as the reference the
    * incremental rewrite must match merge-for-merge (VERDICT r9 §next-4).
    */
  private def trainBpeReference(docs: org.apache.spark.sql.DataFrame,
                                textCol: String, numMerges: Int,
                                minPairCount: Long): Seq[Bpe.Merge] = {
    val wc = Bpe.wordCounts(docs, textCol)
    var table: Array[(Vector[String], Long)] = wc.collect()
      .map(r => (Bpe.baseSymbols(r.getString(0)), r.getLong(1)))
    val merges = Seq.newBuilder[Bpe.Merge]
    var rank = 0
    var continue = true
    while (rank < numMerges && continue) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      table.foreach { case (syms, cnt) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((left, right), best) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        if (best < minPairCount) continue = false
        else {
          var applied = 0L
          table = table.map { case (syms, cnt) =>
            val (merged, k) = Bpe.applyMerge(syms, left, right)
            applied += k * cnt
            (merged, cnt)
          }
          merges += Bpe.Merge(rank, left, right, applied)
          rank += 1
        }
      }
    }
    merges.result()
  }

  test("incremental trainer matches the full-recount reference merge-for-merge") {
    // Fixture corpus (the real documents table) at 60 merges with
    // minPairCount=1 — deep enough that a single bookkeeping slip in the
    // incremental pair-count/index maintenance diverges the argmax order.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val inc = Bpe.trainBpe(docs, "text", numMerges = 60, minPairCount = 1)
    val ref = trainBpeReference(docs, "text", numMerges = 60, minPairCount = 1)
    assert(inc == ref,
      s"diverged at rank ${inc.zip(ref).indexWhere { case (a, b) => a != b }}")
    // And on the Sennrich vocabulary with early stop in play.
    val inc2 = Bpe.trainBpe(sennrich, "text", numMerges = 50, minPairCount = 2)
    val ref2 = trainBpeReference(sennrich, "text", numMerges = 50, minPairCount = 2)
    assert(inc2 == ref2)
  }

  test("bpeEncodeIds: ids track merges; size equals bpeTokenCount; conservation") {
    val vocab = Bpe.trainBpeModel(sennrich, "text", numMerges = 4)
    // base symbols: sorted distinct initial symbols of the corpus
    assert(vocab.baseSymbols == vocab.baseSymbols.sorted)
    assert(vocab.baseSymbols.contains("</w>"))
    val b = vocab.baseSymbols.length
    // "lowest": l+o -> merge rank 3 (id b+3), w base, e+s+t+</w> ->
    // est</w> via ranks 0,1,2 (final id b+2)
    val ids = Seq((1L, "lowest")).toDF("doc_id", "text")
      .select(Bpe.bpeEncodeIds(col("text"), vocab).as("ids"))
      .as[Seq[Int]].head()
    assert(ids == Seq(b + 3, vocab.baseSymbols.indexOf("w"), b + 2), ids)
    // corpus-wide: size(ids) == bpeTokenCount on every doc, all ids known,
    // and base-length conservation rebuilds the initial-symbol total
    val blLit = typedlit(vocab.baseLengths.toSeq)
    val row = sennrich.select(
        Bpe.bpeEncodeIds(col("text"), vocab).as("ids"),
        Bpe.bpeTokenCount(col("text"), vocab.merges).as("cnt"),
        Bpe.initialTokenCount(col("text")).as("init"))
      .agg(
        sum(when(size(col("ids")).cast("long") === col("cnt"), 0).otherwise(1)),
        min(array_min(col("ids"))),
        sum(aggregate(transform(col("ids"), i => element_at(blLit, i + 1)),
          lit(0L), (a, v) => a + v)),
        sum(col("init")))
      .as[(Long, Int, Long, Long)].head()
    assert(row._1 == 0L, s"size/count mismatch rows: ${row._1}")
    assert(row._2 >= 0, s"unknown id on training corpus: ${row._2}")
    assert(row._3 == row._4, s"conservation: span=${row._3} init=${row._4}")
  }

  test("bpeEncodeIds: out-of-vocabulary characters emit -1") {
    val vocab = Bpe.trainBpeModel(sennrich, "text", numMerges = 4)
    val ids = Seq((1L, "loz")).toDF("doc_id", "text")
      .select(Bpe.bpeEncodeIds(col("text"), vocab).as("ids"))
      .as[Seq[Int]].head()
    // l+o merged (rank 3), z unseen -> -1, </w> base id
    val b = vocab.baseSymbols.length
    assert(ids == Seq(b + 3, -1, vocab.baseSymbols.indexOf("</w>")), ids)
  }

  test("length-prefixed spec: control characters in symbols parse correctly") {
    // A corpus whose words contain C0 control chars (legal: they are not
    // \s) — the old sentinel-delimited spec mis-parsed these (ADVICE r9).
    val nul = 0.toChar.toString; val soh = 1.toChar.toString
    val w1 = s"a${soh}b"; val w2 = s"a${nul}c"
    val weird = Seq((1L, s"$w1 $w1 $w2 $w2"),
      (2L, s"$w1 $w2")).toDF("doc_id", "text")
    val vocab = Bpe.trainBpeModel(weird, "text", numMerges = 6, minPairCount = 1)
    val init = weird.agg(sum(Bpe.initialTokenCount(col("text"))))
      .as[Long].head()
    val after = weird.agg(sum(Bpe.bpeTokenCount(col("text"), vocab.merges)))
      .as[Long].head()
    assert(init == after + vocab.merges.map(_.appliedCount).sum,
      s"init=$init after=$after")
    val row = weird.select(
        Bpe.bpeEncodeIds(col("text"), vocab).as("ids"),
        Bpe.bpeTokenCount(col("text"), vocab.merges).as("cnt"))
      .agg(sum(when(size(col("ids")).cast("long") === col("cnt"), 0).otherwise(1)),
        min(array_min(col("ids"))))
      .as[(Long, Int)].head()
    assert(row._1 == 0L && row._2 >= 0, row)
  }

  /** Full-scan reference encoder: iterate ALL ranks 0..M per word (the
    * r10-replaced O(M·len) shape) — the truth the rank-candidate-set
    * encode in [[graft.expressions.BpeOps]] must match token-for-token.
    */
  private def naiveEncodeIds(text: String, vocab: Bpe.BpeVocab): Seq[Int] = {
    val b = vocab.baseSymbols.length
    val baseId = vocab.baseSymbols.zipWithIndex.toMap
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { word =>
      var syms = Bpe.baseSymbols(word)
      var ids = syms.map(s => baseId.getOrElse(s, -1))
      vocab.merges.foreach { m =>
        val ns = Vector.newBuilder[String]
        val ni = Vector.newBuilder[Int]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == m.left && syms(i + 1) == m.right) {
            ns += m.left + m.right; ni += b + m.rank; i += 2
          } else { ns += syms(i); ni += ids(i); i += 1 }
        }
        syms = ns.result(); ids = ni.result()
      }
      ids
    }
  }

  test("byte BPE: Sennrich merges over bytes, ids offset by the 256 alphabet") {
    // no </w> marker at the byte level, so the hand computation differs
    // from the char trainer: (e,s) 9, (es,t) 9, then (l,o) 7 — there is
    // no (est,</w>) round. Case is preserved.
    val vocab = Bpe.trainByteBpeModel(sennrich, "text", numMerges = 3)
    val got = vocab.merges.map(m => (m.rank, m.left, m.right, m.appliedCount))
    assert(got == Seq(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "l", "o", 7L)), got)
    assert(vocab.baseSymbols == Bpe.ByteAlphabet)
    // merge rank r mints id 256 + r; base ids ARE byte values
    val ids = Seq((1L, "newest")).toDF("doc_id", "text")
      .select(Bpe.byteBpeEncodeIds(col("text"), vocab)).as[Seq[Int]].head()
    assert(ids == Seq('n'.toInt, 'e'.toInt, 'w'.toInt, 256 + 1), ids)
  }

  test("byte BPE: zero unknowns and exact byte conservation on ANY input") {
    // model trained on plain ASCII; inputs the training corpus never saw
    // a single character of — emoji, CJK, combining accents, control
    // chars — must encode with NO -1 and spans summing to byte length
    val vocab = Bpe.trainByteBpeModel(sennrich, "text", numMerges = 5)
    val alien = Seq(
      (1L, "你好世界"), (2L, "🌍🚀"), (3L, "naïve café"),
      (4L, "καλημέρα здравствуйте"), (5L, "MiXeD CaSe lower"),
      (6L, "ab"), (7L, ""))
      .toDF("doc_id", "text")
    val bl = vocab.baseLengths
    val rows = alien.select(col("doc_id"),
        Bpe.byteBpeEncodeIds(col("text"), vocab).as("ids"),
        Bpe.wordByteLength(col("text")).as("nb"))
      .as[(Long, Seq[Int], Long)].collect()
    rows.foreach { case (id, ids, nb) =>
      assert(!ids.exists(_ < 0), s"doc $id emitted an unknown id: $ids")
      assert(ids.forall(_ < vocab.vocabSize), s"doc $id out of vocab")
      val span = ids.map(i => bl(i)).sum
      assert(span == nb, s"doc $id: span $span != bytes $nb")
    }
    // case preserved: "lower" (trained, lowercase) merges; "MiXeD" stays
    // single bytes — its uppercase bytes never trained a merge
    val mixed = rows.find(_._1 == 5L).get._2
    assert(mixed.contains(256 + 3) || mixed.contains(256 + 0),
      s"trained merges absent from the lowercase word: $mixed")
  }

  test("byte BPE: ids decode back to the exact original bytes (lossless)") {
    val vocab = Bpe.trainByteBpeModel(sennrich, "text", numMerges = 4)
    val syms = vocab.symbols
    val words = Seq("newest", "Grüße", "日本語", "🌍x")
    words.foreach { w =>
      val ids = Seq((1L, w)).toDF("doc_id", "text")
        .select(Bpe.byteBpeEncodeIds(col("text"), vocab)).as[Seq[Int]].head()
      val bytes = ids.flatMap(i => syms(i).map(c => c.toInt.toByte)).toArray
      assert(new String(bytes, java.nio.charset.StandardCharsets.UTF_8) == w,
        s"'$w' did not round-trip through ids $ids")
    }
  }

  test("byte BPE: vocab round-trips through parquet; char vocab rejected") {
    val vocab = Bpe.trainByteBpeModel(sennrich, "text", numMerges = 4)
    val dir = java.nio.file.Files.createTempDirectory("bpe-bytes").toString
    Bpe.vocabTable(spark, vocab).write.mode("overwrite").parquet(s"$dir/v")
    Bpe.mergesTable(spark, vocab.merges).write.mode("overwrite")
      .parquet(s"$dir/m")
    val loaded = Bpe.readVocab(spark, s"$dir/v", s"$dir/m")
    assert(loaded.baseSymbols == Bpe.ByteAlphabet, "byte alphabet mangled")
    assert(loaded.merges == vocab.merges)
    val charVocab = Bpe.trainBpeModel(sennrich, "text", numMerges = 2)
    intercept[IllegalArgumentException] {
      Bpe.byteBpeEncodeIds(col("text"), charVocab)
    }
  }

  test("rank-candidate-set encode equals the full-scan reference token-for-token") {
    // Real fixture corpus at 60 merges — deep enough that a wrong skip
    // rule in the candidate-set walk (created pair with a passed rank,
    // re-added ranks, destroyed pairs) diverges somewhere in 500 docs.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vocab = Bpe.trainBpeModel(docs, "text", numMerges = 60, minPairCount = 1)
    val got = docs.select(col("doc_id"), col("text"),
        Bpe.bpeEncodeIds(col("text"), vocab).as("ids"))
      .as[(Long, String, Seq[Int])].collect()
    got.foreach { case (id, text, ids) =>
      val want = naiveEncodeIds(text, vocab)
      assert(ids == want, s"doc $id diverged: $ids vs $want")
    }
    // and the control-char corpus (framing + walk together)
    val nul = 0.toChar.toString; val soh = 1.toChar.toString
    val weird = Seq((1L, s"a${soh}b a${soh}b a${nul}c a${nul}c"),
      (2L, s"a${soh}b a${nul}c")).toDF("doc_id", "text")
    val wv = Bpe.trainBpeModel(weird, "text", numMerges = 6, minPairCount = 1)
    val wg = weird.select(col("doc_id"), col("text"),
        Bpe.bpeEncodeIds(col("text"), wv).as("ids"))
      .as[(Long, String, Seq[Int])].collect()
    wg.foreach { case (id, text, ids) =>
      assert(ids == naiveEncodeIds(text, wv), s"weird doc $id diverged")
    }
  }

  test("vocabTable exposes (id, symbol, base_len) with exact spans") {
    val vocab = Bpe.trainBpeModel(sennrich, "text", numMerges = 4)
    val vt = Bpe.vocabTable(spark, vocab)
    assert(vt.count() == vocab.vocabSize.toLong)
    // full tokenizer-artifact round trip: persist vocab + merges, reload,
    // and the reloaded model encodes identically
    val dir = java.nio.file.Files.createTempDirectory("graft-bpev").toString
    vt.write.parquet(s"$dir/vocab")
    Bpe.mergesTable(spark, vocab.merges).write.parquet(s"$dir/merges")
    val reloaded = Bpe.readVocab(spark, s"$dir/vocab", s"$dir/merges")
    assert(reloaded == vocab)
    val enc = Seq((1L, "lowest")).toDF("doc_id", "text")
    val a = enc.select(Bpe.bpeEncodeIds(col("text"), vocab)).as[Seq[Int]].head()
    val c = enc.select(Bpe.bpeEncodeIds(col("text"), reloaded)).as[Seq[Int]].head()
    assert(a == c, s"$a vs $c")
    val b = vocab.baseSymbols.length
    val spans = vt.filter(col("id") >= b).orderBy("id")
      .select("symbol", "base_len").as[(String, Long)].collect().toSeq
    // merges: es(2), est(3), est</w>(4), lo(2)
    assert(spans == Seq(("es", 2L), ("est", 3L), ("est</w>", 4L), ("lo", 2L)),
      spans)
  }

  test("bpeDecodeIds: decode(encode) rebuilds the normalized word join") {
    val vocab = Bpe.trainBpeModel(sennrich, "text", numMerges = 4)
    val docs = Seq(
      (1L, "newest  lower\tLOW"), // multi-space + tab + case fold
      (2L, "low"),
      (3L, "   "),                // whitespace-only -> empty decode
      (4L, "")).toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"),
        Bpe.bpeDecodeIds(Bpe.bpeEncodeIds(col("text"), vocab), vocab)
          .as("d"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "newest lower low"), (2L, "low"), (3L, ""),
      (4L, "")), got)
  }

  test("bpeDecodeIds: unknown ids (-1) decode to U+FFFD, one per char") {
    val vocab = Bpe.trainBpeModel(sennrich, "text", numMerges = 4)
    // 'z' never appears in the Sennrich corpus -> encodes as -1 twice;
    // the in-vocab tail of the word still decodes
    val got = Seq((1L, "zz low")).toDF("doc_id", "text")
      .select(Bpe.bpeDecodeIds(Bpe.bpeEncodeIds(col("text"), vocab), vocab))
      .as[String].head()
    assert(got == "�� low", s"got '$got'")
  }

  test("byteBpeDecodeIds: lossless roundtrip incl. emoji/CJK, no spaces") {
    val vocab = Bpe.trainByteBpeModel(sennrich, "text", numMerges = 4)
    val docs = Seq(
      (1L, "newest LOWER"),        // case PRESERVED, boundary dropped
      (2L, "Grüße 日本語 🌍ok"),   // multi-byte chars split across tokens
      (3L, "")).toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"),
        Bpe.byteBpeDecodeIds(Bpe.byteBpeEncodeIds(col("text"), vocab),
          vocab).as("d"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "newestLOWER"), (2L, "Grüße日本語🌍ok"),
      (3L, "")), got)
    // char-alphabet vocab rejected on the decode side too
    val charVocab = Bpe.trainBpeModel(sennrich, "text", numMerges = 2)
    intercept[IllegalArgumentException] {
      Bpe.byteBpeDecodeIds(col("ids"), charVocab)
    }
  }
}
