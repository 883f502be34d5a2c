package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("seedCandidates: exact weighted substring counts and rank order") {
    val docs = corpus("ab ab b")
    val got = Unigram.seedCandidates(docs, "text", maxPieceLen = 4,
        seedSize = 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // words: ab(x2), b(x1); substrings: a=2, b=2+1=3, ab=2
    // rank by (cnt desc, piece asc): b(3)=1, a(2)=2, ab(2)=3
    assert(got == Set(("b", 3L, 1), ("a", 2L, 2), ("ab", 2L, 3)), got.toString)
  }

  test("seedCandidates: mint rank is bit-identical to the window form") {
    // r14 (VERDICT r13 §next-4): the seed rank moved from a global
    // row_number window to the two-pass partition-offset mint. Replay
    // the window semantics driver-side ((cnt desc, piece asc) total
    // order) on a corpus with many count ties and pin full equality.
    val docs = corpus("aa ab ba bb ab aa", "ba bb aa ab", "ca cb cc ca")
    val got = Unigram.seedCandidates(docs, "text", maxPieceLen = 2,
        seedSize = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._3).toSeq
    val wc = docs.as[(Long, String)].collect()
      .flatMap(_._2.split("\\s+")).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    val counts = wc.toSeq.flatMap { case (w, c) =>
      (1 to 2).flatMap(len => w.sliding(len).filter(_.length == len)
        .toSeq.map(_ -> c)) }
      .groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val expect = counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .zipWithIndex.map { case ((p, c), i) => (p, c, i + 1) }
    assert(got == expect, s"got $got\nexpect $expect")
  }

  test("EM learns multi-char pieces; segmentation conserves characters") {
    val docs = corpus(Seq.fill(20)("abab").mkString(" "),
      Seq.fill(10)("abab abra").mkString(" "))
    val vocab = Unigram.trainUnigramModel(docs, "text", targetVocab = 50)
    // the dominant word segments into fewer pieces than characters
    val n = docs.limit(1)
      .select(Unigram.unigramTokenCount(lit("abab"), vocab)).as[Long].head()
    assert(n < 4, s"abab took $n pieces — no multi-char piece learned")
    // ids decode back to the word's characters exactly
    val ids = docs.limit(1)
      .select(Unigram.unigramEncodeIds(lit("abab abra"), vocab))
      .as[Seq[Int]].head()
    val decoded = ids.map(i => vocab.pieces(i).piece).mkString
    assert(decoded == "abab" + "abra", decoded)
  }

  test("training is deterministic across runs") {
    val docs = corpus("the cat sat on the mat", "the bat and the cat",
      "a mat and a hat")
    val a = Unigram.trainUnigramModel(docs, "text", targetVocab = 40)
    val b = Unigram.trainUnigramModel(docs, "text", targetVocab = 40)
    assert(a.pieces == b.pieces)
  }

  test("pruning hits the target and never drops single characters") {
    val docs = corpus("the cat sat on the mat", "the bat and the cat hat",
      "a mat and a hat bat", "cats bats hats mats rats")
    val full = Unigram.trainUnigramModel(docs, "text", targetVocab = 1000)
    val alphabet = full.pieces.map(_.piece).filter(_.length == 1).toSet
    val target = alphabet.size + 3
    val small = Unigram.trainUnigramModel(docs, "text", targetVocab = target)
    assert(small.vocabSize <= target,
      s"${small.vocabSize} pieces > target $target")
    assert(alphabet.subsetOf(small.pieces.map(_.piece).toSet),
      "a single-character piece was pruned")
    // an impossible target (below the alphabet) fails loudly
    val e = intercept[IllegalArgumentException] {
      Unigram.trainUnigramModel(docs, "text", targetVocab = 2)
    }
    assert(e.getMessage.contains("alphabet"))
  }

  test("astral characters are single pieces; conservation holds in code points") {
    val emoji = "😀" // one code point, two UTF-16 units
    val docs = corpus(s"a${emoji}b a${emoji}b ${emoji}${emoji} ab")
    val vocab = Unigram.trainUnigramModel(docs, "text", targetVocab = 40)
    // the emoji is a vocab piece in its own right (the seed's code-point
    // alphabet), never a split surrogate pair
    assert(vocab.pieces.exists(_.piece == emoji))
    assert(!vocab.pieces.exists(p => p.piece.length == 1 &&
      Character.isSurrogate(p.piece.charAt(0))))
    val ids = docs.limit(1)
      .select(Unigram.unigramEncodeIds(lit(s"a${emoji}b"), vocab))
      .as[Seq[Int]].collect().head
    assert(ids.forall(_ >= 0), ids.toString)
    val decoded = ids.map(i => vocab.pieces(i).piece).mkString
    assert(decoded == s"a${emoji}b", decoded)
    // span in CODE POINTS = 3 (the oracle's len() unit)
    val span = ids.map { i =>
      val p = vocab.pieces(i).piece
      p.codePointCount(0, p.length)
    }.sum
    assert(span == 3, s"span $span != 3")
  }

  test("characters outside the vocabulary emit -1 and still span 1 char") {
    val docs = corpus("abc abc cab")
    val vocab = Unigram.trainUnigramModel(docs, "text", targetVocab = 30)
    val ids = docs.limit(1)
      .select(Unigram.unigramEncodeIds(lit("axb"), vocab)).as[Seq[Int]].head()
    assert(ids.contains(-1), ids.toString)
    val span = ids.map(i => if (i < 0) 1 else vocab.pieces(i).piece.length).sum
    assert(span == 3, s"span $span != 3")
  }

  test("vocab parquet round trip encodes identically") {
    val docs = corpus("the cat sat on the mat hat", "a cat and a hat sat")
    val vocab = Unigram.trainUnigramModel(docs, "text", targetVocab = 60)
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString
    Unigram.vocabTable(spark, vocab).write.mode("overwrite")
      .parquet(s"$dir/vocab")
    val re = Unigram.readVocab(spark, s"$dir/vocab")
    assert(re.pieces == vocab.pieces)
    val a = docs.select(Unigram.unigramEncodeIds(col("text"), vocab))
      .as[Seq[Int]].collect().toSeq
    val b = docs.select(Unigram.unigramEncodeIds(col("text"), re))
      .as[Seq[Int]].collect().toSeq
    assert(a == b)
  }

  test("unigramDecodeIds: decode(encode) == no-space word join; -1 -> U+FFFD") {
    val docs = corpus("the cat sat", "CAT  the\tmat", "  ", "")
    val vocab = Unigram.trainUnigramModel(docs, "text", targetVocab = 60)
    val got = docs.select(col("doc_id"), Unigram.unigramDecodeIds(
        Unigram.unigramEncodeIds(col("text"), vocab), vocab).as("d"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    // no boundary marker in the id stream: words concatenate directly
    assert(got == Seq((0L, "thecatsat"), (1L, "catthemat"), (2L, ""),
      (3L, "")), got)
    // 'z' is outside the training alphabet -> -1 -> replacement char
    val unk = corpus("zcat").select(Unigram.unigramDecodeIds(
        Unigram.unigramEncodeIds(col("text"), vocab), vocab))
      .as[String].head()
    assert(unk == "�cat", s"got '$unk'")
  }
}
