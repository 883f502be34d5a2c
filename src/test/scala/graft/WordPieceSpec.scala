package graft

import graft.operators.WordPiece
import graft.operators.WordPiece.{WpPiece, WpVocab}
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def vocabOf(entries: (String, Boolean)*): WpVocab =
    WpVocab(entries.zipWithIndex
      .map { case ((p, c), i) => WpPiece(i, p, c) }.toVector)

  test("greedy longest-match-first: the canonical BERT segmentation") {
    // vocab {un, ##aff, ##able, + alphabet-ish fillers}: "unaffable" ->
    // un ##aff ##able — the example from the BERT repo's documentation
    val v = vocabOf("un" -> false, "aff" -> true, "able" -> true,
      "u" -> false, "n" -> true, "a" -> true, "f" -> true,
      "b" -> true, "l" -> true, "e" -> true, "a" -> false)
    val out = Seq((1L, "unaffable")).toDF("id", "text")
      .select(WordPiece.wordPieceEncodeIds(col("text"), v).as("ids"),
        WordPiece.wordPieceTokenCount(col("text"), v).as("n"))
      .as[(Seq[Int], Long)].head()
    assert(out._1 == Seq(0, 1, 2), out.toString) // un ##aff ##able
    assert(out._2 == 3L)
    // longest-first beats a shorter in-vocab prefix: "una..." starts
    // with in-vocab "u" and "un" — "un" (longer) must win
  }

  test("whole-word UNK: any unmatchable position voids the word") {
    val v = vocabOf("ab" -> false, "a" -> false, "b" -> true)
    // "abz": segments a/ab then hits 'z' with no continuation -> ONE -1,
    // not [ab, -1]
    val out = Seq((1L, "ab abz zab")).toDF("id", "text")
      .select(WordPiece.wordPieceEncodeIds(col("text"), v).as("ids"))
      .as[Seq[Int]].head()
    assert(out == Seq(0, -1, -1), out.toString) // zab: no initial 'z'
  }

  test("trainer: likelihood score picks the rare-symbol pair over the frequent one") {
    // (x,##y) appears 4x with symbol counts 4·4 (score 1/4); (q,##z)
    // appears 3x with counts 3·3 (score 1/3) — a frequency-ranked (BPE)
    // trainer merges the 4x pair; WordPiece's likelihood rule must pick
    // (q,##z).
    val docs = Seq.fill(4)("xy yx") ++ Seq.fill(3)("qz")
    val v = WordPiece.trainWordPiece(
      docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
      "text", numMerges = 1)
    val merged = v.pieces.filter(_.piece.length > 1)
    assert(merged.map(_.display) == Vector("qz"), v.pieces.toString)
  }

  test("trainer: alphabet covers both forms; training corpus never UNKs") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "pack my box quick"),
      (3L, "the the fox fox")).toDF("id", "text")
    val v = WordPiece.trainWordPiece(docs, "text", numMerges = 10)
    val unk = docs.select(sum(size(filter(
        WordPiece.wordPieceEncodeIds(col("text"), v), i => i < 0)))
      .as("u")).as[Long].head()
    assert(unk == 0L)
    // conservation: spans rebuild the corpus word-char total exactly
    val spanLit = typedlit(v.spans)
    val got = docs.select(
        aggregate(transform(WordPiece.wordPieceEncodeIds(col("text"), v),
          i => element_at(spanLit, i + 1)), lit(0L), (a, x) => a + x).as("s"),
        aggregate(transform(filter(split(lower(col("text")), "\\s+"),
          w => w =!= ""), w => length(w).cast("long")),
          lit(0L), (a, x) => a + x).as("t"))
      .agg(sum("s").as("s"), sum("t").as("t")).as[(Long, Long)].head()
    assert(got._1 == got._2, got.toString)
  }

  test("vocab round-trips parquet; loaded model encodes identically") {
    val docs = Seq((1L, "round trip tokens here"), (2L, "more round trip"))
      .toDF("id", "text")
    val v = WordPiece.trainWordPiece(docs, "text", numMerges = 6)
    val path = java.nio.file.Files.createTempDirectory("wpv").toString + "/v"
    WordPiece.vocabTable(spark, v).write.parquet(path)
    val v2 = WordPiece.readVocab(spark, path)
    assert(v2 == v)
    val a = docs.select(array_join(WordPiece.wordPieceEncodeIds(col("text"), v)
      .cast("array<string>"), " ")).as[String].collect().toSeq
    val b = docs.select(array_join(WordPiece.wordPieceEncodeIds(col("text"), v2)
      .cast("array<string>"), " ")).as[String].collect().toSeq
    assert(a == b)
  }

  test("property: native encode equals a plain-Scala greedy reference (ScalaCheck)") {
    // independent reference: greedy longest-match over scala Maps, no
    // UTF8String, no spec serialization, no codegen — the native static
    // call must land on the identical id sequence for random vocabs and
    // random texts over a small alphabet.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val alpha = Seq("a", "b", "c")
    val pieceGen = for {
      n <- Gen.chooseNum(1, 3)
      cs <- Gen.listOfN(n, Gen.oneOf(alpha))
      cont <- Gen.oneOf(true, false)
    } yield (cs.mkString, cont)
    val vocabGen = Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, pieceGen))
    val wordGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alpha)).map(_.mkString))
    val textGen = Gen.chooseNum(0, 5).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    def refSegment(word: String, v: WpVocab): Seq[Int] = {
      val init = v.pieces.filter(!_.isCont)
        .groupBy(_.piece).view.mapValues(_.head.id).toMap
      val cont = v.pieces.filter(_.isCont)
        .groupBy(_.piece).view.mapValues(_.head.id).toMap
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      var start = 0
      while (start < word.length) {
        val m = if (start == 0) init else cont
        val hit = (word.length to (start + 1) by -1)
          .find(e => m.contains(word.substring(start, e)))
        hit match {
          case None => return Seq(-1)
          case Some(e) => out += m(word.substring(start, e)); start = e
        }
      }
      out.toSeq
    }
    val prop = Prop.forAll(vocabGen, Gen.listOfN(3, textGen)) { (ps, texts) =>
      val v = WpVocab(ps.zipWithIndex
        .map { case ((p, c), i) => WpPiece(i, p, c) }.toVector)
      val want = texts.map(_.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(w => refSegment(w, v)))
      val got = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .select(col("id"), WordPiece.wordPieceEncodeIds(col("text"), v).as("ids"))
        .orderBy("id").as[(Long, Seq[Int])].collect().map(_._2).toSeq
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("trainer determinism and guards") {
    val docs = Seq((1L, "aa ab aa ab ba")).toDF("id", "text")
    val a = WordPiece.trainWordPiece(docs, "text", numMerges = 3)
    val b = WordPiece.trainWordPiece(docs, "text", numMerges = 3)
    assert(a == b)
    intercept[IllegalArgumentException] {
      WordPiece.trainWordPiece(docs, "text", numMerges = -1)
    }
    intercept[IllegalArgumentException] {
      WordPiece.trainWordPiece(docs, "text", numMerges = 1,
        maxWordTableRows = 2)
    }
  }

  test("wordPieceDecodeIds: continuation flags rebuild word boundaries") {
    val v = vocabOf("un" -> false, "aff" -> true, "able" -> true,
      "a" -> false, "b" -> true)
    // "unaffable ab" -> [un ##aff ##able] [a ##b]; decode must restore
    // the space between the two words from the is_cont flags alone
    val got = Seq((1L, "Unaffable  AB")).toDF("id", "text")
      .select(WordPiece.wordPieceDecodeIds(
        WordPiece.wordPieceEncodeIds(col("text"), v), v))
      .as[String].head()
    assert(got == "unaffable ab", s"got '$got'")
  }

  test("wordPieceDecodeIds: UNK words decode to the literal [UNK]") {
    val v = vocabOf("ab" -> false, "a" -> false, "b" -> true)
    val got = Seq((1L, "ab zzz ab")).toDF("id", "text")
      .select(WordPiece.wordPieceDecodeIds(
        WordPiece.wordPieceEncodeIds(col("text"), v), v))
      .as[String].head()
    assert(got == "ab [UNK] ab", s"got '$got'")
    // empty / whitespace-only decode to the empty string
    val empty = Seq((1L, "  ")).toDF("id", "text")
      .select(WordPiece.wordPieceDecodeIds(
        WordPiece.wordPieceEncodeIds(col("text"), v), v))
      .as[String].head()
    assert(empty == "", s"got '$empty'")
  }

  test("decode(encode) == normalized join on a trained corpus (no UNKs)") {
    val docs = Seq((1L, "the Quick fox"), (2L, "fox  THE\tquick"),
      (3L, "quick")).toDF("id", "text")
    val v = WordPiece.trainWordPiece(docs, "text", numMerges = 5)
    val got = docs.select(col("id"), WordPiece.wordPieceDecodeIds(
        WordPiece.wordPieceEncodeIds(col("text"), v), v).as("d"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "the quick fox"), (2L, "fox the quick"),
      (3L, "quick")), got)
  }
}
