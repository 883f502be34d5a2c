package graft

import graft.operators.{Bpe, SpecialTokens}
import org.apache.spark.sql.functions._

/** BOS/EOS framing, truncation, padding, and strip-inverse — the id
  * arithmetic every trainer-input stage rides on.
  */
class SpecialTokensSpec extends SparkSpec {
  import spark.implicits._

  private val sp = SpecialTokens.Ids(100) // bos 100, eos 101, pad 102

  private def run(ids: Seq[Int], f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column): Seq[Int] =
    Seq(Tuple1(ids)).toDF("ids").select(f(col("ids")).as("r"))
      .as[Seq[Int]].collect().head

  test("id block sits above the vocab in fixed rank order") {
    assert(sp.bosId == 100 && sp.eosId == 101 && sp.padId == 102)
    assert(sp.extendedVocabSize == 103)
    intercept[IllegalArgumentException](SpecialTokens.Ids(0))
  }

  test("addSpecials: frame, truncate-then-close, tiny maxLen, null") {
    assert(run(Seq(5, 7, 9), SpecialTokens.addSpecials(_, sp, 10)) ==
      Seq(100, 5, 7, 9, 101))
    // truncation keeps the FIRST maxLen-2 ids and re-appends EOS
    assert(run(Seq(1, 2, 3, 4, 5), SpecialTokens.addSpecials(_, sp, 4)) ==
      Seq(100, 1, 2, 101))
    // maxLen = 2: nothing but the frame survives
    assert(run(Seq(1, 2, 3), SpecialTokens.addSpecials(_, sp, 2)) ==
      Seq(100, 101))
    assert(run(Seq.empty, SpecialTokens.addSpecials(_, sp, 8)) ==
      Seq(100, 101))
    intercept[IllegalArgumentException](
      SpecialTokens.addSpecials(col("x"), sp, 1))
    val n = Seq(Tuple1(null.asInstanceOf[Seq[Int]])).toDF("ids")
      .select(SpecialTokens.addSpecials(col("ids"), sp, 8).isNull)
      .as[Boolean].collect().head
    assert(n, "NULL ids must stay NULL")
  }

  test("padTo: tail fill to fixed shape; over-long fails loudly") {
    assert(run(Seq(100, 5, 101), SpecialTokens.padTo(_, sp, 6)) ==
      Seq(100, 5, 101, 102, 102, 102))
    assert(run(Seq(1, 2, 3), SpecialTokens.padTo(_, sp, 3)) == Seq(1, 2, 3))
    val e = intercept[Exception] {
      Seq(Tuple1(Seq(1, 2, 3, 4))).toDF("ids")
        .select(SpecialTokens.padTo(col("ids"), sp, 3)).collect()
    }
    assert(e.getMessage != null)
  }

  test("property: framing size law and strip-inverse on random ids") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val gen = for {
      v <- Gen.choose(1, 50)
      ids <- Gen.listOf(Gen.choose(0, 49)).map(_.take(40))
      maxLen <- Gen.choose(2, 20)
    } yield (v, ids.map(math.min(_, v - 1)), maxLen)
    val prop = Prop.forAll(gen) { case (v, ids, maxLen) =>
      val vsp = SpecialTokens.Ids(v)
      val out = run(ids, SpecialTokens.addSpecials(_, vsp, maxLen))
      val padded = run(ids, c => SpecialTokens.padTo(
        SpecialTokens.addSpecials(c, vsp, maxLen), vsp, maxLen))
      val stripped = run(ids, c => SpecialTokens.stripSpecials(
        SpecialTokens.addSpecials(c, vsp, maxLen), vsp))
      // size law: min(|ids|, maxLen−2) + 2; frame markers; pad shape;
      // strip returns exactly the kept prefix
      (out.length == math.min(ids.length, maxLen - 2) + 2) :| s"len $out" &&
        (out.head == vsp.bosId && out.last == vsp.eosId) :| s"frame $out" &&
        (padded.length == maxLen &&
          padded.drop(out.length).forall(_ == vsp.padId)) :| s"pad $padded" &&
        (stripped == ids.take(maxLen - 2)) :| s"strip $stripped"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("stripSpecials inverts framing; decode roundtrip survives") {
    assert(run(Seq(100, 5, 7, 101, 102, 102),
      SpecialTokens.stripSpecials(_, sp)) == Seq(5, 7))
    // end-to-end with a real vocab: decode(strip(pad(frame(encode)))) ==
    // decode(encode) — the framed form never corrupts the content ids
    val docs = Seq((1L, "low lower lowest low"), (2L, "the low bar"))
      .toDF("doc_id", "text")
    val vocab = Bpe.trainBpeModel(docs, "text", numMerges = 5,
      minPairCount = 1)
    val vsp = SpecialTokens.Ids(vocab.vocabSize)
    val got = docs.select(
        Bpe.bpeDecodeIds(SpecialTokens.stripSpecials(
          SpecialTokens.padTo(SpecialTokens.addSpecials(
            Bpe.bpeEncodeIds(col("text"), vocab), vsp, 64), vsp, 64),
          vsp), vocab).as("a"),
        Bpe.bpeDecodeIds(Bpe.bpeEncodeIds(col("text"), vocab), vocab)
          .as("b"))
      .as[(String, String)].collect()
    got.foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }
}
