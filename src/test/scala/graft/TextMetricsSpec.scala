package graft

import graft.expressions.TextHashExpressions
import graft.operators.TextMetrics
import org.apache.spark.sql.functions._

/** Clipped n-gram overlap kernel, ROUGE-N fixed-point metrics, and
  * corpus BLEU — all hand-computed.
  */
class TextMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("ngramOverlaps: hand-counted clipped overlaps, one row per n") {
    val got = Seq(("a b a b c", "a b a d")).toDF("cand", "ref")
      .select(TextHashExpressions.ngramOverlaps(col("cand"), col("ref"),
        1, 2))
      .as[Seq[Long]].collect().head
    // n=1: clip(a:2,2)+clip(b:2,1)=3 of cand 5 vs ref 4
    // n=2: "a b" clips to 1, "b a" to 1 -> 2 of cand 4 vs ref 3
    assert(got == Seq(3L, 5L, 4L, 2L, 4L, 3L), got)
  }

  test("ngramOverlaps: minN offsets the layout (ROUGE-N computes only n)") {
    val got = Seq(("a b a b c", "a b a d")).toDF("cand", "ref")
      .select(TextHashExpressions.ngramOverlaps(col("cand"), col("ref"),
        2, 2))
      .as[Seq[Long]].collect().head
    assert(got == Seq(2L, 4L, 3L), got)
  }

  test("ngramOverlaps: case-insensitive, whitespace runs, empty sides") {
    val got = Seq(("A  B", "a b"), ("", "x"), ("x", ""))
      .toDF("cand", "ref")
      .select(TextHashExpressions.ngramOverlaps(col("cand"), col("ref"),
        1, 1))
      .as[Seq[Long]].collect().toSeq
    assert(got == Seq(Seq(2L, 2L, 2L), Seq(0L, 0L, 1L), Seq(0L, 1L, 0L)))
  }

  test("ngramOverlaps: seeded-random texts agree with a naive reference") {
    def naive(cand: String, ref: String, n: Int): (Long, Long, Long) = {
      def grams(s: String) = {
        val t = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" "))
      }
      val (cg, rg) = (grams(cand), grams(ref))
      val rc = rg.groupBy(identity).view.mapValues(_.size).toMap
      val m = cg.groupBy(identity).toSeq.map { case (g, occ) =>
        math.min(occ.size, rc.getOrElse(g, 0))
      }.sum
      (m.toLong, cg.length.toLong, rg.length.toLong)
    }
    val rnd = new scala.util.Random(1212L)
    val vocab = Seq("a", "b", "cc", "Dd", "e")
    def text() = Seq.fill(rnd.nextInt(12))(
      vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val cases = Seq.tabulate(200)(i => (i.toLong, text(), text()))
    val got = cases.toDF("i", "c", "r")
      .select(col("i"), TextHashExpressions.ngramOverlaps(
        col("c"), col("r"), 1, 3).as("o"))
      .orderBy("i").as[(Long, Seq[Long])].collect().toSeq
    val want = cases.map { case (i, c, r) =>
      (i, (1 to 3).flatMap { n =>
        val (m, nc, nr) = naive(c, r, n); Seq(m, nc, nr)
      })
    }
    assert(got.map(t => (t._1, t._2.toSeq)) == want,
      got.zip(want).filter(t => t._1._2 != t._2._2).take(2))
  }

  test("rougeN: hand-computed P/R/F1 and the NULL denominators") {
    val pairs = Seq(
      (1L, "a b a b c", "a b a d"),
      (2L, "", "a b")).toDF("id", "cand", "ref")
    val got = TextMetrics.rougeN(pairs, Seq("id"), "cand", "ref", 2)
      .orderBy("id").collect()
    val r1 = got(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((2L, 4L, 3L)))
    assert(r1.getLong(4) == 500000000000L)                  // 2/4
    assert(r1.getLong(5) == math.round(1e12 * (2.0 / 3.0))) // 2/3
    assert(r1.getLong(6) == math.round(1e12 * (4.0 / 7.0))) // 2m/(c+r)
    val r2 = got(1)
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) == ((0L, 0L, 1L)))
    assert(r2.isNullAt(4))            // 0 candidate grams: P undefined
    assert(r2.getLong(5) == 0L)       // 0/1 recall is a real zero
    assert(r2.getLong(6) == 0L)       // f1 = 0/(0+1)
    intercept[IllegalArgumentException] {
      TextMetrics.rougeN(pairs, Seq("id"), "cand", "ref", 0)
    }
  }

  test("bleuCorpus: hand-computed two-pair corpus at maxN=2") {
    val pairs = Seq(
      (1L, "a b c", "a b d"),
      (2L, "x y", "x y")).toDF("id", "cand", "ref")
    val got = TextMetrics.bleuCorpus(pairs, "cand", "ref", maxN = 2)
      .collect().head
    assert(got.getLong(0) == 2L)                       // n_pairs
    assert(got.getLong(1) == 5L && got.getLong(2) == 5L)
    assert(got.getLong(3) == 800000000000L)            // p1 = 4/5
    assert(got.getLong(4) == math.round(1e12 * (2.0 / 3.0)))
    // bp = 1 (cand_len >= ref_len); bleu = sqrt(4/5 * 2/3) = 0.730297
    assert(got.getDouble(5) == 0.730297, got.getDouble(5))
  }

  test("bleuCorpus: unsmoothed zero and the brevity penalty side") {
    // cand shorter than ref and no bigram match -> p2 = 0 -> bleu 0
    val zero = TextMetrics.bleuCorpus(
      Seq(("a c", "a b")).toDF("cand", "ref"), "cand", "ref", maxN = 2)
      .collect().head
    assert(zero.getDouble(5) == 0.0)
    // perfect 1-gram overlap, cand half the ref: bp = e^(1-2) = e^-1
    val bp = TextMetrics.bleuCorpus(
      Seq(("a b", "a b a b")).toDF("cand", "ref"), "cand", "ref", maxN = 1)
      .collect().head
    assert(bp.getDouble(4) ==
      BigDecimal(math.exp(-1.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, bp.getDouble(4))
  }
}
