package graft

import graft.operators.Pca
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA: eigensolver correctness, projection-native parity with a
  * driver-side reference, full-rank reconstruction, model round-trip,
  * and training determinism.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random vectors (no Random: reproducible fixture)
  private def vec(seed: Long, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      val x = (seed * 6364136223846793005L + i * 1442695040888963407L)
      (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }

  private def corpus(n: Int, dim: Int): DataFrame =
    (0 until n).map(i => (i.toLong, vec(i + 7L, dim).toSeq))
      .toDF("vec_id", "embedding")

  test("trainFromRows: dominant axis of an elongated cloud; eigenvalues descend") {
    // points on a noisy line along (1, 1)/sqrt(2) in 2D
    val rows = (0 until 200).map { i =>
      val t = (i - 100) / 10.0
      val noise = vec(i + 3L, 1)(0) * 0.01
      Array(t + noise, t - noise)
    }.toArray
    val m = Pca.trainFromRows(rows, dim = 2, k = 2)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    val c0 = m.components(0)
    val expected = math.sqrt(0.5)
    assert(math.abs(math.abs(c0(0)) - expected) < 0.01, c0.toSeq)
    assert(math.abs(c0(0) - c0(1)) < 0.01, c0.toSeq) // same sign, ~equal
    // sign convention: largest-|entry| positive
    assert(c0.maxBy(math.abs) > 0)
  }

  test("components are orthonormal; train is deterministic") {
    val rows = (0 until 100).map(i => vec(i + 1L, 8)).toArray
    val m = Pca.trainFromRows(rows, dim = 8, k = 8)
    for (a <- 0 until 8; b <- 0 until 8) {
      val dot = (0 until 8).map(i => m.components(a)(i) * m.components(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"C[$a]·C[$b] = $dot")
    }
    val m2 = Pca.trainFromRows(rows, dim = 8, k = 8)
    assert(m.mean.toSeq == m2.mean.toSeq &&
      m.eigenvalues.toSeq == m2.eigenvalues.toSeq &&
      m.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
    // eigenvalue sum == covariance trace == total variance (Jacobi
    // preserves trace); recompute total variance directly
    val mean = Array.tabulate(8)(i => rows.map(_(i)).sum / rows.length)
    val totVar = (0 until 8).map(i =>
      rows.map(v => math.pow(v(i) - mean(i), 2)).sum / rows.length).sum
    assert(math.abs(m.eigenvalues.sum - totVar) < 1e-9)
  }

  test("full-rank project→reconstruct is the identity (distributed, native)") {
    val df = corpus(50, 8)
    val m = Pca.pcaTrain(df, "vec_id", "embedding", dim = 8, k = 8)
    val err = df.select(
      Pca.reconstructCol(
        Pca.projectCol(col("embedding"), m), m).as("r"),
      col("embedding"))
      .select(expr(
        "aggregate(zip_with(embedding, r, (a, b) -> abs(a - b)), 0d, (s, x) -> greatest(s, x))").as("e"))
      .agg(max("e")).as[Double].head()
    assert(err < 1e-10, s"max reconstruction error $err")
  }

  test("projectCol native == driver-side reference (float input arrays)") {
    val dfF = (0 until 30).map(i =>
      (i.toLong, vec(i + 11L, 6).map(_.toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val m = Pca.pcaTrain(dfF, "vec_id", "embedding", dim = 6, k = 3)
    val got = dfF.select(col("vec_id"),
        Pca.projectCol(col("embedding"), m).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    (0 until 30).foreach { i =>
      val x = vec(i + 11L, 6).map(_.toFloat).map(_.toDouble)
      val want = m.components.map(cr =>
        (0 until 6).map(j => (x(j) - m.mean(j)) * cr(j)).sum)
      val have = got(i.toLong)
      (0 until 3).foreach(j =>
        assert(math.abs(have(j) - want(j)) < 1e-12, s"row $i comp $j"))
    }
  }

  test("reduced-space distances approximate full-space (variance capture)") {
    val df = corpus(80, 16)
    val full = Pca.pcaTrain(df, "vec_id", "embedding", dim = 16, k = 16)
    val half = Pca.PcaModel(full.mean, full.eigenvalues.take(8),
      full.components.take(8))
    // residual energy = sum of dropped eigenvalues; reconstruction MSE
    // over the corpus must equal it (the defining property of PCA)
    val mse = df.select(
      Pca.reconstructCol(Pca.projectCol(col("embedding"), half), half).as("r"),
      col("embedding"))
      .select(expr(
        "aggregate(zip_with(embedding, r, (a, b) -> (a - b) * (a - b)), 0d, (s, x) -> s + x)").as("e"))
      .agg(avg("e")).as[Double].head()
    val dropped = full.eigenvalues.drop(8).sum
    assert(math.abs(mse - dropped) < 1e-9, s"mse $mse vs dropped $dropped")
  }

  test("model round-trips through the parquet table exactly") {
    val df = corpus(40, 8)
    val m = Pca.pcaTrain(df, "vec_id", "embedding", dim = 8, k = 4)
    val path = java.nio.file.Files.createTempDirectory("graft-pca")
      .resolve("model").toString
    Pca.writeModel(spark, m, path)
    val r = Pca.readModel(spark, path)
    assert(r.mean.toSeq == m.mean.toSeq)
    assert(r.eigenvalues.toSeq == m.eigenvalues.toSeq)
    assert(r.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq)
  }

  test("ragged vectors fail loudly at projection") {
    val m = Pca.pcaTrain(corpus(20, 8), "vec_id", "embedding", dim = 8, k = 2)
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      bad.select(Pca.projectCol(col("embedding"), m)).collect()
    }
    assert(e.getMessage != null)
  }
}
