package graft.operators

import graft.expressions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA dimensionality reduction for embedding columns — the standard
  * pre-ANN / pre-clustering transform (reduce 64→16 dims before
  * brute-force cosine or IVF/PQ indexing; OPQ-style pipelines start the
  * same way).
  *
  * Training follows the sampled driver-side trainer contract shared with
  * k-means and PQ ([[Similarity.collectVectorSample]]): a bounded,
  * md5-uniform, id-sorted sample collects to the driver (deterministic
  * float summation order; `maxSampleRows` fails loudly), the d×d
  * covariance accumulates in two tight array loops, and a cyclic Jacobi
  * sweep diagonalizes it — d is the EMBEDDING dimension (64 here), so the
  * eigensolve is O(d³)-ish driver work on a d×d matrix, metadata-scale no
  * matter the corpus. Nothing corpus-sized ever reaches the driver.
  *
  * Application is one codegen'd [[graft.expressions.AffineMatVec]] pass
  * per row (model-as-literal, the LshBandSignatures convention):
  * projection is `C·(x − mean)`, reconstruction is `Cᵀ·y + mean`. At
  * 100 TB the projection runs at parquet-scan speed, map-only.
  *
  * Determinism: the sample is id-sorted before any float math; Jacobi is
  * sequential driver code; eigenvectors sort by eigenvalue descending
  * (stable — ties keep Jacobi's order) and are sign-normalized so the
  * entry of largest magnitude (first such index on ties) is positive —
  * without this, v and −v are both valid and the trained model would
  * flip arbitrarily between runs.
  */
object Pca {

  /** `components(j)` is the j-th principal axis (length = input dim),
    * orthonormal rows, `eigenvalues` descending (sample variance along
    * each axis, population divisor n).
    */
  case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                      components: Array[Array[Double]]) {
    require(components.length == eigenvalues.length,
      "PcaModel: one eigenvalue per component")
    require(components.forall(_.length == mean.length),
      "PcaModel: component dimension != mean dimension")
    def dim: Int = mean.length
    def k: Int = components.length
  }

  /** Train a k-component model. `sampleFraction` defaults to 1.0 (the
    * exact-API default; opt into sampling at call sites — the SemDedup
    * trainFraction ruling): with 1.0 every exactly-`dim` vector trains,
    * subject to the loud `maxSampleRows` bound.
    */
  def pcaTrain(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
               k: Int, sampleFraction: Double = 1.0,
               maxSampleRows: Int = 2000000): PcaModel = {
    val vs = Similarity.collectVectorSample(emb, idCol, vecCol, dim,
      sampleFraction, maxSampleRows, "pcaTrain")
      .sortBy(_._1).map(_._2)
    trainFromRows(vs, dim, k)
  }

  private[graft] def trainFromRows(vs: Array[Array[Double]], dim: Int,
                                       k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"pcaTrain: k=$k must be in [1, $dim]")
    require(vs.nonEmpty, "pcaTrain: no training vectors")
    val n = vs.length
    val mean = new Array[Double](dim)
    vs.foreach { v =>
      var i = 0; while (i < dim) { mean(i) += v(i); i += 1 }
    }
    locally { var i = 0; while (i < dim) { mean(i) /= n; i += 1 } }
    val cov = Array.ofDim[Double](dim, dim)
    val c = new Array[Double](dim)
    vs.foreach { v =>
      var i = 0; while (i < dim) { c(i) = v(i) - mean(i); i += 1 }
      var a = 0
      while (a < dim) {
        val ca = c(a)
        var b = a
        while (b < dim) { cov(a)(b) += ca * c(b); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < dim) {
      var b = a
      while (b < dim) {
        cov(a)(b) /= n
        if (b != a) cov(b)(a) = cov(a)(b)
        b += 1
      }
      a += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    // stable descending eigenvalue order; ties keep Jacobi's column order
    val order = (0 until dim).sortBy(i => -vals(i))
    val topIdx = order.take(k)
    val components = topIdx.map { ci =>
      val comp = Array.tabulate(dim)(i => vecs(i)(ci))
      signNormalize(comp)
    }.toArray
    val eigenvalues = topIdx.map(vals(_)).toArray
    PcaModel(mean, eigenvalues, components)
  }

  /** Flip so the entry of largest magnitude (first such index on exact
    * ties) is positive — v and −v are equally valid eigenvectors, so
    * without a convention the model is run-order-dependent.
    */
  private def signNormalize(v: Array[Double]): Array[Double] = {
    var best = 0
    var i = 1
    while (i < v.length) {
      if (math.abs(v(i)) > math.abs(v(best))) best = i
      i += 1
    }
    if (v(best) < 0) v.map(-_) else v
  }

  /** Cyclic Jacobi diagonalization of a symmetric matrix (Numerical
    * Recipes rotation form). Returns (diagonal values, V) with
    * eigenvector COLUMNS: `a · V[:,j] = vals(j) · V[:,j]`. Converges in a
    * handful of sweeps for the d≤a-few-hundred covariance matrices this
    * trains on; fails loudly rather than returning a partial
    * diagonalization if it somehow does not.
    */
  private[graft] def jacobiEigen(aIn: Array[Array[Double]],
                                     maxSweeps: Int = 64)
      : (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var frob = 0.0
    for (i <- 0 until d; j <- 0 until d) frob += a(i)(j) * a(i)(j)
    val stop = math.max(frob, 1e-300) * 1e-24
    var sweep = 0
    while (sweep < maxSweeps && offNorm > stop) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (math.abs(theta) > 1e150) 1.0 / (2.0 * theta)
              else math.signum(theta) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              }
            val cc = 1.0 / math.sqrt(t * t + 1.0)
            val ss = t * cc
            val tau = ss / (1.0 + cc)
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = app - t * apq
            a(q)(q) = aqq + t * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var i = 0
            while (i < d) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = aip - ss * (aiq + tau * aip); a(p)(i) = a(i)(p)
                a(i)(q) = aiq + ss * (aip - tau * aiq); a(q)(i) = a(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = vip - ss * (viq + tau * vip)
              v(i)(q) = viq + ss * (vip - tau * viq)
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    require(offNorm <= stop,
      s"jacobiEigen: did not converge in $maxSweeps sweeps " +
        s"(off-diagonal ${offNorm}, stop $stop)")
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Project to the model's k-dim space: `C·(x − mean)`, one codegen'd
    * native pass.
    */
  def projectCol(vec: Column, model: PcaModel): Column =
    VectorExpressions.affineMatVec(vec, model.components, model.mean,
      new Array[Double](model.k))

  /** Back to the input space: `Cᵀ·y + mean`. Exact inverse of
    * [[projectCol]] iff the model is full-rank (k = dim); otherwise the
    * least-squares reconstruction onto the top-k subspace.
    */
  def reconstructCol(proj: Column, model: PcaModel): Column = {
    val ct = Array.tabulate(model.dim, model.k)((i, j) => model.components(j)(i))
    VectorExpressions.affineMatVec(proj, ct, new Array[Double](model.k),
      model.mean)
  }

  /** The reduced frame: (idCol, outCol = projected array<double>). */
  def pcaReduce(df: DataFrame, idCol: String, vecCol: String,
                model: PcaModel, outCol: String = "pvec"): DataFrame =
    df.select(col(idCol), projectCol(col(vecCol), model).as(outCol))

  // --- model persistence (the trained-model artifact convention:
  // model-as-table, loaded with one bounded collect) --------------------

  /** Model as a table: component rows (cidx ≥ 0, eigenvalue, weights)
    * plus ONE mean row at cidx = −1 (eigenvalue 0). Round-trips through
    * [[readModel]] exactly (doubles stored as doubles).
    */
  def modelTable(spark: SparkSession, model: PcaModel): DataFrame = {
    import spark.implicits._
    val rows = (-1, 0.0, model.mean.toSeq) +:
      model.components.indices.map(j =>
        (j, model.eigenvalues(j), model.components(j).toSeq))
    rows.toDF("cidx", "eigenvalue", "weights")
  }

  def writeModel(spark: SparkSession, model: PcaModel, path: String): Unit =
    modelTable(spark, model).coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Bounded model load: a PCA model is ≤ dim+1 rows by construction, so
    * the collect is LIMIT-guarded and fails loudly on a malformed table
    * (the LangIdNgram bounded-collect convention).
    */
  def readModel(spark: SparkSession, path: String,
                maxRows: Int = 4097): PcaModel = {
    val rows = spark.read.parquet(path)
      .select(col("cidx").cast("int"), col("eigenvalue").cast("double"),
        col("weights").cast("array<double>"))
      .limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"readModel: $path has > $maxRows rows — not a PCA model table")
    val (meanRows, compRows) = rows.partition(_.getInt(0) < 0)
    require(meanRows.length == 1,
      s"readModel: expected exactly one mean row (cidx = -1), " +
        s"got ${meanRows.length}")
    val mean = meanRows(0).getSeq[Double](2).toArray
    val comps = compRows.sortBy(_.getInt(0))
    require(comps.map(_.getInt(0)).toSeq == comps.indices.toSeq,
      "readModel: component indices must be dense 0..k-1")
    PcaModel(mean,
      comps.map(_.getDouble(1)),
      comps.map(_.getSeq[Double](2).toArray))
  }
}
