package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force top-k against a query vector — a broadcast of one
  * row + a map-side array fold (`zip_with` / `aggregate`, codegen'd, no UDF)
  * + a single top-k reduce. Scale path: LSH bucketing (random-hyperplane
  * signs) so candidate generation is a keyed self-join instead of a cross
  * join — the same banding trick as MinHash dedup.
  *
  * Integer-quantized scores (`round(x*1000)` per dimension) are offered for
  * oracle-exact cross-engine comparison; float/double cosine for production.
  */
object Similarity {

  /** Element-wise dot product of two array columns (fold in index order —
    * deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Quantized integer dot product: exact, order-independent, reproducible
    * across engines. */
  def dotQuantized(a: Column, b: Column, scale: Int = 1000): Column = {
    def q(c: Column): Column = round(c.cast("double") * scale).cast("long")
    aggregate(zip_with(a, b, (x, y) => q(x) * q(y)), lit(0L), (acc, v) => acc + v)
  }

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force top-k nearest rows to the vector of `queryId`, scored by
    * quantized dot product (deterministic tiebreak on id). The query row is
    * a 1-row DataFrame — Catalyst broadcasts it, so this is a map + TakeOrdered,
    * no shuffle of the corpus.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec")).limit(1)
    emb.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), dotQuantized(col(vecCol), col("__qvec")).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Random-hyperplane LSH bucket id: `nBits` sign bits, each from the dot
    * product against a deterministic pseudo-random hyperplane derived from
    * (bit, dimension) via a hash — no stored model, reproducible on any
    * cluster.
    */
  def lshBucket(vec: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { b =>
      // hyperplane component for (b, i): hash -> [-0.5, 0.5)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            ((pmod(xxhash64(i, lit(b)), lit(1000000L)).cast("double") / 1000000.0) - 0.5)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN via LSH buckets: candidates share a bucket; exact cosine re-ranks
    * within bucket. One shuffle keyed by bucket — the 100 TB-safe shape
    * (bucket sizes bounded by nBits choice; skew handled by AQE).
    */
  def annLsh(emb: DataFrame, idCol: String, vecCol: String,
             nBits: Int = 8, minCosine: Double = 0.9): DataFrame = {
    val b = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), nBits).as("bucket"))
    val l = b.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = b.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** Embedding-cosine near-duplicate pairs over a bounded id range (oracle-
    * checkable verify stage; LSH produces the candidates at scale). Scores
    * from quantized ints so both engines compute identical doubles.
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         maxId: Long, minCos: Double): DataFrame = {
    val base = emb.filter(col(idCol) < maxId)
      .select(col(idCol).as("id"), col(vecCol).as("v"))
    val l = base.select(col("id").as("id_a"), col("v").as("v_a"))
    val r = base.select(col("id").as("id_b"), col("v").as("v_b"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dotQuantized(col("v_a"), col("v_b")).cast("double") /
          (sqrt(dotQuantized(col("v_a"), col("v_a")).cast("double")) *
           sqrt(dotQuantized(col("v_b"), col("v_b")).cast("double")))).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
