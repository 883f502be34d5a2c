package graft

import org.apache.spark.sql.functions._

/** Measured exact-substring dedup scenario bench (r11): md5 window
  * fingerprints vs the Rabin–Karp rolling twin across window widths —
  * the claim under test is that the md5 form's seed stage scales
  * O(minTokens) bytes hashed per position while the rolling form is
  * flat, so the gap must WIDEN with k (the published ExactSubstr k is
  * 50). The corpus is the documents fixture exploded `dup`× with a
  * 60-token boilerplate sentence appended to every copy (duplicate
  * substrings at arbitrary alignment exist at every tested k, so both
  * operators do real removal work, and outputs are asserted equal). One
  * JSON line: per-k seconds for each form over `runs` runs (median).
  */
object SubstringBench {
  private def time[T](f: => T): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val dup = sys.env.getOrElse("SPARK_GRAFT_SUB_DUP", "4").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val boiler = (1 to 60).map(i => s"boiler$i").mkString(" ")
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("__d", explode(array((0 until dup).map(lit): _*)))
      .select(col("doc_id") * dup + col("__d") as "doc_id",
        concat_ws(" ", col("text"), lit(boiler)).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = corpus.count()

    def removedMd5(k: Int): Long = graft.operators.Dedup
      .dedupSubstrings(corpus, "doc_id", "text", k)
      .agg(sum("n_tokens_removed")).head().getLong(0)
    def removedFast(k: Int): Long = graft.operators.Dedup
      .dedupSubstringsFast(corpus, "doc_id", "text", k)
      .agg(sum("n_tokens_removed")).head().getLong(0)

    val ks = Seq(4, 16, 50)
    val cells = ks.map { k =>
      // warm both (codegen compile off the clock) + output equality
      val a = removedMd5(k)
      val b = removedFast(k)
      assert(a == b, s"k=$k: md5 removed $a, rolling removed $b")
      val tm = median((1 to runs).map(_ => time(removedMd5(k))))
      val tf = median((1 to runs).map(_ => time(removedFast(k))))
      def ms(v: Double) =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      s""""k$k":{"md5_sec":${ms(tm)},"rolling_sec":${ms(tf)},""" +
        s""""removed_tokens":$a}"""
    }
    println(s"""{"metric":"substring_bench","docs":$nDocs,"dup":$dup,""" +
      cells.mkString(",") + "}")
    spark.stop()
  }
}
