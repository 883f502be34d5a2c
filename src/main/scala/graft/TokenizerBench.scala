package graft

import org.apache.spark.sql.functions._

/** Measured tokenizer scenario bench (late r10): train both house
  * tokenizers on the documents fixture and measure ENCODE throughput —
  * the number a pipeline team actually sizes clusters with (training is
  * a one-shot vocabulary build; encoding touches every byte of the
  * corpus on every run).
  *
  * The corpus is the documents table exploded `dup`× with a per-copy id
  * (encode work scales with corpus bytes; the model stays fixed), both
  * encodes run over the identical pinned frame, and each variant counts
  * total emitted tokens (the action consumes every id, so nothing
  * short-circuits). Prints one JSON line: median seconds + tokens/sec
  * per tokenizer over `runs` runs, plus the trained vocab sizes.
  */
object TokenizerBench {
  private def time[T](f: => T): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val dup = sys.env.getOrElse("SPARK_GRAFT_TOK_DUP", "4").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs
      .withColumn("__d", explode(array((0 until dup).map(lit): _*)))
      .select(col("doc_id") * dup + col("__d") as "id", col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = corpus.count()

    val bpe = graft.operators.Bpe.trainBpeModel(docs, "text", numMerges = 64)
    val uni = graft.operators.Unigram.trainUnigramModel(docs, "text",
      targetVocab = 300)
    val wp = graft.operators.WordPiece.trainWordPiece(docs, "text",
      numMerges = 64)

    def encodeBpe(): Long = corpus.select(
        sum(size(graft.operators.Bpe.bpeEncodeIds(col("text"), bpe)))
          .cast("long"))
      .head().getLong(0)
    def encodeUni(): Long = corpus.select(
        sum(size(graft.operators.Unigram.unigramEncodeIds(col("text"), uni)))
          .cast("long"))
      .head().getLong(0)
    def encodeWp(): Long = corpus.select(
        sum(size(graft.operators.WordPiece.wordPieceEncodeIds(col("text"), wp)))
          .cast("long"))
      .head().getLong(0)
    def encodeWs(): Long = corpus.select(
        sum(graft.operators.TextAnalysis.tokenCountWs(col("text")))
          .cast("long"))
      .head().getLong(0)

    // one warm pass each (codegen compile + cache fill off the clock)
    val tokBpe = encodeBpe(); val tokUni = encodeUni()
    val tokWp = encodeWp(); val tokWs = encodeWs()
    val results = Seq(
      ("bpe_encode", tokBpe, () => encodeBpe()),
      ("unigram_encode", tokUni, () => encodeUni()),
      ("wordpiece_encode", tokWp, () => encodeWp()),
      ("whitespace_count", tokWs, () => encodeWs())
    ).map { case (name, toks, f) =>
      val med = median((1 to runs).map(_ => time(f())))
      (name, toks, med)
    }
    def ms(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val cells = results.map { case (n, toks, med) =>
      val tps = if (med > 0) (toks / med).toLong else -1L
      s""""$n":{"sec":${ms(med)},"tokens":$toks,"tokens_per_sec":$tps}"""
    }
    println(s"""{"metric":"tokenizer_bench","docs":$nDocs,"dup":$dup,""" +
      s""""bpe_vocab":${bpe.vocabSize},"unigram_vocab":${uni.vocabSize},""" +
      s""""wordpiece_vocab":${wp.vocabSize},""" +
      cells.mkString(",") + "}")
    spark.stop()
  }
}
