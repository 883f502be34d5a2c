package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // Warm up once so one-time session costs (Hadoop FS init, codegen
    // compiler, parquet footer cache) aren't billed to whichever query the
    // Map iterates first. Best-effort: a missing warmup table must not
    // kill the (per-query error-isolated) benchmark.
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    catch { case _: Throwable => () }
    // Quality-gate queries run in Verify (the correctness pass), not here:
    // a gate re-derives ground truth every run, so timing it benchmarks the
    // gate's own truth construction, not the engine (VERDICT r3 §wrong-2).
    val benched = SparkEntry.queries -- SparkEntry.verifyOnlyQueries
    // Median of N runs per query: run-to-run noise on this box is ±15%,
    // which used to swamp per-query regressions; the median also absorbs
    // one-time costs a query's first run pays (index build, cache fill).
    // A run that THROWS records NaN, not its (fast) failure wall time —
    // the old form timed the exception path as if it were a result, so a
    // broken query published a bogus low median. NaN sorts last, so the
    // median is over successful runs; a majority-failing query reports -1
    // and lands in `failed`.
    val results = benched.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Double.NaN
        }
      }.sorted // NaN sorts after every real number (IEEE total order)
      // Median over SUCCESSFUL runs only: indexing the full (NaN-padded)
      // vector shifts the reported value toward the max success whenever any
      // run fails. A query still reports -1 when half or more runs failed.
      val ok = times.filterNot(_.isNaN)
      name -> (if (ok.size * 2 <= runs) -1.0 else ok(ok.size / 2))
    }
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
