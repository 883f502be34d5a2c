package graft

import org.apache.spark.sql.SparkSession

/** One place for the local session config shared by every main (Bench,
  * Verify, Demo, MergeBench) — a flag missed in one of them would silently
  * run that tool under different semantics than the rest (e.g. the
  * nanosAsLong flag the fixture parquet needs).
  */
private[graft] object Sessions {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Scale-adaptive reduce width (optimization guide §2.2, r17): let AQE
      // size post-shuffle partitions by BYTES (advisoryPartitionSizeInBytes,
      // 64 MB default) instead of stopping at defaultParallelism. With the
      // default parallelismFirst=true, AQE refuses to coalesce below the
      // core count, so every KB-sized shuffle in this engine ran `cpus`
      // reduce tasks — pure scheduling overhead at bench scale, and the
      // wrong policy at 100 TB too, where partition width should track data
      // volume (the same advisory bytes there yield thousands of
      // partitions). Explicit `repartition(n)` calls (the spread() helper)
      // are never coalesced, so deliberately-parallel CPU stages keep their
      // width.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      // The operator-internal persists (LSH signatures/pairs, NB models,
      // web-graph edge lists, pipeline pins) otherwise OPT OUT of AQE:
      // cached plans keep their static 32-partition shuffles unless Spark
      // is allowed to re-partition cached output. Purely physical — same
      // rows, different partition count (SPARK-40390's escape hatch).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
