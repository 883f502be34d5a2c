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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
