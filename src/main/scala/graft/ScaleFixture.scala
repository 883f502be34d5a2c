package graft

import org.apache.spark.sql.functions._

/** Scaling-probe fixture builder (r18, VERDICT r17 §next-7) — a developer
  * tool, NOT part of the driver contract. Writes an N× replica of an
  * existing scale-factor directory: each table is unioned N times with
  * every table-crossing KEY column shifted by `copy · 10_000_000` so
  * foreign-key joins stay consistent and copies never collide (the small
  * dimension tables nation/region are copied once, unshifted). The result
  * is a VOLUME probe, not a distribution-faithful sf1: texts repeat
  * across copies (near-dup structure multiplies), which is fine for
  * measuring how shuffle-heavy plans scale with cores but NOT for
  * correctness work — the oracle never runs against it.
  *
  * Usage: SPARK_GRAFT_SCALE_COPIES=10 sbt "runMain graft.ScaleFixture
  *          /root/testdata/sf0.1 /tmp/sfx1"
  */
object ScaleFixture {
  private val Shift = 10000000L
  private val keyCols = Set(
    "doc_id", "vec_id", "event_id", "user_id",
    "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey",
    "c_custkey", "s_suppkey", "p_partkey")
  private val replicated = Seq("documents", "embeddings", "events",
    "orders", "lineitem", "customer", "supplier", "part")
  private val copiedOnce = Seq("nation", "region")

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    replicated.foreach { table =>
      val base = spark.read.parquet(s"$srcDir/$table.parquet")
      val shiftable = base.schema.fields
        .filter(f => keyCols(f.name)).map(f => f.name -> f.dataType).toMap
      val out = (0 until copies).map { i =>
        shiftable.foldLeft(base) { case (df, (c, t)) =>
          df.withColumn(c, (col(c).cast("long") + lit(i * Shift)).cast(t))
        }
      }.reduce(_ unionByName _)
      // several output files so the scan itself arrives pre-split — the
      // point of the probe is multi-core behavior, not single-split decode
      out.repartition(16).write.mode("overwrite")
        .parquet(s"$outDir/$table.parquet")
      println(s"[scale] $table x$copies -> $outDir/$table.parquet")
    }
    copiedOnce.foreach { table =>
      spark.read.parquet(s"$srcDir/$table.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
      println(s"[scale] $table x1 -> $outDir/$table.parquet")
    }
    spark.stop()
  }
}
