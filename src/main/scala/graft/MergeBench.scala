package graft

import graft.functions.RowHash
import graft.operators.Merge
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-merge scenario benchmark, mirroring the reference's published
  * ETL numbers (BASELINE.md: no-change ~8–10 s, 100 changed ~12 s, 1,000
  * ~20 s, 10,000 ~45 s on 88k–246k rows): bootstrap a parquet target from
  * `orders`, then time a full hash-diff merge (classify + apply + parquet
  * write + count-verify) for each change size.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.MergeBench"
  *
  * Prints one JSON line: {"metric":"merge","scenarios":{"changed_0":s,...}}
  */
object MergeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = java.nio.file.Files.createTempDirectory("graft-mergebench").toString
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val nRows = orders.count()
    // Bootstrap the target once (audit columns + parquet), like sync_ALL.
    val tgtPath = s"$out/orders"
    RowHash.withAuditColumns(orders, Seq("o_orderkey"))
      .write.mode(SaveMode.Overwrite).parquet(tgtPath)

    def mergeRun(changed: Long): Double = {
      // Deterministic change set: bump o_totalprice on the `changed`
      // lowest keys (keys are unique in orders).
      val keys = broadcast(orders.select("o_orderkey")
        .orderBy("o_orderkey").limit(changed.toInt))
      val src =
        if (changed == 0) orders
        else orders.join(keys.withColumnRenamed("o_orderkey", "__k"),
            col("o_orderkey") === col("__k"), "left_outer")
          .withColumn("o_totalprice",
            when(col("__k").isNotNull, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")))
          .drop("__k")
      val tgt = spark.read.parquet(tgtPath)
      val t0 = System.nanoTime()
      val merged = Merge.apply(src, tgt, Seq("o_orderkey"))
      merged.write.mode(SaveMode.Overwrite).parquet(s"$out/orders_next")
      val n = spark.read.parquet(s"$out/orders_next").count()
      val sec = (System.nanoTime() - t0) / 1e9
      require(n == nRows, s"row count drifted: $n != $nRows")
      sec
    }

    mergeRun(0) // warm-up (session/codegen init not billed to a scenario)
    val scenarios = Seq(0L, 100L, 1000L, 10000L)
      .map(c => s"changed_$c" -> mergeRun(c))
    val js = scenarios.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"merge","rows":$nRows,"scenarios":$js,"sf":"$sfDir"}""")
    spark.stop()
  }
}
