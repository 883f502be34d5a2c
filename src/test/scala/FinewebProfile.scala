package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CorpusPipeline

/** Scratch diagnostic: cumulative per-stage wall time of the FineWeb
  * recipe at sf0.1 (each prefix re-runs the earlier stages — the delta
  * between consecutive rows is the marginal stage cost).
  */
object FinewebProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    val docs = SparkEntry.fineWebPagesForProfile(spark, sfDir)
    val steps = CorpusPipeline.fineWebRecipe()
    // warm the scan
    docs.count()
    var prev = 0.0
    (1 to steps.length).foreach { k =>
      val t0 = System.nanoTime()
      val n = CorpusPipeline.run(docs, "doc_id", "text", steps.take(k)).count()
      spark.catalog.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"prefix $k%2d (${steps(k - 1).getClass.getSimpleName}%-25s) " +
        f"rows=$n%6d cum=$dt%7.2f s marginal=${dt - prev}%7.2f s")
      prev = dt
    }
    spark.stop()
  }
}
