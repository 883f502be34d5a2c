package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Optimization-round diagnostic (r17, guide §1): per-query breakdown of a
  * bench-shaped run into (a) DataFrame CONSTRUCTION wall (driver-side work:
  * model loads, index ensure/writes, eager sub-jobs fired while building
  * the plan) and (b) the timed action's own wall, plus a Spark-job-level
  * listing (duration, stage task counts) so time is attributed to actual
  * jobs instead of guessed. Not part of the driver contract — a developer
  * tool only; the bench's methodology (Bench.scala) is unchanged.
  *
  * Usage: SPARK_GRAFT_PROBE_ONLY='^q_text_decode' sbt "runMain graft.OptProbe"
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.getOrElse("SPARK_GRAFT_PROBE_ONLY", "^q_nothing").r
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    catch { case _: Throwable => () }

    // job-level bookkeeping
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val siteByJob = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stageTasks = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobStart.put(e.jobId, System.nanoTime())
        siteByJob.put(e.jobId,
          Option(e.properties).map(_.getProperty("callSite.short", ""))
            .getOrElse(""))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStart.get(e.jobId)).getOrElse(0L)
        val ms = (System.nanoTime() - t0) / 1e6
        val site = Option(siteByJob.get(e.jobId)).getOrElse("")
        jobLines.add(f"    job ${e.jobId}%4d  ${ms}%8.1f ms  $site%s")
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stageTasks.addAndGet(e.stageInfo.numTasks.toLong)
    }
    spark.sparkContext.addSparkListener(listener)

    // Plan-dump mode: SPARK_GRAFT_PROBE_PLANS=<dir> SPARK_GRAFT_PROBE_TAG=
    // before|after writes plans/<query>_<tag>.txt with the formatted
    // initial plan AND the post-execution FINAL adaptive plan (the only
    // place AQE coalescing / runtime join swaps are visible).
    val planDir = sys.env.get("SPARK_GRAFT_PROBE_PLANS")
    val planTag = sys.env.getOrElse("SPARK_GRAFT_PROBE_TAG", "after")

    val qs = SparkEntry.queries.filter { case (n, _) =>
      only.findFirstIn(n).isDefined }.toSeq.sortBy(_._1)
    if (planDir.isDefined) {
      val dir = planDir.get
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      qs.foreach { case (name, fn) =>
        spark.catalog.clearCache()
        val df = fn(spark, sfDir)
        val initial = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // drive THIS QueryExecution (not a separate write query) so the
        // AdaptiveSparkPlan finalizes and the dump shows the runtime plan
        df.queryExecution.toRdd.count(): Unit
        val fin = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, s"${name}_$planTag.txt"),
          s"# $name — $planTag (sf: $sfDir)\n\n## Initial plan\n\n" +
            initial + "\n## Final adaptive plan (post-execution)\n\n" + fin)
        println(s"[plans] wrote $name")
      }
      spark.stop()
      sys.exit(0)
    }
    // SPARK_GRAFT_PROBE_KEEPCACHE=1 clears the cache only before rep 0 —
    // the BENCH steady state (operator persists warm across the timed
    // runs of one query), where the default per-rep clear measures the
    // cold construct instead (r18).
    val keepCache = sys.env.contains("SPARK_GRAFT_PROBE_KEEPCACHE")
    qs.foreach { case (name, fn) =>
      println(s"== $name ==")
      (0 until reps).foreach { r =>
        if (!keepCache || r == 0) spark.catalog.clearCache()
        jobLines.clear(); stageTasks.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val n = df.count()
        val t2 = System.nanoTime()
        println(f"  run$r: construct ${(t1 - t0) / 1e9}%7.3f s   " +
          f"count ${(t2 - t1) / 1e9}%7.3f s   rows $n%d   " +
          f"tasks ${stageTasks.get()}%d   jobs ${jobLines.size()}%d")
        if (r == reps - 1 && sys.env.contains("SPARK_GRAFT_PROBE_JOBS")) {
          val it = jobLines.iterator()
          while (it.hasNext) println(it.next())
        }
      }
    }
    spark.stop()
  }
}
