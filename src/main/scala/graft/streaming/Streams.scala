package graft.streaming

import graft.operators.Merge
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface.
  *
  * The reference has no streaming engine — its incremental sync is a
  * cron-able micro-batch (context/context.md:686-697). Here the same merge
  * semantics are hosted inside Structured Streaming: each micro-batch runs
  * the J2 hash-diff merge via `foreachBatch` (exactly the SURVEY.md §2.9
  * plan), and the analytics side gets event-time windowed aggregation with
  * watermarked late-data handling.
  *
  * Everything is expressed on the streaming DataFrame API, so the planner
  * runs the same incremental hash-aggregates at 100 TB/day rates: state is
  * bounded by (watermark horizon × group cardinality), never by stream
  * length.
  */
object Streams {

  /** Event-time tumbling-window aggregation with a watermark: per
    * (window, key) row count + money sum. Late rows beyond `lateness` are
    * dropped deterministically; state is evicted once the watermark passes
    * the window end.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String = "1 day",
                     lateness: String = "1 hour",
                     amountCol: Option[String] = None): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n") +: amountCol.toSeq.map(a =>
      sum(col(a).cast("decimal(18,4)")).cast("double").as(s"sum_$a"))
    events.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start"))
      .drop("w")
  }

  /** Streaming dedup: drop duplicate keys within the watermark horizon —
    * the streaming analogue of exact dedup (state bounded by horizon).
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           keys: Seq[String], lateness: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, lateness).dropDuplicates(keys :+ tsCol)

  /** Host the J2 hash-diff merge inside a stream: every micro-batch is
    * merged into the parquet target at `targetPath` (create-on-first-batch),
    * preserving the batch pipeline's no-delete/idempotence invariants.
    * Returns a function suitable for `writeStream.foreachBatch`.
    */
  def mergeEachBatch(targetPath: String, keys: Seq[String])
      : (DataFrame, Long) => Unit = { (batch, _) =>
    val spark = batch.sparkSession
    val exists = graft.pipeline.Sinks.exists(spark, targetPath)
    val merged =
      if (!exists) graft.functions.RowHash.withAuditColumns(batch, keys)
      else Merge.apply(batch, spark.read.parquet(targetPath), keys)
    // Rewrite via a temp dir: the plan reads the same path it overwrites.
    val tmpPath = targetPath + "__staging"
    merged.write.mode("overwrite").parquet(tmpPath)
    spark.read.parquet(tmpPath).write.mode("overwrite").parquet(targetPath)
    graft.pipeline.Sinks.drop(spark, tmpPath)
  }
}
