package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DELETES for the persisted index families (late r17) — the lifecycle
  * verb a real training-data pipeline cannot ship without: takedowns,
  * licensing changes, and contamination discovered after indexing all
  * require removing documents from indexes that were built append-only.
  * A rebuild per takedown is O(corpus); this is the standard
  * tombstone design (an LSM/segment-store idea re-expressed for flat
  * parquet indexes):
  *
  *   - [[delete]] appends the doomed ids to `<root>/_tombstones/` —
  *     O(batch), exactly-once under `batchTag` (the
  *     [[BatchAppend]] marker protocol, tags namespaced `del-` so a
  *     stream that appends AND deletes under the same batch id cannot
  *     collide).
  *   - probes call [[exclude]] — one anti-join of the index rows
  *     against the tombstone set. Tombstones are usually tiny next to
  *     the corpus; AQE picks the broadcast side.
  *   - [[purge]] physically removes tombstoned rows (staged swap —
  *     readers see the old index or the new, never a half state),
  *     copies every `_`-sidecar forward EXCEPT the tombstones
  *     themselves, and preserves the exactly-once markers, so a
  *     crash-replayed append OR delete arriving after the purge still
  *     no-ops. A re-append of a previously deleted id after a purge is
  *     a fresh row, as expected.
  *
  * Deleting an id not in the index is a no-op by construction (the
  * anti-join matches nothing) — idempotent, like DELETE anywhere.
  * Single-writer per index for delete/purge, like every maintenance
  * verb in this repo; [[exclude]] is read-side and safe always.
  */
object Tombstones {

  def tombstonePath(indexRoot: String): String = s"$indexRoot/_tombstones"

  /** Append a batch of doomed ids (distinct-ed; the column is stored as
    * `id` whatever its source name). `batchTag` = exactly-once.
    */
  def delete(ids: DataFrame, idCol: String, indexRoot: String,
             batchTag: Option[String] = None): Unit = {
    val spark = ids.sparkSession
    val rows = ids.select(col(idCol).as("id")).filter(col("id").isNotNull)
      .distinct()
    batchTag match {
      case None =>
        rows.write.mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(tombstonePath(indexRoot))
      case Some(tag0) =>
        val tag = s"del-$tag0"
        val sig = BatchAppend.contentSig(ids, Seq(idCol))
        BatchAppend.exactlyOnce(spark, indexRoot, tag, sig,
          Seq(tombstonePath(indexRoot))) {
          BatchAppend.appendBatchFiles(rows, tombstonePath(indexRoot), tag)
        }: Unit
    }
  }

  /** The current tombstone set, or None when none have ever been
    * written (the overwhelmingly common case — callers skip the join
    * entirely).
    */
  def tombstones(spark: SparkSession, indexRoot: String): Option[DataFrame] = {
    val p = tombstonePath(indexRoot)
    if (Sinks.exists(spark, p)) Some(spark.read.parquet(p).select("id"))
    else None
  }

  /** Drop `df`'s rows whose `idCol` is tombstoned — the probe-side hook.
    * No tombstones → `df` unchanged (no join in the plan at all).
    */
  def exclude(df: DataFrame, indexRoot: String,
              idCol: String = "id"): DataFrame =
    tombstones(df.sparkSession, indexRoot) match {
      case None => df
      case Some(t) =>
        df.join(t.withColumnRenamed("id", "__tomb_id"),
          df(idCol) === col("__tomb_id"), "left_anti")
    }

  /** Copy every `_`-prefixed sidecar directory from `fromRoot` into
    * `stagedRoot`, except `_tombstones` (the purge consumes them) and
    * `_committed` (markers are recreated by
    * [[BatchAppend.preserveMarkers]] — empty files, no data copy
    * needed). Family-agnostic: `_meta`, `_centroids`, `_books`,
    * `_rotation` all ride through untouched.
    */
  def copySidecars(spark: SparkSession, fromRoot: String,
                   stagedRoot: String): Unit = {
    val src = new Path(fromRoot)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(src)) fs.listStatus(src).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("_") &&
          n != "_tombstones" && n != "_committed") {
        org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
          new Path(stagedRoot, n), false,
          spark.sparkContext.hadoopConfiguration): Unit
      }
    }
  }

  /** Physically remove tombstoned rows: staged-swap rewrite of the data
    * rows minus the tombstone set, sidecars and exactly-once markers
    * carried forward, tombstones cleared by the swap itself (the new
    * root simply has none). Returns the number of rows REMOVED; no
    * tombstones → no-op returning 0 (the index is untouched).
    *
    * `partitionCols` must name the index's partition layout (e.g.
    * `cell` for the IVF-shaped families) so the rewritten index keeps
    * its pruning structure.
    */
  def purge(spark: SparkSession, indexRoot: String,
            idCol: String = "id",
            partitionCols: Seq[String] = Nil): Long =
    tombstones(spark, indexRoot) match {
      case None => 0L
      case Some(_) =>
        val before = spark.read.parquet(indexRoot)
        val kept = exclude(before, indexRoot, idCol)
        val nBefore = before.count()
        val nKept = Sinks.overwriteViaStagingWith(kept, indexRoot,
          partitionCols) { staged =>
          copySidecars(spark, indexRoot, staged)
          BatchAppend.preserveMarkers(spark, indexRoot, staged)
        }
        nBefore - nKept
    }
}
