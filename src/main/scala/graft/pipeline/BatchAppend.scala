package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exactly-once appends for the ADDITIVE index families (r17, VERDICT r16
  * §next-3: CMS / KLL sketch rows, connected-component label/relabel
  * rows). Hosted in `foreachBatch`, every side effect is AT-LEAST-ONCE —
  * after a crash the engine replays the last batch id — and because these
  * families are additive (unlike HLL/theta, which survive replay by max
  * semantics), a double-appended batch silently INFLATES every later
  * estimate. This is the `_manifest2` per-batch-marker protocol of
  * [[graft.streaming.Streams.dedupAgainstIndexEachBatch]] re-shaped for
  * flat (non-batch-partitioned) index directories:
  *
  *   - marker `<indexRoot>/_committed/<tag>-<sig>` present → the batch is
  *     durable; the append is a NO-OP (the replay case).
  *   - a marker for `<tag>` with a DIFFERENT content signature → loud
  *     lineage error (a stream restarted from a lost/reset checkpoint
  *     renumbers batch ids over old sink dirs; silently skipping would
  *     DROP the new data, silently appending would double the old).
  *   - no marker → delete any `batch-<tag>-*` data files (a crashed
  *     attempt's partial commit — removing them FIRST also restores the
  *     exact pre-batch state the recomputation must read), re-run the
  *     append writing files NAMED `batch-<tag>-<k>`, then create the
  *     marker LAST. Every crash point therefore replays to exactly one
  *     committed copy.
  *
  * Data files are committed by per-file rename out of a dot-prefixed
  * staging directory (invisible to readers), so a reader never sees a
  * torn file; the marker directory is `_`-prefixed, so Spark's data
  * listing never sees it. The batch's rows stay ordinary parquet files in
  * the ordinary flat layout — estimate/compact paths need no changes, and
  * compaction (staged-swap) folds batch files into plain rows while the
  * markers SURVIVE in `_committed`, so a replay arriving after a
  * compaction is still recognized as committed instead of re-appended.
  *
  * Single-writer per index, like every append/maintenance path in this
  * repo: the marker check is check-then-act, serialized by foreachBatch.
  */
object BatchAppend {

  /** Order-independent content signature of `df` over `cols`: decimal sum
    * of per-row xxhash64 over the NUL-joined string forms, plus the row
    * count (the Streams.batchSig formula — full-range longs overflow a
    * long sum under ANSI, so the sum runs in decimal(38,0)). A genuine
    * foreachBatch replay re-delivers byte-identical content (same source
    * offsets), so the signature matches; a reset-lineage stream's
    * colliding batch id carries different content and mismatches.
    */
  def contentSig(df: DataFrame, cols: Seq[String]): String = {
    val r = df.agg(
      sum(xxhash64(concat_ws("\u0000", cols.map(c => col(c).cast("string")): _*))
        .cast("decimal(38,0)")).as("s"),
      count(lit(1)).as("n")).head()
    val s = if (r.isNullAt(0)) "0" else r.getDecimal(0).toBigInteger.toString
    s"${s}_${r.getLong(1)}"
  }

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerDir(indexRoot: String) = new Path(s"$indexRoot/_committed")

  /** The committed signature for `tag`, if any. */
  def committedSig(spark: SparkSession, indexRoot: String,
                   tag: String): Option[String] = {
    val dir = markerDir(indexRoot)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).map(_.getPath.getName)
      .collectFirst { case n if n.startsWith(s"$tag-") =>
        n.stripPrefix(s"$tag-") }
  }

  private def writeMarker(spark: SparkSession, indexRoot: String,
                          tag: String, sig: String): Unit = {
    val p = new Path(markerDir(indexRoot), s"$tag-$sig")
    fsOf(spark, p).create(p, true).close()
  }

  /** Delete every `batch-<tag>-*` data file under `dir` — recursing one
    * partition level (`key=value` subdirs, for bucketed indexes like the
    * BM25 postings) — plus local-FS `.crc` twins and any stale staging
    * dir: a crashed attempt's partial commit. No-op when the directory
    * doesn't exist.
    */
  private def clearBatchFiles(spark: SparkSession, dir: String,
                              tag: String): Unit = {
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    def clear(p: Path): Unit =
      if (fs.exists(p)) fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile &&
            (n.startsWith(s"batch-$tag-") || n.startsWith(s".batch-$tag-")))
          fs.delete(st.getPath, false): Unit
        else if (st.isDirectory && n == s".batch-$tag-staging")
          fs.delete(st.getPath, true): Unit
        else if (st.isDirectory && n.contains("="))
          clear(st.getPath)
      }
    clear(root)
  }

  /** Append `rows` to `dir` as data files named `batch-<tag>-<k>`: write
    * to a dot-prefixed staging dir (readers skip it), then rename each
    * part file (and its local-FS checksum twin) to its deterministic
    * committed name — for partitioned appends (`partitionBy` non-empty),
    * each `key=value` subdir's files land in the matching subdir of
    * `dir`. Rename is the commit for each file; the caller's marker is
    * the commit for the batch.
    */
  def appendBatchFiles(rows: DataFrame, dir: String, tag: String,
                       partitionBy: Seq[String] = Nil): Unit = {
    val spark = rows.sparkSession
    val staging = s"$dir/.batch-$tag-staging"
    val stagingP = new Path(staging)
    val fs = fsOf(spark, stagingP)
    fs.delete(stagingP, true)
    val w = rows.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(staging)
    // (src part file, relative partition subpath) pairs, sorted for
    // deterministic committed names
    def walk(p: Path, rel: String): Seq[(Path, String)] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (st.isFile && n.startsWith("part-")) Seq(st.getPath -> rel)
        else if (st.isDirectory && n.contains("="))
          walk(st.getPath, if (rel.isEmpty) n else s"$rel/$n")
        else Nil
      }
    val parts = walk(stagingP, "").sortBy(_._1.toString)
    parts.zipWithIndex.foreach { case ((src, rel), k) =>
      val ext = src.getName.dropWhile(_ != '.') // ".snappy.parquet"
      val dstDir = if (rel.isEmpty) new Path(dir) else new Path(dir, rel)
      fs.mkdirs(dstDir)
      val dst = new Path(dstDir, s"batch-$tag-$k$ext")
      fs.delete(dst, false)
      // local-FS checksum twin must travel with the file or the next
      // read trips ChecksumException (the plantSidecar lesson)
      val srcCrc = new Path(src.getParent, s".${src.getName}.crc")
      val dstCrc = new Path(dst.getParent, s".${dst.getName}.crc")
      fs.delete(dstCrc, false)
      if (!fs.rename(src, dst)) throw new java.io.IOException(
        s"appendBatchFiles: failed to commit $src -> $dst")
      if (fs.exists(srcCrc) && !fs.rename(srcCrc, dstCrc))
        fs.delete(dstCrc, false): Unit
    }
    fs.delete(stagingP, true)
  }

  /** Recreate `fromRoot`'s `_committed` markers under `stagedRoot` — for
    * RETRAIN compactions that rebuild the whole index root via the staged
    * swap ([[graft.pipeline.Sinks.overwriteViaStagingWith]]). The additive
    * families keep data in a subdirectory (`sketches/`, `edges/`) so their
    * compaction never touches the root's `_committed`; the vector-index
    * families (IVF / PQ / OPQ / SemDeDup) keep data AT the root, and a
    * retrain that dropped the markers would let a crash-replayed batch
    * re-append rows the retrain already folded in — duplicate topk
    * candidates, the exact failure the markers exist to prevent. Markers
    * are empty files, identified by name alone, so "copy" is create-by-name.
    */
  def preserveMarkers(spark: SparkSession, fromRoot: String,
                      stagedRoot: String): Unit = {
    val src = markerDir(fromRoot)
    val fs = fsOf(spark, src)
    if (fs.exists(src)) {
      val dst = markerDir(stagedRoot)
      fs.mkdirs(dst)
      fs.listStatus(src).foreach { st =>
        if (st.isFile)
          fs.create(new Path(dst, st.getPath.getName), true).close()
      }
    }
  }

  /** Run `write` exactly once for (`tag`, `sig`): no-op on a committed
    * replay, loud error on a lineage mismatch, otherwise clear the
    * attempt's partials from `dataDirs`, run `write` (which must append
    * via [[appendBatchFiles]] into those dirs), and commit the marker.
    * Returns whether the write ran (false = replay no-op).
    */
  def exactlyOnce(spark: SparkSession, indexRoot: String, tag: String,
                  sig: String, dataDirs: Seq[String])(write: => Unit): Boolean =
    committedSig(spark, indexRoot, tag) match {
      case Some(prev) if prev == sig => false
      case Some(prev) => throw new IllegalStateException(
        s"batch '$tag' is already committed at $indexRoot with DIFFERENT " +
          s"content (marker $prev != batch $sig) — this looks like a stream " +
          "restarted from a lost/reset checkpoint re-using batch ids over " +
          "an existing index. Point the new lineage at a fresh index (or " +
          "repair _committed) instead of silently double-counting")
      case None =>
        dataDirs.foreach(d => clearBatchFiles(spark, d, tag))
        write
        writeMarker(spark, indexRoot, tag, sig)
        true
    }
}
