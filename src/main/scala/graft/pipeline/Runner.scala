package graft.pipeline

import graft.functions.RowHash
import graft.operators.{Filters, Merge}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** P3: the per-table pipeline loop — scan → filter → (semi-join) → audit
  * columns → full-refresh or hash-diff merge — with per-table error
  * isolation and a summary (reference sync_ALL.py:328-368,
  * sync_INCREMENTAL.py:509-558).
  *
  * Pure DataFrame-in/DataFrame-out; the sink is parameterized so tests run
  * against in-memory targets and production runs write parquet. Tables are
  * independent, so a production driver may submit them concurrently — Spark's
  * scheduler interleaves their jobs (the reference is forced sequential).
  */
object Runner {

  final case class TableResult(table: String, rows: Long, error: Option[String],
                               mode: String = "")

  /** Build the loaded (pre-sink) frame for one table spec: filters +
    * optional semi-join + audit columns (hash over ALL pre-audit columns —
    * the one hash basis shared with Merge.classify). Ids are dense 1..n in
    * natural-key order when the spec has one, in partition order otherwise —
    * both minted via zipWithIndex with no single-partition window stage
    * (RowHash.withAuditColumns' scale-safe default).
    */
  def loadTable(spark: SparkSession, sfDir: String, spec: TableSpec): DataFrame = {
    var df = TableSpec.read(spark, sfDir, spec.name)
    if (spec.filters.nonEmpty) df = df.filter(Filters.all(spec.filters))
    spec.semiJoin.foreach { case (buildTable, buildKey, probeKey) =>
      val build = TableSpec.read(spark, sfDir, buildTable)
      df = Filters.semiJoinIn(df, probeKey, build, buildKey)
    }
    if (spec.keys.nonEmpty) RowHash.withAuditColumns(df, spec.keys)
    else {
      import org.apache.spark.sql.functions.current_timestamp
      Sinks.withDenseId(RowHash.withRowHash(df))
        .withColumn("created_at", current_timestamp())
        .withColumn("updated_at", current_timestamp())
    }
  }

  /** Run every spec; `sink` persists each frame (e.g. parquet overwrite, or
    * a Merge.apply against existing state for Incremental mode).
    */
  def runAll(spark: SparkSession, sfDir: String, specs: Seq[TableSpec])
            (sink: (TableSpec, DataFrame) => Long): Seq[TableResult] =
    specs.map { spec =>
      try {
        val rows = sink(spec, loadTable(spark, sfDir, spec))
        TableResult(spec.name, rows, None)
      } catch {
        case e: Exception => TableResult(spec.name, -1, Some(e.toString))
      }
    }

  /** The reference's `/run/clean` (clean_all_tables.py:43-48): drop every
    * spec's target table. Returns the names actually removed.
    */
  def cleanAll(spark: SparkSession, specs: Seq[TableSpec],
               basePath: String): Seq[String] =
    specs.map(_.name).filter(n => Sinks.drop(spark, s"$basePath/$n"))

  /** Incremental sink helper: merge loaded source into existing target. */
  def mergeInto(src: DataFrame, tgt: DataFrame, keys: Seq[String]): DataFrame =
    Merge.apply(src.drop("row_hash", "created_at", "updated_at"),
      tgt, keys)

  /** The reference's incremental entry end to end
    * (sync_INCREMENTAL.py:509-558): per table — full refresh when the spec
    * says so, when the configured key proves unreliable (duplicate keys →
    * same fallback as sync_INCREMENTAL.py:46-48), or on bootstrap;
    * hash-diff merge into the existing parquet state otherwise
    * (schema-evolving the target first), committed via a staging swap
    * because the merge plan reads the path it replaces — with per-table
    * error isolation and a count-verified summary (`TableResult.mode`
    * records which path ran), like the reference's RESUMEN FINAL.
    */
  def syncIncremental(spark: SparkSession, sfDir: String, specs: Seq[TableSpec],
                      basePath: String, keyAudit: Boolean = true): Seq[TableResult] =
    specs.map { spec =>
      val path = s"$basePath/${spec.name}"
      try {
        val src = loadTable(spark, sfDir, spec)
        val bootstrap = spec.refreshMode == RefreshMode.FullRefresh ||
          !Sinks.exists(spark, path)
        // The reference falls back to full refresh for tables whose
        // configured key turns out unreliable (sync_INCREMENTAL.py:46-48,
        // 270-343); duplicate keys would fan out the classify join. The
        // audit is one extra source scan — only paid when it can change
        // the outcome (not on bootstrap), and callers who bound key
        // quality elsewhere can pass keyAudit = false.
        val keyUnreliable = !bootstrap && keyAudit &&
          Merge.duplicateKeyAudit(src, spec.keys).limit(1).count() > 0
        val (rows, mode) =
          if (bootstrap || keyUnreliable)
            (Sinks.fullRefresh(src, path),
              if (keyUnreliable) "full_refresh_fallback_dup_keys" else "full_refresh")
          else {
            val bare = src.drop("id", "row_hash", "created_at", "updated_at")
            val tgt = Merge.evolveTarget(bare, spark.read.parquet(path))
            // Merge.apply emits data-then-audit column order; keep the
            // stored layout stable across runs (evolved columns append).
            // A column the SOURCE dropped is absent from the merge output —
            // the stored schema follows the source (the source of truth),
            // intersecting here instead of failing the table forever.
            val merged = Merge.apply(bare, tgt, spec.keys)
            val keep = tgt.columns.filter(merged.columns.contains)
            (Sinks.overwriteViaStaging(
              merged.select(keep.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*), path),
              "incremental")
          }
        TableResult(spec.name, rows, None, mode)
      } catch {
        case e: Exception => TableResult(spec.name, -1, Some(e.toString))
      }
    }
}
