package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Row fingerprinting for CDC / idempotent merge.
  *
  * Semantics derived from the reference's `calculate_row_hash`
  * (sync_ALL.py:184-191, sync_INCREMENTAL.py:169-176, spec at
  * context/context.md:1223-1241): SHA-256 over the `'|'`-joined values of the
  * **alphabetically sorted** column names; NULL / empty-string / missing
  * values render as the literal string `"NULL"`.
  *
  * Parity note: the reference renders `str(val) if val else 'NULL'` — Python
  * truthiness — but its rows always come from `csv.DictReader`, so every
  * value is a *string* and the only falsy values are `''` and `None`
  * (the string `'0'` is truthy and hashes as `'0'`). `cell` reproduces
  * exactly that: null/empty → "NULL", everything else its string form. For
  * typed columns we render via `cast(string)`, which means numeric 0 hashes
  * as "0" — same as the reference's CSV string "0". Byte parity therefore
  * holds for the reference's real data flow; it would diverge only if the
  * reference were fed pre-typed numerics, a path it does not have.
  *
  * Implemented as native codegen'd expressions (`sha2(concat_ws(...))`), no
  * UDF — the whole hash stays inside whole-stage codegen, so at 100 TB this
  * is a pure map-side projection with zero shuffle.
  */
object RowHash {

  /** Render one column exactly like the reference renders a CSV cell:
    * null or empty string => "NULL", else the string value.
    * Note: values are rendered from the *string form* of the column —
    * compute hashes before lossy casts when byte parity matters
    * (SURVEY.md §7.4 trap 1).
    */
  def cell(c: Column): Column = {
    val s = c.cast(StringType)
    when(s.isNull || s === "", lit("NULL")).otherwise(s)
  }

  /** Dense 1..n ids in global `sortCols` order with NO single-partition
    * stage: range-repartition on the sort key (equal keys land in one
    * partition; RangePartitioner's reservoir sampling is seeded
    * per-partition, so bounds are deterministic for a deterministic parent
    * plan), sort within partitions, then [[denseIdByPartitionOffset]].
    * Output is identical to `row_number().over(Window.orderBy(sortCols))` —
    * partition order equals global sort order — but every stage stays
    * distributed AND inside whole-stage codegen (the former RDD
    * zipWithIndex form dropped the whole downstream stage out of Tungsten),
    * so it holds at any scale. The one requirement carried by callers:
    * `sortCols` must be a total order (append a unique tiebreak such as
    * `row_hash`).
    */
  def orderedDenseId(df: DataFrame, sortCols: Seq[Column],
                     idCol: String): DataFrame =
    denseIdByPartitionOffset(
      df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
        // Eager checkpoint — load-bearing, NOT an optimization.
        // RangePartitioner seeds its reservoir sampling from the RDD id,
        // which is minted fresh every time an action compiles the plan: two
        // separate actions over this frame can land boundary rows in
        // DIFFERENT partitions. The mint below runs two actions (counts,
        // then tag), so the partitioning must be frozen once. RDD
        // zipWithIndex froze it by sharing one RDD across its jobs;
        // the columnar equivalent is a local checkpoint, which pins the
        // rows AS InternalRow blocks (no external-Row round trip) and
        // keeps everything downstream inside whole-stage codegen.
        .localCheckpoint(true),
      idCol, 0L)

  /** Mint dense `offset+1..offset+n` ids in partition-major row order
    * WITHOUT leaving columnar execution: the same two passes RDD
    * `zipWithIndex` runs (a count job, then the tagged pass), but expressed
    * as codegen'd expressions — `spark_partition_id()` keys a per-partition
    * count aggregate (one row per partition to the driver: metadata-scale),
    * the cumulative offsets come back as a broadcast map literal, and the
    * intra-partition row index is `monotonically_increasing_id()`'s low 33
    * bits (its documented layout: partitionId << 33 | rowIndexInPartition,
    * assigned in row-production order — here the post-sort order).
    *
    * PRECONDITION (why this is private): both passes run as separate
    * actions, so the input's row->partition assignment must be identical
    * across plan compilations — the caller must pass a materialized
    * (checkpointed/cached) frame, as [[orderedDenseId]] arranges. For
    * arbitrary un-materialized parents use `Sinks.withDenseId`, whose RDD
    * zipWithIndex freezes ONE physical plan for both of its jobs.
    */
  private def denseIdByPartitionOffset(df: DataFrame, idCol: String,
                                       offset0: Long): DataFrame = {
    val tagged = df
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rix",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
    val counts = tagged.groupBy("__pid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // The low-33-bit mask wraps silently if a single partition holds >= 2^33
    // rows; fail loudly instead of minting duplicate ids. (At 2^33 rows a
    // partition is already far past any sane partition sizing.)
    counts.find(_._2 >= (1L << 33)).foreach { case (pid, n) =>
      throw new IllegalStateException(
        s"denseIdByPartitionOffset: partition $pid holds $n rows >= 2^33; " +
          "repartition the input before minting ids")
    }
    var acc = offset0
    val offsets = counts.map { case (pid, n) => val o = acc; acc += n; pid -> o }
    val offsetCol =
      if (offsets.isEmpty) lit(offset0) // empty input: no rows to look up
      else element_at(
        map_from_arrays(array(offsets.map(p => lit(p._1)).toIndexedSeq: _*),
          array(offsets.map(p => lit(p._2)).toIndexedSeq: _*)),
        col("__pid"))
    tagged.withColumn(idCol, (col("__rix") + offsetCol + lit(1L)).cast(LongType))
      .drop("__pid", "__rix")
  }

  /** SHA-256 hex fingerprint over the given columns, sorted by name. */
  def rowHash(colNames: Seq[String]): Column =
    sha2(concat_ws("|", colNames.sorted.map(n => cell(col(n))): _*), 256)

  /** All-columns fingerprint of a DataFrame. */
  def withRowHash(df: DataFrame, hashCol: String = "row_hash"): DataFrame =
    df.withColumn(hashCol, rowHash(df.columns.toSeq))

  /** Audit columns the reference appends to every sink table
    * (sync_ALL.py:234,242-244): surrogate `id` + `row_hash` +
    * `created_at`/`updated_at`. The hash basis is ALL pre-audit columns —
    * the single hash definition shared with `Merge.classify`. `now` is
    * injectable so tests/oracles can pin a literal timestamp.
    *
    * Ids are dense 1..n in global `(orderBy, row_hash)` order — row_hash as
    * tiebreak keeps id assignment deterministic even when the declared key
    * has duplicates (the synthetic lineitem does). The default mints them
    * WITHOUT a single-partition stage: range-repartition on the sort key
    * (equal keys land in one partition; RangePartitioner's sampling is
    * seeded per-partition, so bounds are deterministic for a deterministic
    * parent plan), sort within partitions, then zipWithIndex — partition
    * order equals global key order, so the ids match `row_number` over a
    * global window exactly, at any scale. `globalWindow = true` opts into
    * the literal single-partition `row_number` form (AUTO_INCREMENT parity
    * for small frames / plan-shape tests).
    */
  def withAuditColumns(df: DataFrame, orderBy: Seq[String],
                       now: Column = current_timestamp(),
                       globalWindow: Boolean = false): DataFrame = {
    val sortCols = orderBy.map(col) :+ col("row_hash")
    val hashed = withRowHash(df)
    val withId =
      if (globalWindow) {
        import org.apache.spark.sql.expressions.Window
        hashed.withColumn("id",
          row_number().over(Window.orderBy(sortCols: _*)).cast("long"))
      } else orderedDenseId(hashed, sortCols, "id")
    withId
      .withColumn("created_at", now)
      .withColumn("updated_at", now)
      .select((Seq("id") ++ df.columns ++ Seq("row_hash", "created_at", "updated_at")).map(col): _*)
  }
}
