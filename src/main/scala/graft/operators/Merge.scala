package graft.operators

import graft.functions.RowHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hash-diff CDC merge — the reference's core operator (J2/J3/A9/A10,
  * sync_INCREMENTAL.py:226-268 build side, :404-435 probe side).
  *
  * The reference loads the whole target's `(key -> id, hash)` map into driver
  * RAM and probes it row by row — a hand-rolled broadcast hash join that
  * falls over past driver memory. Here the diff is a `left_outer` join on the
  * *typed multi-column key* (no '|'-concat composite keys — SURVEY.md §7.4
  * trap 2): Catalyst broadcasts a small target state and shuffle-sort-merges
  * a 100 TB one, with AQE handling skew. Map-side hashing (RowHash) keeps the
  * classify stage a single shuffle.
  *
  * Invariants preserved (context/context.md:1292-1306): no-delete (target
  * rows absent from source are untouched) and idempotence (merge of an
  * already-merged source is all-SKIP — a fixpoint; property-tested in
  * MergeSpec).
  */
object Merge {

  val ActionCol = "cdc_action"
  val Insert = "insert"
  val Update = "update"
  val Skip = "skip"

  /** Classify every source row as insert / update / skip against the target.
    *
    * @param src      source rows (no hash column needed; computed over all
    *                 non-key data columns, alphabetically sorted)
    * @param tgtState target state: key columns + `row_hash`
    * @param keys     natural-key column names (1..n, joined as true
    *                 multi-column equality)
    */
  def classify(src: DataFrame, tgtState: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = src.columns.filterNot(keys.contains).toSeq
    val hashed = src.withColumn("src_hash", RowHash.rowHash(dataCols))
    val tgt = tgtState.select(keys.map(col) :+ col("row_hash").as("tgt_hash"): _*)
    hashed
      .join(tgt, keys, "left_outer")
      .withColumn(ActionCol,
        when(col("tgt_hash").isNull, lit(Insert))
          .when(col("src_hash") =!= col("tgt_hash"), lit(Update))
          .otherwise(lit(Skip)))
  }

  /** A9: merge-outcome tally (inserted / updated / unchanged). */
  def outcomeTally(classified: DataFrame): DataFrame =
    classified.groupBy(ActionCol).agg(count(lit(1)).as("n"))

  /** Apply the merge: new target = unchanged target rows + upserted source
    * rows. Never deletes (rows only in target survive). Target must carry
    * `row_hash`; output carries refreshed hashes for upserted rows.
    */
  def apply(src: DataFrame, tgt: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = src.columns.filterNot(keys.contains).toSeq
    val srcH = src.withColumn("row_hash", RowHash.rowHash(dataCols))
    // Rows of tgt whose key is NOT in src survive untouched (no-delete);
    // every src row lands with its fresh hash (insert or update);
    // key-matched tgt rows are replaced (update/skip both yield src's copy,
    // which for skip is byte-identical => idempotent fixpoint).
    val tgtKept = tgt.join(srcH.select(keys.map(col): _*).distinct(), keys, "left_anti")
    tgtKept.select(srcH.columns.map(col): _*).unionByName(srcH)
  }

  /** A10: duplicate-key audit — keys seen more than once in `df`. The
    * reference logs these as data-quality symptoms
    * (sync_INCREMENTAL.py:250-263); here it is a first-class operator.
    */
  def duplicateKeyAudit(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** A10b: null-key audit — rows with any null key part. */
  def nullKeyAudit(df: DataFrame, keys: Seq[String]): DataFrame =
    df.filter(keys.map(col(_).isNull).reduce(_ || _))
}
