package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal latest-state) join: attach to every left row the single
  * most recent right row whose time is <= the left row's time, per key —
  * "join each event to the config/price/model snapshot that was live when
  * the event happened", the lookup a training-data pipeline runs to label
  * events with slowly-changing state.
  *
  * Spark has no ASOF JOIN operator, and the naive encodings die at scale:
  * a theta-join on `r.t <= l.t` is a per-key cartesian the optimizer cannot
  * prune, and "max(right.t) per left row then re-join" scans the right side
  * twice. This is the UNION + RUNNING-WINDOW shape instead: tag both sides,
  * union them, sort each key's timeline once, and carry the latest snapshot
  * forward with `last(_, ignoreNulls)` over a running row frame — ONE
  * shuffle of each input keyed by the join key, one per-key sort, no
  * row-pair blowup, incremental frame evaluation (no full-partition
  * buffering). Equal timestamps order the snapshot BEFORE the event
  * (side 0 < 1), giving the inclusive `r.t <= l.t` semantics of
  * DuckDB/Pandas ASOF.
  *
  * Left-join semantics: every left row survives; rows with no eligible
  * snapshot (or a NULL left time, which sorts first) carry NULL snapshot
  * columns. Snapshot columns travel as ONE struct, so the match is a whole
  * right ROW — a NULL field in the latest snapshot stays NULL instead of
  * falling back to a stale older value (the bug the per-column
  * `last(ignoreNulls)` form has).
  *
  * Contract: the right side must be unique per (keys, rightTime) — ties
  * there have no "latest" and would resolve arbitrarily; pre-dedup with
  * [[Dedup.latestPerKeyOrdered]]. Skew note: one key's full timeline lands
  * in one task, the same bound every keyed window in this engine carries —
  * a pathological hot key wants [[Skew]]-style pre-splitting of the LEFT
  * side (snapshots rarely skew).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               valueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin: at least one key column")
    require(valueCols.nonEmpty, "asofJoin: at least one right value column")
    val clash = valueCols.map(prefix + _).toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"asofJoin: output columns $clash collide with left columns — change prefix")
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__at"),
        lit(0).as("__side"),
        struct(valueCols.map(col): _*).as("__snap")): _*)
    val l = left
      .withColumn("__at", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__snap", lit(null).cast(r.schema("__snap").dataType))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__at").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__snap", last(col("__snap"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        valueCols.map(c => col("__snap").getField(c).as(prefix + c)): _*)
  }
}
