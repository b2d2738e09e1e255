package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: collapse a per-key
  * change feed into validity intervals `[valid_from, valid_to)` — one
  * interval per RUN of equal values (consecutive identical observations
  * merge; a re-appearing old value opens a NEW interval).
  *
  * Classic gaps-and-islands, planned per key: lag-compare marks run
  * starts, a running sum numbers the islands, one aggregate per island
  * takes the bounds, and `lead` over the island starts closes each
  * interval with its successor's start (`null` = still current). Two
  * per-key window passes + one map-side-combined aggregate — state and
  * sort are bounded per key, no global operation anywhere. The
  * batch/backfill twin of the streaming oplog fold (ApplyJob.foldDocs
  * keeps only the LAST value; this keeps the full history).
  *
  * Determinism: ties at equal `time` break on `tieCol` — the interval
  * layout is a pure function of the input, so any engine/retry
  * reproduces it (the `q_scd2` oracle recomputes it in DuckDB). */
object Scd2 {

  /** @param changes change feed rows
    * @param key      entity key column name
    * @param time     integer observation time (µs recommended)
    * @param tieCol   total-order tiebreak within (key, time)
    * @param value    tracked value column name
    *
    * Output: (key, value, valid_from, valid_to, n_obs) — `valid_to`
    * null for the current interval, `n_obs` the observations merged
    * into the run. */
  def intervals(changes: DataFrame, key: String, time: Column,
      tieCol: String, value: String): DataFrame = {
    val obs = changes.select(col(key), time.as("__t"), col(tieCol).as("__tie"),
      col(value).as("__v"))
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__tie"))
    // island id: count of value-changes up to and including this row
    val marked = obs
      .withColumn("__prev", lag(col("__v"), 1).over(w))
      // null-safe: a change is anything not `<=>`-equal to the previous
      // value; the first row of a key starts island 0 or 1 either way
      .withColumn("__chg", (!(col("__prev") <=> col("__v"))).cast("long"))
      .withColumn("__island",
        sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val islands = marked.groupBy(col(key), col("__island"))
      .agg(first(col("__v")).as(value), min(col("__t")).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val wi = Window.partitionBy(key).orderBy(col("valid_from"), col("__island"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wi))
      .select(col(key), col(value), col("valid_from"), col("valid_to"),
        col("n_obs"))
  }
}
