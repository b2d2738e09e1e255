package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range splitting — X1, the reference's core physical operator
  * (splitter.go:51-108): walk the sorted `_id` key and emit one task per
  * `block` (default 10 000) docs with `[first,last]` bounds plus a count.
  *
  * Spark stance (SURVEY §4): partitioned reads make the task queue
  * disappear, so the splitter survives as (a) an explicit
  * boundary-computation utility for non-splittable sources (a Mongo
  * connector partitioner would consume these bounds) and (b) a
  * repartitioner for co-locating downstream per-key work.
  *
  * Two bound strategies:
  *  - [[exactBounds]] — window walk, exactly the reference's semantics
  *    (block-sized, count-accurate). One global sort: fine for metadata
  *    sizing and for the correctness oracle; NOT the 100 TB path.
  *  - [[repartitionByKeyRange]] — Spark's `repartitionByRange`, whose
  *    RangePartitioner computes bounds by reservoir SAMPLING (no global
  *    sort) — the scale path, equivalent to the reference's goal
  *    (balanced disjoint key ranges) at a fraction of the cost.
  */
object RangeSplitter {

  /** Exact per-block ranges: one row per task with (task_seq, id_first,
    * id_last, source_count) — mirrors splitter.go:76-102 including the
    * short tail block. */
  def exactBounds(df: DataFrame, key: String, block: Int): DataFrame = {
    require(block > 0, "block must be positive")
    val w = Window.orderBy(col(key))
    df.select(col(key))
      .withColumn("rn", row_number().over(w) - 1)
      .groupBy((col("rn") / block).cast("long").as("task_seq"))
      .agg(
        min(col(key)).as("id_first"),
        max(col(key)).as("id_last"),
        count(lit(1)).as("source_count"))
      .orderBy("task_seq")
  }

  /** The scale path: hand the DataFrame back partitioned into
    * ceil(count/block)-ish balanced key ranges via sampling — disjoint
    * ranges, no global sort, no driver collect. `numTasks` must be
    * computed by the caller (e.g. from a cheap `df.count()` or source
    * statistics). */
  def repartitionByKeyRange(df: DataFrame, key: String, numTasks: Int): DataFrame =
    df.repartitionByRange(math.max(numTasks, 1), col(key))

  /** Sampled approximate bounds (for feeding an external partitioner):
    * numSplits-1 interior boundaries via approxQuantile — single pass,
    * no sort. */
  def sampledBoundaries(df: DataFrame, key: String, numSplits: Int,
      relativeError: Double = 0.001): Array[Double] = {
    require(numSplits > 1, "need at least 2 splits")
    val probs = (1 until numSplits).map(_.toDouble / numSplits).toArray
    df.stat.approxQuantile(key, probs, relativeError)
  }
}
