package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval (range) join: match point rows to interval rows of
  * the same key with `start <= t < end`.
  *
  * Spark plans a raw `ON key = key AND t >= start AND t < end` join as a
  * sort-merge join on the key alone with the range residual as a
  * post-filter — every point meets every interval of its key, quadratic
  * per key (and without the equality key it degrades to a
  * BroadcastNestedLoop). The scale-safe shape quantizes time into
  * fixed-width buckets: an interval is exploded to the buckets it
  * covers, a point belongs to exactly ONE bucket, and the join becomes a
  * plain equi-join on (key, bucket) + an exact residual filter. With
  * bucket width chosen near the typical interval span the explode factor
  * is ~2 rows per interval, the shuffle keys are fine-grained (hot keys
  * split across their time range), and no pair outside a shared bucket
  * is ever materialized. This is the standard stream-interval-join
  * decomposition (Flink's interval join buckets the same way).
  *
  * Points fall in exactly one bucket, so no post-join dedup is needed —
  * the result is row-identical to the naive range join (RangeJoinSpec
  * pins this).
  */
object RangeJoin {

  /** Inner interval join.
    *
    * @param points     rows with `key` and integer time `t`
    * @param intervals  rows with `key`, integer `start` (inclusive) and
    *                   `end` (exclusive); degenerate `end <= start`
    *                   intervals match nothing
    * @param key        equality key column name (both inputs)
    * @param t          point time column name (integer)
    * @param start,end  interval bound column names (integer)
    * @param bucketWidth  quantization width, same unit as `t`; choose
    *                     near the typical interval span — explode factor
    *                     is `ceil(span / width) + 1` per interval
    *
    * Output: all point columns + all interval columns (names must not
    * collide apart from `key`).
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, key: String,
      t: String, start: String, end: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // exact floor division over the full long range: double division
    // (floor(c / w)) rounds for |c| > 2^53 (ns-since-epoch territory) and
    // can land a point and its covering interval in different buckets,
    // silently dropping the match before the residual filter runs.
    // Subtracting the positive remainder makes the numerator exactly
    // divisible, so integral `div` equals floor. (Sole corner: t ==
    // Long.MinValue underflows; no time encoding uses that sentinel.)
    def bucketOf(c: Column): Column = {
      val cl = c.cast("long")
      call_function("div", cl - pmod(cl, lit(bucketWidth)), lit(bucketWidth))
    }
    // sequence() is inclusive on both ends; end is exclusive, so the last
    // covered bucket is that of (end - 1). Empty intervals explode to
    // zero rows via the filter guard.
    val iv = intervals
      .filter(col(end) > col(start))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(start)), bucketOf(col(end) - 1))))
    val pt = points.withColumn("__bucket", bucketOf(col(t)))
    pt.join(iv, Seq(key, "__bucket"))
      .filter(col(t) >= col(start) && col(t) < col(end))
      .drop("__bucket")
  }
}
