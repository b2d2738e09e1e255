package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §4 scale notes).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles most
  * skew at runtime; explicit salting remains the tool for the two cases
  * AQE cannot fix: (a) a hot KEY whose single group exceeds one task
  * even after partition splitting — the join must replicate the other
  * side; (b) deterministic plan shape requirements where runtime
  * replanning is undesirable. The reference sidesteps skew by hand-range
  * splitting on `_id` (splitter.go:51-108, our X1); these helpers cover
  * the join/aggregation shapes the analytics surface adds.
  */
object Skew {

  /** Deterministic per-row salt in [0, buckets): hash of the given
    * columns (NOT rand() — deterministic plans reproduce across retries
    * and engines). Pass high-cardinality non-key columns. */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Skew-safe equi-join: the left (large, skewed) side gets a
    * deterministic row salt; the right side is replicated across all
    * `buckets` salt values via a tiny explode, so each (key, salt)
    * bucket joins independently — a hot key's rows spread over `buckets`
    * tasks instead of one. Result equals `left.join(right, keys)`.
    *
    * Use when ONE side is small enough to replicate ×buckets (dims,
    * lookup tables with hot keys). Broadcast remains better when the
    * whole right side fits in memory; salting covers the middle ground
    * where the right side is too big to broadcast but a few keys are
    * hot enough to melt a single reducer.
    *
    * `saltCols` picks what the deterministic salt hashes — pass
    * high-cardinality columns that VARY WITHIN the hot key (an event id,
    * a timestamp). The default hashes every left column, which spreads
    * nothing when a hot key's rows are full duplicates (a common skew
    * worst case: identical rows hash to one salt value and still land on
    * one task) — callers with duplicate-heavy skew must supply a
    * distinguishing column, or dedup/pre-count first. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int = 16, saltCols: Seq[Column] = Nil): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltSrc =
      if (saltCols.nonEmpty) saltCols.toIndexedSeq
      else left.columns.map(col).toIndexedSeq
    val l = left.withColumn("__salt", salt(buckets, saltSrc: _*))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Two-level skew-safe aggregation for NON-algebraic aggregates (e.g.
    * collect_list/collect_set shapes) where Spark's partial aggregation
    * cannot pre-combine: first aggregate per (key, salt), then merge the
    * per-salt partials per key. `partial` and `merge` express the two
    * levels; for algebraic aggregates (sum/count/min/max) plain groupBy
    * already does this map-side — don't salt those. */
  def saltedAggregate(df: DataFrame, key: String, buckets: Int,
      partial: Seq[Column], merge: Seq[Column], saltCols: Seq[Column]): DataFrame =
    df.withColumn("__salt", salt(buckets, saltCols: _*))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
}
