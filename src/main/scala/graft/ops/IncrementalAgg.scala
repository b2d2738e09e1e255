package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the ETL refresh shape: keep a
  * materialized per-key aggregate STATE table and fold each delta
  * batch into it without touching the history.
  *
  * Works for any ALGEBRAIC aggregate (one whose partial states merge
  * associatively: count, sum, min, max, and anything built from them —
  * mean as (n, Σ), variance as (n, Σ, Σx²), top-k via TopKAgg's
  * buffer). The refresh is: aggregate the delta (delta-sized shuffle),
  * union with the state, merge per key — cost scales with |delta| +
  * |state|, never with the history that produced the state. A
  * non-algebraic aggregate (exact median, distinct count) cannot be
  * maintained this way — that's what the sketch surfaces
  * (q_approx_distinct/q_approx_quantile) are for.
  *
  * This is the batch twin of what Structured Streaming's stateful
  * aggregation does per micro-batch with its state store; expressing
  * it over a plain table makes the state resumable, inspectable, and
  * engine-portable (`q_incr_agg` pins state ∪ delta == full
  * recompute). */
object IncrementalAgg {

  /** Algebraic counter state: (n, sum, min, max) per key. */
  def state(rows: DataFrame, key: Column, value: Column): DataFrame =
    rows.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"),
        sum(value.cast("long")).as("s"),
        min(value.cast("long")).as("mn"),
        max(value.cast("long")).as("mx"))

  /** Fold a delta batch into an existing state table; both sides carry
    * the [[state]] schema after the delta is pre-aggregated. */
  def merge(stateDf: DataFrame, delta: DataFrame, key: Column,
      value: Column): DataFrame =
    stateDf.unionByName(state(delta, key, value))
      .groupBy("key")
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))
}
