package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention — the product-analytics staple: group users by
  * first-seen period ("cohort"), then count how many are active again
  * k periods later.
  *
  * Plan shape, all bounded:
  *   1. activity = distinct (user, period) — a map-side-combined
  *      aggregate over the raw events (the only event-sized exchange;
  *      output is |user|·|periods-active| sized, far smaller);
  *   2. cohort = min(period) per user — algebraic, rides the same
  *      key partitioning;
  *   3. one key join activity ⋈ cohort (both hash-partitioned on the
  *      user — no extra exchange on the activity side), then a
  *      groups-sized count per (cohort, k).
  *
  * No windows, no sorts, integer arithmetic only (`q_retention` pins
  * it). A celebrity user contributes one row per active period
  * regardless of event volume — event-count skew dies at step 1. */
object Cohort {

  /** @param events  raw events
    * @param user    user key column
    * @param timeUs  µs-since-epoch integer time column
    * @param periodUs  cohort granularity (default 1 day)
    *
    * Output: (cohort, k, n_users) — cohort = the user's first active
    * period index, k ≥ 0 periods after the cohort period, n_users =
    * distinct users of that cohort active at k. `k = 0` rows carry
    * each cohort's size. */
  def retention(events: DataFrame, user: Column, timeUs: Column,
      periodUs: Long = 86400000000L): DataFrame = {
    require(periodUs > 0, "periodUs must be positive")
    val activity = events
      .select(user.as("u"), timeUs.as("t_us"))
      // floor, not truncate: pre-1970 µs must bucket like DuckDB `//`
      .select(col("u"), graft.Tables.floorDiv("t_us", periodUs).as("p"))
      .distinct()
    val cohorts = activity.groupBy("u").agg(min(col("p")).as("cohort"))
    activity.join(cohorts, Seq("u"))
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("k"))
      .agg(count(lit(1)).as("n_users"))
  }
}
