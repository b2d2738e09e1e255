package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact quantiles over an integer-valued column WITHOUT a global sort
  * — the scale path for "p50/p90/p99 of document length" style
  * profiling. Spark's `percentile` aggregate buffers and sorts every
  * value in one reducer (exact but corpus-sized); `approx_percentile`
  * bounds memory but answers with t-digest error. When the metric is
  * integer-valued with bounded cardinality (token counts, byte sizes,
  * line counts — anything whose DISTINCT values number ≪ rows), the
  * histogram route is exact AND bounded: one map-side-combined
  * groupBy(value) histogram, a cumulative sum over the histogram (a
  * window over distinct VALUES, never rows — the single-reducer stage
  * is histogram-sized by construction), and a broadcast probe of the
  * quantile targets against the cumulative counts.
  *
  * Interpolation is the standard type-7 rule (`quantile_cont` /
  * Spark `percentile`): rank position `h = (n−1)·q/1000` splits into
  * `idx = ⌊h⌋` and a milli-fraction `rem`, and the answer is
  * `v_lo + (v_hi − v_lo)·rem/1000` — returned as exact integer
  * MILLI-UNITS (`1000·v_lo + (v_hi−v_lo)·rem`), so the result is pure
  * integer arithmetic end-to-end: any engine computes the identical
  * table bit-for-bit ((n−1)·q_mille stays exact below ~9·10¹⁵ rows).
  */
object Quantiles {

  /** Exact type-7 quantiles of `value` (cast to long) at the requested
    * per-mille ranks. NULL values are excluded (the `percentile`
    * convention). Output: (q_mille, n_rows, v_lo, v_hi, value_milli),
    * one row per requested rank; empty input → empty output. */
  def exactQuantiles(df: DataFrame, value: Column,
      qMille: Seq[Int]): DataFrame = {
    require(qMille.nonEmpty && qMille.forall(q => q >= 0 && q <= 1000),
      "ranks must be per-mille in [0, 1000]")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(value.cast("long").as("v")).filter(col("v").isNotNull)
    val hist = vals.groupBy("v").agg(count(lit(1)).as("cnt"))
    // the ONLY unpartitioned window in the plan runs over the histogram
    // — distinct values, not rows; bounded by the metric's cardinality
    val cum = hist.withColumn("cum", sum(col("cnt")).over(
      Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    val targets = qMille.distinct.sorted.toDF("q_mille")
      .crossJoin(broadcast(vals.agg(count(lit(1)).as("n"))))
      .withColumn("idx", expr("(n - 1) * q_mille DIV 1000"))
      .withColumn("rem", expr("(n - 1) * q_mille % 1000"))
      .withColumn("idx2", least(expr("(n - 1) * q_mille DIV 1000 + 1"),
        col("n") - 1))
    // broadcast the (tiny) target list against the histogram: v_lo is
    // the first value whose cumulative count passes idx, v_hi the first
    // past idx2 — both fall out of ONE conditional min aggregate
    cum.join(broadcast(targets), col("cum") > col("idx"))
      .groupBy("q_mille", "n", "rem", "idx2")
      .agg(min(col("v")).as("v_lo"),
        min(when(col("cum") > col("idx2"), col("v"))).as("__v_hi"))
      .select(col("q_mille"), col("n").as("n_rows"), col("v_lo"),
        coalesce(col("__v_hi"), col("v_lo")).as("v_hi"))
      .withColumn("value_milli",
        expr("1000 * v_lo + (v_hi - v_lo) * ((n_rows - 1) * q_mille % 1000)"))
  }

  /** Annotate every row with its EXACT percentile rank of `value` —
    * the "normalize quality scores to a corpus percentile before
    * thresholding/mixing" primitive — without the global row sort that
    * `percent_rank() OVER (ORDER BY v)` plans (one reducer holding
    * every row). The histogram route: one map-side-combined
    * groupBy(value) count, a cumulative sum over distinct VALUES (the
    * only unpartitioned window is histogram-sized), then an equi-join
    * back on the value to annotate rows. Ranks come back as exact
    * integers — `rank_lt` (rows strictly below, i.e. SQL `rank() - 1`,
    * ties share it) and `n_rows` — plus `pr_ppm`, the SQL
    * `percent_rank` floored to parts-per-million via pure integer
    * division (exact below ~9·10⁹ rows at ppm scale; any engine
    * computes the identical integers). NULL values pass through with
    * null ranks and do not count toward `n_rows`. */
  def percentileRanks(df: DataFrame, value: Column,
      out: String = "pr_ppm"): DataFrame = {
    val tagged = df.withColumn("__v", value.cast("long"))
    val vals = tagged.filter(col("__v").isNotNull).select("__v")
    val hist = vals.groupBy("__v").agg(count(lit(1)).as("__cnt"))
    val cum = hist
      .withColumn("__cum", sum(col("__cnt")).over(
        Window.orderBy("__v").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("rank_lt", col("__cum") - col("__cnt"))
      .select("__v", "rank_lt")
    val n = broadcast(vals.agg(count(lit(1)).as("n_rows")))
    tagged.join(cum, Seq("__v"), "left").crossJoin(n)
      .withColumn(out, when(col("rank_lt").isNotNull,
        expr("CASE WHEN n_rows > 1 THEN rank_lt * 1000000 DIV (n_rows - 1) " +
          "ELSE 0 END")))
      .drop("__v")
  }

  /** Grouped variant of [[percentileRanks]] — each row's exact
    * percentile rank WITHIN its group (per-language quality
    * normalization before a cross-language mixing gate). Identical
    * histogram algebra with every window/aggregate partitioned by the
    * group; the per-group totals table is groups-sized and joins back
    * on the group key. */
  def percentileRanksBy(df: DataFrame, groupCol: String, value: Column,
      out: String = "pr_ppm"): DataFrame = {
    val tagged = df.withColumn("__v", value.cast("long"))
    val vals = tagged.filter(col("__v").isNotNull)
      .select(col(groupCol).as("__g"), col("__v"))
    val hist = vals.groupBy("__g", "__v").agg(count(lit(1)).as("__cnt"))
    val cum = hist
      .withColumn("__cum", sum(col("__cnt")).over(
        Window.partitionBy("__g").orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rank_lt", col("__cum") - col("__cnt"))
      .select(col("__g"), col("__v"), col("rank_lt"))
    val n = vals.groupBy("__g").agg(count(lit(1)).as("n_group"))
      .withColumnRenamed("__g", "__ng")
    // both joins null-safe: a NULL group key is a real partition
    val keyed = cum.join(n, col("__g") <=> col("__ng")).drop("__ng")
      .withColumnRenamed("__g", "__jg").withColumnRenamed("__v", "__jv")
    // null-safe on the group key: a NULL group is a real partition (SQL
    // percent_rank ranks it; the DuckDB twin PARTITIONs it) — a plain
    // === would leave its rows rankless (Sampling.rankedManifest
    // precedent)
    tagged.join(keyed,
        col(groupCol) <=> col("__jg") && col("__v") === col("__jv"), "left")
      .drop("__jg", "__jv")
      .withColumn(out, when(col("rank_lt").isNotNull,
        expr("CASE WHEN n_group > 1 THEN rank_lt * 1000000 DIV (n_group - 1) " +
          "ELSE 0 END")))
      .drop("__v")
  }

  /** Grouped variant of [[exactQuantiles]] — the 100 TB shape for
    * "p50/p90 per language" style profiling. Identical algebra, with
    * every window PARTITIONED BY the group: the per-(group, value)
    * histogram is map-side combined, the cumulative sum runs over each
    * group's distinct values (never its rows), and the rank targets —
    * one tiny per-group (n, rank) table — come back via an equi-join on
    * the group key. No stage anywhere holds a group's raw rows in one
    * buffer, which is exactly what `percentile(...) GROUP BY g` does
    * (per-group sort aggregate; `q_group_quantiles` keeps that as the
    * documented exact anchor, cross-referencing this route).
    *
    * Output: (<group>, q_mille, n_rows, v_lo, v_hi, value_milli), one
    * row per (group, rank); groups with only null values are absent. */
  def exactQuantilesBy(df: DataFrame, groupCol: String, value: Column,
      qMille: Seq[Int]): DataFrame = {
    require(qMille.nonEmpty && qMille.forall(q => q >= 0 && q <= 1000),
      "ranks must be per-mille in [0, 1000]")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(groupCol).as("__g"),
        value.cast("long").as("v"))
      .filter(col("v").isNotNull)
    val hist = vals.groupBy("__g", "v").agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum", sum(col("cnt")).over(
      Window.partitionBy("__g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ranks = broadcast(qMille.distinct.sorted.toDF("q_mille"))
    val targets = vals.groupBy("__g").agg(count(lit(1)).as("n"))
      .crossJoin(ranks)
      .withColumn("idx", expr("(n - 1) * q_mille DIV 1000"))
      .withColumn("idx2", least(expr("(n - 1) * q_mille DIV 1000 + 1"),
        col("n") - 1))
      .withColumnRenamed("__g", "__tg")
    cum.join(targets,
        col("__g") === col("__tg") && col("cum") > col("idx"))
      .groupBy("__g", "q_mille", "n", "idx2")
      .agg(min(col("v")).as("v_lo"),
        min(when(col("cum") > col("idx2"), col("v"))).as("__v_hi"))
      .select(col("__g").as(groupCol), col("q_mille"),
        col("n").as("n_rows"), col("v_lo"),
        coalesce(col("__v_hi"), col("v_lo")).as("v_hi"))
      .withColumn("value_milli",
        expr("1000 * v_lo + (v_hi - v_lo) * ((n_rows - 1) * q_mille % 1000)"))
  }
}
