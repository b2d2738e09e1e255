package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with forward fill — turn an
  * irregular observation stream into the fixed-step series a
  * feature-store / charting / model-input pipeline wants ("the price
  * as of each midnight").
  *
  * Grid generation is per KEY and span-bounded: one groups-sized
  * min/max aggregate, then `sequence()` explodes each key's own
  * [⌊min/step⌋·step, max] range — a key contributes exactly
  * span/step+1 rows, so grid volume is Σ spans/step, never
  * keys × global-range. A key whose span/step exceeds `maxPoints`
  * fails LOUDLY up front (one metadata-sized aggregate checked before
  * any grid is built) rather than silently materializing a
  * billion-row grid — the `sampleByWeight` domain-guard discipline.
  *
  * The fill itself is [[AsofJoin.asofLast]] verbatim: grid points are
  * probes, observations are references, so the carry is the audited
  * single-exchange union+window plan — zero joins, and the grid
  * inherits as-of's exact tie semantics (a point ON a grid line fills
  * that line). Points before a key's first observation carry nulls.
  *
  * Output: one row per (key, grid time), `timeCol` = the grid line
  * (integer µs), payload columns as `ref_<name>`. */
object Resample {

  def forwardFill(df: DataFrame, key: String, timeCol: String,
      tieCol: String, payload: Seq[String], stepUs: Long,
      maxPoints: Long = 1000000L): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    val spans = df.filter(col(timeCol).isNotNull)
      .groupBy(key)
      .agg(min(col(timeCol)).as("__lo"), max(col(timeCol)).as("__hi"))
      // FLOOR division (DIV truncates toward zero — one step late for
      // negative, pre-1970 µs; DuckDB's // floors, so parity needs the
      // explicit correction), in exact integer arithmetic
      .withColumn("__start", expr(
        s"(__lo DIV $stepUs - (CASE WHEN __lo % $stepUs != 0 AND __lo < 0 " +
          s"THEN 1 ELSE 0 END)) * $stepUs"))
      // groups-sized, but consumed twice (guard collect + grid build):
      // eager localCheckpoint materializes it once and cuts the lineage,
      // so the input min/max scan runs exactly once per call
      .localCheckpoint()
    val worst = spans
      .agg(max(expr(s"(__hi - __start) DIV $stepUs + 1"))).collect()(0)
    require(worst.isNullAt(0) || worst.getLong(0) <= maxPoints,
      s"a key's span needs ${worst.get(0)} grid points (> $maxPoints); " +
        "widen stepUs or raise maxPoints")
    val grid = spans.select(col(key),
      explode(sequence(col("__start"), col("__hi"), lit(stepUs)))
        .as(timeCol))
    AsofJoin.asofLast(grid, df, key, timeCol, tieCol, payload)
  }
}
