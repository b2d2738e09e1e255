package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward temporal) join — the time-series primitive Spark has
  * no native operator for: for each probe row, attach the latest
  * reference row with the same key whose time is at-or-before the
  * probe's time.
  *
  * The naive expression is a non-equi join (`r.t <= p.t` + a per-probe
  * argmax) which Spark plans as a BroadcastNestedLoop / sort-merge range
  * join followed by a corpus-sized dedup — quadratic per key in the
  * worst case. Instead we UNION the two inputs, tag reference rows so
  * they sort before probes at equal timestamps (at-or-before = ties go
  * to the reference), and carry the reference payload forward with
  * `last(_, ignoreNulls = true)` over a running window per key:
  *
  *   1 shuffle (hash on `key`), 1 per-key sort, zero joins.
  *
  * Cost is `O(n log n)` per key and the plan shape is identical at any
  * scale; per-key volume bounds the window task, so keys must be finer
  * than "one global series" (for a single global series, range-partition
  * on time and stitch the last carried value across partition boundaries
  * — the `RangeSplitter` shape — before reaching for this helper).
  *
  * Reference rows must carry NO null payload values: a null payload is
  * indistinguishable from "no reference yet" to the ignore-nulls carry
  * (callers filter or coalesce first; `asofLast` asserts nothing and
  * documents the contract instead of scanning the data twice).
  *
  * Mirrors DuckDB's ASOF JOIN semantics (backward, >= match on equal
  * times); the oracle twin expresses the identical union+window in SQL.
  */
object AsofJoin {

  /** Left as-of join.
    *
    * @param probe    rows to enrich; all its columns survive
    * @param ref      reference series: `key`, `timeCol`, `payload` cols
    * @param key      equality key column (present in both inputs)
    * @param timeCol  totally-ordered time column (present in both);
    *                 integer µs recommended — engine-exact ordering
    * @param tieCol   deterministic tiebreak among reference rows that
    *                 share (key, time): the largest (time, tieCol) wins
    * @param payload  reference columns to attach; emitted as
    *                 `ref_<name>`, null when no reference precedes
    */
  def asofLast(probe: DataFrame, ref: DataFrame, key: String,
      timeCol: String, tieCol: String, payload: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toIndexedSeq
    // Align the two inputs on (key, t, tag, tie, payload..., probe-cols...).
    // Reference rows: tag 0, probe columns nulled; probe rows: tag 1,
    // payload nulled. Column positions (not names) drive unionByName here
    // via explicit select, so caller column order never matters.
    // a null-time reference would sort BEFORE every probe (nulls-first
    // ordering) and get carried into all of them — drop such rows so
    // the semantics match the non-equi formulation (null <= t is false)
    val refSide = ref.filter(col(timeCol).isNotNull).select(
      Seq(col(key), col(timeCol).as("__t"), lit(0).as("__tag"),
        col(tieCol).cast("long").as("__tie")) ++
        payload.map(c => col(c).as(s"ref_$c")) ++
        probeCols.filterNot(_ == key).map(c =>
          lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val probeSide = probe.select(
      Seq(col(key), col(timeCol).as("__t"), lit(1).as("__tag"),
        lit(0L).as("__tie")) ++
        payload.map(c => lit(null).cast(ref.schema(c).dataType).as(s"ref_$c")) ++
        probeCols.filterNot(_ == key).map(col): _*)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__tag"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = refSide.unionByName(probeSide)
      .select(Seq(col(key), col("__t"), col("__tag")) ++
        payload.map(c => last(col(s"ref_$c"), ignoreNulls = true).over(w)
          .as(s"ref_$c")) ++
        probeCols.filterNot(_ == key).map(col): _*)
    carried.filter(col("__tag") === 1)
      .select(probeCols.map(col) ++ payload.map(c => col(s"ref_$c")): _*)
  }

  /** Backward as-of join with a match-window tolerance: like
    * [[asofLast]], but a carried reference OLDER than `toleranceUs`
    * (probe time − reference time, in `timeCol` units) is nulled out —
    * the pandas `merge_asof(tolerance=...)` / "only attribute within
    * the last N hours" semantics. Implemented as the identical
    * single-exchange union+carry plan plus one narrow projection: the
    * reference time rides along as payload and gates every payload
    * column, so the tolerance adds NO extra shuffle, join, or window.
    * `timeCol` must be integer (µs recommended) — the gate is exact
    * integer subtraction, bit-identical in any engine. */
  def asofWithin(probe: DataFrame, ref: DataFrame, key: String,
      timeCol: String, tieCol: String, payload: Seq[String],
      toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, "tolerance must be non-negative")
    val withT = if (payload.contains(timeCol)) payload else payload :+ timeCol
    val joined = asofLast(probe, ref, key, timeCol, tieCol, withT)
    val refT = col(s"ref_$timeCol")
    val inTol = refT.isNotNull &&
      (col(timeCol) - refT <= lit(toleranceUs))
    val gated = joined.select(joined.columns.map { c =>
      if (withT.exists(p => s"ref_$p" == c)) when(inTol, col(c)).as(c)
      else col(c)
    }.toIndexedSeq: _*)
    if (payload.contains(timeCol)) gated else gated.drop(s"ref_$timeCol")
  }

  /** Forward as-of join: the EARLIEST reference at-or-after each probe
    * (ties at equal time still go to the reference; among refs sharing
    * (key, time), the SMALLEST `tieCol` wins). Implemented by running
    * [[asofLast]] over negated times — one extra narrow projection,
    * same single-exchange plan. `timeCol` must be a long. */
  def asofNext(probe: DataFrame, ref: DataFrame, key: String,
      timeCol: String, tieCol: String, payload: Seq[String]): DataFrame = {
    require(timeCol != tieCol,
      "tieCol must differ from timeCol (double negation would cancel)")
    val negP = probe.withColumn(timeCol, -col(timeCol))
    val negR = ref.withColumn(timeCol, -col(timeCol))
      .withColumn(tieCol, -col(tieCol))
    val out = asofLast(negP, negR, key, timeCol, tieCol, payload)
      .withColumn(timeCol, -col(timeCol))
    // un-negate any payload column that was negated on the way in
    // (ref_<tieCol> AND ref_<timeCol> — "what time was the matched ref"
    // is a common payload)
    Seq(tieCol, timeCol).filter(payload.contains)
      .foldLeft(out)((d, c) => d.withColumn(s"ref_$c", -col(s"ref_$c")))
  }
}
