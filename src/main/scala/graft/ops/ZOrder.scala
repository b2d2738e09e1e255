package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data layout.
  *
  * A 100 TB table range-partitioned on ONE column skips files only for
  * predicates on that column. Interleaving the bits of two (or more)
  * dimension columns into a single Morton code and range-partitioning on
  * it keeps rows that are close in EITHER dimension close on disk, so
  * parquet min/max zone maps prune files for predicates on any
  * interleaved dimension — the Delta/Databricks OPTIMIZE ZORDER layout,
  * built here from plain integer expressions (codegen'd, zero shuffle to
  * compute; one range exchange to lay out).
  *
  * All arithmetic is integer shift/mask, so the code — and the zone-map
  * statistics derived from it — is bit-identical in any engine;
  * `zvalueSql` emits the DuckDB twin expression for the oracle gate.
  */
object ZOrder {

  /** Morton code of two dimensions, `bits` bits each (max 31): bit `i`
    * of `x` lands at position `2i`, bit `i` of `y` at `2i+1`. Inputs are
    * masked to `bits` bits — callers quantize/clamp dimensions into
    * range first. The fold unrolls to a constant-folded chain of
    * shift/and/or that whole-stage codegen compiles into straight-line
    * long arithmetic. */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val xm = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ym = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(xm.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(ym.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Range-normalize an integer dimension into [0, 2^bits) before
    * interleaving: `floor((v − min) · 2^bits / range)`. Raw-value
    * interleave puts a narrow dimension's varying bits at the BOTTOM of
    * the code — a 4-value day column next to a 10-bit user column gets
    * zero zone-map pruning because every Z-run cycles all days
    * (measured: tools/PruneSweep). Normalization aligns each
    * dimension's variation to the TOP of its bit budget, which is what
    * production Z-order layouts interleave (range/rank ids, not raw
    * values). Exactness: numerator ≤ range · 2^bits must stay ≤ 2⁵²
    * so the double division is exact — enforced; pre-scale wider
    * dimensions (e.g. µs → days) before quantizing. */
  def quantize(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    require(maxV >= minV, "maxV must be >= minV")
    val range = maxV - minV + 1
    require(range <= (1L << (52 - bits)),
      s"dimension range $range too wide for exact $bits-bit quantization")
    val clamped = least(greatest(c.cast("long"), lit(minV)), lit(maxV))
    floor((clamped - lit(minV)) * lit(1L << bits) / lit(range)).cast("long")
  }

  /** The identical Morton code as ANSI SQL over column expressions
    * `x`/`y` — the DuckDB oracle twin of [[zvalue]]. */
  def zvalueSql(x: String, y: String, bits: Int): String = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { i =>
      Seq(s"(((($x) & $mask) & ${1L << i}) << $i)",
        s"(((($y) & $mask) & ${1L << i}) << ${i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }

  /** Lay a table out in Z-order: one range exchange on the Morton code
    * of the two dimensions, rows sorted by it within each output file.
    * This is the WRITE-side operator — correctness of the code itself is
    * oracle-gated via the zone statistics query (`q_zorder`), which
    * needs no nondeterministic partition ids. */
  def layout(df: DataFrame, x: Column, y: Column, bits: Int,
      partitions: Int): DataFrame = {
    val z = zvalue(x, y, bits)
    df.repartitionByRange(partitions, z).sortWithinPartitions(z)
  }

  /** Zone-map statistics over `zones` equal Z-prefix buckets: per zone,
    * the row count and min/max of each dimension — exactly the parquet
    * footer stats a reader would prune on. Tight per-zone min/max ranges
    * in BOTH dimensions are the measurable signature that the interleave
    * works (a single-dimension sort gives tight ranges in one dimension
    * and full-width ranges in the other). */
  def zoneStats(df: DataFrame, x: Column, y: Column, bits: Int,
      zoneShift: Int): DataFrame = {
    val z = zvalue(x, y, bits)
    df.select(shiftrightunsigned(z, zoneShift).as("zone"),
        x.cast("long").as("__x"), y.cast("long").as("__y"))
      .groupBy("zone")
      .agg(count(lit(1)).as("n_rows"),
        min("__x").as("x_min"), max("__x").as("x_max"),
        min("__y").as("y_min"), max("__y").as("y_max"))
  }
}
