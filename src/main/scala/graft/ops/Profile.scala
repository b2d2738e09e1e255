package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling — the ANALYZE-TABLE shape a pipeline runs before
  * trusting a new drop: per column, the null count, exact distinct
  * count, and canonical min/max, in ONE scan.
  *
  * All per-column counters ride a single wide aggregate (null/min/max
  * are plain algebraic expressions; the exact DISTINCT counts share
  * the scan via Spark's expand — at 100 TB swap them for
  * `approx_count_distinct`, the same trade `q_approx_distinct`
  * gates). The wide row unpivots to long format via one `map` +
  * `explode` projection, the Checks.report discipline.
  *
  * Min/max are emitted in CANONICAL STRING form chosen per type so two
  * engines can never disagree on formatting: integers and strings
  * verbatim, doubles as milli-quantized integers, timestamps as epoch
  * µs — never a float/date rendered to text (`q_profile`). */
object Profile {

  /** canonical string encoding of a column for min/max comparison */
  private def canon(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      c.cast("long").cast("string")
    case FloatType | DoubleType | _: DecimalType =>
      floor(c.cast("double") * 1000).cast("long").cast("string")
    case TimestampType | TimestampNTZType =>
      unix_micros(c.cast("timestamp")).cast("string")
    case DateType => unix_date(c).cast("long").cast("string") // epoch days
    case StringType => c
    case BooleanType => c.cast("int").cast("string")
    case other => throw new IllegalArgumentException(
      s"unprofilable column type $other")
  }

  private def profilable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | _: DecimalType | TimestampType | TimestampNTZType |
         DateType | StringType | BooleanType => true
    case _ => false
  }

  /** One row per column: (column, n_null, n_distinct, min_canon,
    * max_canon); min/max are null for all-null columns. Default (no
    * `cols`): all PROFILABLE columns — arrays/structs/binary are
    * silently skipped so `-profile` works on any namespace; naming an
    * unprofilable column explicitly fails, naming the column.
    *
    * `approxRsd` switches the distinct counts to HLL++ sketches at the
    * given relative standard deviation — the 100 TB path: the exact
    * counts share one scan via Spark's EXPAND (k profiled columns ⇒ a
    * k-fold row multiplication into the shuffle), while sketches keep
    * the scan single-row with constant-size mergeable state per column.
    * `q_profile_approx` gates the estimate against the exact count the
    * same way `q_approx_distinct` does. */
  def report(df: DataFrame, cols: Seq[String] = Nil,
      approxRsd: Option[Double] = None): DataFrame = {
    cols.foreach { n =>
      val dt = df.schema(n).dataType
      require(profilable(dt),
        s"column '$n' of type $dt is not profilable; omit it " +
          "(the default profiles every profilable column)")
    }
    val names = if (cols.nonEmpty) cols
      else df.columns.toSeq.filter(n => profilable(df.schema(n).dataType))
    require(names.nonEmpty, "nothing to profile")
    // SCALE-GATED parallelism floor (guide §2.5): the k-column exact
    // profile multiplies every row k-fold through Spark's EXPAND before
    // the partial aggregate, so per-partition work is k× the scan's —
    // but the scan's partition count comes from input bytes /
    // maxPartitionBytes, which strands a SMALL input (one row-group ⇒
    // one partition) on a handful of cores while the rest idle. Fan out
    // to the session's parallelism ONLY when the input is measured
    // smaller than one scan split per core (driver-side stats from the
    // file listing — no job): a 100 TB scan already fills every core
    // and must never pay this exchange, which is why the gate is on
    // measured bytes, not a constant.
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val smallInput = df.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(cores) * df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val src = if (smallInput) df.repartition(cores) else df
    val aggs = names.flatMap { n =>
      val dt = df.schema(n).dataType
      // min/max on the NATIVE type (string-min would be lexicographic
      // for numbers), canonicalized after
      val nd = approxRsd match {
        case Some(r) => approx_count_distinct(col(n), r)
        case None => countDistinct(col(n))
      }
      Seq(sum(col(n).isNull.cast("long")).as(s"__null_$n"),
        nd.as(s"__nd_$n"),
        canon(min(col(n)), dt).as(s"__mn_$n"),
        canon(max(col(n)), dt).as(s"__mx_$n"))
    }
    val wide = src.agg(aggs.head, aggs.tail: _*)
    val entries = names.flatMap(n => Seq(lit(n),
      struct(coalesce(col(s"__null_$n"), lit(0L)).as("n_null"),
        col(s"__nd_$n").as("n_distinct"),
        col(s"__mn_$n").as("min_canon"), col(s"__mx_$n").as("max_canon"))))
    wide.select(explode(map(entries: _*)).as(Seq("column", "v")))
      .select(col("column"), col("v.n_null").as("n_null"),
        col("v.n_distinct").as("n_distinct"),
        col("v.min_canon").as("min_canon"), col("v.max_canon").as("max_canon"))
  }

  /** Snapshot profile drift — the data-contract monitor: profile two
    * snapshots of "the same" table ([[report]], one scan each) and
    * join the per-column reports to surface schema changes (columns
    * added/removed) and stat drift (null counts, distinct counts,
    * canonical bounds). The join is reports-sized (columns, not rows),
    * so the whole comparison costs two scans + driver-scale metadata —
    * run it on every drop before trusting the data.
    *
    * Output per column: presence ('both'/'added'/'removed' — relative
    * to `before`), both sides' null/distinct counts, and
    * `bounds_changed` (null-safe canonical min/max comparison; columns
    * present on one side only report bounds_changed = true). */
  def drift(before: DataFrame, after: DataFrame,
      cols: Seq[String] = Nil): DataFrame = {
    def side(df: DataFrame, tag: String) =
      report(df, cols).select(col("column"),
        col("n_null").as(s"n_null_$tag"),
        col("n_distinct").as(s"n_distinct_$tag"),
        col("min_canon").as(s"__mn_$tag"),
        col("max_canon").as(s"__mx_$tag"))
        .withColumn(s"__present_$tag", lit(true))
    side(before, "a").join(side(after, "b"), Seq("column"), "full_outer")
      .select(col("column"),
        when(col("__present_a").isNull, lit("added"))
          .when(col("__present_b").isNull, lit("removed"))
          .otherwise(lit("both")).as("presence"),
        col("n_null_a"), col("n_null_b"),
        col("n_distinct_a"), col("n_distinct_b"),
        (!(col("__mn_a") <=> col("__mn_b")) ||
          !(col("__mx_a") <=> col("__mx_b"))).as("bounds_changed"))
  }

  /** One-scan exact Pearson correlation MATRIX over integer-quantized
    * metrics — the column-correlation probe of dataset/feature search
    * (cf. "A Sketch-based Index for Correlated Dataset Search", ICDE
    * 2022: the sketch is the sub-scan approximation; this is the exact
    * anchor on quantized metrics). All k metrics' sums, k self
    * cross-products, and k·(k−1)/2 pairwise cross-products ride ONE
    * map-side-combined aggregate — one corpus scan regardless of pair
    * count; the pair rows then unfold from the single aggregate row
    * (driver-scale).
    *
    * Exactness: the sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy)
    * are exact integer sums. `r_ppm` derives from them through a FIXED
    * IEEE-754 expression tree — cast each integer to double first,
    * then the same multiplies/subtracts/sqrt/divide/floor in the same
    * order — so even the floored ppm coefficient is bit-identical in
    * any engine. Null handling is per-PAIR (a row missing either
    * metric leaves that pair's statistics untouched, matching SQL
    * `corr`). Callers quantize so Σx² stays in long range; under ANSI
    * the aggregate raises on overflow rather than wrap.
    *
    * Output: (x_name, y_name, n, sx, sy, sxx, syy, sxy, r_ppm), one
    * row per unordered metric pair (declaration order); `r_ppm` null
    * when a side is constant or n < 2. */
  def correlations(df: DataFrame, metrics: Seq[(String, Column)])
      : DataFrame = {
    require(metrics.size >= 2, "need at least two metrics")
    val q = df.select(metrics.zipWithIndex.map { case ((_, c), i) =>
      c.cast("long").as(s"__m$i") }: _*)
    val pairs = for {
      i <- metrics.indices; j <- metrics.indices if i < j
    } yield (i, j)
    def both(i: Int, j: Int): Column =
      col(s"__m$i").isNotNull && col(s"__m$j").isNotNull
    def s(i: Int, j: Int, e: Column) = sum(when(both(i, j), e))
    val aggs = pairs.flatMap { case (i, j) =>
      val (x, y) = (col(s"__m$i"), col(s"__m$j"))
      Seq(count(when(both(i, j), lit(1))).as(s"n_${i}_$j"),
        s(i, j, x).as(s"sx_${i}_$j"), s(i, j, y).as(s"sy_${i}_$j"),
        s(i, j, x * x).as(s"sxx_${i}_$j"), s(i, j, y * y).as(s"syy_${i}_$j"),
        s(i, j, x * y).as(s"sxy_${i}_$j"))
    }
    val wide = q.agg(aggs.head, aggs.tail: _*)
    // ONE aggregate row fans out to pair rows via a single explode —
    // a per-pair select-union would let column pruning specialize each
    // branch's aggregate and re-scan the corpus once per pair
    val pairStructs = pairs.map { case (i, j) =>
      def d(p: String) = col(s"${p}_${i}_$j").cast("double")
      val num = d("n") * d("sxy") - d("sx") * d("sy")
      val vx = d("n") * d("sxx") - d("sx") * d("sx")
      val vy = d("n") * d("syy") - d("sy") * d("sy")
      // floor over the IEEE tree can land ±1 ppm past a ±1 pole
      // (sqrt(a)·sqrt(b) ≠ ab exactly) — deterministic in any engine,
      // but clamp so the reported range stays [−10⁶, 10⁶]
      val rppm = greatest(lit(-1000000L), least(lit(1000000L),
        floor(lit(1000000.0) * num / (sqrt(vx) * sqrt(vy))).cast("long")))
      struct(lit(metrics(i)._1).as("x_name"), lit(metrics(j)._1).as("y_name"),
        col(s"n_${i}_$j").as("n"),
        coalesce(col(s"sx_${i}_$j"), lit(0L)).as("sx"),
        coalesce(col(s"sy_${i}_$j"), lit(0L)).as("sy"),
        coalesce(col(s"sxx_${i}_$j"), lit(0L)).as("sxx"),
        coalesce(col(s"syy_${i}_$j"), lit(0L)).as("syy"),
        coalesce(col(s"sxy_${i}_$j"), lit(0L)).as("sxy"),
        when(col(s"n_${i}_$j") > 1 && vx > 0 && vy > 0, rppm).as("r_ppm"))
    }
    wide.select(explode(array(pairStructs: _*)).as("__p")).select("__p.*")
  }
}
