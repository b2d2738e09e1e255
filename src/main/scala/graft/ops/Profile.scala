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
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = names.flatMap(n => Seq(lit(n),
      struct(coalesce(col(s"__null_$n"), lit(0L)).as("n_null"),
        col(s"__nd_$n").as("n_distinct"),
        col(s"__mn_$n").as("min_canon"), col(s"__mx_$n").as("max_canon"))))
    wide.select(explode(map(entries: _*)).as(Seq("column", "v")))
      .select(col("column"), col("v.n_null").as("n_null"),
        col("v.n_distinct").as("n_distinct"),
        col("v.min_canon").as("min_canon"), col("v.max_canon").as("max_canon"))
  }
}
