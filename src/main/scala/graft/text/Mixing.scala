package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixing — budget-constrained per-stratum selection: "give me
  * the highest-quality documents of each language/domain until that
  * stratum's token budget is spent". The step that turns a curated pool
  * into a training MIX with chosen domain weights.
  *
  * The naive formulation sorts each stratum by quality and takes a
  * cumulative-token prefix — a per-stratum global window, i.e. ONE
  * reducer sorting a language's whole corpus at 100 TB. This operator
  * never builds that window. Instead:
  *
  *  1. a (stratum, quality-level) token HISTOGRAM — one map-side-
  *     combined aggregate, output is strata × score-levels rows (tiny);
  *  2. the admission rule per level from a prefix sum over that tiny
  *     frame: levels strictly above the cut admit fully, the boundary
  *     level admits a HASH-BUCKET fraction sized to the remaining
  *     budget (integer arithmetic, engine-exact);
  *  3. one broadcast join of the per-level rule back onto the corpus —
  *     a narrow filter, no corpus shuffle, no sort anywhere.
  *
  * The trade: the budget is met to bucket resolution (±1/10000 of the
  * boundary level's tokens) rather than to the document — the same
  * quantization [[Sampling.hashSplit]] accepts, and deterministic:
  * membership is a pure function of (corpus, budgets, salt).
  * Documents with NULL quality are excluded (they cannot be ranked);
  * strata without a budget entry are excluded entirely.
  *
  * `quality` must be a BOUNDED DISCRETE level (e.g. the 0–4
  * quality_score): the histogram — and the broadcast admission rule —
  * is strata × levels sized. Bucket a continuous score first. */
object Mixing {

  /** Select per-stratum under token budgets. Output columns: (idCol,
    * stratum, n_tokens, quality). `budgets` maps stratum → token
    * budget. `stagingDir` switches the corpus-sized annotated
    * intermediate from `persist()` to a parquet staging write — the
    * production shape at 100 TB ([[graft.util.Staging]]). */
  def budgetSelect(df: DataFrame, idCol: String, stratum: Column,
      nTokens: Column, quality: Column, budgets: Seq[(String, Long)],
      salt: String = "mix", stagingDir: Option[String] = None): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_._2 >= 0),
      "budgets must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val g = Sampling.Granularity
    // ann feeds TWO subtrees (the histogram and the final filter) —
    // materialize so upstream quality scoring runs once, release on
    // return (the materialize-then-release contract; staged = parquet)
    val (ann, release) = graft.util.Staging.stage(
      df.filter(quality.isNotNull)
        .select(col(idCol), stratum.as("stratum"), nTokens.as("n_tokens"),
          quality.as("quality"),
          Sampling.splitBucket(col(idCol), salt).as("__b")),
      stagingDir, "mix_ann")
    try {
      val bdf = budgets.toDF("stratum", "__budget")
      val hist = ann.groupBy("stratum", "quality")
        .agg(sum(col("n_tokens")).as("__t"))
      val wAbove = Window.partitionBy("stratum").orderBy(col("quality").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val rule = hist
        .withColumn("__above", coalesce(sum(col("__t")).over(wAbove), lit(0L)))
        .join(bdf, Seq("stratum"))
        .withColumn("__frac",
          when(col("__above") >= col("__budget"), lit(0L))
            .when(col("__above") + col("__t") <= col("__budget"), lit(g.toLong))
            // boundary level: integer bucket fraction of the remaining
            // budget — exact in any engine (no float division)
            .otherwise(expr(s"CAST(((__budget - __above) * $g) DIV __t AS BIGINT)")))
        .select(col("stratum"), col("quality"), col("__frac"))
      ann.join(broadcast(rule), Seq("stratum", "quality"))
        .filter(col("__b") < col("__frac"))
        .select(col(idCol), col("stratum"), col("n_tokens"), col("quality"))
        .localCheckpoint(true)
    } finally { release() }
  }

  /** Temperature-scaled stratum sampling — the multilingual/domain
    * REBALANCING step (the "T = 2 sampling" of multilingual training
    * mixes): sample each stratum with probability proportional to
    * `(n_d / N)^α` with α = 1/2, so high-resource domains are damped
    * and low-resource domains keep proportionally more of their
    * documents. Downsampling only — a stratum whose damped target
    * exceeds its size keeps all its documents once (upsampling =
    * repeating docs is an epoch-schedule concern, not a selection one).
    *
    * Engine-exactness: α is FIXED at 1/2 because IEEE-754 requires
    * division, multiplication, and `sqrt` to be exactly rounded — so
    * `floor(10⁶·sqrt(n_d/N))` is bit-identical on the JVM and in any
    * IEEE SQL engine (no libm involved; `pow(x, α)` for general α
    * would carry the same ulp caveat as the milli-nat `ln`
    * quantization). Everything after that weight is integer
    * arithmetic in DECIMAL(38,0): per-stratum document targets
    * `⌊T·w_d / ΣW⌋` and hash-bucket admission thresholds
    * `min(G, ⌊target·G / n_d⌋)` — membership is a pure function of
    * (corpus keys, targetTotal, salt), deterministic across engines,
    * retries, and partitionings.
    *
    * Plan shape at 100 TB: ONE map-side-combined stratum count
    * (strata-sized output), two 1-row broadcast cross joins for the
    * totals (N, ΣW), one broadcast of the strata-sized rule back onto
    * the corpus, and the narrow md5-bucket filter — the corpus itself
    * never shuffles and nothing is ever sorted. */
  def temperatureSample(df: DataFrame, idCol: String, stratum: Column,
      targetTotal: Long, salt: String = "temp"): DataFrame = {
    require(targetTotal > 0, "targetTotal must be positive")
    val g = Sampling.Granularity
    val ann = df.select(col(idCol), stratum.as("stratum"),
      Sampling.splitBucket(col(idCol), salt).as("__b"))
    val counts = ann.groupBy("stratum").agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("__N"))
    // exactly-rounded IEEE chain: (÷, sqrt, ×, floor) — see scaladoc
    val weighted = counts.crossJoin(broadcast(tot))
      .withColumn("weight_ppm",
        floor(lit(1000000.0) * sqrt(col("n_docs").cast("double") / col("__N")))
          .cast("long"))
    val wsum = weighted.agg(sum(col("weight_ppm")).as("__W"))
    val rule = weighted.crossJoin(broadcast(wsum))
      .withColumn("target_docs", expr(
        s"CAST((CAST($targetTotal AS DECIMAL(38,0)) * weight_ppm) DIV __W AS BIGINT)"))
      .withColumn("__frac", least(lit(g.toLong), expr(
        s"CAST((CAST(target_docs AS DECIMAL(38,0)) * $g) DIV n_docs AS BIGINT)")))
      .select(col("stratum"), col("n_docs"), col("weight_ppm"),
        col("target_docs"), col("__frac"))
    ann.join(broadcast(rule), Seq("stratum"))
      .filter(col("__b") < col("__frac"))
      .select(col(idCol), col("stratum"), col("n_docs"), col("weight_ppm"),
        col("target_docs"))
  }
}
