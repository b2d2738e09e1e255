package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation funnel report — the data-card numbers (how many documents
  * each gate dropped, what reached each split) for the dedup → quality
  * → language → split pipeline, computed in ONE pass: every gate is
  * evaluated as an annotation column and a single aggregation folds the
  * whole funnel, instead of running the pipeline N times with a count
  * after each stage (N scans of a 100 TB corpus) or persisting
  * intermediates (a corpus-sized cache). Gates are evaluated
  * independently-but-cumulatively: a stage's count is docs passing its
  * gate AND every earlier one, matching what sequential filters would
  * leave.
  */
object Curation {

  /** One-row funnel: n_total, n_after_dedup, n_after_quality,
    * n_after_lang, and per-split counts of the survivors. Semantics
    * match [[graft.streaming.DocStream.curateStream]] /
    * `q_pipeline_corpus`: exact dedup keeps the min-id copy; quality
    * and language come from [[TextFunctions]]; splits from
    * [[Sampling.hashSplit]]'s bucket rule. */
  def funnel(df: DataFrame, idCol: String, text: Column, minQuality: Int = 3,
      langs: Seq[String] = Seq("en"), salt: String = "42",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val w = Window.partitionBy(md5(text)).orderBy(col(idCol))
    val b = Sampling.splitBucket(col(idCol), salt)
    val lo = trainPct * Sampling.Granularity / 100
    val hi = (trainPct + valPct) * Sampling.Granularity / 100
    val annotated = df.filter(text.isNotNull)
      .withColumn("__keep", row_number().over(w) === 1)
      .withColumn("__q", TextFunctions.qualityStatsCol(text))
      .withColumn("__l", TextFunctions.languageIdCol(text))
    def n(c: Column, alias: String) = sum(c.cast("long")).as(alias)
    val qok = col("__keep") && col("__q").getField("quality_score") >= minQuality
    val lok = qok && col("__l").getField("pred_lang").isin(langs: _*)
    annotated.agg(
      count(lit(1)).as("n_total"),
      n(col("__keep"), "n_after_dedup"),
      n(qok, "n_after_quality"),
      n(lok, "n_after_lang"),
      n(lok && b < lo, "n_train"),
      n(lok && b >= lo && b < hi, "n_val"),
      n(lok && b >= hi, "n_test"))
  }
}
