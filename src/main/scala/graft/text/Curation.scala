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

  /** The Gopher stop-word list — rule 7 requires at least two of these
    * to appear as standalone (word-boundary) tokens. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality rules (the MassiveText repetition-free
    * heuristics) as ONE narrow projection — the doc-LEVEL sibling of
    * the C4 line gate ([[Lines.lineFilterCol]]): where C4 keeps/drops
    * individual lines, Gopher keeps/drops whole documents on
    * shape statistics. The seven rules:
    *
    *  1. word count within [minWords, maxWords]
    *  2. mean word length within [3, 10] characters
    *  3. symbol-to-word ratio (`#` or ellipsis) below 1/10
    *  4. under 90% of non-blank lines start with a bullet
    *  5. under 30% of non-blank lines end with an ellipsis
    *  6. over 80% of words contain at least one alphabetic character
    *  7. at least two distinct [[GopherStops]] words present
    *
    * Every ratio test is cross-multiplied into INTEGER comparisons
    * (mean-word-length ∈ [3,10] ⇔ `3·words ≤ chars ≤ 10·words`) — no
    * float division anywhere, so any engine computes the identical
    * gate. All counters come from array/regex expressions inside one
    * codegen'd projection: no shuffle, no explode — the 100 TB plan is
    * a scan. A doc with no non-blank line fails rules 4-5 by
    * convention (it has already failed rule 1).
    *
    * Output: the counters, `n_rules_passed`, and `keep` (1 iff all
    * seven), every column a long. */
  def gopherGate(df: DataFrame, idCol: String, text: Column,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val toks = TextFunctions.whitespaceTokens(text)
    val nWords = size(toks).cast("long")
    // sum of token lengths = non-whitespace chars — no per-token loop
    val nWordChars = length(regexp_replace(text, """\s""", "")).cast("long")
    val nAlphaWords =
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val nSymbols =
      (size(regexp_extract_all(text, lit("#"), lit(0))) +
        size(regexp_extract_all(text, lit("""\.\.\.|…"""), lit(0)))).cast("long")
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines,
      l => substring(l, 1, 1).isin("•", "-", "*"))).cast("long")
    val nEllEnd = size(filter(lines,
      l => l.endsWith("...") || l.endsWith("…"))).cast("long")
    val nStops = GopherStops
      .map(w => lower(text).rlike("\\b" + w + "\\b").cast("long"))
      .reduce(_ + _)
    val rules = Seq(
      col("n_words") >= minWords && col("n_words") <= maxWords,
      lit(3) * col("n_words") <= col("n_word_chars") &&
        col("n_word_chars") <= lit(10) * col("n_words"),
      lit(10) * col("n_symbols") < col("n_words"),
      lit(10) * col("n_bullet") < lit(9) * col("n_lines"),
      lit(10) * col("n_ellipsis_end") < lit(3) * col("n_lines"),
      lit(5) * col("n_alpha_words") > lit(4) * col("n_words"),
      col("n_stop_hits") >= 2)
    df.filter(text.isNotNull)
      .select(col(idCol), nWords.as("n_words"),
        nWordChars.as("n_word_chars"), nAlphaWords.as("n_alpha_words"),
        nSymbols.as("n_symbols"), nLines.as("n_lines"),
        nBullet.as("n_bullet"), nEllEnd.as("n_ellipsis_end"),
        nStops.as("n_stop_hits"))
      .withColumn("n_rules_passed",
        rules.map(_.cast("long")).reduce(_ + _))
      .withColumn("keep", rules.reduce(_ && _).cast("long"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): split each
    * language's documents into head / middle / tail terciles of
    * language-model surprisal — the standard "keep the head, sample
    * the middle, drop the tail" pretraining gate. The LM here is the
    * repo's unigram surprisal ([[TextFunctions.unigramSurprisal]],
    * integer milli-nats); swap in the frozen/bigram variants for a
    * stronger model, the bucketing algebra is identical.
    *
    * Exactness: the per-doc score is integer milli-nats PER TOKEN
    * (`total_mnats DIV n_tokens` — integer division, engine-exact),
    * tercile cuts come from the grouped histogram quantile route
    * ([[graft.ops.Quantiles.exactQuantilesBy]] at 333/667 per mille —
    * per-(lang, value) histogram, distinct-value windows, NEVER a
    * per-language row sort), and the label rule compares integers
    * (`mnpt·1000 ≤ cut_milli`), so any engine assigns every document
    * the identical bucket. The cut table is languages-sized and
    * broadcasts back — one narrow join, no second corpus pass. */
  def perplexityBuckets(df: DataFrame, idCol: String, text: Column,
      langCol: Column, stagingDir: Option[String] = None): DataFrame = {
    val scored = TextFunctions.unigramSurprisal(df, idCol, text, stagingDir)
      .select(col(idCol), expr("total_mnats DIV n_tokens").as("mnpt"))
    val withLang = df.select(col(idCol), langCol.as("lang"))
      .join(scored, Seq(idCol))
    val cuts = graft.ops.Quantiles.exactQuantilesBy(withLang, "lang",
      col("mnpt"), Seq(333, 667))
    val cutsWide = cuts.groupBy("lang").agg(
      min(when(col("q_mille") === 333, col("value_milli"))).as("__c333"),
      min(when(col("q_mille") === 667, col("value_milli"))).as("__c667"))
    withLang.join(broadcast(cutsWide), Seq("lang"))
      .withColumn("bucket",
        when(col("mnpt") * 1000 <= col("__c333"), lit("head"))
          .when(col("mnpt") * 1000 <= col("__c667"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col("lang"), col("mnpt"), col("bucket"))
  }
}
