package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned quality filtering — the classifier-based gate of an LLM data
  * pipeline (train a cheap linear scorer on a labeled reference split,
  * then score the whole corpus), as opposed to the pure-heuristic gates
  * in [[TextFunctions]] (`qualityStats`) and the Gopher/C4 rule sets.
  * The reference engine has no learned gate; this is the standard
  * fastText-style recipe (GPT-3/LLaMA-family "quality classifier")
  * re-expressed Spark-first. Labels come from ANY 0/1 column — human
  * ratings, an LLM judge, or a heuristic being distilled.
  *
  * Model: a bag-of-tokens linear scorer with integer per-mille weights.
  *  - `w(t) = ⌊1000·(n_good(t)+1) / (n_good(t)+n_bad(t)+2)⌋` — the
  *    add-one-smoothed probability that a training doc containing token
  *    `t` is labeled good;
  *  - `w0   = ⌊1000·(G+1) / (G+B+2)⌋` — the smoothed base rate; a token
  *    carrying no signal has `w(t) ≈ w0`, so contributions are CENTERED
  *    at the base rate (a fixed 500 pivot would bias every score by the
  *    class imbalance);
  *  - `score(d) = ⌊1000·Σ_t (w(t) − w0) / n_hits⌋` over the doc's
  *    DISTINCT vocabulary tokens — the MEAN centered contribution (the
  *    fastText shape: average over token features, not sum — a raw sum
  *    measures document length, not quality);
  *  - the decision threshold is TRAINED: the midpoint of the two class
  *    mean scores on the training split (integer arithmetic
  *    throughout).
  * Everything is integer doc-frequency arithmetic — no ln/sigmoid — so
  * the scorer is bit-exact in any engine (Spark `DIV` and DuckDB `//`
  * both truncate toward zero, verified for negative scores).
  *
  * Plan shape at 100 TB:
  *  - training stats: one explode over the TRAINING split only (a
  *    sample, not the corpus) → map-side-combined groupBy(token);
  *  - vocabulary: minDf-filtered then capped at `vocabSize` by
  *    (df desc, token) — a bounded table by construction (the cap sort
  *    runs over the post-filter token table, vocabulary-sized, not
  *    corpus-sized; at extreme token cardinality route it through
  *    [[Retrieval.saltedTopK]] with a constant group);
  *  - `w0` and the threshold are single-row training aggregates
  *    (index metadata, collected like [[graft.ml.Similarity.ivfCentroids]]);
  *  - scoring: explode corpus tokens → broadcast-hash-join against the
  *    ≤ vocabSize weight table → map-side-combined per-doc sum. No
  *    corpus-sized shuffle anywhere except the per-doc aggregate, which
  *    is keyed on the doc id (never one reducer).
  */
object QualityClassifier {

  /** Distinct lowercase alphabetic tokens of a document — the classifier
    * feature set. PRESENCE (not tf) per doc; `array_distinct` dedups
    * before the explode so the pair stream is bounded by vocabulary use,
    * not token count. */
  def featureTokens(text: Column): Column =
    array_distinct(regexp_extract_all(lower(text), lit("[a-z]+"), lit(0)))

  /** Per-token doc-frequency stats over a labeled training split:
    * (token, n_good, n_bad). `label` must be 0/1 (int). */
  def tokenStats(train: DataFrame, text: Column, label: Column): DataFrame =
    train.select(label.cast("long").as("__y"),
        explode(featureTokens(text)).as("token"))
      .groupBy("token")
      .agg(sum(col("__y")).as("n_good"),
        sum(lit(1L) - col("__y")).as("n_bad"))

  /** Bounded vocabulary with integer per-mille weights: tokens seen in
    * ≥ `minDf` training docs, capped at `vocabSize` by
    * (doc-frequency desc, token) — fully deterministic. Output:
    * (token, n_good, n_bad, w_permille). */
  def vocabulary(stats: DataFrame, minDf: Int, vocabSize: Int): DataFrame =
    stats.filter(col("n_good") + col("n_bad") >= minDf)
      .orderBy((col("n_good") + col("n_bad")).desc, col("token"))
      .limit(vocabSize)
      .withColumn("w_permille",
        expr("(1000 * (n_good + 1)) DIV (n_good + n_bad + 2)"))

  /** Smoothed base-rate pivot `w0` of a labeled training split — a
    * single-row aggregate collected as model metadata. */
  def baseRatePermille(train: DataFrame, label: Column): Long = {
    val r = train.agg(sum(label.cast("long")).as("g"), count(lit(1)).as("n"))
      .selectExpr("(1000 * (g + 1)) DIV (n + 2)").head()
    r.getLong(0)
  }

  /** Score documents against a (broadcastable) vocabulary: one row per
    * input doc — (idCol, n_hits, score) where `n_hits` counts distinct
    * vocabulary tokens present and `score` is the mean centered
    * contribution `⌊1000·Σ(w−w0)/n_hits⌋` (0 for docs with no hits). */
  def scoreDocs(df: DataFrame, idCol: String, text: Column,
      vocab: DataFrame, w0: Long): DataFrame = {
    val hits = df.select(col(idCol), explode(featureTokens(text)).as("token"))
      .join(broadcast(vocab.select("token", "w_permille")), Seq("token"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("__h"),
        sum(col("w_permille") - lit(w0)).as("__s"))
      .withColumn("__score", expr("(1000 * __s) DIV __h"))
    df.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__h"), lit(0L)).as("n_hits"),
        coalesce(col("__score"), lit(0L)).as("score"))
  }

  /** Trained decision threshold: the integer midpoint of the two class
    * mean scores on the training split (docs with no hits score 0, the
    * same convention as [[scoreDocs]]). Single-row aggregate, collected
    * as model metadata; both classes must appear in the split. */
  def trainedThreshold(trainScored: DataFrame, label: Column): Long = {
    val r = trainScored
      .select(label.cast("long").as("__y"), col("score"))
      .agg(sum(when(col("__y") === 1, col("score"))).as("sg"),
        sum(when(col("__y") === 1, 1L)).as("ng"),
        sum(when(col("__y") === 0, col("score"))).as("sb"),
        sum(when(col("__y") === 0, 1L)).as("nb"))
      .head()
    require(r.getLong(1) > 0 && r.getLong(3) > 0,
      "training split must contain both classes")
    val mg = r.getLong(0) / r.getLong(1) // JVM / truncates like DIV
    val mb = r.getLong(2) / r.getLong(3)
    (mg + mb) / 2
  }

  /** The full recipe in one call: learn the vocabulary, pivot, and
    * threshold on the labeled split, then score the whole corpus.
    * Output: (idCol, n_hits, score, pred_good). */
  def distill(corpus: DataFrame, idCol: String, text: Column,
      train: DataFrame, trainText: Column, label: Column,
      minDf: Int = 5, vocabSize: Int = 512): DataFrame = {
    val vocab = vocabulary(tokenStats(train, trainText, label), minDf, vocabSize)
    val w0 = baseRatePermille(train, label)
    val trainScored = scoreDocs(train, idCol, trainText, vocab, w0)
      .join(train.select(col(idCol), label.cast("long").as("__lbl")), Seq(idCol))
    val thr = trainedThreshold(trainScored, col("__lbl"))
    scoreDocs(corpus, idCol, text, vocab, w0)
      .withColumn("pred_good", (col("score") > thr).cast("int"))
  }
}
