package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-ingest document deduplication — the live-feed shape of the
  * LLM-pipeline dedup operators (`graft.text.Dedup` is their batch
  * form): a training-data pipeline that tails a crawl/ingest feed wants
  * duplicates dropped ON ARRIVAL, before they cost downstream tokenize/
  * embed/train work, not in a nightly batch sweep.
  *
  * Both gates keep the FIRST arrival of a key and drop later ones via
  * `dropDuplicatesWithinWatermark`, so per-key state EXPIRES once the
  * event-time watermark passes it — state is bounded by the duplicate
  * horizon (how far apart in event time a dup may arrive), not by
  * corpus size, which is what makes the operator runnable forever
  * against an unbounded feed. A duplicate arriving beyond the horizon
  * re-admits (documented recall trade; widen the watermark or run the
  * batch sweep to catch stragglers). In BATCH mode the same code
  * degenerates to an exact distinct-on-key — one code path, two
  * deployment shapes, mirroring `EventStream`'s stream==batch
  * discipline.
  */
object DocStream {

  /** Content identity for the exact gate: md5 of the raw text. */
  def contentKey(text: Column): Column = md5(text)

  /** Keyed first-wins dedup: watermark-expiring state in streaming,
    * plain distinct-on-key in batch (Spark forbids
    * `dropDuplicatesWithinWatermark` on batch frames — batch needs no
    * state bound, so `dropDuplicates` IS its degenerate form). */
  private def firstWins(docs: DataFrame, keyCol: String, timeCol: String,
      watermark: String): DataFrame =
    if (docs.isStreaming)
      docs.withWatermark(timeCol, watermark)
        .dropDuplicatesWithinWatermark(keyCol)
    else docs.dropDuplicates(keyCol)

  /** Exact-duplicate gate: drop every doc whose `text` was already seen
    * within the watermark horizon. Narrow per-row hash + keyed state
    * lookup — no shuffle beyond the state-store exchange on the key. */
  def dedupExactStream(docs: DataFrame, text: Column, timeCol: String,
      watermark: String): DataFrame =
    firstWins(docs.withColumn("__ck", contentKey(text)), "__ck", timeCol, watermark)
      .drop("__ck")

  /** Near-duplicate gate: drop docs whose FULL minhash signature
    * (all `numHashes` minhashes over word-`shingleWords`-gram shingles
    * of the lowercased text) collides with an already-seen doc. Catches
    * reformatted/re-cased copies the exact gate misses; signature
    * equality is the strictest LSH band (r = numHashes, b = 1), so
    * precision is high and recall is the documented trade — the batch
    * `Dedup.lshCandidates` + `jaccardVerify` sweep remains the
    * completeness backstop. Signature computation is the same native
    * one-pass expression the batch path uses. */
  def dedupMinhashStream(docs: DataFrame, text: Column, timeCol: String,
      watermark: String, numHashes: Int = 16,
      shingleWords: Int = 3): DataFrame =
    firstWins(
      docs.withColumn("__mh",
          graft.text.Dedup.minhashCol(text, numHashes, shingleWords))
        // empty/short docs have no shingles → null signature; a null key
        // would collapse them all into one "duplicate" — pass them
        // through the gate keyed by their content hash instead
        .withColumn("__mk", coalesce(col("__mh").cast("string"), contentKey(text))),
      "__mk", timeCol, watermark)
      .drop("__mh", "__mk")

  /** The streaming curation chain — on-arrival form of the batch
    * `q_pipeline_corpus` composition: exact-dup gate → quality +
    * language filter → PII scrub → deterministic split assignment.
    * Everything after the gate is a stateless narrow projection, so the
    * ONLY streaming state is the dedup gate's watermark-bounded key
    * store; the split is a pure (key, salt) function, so a doc's
    * train/val/test membership is identical whether it arrived via this
    * stream or the batch sweep — the property that lets the two
    * deployment shapes share one corpus. Emits the input columns +
    * (n_tokens, quality_score, pred_lang, scrubbed, bucket, split) —
    * plus `text_kept` when the line gate is on.
    *
    * `lineGate = Some(minWords)` inserts the C4 per-line quality gate
    * ([[graft.text.Lines.lineFilterCol]]) after dedup: scoring, PII
    * scrub, and the emitted text then run on the line-FILTERED text.
    * It is a stateless narrow expression, so the streaming state story
    * is unchanged (the dedup gate remains the only state). Corpus-wide
    * line DEDUP, by contrast, is inherently a batch aggregate (the
    * winner of a line is a property of the whole corpus) — run
    * [[graft.text.Lines.lineDedup]] in the nightly sweep. */
  def curateStream(docs: DataFrame, idCol: String, text: Column,
      timeCol: String, watermark: String, minQuality: Int = 3,
      langs: Seq[String] = Seq("en"), salt: String = "42",
      weights: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      lineGate: Option[Int] = None): DataFrame = {
    import graft.text.{Lines, Pii, Sampling, TextFunctions}
    val deduped = dedupExactStream(docs, text, timeCol, watermark)
    val (gated, scoredText) = lineGate match {
      case Some(minWords) =>
        (deduped.withColumn("text_kept",
          Lines.lineFilterCol(text, minWords).getField("text_kept")),
          col("text_kept"))
      case None => (deduped, text)
    }
    val scored = gated
      .withColumn("__q", TextFunctions.qualityStatsCol(scoredText))
      .withColumn("__l", TextFunctions.languageIdCol(scoredText))
      .filter(col("__q").getField("quality_score") >= minQuality &&
        col("__l").getField("pred_lang").isin(langs: _*))
      .withColumn("n_tokens", col("__q").getField("n_tokens"))
      .withColumn("quality_score", col("__q").getField("quality_score"))
      .withColumn("pred_lang", col("__l").getField("pred_lang"))
      .withColumn("scrubbed", Pii.scrub(scoredText))
      .drop("__q", "__l")
    Sampling.hashSplit(scored, col(idCol), salt, weights)
  }
}
