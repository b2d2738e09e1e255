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
}
