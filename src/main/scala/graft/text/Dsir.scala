package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for data selection — score every raw
  * document by how much its hashed-n-gram profile looks like a TARGET
  * corpus relative to the raw pool (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling", arXiv:2302.03169).
  * The pretraining-mix use case: `target` is a small trusted corpus
  * (curated reference text), `raw` is the crawl; documents with high
  * scores are up-sampled into the mix. Selection itself composes with
  * the existing admission operators ([[Sampling]], [[Mixing]]) — this
  * operator produces the per-document log importance weight.
  *
  * Model: bag of HASHED features (unigrams + word bigrams, the paper's
  * feature set) over `buckets` hash buckets. Per-bucket Laplace-
  * smoothed log-ratio
  * `lr(b) = ln( ((ct_b+1)·(Q+B)) / ((cq_b+1)·(T+B)) )`
  * where `ct`/`cq` are target/raw bucket counts and `T`/`Q` their
  * totals; a document's log weight is `Σ_b n_b · lr(b)` over its own
  * bucket counts.
  *
  * Determinism discipline (the [[TextFunctions.unigramSurprisal]]
  * convention): each bucket's log-ratio is quantized to integer
  * MILLI-NATS before any per-document sum, so the aggregate is exact
  * integer arithmetic in any engine. Inside the ln the ratio is ONE
  * fixed IEEE expression (two exactly-rounded multiplies, one divide)
  * over factors that are exact doubles while counts stay < 2⁵³ —
  * ~9·10¹⁵ features, far past a 100 TB corpus. The bucket hash is the
  * [[Sampling]] idiom: first 8 md5 hex digits of `feat:salt`, mod
  * `buckets` — portable to any engine as
  * `CAST(('0x' || substr(md5(f || ':s'),1,8)) AS BIGINT) % B`.
  *
  * Plan shape: raw features pre-aggregate to per-(doc, bucket) counts
  * — ONE map-side-combined corpus exchange, reused (persisted, released
  * on return) by both the raw histogram (regrouped to `buckets` rows)
  * and the probe. The target corpus builds its own bucket histogram
  * (map-side combined to `buckets` rows). Both histograms and the
  * 2-cell totals frame are bucket-table-sized and BROADCAST; the probe
  * is a broadcast join + one per-doc sum. Nothing corpus-sized sorts,
  * and the only full-corpus shuffles are the two histogram aggregates
  * keyed on (doc, bucket) / bucket.
  *
  * Output: (idCol, n_feats, dsir_mnats, avg_lr_nats), one row per raw
  * document with ≥1 feature (null/empty-text docs drop on both the
  * engine and any oracle). Higher = more target-like. */
object Dsir {

  /** Default hash-bucket count (the paper uses 10⁴; any power-of-two-
    * ish bucket table small enough to broadcast works). */
  val DefaultBuckets = 4096

  /** Per-(doc, bucket) feature counts: unigrams + word bigrams of
    * lower(text), hashed into [0, buckets). The word array is BOUND
    * before shingling (the [[Shingles]] lambda-CSE contract). */
  private def bucketCounts(df: DataFrame, idCol: String, text: Column,
      buckets: Int, salt: String): DataFrame =
    df.filter(text.isNotNull)
      .select(col(idCol), TextFunctions.whitespaceTokens(lower(text)).as("__w"))
      .select(col(idCol), explode(concat(col("__w"),
        Shingles.wordNGramsOf(col("__w"), 2))).as("__f"))
      .filter(col("__f").isNotNull) // sub-2-word docs yield one NULL bigram
      .select(col(idCol),
        pmod(conv(substring(md5(concat(col("__f"), lit(":"), lit(salt))),
          1, 8), 16, 10).cast("long"), lit(buckets.toLong)).as("__b"))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__n"))

  /** Per-document DSIR log importance weights of `raw` against
    * `target` (see object doc). `target` and `raw` need not overlap;
    * only `raw` documents are scored. `stagingDir` switches the
    * corpus-sized per-(doc, bucket) intermediate from `persist()` to a
    * parquet staging write — the production shape at 100 TB
    * ([[graft.util.Staging]]). */
  def importanceScores(raw: DataFrame, target: DataFrame, idCol: String,
      text: Column, buckets: Int = DefaultBuckets,
      salt: String = "dsir", stagingDir: Option[String] = None): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val (dn, release) = graft.util.Staging.stage(
      bucketCounts(raw, idCol, text, buckets, salt),
      stagingDir, "dsir_bucket_counts")
    try {
      dn.count(): Unit // materialize once for the two consuming subtrees
      val hq = dn.groupBy(col("__b")).agg(sum(col("__n")).as("__cq"))
      val ht = bucketCounts(target, idCol, text, buckets, salt)
        .groupBy(col("__b")).agg(sum(col("__n")).as("__ct"))
      val totals = hq.agg(sum(col("__cq")).as("__tq"))
        .crossJoin(ht.agg(coalesce(sum(col("__ct")), lit(0L)).as("__tt")))
      // raw-histogram buckets cover every probe bucket by construction;
      // target-absent buckets smooth to ct = 0
      val ratio = hq.join(ht, Seq("__b"), "left_outer")
        .crossJoin(broadcast(totals))
        .select(col("__b"), floor(lit(1000.0) * log(
          ((coalesce(col("__ct"), lit(0L)) + 1L).cast("double") *
            (col("__tq") + buckets).cast("double")) /
          ((col("__cq") + 1L).cast("double") *
            (col("__tt") + buckets).cast("double")))).cast("long")
          .as("__lr_mn"))
      dn.join(broadcast(ratio), Seq("__b"))
        .groupBy(col(idCol))
        .agg(sum(col("__n")).as("n_feats"),
          sum(col("__n") * col("__lr_mn")).as("dsir_mnats"))
        .withColumn("avg_lr_nats",
          col("dsir_mnats").cast("double") / lit(1000.0) / col("n_feats"))
        .localCheckpoint(true)
    } finally release()
  }
}
