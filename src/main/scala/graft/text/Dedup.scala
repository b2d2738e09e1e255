package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline surface:
  * exact (hash-groupBy), MinHash+LSH near-dup (shingle → minhash →
  * band → bucket-join), exact n-gram Jaccard verification, and
  * cluster resolution (pairs → connected components).
  *
  * Scale discipline: candidate generation is ALWAYS banded/bucketed —
  * the only join key is (band, band-signature), so work is proportional
  * to bucket sizes, never |docs|². Signatures are md5-based (portable,
  * deterministic, engine-agnostic); the lexicographic min of fixed-width
  * lowercase hex equals the numeric min, so `min(md5(..))` is a valid
  * minhash without any hex→int conversion.
  *
  * Plan shape: the whole signature chain is ONE hash-aggregate per doc —
  * all `numHashes` minhashes are computed as parallel min() aggregates in
  * a single groupBy(id) pass over the shingle set (no k× row explosion),
  * and band signatures are a narrow array-slice projection of that
  * result. The shingle set itself ([[shingles]]) is the shared upstream
  * of candidates AND verification — compute it once, persist, and feed
  * both stages (the `*FromShingles` variants) instead of re-deriving the
  * lineage per stage.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id.
    * One map-side-combined hash aggregate — the 100 TB plan is the same
    * plan. Output: (content_hash, keep_id, dup_count). */
  def exact(df: DataFrame, idCol: String, text: Column): DataFrame =
    df.groupBy(md5(text).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Per-document word cap for [[shingles]] — bounds shingle rows per doc
    * at scale (a pathological single-line 100 MB doc otherwise emits
    * O(words) rows). Any oracle must apply the same cap. */
  val MaxShingleWords = 4096

  /** Distinct word-n-gram shingle set: (id, s). The shared upstream of
    * the near-dup pipeline — persist this and pass it to the
    * `*FromShingles` stages so the tokenize+distinct shuffle runs once. */
  def shingles(df: DataFrame, idCol: String, text: Column,
      shingleWords: Int = 3, maxWords: Int = MaxShingleWords): DataFrame =
    // the split word array is BOUND before the n-gram lambda references
    // it (re-evaluation-per-element trap — see Shingles class doc)
    df.select(col(idCol),
        slice(split(lower(text), " "), 1, maxWords).as("__w"))
      .select(col(idCol),
        explode(Shingles.wordNGramsOf(col("__w"), shingleWords)).as("s"))
      .filter(col("s").isNotNull)
      .distinct()

  /** All `numHashes` seed-prefixed md5 minhashes in ONE aggregate pass:
    * (id, mh: array<string>[numHashes]). */
  def minhashArray(sh: DataFrame, idCol: String, numHashes: Int): DataFrame =
    sh.groupBy(col(idCol)).agg(
      array((0 until numHashes).map(k =>
        min(md5(concat(lit(k.toString), lit("|"), col("s"))))): _*).as("mh"))

  /** Band signatures from the minhash array: `rowsPerBand` consecutive
    * minhashes hash into one bucket key per band — a narrow projection,
    * no extra shuffle. P(candidate) ≈ 1-(1-J^r)^b. */
  def bandSignatures(mh: DataFrame, idCol: String, numHashes: Int,
      rowsPerBand: Int): DataFrame = {
    val bands = numHashes / rowsPerBand
    mh.select(col(idCol), posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(array_join(slice(col("mh"), b * rowsPerBand + 1, lit(rowsPerBand)), "|")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bsig")
  }

  /** Per-(band, bsig) bucket sizes — the degenerate-bucket census. Use it
    * to audit what a `maxBucket` cap in [[lshCandidates]] drops (no
    * silent truncation: callers log/metric `bucketSizes(..).filter(n >
    * cap)` alongside the capped run). */
  def bucketSizes(df: DataFrame, idCol: String, text: Column,
      numHashes: Int = 16, rowsPerBand: Int = 2, shingleWords: Int = 3): DataFrame =
    bandSignatures(minhashArray(shingles(df, idCol, text, shingleWords), idCol, numHashes),
      idCol, numHashes, rowsPerBand)
      .groupBy("band", "bsig").agg(count(lit(1)).as("n"))

  /** LSH candidate pairs (id_a < id_b) sharing at least one band bucket.
    * The self-join keys on (band, bsig) — bucket-sized work only.
    *
    * `maxBucket` caps degenerate buckets: a bucket of b docs emits
    * b·(b−1)/2 pairs, so one boilerplate/empty-doc bucket of 10^6 docs
    * would emit 5·10^11 pairs and kill the job at 100 TB. Buckets larger
    * than the cap are dropped BEFORE the self-join (the size census is a
    * partial-agg on the same shuffle key, so AQE reuses the exchange).
    * Docs in a dropped bucket still pair through their other bands —
    * near-dups agreeing on several bands lose little recall; exact dups
    * of mega-duplicated content belong to [[exact]] anyway. */
  def lshCandidates(df: DataFrame, idCol: String, text: Column,
      numHashes: Int = 16, rowsPerBand: Int = 2, shingleWords: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    lshCandidatesFromShingles(shingles(df, idCol, text, shingleWords), idCol,
      numHashes, rowsPerBand, maxBucket)

  /** [[lshCandidates]] over a precomputed (persisted) shingle set.
    *
    * Returns an EAGERLY MATERIALIZED pair list (`localCheckpoint`): the
    * band table feeds three subtrees (the bucket census and both sides of
    * the self-join), and under AQE the unmaterialized subtrees race to
    * recompute shared lineage concurrently — cache population is not a
    * barrier, so a lazy persist here is both slow (duplicate work) and a
    * cross-query cache leak. Materializing the (small) result lets this
    * function release every intermediate before returning; callers may
    * reference the result any number of times with no caller-side
    * persist. (On executor loss the blocks recompute from lineage-cut
    * parents — acceptable for a derived candidate list; contrast
    * [[graft.ops.RangeSplitter.exactBounds]] which collects its tiny
    * result to the driver instead.) */
  def lshCandidatesFromShingles(sh: DataFrame, idCol: String,
      numHashes: Int = 16, rowsPerBand: Int = 2, maxBucket: Int = 1000): DataFrame = {
    val bands = bandSignatures(minhashArray(sh, idCol, numHashes), idCol,
      numHashes, rowsPerBand).persist()
    try {
      bands.count(): Unit // materialize BEFORE fan-out (see scaladoc)
      val ok = bands.groupBy("band", "bsig").agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBucket)
        .select("band", "bsig")
      val pruned = bands.join(ok, Seq("band", "bsig"))
      val a = pruned.select(col(idCol).as("id_a"), col("band"), col("bsig"))
      val b = pruned.select(col(idCol).as("id_b"), col("band"), col("bsig"))
      a.join(b, Seq("band", "bsig"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint(true)
    } finally { bands.unpersist(false); () }
  }

  /** Exact word-n-gram Jaccard for given candidate pairs — the verify
    * stage after LSH. `pairs` must have (id_a, id_b). Joins each side's
    * distinct shingle set; |A∩B| via inner join on the shingle, |A∪B| =
    * |A|+|B|−|A∩B|. Cost is candidates × shingles, never all-pairs. */
  def jaccardVerify(df: DataFrame, pairs: DataFrame, idCol: String, text: Column,
      shingleWords: Int = 3): DataFrame =
    jaccardVerifyFromShingles(shingles(df, idCol, text, shingleWords), pairs, idCol)

  /** [[jaccardVerify]] over a precomputed (persisted) shingle set —
    * share it with [[lshCandidatesFromShingles]] so the full near-dup
    * pipeline derives the corpus lineage exactly once.
    *
    * `pairs` is referenced SEVERAL times by this DAG (the pair list, the
    * candidate-id pruning, and the intersection join): pass it
    * materialized — [[lshCandidatesFromShingles]] output already is.
    * Returns an eagerly materialized result (one row per candidate pair)
    * and releases its internal pruned-shingle cache before returning —
    * same rationale as [[lshCandidatesFromShingles]]. */
  def jaccardVerifyFromShingles(shRaw: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    // prune the shingle set to candidate docs BEFORE any wide join: the
    // verify stage only touches docs that appear in a pair, so the
    // shuffled volume drops from |all shingles| to |candidate shingles|
    // (AQE broadcasts the id list when it is small)
    val candIds = pairs.select(col("id_a").as("__jid"))
      .unionByName(pairs.select(col("id_b").as("__jid")))
      .distinct()
    val sh = shRaw.select(col(idCol).as("__jid"), col("s"))
      .join(candIds, Seq("__jid"), "left_semi")
      .persist()
    try {
      sh.count(): Unit // materialize BEFORE the three consuming subtrees
      val sizes = sh.groupBy("__jid").agg(count(lit(1)).as("n"))
      val inter = pairs
        .join(sh.select(col("__jid").as("id_a"), col("s")), Seq("id_a"))
        .join(sh.select(col("__jid").as("id_b"), col("s")), Seq("id_b", "s"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
      pairs
        .join(inter, Seq("id_a", "id_b"), "left")
        .na.fill(0L, Seq("n_inter"))
        .join(sizes.select(col("__jid").as("id_a"), col("n").as("n_a")), Seq("id_a"))
        .join(sizes.select(col("__jid").as("id_b"), col("n").as("n_b")), Seq("id_b"))
        .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
        .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
        .select("id_a", "id_b", "n_inter", "n_union", "jaccard")
        .localCheckpoint(true)
    } finally { sh.unpersist(false); () }
  }

  /** Cluster resolution: collapse verified near-dup pairs into connected
    * components via iterative min-label propagation, so the pipeline
    * emits a deduped corpus assignment (id → cluster_root; keep the root)
    * rather than raw pairs.
    *
    * Each round, every node takes the min of its own label and its
    * neighbors' labels; iteration stops at the fixed point (no label
    * changed), which is exactly the per-component min id. Rounds needed =
    * component diameter — near-dup clusters are shallow (stars/cliques
    * around an original), so this converges in 2-3 rounds in practice;
    * `maxIter` bounds adversarial chains. Labels are persisted per round
    * and the previous round unpersisted, so lineage stays flat.
    *
    * `nodes` = one column of ids (the full corpus); `pairs` = (id_a,
    * id_b) verified edges. Returns (id, root); singletons are their own
    * root. */
  def resolveClusters(nodes: DataFrame, pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = nodes.sparkSession
    val idName = nodes.columns.head
    // LINEAGE CUT, the load-bearing trick of every iterative DataFrame
    // algorithm: persist() caches DATA but Catalyst still re-analyzes the
    // full logical plan, and each round references the previous labels
    // several times — the plan tree grows ~3^rounds and analysis time
    // explodes even though execution hits the cache. Rebinding each
    // round's result through its RDD (LogicalRDD) keeps the plan
    // constant-size while the data stays distributed.
    def cut(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)
    val edges = cut(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct()).persist()
    // only edge-connected nodes can ever change label: iterate over THEM
    // (typically a tiny fraction of the corpus) and union the untouched
    // singletons back at the end — per-round work scales with the pair
    // set, not the corpus
    // `persisted` is always the DataFrame .persist() was called on —
    // unpersisting a projection of it would NOT release the cache entry
    var persisted = cut(edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("root"))).persist()
    persisted.count(): Unit // materialize; edges cached transitively
    var labels = persisted
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges.join(labels.select(col("id").as("dst"), col("root")), Seq("dst"))
        .groupBy("src").agg(min("root").as("__nbr"))
      // carry a per-row changed flag so ONE action both materializes the
      // round and counts the changes (no extra old-vs-new join per round)
      val updated = cut(labels
        .join(nbrMin.select(col("src").as("id"), col("__nbr")), Seq("id"), "left")
        .select(col("id"),
          least(col("root"), coalesce(col("__nbr"), col("root"))).as("root"),
          (coalesce(col("__nbr"), col("root")) < col("root")).cast("long").as("__chg")))
        .persist()
      changed = updated.filter(col("__chg") === 1L).count()
      persisted.unpersist()
      persisted = updated
      labels = updated.select("id", "root") // narrow projection over the cache
      iter += 1
    }
    // materialize the assignment so every cache this loop holds can be
    // released before returning (same contract as lshCandidatesFromShingles)
    val out = nodes.select(col(idName).as("id"))
      .join(labels.withColumnRenamed("root", "__r"), Seq("id"), "left")
      .select(col("id"), coalesce(col("__r"), col("id")).as("root"))
      .localCheckpoint(true)
    edges.unpersist(false)
    persisted.unpersist(false)
    out
  }
}
