package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline surface:
  * exact (hash-groupBy), MinHash+LSH near-dup (shingle → minhash →
  * band → bucket-join), and exact n-gram Jaccard verification.
  *
  * Scale discipline: candidate generation is ALWAYS banded/bucketed —
  * the only join key is (band, band-signature), so work is proportional
  * to bucket sizes, never |docs|². Signatures are md5-based (portable,
  * deterministic, engine-agnostic); the lexicographic min of fixed-width
  * lowercase hex equals the numeric min, so `min(md5(..))` is a valid
  * minhash without any hex→int conversion.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id.
    * One map-side-combined hash aggregate — the 100 TB plan is the same
    * plan. Output: (content_hash, keep_id, dup_count). */
  def exact(df: DataFrame, idCol: String, text: Column): DataFrame =
    df.groupBy(md5(text).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signatures: `numHashes` independent permutations simulated
    * by seed-prefixed md5; one row per (id, k) with the min hash over
    * the document's distinct word-3-gram shingles. */
  def minhashSignatures(df: DataFrame, idCol: String, text: Column,
      numHashes: Int, shingleWords: Int = 3): DataFrame = {
    val sh = df
      .select(col(idCol), explode(Shingles.wordNGrams(text, shingleWords)).as("s"))
      .filter(col("s").isNotNull)
      .distinct()
    sh.select(col(idCol), col("s"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("k"))
      .groupBy(col(idCol), col("k"))
      .agg(min(md5(concat(col("k").cast("string"), lit("|"), col("s")))).as("minh"))
  }

  /** Band signatures: group `rowsPerBand` consecutive minhashes per band
    * and hash them into one bucket key. P(candidate) ≈ 1-(1-J^r)^b. */
  def bandSignatures(sigs: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    sigs
      .groupBy(col(idCol), floor(col("k") / rowsPerBand).cast("int").as("band"))
      .agg(md5(array_join(transform(array_sort(collect_list(struct(col("k"), col("minh")))),
        x => x.getField("minh")), "|")).as("bsig"))

  /** LSH candidate pairs (id_a < id_b) sharing at least one band bucket.
    * The self-join keys on (band, bsig) — bucket-sized work only. At
    * 100 TB add a bucket-size cap (count per bsig, drop degenerate
    * buckets) before the join; not needed at fixture scale. */
  def lshCandidates(df: DataFrame, idCol: String, text: Column,
      numHashes: Int = 16, rowsPerBand: Int = 2, shingleWords: Int = 3): DataFrame = {
    val bands = bandSignatures(
      minhashSignatures(df, idCol, text, numHashes, shingleWords), idCol, rowsPerBand)
    val a = bands.select(col(idCol).as("id_a"), col("band"), col("bsig"))
    val b = bands.select(col(idCol).as("id_b"), col("band"), col("bsig"))
    a.join(b, Seq("band", "bsig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact word-n-gram Jaccard for given candidate pairs — the verify
    * stage after LSH. `pairs` must have (id_a, id_b). Joins each side's
    * distinct shingle set; |A∩B| via inner join on the shingle, |A∪B| =
    * |A|+|B|−|A∩B|. Cost is candidates × shingles, never all-pairs. */
  def jaccardVerify(df: DataFrame, pairs: DataFrame, idCol: String, text: Column,
      shingleWords: Int = 3): DataFrame = {
    val sh = df
      .select(col(idCol).as("__jid"), explode(Shingles.wordNGrams(text, shingleWords)).as("s"))
      .filter(col("s").isNotNull)
      .distinct()
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
  }
}
