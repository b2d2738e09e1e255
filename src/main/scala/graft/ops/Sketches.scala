package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch point queries with an engine-exact gate —
  * completing the sketch family next to `approx_count_distinct`
  * (HLL++, `q_approx_distinct`) and `approx_percentile` (KLL-style,
  * `q_approx_quantile`): frequency estimation in CONSTANT mergeable
  * state.
  *
  * At 100 TB the exact per-key census costs a key-cardinality
  * shuffle; the Count-Min aggregate is one map-side-combined pass
  * into `w·d` counters (kilobytes), and any key's frequency is then a
  * driver-side probe. The gate discipline is `q_profile_approx`'s:
  * the PINNED output is the exact census top-k plus a boolean that
  * the estimate respects the sketch contract
  * `n ≤ est ≤ n + ⌊eps·N⌋` — the estimate itself never reaches the
  * hash compare, so sketch drift flips a boolean instead of
  * scattering approximate numbers through the oracle. Counter sums
  * are order-independent integer adds and the hash seed is fixed, so
  * the flag is deterministic under any partitioning. */
object Sketches {

  /** Exact top-`k` heavy hitters of `key` (cast to long) with the
    * Count-Min gate. Output: (rank, key, n, cms_ok). */
  def cmsHeavyHitters(df: DataFrame, key: Column, k: Int,
      eps: Double, confidence: Double, seed: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(key.cast("long").as("key"))
    val counts = keyed.groupBy("key").agg(count(lit(1)).as("n"))
    val top = graft.text.Retrieval.saltedTopK(counts, lit(1), col("key"),
        Seq(col("n").desc, col("key")), k)
      .select(col("rank").cast("long").as("rank"), col("key"), col("n"))
    // ONE constant-size aggregate row: the sketch + the total
    val row = keyed.agg(
      count_min_sketch(col("key"), lit(eps), lit(confidence),
        lit(seed)).as("sk"),
      count(lit(1)).as("total")).head()
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("sk")))
    val bound = math.floor(eps * row.getLong(1)).toLong
    // the winner set is k rows — probe the sketch driver-side
    top.as[(Long, Long, Long)].collect().toSeq.map { case (rank, kk, n) =>
      val est = sketch.estimateCount(kk)
      (rank, kk, n, est >= n && est <= n + bound)
    }.toDF("rank", "key", "n", "cms_ok")
  }
}
