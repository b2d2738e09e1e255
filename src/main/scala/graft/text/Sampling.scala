package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting — the
  * train/val/test assignment step of a training-data pipeline.
  *
  * Why not `rand()` / `df.randomSplit`: random assignment is not stable
  * under task retries or input repartitioning (Spark recomputes lost
  * partitions, and a reseeded `rand` reassigns rows), and two pipelines
  * sampling the "same" split can disagree. Hashing the DOCUMENT KEY
  * instead makes membership a pure function of (key, salt): retries,
  * re-runs, engine changes, and incremental appends all agree on every
  * row's split forever — the property a 100 TB corpus snapshot needs so
  * that eval rows can never leak into training between runs. Changing
  * the salt draws an independent re-split.
  *
  * Everything is a narrow codegen'd projection (md5 + integer mod):
  * no shuffle, no state, reproducible in any SQL engine.
  */
object Sampling {

  /** Bucket granularity: weights resolve to integer thresholds out of
    * 10 000, i.e. 0.01 % resolution. */
  val Granularity = 10000

  /** Deterministic bucket in [0, [[Granularity]]): the first 8 md5 hex
    * chars of "key:salt" mod 10 000. 32 bits of hash → the mod-10000
    * bias is ≤ 2⁻¹⁸ per bucket (uniform for practical purposes) while
    * staying exactly reproducible in portable SQL
    * (`CAST(('0x' || substr(md5(k || ':' || salt),1,8)) AS BIGINT) % 10000`). */
  def splitBucket(key: Column, salt: Column): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":"), salt)), 1, 8), 16, 10)
      .cast("long") % Granularity

  def splitBucket(key: Column, salt: String): Column = splitBucket(key, lit(salt))

  /** Assign every row a named split by cumulative weight over the hash
    * bucket: `weights` like Seq("train" -> 0.8, "val" -> 0.1,
    * "test" -> 0.1) (must sum to 1 within bucket resolution; the LAST
    * split absorbs the rounding remainder so no row is unassigned).
    * Adds `bucket` and `split` columns. */
  def hashSplit(df: DataFrame, key: Column, salt: String,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-6, "weights must sum to 1")
    val bounds = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w * Granularity)
    }.tail
    val b = splitBucket(key, salt)
    val assign = weights.init.zip(bounds.init)
      .foldRight(lit(weights.last._1): Column) { case (((name, _), hi), rest) =>
        when(b < hi, name).otherwise(rest)
      }
    df.withColumn("bucket", b).withColumn("split", assign)
  }

  /** Deterministic epoch shuffle manifest: a pseudorandom TOTAL ORDER
    * over the corpus (the training-order pass), as (key, shard, pos)
    * with `pos` a 0-based global permutation index — computed WITHOUT a
    * global sort.
    *
    * The rank key is `md5(key#salt)`; `shard` is a range partition of
    * its 16-bit prefix, so the global md5 order IS (shard, rank-key)
    * order. That turns the global permutation into: a row_number window
    * per shard (thousands of small independent sorts at 100 TB — never
    * one reducer), plus shard offsets from a `shards`-row aggregate
    * (driver-scale metadata, broadcast back). A new `salt` draws an
    * independent permutation (epoch reshuffle); the layout is a pure
    * function of (corpus keys, salt) — any engine, partitioning, or
    * retry reproduces it byte-for-byte, which is what makes a training
    * run resumable mid-epoch.
    *
    * Size `shards` so one shard's keys fit a task sort (~corpus rows /
    * a few million). */
  def shuffleManifest(df: DataFrame, idCol: String, salt: String,
      shards: Int): DataFrame =
    rankedManifest(df, idCol, lit(0L), salt, shards).drop("bin")

  /** Shared manifest algebra for [[shuffleManifest]] (constant bin) and
    * [[curriculumManifest]]: rank key md5(key#salt), shard = range
    * partition of the 16-bit prefix, row_number per (bin, shard),
    * offsets from a (bins × shards)-row prefix-sum broadcast back.
    * The offsets join is NULL-SAFE on the bin so a null bin (unknown
    * difficulty) keeps its rows — they order FIRST (Spark's ascending
    * null ordering), preserving the 0..n−1 permutation contract. */
  private def rankedManifest(df: DataFrame, idCol: String, binCol: Column,
      salt: String, shards: Int): DataFrame = {
    require(shards > 0 && shards <= 65536, "shards in [1, 65536]")
    val key = col(idCol)
    val rk = md5(concat(key.cast("string"), lit("#"), lit(salt)))
    val withShard = df.select(key, binCol.cast("long").as("bin"), rk.as("__rk"))
      .withColumn("shard",
        floor(conv(substring(col("__rk"), 1, 4), 16, 10).cast("long")
          * shards / 65536).cast("int"))
    val perShard = Window.partitionBy(col("bin"), col("shard"))
      .orderBy(col("__rk"), key)
    val ranked = withShard
      .withColumn("__r", row_number().over(perShard).cast("long"))
    val sizes = withShard.groupBy(col("bin"), col("shard"))
      .agg(count(lit(1)).as("__n"))
    // prefix-sum over bins × shards rows — metadata-sized
    val offW = Window.orderBy(col("bin"), col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sizes.select(col("bin").as("__ob"), col("shard").as("__os"),
      coalesce(sum(col("__n")).over(offW), lit(0L)).as("__off"))
    ranked.join(broadcast(offsets),
        col("bin") <=> col("__ob") && col("shard") === col("__os"))
      .select(key, col("bin"), col("shard"),
        (col("__off") + col("__r") - 1).as("pos"))
  }

  /** Curriculum training-order manifest: a deterministic TOTAL ORDER
    * that walks `binCol` ASCENDING (easy→hard curriculum bins — e.g.
    * quality-percentile deciles from `Quantiles.percentileRanks`) and
    * pseudorandomly WITHIN each bin — computed, like
    * [[shuffleManifest]], without ever sorting the corpus in one
    * reducer.
    *
    * Order key is (bin, md5(key#salt), key); the shard is (bin, range
    * partition of the 16-bit md5 prefix), so global order IS
    * (bin, shard, rank-key) order: a row_number window per (bin,
    * shard) — bounded independent sorts — plus offsets from a
    * (bins × shards)-row prefix-sum aggregate (metadata-sized,
    * broadcast back). A new salt redraws every within-bin permutation
    * while preserving the curriculum; the layout is a pure function of
    * (keys, bins, salt), so retries and engines agree byte-for-byte.
    * Bins must be a bounded small domain (deciles, grade levels);
    * shard within-bin volume via `shards` exactly as in
    * [[shuffleManifest]]. Rows with a NULL bin are kept and order
    * FIRST (Spark's ascending null ordering; the offsets join is
    * null-safe), preserving the 0..n−1 permutation over the full
    * corpus. */
  def curriculumManifest(df: DataFrame, idCol: String, binCol: Column,
      salt: String, shards: Int): DataFrame =
    rankedManifest(df, idCol, binCol, salt, shards)

  /** Deterministic EXACT-n per-stratum sample: the first `n` rows of
    * each group in md5(key#salt) order — eval-set construction ("5
    * docs per language, stable forever") where [[capPerGroup]]'s
    * hash-threshold gate (approximately cap, zero sorts) is the wrong
    * trade. The rank runs through the salted two-level top-k
    * ([[graft.text.Retrieval.saltedTopK]]): partial top-n per hash
    * shard, final window over ≤ salts·n rows per group — a hot
    * stratum never sorts through one reducer. Same determinism
    * contract as [[shuffleManifest]]: a pure function of (keys, salt),
    * reproducible in any engine. Output: the input rows + `rank`
    * (1-based within the stratum). */
  def stratifiedExactN(df: DataFrame, group: Column, key: Column, n: Int,
      salt: String): DataFrame = {
    require(n > 0, "n must be positive")
    val rk = md5(concat(key.cast("string"), lit("#"), lit(salt)))
    graft.text.Retrieval.saltedTopK(df.withColumn("__rk", rk), group, key,
      Seq(col("__rk"), key), n).drop("__rk")
  }

  /** Per-group document cap — the anti-spam gate ("no domain may
    * contribute more than `cap` documents"), planned WITHOUT per-group
    * row_number windows: a hot domain with 10⁹ pages would sort them
    * all through one reducer. Instead the group sizes come from one
    * map-side-combined aggregate (groups-sized output), each
    * over-quota group gets an admission fraction `cap/count` realized
    * as a hash-bucket threshold (integer arithmetic), and one
    * broadcast join filters the corpus — no shuffle or sort of the
    * data rows anywhere.
    *
    * The trade: an over-quota group keeps ~cap documents to bucket
    * resolution (binomial around cap·(bucket granularity rounding)),
    * not exactly cap — the deterministic, retry-stable approximation a
    * 100 TB pipeline actually wants (exact top-N per domain needs the
    * sort this avoids). Groups at or under quota pass untouched.
    *
    * The rule table has one row per DISTINCT group. Web-scale domain
    * cardinality (10⁸ registered domains) outgrows a broadcast, so the
    * join strategy is AQE's choice by default — auto-broadcast while
    * the rule fits, hash-shuffle on the group key beyond (still no
    * sort, no window). Pass `broadcastRule = true` to force the
    * broadcast when the group count is known small. */
  def capPerGroup(df: DataFrame, group: Column, key: Column, cap: Long,
      salt: String = "cap", broadcastRule: Boolean = false): DataFrame = {
    require(cap > 0, "cap must be positive")
    val sizes = df.groupBy(group.as("__g")).agg(count(lit(1)).as("__n"))
    val rule = sizes.withColumn("__frac",
      when(col("__n") <= cap, lit(Granularity.toLong))
        .otherwise(expr(s"CAST((${cap}L * $Granularity) DIV __n AS BIGINT)")))
      .select(col("__g"), col("__frac"))
    df.join(if (broadcastRule) broadcast(rule) else rule, group <=> col("__g"))
      .filter(splitBucket(key, salt) < col("__frac"))
      .drop("__g", "__frac")
  }

  /** Deterministic `fraction` sample: keep rows whose bucket falls below
    * fraction×[[Granularity]]. Unlike `df.sample`, membership is stable
    * across retries/re-runs and CONSISTENT across tables sharing the key
    * (sampling users here and events there by the same key keeps every
    * sampled user's events together). */
  def sampleByHash(df: DataFrame, key: Column, fraction: Double,
      salt: String): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(splitBucket(key, salt) < math.round(fraction * Granularity))
  }

  /** Weight-proportional Bernoulli sampling (importance sampling by
    * document length, quality score, domain weight …): keep each row
    * with probability `min(1, weight / wCap)`, decided by pure integer
    * arithmetic over an md5-derived 32-bit uniform —
    *
    *   keep  ⇔  u32 · wCap  <  weight · 2³²
    *
    * so membership is engine-exact, retry-stable, and a pure function
    * of (key, salt): no rand(), no floating-point probability whose
    * rounding could flip a row between engines. Rows with
    * `weight ≥ wCap` are always kept; `weight ≤ 0` never. A narrow
    * filter — zero shuffle, pushes past column pruning to the scan.
    *
    * Overflow domain: `weight · 2³² < 2⁶³` requires weight < 2³¹, and
    * `u32 · wCap < 2⁶³` requires wCap < 2³¹ — both enforced. */
  def sampleByWeight(df: DataFrame, key: Column, weight: Column,
      wCap: Long, salt: String): DataFrame = {
    require(wCap > 0 && wCap < (1L << 31), "wCap in (0, 2^31)")
    val u32 = conv(substring(
      md5(concat(key.cast("string"), lit("#" + salt))), 1, 8), 16, 10)
      .cast("long")
    // loud domain guard: a 2³¹ weight would silently wrap the product
    // under non-ANSI mode (the outlierCounts discipline)
    val w = when(weight.cast("long") < lit(1L << 31), weight.cast("long"))
      .otherwise(raise_error(concat(
        lit("sampleByWeight domain: weight >= 2^31 ("),
        weight.cast("string"), lit(")"))))
    df.filter(u32 * lit(wCap) < w * lit(1L << 32))
  }
}
