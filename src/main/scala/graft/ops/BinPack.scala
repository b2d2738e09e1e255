package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Size-aware output binning — the small-files fix: assign rows to
  * output bins so each bin carries ≈ `targetBytes` of payload, without
  * a global sort.
  *
  * The assignment is "next-fit over a deterministic order": rows are
  * laid end-to-end in md5-rank order and a row lands in the bin where
  * its START byte falls (`bin = floor(prefix / target)`), so every bin
  * holds ≥ 1 row and ≤ target + max(row size) bytes. The global byte
  * prefix-sum uses the `shuffleManifest` decomposition
  * (text/Sampling.scala:60-97): md5-prefix range shards make the
  * global md5 order equal (shard, rank-key) order, so the prefix is a
  * per-shard running sum (thousands of small independent windows at
  * 100 TB — never one reducer) plus a shards-row offset table
  * (driver-scale metadata, broadcast back). Everything is integer
  * arithmetic over md5 — bit-identical in any engine, retry-stable,
  * and a pure function of (keys, sizes, salt).
  *
  * Writers use the result as `.repartition(col("bin")).write...` (or
  * partitionBy on `bin`) — one shuffle keyed by bin, each task writing
  * ≈ one target-sized file. */
object BinPack {

  /** Assign each row a `bin` (0-based long) and its global byte offset.
    *
    * @param df          input; one row per item
    * @param idCol       unique key column (orders the layout via md5)
    * @param sizeCol     integer byte-size column (must be ≥ 0, non-null)
    * @param targetBytes bin capacity; rows larger than it get a bin of
    *                    their own (next-fit semantics)
    * @param salt        layout seed: a new salt draws an independent
    *                    deterministic order
    * @param shards      md5-prefix range shards; size so one shard's
    *                    rows fit a task sort
    *
    * Output: all input columns + `bin`. */
  def assignBins(df: DataFrame, idCol: String, sizeCol: String,
      targetBytes: Long, salt: String = "v0", shards: Int = 64): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(shards > 0 && shards <= 65536, "shards in [1, 65536]")
    val rk = md5(concat(col(idCol).cast("string"), lit("#"), lit(salt)))
    val withShard = df
      .withColumn("__rk", rk)
      .withColumn("__shard",
        floor(conv(substring(col("__rk"), 1, 4), 16, 10).cast("long")
          * shards / 65536).cast("int"))
    // per-shard EXCLUSIVE running byte sum in rank order
    val perShard = Window.partitionBy(col("__shard"))
      .orderBy(col("__rk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = withShard.withColumn("__local",
      coalesce(sum(col(sizeCol).cast("long")).over(perShard), lit(0L)))
    // shard byte totals → exclusive offsets: a shards-row metadata window
    val sizes = withShard.groupBy(col("__shard"))
      .agg(sum(col(sizeCol).cast("long")).as("__b"))
    val offW = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sizes.select(col("__shard"),
      coalesce(sum(col("__b")).over(offW), lit(0L)).as("__off"))
    ranked.join(broadcast(offsets), Seq("__shard"))
      .withColumn("bin", expr(s"(__off + __local) DIV $targetBytes"))
      .drop("__rk", "__shard", "__local", "__off")
  }

  /** Next-fit bins over a CALLER-SUPPLIED total order instead of the
    * md5 shuffle order — the write-optimizer path: pass a Z-order
    * Morton code ([[ZOrder.zvalue]]) and rows pack into ≈target-sized
    * bins that preserve multi-dimensional locality (each bin = one
    * output file = one tight zone-map rectangle).
    *
    * Same sharded prefix-sum decomposition, but the shard is
    * `orderVal >> shardShift` — deterministic (no sampled range
    * boundaries), and shard order equals value order, so the global
    * prefix is exact. `orderVal` must be a NON-NEGATIVE long;
    * (orderVal, tie on `idCol`) must be a total order. Pick
    * `shardShift` so 2^(orderBits − shardShift) shards each fit a task
    * sort. */
  def assignBinsInOrder(df: DataFrame, orderVal: Column, idCol: String,
      sizeCol: String, targetBytes: Long, shardShift: Int): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(shardShift >= 0 && shardShift < 63, "shardShift in [0, 63)")
    val withShard = df
      .withColumn("__ov", orderVal.cast("long"))
      .withColumn("__shard", shiftrightunsigned(col("__ov"), shardShift))
    val perShard = Window.partitionBy(col("__shard"))
      .orderBy(col("__ov"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = withShard.withColumn("__local",
      coalesce(sum(col(sizeCol).cast("long")).over(perShard), lit(0L)))
    val sizes = withShard.groupBy(col("__shard"))
      .agg(sum(col(sizeCol).cast("long")).as("__b"))
    val offW = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sizes.select(col("__shard"),
      coalesce(sum(col("__b")).over(offW), lit(0L)).as("__off"))
    ranked.join(broadcast(offsets), Seq("__shard"))
      .withColumn("bin", expr(s"(__off + __local) DIV $targetBytes"))
      .drop("__ov", "__shard", "__local", "__off")
  }
}
