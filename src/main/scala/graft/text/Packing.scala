package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concatenate-and-cut step between a curated
  * corpus and a training run: documents are laid end-to-end in a
  * deterministic order and cut into fixed-capacity token sequences.
  * This operator emits the PACKING MANIFEST (where each document lands:
  * sequence index + offset); the tokenizer stage consumes it to build
  * the actual sequences (handling the documented straddle at cut
  * boundaries).
  *
  * Determinism contract: the layout is a pure function of (group,
  * doc order, token counts) — the same corpus packs identically on any
  * engine, any partitioning, any retry. That is why the order column is
  * the document KEY, never arrival order.
  *
  * Scale shape: ONE window (cumulative sum) per group. The group key
  * must be finer than `split` at 100 TB — a global window is a single
  * reducer. Compose with [[Sampling.hashSplit]]'s bucket: partitioning
  * by (split, bucket-derived shard) gives thousands of independent,
  * individually-small windows, and membership is still deterministic.
  * Cross-shard sequences never exist (a sequence belongs to one shard),
  * so shards trade a few padding tokens at their tail for full
  * parallelism — the standard packing trade.
  */
object Packing {

  /** Packing manifest over `df`: each row gains
    *  - `start_tok`  — the document's first token's position in its
    *    group's concatenated token stream;
    *  - `seq_idx`    — the capacity-sized sequence the document STARTS
    *    in (floor(start_tok / capacity));
    *  - `seq_offset` — position within that sequence.
    * Documents are laid out in ascending `idCol` order within each
    * `groupCols` partition. */
  def packManifest(df: DataFrame, idCol: String, nTokens: Column,
      groupCols: Seq[Column], capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(groupCols: _*).orderBy(col(idCol))
    df.withColumn("start_tok", (sum(nTokens).over(w) - nTokens).cast("long"))
      .withColumn("seq_idx", floor(col("start_tok") / capacity).cast("long"))
      .withColumn("seq_offset", (col("start_tok") % capacity).cast("long"))
  }

  /** NO-SPLIT sequence packing: every document lands INTACT in one
    * fixed-capacity sequence, next-fit along the deterministic
    * (shard, id) order — the packing used when attention must not
    * cross document cuts (so [[packManifest]]'s concatenate-and-cut
    * layout is unusable). A document that alone exceeds `capacity`
    * occupies its own sequence (truncation is the tokenizer's policy,
    * downstream).
    *
    * Next-fit's running reset is inherently sequential, so this is the
    * text family's one deliberate per-group FOLD (typed
    * `flatMapGroups`) instead of a window: each shard — bounded by
    * construction, e.g. `split:bucket%64` — sorts its documents by id
    * in memory and folds once. Shards pack independently, the fold is
    * a pure function of the shard's (id, n) multiset, and so the
    * manifest is partitioning/retry-reproducible. Shard count is the
    * parallelism dial; shard size the memory bound — the same contract
    * as [[packManifest]]'s windows.
    *
    * Output: (shard, idCol, n_tokens, seq_idx, seq_offset). */
  def packNoSplit(df: DataFrame, idCol: String, nTokens: Column,
      shardCol: Column, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(shardCol.cast("string").as("shard"),
        col(idCol).cast("long").as("__id"), nTokens.cast("long").as("__n"))
      .as[(String, Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroups { (shard: String, it: Iterator[(String, Long, Long)]) =>
        val docs = it.toArray.sortBy(_._2)
        var seq = 0L
        var fill = 0L
        docs.iterator.map { case (_, id, n) =>
          if (fill > 0 && fill + n > capacity) { seq += 1; fill = 0L }
          val off = fill
          fill += n
          (shard, id, n, seq, off)
        }
      }
      .toDF("shard", idCol, "n_tokens", "seq_idx", "seq_offset")
  }
}
