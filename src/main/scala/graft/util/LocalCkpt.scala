package graft.util

import org.apache.spark.sql.DataFrame

/** Targeted release of `localCheckpoint(true)` executor blocks.
  *
  * `Dataset.unpersist` only evicts SQL CacheManager entries; a
  * local-checkpointed Dataset's blocks belong to the underlying RDD
  * and are otherwise freed only when the RDD is GC'd via the
  * ContextCleaner — on a long-lived streaming drain that calls an
  * eagerly-checkpointing probe every micro-batch, the un-collected
  * backlog accumulates in the block manager for as long as the driver
  * holds any reference. [[release]] walks the frame's analyzed plan
  * and unpersists every `LogicalRDD` leaf's RDD directly — the
  * checkpointed frame itself AND any checkpointed intermediate its
  * lineage captured (e.g. the probe frame a staged-candidates scan
  * was built over).
  *
  * CONTRACT: call only once the frame (and everything derived from
  * it) is fully consumed. A local checkpoint TRUNCATES lineage, so a
  * released frame cannot be recomputed — any later action on it fails
  * with a missing-block error rather than silently recomputing.
  *
  * SCOPE OF THE RELEASE: [[release]] frees EVERY checkpointed leaf in
  * the frame's lineage, including RDD-backed inputs the caller did not
  * create — it cannot tell an internal intermediate from a still-
  * needed shared input. Pass only frames whose ENTIRE checkpointed
  * lineage is owned by the releasing scope (the per-micro-batch shape
  * of every gate call site); a frame derived from a shared
  * checkpointed input must be released leaf-by-leaf by whoever owns
  * each leaf, not through this walk. */
object LocalCkpt {

  /** Unpersist every `LogicalRDD` leaf RDD in `df`'s analyzed plan
    * (non-blocking). Safe on frames with no checkpointed leaves —
    * parquet scans and in-memory relations are left untouched. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }
}
