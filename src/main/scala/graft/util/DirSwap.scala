package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Replace a staged-index sublayout (`parent/name`) with a freshly
  * written one — the swap step of index COMPACTION
  * ([[graft.text.Substrings.compactCensus]],
  * [[graft.ml.Similarity.compactIvfPq]]).
  *
  * Unlike staging (invalidate-first/manifest-last — an interrupted
  * restage must fail probes loudly because the layout contract may
  * have changed), compaction never changes what readers compute: the
  * old and the new layout are PROBE-IDENTICAL by construction (census
  * readers sum `n` per hash; codes rows are per-vector). So the
  * manifest stays valid throughout and the swap only has to guarantee
  * that a complete layout exists on disk at every instant:
  *
  *   write `name.__compact__` (reads the live layout) →
  *   rename live aside (`name.__old__`) → rename compact into place →
  *   delete the aside.
  *
  * Every crash point leaves either the old layout recoverable or the
  * new one live; [[replace]] starts by rolling BACK any interrupted
  * swap (the old layout is authoritative until the new one is fully in
  * place), so re-running the compaction recovers and redoes it. Single
  * writer per index assumed (the staging discipline); concurrent
  * READERS during the two renames can observe a transient listing
  * failure — retryable, as with every commit in this engine (see
  * ParquetCatalog's commit notes; on S3A, rename is copy-not-atomic
  * and deployments swap in a real table format).
  */
object DirSwap {

  def replace(spark: SparkSession, parent: String, name: String)
      (write: String => Unit): Unit = {
    val live = new Path(parent, name)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(parent, s"$name.__compact__")
    val aside = new Path(parent, s"$name.__old__")
    // roll back any interrupted swap: live is restored from the aside
    // if a previous run died between its two renames
    if (!fs.exists(live) && fs.exists(aside))
      require(fs.rename(aside, live), s"failed to restore $live from $aside")
    fs.delete(aside, true): Unit
    fs.delete(tmp, true): Unit
    write(tmp.toString)
    require(fs.exists(tmp), s"compaction wrote nothing at $tmp")
    require(fs.rename(live, aside), s"failed to move $live aside")
    require(fs.rename(tmp, live), s"failed to publish $tmp into $live")
    fs.delete(aside, true): Unit
  }
}
