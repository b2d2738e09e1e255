package graft.util

import org.apache.spark.sql.DataFrame

/** Materialize-then-release for corpus-sized intermediates that feed
  * more than one subtree (BM25's (doc, term) tf frame, Mixing's
  * annotated corpus). Two shapes, same contract:
  *
  *  - `persist()` (the default): right at test/interactive scale —
  *    memory-and-disk blocks, released eagerly when the operator
  *    returns. At 100 TB a corpus-sized block cache competes with the
  *    shuffle for executor storage and re-replicates on executor loss.
  *  - parquet STAGING (opt-in via a staging directory): the production
  *    shape — one columnar write, re-read by each consumer subtree with
  *    full pushdown/pruning, durable across executor loss, zero
  *    storage-memory pressure. The directory is the caller's to place
  *    (job-scratch HDFS/S3 prefix) and to clean.
  *
  * Output is identical either way — the staged frame is the same rows,
  * just round-tripped through parquet — which the operator specs pin.
  */
object Staging {

  /** Materialize `df` under `stagingDir/name` (parquet round-trip) when
    * a staging dir is supplied, else `persist()`. Returns the frame to
    * build consumer subtrees on plus a release thunk for the
    * operator's `finally` (a no-op for the staged shape — files are
    * scratch-dir-lifetime by design). */
  def stage(df: DataFrame, stagingDir: Option[String], name: String)
      : (DataFrame, () => Unit) =
    stagingDir match {
      case Some(dir) =>
        val path = s"$dir/$name"
        df.write.mode("overwrite").parquet(path)
        // re-read with the WRITTEN frame's schema (nullable-ized — the
        // parquet round-trip reports every field nullable): the schema
        // is known exactly, so the consumer subtrees never pay a footer
        // schema-inference job on the staged intermediate
        val readSchema = org.apache.spark.sql.types.StructType(
          df.schema.map(_.copy(nullable = true)))
        (df.sparkSession.read.schema(readSchema).parquet(path), () => ())
      case None =>
        val p = df.persist()
        (p, () => { p.unpersist(false); () })
    }
}
