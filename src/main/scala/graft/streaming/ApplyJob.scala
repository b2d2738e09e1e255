package graft.streaming

import graft.config.MigratorConfig
import graft.sources.Catalog
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.util.concurrent.atomic.AtomicReference

/** One (id, doc) row of a doc-store table — the opaque-payload tier of
  * SURVEY §1.3: `id` is the canonical-JSON `_id` text, `doc` the full
  * document as JSON (the Spark analog of the reference's `bson.Raw`
  * relay, task.go:72-74). */
final case class DocRow(id: String, doc: String)

/** Fold result for one key. `doc == null` means the key ends deleted (or
  * never existed); `touched` is false for pass-through rows with no ops. */
final case class Folded(id: String, doc: String, existed: Boolean, touched: Boolean)

/** A5 — the per-batch apply counters the reference accumulates in
  * BulkWriteOplogsResult (oplog_utils.go:79-85). */
final case class ApplyCounts(inserted: Long = 0, modified: Long = 0, deleted: Long = 0) {
  def total: Long = inserted + modified + deleted
  def +(o: ApplyCounts): ApplyCounts =
    ApplyCounts(inserted + o.inserted, modified + o.modified, deleted + o.deleted)
}

/** The oplog apply pipeline — the reference's three-phase streamer
  * (CacheOplogs/ApplyCachedOplogs/LiveStreamOplogs,
  * oplog_streamer.go:112-323) collapsed into ONE Structured Streaming
  * query over a change-log directory:
  *
  *   readStream(Oplog.schema) → P4 skip → ST6 unwrap + T5 compile →
  *   per-key ts-ordered fold (J3/ST5, JsonDocOps.fold) →
  *   foreachBatch: atomic Catalog.merge per namespace (K2) with a
  *   batch-id marker committed WITH the data (K5/ST4).
  *
  * Phase mapping: the spool/cache phase (ST1) disappears — the source
  * directory plus checkpointed offsets ARE the spool; catch-up (ST2) is
  * `Trigger.AvailableNow`; live tail (ST3) is `Trigger.ProcessingTime`.
  * Restart-safety: Spark replays the last uncommitted micro-batch after
  * a crash; the per-namespace batch-id marker (recorded atomically with
  * the table swap) makes the replay a no-op, so end-to-end application
  * is exactly-once — stronger than the reference's at-least-once +
  * dup-key-tolerance discipline (oplog_streamer.go:147-158).
  *
  * Scale notes: each micro-batch shuffles only the batch's ops plus the
  * CURRENT rows of the touched keys (semi-join prune) — state access is
  * proportional to batch size, not table size. The parquet sink rewrites
  * the table dir per merge (inherent to parquet); a Delta/Iceberg/Mongo
  * Catalog implements the same `merge` contract as a real keyed MERGE,
  * and nothing here changes.
  */
object ApplyJob {

  /** P4 + ST6 + T5 as one Dataset stage: drop skipped entries, flatten
    * transactions, compile to write-ops (rename applied inside compile). */
  def compileOps(batch: Dataset[Oplog], cfg: MigratorConfig): Dataset[WriteOp] = {
    import batch.sparkSession.implicits._
    batch.flatMap(o => if (Oplog.skip(o, cfg)) Nil else Oplog.compile(o, cfg))
  }

  /** Fold ts-ordered ops onto base (id, doc) docs — full cogroup over the
    * union of key sets (J3/ST5: the per-key sequential-apply semantics
    * the reference gets from ordered bulk writes, oplog_utils.go:116-196,
    * reproduced inside one co-partitioned shuffle). */
  def foldDocs(base: DataFrame, ops: Dataset[WriteOp]): Dataset[Folded] = {
    val spark = ops.sparkSession
    import spark.implicits._
    val cur = base.select(col("id").cast("string").as("id"), col("doc").cast("string").as("doc"))
      .as[DocRow].groupByKey(_.id)
    cur.cogroup(ops.groupByKey(_.id)) { (id, curIt, opIt) =>
      val b = if (curIt.hasNext) Some(curIt.next().doc) else None
      val opSeq = opIt.toSeq
      if (opSeq.isEmpty) Iterator.single(Folded(id, b.orNull, existed = true, touched = false))
      else {
        val res = JsonDocOps.fold(b, opSeq)
        Iterator.single(Folded(id, res.orNull, existed = b.isDefined, touched = true))
      }
    }
  }

  /** One [[applyBatch]] outcome: per-namespace A5 counters plus the
    * newest APPLIED op ts of the batch (None when every entry was
    * skip-filtered) — the single number the ST3 lag metric needs,
    * harvested from the same aggregation that discovers the batch's
    * namespaces so the metric costs no extra action. */
  final case class BatchResult(counts: Map[String, ApplyCounts], maxAppliedTs: Option[Long]) {
    def totals: ApplyCounts = counts.values.foldLeft(ApplyCounts())(_ + _)
  }

  /** K2 — apply one change-log batch to the sink (BulkWriteOplogs,
    * oplog_utils.go:88-205). Namespaces are applied independently (the
    * reference groups write models per ns too, oplog_utils.go:97-115).
    * When `batchId >= 0`, a namespace whose recorded marker is already
    * `>= batchId` is skipped (exactly-once replay guard). */
  def applyBatch(batch: Dataset[Oplog], sink: Catalog, cfg: MigratorConfig,
      batchId: Long = -1L): BatchResult = {
    val spark = batch.sparkSession
    import spark.implicits._
    val ops = compileOps(batch, cfg).persist()
    try {
      // ONE driver-sized action discovers the namespaces AND the newest
      // applied ts (the ST3 lag numerator) — no second pass over the batch
      val nsRows = ops.groupBy($"ns").agg(max($"ts")).as[(String, Long)]
        .collect().sortBy(_._1)
      // namespaces are independent (the reference groups write models per
      // ns too, oplog_utils.go:97-115): submit their merge jobs from a
      // parallel collection so executors stay busy across namespaces,
      // same pattern as the copy fan-out
      import scala.collection.parallel.CollectionConverters._
      val counts = nsRows.map(_._1).par.map { ns =>
        val already = batchId >= 0 &&
          sink.readMarker(ns, "batch").exists(_.toLong >= batchId)
        if (already) ns -> ApplyCounts()
        else ns -> applyNamespace(ops.filter($"ns" === ns), sink, ns, batchId)
      }.seq.toMap
      BatchResult(counts, nsRows.map(_._2).maxOption)
    } finally { ops.unpersist(); () }
  }

  private def applyNamespace(nsOps: Dataset[WriteOp], sink: Catalog, ns: String,
      batchId: Long): ApplyCounts = {
    val spark = nsOps.sparkSession
    import spark.implicits._
    val touchedKeys = nsOps.select($"id").distinct()
    val current: DataFrame =
      if (sink.dataExists(ns)) sink.read(ns)
      else spark.emptyDataset[DocRow].toDF()
    // state access pruned to the touched keys — batch-proportional work
    val touchedCur = current.join(touchedKeys, Seq("id"), "left_semi")
    val folded = foldDocs(touchedCur, nsOps).persist()
    try {
      val c = folded.agg(
        sum(when(!$"existed" && $"doc".isNotNull, 1L).otherwise(0L)).as("ins"),
        sum(when($"existed" && $"doc".isNotNull, 1L).otherwise(0L)).as("mod"),
        sum(when($"existed" && $"doc".isNull, 1L).otherwise(0L)).as("del")).head()
      val counts = ApplyCounts(c.getLong(0), c.getLong(1), c.getLong(2))
      val upserts = folded.filter($"doc".isNotNull).select($"id", $"doc")
      val deletes = folded.filter($"doc".isNull).select($"id")
      sink.merge(ns, upserts, deletes, "id",
        marker = if (batchId >= 0) Some("batch" -> batchId.toString) else None)
      counts
    } finally { folded.unpersist(); () }
  }

  /** Handle on a running apply stream: the query plus live A5 counters
    * and the ST3 replication-lag metric (LiveStreamOplogs' lag log,
    * oplog_streamer.go:308-316: now − newest applied ts). */
  final class Handle(
      val query: StreamingQuery,
      totals: AtomicReference[ApplyCounts],
      lag: AtomicReference[Double]) {
    def counts: ApplyCounts = totals.get()
    def lagSeconds: Double = lag.get()
    def awaitTermination(): Unit = query.awaitTermination()
    def stop(): Unit = query.stop()
  }

  /** Start the apply stream over a change-log directory.
    *
    * `Trigger.AvailableNow` = ST2 catch-up (drain the backlog, then the
    * query stops itself); `Trigger.ProcessingTime` = ST3 live tail.
    * `maxFilesPerTrigger > 0` bounds micro-batch size (the reference's
    * 1000-op flush, oplog_streamer.go:287-295) — also what lets tests
    * kill the stream between batches. */
  def stream(spark: SparkSession, changelogDir: String, sink: Catalog,
      cfg: MigratorConfig, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 0): Handle = {
    import spark.implicits._
    var reader = spark.readStream.schema(Oplog.schema)
    if (maxFilesPerTrigger > 0)
      reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
    val src = reader.parquet(changelogDir).as[Oplog]
    val totals = new AtomicReference(ApplyCounts())
    val lag = new AtomicReference(Double.NaN)
    val fn: (Dataset[Oplog], Long) => Unit = { (batch, batchId) =>
      val res = applyBatch(batch, sink, cfg, batchId)
      totals.updateAndGet(_ + res.totals)
      // lag: wall-clock minus the newest APPLIED event time (ts>>32 is
      // epoch seconds in the packed BSON-Timestamp encoding) — comes out
      // of applyBatch's namespace aggregation, not a second batch action
      res.maxAppliedTs.foreach(ts =>
        lag.set(System.currentTimeMillis() / 1000.0 - (ts >> 32).toDouble))
    }
    val q = src.writeStream
      .queryName(s"graft-apply-${changelogDir.hashCode}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(fn)
      .start()
    new Handle(q, totals, lag)
  }

  /** ST2 — catch-up: drain the current backlog and return final counts. */
  def catchUp(spark: SparkSession, changelogDir: String, sink: Catalog,
      cfg: MigratorConfig, checkpointDir: String, maxFilesPerTrigger: Int = 0): ApplyCounts = {
    val h = stream(spark, changelogDir, sink, cfg, checkpointDir,
      Trigger.AvailableNow(), maxFilesPerTrigger)
    h.awaitTermination()
    h.counts
  }
}
