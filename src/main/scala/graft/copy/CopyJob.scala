package graft.copy

import graft.config.{IncludeSpec, MigratorConfig, Namespaces}
import graft.ops.Mask
import graft.sources.Catalog
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

import scala.collection.parallel.CollectionConverters._

/** The bulk-copy pipeline — the Spark shape of the reference's flagship
  * `-start` path (SURVEY §3.1): catalog expand (wildcards P3/P5) → per
  * namespace: filter (P1) → limit (P7, wired — unwired in the reference)
  * → mask (T1-T4, wired) → rename (T6) → idempotent sink write (K1).
  *
  * Everything the reference hand-builds around this — task queue, range
  * split, claim/straggler/resume orchestration (§2.10) — collapses into
  * Spark's scheduler: each namespace is one job whose partitions are the
  * "tasks", speculative execution replaces the straggler maid, and
  * re-running the job is safe because the sink upserts on the key.
  */
object CopyJob {

  final case class CopyResult(namespace: String, to: String, rowsRead: Long, rowsInTarget: Long)

  /** Expand config includes against the source catalog — wildcard
    * namespaces (`db.*`, `*.coll`) resolve to concrete ones; empty
    * include list means every qualified namespace (migrator.go:237-251).
    * Returns (namespace, spec-or-none) pairs. */
  def plan(cfg: MigratorConfig, source: Catalog): Seq[(String, Option[IncludeSpec])] = {
    val all = source.listNamespaces()
    val matched = all.filterNot(cfg.skipNamespace)
    matched.map { ns =>
      val (db, coll) = Namespaces.split(ns)
      val spec = cfg.includes.find(_.namespace == ns)
        .orElse(cfg.includes.find(_.namespace == s"$db.*"))
        .orElse(cfg.includes.find(_.namespace == s"*.$coll"))
      ns -> spec
    }
  }

  /** Target namespace for `ns`: the `to` rename applies only when the
    * spec names this EXACT namespace. A wildcard include's spec still
    * carries filter/limit/masks for every expansion it matched, but its
    * literal `db.*` namespace string (which `IncludeSpec.toNamespace`
    * falls back to when `to` is empty) must never become a write
    * target — every expansion of the wildcard would collapse into one
    * `db.*` table. Same exact-match-only contract as
    * `MigratorConfig.toNamespace`, which the DDL manifest and the oplog
    * apply path already use. */
  def targetOf(ns: String, spec: Option[IncludeSpec]): String =
    spec.collect { case s if s.namespace == ns => s.toNamespace }.getOrElse(ns)

  /** The per-namespace transform chain. Declarative all the way: the
    * filter Column pushes into the scan, limit becomes GlobalLimit,
    * masking is one projection. */
  def transform(df: DataFrame, spec: IncludeSpec): DataFrame = {
    var out = df
    if (spec.hasFilter) out = out.filter(spec.predicate)
    if (spec.limit > 0) out = out.limit(spec.limit.toInt)
    if (spec.masks.nonEmpty) out = Mask.maskFields(out, spec.masks, spec.method)
    out
  }

  /** Run the copy for one namespace; returns observed counts (the
    * reference's per-task inserted rollup A3 via `observe`, no second
    * scan). */
  def copyNamespace(source: Catalog, sink: Catalog, ns: String,
      spec: Option[IncludeSpec]): CopyResult = {
    val key = source.keyOf(ns)
    val obs = Observation(s"copy_$ns")
    val base = source.read(ns)
    val transformed = spec.map(transform(base, _)).getOrElse(base)
      .observe(obs, count(lit(1)).as("rows"))
    val to = targetOf(ns, spec)
    val total = sink.upsert(to, transformed, key)
    CopyResult(ns, to, obs.get("rows").asInstanceOf[Long], total)
  }

  /** Whole-config run: pre-flight guards (D5/D6), then all namespaces.
    * Namespace jobs are independent Spark jobs — submit them from a
    * parallel collection so executors stay busy across jobs, the Spark
    * analog of the reference's worker pool. */
  def run(cfg: MigratorConfig, source: Catalog, sink: Catalog): Seq[CopyResult] = {
    val planned = plan(cfg, source)
    preflight(cfg, planned, sink)
    runTracked(planned, source, sink)._1
  }

  /** Two-pass pre-flight, mirroring the reference's guard-before-mutate
    * discipline (DoesDataExist loops over ALL namespaces before any
    * copy, config_copier.go:114-130): first validate every target, then
    * — and only then — mutate. A failure on the Nth namespace must
    * leave the target untouched. */
  def preflight(cfg: MigratorConfig, planned: Seq[(String, Option[IncludeSpec])],
      sink: Catalog): Unit = {
    val targets = planned.map { case (ns, spec) => targetOf(ns, spec) }
    if (!cfg.isDrop) {
      val nonEmpty = targets.filter(sink.dataExists)
      if (nonEmpty.nonEmpty)
        throw new IllegalStateException(
          s"target namespaces ${nonEmpty.mkString(", ")} are not empty; set drop=true")
    } else targets.foreach(sink.drop)
  }

  /** The copy fan-out with O5 progress tracking: scheduler-fed task
    * counters + the reference's elapsed×(1−p)/p ETA line
    * (data_copier.go:142-176), logged at completion and returned for
    * callers that surface live progress. */
  def runTracked(planned: Seq[(String, Option[IncludeSpec])], source: Catalog,
      sink: Catalog,
      publish: graft.monitor.Progress.ProgressListener => Unit = _ => ())
      : (Seq[CopyResult], graft.monitor.Progress.Snapshot) = {
    val (results, snap) = graft.monitor.Progress.tracked(
        org.apache.spark.sql.SparkSession.active, publish) {
      val par = planned.par
      par.map { case (ns, spec) => copyNamespace(source, sink, ns, spec) }.seq.toSeq
    }
    org.slf4j.LoggerFactory.getLogger(getClass)
      .info(s"copy done: ${snap.statusLine}")
    (results, snap)
  }
}
