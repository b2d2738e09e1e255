package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's meta/state workspace — the reference's `_neutrino`
  * database on the target (workspace.go:23-39). Holds:
  *  - the status log (K4: `Workspace.Log` appends `{_id: now, status}` to
  *    `_neutrino.logs`, workspace.go:125-133),
  *  - the replication state the engine itself maintains elsewhere: batch
  *    markers on data tables (K5, [[Catalog.merge]]) and Structured
  *    Streaming checkpoints (ST4) — Spark's scheduler replaces the task
  *    queue, so there is no `tasks` collection to manage (O1-O4).
  *
  * S9 (state-store scans) is the read side: [[logs]] and
  * [[Catalog.readMarker]].
  */
final class Workspace(spark: SparkSession, catalog: Catalog) {
  import Workspace._

  /** K4 — append a status row. The log is tiny and append-only; one
    * single-row parquet file per status keeps it a plain catalog table
    * (readable/diffable like any namespace). */
  def log(status: String): Unit = {
    import spark.implicits._
    // seq (monotonic nanoTime) breaks same-millisecond ordering ties
    catalog.write(LogsNs,
      Seq((System.currentTimeMillis(), System.nanoTime(), status))
        .toDF("ts", "seq", "status"),
      mode = "append")
  }

  /** S9 — the status log, oldest first (reference reads it back for the
    * web monitor's timeline). */
  def logs(): DataFrame = catalog.read(LogsNs).orderBy(asc("ts"), asc("seq"))

  /** Reset — drop the meta state (DropMetaDB + Reset,
    * workspace.go:42-51,78-87). Data namespaces are untouched; streaming
    * checkpoints live in the caller-owned checkpoint dir. */
  def reset(): Unit = {
    catalog.drop(LogsNs)
    catalog.drop(graft.ddl.Manifest.TableNs)
  }
}

object Workspace {
  val LogsNs = "graft_logs"
}
