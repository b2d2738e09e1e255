package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Source/Sink/Catalog SPI (SURVEY §7.1-2).
  *
  * The reference discovers namespaces from a live MongoDB catalog
  * (GetQualifiedDBs/GetQualifiedNamespaces — mongo_utils.go:18-63, S5/S6)
  * and reads/writes through collection handles. Our engine abstracts that
  * behind this trait so the whole pipeline is connector-agnostic: the
  * parquet implementation below serves the test harness, and a MongoDB
  * Spark connector implementation is a thin adapter (same contract)
  * added when the connector jar is available.
  */
trait Catalog {
  /** Qualified namespaces (`db.coll`), system namespaces excluded —
    * reference filter: skip `system.*` except `system.js`, skip views
    * (mongo_utils.go:36-63, P5). */
  def listNamespaces(): Seq[String]

  /** Batch scan of one namespace — S1's source side. */
  def read(ns: String): DataFrame

  /** Append/overwrite write — K1's sink side. */
  def write(ns: String, df: DataFrame, mode: String = "overwrite"): Unit

  /** Idempotent upsert on the primary key: replay-safe like the
    * reference's dup-key-tolerant batchedCopy (task.go:83-105, K1).
    * Returns the post-upsert row count. */
  def upsert(ns: String, df: DataFrame, key: String): Long

  /** Atomic upsert+delete in ONE table commit — the sink side of the
    * oplog bulk apply (K2, BulkWriteOplogs oplog_utils.go:88-205).
    * `deletes` carries the keys to remove (column named `key`).
    * `marker`, when given, is a (name, value) recorded atomically WITH
    * the data commit — the K5/ST4 checkpoint analog
    * (SaveOplogTimestamp, workspace.go:276-288): a replayed micro-batch
    * can check [[readMarker]] and skip, making the streaming apply
    * exactly-once even though delivery is at-least-once.
    * Returns the post-merge row count. */
  def merge(ns: String, upserts: DataFrame, deletes: DataFrame, key: String,
      marker: Option[(String, String)] = None): Long

  /** Read back a marker recorded by [[merge]]; None if absent. */
  def readMarker(ns: String, name: String): Option[String]

  /** Primary-key ("_id") column for a namespace. */
  def keyOf(ns: String): String

  /** Drop a namespace — D5 analog. */
  def drop(ns: String): Unit

  /** Reference DoesDataExist guard (config_copier.go:114-130, D6). */
  def dataExists(ns: String): Boolean

  /** Filesystem path of one namespace's table — for callers that must
    * address the table's directory directly (e.g. tailing it as a file
    * stream), so layout knowledge (flat vs per-db subdirectory) stays
    * inside the catalog. */
  def tablePath(ns: String): String
}

/** Filesystem/parquet Catalog: one directory per "database", one
  * `<coll>.parquet` dir per collection.
  *
  * All filesystem access goes through the Hadoop [[FileSystem]] API
  * resolved from the directory URI, so the same code serves local disk,
  * HDFS, and S3A — the filesystems a 100 TB deployment actually uses.
  * (On S3A, rename is copy-not-atomic — deployments there swap this
  * implementation for a real table format — Delta/Iceberg MERGE —
  * behind the same trait.)
  *
  * == Bucketed incremental merge (`buckets` > 0) ==
  *
  * With `buckets = B`, a merged table lives as B hash-bucket partition
  * subdirectories (`graft_bucket=pmod(xxhash64(key), B)`); [[merge]]
  * rewrites ONLY the buckets containing touched keys — data I/O is
  * proportional to the batch, not the table, which is what makes a
  * streaming apply against a 100 TB table affordable (the reference's
  * per-document apply economics, oplog_utils.go:88-205). Untouched
  * bucket directories are carried into each new table version by
  * metadata-only renames. Reads prune to bucket subdirs via ordinary
  * partition pruning. Size B so one bucket ≈ one comfortable task
  * (e.g. 100 TB / 256 MB ≈ 4·10⁵ buckets).
  *
  * == Commit protocol (crash-safe, marker atomic with data) ==
  *
  * A merge publishes through: stage data + marker + metadata files →
  * write the `_graft_commit` sentinel LAST → rename live aside
  * (`p → p.__old__`) → move untouched bucket dirs aside→staging →
  * rename staging into place → delete the aside dir. Every step is
  * idempotent-resumable, and [[recover]] (run before any read/merge)
  * rolls an interrupted commit FORWARD when the sentinel proves the
  * staging dir complete, or BACK (discard staging) when it doesn't —
  * so a crash anywhere leaves the table either fully pre-merge (marker
  * absent ⇒ the micro-batch replays) or fully post-merge (marker
  * present ⇒ the replay is skipped): exactly-once either way. The
  * earlier delete-then-rename publish could lose the table to a crash
  * between the two steps. Single writer per table assumed (the
  * migrator owns its target), as in the reference. */
final class ParquetCatalog(
    val spark: SparkSession,
    val dir: String,
    val db: String = "local",
    keys: Map[String, String] = Map.empty,
    val buckets: Int = 0) extends Catalog {

  import ParquetCatalog._

  private val root = new Path(dir)
  private def fs: FileSystem = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def table(ns: String): String =
    if (ns.contains('.')) ns.substring(ns.indexOf('.') + 1) else ns

  private def path(ns: String): Path = new Path(root, s"${table(ns)}.parquet")
  private def stagingPath(ns: String): Path = new Path(root, s"${table(ns)}.parquet.__staging__")
  private def asidePath(ns: String): Path = new Path(root, s"${table(ns)}.parquet.__old__")
  // canonical JVM-wide coordination key: same directory + table ⇒ same
  // lock, whichever catalog instance (or db alias or path spelling) is
  // in hand
  private def coordKey(ns: String): String =
    fs.makeQualified(path(ns)).toString

  override def listNamespaces(): Seq[String] = {
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(n => s"$db.${n.stripSuffix(".parquet")}")
      .filterNot(ns => table(ns).startsWith("system.") && table(ns) != "system.js")
      .sorted
  }

  override def tablePath(ns: String): String = path(ns).toString

  override def read(ns: String): DataFrame = {
    recover(ns)
    val df = spark.read.parquet(path(ns).toString)
    // a bucketed table surfaces its partition column; the read contract
    // is the logical schema
    if (df.columns.contains(BucketCol)) df.drop(BucketCol) else df
  }

  override def write(ns: String, df: DataFrame, mode: String): Unit =
    df.write.mode(mode).parquet(path(ns).toString)

  override def upsert(ns: String, df: DataFrame, key: String): Long =
    merge(ns, df, df.select(col(key)).limit(0), key)

  /** Parquet has no server-side merge; equivalent semantics via anti-join
    * rewrite: keep existing rows whose key is in NEITHER the upsert batch
    * NOR the delete set, union the upserts (new wins), publish through
    * the crash-safe commit protocol (class doc). With `buckets` > 0 only
    * the touched buckets are read (partition pruning) and rewritten.
    * Counts come from `observe()` on the executed plans — no second scan
    * of the written table; the bucketed path tracks the table total
    * incrementally in a `_graft_count` metadata file. */
  override def merge(ns: String, upserts: DataFrame, deletes: DataFrame, key: String,
      marker: Option[(String, String)] = None): Long = {
    val ck = coordKey(ns)
    // entry critical section: recover leftovers, clear genuinely-stale
    // staging, and raise the live-merge flag — atomically with respect
    // to any concurrent reader's recover. The long staging write itself
    // runs OUTSIDE the lock; the flag is what keeps readers' recovery
    // hands off the in-flight staging/commit until the finally below.
    ParquetCatalog.lockFor(ck).synchronized {
      recover(ns)
      fs.delete(stagingPath(ns), true): Unit // stale staging from an abandoned run
      ParquetCatalog.liveMerges.add(ck): Unit
    }
    try {
      val n =
        if (buckets > 0) mergeBucketed(ns, upserts, deletes, key, marker)
        else mergePlain(ns, upserts, deletes, key, marker)
      commit(ns)
      n
    } finally { ParquetCatalog.liveMerges.remove(ck): Unit }
  }

  private def mergePlain(ns: String, upserts: DataFrame, deletes: DataFrame,
      key: String, marker: Option[(String, String)]): Long = {
    val st = stagingPath(ns)
    val touched = upserts.select(col(key)).unionByName(deletes.select(col(key))).distinct()
    val merged =
      if (!dataExists(ns)) upserts
      else read(ns).join(touched, Seq(key), "left_anti")
        .unionByName(upserts, allowMissingColumns = true)
    val obs = Observation()
    merged.observe(obs, count(lit(1)).as("rows"))
      // task-local sort (no exchange): key-ordered files give parquet
      // row-group min/max stats that prune point and range reads
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(st.toString)
    val n = obs.get("rows").asInstanceOf[Long]
    finishStaging(ns, st, touchedBuckets = None, total = n, marker)
    n
  }

  private def mergeBucketed(ns: String, upserts: DataFrame, deletes: DataFrame,
      key: String, marker: Option[(String, String)]): Long = {
    val p = path(ns)
    val st = stagingPath(ns)
    val bucketOf = pmod(xxhash64(col(key)), lit(buckets.toLong)).cast("int")
    val exists = dataExists(ns)
    val bucketedLayout = exists && fs.listStatus(p)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith(BucketCol + "="))
    val up = upserts.withColumn(BucketCol, bucketOf)
    val touchedKeys = upserts.select(col(key))
      .unionByName(deletes.select(col(key))).distinct().persist()
    try {
      val curObs = Observation()
      val mergedObs = Observation()
      // incremental only against an already-bucketed table; a plain table
      // (or a fresh one) takes one full write into the bucketed layout
      val (current, touchedList) =
        if (!exists) (None, None)
        else if (!bucketedLayout)
          (Some(spark.read.parquet(p.toString).withColumn(BucketCol, bucketOf)), None)
        else {
          val tb = touchedKeys.select(bucketOf.as(BucketCol)).distinct()
            .collect().map(_.getInt(0)).sorted
          val pruned = spark.read.parquet(p.toString)
            .filter(col(BucketCol).isin(tb.toIndexedSeq: _*))
          (Some(pruned), Some(tb.toSeq))
        }
      val merged = current match {
        case None => up
        case Some(cur) =>
          cur.observe(curObs, count(lit(1)).as("rows"))
            .join(touchedKeys, Seq(key), "left_anti")
            .unionByName(up, allowMissingColumns = true)
      }
      merged.observe(mergedObs, count(lit(1)).as("rows"))
        // task-local sort by (bucket, key) — no exchange. Two wins: the
        // partitionBy writer streams ONE open file per task instead of
        // one per bucket it touches (at B ≈ 4·10⁵ concurrent writers
        // would dominate executor memory), and key-ordered files carry
        // tight parquet row-group min/max stats for read-side pruning.
        .sortWithinPartitions(col(BucketCol), col(key))
        .write.mode("overwrite").partitionBy(BucketCol).parquet(st.toString)
      val newTouched = mergedObs.get("rows").asInstanceOf[Long]
      val total = touchedList match {
        case None => newTouched // full write: the observation IS the total
        case Some(_) =>
          val oldTouched = curObs.get("rows").asInstanceOf[Long]
          // pre-merge total: maintained incrementally; a bucketed table
          // without the metadata file (external writer) pays one scan
          val oldTotal = readMeta(new Path(p, CountFile)).map(_.toLong)
            .getOrElse(read(ns).count())
          oldTotal - oldTouched + newTouched
      }
      finishStaging(ns, st, touchedList, total, marker)
      total
    } finally { touchedKeys.unpersist(false); () }
  }

  /** Stage metadata: marker, touched-bucket list, incremental row count,
    * then the sentinel LAST — its presence proves the staging dir
    * complete, which is what licenses roll-forward in [[recover]]. */
  private def finishStaging(ns: String, st: Path, touchedBuckets: Option[Seq[Int]],
      total: Long, marker: Option[(String, String)]): Unit = {
    if (!fs.exists(st)) fs.mkdirs(st): Unit // empty merge result still commits
    marker.foreach { case (name, value) => writeMeta(new Path(st, s"_graft_$name"), value) }
    writeMeta(new Path(st, TouchedFile), touchedBuckets.map(_.mkString(",")).getOrElse("*"))
    writeMeta(new Path(st, CountFile), total.toString)
    writeMeta(new Path(st, Sentinel), "")
  }

  /** Test-only failpoint: name a commit step to die after (specs use it
    * to pin [[recover]] against every mid-commit crash state). */
  private[sources] var crashPoint: String = ""
  private def maybeCrash(point: String): Unit =
    if (crashPoint == point) throw new IllegalStateException(s"injected crash at $point")

  /** Publish a complete staging dir (sentinel present). Resumable from
    * any crash point — see [[recover]]. */
  private def commit(ns: String): Unit = {
    val p = path(ns); val st = stagingPath(ns); val aside = asidePath(ns)
    if (fs.exists(p))
      require(fs.rename(p, aside), s"failed to move $p aside")
    maybeCrash("after-aside")
    carryUntouched(st, aside)
    maybeCrash("after-carry")
    require(fs.rename(st, p), s"failed to publish staging into $p")
    maybeCrash("after-publish")
    fs.delete(aside, true): Unit
  }

  /** Move every untouched bucket dir of the aside (pre-merge) table into
    * staging — metadata-only renames, no data I/O. A touched bucket is
    * NEVER moved even when absent from staging: absence there means the
    * merge emptied it. Idempotent (skips already-moved dirs) so an
    * interrupted carry simply re-runs. */
  private def carryUntouched(st: Path, aside: Path): Unit = {
    if (!fs.exists(aside)) return
    readMeta(new Path(st, TouchedFile)) match {
      case Some("*") | None => // full table in staging: nothing to carry
      case Some(list) =>
        val touched = list.split(',').filter(_.nonEmpty).toSet
        fs.listStatus(aside).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(BucketCol + "="))
          .foreach { s =>
            val name = s.getPath.getName
            val id = name.stripPrefix(BucketCol + "=")
            if (!touched.contains(id) && !fs.exists(new Path(st, name)))
              require(fs.rename(s.getPath, new Path(st, name)),
                s"failed to carry bucket $name")
          }
    }
  }

  /** Crash recovery, run before any read or merge. Rolls an interrupted
    * commit FORWARD when staging carries the sentinel and the live dir
    * was already moved aside (the batch's data+marker are complete), and
    * BACK otherwise (incomplete staging is discarded; the batch replays
    * against the intact pre-merge table). */
  private def recover(ns: String): Unit = {
    val ck = coordKey(ns)
    val l = ParquetCatalog.lockFor(ck)
    // a merge on this table is in flight IN THIS JVM: its staging dir is
    // live work, not a crash leftover — recovery must not touch anything
    // (deleting "stale" staging here is exactly the read-vs-write race
    // that kills the writer's tasks). The writer owns the state machine
    // until its finally clears the flag.
    if (!ParquetCatalog.liveMerges.contains(ck)) {
      l.synchronized {
        if (!ParquetCatalog.liveMerges.contains(ck)) recoverLocked(ns)
      }
    }
  }

  /** The actual recovery state machine — callers hold the ns lock. */
  private def recoverLocked(ns: String): Unit = {
    val p = path(ns); val st = stagingPath(ns); val aside = asidePath(ns)
    val stComplete = fs.exists(new Path(st, Sentinel))
    if (fs.exists(aside)) {
      if (stComplete) commit(ns) // aside exists ⇒ live was moved: roll forward
      else if (!fs.exists(p)) {
        // inconsistent leftovers without a provably-complete staging:
        // restore the pre-merge table
        fs.delete(st, true): Unit
        require(fs.rename(aside, p), s"failed to restore $p from $aside")
      } else fs.delete(aside, true): Unit // publish finished; aside is garbage
    } else if (stComplete && !fs.exists(p)) {
      // first-ever merge crashed between sentinel and publish
      commit(ns)
    } else if (fs.exists(st) && !stComplete) {
      fs.delete(st, true): Unit // died while staging: discard
    }
    // remaining case: staging complete but live intact and no aside —
    // the commit never started, the marker was never published; leave the
    // staging dir for the next merge to clear and redo (roll back)
  }

  private def writeMeta(f: Path, value: String): Unit = {
    val out = fs.create(f, true)
    try out.write(value.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readMeta(f: Path): Option[String] =
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }

  override def readMarker(ns: String, name: String): Option[String] = {
    recover(ns)
    readMeta(new Path(path(ns), s"_graft_$name"))
  }

  override def keyOf(ns: String): String =
    keys.getOrElse(table(ns), graft.Tables.keys.getOrElse(table(ns), "_id"))

  override def drop(ns: String): Unit = {
    fs.delete(path(ns), true): Unit
    fs.delete(stagingPath(ns), true): Unit
    fs.delete(asidePath(ns), true): Unit
  }

  override def dataExists(ns: String): Boolean = {
    recover(ns)
    val p = path(ns)
    fs.exists(p) && (fs.getFileStatus(p).isFile || fs.listStatus(p).nonEmpty)
  }
}

object ParquetCatalog {
  /** Hash-bucket partition column. NOT underscore-prefixed: Spark's file
    * index treats `_`/`.`-prefixed paths as hidden, which would hide the
    * bucket partition dirs from every read. */
  val BucketCol = "graft_bucket"
  private val Sentinel = "_graft_commit"
  private val TouchedFile = "_graft_touched"
  private val CountFile = "_graft_count"

  /** JVM-wide per-(root, table) coordination — shared across ALL catalog
    * instances over the same directory (the streaming writer, a status
    * reader, a compare job, and a test's poll loop each construct their
    * own instance). Two jobs:
    *
    *  - `nsLocks` serializes [[ParquetCatalog.recover]] mutations and
    *    the merge-entry critical section, so two readers can't both
    *    roll a crashed commit forward (racing renames);
    *  - `liveMerges` marks a merge in flight, so a READER's recover
    *    cannot mistake the writer's in-progress staging dir (sentinel
    *    not yet written) for a crashed one and delete it out from under
    *    the running write job — the race that killed a live tail under
    *    concurrent read load.
    *
    * Cross-PROCESS crash recovery is untouched: a fresh JVM starts with
    * an empty `liveMerges`, so genuine leftovers recover on first
    * access. Concurrent writers from DIFFERENT processes to one table
    * remain unsupported (single-writer catalogs, reference semantics);
    * concurrent readers in other processes should treat transient read
    * failures during a commit as retryable, as all graft readers do. */
  private val nsLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val liveMerges = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def lockFor(key: String): Object =
    nsLocks.computeIfAbsent(key, _ => new Object)
}

/** Multi-database parquet catalog — S5's full shape: one subdirectory
  * per database under the root (`root/<db>/<coll>.parquet`), with the
  * reference's qualified-DB filter (GetQualifiedDBs excludes
  * `admin`/`config`/`local` and the meta database, mongo_utils.go:18-33).
  * Each database delegates to a per-db [[ParquetCatalog]], so all
  * read/write/merge semantics are identical. */
final class MultiDbParquetCatalog(
    val spark: SparkSession,
    val rootDir: String,
    metaDb: String = "graft_meta",
    buckets: Int = 0) extends Catalog {

  private val root = new Path(rootDir)
  private def fs: FileSystem = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val SystemDbs = Set("admin", "config", "local")

  /** S5 — qualified database names. */
  def listDatabases(): Seq[String] = {
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(db => SystemDbs.contains(db) || db == metaDb)
      .sorted
  }

  private def dbCatalog(db: String): ParquetCatalog =
    new ParquetCatalog(spark, s"$rootDir/$db", db, buckets = buckets)

  private def forNs(ns: String): ParquetCatalog =
    dbCatalog(graft.config.Namespaces.split(ns)._1)

  override def listNamespaces(): Seq[String] =
    listDatabases().flatMap(db => dbCatalog(db).listNamespaces())

  override def read(ns: String): DataFrame = forNs(ns).read(ns)
  override def write(ns: String, df: DataFrame, mode: String): Unit =
    forNs(ns).write(ns, df, mode)
  override def upsert(ns: String, df: DataFrame, key: String): Long =
    forNs(ns).upsert(ns, df, key)
  override def merge(ns: String, upserts: DataFrame, deletes: DataFrame, key: String,
      marker: Option[(String, String)] = None): Long =
    forNs(ns).merge(ns, upserts, deletes, key, marker)
  override def readMarker(ns: String, name: String): Option[String] =
    forNs(ns).readMarker(ns, name)
  override def keyOf(ns: String): String = forNs(ns).keyOf(ns)
  override def drop(ns: String): Unit = forNs(ns).drop(ns)
  override def dataExists(ns: String): Boolean = forNs(ns).dataExists(ns)
  override def tablePath(ns: String): String = forNs(ns).tablePath(ns)
}
