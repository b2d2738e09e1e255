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
}

/** Filesystem/parquet Catalog: one directory per "database", one
  * `<coll>.parquet` dir per collection.
  *
  * All filesystem access goes through the Hadoop [[FileSystem]] API
  * resolved from the directory URI, so the same code serves local disk,
  * HDFS, and S3A — the filesystems a 100 TB deployment actually uses.
  * Commits are staged-dir + rename: rename is atomic on HDFS/local
  * (S3A deployments would swap this implementation for a real table
  * format — Delta/Iceberg MERGE — behind the same trait).
  */
final class ParquetCatalog(
    val spark: SparkSession,
    val dir: String,
    val db: String = "local",
    keys: Map[String, String] = Map.empty) extends Catalog {

  private val root = new Path(dir)
  private def fs: FileSystem = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def table(ns: String): String =
    if (ns.contains('.')) ns.substring(ns.indexOf('.') + 1) else ns

  private def path(ns: String): Path = new Path(root, s"${table(ns)}.parquet")

  override def listNamespaces(): Seq[String] = {
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(n => s"$db.${n.stripSuffix(".parquet")}")
      .filterNot(ns => table(ns).startsWith("system.") && table(ns) != "system.js")
      .sorted
  }

  override def read(ns: String): DataFrame = spark.read.parquet(path(ns).toString)

  override def write(ns: String, df: DataFrame, mode: String): Unit =
    df.write.mode(mode).parquet(path(ns).toString)

  override def upsert(ns: String, df: DataFrame, key: String): Long =
    merge(ns, df, df.select(col(key)).limit(0), key)

  /** Parquet has no server-side merge; equivalent semantics via anti-join
    * rewrite: keep existing rows whose key is in NEITHER the upsert batch
    * NOR the delete set, union the upserts (new wins), atomically swap
    * directories. The post-merge count comes from `observe()` on the
    * merged plan — one job, no second scan of the written table. */
  override def merge(ns: String, upserts: DataFrame, deletes: DataFrame, key: String,
      marker: Option[(String, String)] = None): Long = {
    val p = path(ns)
    val touched = upserts.select(col(key)).unionByName(deletes.select(col(key))).distinct()
    val merged =
      if (!dataExists(ns)) upserts
      else read(ns).join(touched, Seq(key), "left_anti")
        .unionByName(upserts, allowMissingColumns = true)
    val obs = Observation()
    val staging = new Path(root, s"${table(ns)}.parquet.__staging__")
    merged.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").parquet(staging.toString)
    // record the marker INSIDE the staged dir: underscore-prefixed files
    // are invisible to parquet reads, and the rename below publishes the
    // marker and the data in the same atomic commit.
    marker.foreach { case (name, value) =>
      val out = fs.create(new Path(staging, s"_graft_$name"), true)
      try out.write(value.getBytes(StandardCharsets.UTF_8)) finally out.close()
    }
    fs.delete(p, true)
    require(fs.rename(staging, p), s"failed to swap staging dir into $p")
    obs.get("rows").asInstanceOf[Long]
  }

  override def readMarker(ns: String, name: String): Option[String] = {
    val f = new Path(path(ns), s"_graft_$name")
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  override def keyOf(ns: String): String =
    keys.getOrElse(table(ns), graft.Tables.keys.getOrElse(table(ns), "_id"))

  override def drop(ns: String): Unit = { fs.delete(path(ns), true); () }

  override def dataExists(ns: String): Boolean = {
    val p = path(ns)
    fs.exists(p) && (fs.getFileStatus(p).isFile || fs.listStatus(p).nonEmpty)
  }
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
    metaDb: String = "graft_meta") extends Catalog {

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
    new ParquetCatalog(spark, s"$rootDir/$db", db)

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
}
