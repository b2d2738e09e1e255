package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Primary-key ("_id") column for a namespace. */
  def keyOf(ns: String): String

  /** Drop a namespace — D5 analog. */
  def drop(ns: String): Unit

  /** Reference DoesDataExist guard (config_copier.go:114-130, D6). */
  def dataExists(ns: String): Boolean
}

/** Filesystem/parquet Catalog: one directory per "database", one
  * `<coll>.parquet` file/dir per collection.
  *
  * At cluster scale this is the data-lake layout (one table dir per
  * namespace, snappy parquet, partitioned subdirs); locally it serves the
  * driver fixtures at /root/testdata/sf*. */
final class ParquetCatalog(
    val spark: SparkSession,
    val dir: String,
    val db: String = "local",
    keys: Map[String, String] = Map.empty) extends Catalog {

  private def table(ns: String): String =
    if (ns.contains('.')) ns.substring(ns.indexOf('.') + 1) else ns

  private def path(ns: String): String = s"$dir/${table(ns)}.parquet"

  override def listNamespaces(): Seq[String] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
    files.toSeq
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => s"$db.${f.getName.stripSuffix(".parquet")}")
      .filterNot(ns => table(ns).startsWith("system.") && table(ns) != "system.js")
      .sorted
  }

  override def read(ns: String): DataFrame = spark.read.parquet(path(ns))

  override def write(ns: String, df: DataFrame, mode: String): Unit =
    df.write.mode(mode).parquet(path(ns))

  /** Parquet has no server-side upsert; equivalent semantics via
    * anti-join merge: keep existing rows whose key is NOT in the new
    * batch, union the batch (new wins), atomically swap directories.
    * Real lake sinks (Delta/Iceberg) replace this with MERGE INTO; the
    * Mongo adapter with a bulk replace-upsert. */
  override def upsert(ns: String, df: DataFrame, key: String): Long = {
    val p = path(ns)
    val merged =
      if (!dataExists(ns)) df
      else {
        val existing = spark.read.parquet(p)
        existing.join(df.select(key).distinct(), Seq(key), "left_anti")
          .unionByName(df, allowMissingColumns = true)
      }
    val tmp = s"$p.__staging__"
    merged.write.mode("overwrite").parquet(tmp)
    // atomic-ish swap on the same filesystem
    deleteRecursively(new java.io.File(p))
    require(new java.io.File(tmp).renameTo(new java.io.File(p)),
      s"failed to swap staging dir into $p")
    spark.read.parquet(p).count()
  }

  override def keyOf(ns: String): String =
    keys.getOrElse(table(ns), graft.Tables.keys.getOrElse(table(ns), "_id"))

  override def drop(ns: String): Unit = deleteRecursively(new java.io.File(path(ns)))

  override def dataExists(ns: String): Boolean = {
    val f = new java.io.File(path(ns))
    f.exists() && (f.isFile || Option(f.listFiles()).exists(_.nonEmpty))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
