package graft.ddl

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.config.MigratorConfig
import graft.sources.Catalog
import org.apache.spark.sql.SparkSession

/** DDL / physical-metadata replication — D1-D4 — captured as a MANIFEST
  * dataset instead of imperative admin commands.
  *
  * The reference replays DDL against the target cluster imperatively:
  * collection options incl. collation/capped/size/max
  * (collection_creator.go:19-86), index definitions (index_copier.go:14-62),
  * and sharding config — databases/collections/chunks from the `config` db,
  * zone tags, movePrimary/enableSharding/shardCollection, chunk pre-split
  * and round-robin moves (config_copier.go:42-342). A Spark/lake engine has
  * no server to admin: partitioning is chosen per write and "indexes" are
  * file statistics. What MUST survive is the metadata itself, so a
  * migration can (a) bootstrap a real sink (a Mongo adapter replays the
  * manifest through its native client) and (b) prove parity in tests.
  *
  * The manifest is plain case classes ⇄ JSON (round-trip tested) and
  * persists as a one-row-per-entry table in the sink catalog — the same
  * place the reference keeps its `_neutrino` metadata (workspace.go:23-39).
  *
  * Key documents (shard keys, chunk bounds, collations) ride as canonical
  * JSON strings — the same opaque-payload discipline as the copy path.
  */
final case class CollectionSpec(
    ns: String,
    capped: Boolean = false,
    sizeBytes: Long = 0L,
    maxDocs: Long = 0L,
    collationJson: String = "") // collection_creator.go:57-76

final case class IndexSpec(
    ns: String,
    name: String,
    keysJson: String, // e.g. {"k":1,"ts":-1} — field order significant
    unique: Boolean = false,
    collationJson: String = "") // index_copier.go:14-62 (mdb.IndexNS)

final case class DbSpec(
    db: String,
    partitioned: Boolean = false,
    primary: String = "") // ConfigDB, config_copier.go:34-39

final case class ShardedCollectionSpec(
    ns: String,
    keyJson: String,
    unique: Boolean = false) // ConfigCollection, config_copier.go:26-31

final case class ChunkSpec(
    ns: String,
    minJson: String,
    maxJson: String,
    shard: String) // ConfigChunk, config_copier.go:18-23

final case class Manifest(
    dbs: Seq[DbSpec] = Nil,
    collections: Seq[CollectionSpec] = Nil,
    indexes: Seq[IndexSpec] = Nil,
    shardedCollections: Seq[ShardedCollectionSpec] = Nil,
    chunks: Seq[ChunkSpec] = Nil) {

  /** T6 — apply the target-namespace rename to every entry, exactly as
    * the reference renames DDL during replay (config_copier.go:225-232,
    * collection_creator.go:69). */
  def withRenames(cfg: MigratorConfig): Manifest = Manifest(
    dbs = dbs,
    collections = collections.map(c => c.copy(ns = cfg.toNamespace(c.ns))),
    indexes = indexes.map(i => i.copy(ns = cfg.toNamespace(i.ns))),
    shardedCollections = shardedCollections.map(s => s.copy(ns = cfg.toNamespace(s.ns))),
    chunks = chunks.map(c => c.copy(ns = cfg.toNamespace(c.ns))))

  /** P3 — drop entries for namespaces the config excludes. */
  def filtered(cfg: MigratorConfig): Manifest = Manifest(
    dbs = dbs,
    collections = collections.filterNot(c => cfg.skipNamespace(c.ns)),
    indexes = indexes.filterNot(i => cfg.skipNamespace(i.ns)),
    shardedCollections = shardedCollections.filterNot(s => cfg.skipNamespace(s.ns)),
    chunks = chunks.filterNot(c => cfg.skipNamespace(c.ns)))

  def toJson: String = Manifest.mapper.writeValueAsString(this)
}

object Manifest {
  private[ddl] val mapper: ObjectMapper =
    new ObjectMapper().registerModule(DefaultScalaModule)

  /** The sink-side table the manifest persists into (the `_neutrino`
    * meta-collection analog). Underscore-free so plain catalogs list it. */
  val TableNs = "graft_manifest"

  def fromJson(json: String): Manifest = mapper.readValue(json, classOf[Manifest])

  /** Capture a manifest from a source catalog. A parquet/lake source has
    * no collection options, secondary indexes, or sharding config — the
    * capture degrades to the namespace list plus the implicit primary-key
    * index (the `_id_` index every Mongo collection has); a Mongo-backed
    * Catalog implementation overrides this with listCollections /
    * listIndexes / config.* reads filling every section. */
  def capture(source: Catalog): Manifest = {
    val namespaces = source.listNamespaces()
    Manifest(
      dbs = namespaces.map(_.takeWhile(_ != '.')).distinct.sorted.map(DbSpec(_)),
      collections = namespaces.map(ns => CollectionSpec(ns)),
      indexes = namespaces.map { ns =>
        IndexSpec(ns, "_id_", s"""{"${source.keyOf(ns)}":1}""")
      })
  }

  /** Persist into the sink catalog as one-row-per-entry (section, json)
    * — replayable by any adapter, diffable by tests. */
  def persist(spark: SparkSession, sink: Catalog, m: Manifest): Unit = {
    import spark.implicits._
    val rows =
      m.dbs.map(d => ("db", mapper.writeValueAsString(d))) ++
        m.collections.map(c => ("collection", mapper.writeValueAsString(c))) ++
        m.indexes.map(i => ("index", mapper.writeValueAsString(i))) ++
        m.shardedCollections.map(s => ("sharded", mapper.writeValueAsString(s))) ++
        m.chunks.map(c => ("chunk", mapper.writeValueAsString(c)))
    sink.write(TableNs, rows.toDF("section", "spec"))
  }

  /** Load a persisted manifest back from the sink catalog. */
  def load(spark: SparkSession, sink: Catalog): Manifest = {
    import spark.implicits._
    val rows = sink.read(TableNs).as[(String, String)].collect()
    def sec[T: scala.reflect.ClassTag](name: String, cls: Class[T]): Seq[T] =
      rows.filter(_._1 == name).map(r => mapper.readValue(r._2, cls)).toSeq
    Manifest(
      dbs = sec("db", classOf[DbSpec]),
      collections = sec("collection", classOf[CollectionSpec]),
      indexes = sec("index", classOf[IndexSpec]),
      shardedCollections = sec("sharded", classOf[ShardedCollectionSpec]),
      chunks = sec("chunk", classOf[ChunkSpec]))
  }

  /** D4 analog for a lake sink: the chunk map's only actionable content
    * is the partition count per namespace — evenly-spread key ranges map
    * onto `repartitionByRange(n, key)` at write time
    * (config_copier.go:244-342's pre-split/move collapses into this). */
  def suggestedPartitions(m: Manifest, ns: String): Option[Int] = {
    val n = m.chunks.count(_.ns == ns)
    if (n > 0) Some(n) else None
  }
}
