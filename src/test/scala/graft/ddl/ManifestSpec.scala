package graft.ddl

import graft.SparkSpec
import graft.config.MigratorConfig
import graft.sources.ParquetCatalog

import java.nio.file.Files

class ManifestSpec extends SparkSpec {

  private val full = Manifest(
    dbs = Seq(DbSpec("app", partitioned = true, primary = "rs0")),
    collections = Seq(
      CollectionSpec("app.orders", capped = true, sizeBytes = 1 << 20, maxDocs = 1000),
      CollectionSpec("app.logs", collationJson = """{"locale":"fr","strength":1}""")),
    indexes = Seq(
      IndexSpec("app.orders", "k_ts", """{"k":1,"ts":-1}""", unique = true),
      IndexSpec("app.orders", "_id_", """{"_id":1}""")),
    shardedCollections = Seq(ShardedCollectionSpec("app.orders", """{"k":"hashed"}""")),
    chunks = Seq(
      ChunkSpec("app.orders", """{"k":{"$minKey":1}}""", """{"k":500}""", "rs0"),
      ChunkSpec("app.orders", """{"k":500}""", """{"k":{"$maxKey":1}}""", "rs1")))

  test("JSON round-trip preserves every section") {
    assert(Manifest.fromJson(full.toJson) == full)
  }

  test("withRenames + filtered mirror T6/P3 on DDL (config_copier.go:225-232)") {
    val cfg = MigratorConfig(command = "all", source = "s", target = "t",
      includes = Seq(graft.config.IncludeSpec("app.orders", to = "tgt.orders2")))
    val renamed = full.withRenames(cfg)
    assert(renamed.collections.head.ns == "tgt.orders2")
    assert(renamed.indexes.forall(_.ns == "tgt.orders2"))
    assert(renamed.chunks.forall(_.ns == "tgt.orders2"))
    val kept = full.filtered(cfg)
    assert(kept.collections.map(_.ns) == Seq("app.orders")) // app.logs excluded
  }

  test("persist/load round-trips through a catalog table") {
    val sink = new ParquetCatalog(spark,
      Files.createTempDirectory("graft-ddl").toString, "tgt")
    Manifest.persist(spark, sink, full)
    val back = Manifest.load(spark, sink)
    assert(back.dbs.toSet == full.dbs.toSet)
    assert(back.collections.toSet == full.collections.toSet)
    assert(back.indexes.toSet == full.indexes.toSet)
    assert(back.shardedCollections.toSet == full.shardedCollections.toSet)
    assert(back.chunks.toSet == full.chunks.toSet)
  }

  test("capture degrades gracefully on a schemaless parquet source") {
    val src = new ParquetCatalog(spark, sf0001, "src")
    val m = Manifest.capture(src)
    assert(m.collections.map(_.ns).contains("src.orders"))
    assert(m.indexes.find(_.ns == "src.orders").get.keysJson == """{"o_orderkey":1}""")
    assert(m.dbs.map(_.db) == Seq("src"))
  }

  test("chunk map suggests write partitioning (D4 analog)") {
    assert(Manifest.suggestedPartitions(full, "app.orders").contains(2))
    assert(Manifest.suggestedPartitions(full, "app.other").isEmpty)
  }
}
