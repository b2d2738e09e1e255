package graft.copy

import graft.SparkSpec
import graft.config.MigratorConfig
import graft.ops.RangeSplitter
import graft.sources.ParquetCatalog
import org.apache.spark.sql.functions._

import java.nio.file.Files

class CopyJobSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_copy").toString

  private lazy val source = new ParquetCatalog(spark, sf0001, "src")

  test("catalog lists qualified namespaces") {
    val ns = source.listNamespaces()
    assert(ns.contains("src.lineitem") && ns.contains("src.orders"))
    assert(ns.size == 10)
  }

  test("plan expands wildcards and maps includes") {
    val cfg = MigratorConfig.parse(
      """{"command":"all","source":"s","target":"t",
        |"includes":[{"namespace":"src.*"}]}""".stripMargin)
    assert(CopyJob.plan(cfg, source).size == 10)
    val cfg2 = MigratorConfig.parse(
      """{"command":"all","source":"s","target":"t",
        |"includes":[{"namespace":"src.orders","to":"src.orders2"},
        |            {"namespace":"*.nation"}]}""".stripMargin)
    val p2 = CopyJob.plan(cfg2, source)
    assert(p2.map(_._1).sorted == Seq("src.nation", "src.orders"))
    assert(p2.find(_._1 == "src.orders").get._2.get.toNamespace == "src.orders2")
  }

  test("wildcard include copies each expansion under its OWN name, never the literal db.*") {
    // regression: copyNamespace/preflight used spec.toNamespace, which
    // for a wildcard include with empty `to` returns the literal
    // "wdb.*" — every expansion then upserts into ONE "wdb.*" table
    val srcDir = tmpDir()
    val wsrc = new ParquetCatalog(spark, srcDir, "wdb")
    wsrc.write("wdb.a", spark.range(5).select(col("id").as("_id"), lit("a").as("t")))
    wsrc.write("wdb.b", spark.range(9).select(col("id").as("_id"), lit("b").as("t")))
    val out = tmpDir()
    val sink = new ParquetCatalog(spark, out, "tgt")
    val cfg = MigratorConfig.parse(
      """{"command":"all","source":"s","target":"t","drop":true,
        |"includes":[{"namespace":"wdb.*"}]}""".stripMargin)
    val res = CopyJob.run(cfg, wsrc, sink)
    assert(res.size == 2)
    // each lands under its own name (the sink's db is tgt, table kept)
    assert(res.forall(r => r.to == r.namespace))
    assert(sink.read("wdb.a").count() == 5)
    assert(sink.read("wdb.b").count() == 9)
    assert(!sink.dataExists("wdb.*"))
    // an exact rename alongside the wildcard still routes that one table
    val out2 = tmpDir()
    val sink2 = new ParquetCatalog(spark, out2, "tgt")
    val cfg2 = MigratorConfig.parse(
      """{"command":"all","source":"s","target":"t","drop":true,
        |"includes":[{"namespace":"*.nation"},
        |            {"namespace":"src.region","to":"src.region2"}]}""".stripMargin)
    val res2 = CopyJob.run(cfg2, source, sink2)
    assert(res2.map(r => r.namespace -> r.to).toMap ==
      Map("src.nation" -> "src.nation", "src.region" -> "src.region2"))
    assert(sink2.dataExists("src.region2") && !sink2.dataExists("src.region"))
  }

  test("filter+limit+mask+rename copy end-to-end (§7.2 flagship slice)") {
    val out = tmpDir()
    val sink = new ParquetCatalog(spark, out, "tgt")
    val cfg = MigratorConfig.parse(
      """{"command":"all","source":"s","target":"t","drop":true,
        |"includes":[{"namespace":"src.orders","to":"tgt.orders_f",
        |  "filter": {"o_orderstatus": {"$in": ["F"]}},
        |  "masks": ["o_orderpriority"], "method": "partial"}]}""".stripMargin)
    val res = CopyJob.run(cfg, source, sink)
    assert(res.size == 1)
    val copied = sink.read("tgt.orders_f")
    val expect = source.read("src.orders").filter($"o_orderstatus" === "F")
    assert(copied.count() == expect.count())
    assert(res.head.rowsRead == expect.count())
    // masked: all but last 4 chars X'd
    val pri = copied.select("o_orderpriority").as[String].head()
    assert(pri.matches("X+-.*") || pri.length <= 4 || !pri.take(pri.length - 4).exists(_.isLetterOrDigit))
  }

  test("upsert is idempotent — reference TestCopyData semantics") {
    // target already holds 3 of 10 docs; copying all 10 ends at exactly 10
    val out = tmpDir()
    val sink = new ParquetCatalog(spark, out, "tgt")
    val ten = spark.range(100, 110).toDF("_id").withColumn("v", $"_id" * 2)
    sink.write("tgt.c", ten.filter($"_id" < 103))
    val total = sink.upsert("tgt.c", ten, "_id")
    assert(total == 10)
    // replaying the same copy stays at 10
    assert(sink.upsert("tgt.c", ten, "_id") == 10)
    // and new values win over old
    val updated = ten.withColumn("v", $"_id" * 3)
    sink.upsert("tgt.c", updated, "_id")
    assert(sink.read("tgt.c").filter($"v" === $"_id" * 3).count() == 10)
  }

  test("non-empty target without drop is refused (D6 guard)") {
    val out = tmpDir()
    val sink = new ParquetCatalog(spark, out, "tgt")
    sink.write("tgt.nation", source.read("src.nation"))
    val cfg = MigratorConfig.parse(
      """{"command":"all","source":"s","target":"t",
        |"includes":[{"namespace":"src.nation","to":"tgt.nation"}]}""".stripMargin)
    intercept[IllegalStateException] { CopyJob.run(cfg, source, sink) }
  }

  test("pre-flight failure on a LATER namespace mutates nothing (two-pass guard)") {
    // nation empty on target, orders non-empty: the guard must reject the
    // run BEFORE dropping/writing anything — a half-dropped target was
    // the round-1/2 defect (reference guards all namespaces up front,
    // config_copier.go:114-130)
    val out = tmpDir()
    val sink = new ParquetCatalog(spark, out, "tgt")
    sink.write("tgt.orders", source.read("src.orders").limit(5))
    val before = sink.read("tgt.orders").collect().toSet
    val cfg = MigratorConfig.parse(
      """{"command":"all","source":"s","target":"t",
        |"includes":[{"namespace":"src.nation","to":"tgt.nation"},
        |            {"namespace":"src.orders","to":"tgt.orders"}]}""".stripMargin)
    val e = intercept[IllegalStateException] { CopyJob.run(cfg, source, sink) }
    assert(e.getMessage.contains("tgt.orders"))
    // nothing was dropped or written
    assert(!sink.dataExists("tgt.nation"))
    assert(sink.read("tgt.orders").collect().toSet == before)
  }

  test("range splitter exact bounds cover all rows disjointly (X1)") {
    val df = source.read("src.orders")
    val block = 1000
    val bounds = RangeSplitter.exactBounds(df, "o_orderkey", block).collect()
    val total = df.count()
    assert(bounds.map(_.getAs[Long]("source_count")).sum == total)
    assert(bounds.init.forall(_.getAs[Long]("source_count") == block))
    // ranges are disjoint and ordered
    val pairs = bounds.map(r => (r.getAs[Long]("id_first"), r.getAs[Long]("id_last")))
    pairs.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("repartitionByKeyRange yields disjoint balanced partitions") {
    val df = source.read("src.lineitem")
    val parts = RangeSplitter.repartitionByKeyRange(df, "l_orderkey", 8)
    assert(parts.rdd.getNumPartitions == 8)
    import org.apache.spark.sql.Row
    val ranges = parts.select("l_orderkey").rdd
      .mapPartitionsWithIndex { (i, it) =>
        val keys = it.map(_.asInstanceOf[Row].getLong(0))
        if (keys.isEmpty) Iterator.empty
        else { val s = keys.toSeq; Iterator((i, s.min, s.max)) }
      }.collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("multi-db catalog lists qualified dbs and routes namespaces (S5)") {
    val root = tmpDir()
    val multi = new graft.sources.MultiDbParquetCatalog(spark, root)
    multi.write("app.orders", source.read("src.orders").limit(10))
    multi.write("app2.nation", source.read("src.nation"))
    multi.write("local.junk", source.read("src.region"))   // system db: hidden
    multi.write("graft_meta.x", source.read("src.region")) // meta db: hidden
    assert(multi.listDatabases() == Seq("app", "app2"))
    assert(multi.listNamespaces() == Seq("app.orders", "app2.nation"))
    assert(multi.read("app.orders").count() == 10)
    assert(multi.upsert("app.orders", source.read("src.orders").limit(20), "o_orderkey") == 20)
    multi.drop("app.orders")
    assert(!multi.dataExists("app.orders"))
    // system-db data still physically readable through its own path
    assert(multi.read("local.junk").count() == source.read("src.region").count())
  }
}
