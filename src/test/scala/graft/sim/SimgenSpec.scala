package graft.sim

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import graft.config.MigratorConfig
import graft.streaming.Oplog
import org.apache.spark.sql.functions._

class SimgenSpec extends SparkSpec {
  private val mapper = new ObjectMapper().configure(
    com.fasterxml.jackson.databind.DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
  private val cfg = MigratorConfig(command = "data", source = "s", target = "t")

  test("DocGen palette: every reference field class present (sim.go:305-333)") {
    val doc = Simgen.docs(spark, 3).orderBy("_id").head().getString(1)
    val n = mapper.readTree(doc)
    for (f <- Seq("_id", "color", "float64", "int64", "seq", "string", "ts",
        "array", "subdoc", "filler", "binary", "bin1", "bin2", "bin3", "uuid",
        "decimal128"))
      assert(n.has(f), s"missing palette field $f")
    // Decimal128 carrier: full 17+-significant-digit value, exact
    locally {
      val i = n.get("seq").asLong()
      val nn = i + 1001; val num = nn * nn + Simgen.Port
      assert(n.get("decimal128").decimalValue().toPlainString
        == s"$num$nn." + "%06d".format(i))
    }
    assert(n.get("_id").asText().length == 24)
    assert(n.get("array").size() == 9)
    // the subdoc embeds the doc as appended SO FAR (core + array;
    // filler/binaries are appended after it, sim.go:321) — assert full
    // field parity, not just the _id
    val level1 = n.get("subdoc").get("level1")
    for (f <- Seq("_id", "color", "float64", "int64", "seq", "string", "ts", "array"))
      assert(level1.has(f), s"subdoc.level1 missing $f")
    assert(level1.get("string").asText() == n.get("string").asText())
    assert(n.get("filler").asText().length >= 2500)
    assert(n.get("binary").get("subtype").asInt() == 4) // raw uuid value
    assert(n.get("uuid").get("subtype").asInt() == 4)
    // serialized payload matches the reference's generated-doc scale
    // (~3 KB of JSON: 2.5 KB filler + doubled core fields + binaries)
    assert(doc.length > 3000, s"generated doc only ${doc.length} bytes")
  }

  test("Decimal128 survives the apply/fold path byte-for-byte") {
    import spark.implicits._
    val log = Simgen.changeLog(spark, 12, "app.gen")
    val ops = graft.streaming.ApplyJob.compileOps(log.as[Oplog], cfg)
    val base = Seq.empty[(String, String)].toDF("id", "doc")
    val docs = graft.streaming.ApplyJob.foldDocs(base, ops)
      .filter(r => r.doc != null).collect()
    assert(docs.nonEmpty)
    val idToI = (0L until 12L).map(i => "\"" + Simgen.oidHex(i) + "\"" -> i).toMap
    docs.foreach { r =>
      val i = idToI(r.id)
      val nn = i + 1001; val num = nn * nn + Simgen.Port
      // byte-for-byte: survives both Spark's to_json (pure inserts) and
      // Jackson's parse→mutate→re-serialize (updated docs) — a default
      // double parse would have rounded the 17+ significant digits
      val want = s""""decimal128":$num$nn.""" + "%06d".format(i)
      assert(r.doc.contains(want), s"doc for i=$i lost decimal: ${r.doc.take(400)}")
    }
    // at n=12 the churn really does update docs in place: i%3/i%5/i%11
    // survivors must carry applied updates AND the intact decimal
    val updated = docs.filter(r => idToI(r.id) % 3 == 0)
    assert(updated.nonEmpty)
    // trailing comma pins the TOP-LEVEL int64 (subdoc's keeps the
    // original num value, which the bare prefix would also match)
    updated.foreach(r => assert(r.doc.contains(s""""int64":${idToI(r.id) + 1},""")))
  }

  test("DocGen is deterministic and distinct per index") {
    val a = Simgen.docs(spark, 5).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = Simgen.docs(spark, 5).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a.size == 5)
  }

  test("changeLog: op mix, schema, and skip-fodder (sim.go:125-239,347-398)") {
    val log = Simgen.changeLog(spark, 22, "app.gen")
    // names+types must line up with the wire schema (nullability of the
    // generated literals is allowed to be tighter)
    assert(log.schema.map(f => (f.name, f.dataType)) ==
      Oplog.schema.map(f => (f.name, f.dataType)))
    val byOp = log.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp("i") == 22 + 2) // inserts + 2 noise inserts (i=0,13)
    assert(byOp("u") == 8 + 5)  // i%3==0 (8) + i%5==0 (5)
    assert(byOp("d") == 4)      // i%7==0: 0,7,14,21
    assert(byOp("c") == 2)      // i%11==0 && i<21: 0, 11
    assert(byOp("n") == 2)

    import spark.implicits._
    val oplogs = log.as[Oplog].collect()
    // P4 drops the local.junk noise and empty-ns no-ops
    val kept = oplogs.filterNot(Oplog.skip(_, cfg))
    assert(kept.count(_.ns == "local.junk") == 0)
    assert(kept.count(_.op == "n") == 0)
    // ST6: each generated transaction unwraps to one update + one delete
    val txn = oplogs.filter(_.op == "c").head
    val inner = Oplog.unwrap(txn)
    assert(inner.map(_.op).sorted.toSeq == Seq("d", "u"))
    assert(inner.forall(_.ts == txn.ts)) // entries share the commit ts
  }

  test("changeLog compiles against its own docs: ids line up") {
    import spark.implicits._
    val log = Simgen.changeLog(spark, 10, "app.gen").as[Oplog].collect()
    val insertIds = log.filter(o => o.op == "i" && o.ns == "app.gen")
      .flatMap(o => Oplog.idOf(o.o)).toSet
    val ops = log.filterNot(Oplog.skip(_, cfg)).flatMap(Oplog.compile(_, cfg))
    // every non-insert op targets an id that an insert created
    assert(ops.filter(_.kind != "insert").forall(w => insertIds.contains(w.id)))
  }
}
