package graft.streaming

import graft.config.{IncludeSpec, MigratorConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the oplog compile path — mirrors the reference's
  * oplog_utils_test.go cases (TestGetWriteModels / update v1+v2) plus the
  * combined-diff case the reference silently mishandles (round-1 review).
  */
class OplogSpec extends AnyFunSuite {

  private val cfg = MigratorConfig(
    command = "all", source = "s", target = "t",
    includes = Seq(IncludeSpec(namespace = "testdb.neutrino")))

  private val noIncludes = MigratorConfig(command = "all", source = "s", target = "t")

  test("compile: insert op") {
    val ops = Oplog.compile(
      Oplog(1L, "i", "testdb.neutrino", """{"_id":101,"color":"Red"}""", null), noIncludes)
    assert(ops == Seq(WriteOp("testdb.neutrino", 1L, "insert", "101",
      """{"_id":101,"color":"Red"}""")))
  }

  test("compile: delete op keys off the object itself (oplog_utils.go:236-239)") {
    val ops = Oplog.compile(Oplog(2L, "d", "testdb.neutrino", """{"_id":101}""", null), noIncludes)
    assert(ops == Seq(WriteOp("testdb.neutrino", 2L, "delete", "101", """{"_id":101}""")))
  }

  test("compile: update v2 diff.u → $set (oplog_utils_test.go:108)") {
    val ops = Oplog.compile(Oplog(3L, "u", "testdb.neutrino",
      """{"$v":2,"diff":{"u":{"color":"Red"}}}""", """{"_id":101}"""), noIncludes)
    assert(ops == Seq(WriteOp("testdb.neutrino", 3L, "update", "101",
      """{"$set":{"color":"Red"}}""")))
  }

  test("compile: update v2 diff.d → $unset") {
    val ops = Oplog.compile(Oplog(4L, "u", "testdb.neutrino",
      """{"$v":2,"diff":{"d":{"color":false}}}""", """{"_id":101}"""), noIncludes)
    assert(ops == Seq(WriteOp("testdb.neutrino", 4L, "update", "101",
      """{"$unset":{"color":false}}""")))
  }

  test("compile: combined v2 diff {u,i,d} yields ONE $set+$unset op") {
    val ops = Oplog.compile(Oplog(5L, "u", "testdb.neutrino",
      """{"$v":2,"diff":{"u":{"a":1},"i":{"b":2},"d":{"c":false}}}""",
      """{"_id":7}"""), noIncludes)
    assert(ops == Seq(WriteOp("testdb.neutrino", 5L, "update", "7",
      """{"$set":{"a":1,"b":2},"$unset":{"c":false}}""")))
  }

  test("compile: update v1 $-prefixed op passes through, $v skipped") {
    val ops = Oplog.compile(Oplog(6L, "u", "testdb.neutrino",
      """{"$v":1,"$set":{"color":"Blue"}}""", """{"_id":123}"""), noIncludes)
    assert(ops == Seq(WriteOp("testdb.neutrino", 6L, "update", "123",
      """{"$set":{"color":"Blue"}}""")))
  }

  test("compile: plain update doc → full replace (oplog_utils.go:273-276)") {
    val ops = Oplog.compile(Oplog(7L, "u", "testdb.neutrino",
      """{"_id":5,"color":"Green","n":9}""", """{"_id":5}"""), noIncludes)
    assert(ops == Seq(WriteOp("testdb.neutrino", 7L, "replace", "5",
      """{"_id":5,"color":"Green","n":9}""")))
  }

  test("compile: n no-op and unrecognized ops → Nil") {
    assert(Oplog.compile(Oplog(8L, "n", "testdb.neutrino", "{}", null), noIncludes).isEmpty)
    assert(Oplog.compile(Oplog(8L, "x", "testdb.neutrino", "{}", null), noIncludes).isEmpty)
  }

  test("compile: c applyOps flattens recursively (oplog_utils.go:212-236)") {
    val txn =
      """{"applyOps":[
        |  {"op":"i","ns":"testdb.neutrino","o":{"_id":1,"v":10}},
        |  {"op":"u","ns":"testdb.neutrino","o":{"$v":2,"diff":{"u":{"v":11}}},"o2":{"_id":1}},
        |  {"op":"c","ns":"testdb.$cmd","o":{"applyOps":[
        |     {"op":"d","ns":"testdb.neutrino","o":{"_id":2}}]}}
        |]}""".stripMargin.replaceAll("\n\\s*", "")
    val ops = Oplog.compile(Oplog(9L, "c", "testdb.$cmd", txn, null), noIncludes)
    assert(ops.map(_.kind) == Seq("insert", "update", "delete"))
    // transaction entries share the commit ts; seq carries array order
    assert(ops.map(_.ts).forall(_ == 9L))
    assert(ops.map(_.seq) == Seq(0, 1, 2))
  }

  test("same-_id ops inside one transaction fold in array order, any input order") {
    // both entries inherit the commit ts — without seq the fold's sort is
    // ts-only and a shuffled iterator could apply them reversed (the
    // reference applies applyOps entries via ORDERED bulk writes)
    val txn =
      """{"applyOps":[
        |  {"op":"u","ns":"testdb.neutrino","o":{"$v":2,"diff":{"u":{"v":1}}},"o2":{"_id":7}},
        |  {"op":"u","ns":"testdb.neutrino","o":{"$v":2,"diff":{"u":{"v":2}}},"o2":{"_id":7}}
        |]}""".stripMargin.replaceAll("\n\\s*", "")
    val ops = Oplog.compile(Oplog(9L, "c", "testdb.$cmd", txn, null), noIncludes)
    assert(ops.map(_.seq) == Seq(0, 1))
    for (shuffled <- Seq(ops, ops.reverse)) {
      val out = JsonDocOps.fold(Some("""{"_id":7,"v":0}"""), shuffled)
      assert(out.contains("""{"_id":7,"v":2}"""), s"input order $shuffled")
    }
  }

  test("compile: applies the target-namespace rename (T6)") {
    val renamed = MigratorConfig(command = "all", source = "s", target = "t",
      includes = Seq(IncludeSpec(namespace = "testdb.neutrino", to = "out.renamed")))
    val ops = Oplog.compile(
      Oplog(1L, "i", "testdb.neutrino", """{"_id":1}""", null), renamed)
    assert(ops.head.ns == "out.renamed")
  }

  test("skip: system dbs and empty namespaces dropped (oplog_utils.go:41-44)") {
    assert(Oplog.skip(Oplog(1L, "i", "local.oplog.rs", "{}", null), noIncludes))
    assert(Oplog.skip(Oplog(1L, "i", "config.chunks", "{}", null), noIncludes))
    assert(Oplog.skip(Oplog(1L, "i", "", "{}", null), noIncludes))
    assert(!Oplog.skip(Oplog(1L, "i", "testdb.neutrino", "{}", null), noIncludes))
  }

  test("skip: $cmd create/drop inspect the affected namespace") {
    val drop = Oplog(1L, "c", "testdb.$cmd", """{"drop":"other"}""", null)
    assert(Oplog.skip(drop, cfg)) // testdb.other not included
    val create = Oplog(1L, "c", "testdb.$cmd", """{"create":"neutrino"}""", null)
    assert(!Oplog.skip(create, cfg))
  }

  test("skip: dropDatabase keeps only wildcard-included dbs (migrator.go:237-251 parity)") {
    // Reference semantics: SkipNamespace("db.*") keeps the op only when the
    // include list holds "db.*" (or "*.*") literally — an include of a
    // specific "db.coll" does NOT keep a whole-db drop. We match that.
    val dropDb = Oplog(1L, "c", "testdb.$cmd", """{"dropDatabase":1}""", null)
    assert(Oplog.skip(dropDb, cfg)) // only testdb.neutrino included
    val wild = MigratorConfig(command = "all", source = "s", target = "t",
      includes = Seq(IncludeSpec(namespace = "testdb.*")))
    assert(!Oplog.skip(dropDb, wild))
    assert(!Oplog.skip(dropDb, noIncludes))
  }

  test("skip: applyOps inspects the first inner ns") {
    val txn = """{"applyOps":[{"op":"i","ns":"other.coll","o":{"_id":1}}]}"""
    assert(Oplog.skip(Oplog(1L, "c", "other.$cmd", txn, null), cfg))
    val txnIn = """{"applyOps":[{"op":"i","ns":"testdb.neutrino","o":{"_id":1}}]}"""
    assert(!Oplog.skip(Oplog(1L, "c", "testdb.$cmd", txnIn, null), cfg))
  }

  test("unwrap: non-command ops pass through unchanged") {
    val op = Oplog(1L, "i", "a.b", """{"_id":1}""", null)
    assert(Oplog.unwrap(op) == Seq(op))
  }

  test("JsonDocOps: $set / $unset / $inc with dotted paths") {
    val base = Some("""{"_id":1,"a":{"b":2},"keep":true}""")
    val set = WriteOp("ns", 1, "update", "1", """{"$set":{"a.c":5,"top":"x"}}""")
    val afterSet = JsonDocOps.applyOp(base, set)
    assert(afterSet.contains("""{"_id":1,"a":{"b":2,"c":5},"keep":true,"top":"x"}"""))
    val inc = WriteOp("ns", 2, "update", "1", """{"$inc":{"a.b":3}}""")
    val afterInc = JsonDocOps.applyOp(afterSet, inc)
    assert(afterInc.contains("""{"_id":1,"a":{"b":5,"c":5},"keep":true,"top":"x"}"""))
    val unset = WriteOp("ns", 3, "update", "1", """{"$unset":{"a.c":false,"keep":false}}""")
    val afterUnset = JsonDocOps.applyOp(afterInc, unset)
    assert(afterUnset.contains("""{"_id":1,"a":{"b":5},"top":"x"}"""))
  }

  test("JsonDocOps: combined $set+$unset in one update op applies both halves") {
    val base = Some("""{"_id":7,"a":0,"c":"gone"}""")
    val combined = Oplog.compile(Oplog(5L, "u", "ns.x",
      """{"$v":2,"diff":{"u":{"a":1},"i":{"b":2},"d":{"c":false}}}""",
      """{"_id":7}"""), noIncludes)
    val out = JsonDocOps.fold(base, combined)
    assert(out.contains("""{"_id":7,"a":1,"b":2}"""))
  }

  test("JsonDocOps: insert/replace/delete lifecycle folds to final state") {
    val ops = Seq(
      WriteOp("ns", 1, "insert", "1", """{"_id":1,"v":1}"""),
      WriteOp("ns", 2, "update", "1", """{"$inc":{"v":4}}"""),
      WriteOp("ns", 3, "replace", "1", """{"_id":1,"v":100}"""),
      WriteOp("ns", 4, "update", "1", """{"$set":{"w":true}}"""))
    assert(JsonDocOps.fold(None, ops).contains("""{"_id":1,"v":100,"w":true}"""))
    // delete wins over everything before it; out-of-order input is sorted by ts
    val shuffled = scala.util.Random.shuffle(ops :+ WriteOp("ns", 5, "delete", "1", """{"_id":1}"""))
    assert(JsonDocOps.fold(None, shuffled).isEmpty)
    // $inc on a double stays double (sim.go $inc parity)
    val d = JsonDocOps.fold(Some("""{"_id":1,"p":1.5}"""),
      Seq(WriteOp("ns", 1, "update", "1", """{"$inc":{"p":2}}""")))
    assert(d.contains("""{"_id":1,"p":3.5}"""))
  }
}
