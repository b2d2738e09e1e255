package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style tests for the per-key document fold — the logic every
  * applied change ultimately flows through (K2/ST5). Invariants are
  * checked against seeded-random docs and op sequences (100 cases per
  * property; deterministic seed so failures reproduce). */
class JsonDocOpsPropSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private val Cases = 100

  private val fields = Vector("a", "b", "c", "nest.x", "nest.y")

  private def setOp(f: String, v: String, ts: Long) =
    WriteOp("app.t", ts, "update", "1", s"""{"$$set":{"$f":$v}}""")
  private def unsetOp(f: String, ts: Long) =
    WriteOp("app.t", ts, "update", "1", s"""{"$$unset":{"$f":1}}""")
  private def incOp(f: String, by: Long, ts: Long) =
    WriteOp("app.t", ts, "update", "1", s"""{"$$inc":{"$f":$by}}""")

  private def randomOp(r: Random, ts: Long): WriteOp = {
    val f = fields(r.nextInt(fields.size))
    r.nextInt(8) match {
      case 0 | 1 => unsetOp(f, ts)
      case 2 | 3 => incOp(f, r.nextInt(101) - 50L, ts)
      case _ =>
        val v = if (r.nextBoolean()) (r.nextInt(2001) - 1000).toString
          else "\"" + r.alphanumeric.take(8).mkString + "\""
        setOp(f, v, ts)
    }
  }

  private def randomOps(r: Random, n: Int): Seq[WriteOp] =
    (0 until n).map(i => randomOp(r, i.toLong))

  private val base = """{"_id":1,"a":0,"keep":"z"}"""

  private def get(doc: String, path: String): Option[String] = {
    var n: com.fasterxml.jackson.databind.JsonNode = mapper.readTree(doc)
    for (p <- path.split('.')) {
      if (n == null || !n.isObject) return None
      n = n.get(p)
    }
    Option(n).map(_.toString)
  }

  test("fold output is always valid JSON and never loses untouched fields") {
    val r = new Random(421)
    for (_ <- 1 to Cases) {
      val out = JsonDocOps.fold(Some(base), randomOps(r, 12))
      assert(out.isDefined)
      assert(mapper.readTree(out.get).isObject)
      assert(get(out.get, "_id").contains("1"))
      assert(get(out.get, "keep").contains("\"z\""))
    }
  }

  test("last $set wins and a later $unset removes, under arbitrary noise") {
    val r = new Random(422)
    for (_ <- 1 to Cases) {
      val noise = randomOps(r, 8)
      val v = r.nextInt(201) - 100
      val withFinal = noise :+ setOp("a", v.toString, 1000L)
      assert(get(JsonDocOps.fold(Some(base), withFinal).get, "a").contains(v.toString))
      val withUnset = withFinal :+ unsetOp("a", 1001L)
      assert(get(JsonDocOps.fold(Some(base), withUnset).get, "a").isEmpty)
    }
  }

  test("a pure $inc chain accumulates to the exact sum") {
    val r = new Random(423)
    for (_ <- 1 to Cases) {
      val incs = Seq.fill(10)(r.nextInt(101) - 50L)
      val seq = incs.zipWithIndex.map { case (n, i) => incOp("a", n, i.toLong) }
      assert(get(JsonDocOps.fold(Some(base), seq).get, "a").contains(incs.sum.toString))
    }
  }

  test("fold is insensitive to input order (ts sorts); top-ts delete is terminal") {
    val r = new Random(424)
    for (_ <- 1 to Cases) {
      val seq = randomOps(r, 10)
      val shuffled = r.shuffle(seq)
      assert(JsonDocOps.fold(Some(base), seq) == JsonDocOps.fold(Some(base), shuffled))
      val del = WriteOp("app.t", 9999L, "delete", "1", """{"_id":1}""")
      assert(JsonDocOps.fold(Some(base), r.shuffle(del +: seq)).isEmpty)
    }
  }

  test("insert resurrects after delete; update on a missing doc is a no-op") {
    val ins = WriteOp("app.t", 10L, "insert", "1", """{"_id":1,"fresh":true}""")
    val del = WriteOp("app.t", 5L, "delete", "1", """{"_id":1}""")
    assert(JsonDocOps.fold(Some(base), Seq(del, ins)).contains("""{"_id":1,"fresh":true}"""))
    assert(JsonDocOps.fold(None, Seq(setOp("a", "5", 1L))).isEmpty)
  }
}
