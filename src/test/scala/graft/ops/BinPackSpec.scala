package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.security.MessageDigest

class BinPackSpec extends SparkSpec {
  import spark.implicits._

  private def items = spark.range(3000).select(
    $"id".as("doc_id"), (($"id" * 131) % 900 + 1).as("bytes"))

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("assignBins equals the sequential next-fit over the md5 order") {
    val target = 4096L
    val got = BinPack.assignBins(items, "doc_id", "bytes", target,
        salt = "s1", shards = 16)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap

    // driver-side reference: sort by (md5(id#salt), id), running prefix
    val rows = items.as[(Long, Long)].collect()
      .map { case (id, b) => (md5hex(s"$id#s1"), id, b) }
      .sortBy(t => (t._1, t._2))
    var prefix = 0L
    val expect = rows.map { case (_, id, b) =>
      val bin = prefix / target; prefix += b; (id, bin)
    }.toMap
    assert(got == expect)
  }

  test("bin invariants: full coverage, bounded overflow, deterministic") {
    val target = 4096L
    val out = BinPack.assignBins(items, "doc_id", "bytes", target,
      salt = "s1", shards = 16).cache()
    assert(out.count() == 3000)
    val stats = out.groupBy("bin").agg(sum("bytes").as("b")).collect()
    // next-fit bound: every bin except possibly the last starts before
    // its capacity line, so content < target + max row size (900)
    stats.foreach(r => assert(r.getAs[Long]("b") < target + 900,
      s"bin ${r.get(0)} overflows"))
    // deterministic relayout
    val again = BinPack.assignBins(items, "doc_id", "bytes", target,
      salt = "s1", shards = 16)
    assert(out.select("doc_id", "bin").except(
      again.select("doc_id", "bin")).count() == 0)
    // a different salt draws a different layout
    val other = BinPack.assignBins(items, "doc_id", "bytes", target,
      salt = "s2", shards = 16)
    assert(other.select("doc_id", "bin").except(
      out.select("doc_id", "bin")).count() > 0)
    out.unpersist()
  }
}
