package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Pins the BSON cross-type ordering compiler — in particular the
  * DECIMAL(38,10) numeric field that keeps int64 beyond 2^53 in exact
  * numeric order (the old double field collapsed "10" vs "9.99..."-style
  * neighbors above 2^53 onto equal doubles and fell back to text
  * order). */
class BsonKeySpec extends SparkSpec {
  import spark.implicits._

  private def sparkOrder(ids: Seq[String]): Seq[String] =
    ids.toDF("id").orderBy(BsonKey.sortKey(col("id"))).as[String].collect().toSeq

  test("random int64 beyond 2^53 sort in exact numeric order (property)") {
    val r = new Random(42)
    // half the values in the double-precision dead zone (> 2^53), plus
    // adjacent pairs (n, n+1) that a double cannot distinguish
    val base = Seq.fill(150)(r.nextLong()) ++
      Seq.fill(100)((1L << 53) + (r.nextLong() & ((1L << 60) - 1))) ++
      Seq(Long.MaxValue, Long.MinValue, 0L, -1L, 1L << 53, (1L << 53) + 1)
    val withNeighbors = (base ++ base.map(v => if (v == Long.MaxValue) v else v + 1)).distinct
    val want = withNeighbors.sorted.map(_.toString)
    assert(sparkOrder(Random.shuffle(want)) == want)
  }

  test("2^53 + 1 orders after 2^53 (equal as doubles)") {
    val lo = (1L << 53).toString
    val hi = ((1L << 53) + 1).toString
    assert(lo.toDouble == hi.toDouble) // the trap the decimal field closes
    assert(sparkOrder(Seq(hi, lo)) == Seq(lo, hi))
  }

  test("overflow bands: |x| >= 10^28 doubles bracket the decimal range") {
    val ids = Seq("-1.0E30", Long.MinValue.toString, "-7", "0", "3.5",
      Long.MaxValue.toString, "1.0E30", "2.0E30")
    assert(sparkOrder(Random.shuffle(ids)) == ids)
  }

  test("cross-type order holds: numbers < strings < objects < ObjectIds") {
    val ids = Seq("-5", "9007199254740993", "\"a\"", "\"b\"",
      "{\"x\":1}", "{\"$oid\":\"00ff\"}", "{\"$oid\":\"ff00\"}")
    assert(sparkOrder(Random.shuffle(ids)) == ids)
  }

  test("defaultOrder compiles string key columns only") {
    val strs = Seq("150", "2").toDF("id")
    assert(strs.orderBy(BsonKey.defaultOrder(strs, "id")).as[String].collect().toSeq
      == Seq("2", "150")) // numeric, not lexicographic
    val longs = Seq(150L, 2L).toDF("id")
    assert(longs.orderBy(BsonKey.defaultOrder(longs, "id")).as[Long].collect().toSeq
      == Seq(2L, 150L)) // native column order, no JSON compile
  }
}
