package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property tests for the CDC boundary rule — pure expression-level
  * (no Spark session), seeded-random payloads so failures reproduce.
  * The re-synchronization property is WHY content-defined chunking
  * exists; pin it directly rather than only through the fixture. */
class CdcPropSpec extends AnyFunSuite {
  private val Cases = 100
  private val W = 8

  private def boundaries(bytes: Array[Byte], mask: Int = 1): Seq[Int] = {
    val e = CdcBoundaries(Literal(bytes), W, mask)
    e.compute(bytes).asInstanceOf[ArrayData].toIntArray().toSeq
  }

  test("boundaries lie in [window, len], strictly increasing") {
    val r = new Random(42)
    for (_ <- 1 to Cases) {
      val bytes = Array.fill(r.nextInt(2000))(r.nextInt(256).toByte)
      val b = boundaries(bytes)
      assert(b.forall(i => i >= W && i <= bytes.length))
      assert(b == b.sorted && b.distinct == b)
    }
  }

  test("re-synchronization: a prefix insertion shifts every interior boundary exactly") {
    val r = new Random(43)
    for (_ <- 1 to Cases) {
      val bytes = Array.fill(500 + r.nextInt(1500))(r.nextInt(256).toByte)
      val prefix = Array.fill(1 + r.nextInt(64))(r.nextInt(256).toByte)
      val orig = boundaries(bytes).toSet
      val shifted = boundaries(prefix ++ bytes).toSet
      // every original boundary (its window fully inside the original
      // bytes) survives the shift at position + |prefix|
      assert(orig.map(_ + prefix.length).subsetOf(shifted))
      // and nothing else appears past the straddle region
      val interior = shifted.filter(_ >= prefix.length + W)
      assert(interior == orig.map(_ + prefix.length))
    }
  }

  test("boundary density tracks the mask (expected chunk 16^mask bytes)") {
    val r = new Random(44)
    val bytes = Array.fill(200000)(r.nextInt(256).toByte)
    val n1 = boundaries(bytes, mask = 1).size
    val n2 = boundaries(bytes, mask = 2).size
    // mask 1: ~1/16 of positions; mask 2: ~1/256 — allow wide slack
    assert(n1 > 200000 / 16 / 2 && n1 < 200000 / 16 * 2, s"n1=$n1")
    assert(n2 > 200000 / 256 / 3 && n2 < 200000 / 256 * 3, s"n2=$n2")
    assert(n1 > n2 * 4)
  }
}
