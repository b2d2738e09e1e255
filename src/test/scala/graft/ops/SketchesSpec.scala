package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("cmsHeavyHitters: exact ranks, contract flag holds on a known fixture") {
    // 100×7, 50×3, 10×1 — unambiguous ranking
    val df = (Seq.fill(100)(7L) ++ Seq.fill(50)(3L) ++ Seq.fill(10)(1L))
      .toDF("k")
    val out = Sketches.cmsHeavyHitters(df, col("k"), k = 3,
        eps = 0.01, confidence = 0.99, seed = 42)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 7L, 100L), (2L, 3L, 50L), (3L, 1L, 10L)))
    // 3 distinct keys over a 200-counter width: no collisions, the
    // estimate is exact and the contract flag must hold
    assert(out.forall(_._4))
  }

  test("cmsHeavyHitters: k larger than the key space returns every key") {
    val df = Seq(1L, 1L, 2L).toDF("k")
    val out = Sketches.cmsHeavyHitters(df, col("k"), k = 10,
      eps = 0.1, confidence = 0.9, seed = 1)
    assert(out.count() == 2)
  }

  test("cmsHeavyHitters is deterministic across re-runs (fixed seed)") {
    val df = (1L to 500L).map(i => i % 37).toDF("k")
    def run() = Sketches.cmsHeavyHitters(df, col("k"), k = 5,
        eps = 0.02, confidence = 0.99, seed = 7)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(run() == run())
  }
}
