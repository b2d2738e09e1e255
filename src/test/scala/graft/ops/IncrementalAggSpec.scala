package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def rows = spark.range(5000).select(
    ($"id" % 37).as("k"), (($"id" * 13) % 1000).as("v"))

  private def norm(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

  test("state folded with a delta equals the full recompute, at any split") {
    val full = norm(IncrementalAgg.state(rows, col("k"), col("v")))
    for (m <- Seq(2L, 5L, 9L)) {
      val base = rows.filter($"id" % m =!= 0)
      val delta = rows.filter($"id" % m === 0)
      val st = IncrementalAgg.state(base, col("k"), col("v"))
      val merged = IncrementalAgg.merge(st, delta, col("k"), col("v"))
      assert(norm(merged) == full, s"split mod $m diverged")
    }
  }

  test("merging repeatedly (batch-at-a-time) still equals one recompute") {
    val full = norm(IncrementalAgg.state(rows, col("k"), col("v")))
    val batches = (0L to 3L).map(i => rows.filter($"id" % 4 === i))
    val st0 = IncrementalAgg.state(batches.head, col("k"), col("v"))
    val folded = batches.tail.foldLeft(st0)(
      (st, b) => IncrementalAgg.merge(st, b, col("k"), col("v")))
    assert(norm(folded) == full)
  }

  test("a delta with unseen keys introduces them") {
    val base = Seq((1L, 10L)).toDF("k", "v")
    val delta = Seq((2L, 5L), (2L, 7L)).toDF("k", "v")
    val st = IncrementalAgg.state(base, col("k"), col("v"))
    val merged = norm(IncrementalAgg.merge(st, delta, col("k"), col("v")))
    assert(merged == Seq((1L, 1L, 10L, 10L, 10L), (2L, 2L, 12L, 5L, 7L)))
  }
}
