package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic fixture: spans from sub-bucket to many-bucket
  private def points = spark.range(400).select(
    ($"id" % 11).as("k"), (($"id" * 37) % 1000).as("t"),
    $"id".as("pid"))
  private def intervals = spark.range(120).select(
    ($"id" % 11).as("k"), (($"id" * 53) % 900).as("s"),
    $"id".as("iid"))
    // widths 0 (degenerate), 1, up to 3.5 buckets of 100
    .withColumn("e", col("s") + (col("iid") % 8) * 50)

  test("intervalJoin equals the naive range join, boundaries included/excluded") {
    val fast = RangeJoin.intervalJoin(points, intervals, "k", "t", "s", "e",
      bucketWidth = 100L)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("pid"), r.getAs[Long]("iid"))
    val naivePairs = points.join(intervals.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iid").collect().map(key).sorted.toSeq
    val fastPairs = fast.select("pid", "iid").collect().map(key).sorted.toSeq
    assert(fastPairs == naivePairs && fastPairs.nonEmpty)
    // no duplicate pairs from the explode
    assert(fastPairs.distinct.size == fastPairs.size)
  }

  test("exact boundary semantics: start inclusive, end exclusive") {
    val p = Seq((1L, 100L, 1L), (1L, 199L, 2L), (1L, 200L, 3L)).toDF("k", "t", "pid")
    val iv = Seq((1L, 100L, 200L, 10L)).toDF("k", "s", "e", "iid")
    val hits = RangeJoin.intervalJoin(p, iv, "k", "t", "s", "e", 64L)
      .select("pid").as[Long].collect().sorted.toSeq
    assert(hits == Seq(1L, 2L))
  }

  test("degenerate (empty) intervals match nothing") {
    val p = Seq((1L, 100L, 1L)).toDF("k", "t", "pid")
    val iv = Seq((1L, 100L, 100L, 10L), (1L, 150L, 90L, 11L)).toDF("k", "s", "e", "iid")
    assert(RangeJoin.intervalJoin(p, iv, "k", "t", "s", "e", 64L).count() == 0)
  }

  test("bucketing is exact past 2^53 (ns-epoch longs) and for negatives") {
    // doubles round 2^60-magnitude longs: floor(t / w) as a double could
    // place the point and its interval in different buckets. Pin a match
    // straddling a bucket edge at huge magnitude, both signs.
    val base = 1L << 60
    val p = Seq((1L, base + 1L, 1L), (1L, -base - 1L, 2L)).toDF("k", "t", "pid")
    val iv = Seq((1L, base - 5L, base + 10L, 10L),
      (1L, -base - 10L, -base + 5L, 11L)).toDF("k", "s", "e", "iid")
    val hits = RangeJoin.intervalJoin(p, iv, "k", "t", "s", "e", 1000L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(hits == Seq((1L, 10L), (2L, 11L)))
  }

  test("plan is an equi-join on (key, bucket), not a nested loop") {
    val fast = RangeJoin.intervalJoin(points, intervals, "k", "t", "s", "e", 100L)
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"equi-join expected:\n$plan")
  }
}
