package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a hot-key distribution") {
    // 90% of left rows share one hot key
    val left = spark.range(10000)
      .select(when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 100).as("k"),
        $"id".as("payload"))
    val right = spark.range(100).select($"id".as("k"), ($"id" * 11).as("dim"))
    val plain = left.join(right, Seq("k"))
    val salted = Skew.saltedJoin(left, right, Seq("k"), buckets = 8)
    assert(salted.count() == plain.count())
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(salted.collect().map(key).sorted.toSeq == plain.collect().map(key).sorted.toSeq)
    assert(salted.columns.toSeq == plain.columns.toSeq)
  }

  test("salt is deterministic and spreads a hot key across buckets") {
    val df = spark.range(1000).select(lit(7L).as("k"), $"id".as("p"))
    val salted = df.withColumn("__s", Skew.salt(8, col("k"), col("p")))
    val counts = salted.groupBy("__s").count().collect()
    assert(counts.length == 8, "hot key should spread over all buckets")
    // deterministic: same rows → same salt
    val again = df.withColumn("__s", Skew.salt(8, col("k"), col("p")))
    assert(salted.collect().toSeq == again.collect().toSeq)
  }

  test("saltedAggregate merges per-salt partials to exact results") {
    val df = spark.range(5000).select(($"id" % 3).as("k"), $"id".as("v"))
    val out = Skew.saltedAggregate(df, "k", buckets = 8,
      partial = Seq(collect_set($"v").as("vs")),
      merge = Seq(array_sort(array_distinct(flatten(collect_list($"vs")))).as("vs")),
      saltCols = Seq($"v"))
    val expect = df.groupBy("k").agg(array_sort(collect_set($"v")).as("vs"))
    val norm = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(norm(out) == norm(expect))
  }
}
