package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAgg equals the window top-k, including score ties") {
    val rows = spark.range(5000).select(
      ($"id" % 7).as("g"), (($"id" * 37) % 100).as("score"), $"id".as("key"))

    val agg = new TopKAgg(5).toColumn
    val typed = rows.select($"g", struct($"score", $"key").as("e"))
      .as[(Long, TopKEntry)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .flatMap { case (g, es) =>
        es.zipWithIndex.map { case (e, i) => (g, i + 1, e.score, e.key) }
      }
      .toDF("g", "rank", "score", "key")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy($"score".desc, $"key".asc)
    val windowed = rows
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select("g", "rank", "score", "key")

    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3))
    val a = typed.collect().map(r =>
      (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3))).sorted
    val b = windowed.collect().map(key).sorted
    assert(a.toSeq == b.toSeq && a.nonEmpty)
  }

  test("buffer never exceeds k and merge is order-insensitive") {
    val agg = new TopKAgg(3)
    val es = (1L to 50L).map(i => TopKEntry(score = i % 10, key = i))
    val left = es.take(25).foldLeft(agg.zero)(agg.reduce)
    val right = es.drop(25).foldLeft(agg.zero)(agg.reduce)
    assert(left.size <= 3 && right.size <= 3)
    val ab = agg.finish(agg.merge(left, right))
    val ba = agg.finish(agg.merge(right, left))
    val all = es.foldLeft(agg.zero)(agg.reduce)
    assert(ab == ba && ab == agg.finish(all))
    // best-first: (9, 9), (9, 19), (9, 29)
    assert(ab == Seq(TopKEntry(9, 9), TopKEntry(9, 19), TopKEntry(9, 29)))
  }
}
