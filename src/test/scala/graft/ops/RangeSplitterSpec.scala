package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RangeSplitterSpec extends SparkSpec {

  test("exactBounds matches the single-partition reference computation") {
    val df = Tables.load(spark, sf0001, "orders")
    val got = RangeSplitter.exactBounds(df, "o_orderkey", 500, numPartitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute-force oracle: global window (fine at test scale)
    val w = Window.orderBy(col("o_orderkey"))
    val want = df.select(col("o_orderkey"))
      .withColumn("rn", row_number().over(w) - 1)
      .groupBy((col("rn") / 500).cast("long").as("task_seq"))
      .agg(min("o_orderkey").as("f"), max("o_orderkey").as("l"), count(lit(1)).as("c"))
      .orderBy("task_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("exactBounds blocks are disjoint, ordered, and cover every row") {
    val df = Tables.load(spark, sf0001, "lineitem").select("l_orderkey")
    val total = df.count()
    val rows = RangeSplitter.exactBounds(df, "l_orderkey", 777)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).sum == total)
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong))
    // duplicate keys exist in lineitem, so adjacent blocks may share a
    // boundary key; ordering must still be monotone
    rows.sliding(2).foreach {
      case Array((_, _, last1, _), (_, first2, _, _)) => assert(last1 <= first2)
      case _ =>
    }
    // every block except possibly the tail holds exactly `block` rows
    assert(rows.dropRight(1).forall(_._4 == 777L))
  }

  test("exactBounds on an empty frame returns no tasks") {
    val df = Tables.load(spark, sf0001, "orders").filter(lit(false))
    assert(RangeSplitter.exactBounds(df, "o_orderkey", 100).count() == 0L)
  }
}
