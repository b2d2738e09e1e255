package graft.verify

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class CompareSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = Tables.load(spark, sf0001, "orders")

  test("identical frames compare equal") {
    val s = Compare.summarize(orders, orders, "o_orderkey")
    assert(s.isEqual && s.matched == orders.count())
  }

  test("diff classifies missing/extra/mismatch") {
    val src = orders
    val tgt = orders
      .filter($"o_orderkey" % 97 =!= 0) // drop some → missing on target
      .withColumn("o_totalprice",
        when($"o_orderkey" % 101 === 0, $"o_totalprice" + 1).otherwise($"o_totalprice"))
    val extra = orders.filter($"o_orderkey" % 97 === 0)
      .withColumn("o_orderkey", $"o_orderkey" + 10000000L)
    val s = Compare.summarize(src, tgt.unionByName(extra), "o_orderkey")
    val missing = orders.filter($"o_orderkey" % 97 === 0).count()
    val mismatch = orders.filter($"o_orderkey" % 97 =!= 0 && $"o_orderkey" % 101 === 0).count()
    assert(s.missingOnTarget == missing)
    assert(s.extraOnTarget == missing)
    assert(s.mismatched == mismatch)
    assert(s.matched == orders.count() - missing - mismatch)
  }

  test("diffBucketed matches the row-level diff counts at several bucket counts") {
    val src = orders
    val tgt = orders
      .filter($"o_orderkey" % 97 =!= 0)
      .withColumn("o_totalprice",
        when($"o_orderkey" % 101 === 0, $"o_totalprice" + 1).otherwise($"o_totalprice"))
      .unionByName(orders.filter($"o_orderkey" % 97 === 0)
        .withColumn("o_orderkey", $"o_orderkey" + 10000000L))
    val exact = Compare.diff(src, tgt, "o_orderkey")
      .groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (buckets <- Seq(1, 16, 512)) {
      val bucketed = Compare.diffBucketed(src, tgt, "o_orderkey", buckets)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bucketed == exact, s"buckets=$buckets")
    }
  }

  test("diffBucketed on identical frames is all-match (pure short-circuit)") {
    val out = Compare.diffBucketed(orders, orders, "o_orderkey", 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("match" -> orders.count()))
  }

  test("existingKeys semi-join (J2 reconciliation)") {
    val batch = orders.filter($"o_orderkey" <= 100)
    val target = orders.filter($"o_orderkey" % 2 === 0)
    val existing = Compare.existingKeys(batch, target, "o_orderkey")
    assert(existing.count() == batch.filter($"o_orderkey" % 2 === 0).count())
  }
}
