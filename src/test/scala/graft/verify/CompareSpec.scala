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

  test("existingKeys semi-join (J2 reconciliation)") {
    val batch = orders.filter($"o_orderkey" <= 100)
    val target = orders.filter($"o_orderkey" % 2 === 0)
    val existing = Compare.existingKeys(batch, target, "o_orderkey")
    assert(existing.count() == batch.filter($"o_orderkey" % 2 === 0).count())
  }
}
