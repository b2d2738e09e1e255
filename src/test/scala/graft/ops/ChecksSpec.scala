package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def table = Seq(
    (Some(1L), Some(10.0), "F"),
    (Some(2L), Some(-5.0), "O"),   // price violation
    (Some(2L), Some(3.0), "F"),    // duplicate key
    (None, Some(7.0), "X"),        // null key + bad status
    (Some(4L), None, "F")          // null price (violation: null predicate)
  ).toDF("k", "price", "status")

  test("report counts violations per rule in one pass") {
    val out = Checks.report(table, Seq(
        Checks.uniqueRule("k_unique", col("k")),
        Checks.rowRule("k_not_null", col("k").isNotNull),
        Checks.rowRule("price_positive", col("price") > 0),
        Checks.rowRule("status_domain", col("status").isin("F", "O"))))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("k_unique") == ((1L, false)))      // one surplus duplicate
    assert(out("k_not_null") == ((1L, false)))
    assert(out("price_positive") == ((2L, false))) // -5 and the NULL
    assert(out("status_domain") == ((1L, false)))
  }

  test("a clean table passes every rule; one aggregation job") {
    val clean = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val out = Checks.report(clean, Seq(
      Checks.uniqueRule("k_unique", col("k")),
      Checks.rowRule("v_positive", col("v") > 0)))
    assert(out.filter(!col("pass")).count() == 0)
    // single-scan plan: exactly one aggregate subtree reads the table
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"one-pass expected:\n$plan")
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Checks.report(table, Seq(
        Checks.rowRule("r", col("k").isNotNull),
        Checks.rowRule("r", col("price") > 0)))
    }
  }
}
