package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  // baskets: 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{c,d} 5:{a} (duplicate row in 2)
  private def rows = Seq(
    (1L, 10L), (1L, 20L), (1L, 30L),
    (2L, 10L), (2L, 20L), (2L, 20L),
    (3L, 10L), (3L, 20L),
    (4L, 30L), (4L, 40L),
    (5L, 10L)
  ).toDF("b", "i")

  test("frequentPairs counts co-occurring baskets with a-priori pruning") {
    val out = Itemsets.frequentPairs(rows, $"b", $"i",
        minItemSupport = 2, minPairSupport = 2)
      .orderBy("item_a", "item_b")
      .as[(Long, Long, Long)].collect().toSeq
    // (10,20) in baskets 1,2,3; (10,30)/(20,30) once; (30,40) once
    assert(out == Seq((10L, 20L, 3L)))
    // duplicate (2,20) row counted once (distinct basket-item)
  }

  test("a-priori pruning is lossless when minItemSupport <= minPairSupport") {
    // item support >= any pair support it joins, so pruning at the
    // pair threshold can never drop a frequent pair
    val pruned = Itemsets.frequentPairs(rows, $"b", $"i", 2, 2)
    val naive = Itemsets.frequentPairs(rows, $"b", $"i", 1, 2)
    assert(pruned.exceptAll(naive).isEmpty && naive.exceptAll(pruned).isEmpty)
  }

  test("oversized baskets are excluded by the cap") {
    val hot = (1L to 6L).map(i => (99L, i * 10)).toDF("b", "i")
      .union(rows)
    val capped = Itemsets.frequentPairs(hot, $"b", $"i", 1, 1, maxBasket = 5)
    // basket 99 (6 items) contributes nothing; basket 1's pairs remain
    assert(capped.filter($"n_baskets" >= 1)
      .join(Seq((10L, 60L)).toDF("item_a", "item_b"), Seq("item_a", "item_b"))
      .count() == 0)
    assert(capped.filter($"item_a" === 10L && $"item_b" === 20L).count() == 1)
  }

  test("basketCensus reports what the cap would drop") {
    val hot = (1L to 6L).map(i => (99L, i * 10)).toDF("b", "i")
      .union(rows)
    val cen = Itemsets.basketCensus(hot, $"b", $"i",
        minItemSupport = 1, maxBasket = 5)
      .as[(Long, Long, Long, Long)].collect().head
    // baskets after item-prune: 1(3),2(2),3(2),4(2),5(1),99(6)
    assert(cen == ((6L, 6L, 1L, 6L)))
  }

  test("rules: hand-computed confidence and lift") {
    val out = Itemsets.rules(rows, $"b", $"i", 2, 2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // N=5 baskets; supports 10→4, 20→3; pair (10,20) in 3 baskets:
    // conf 10→20 = 3e6 DIV 4; conf 20→10 = 3e6 DIV 3;
    // lift = 1e6·(3·5)/(4·3) = 1 250 000
    assert(out == Seq((20L, 10L, 3L, 4L, 3L, 750000L, 1000000L, 1250000L))
      || out == Seq((10L, 20L, 3L, 4L, 3L, 750000L, 1000000L, 1250000L)))
  }

  test("the pair pipeline plans semi-join prunes and no cartesian product") {
    // assert on the LAZY pipeline — the materialized entry points hide
    // the shape behind their lineage cut
    val bi = rows.select($"b".as("__b"), $"i".as("__i")).distinct()
    val plan = Itemsets.lazyPairs(bi, 2, 2, 1000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("LeftSemi"), s"expected semi-join pruning:\n$plan")
    // frequentPairs (the materialized wrapper) computes the same rows
    val lazyRows = Itemsets.lazyPairs(bi, 2, 2, 1000)
    val eager = Itemsets.frequentPairs(rows, $"b", $"i", 2, 2)
    assert(eager.exceptAll(lazyRows).isEmpty && lazyRows.exceptAll(eager).isEmpty)
    val eagerPlan = eager.queryExecution.executedPlan.toString
    assert(eagerPlan.contains("ExistingRDD") || eagerPlan.contains("LogicalRDD"),
      s"expected an eagerly-cut result:\n$eagerPlan")
  }
}
