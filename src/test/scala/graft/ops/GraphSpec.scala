package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankInt on a path graph matches the hand-computed iteration") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val r1 = Graph.pageRankInt(edges, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // deg: a=1, b=2, c=1; contribs: a→b 10⁶, b→a 5·10⁵, b→c 5·10⁵, c→b 10⁶
    assert(r1 == Map("a" -> 575000L, "b" -> 1850000L, "c" -> 575000L))
  }

  test("symmetric graphs stay symmetric; iterations are deterministic") {
    val tri = Seq(("x", "y"), ("y", "z"), ("z", "x")).toDF("src", "dst")
    val r = Graph.pageRankInt(tri, iterations = 3)
      .collect().map(r => r.getLong(1)).toSet
    assert(r.size == 1, "triangle nodes must share one rank")
    val again = Graph.pageRankInt(tri, iterations = 3)
      .collect().map(row => (row.getString(0), row.getLong(1))).sorted.toSeq
    val first = Graph.pageRankInt(tri, iterations = 3)
      .collect().map(row => (row.getString(0), row.getLong(1))).sorted.toSeq
    assert(again == first)
  }

  test("broadcast-gated and shuffled iteration joins agree row-for-row") {
    // rankBroadcastCap = 0 forces the above-cap (shuffled) fallback;
    // the default broadcasts — the r17 plan change must be a pure
    // strategy swap, never a result change
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"),
      ("b", "d")).toDF("src", "dst")
    def run(cap: Long) = Graph.pageRankInt(edges, iterations = 3,
        rankBroadcastCap = cap)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(run(0L) == run(Graph.RankBroadcastCap))
  }

  test("a hub out-ranks leaves and multi-edges collapse") {
    val star = Seq(("hub", "l1"), ("hub", "l2"), ("hub", "l3"),
      ("hub", "l1") /* dup */).toDF("src", "dst")
    val r = Graph.pageRankInt(star, iterations = 2)
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(r("hub") > r("l1") && r("l1") == r("l2") && r("l2") == r("l3"))
  }

  test("triangleStats: hand-computed census, dups/loops/direction-proof") {
    // K4 on {1,2,3,4} (4 triangles) + pendant 5 + a reversed dup edge
    // + a self-loop: loops drop, (b,a) == (a,b)
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val edges = (k4 ++ Seq((5L, 1L), (2L, 1L) /* reversed dup */,
      (3L, 3L) /* loop */)).toDF("x", "y")
    val out = Graph.triangleStats(edges, $"x", $"y")
      .as[(Long, Long, Long)].collect().head
    assert(out == ((5L, 7L, 4L)))
  }

  test("triangleStats equals the canonical a<b<c three-join on a random graph") {
    val e = spark.range(300).select(
      (($"id" * 37) % 40).as("x"), (($"id" * 53 + 11) % 40).as("y"))
    val fast = Graph.triangleStats(e, $"x", $"y")
      .select("n_triangles").as[Long].collect().head
    val ed = e.filter($"x" =!= $"y")
      .select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
      .distinct()
    val naive = ed.as("e1")
      .join(ed.as("e2"), col("e2.a") === col("e1.a") && col("e2.b") > col("e1.b"))
      .join(ed.as("e3"), col("e3.a") === col("e1.b") && col("e3.b") === col("e2.b"))
      .count()
    assert(fast == naive)
  }
}
