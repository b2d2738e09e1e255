package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation, Spark-first: each iteration is one
  * join + one map-side-combined aggregate, with a `localCheckpoint`
  * between iterations to cut the growing lineage (the classic Pregel-
  * as-DataFrames shape — no GraphX dependency, no driver-side loop
  * over collected data; the driver only orchestrates N short jobs).
  *
  * Ranks are INTEGER micro-units and every step is floor arithmetic
  * (`rank DIV degree`, `(in · damp) DIV 100`), so the fixpoint
  * trajectory is bit-identical in any engine — a double PageRank
  * diverges in the last ulp across summation orders and engines; this
  * one is pinned by a DuckDB twin unrolled to the same iteration count
  * (`q_pagerank`).
  *
  * At 100 TB the per-iteration cost is one shuffle of the edge list on
  * `src` (co-partitioned with the rank table after the first
  * iteration — Spark reuses the hash partitioning) plus one on `dst`
  * for the combine; degree-skew (celebrity nodes) shows up as a hot
  * REDUCE key only in the incoming-sum aggregate, which is algebraic
  * (map-side combined) and therefore safe. */
object Graph {

  /** Undirected integer PageRank.
    *
    * @param edges      (src, dst) string endpoints; treated as
    *                   undirected (each edge contributes both ways),
    *                   multi-edges deduplicated
    * @param iterations ≥ 1 power iterations
    * @param dampPct    damping in percent (85 = classic 0.85)
    *
    * Output: (node, rank) — rank in micro-units, starting at 10⁶ per
    * node, `rank = (100−damp)% · 10⁶ + damp% · Σ (neighbor rank DIV
    * neighbor degree)` each iteration. */
  def pageRankInt(edges: DataFrame, iterations: Int,
      dampPct: Int = 85, ckptEvery: Int = 4): DataFrame = {
    require(iterations >= 1 && iterations <= 50, "iterations in [1, 50]")
    require(dampPct > 0 && dampPct < 100, "dampPct in (0, 100)")
    require(ckptEvery >= 1, "ckptEvery must be positive")
    val bidi = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
      .unionByName(edges.select(col("dst").cast("string").as("src"),
        col("src").cast("string").as("dst")))
      .distinct()
    val deg = bidi.groupBy("src").agg(count(lit(1)).as("d"))
    // materialize the (small, reused-every-iteration) topology once
    val topo = bidi.join(deg, Seq("src")).localCheckpoint(true)
    val base = lit((100L - dampPct) * 10000L) // (1−d) · 10⁶ in µ-units
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    var i = 0
    while (i < iterations) {
      val contribs = topo
        .join(ranks, topo("src") === ranks("node"))
        .select(col("dst").as("node"), expr("r DIV d").as("c"))
      ranks = contribs.groupBy("node")
        .agg((base + expr(s"(sum(c) * $dampPct) DIV 100")).as("r"))
      // lineage cut only every ckptEvery iterations: short chains plan
      // as ONE fused job (exchange reuse + AQE runtime broadcasts work
      // across iterations), while long runs still bound plan depth
      if ((i + 1) % ckptEvery == 0 && i + 1 < iterations)
        ranks = ranks.localCheckpoint(true)
      i += 1
    }
    ranks
  }
}
