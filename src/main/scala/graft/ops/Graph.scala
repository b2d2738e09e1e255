package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Node-count ceiling under which the rank table BROADCASTS into the
    * per-iteration topology join (≈ tens of MB of (string, long) rows —
    * inside driver/executor broadcast budgets): the topology side is
    * then never exchanged or sorted per iteration, leaving ONE exchange
    * per iteration (the incoming-sum aggregate). Above the cap the
    * iteration falls back to the shuffled key join — a web-scale node
    * table must not be broadcast ([[graft.text.Dedup.AdmitBroadcastCap]]
    * adaptive discipline). */
  val RankBroadcastCap: Long = 2000000L

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
      dampPct: Int = 85, ckptEvery: Int = 4,
      rankBroadcastCap: Long = RankBroadcastCap): DataFrame = {
    require(iterations >= 1 && iterations <= 50, "iterations in [1, 50]")
    require(dampPct > 0 && dampPct < 100, "dampPct in (0, 100)")
    require(ckptEvery >= 1, "ckptEvery must be positive")
    val bidi = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
      .unionByName(edges.select(col("dst").cast("string").as("src"),
        col("src").cast("string").as("dst")))
      .distinct()
    // degrees feed rank₀ AND the topology join — materialized once, so
    // the union+distinct+aggregate chain never re-runs inside the
    // iteration plan (pre-r17 it re-derived from the raw scans for
    // rank₀: 5 extra exchanges in the 2-iteration plan)
    val deg = bidi.groupBy("src").agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    // materialize the (small, reused-every-iteration) topology once
    val topo = bidi.join(deg, Seq("src")).localCheckpoint(true)
    // node count is known for free from the materialized degree table;
    // it picks the iteration join strategy once for the whole run
    val broadcastRanks = deg.count() <= rankBroadcastCap
    val base = lit((100L - dampPct) * 10000L) // (1−d) · 10⁶ in µ-units
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    var i = 0
    while (i < iterations) {
      // rank table broadcast (node-count-gated): the per-iteration join
      // needs NO exchange or sort on the topology side — the only
      // shuffle left per iteration is the incoming-sum aggregate
      val r = if (broadcastRanks) broadcast(ranks) else ranks
      val contribs = topo
        .join(r, topo("src") === r("node"))
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

  /** Exact triangle census — the clustering-coefficient numerator and
    * the classic "can your join engine survive a social graph"
    * benchmark. Degree-oriented: every edge points from its lower-
    * (degree, id) endpoint to the higher, which turns the wedge
    * enumeration into a self-join on the ORIENTED out-lists, whose
    * width is O(√m) per node even on a power-law graph — the
    * celebrity node with 10⁸ canonical neighbors contributes almost
    * no out-wedges because nearly all its edges orient INTO it
    * (Suri–Vassilvitskii / "MapReduce triangles" orientation). Plan:
    * two equi-joins and map-side-combined counts, no windows.
    *
    * Output: one row — n_nodes, n_edges (canonical distinct,
    * self-loops dropped), n_triangles (each counted once). */
  def triangleStats(df: DataFrame, src: Column, dst: Column): DataFrame = {
    // canonical edges + degrees each feed multiple consumers (the
    // orientation join, the node/edge counts) — materialize once so
    // the edge-set distinct shuffle runs exactly once
    val canon = df.select(src.cast("long").as("__x"), dst.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") =!= col("__y"))
      .select(least(col("__x"), col("__y")).as("a"),
        greatest(col("__x"), col("__y")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = canon.select(col("a").as("n"))
      .unionByName(canon.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val withD = canon
      .join(deg.select(col("n").as("a"), col("d").as("__da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("__db")), Seq("b"))
    def rank(d: Column, n: Column) = struct(d.as("d"), n.as("n"))
    val aLower = rank(col("__da"), col("a")) < rank(col("__db"), col("b"))
    val o = withD.select(
        when(aLower, col("a")).otherwise(col("b")).as("u"),
        when(aLower, col("b")).otherwise(col("a")).as("v"),
        when(aLower, rank(col("__db"), col("b")))
          .otherwise(rank(col("__da"), col("a"))).as("__rv"))
      .localCheckpoint(true) // wedge + closure both consume it
    val wedges = o.select(col("u"), col("v").as("__v1"), col("__rv").as("__r1"))
      .join(o.select(col("u"), col("v").as("__v2"), col("__rv").as("__r2")),
        Seq("u"))
      .filter(col("__r1") < col("__r2"))
      .select(col("__v1"), col("__v2"))
    // a wedge (v1, v2) closes iff the oriented edge v1→v2 exists
    // (rank(v1) < rank(v2) by construction, so orientation matches)
    // three independent counts over already-checkpointed frames —
    // overlapped (guide §2.6): the node/edge counts are sub-second scans
    // that otherwise serialize behind the wedge join's straggler tail
    val (tri, nodes, edges) = graft.util.Par.eval3(
      () => wedges.join(o.select(col("u").as("__v1"), col("v").as("__v2")),
        Seq("__v1", "__v2"), "left_semi").count(),
      () => deg.count(),
      () => canon.count())
    val spark = df.sparkSession
    import spark.implicits._
    Seq((nodes, edges, tri)).toDF("n_nodes", "n_edges", "n_triangles")
  }
}
