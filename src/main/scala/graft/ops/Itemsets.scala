package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-itemset mining, the a-priori first rungs: which items
  * co-occur in the same basket more than chance — market-basket
  * analysis, "parts ordered together", co-cited documents.
  *
  * The naive pair count self-joins the full (basket, item) table with
  * itself — at 10¹⁰ baskets the join explodes on every popular item.
  * The a-priori property (a pair can only be frequent if BOTH items
  * are) cuts it: one map-side-combined item-support count first, an
  * item-level semi-join prunes the basket rows to frequent items only,
  * and only then does the per-basket pair expansion run. Within a
  * basket the expansion is C(k, 2) on the basket's PRUNED size — cost
  * is Σ k², bounded by (max basket size)·rows, never corpus².
  *
  * A pathological basket (one "order" with 10⁶ items) would still
  * square; `maxBasket` caps it exactly as LSH buckets and linkage
  * blocks are capped — oversized baskets are excluded, countable via
  * [[basketCensus]] rather than silently truncated.
  *
  * Output: (item_a, item_b, n_baskets), item_a < item_b, pairs with
  * support ≥ `minPairSupport`. All counts are exact integers. */
object Itemsets {

  /** Distinct (basket, item) rows — the shared intermediate every
    * entry point consumes exactly once. */
  private def basketItems(df: DataFrame, basket: Column,
      item: Column): DataFrame =
    df.select(basket.cast("long").as("__b"), item.cast("long").as("__i"))
      .filter(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()

  /** The pair pipeline, LAZY — exposed package-private so the plan
    * tests can assert the semi-join prune and non-cartesian expansion
    * shapes that the materialized entry points hide behind their
    * lineage cut. `keptTransform` is the materialization hook. */
  private[ops] def lazyPairs(bi: DataFrame, minItemSupport: Long,
      minPairSupport: Long, maxBasket: Int,
      keptTransform: DataFrame => DataFrame = identity): DataFrame = {
    // a-priori prune: items below support can't be in a frequent pair
    val freq = bi.groupBy("__i").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minItemSupport).select("__i")
    val pruned = bi.join(freq, Seq("__i"), "left_semi")
    // basket cap (census-style, like Linkage.candidates)
    val ok = pruned.groupBy("__b").agg(count(lit(1)).as("__k"))
      .filter(col("__k") <= maxBasket).select("__b")
    val kept = keptTransform(pruned.join(ok, Seq("__b"), "left_semi"))
    kept.select(col("__b"), col("__i").as("item_a"))
      .join(kept.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minPairSupport)
  }

  /** [[lazyPairs]] with the materialization contract: bi feeds the
    * support census AND the prune; kept feeds both pair sides — each
    * persists once for the pipeline's lifetime (released before
    * return; the result is eagerly cut, the lshCandidates contract).
    * `biMaterialized` skips the bi persist when the caller already
    * holds a checkpointed frame (rules) — a second cached copy of the
    * largest intermediate buys nothing. */
  private def pairsFromBi(bi0: DataFrame, minItemSupport: Long,
      minPairSupport: Long, maxBasket: Int,
      biMaterialized: Boolean = false): DataFrame = {
    val bi = if (biMaterialized) bi0 else bi0.persist()
    try {
      var keptRef: Option[DataFrame] = None
      try {
        lazyPairs(bi, minItemSupport, minPairSupport, maxBasket,
          keptTransform = { k =>
            val p = k.persist(); keptRef = Some(p); p
          }).localCheckpoint(true)
      } finally { keptRef.foreach(_.unpersist(false)); () }
    } finally { if (!biMaterialized) { bi.unpersist(false); () } }
  }

  /** Frequent co-occurring pairs. `basket`/`item` casts to long. */
  def frequentPairs(df: DataFrame, basket: Column, item: Column,
      minItemSupport: Long = 2, minPairSupport: Long = 2,
      maxBasket: Int = 1000): DataFrame =
    pairsFromBi(basketItems(df, basket, item), minItemSupport,
      minPairSupport, maxBasket)

  /** Post-prune basket-size census — how many baskets (and rows) the
    * `maxBasket` cap excludes from [[frequentPairs]], measured on the
    * item-pruned table the cap actually applies to. One row:
    * (n_baskets, max_basket, n_dropped_baskets, n_dropped_rows);
    * nonzero drops say the cap is biting and co-occurrence mass is
    * being excluded. */
  def basketCensus(df: DataFrame, basket: Column, item: Column,
      minItemSupport: Long = 2, maxBasket: Int = 1000): DataFrame = {
    val bi = basketItems(df, basket, item)
    val freq = bi.groupBy("__i").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minItemSupport).select("__i")
    bi.join(freq, Seq("__i"), "left_semi")
      .groupBy("__b").agg(count(lit(1)).as("__k"))
      .agg(count(lit(1)).as("n_baskets"),
        max(col("__k")).as("max_basket"),
        sum(when(col("__k") > maxBasket, 1L).otherwise(0L))
          .as("n_dropped_baskets"),
        sum(when(col("__k") > maxBasket, col("__k")).otherwise(0L))
          .as("n_dropped_rows"))
  }

  /** Association rules over [[frequentPairs]]: per pair, both item
    * supports, the two directed confidences, and the lift.
    *
    * Confidence is exact integer per-million (`n_ab·10⁶ DIV n_a` —
    * n_ab ≤ n_a keeps it ≤ 10⁶; the product needs n_ab < 9·10¹²,
    * comfortably past any real pair support). Lift crosses three
    * counts (`n_ab·N / (n_a·n_b)`), which overflows integer range at
    * corpus scale, so it derives through the [[Profile.correlations]]
    * discipline instead: cast the exact integers to double FIRST, then
    * one fixed IEEE multiply/divide/floor tree — bit-identical in any
    * engine, no wraparound ever. The supports table is
    * frequent-items-sized and joins back on the item key (AQE
    * broadcast while it fits).
    *
    * The (basket, item) distinct table is materialized ONCE
    * (`localCheckpoint`) and feeds the basket count, the supports,
    * and the pair expansion — never three scans of the raw input. */
  def rules(df: DataFrame, basket: Column, item: Column,
      minItemSupport: Long = 2, minPairSupport: Long = 2,
      maxBasket: Int = 1000): DataFrame = {
    val bi = basketItems(df, basket, item).localCheckpoint(true)
    val nBaskets = bi.select("__b").distinct().count()
    val supports = bi.groupBy("__i").agg(count(lit(1)).as("__n"))
    val pairs = pairsFromBi(bi, minItemSupport, minPairSupport, maxBasket,
      biMaterialized = true)
    def d(c: String) = col(c).cast("double")
    pairs
      .join(supports.select(col("__i").as("item_a"), col("__n").as("n_a")),
        Seq("item_a"))
      .join(supports.select(col("__i").as("item_b"), col("__n").as("n_b")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_baskets"),
        col("n_a"), col("n_b"),
        expr("n_baskets * 1000000 DIV n_a").as("conf_a_to_b_ppm"),
        expr("n_baskets * 1000000 DIV n_b").as("conf_b_to_a_ppm"),
        floor(lit(1000000.0) * (d("n_baskets") * lit(nBaskets.toDouble))
          / (d("n_a") * d("n_b"))).cast("long").as("lift_ppm"))
  }
}
