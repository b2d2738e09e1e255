package graft

import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-shape regression guards for the properties the scale story
  * depends on. These pin OPTIMIZER OUTCOMES, not implementation: if a
  * refactor re-introduces a digest expression into a Filter condition
  * (double evaluation) or breaks scan-level pushdown/pruning, the
  * failure shows up here at sf0.001 instead of as a silent 2× at 100 TB.
  * Only lazy queries are audited — pipeline queries with internal
  * actions would execute work at plan-construction time. */
class PlanAuditSpec extends SparkSpec {

  private def logical(name: String) =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.optimizedPlan

  private def scans(name: String): Seq[FileSourceScanExec] = {
    val plan = SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    unwrapped.collect { case s: FileSourceScanExec => s }
  }

  test("digest expressions stay out of Filter conditions (no double eval)") {
    for (q <- Seq("q_fingerprint", "q_dedup_minhash", "q_sql_surface")) {
      val filters = logical(q).collect { case f: Filter => f.condition.toString }
      val offenders = filters.filter(c =>
        c.contains("shingle_stats") || c.contains("minhash_sigs"))
      assert(offenders.isEmpty,
        s"$q evaluates a digest inside a Filter: ${offenders.mkString("; ")}")
    }
  }

  test("input-column predicates reach the parquet scan") {
    val fp = scans("q_fingerprint")
    assert(fp.nonEmpty && fp.forall(
      _.dataFilters.exists(_.toString.startsWith("isnotnull(text"))))
    // S1: both range bounds land in the scan's data filters
    val s1 = scans("q_s1_range_scan")
    assert(s1.nonEmpty)
    val filters = s1.flatMap(_.dataFilters).map(_.toString)
    assert(filters.exists(_.contains(">=")) && filters.exists(_.contains("<=")),
      s"range bounds not pushed: $filters")
  }

  test("per-row text ops stay shuffle-free (repetition, PII, split)") {
    // these run at scan speed at 100 TB precisely because nothing in
    // them exchanges: one narrow projection end-to-end
    for (q <- Seq("q_repetition", "q_pii_scrub", "q_split_assign")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      // the trailing orderBy (oracle determinism only) is the single
      // allowed exchange; the op itself must not add another
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= 1, s"$q has $exchanges exchanges:\n$plan")
    }
    // token_stats must not leak into a Filter condition (double eval)
    val filters = logical("q_repetition").collect {
      case f: Filter => f.condition.toString }
    assert(!filters.exists(_.contains("token_stats")),
      s"q_repetition evaluates token_stats inside a Filter: $filters")
  }

  test("incremental dedup: the reference side joins via broadcast, never a sort-merge") {
    // exactNew's contract: batch hashes broadcast into a reference-side
    // semi join, matched set broadcast into the batch anti join — a
    // SortMergeJoin here would mean the corpus shuffles per admission
    val plan = SparkEntry.queries("q_dedup_new")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"reference shuffles:\n$plan")
  }

  test("decontamination probes via broadcast — the corpus never shuffles for the join") {
    val plan = SparkEntry.queries("q_decontaminate")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark gram set is not broadcast:\n$plan")
    // the corpus side reaches the join without a shuffle: the only
    // ShuffleExchanges allowed are the post-join aggregation + order
    val shuffles = "ShuffleExchange".r.findAllIn(plan).size
    assert(shuffles <= 3, s"q_decontaminate has $shuffles shuffles:\n$plan")
  }

  test("round-8 operators keep their scale shapes") {
    // as-of: union + per-key window — exactly one shuffle for the
    // window partitioning plus the trailing orderBy range exchange,
    // and NO join anywhere
    val asof = SparkEntry.queries("q_asof")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!asof.contains("Join"), s"q_asof plans a join:\n$asof")
    // interval join: an equi-join on (key, bucket), never a nested loop
    val rj = SparkEntry.queries("q_range_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!rj.contains("BroadcastNestedLoopJoin") &&
      !rj.contains("CartesianProduct"), s"q_range_join degenerates:\n$rj")
    // retention and OHLC: aggregates only — no window operator at all
    for (q <- Seq("q_retention", "q_ohlc")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$q plans a window:\n$plan")
    }
    // grouped top-k: the per-group window must always be preceded by
    // the salted partial (never a raw single window over candidates)
    val tk = SparkEntry.queries("q_topk_group")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(tk).size >= 2,
      s"q_topk_group lost its two-level top-k:\n$tk")
  }

  test("round-9 operators keep their scale shapes") {
    // PQ ADC scan: the query side (LUTs) broadcasts into the corpus
    // scan — the corpus side must reach the join with NO exchange
    // (encode is a narrow literal projection), and the per-query top-k
    // must be the salted two-level pass (two windows)
    val pq = SparkEntry.queries("q_ann_pq")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(pq.contains("BroadcastNestedLoopJoin"),
      s"q_ann_pq lost its broadcast-queries shape:\n$pq")
    assert("Window".r.findAllIn(pq).size >= 2,
      s"q_ann_pq lost its two-level top-k:\n$pq")
    assert(!pq.contains("SortMergeJoin"),
      s"q_ann_pq shuffles the corpus for a join:\n$pq")
    // learned classifier: the vocabulary joins must all be broadcast —
    // the corpus-sized token stream never shuffles to meet a ≤ vocabSize
    // weight table (the only sort-merge-eligible join is the final
    // doc-id left join, which is corpus-keyed and fine)
    val clf = SparkEntry.queries("q_quality_clf")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(clf.contains("BroadcastHashJoin"),
      s"q_quality_clf lost its broadcast vocab join:\n$clf")
    assert(!clf.contains("CartesianProduct"),
      s"q_quality_clf degenerates:\n$clf")
  }

  test("substring dedup and prototype pruning keep their scale shapes") {
    // exact substring spans: the census must be a hash aggregate
    // (map-side combined — a hot gram collapses before the exchange),
    // the join back an equi-join, and every window partitioned per
    // DOCUMENT (a global window would funnel the corpus through one
    // reducer)
    val sp = SparkEntry.queries("q_substr_spans")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!sp.contains("BroadcastNestedLoopJoin") &&
      !sp.contains("CartesianProduct"), s"q_substr_spans degenerates:\n$sp")
    // a global window or one-row funnel would show as a SinglePartition
    // exchange; the only exchanges allowed are hash (census, per-doc
    // windows) and the final range sort
    assert(!sp.contains("SinglePartition"),
      s"q_substr_spans funnels through one partition:\n$sp")
    // the repetition gates are pure projections: zero exchanges before
    // the final presentation sort
    for (q <- Seq("q_rep_lines", "q_rep_ngrams")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(plan).size <= 1, // the orderBy only
        s"$q shuffles beyond the presentation sort:\n$plan")
      assert(!plan.contains("Join"), s"$q plans a join:\n$plan")
    }
    // prototypicality: no corpus-wide per-cluster sort — the only
    // windows run over (cluster) score LEVELS and the boundary
    // tie-break; centroid scoring itself must stay join-free (the
    // literal matrix rides in the projection)
    val pr = SparkEntry.queries("q_prototype")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!pr.contains("CartesianProduct") &&
      !pr.contains("BroadcastNestedLoopJoin"), s"q_prototype degenerates:\n$pr")
    // the anchored staged probe: the reference census scan must carry a
    // PartitionFilter on the bucket column — the static pruning to the
    // batch's hash buckets IS the point of the staged layout; a plan
    // that lists every bucket partition has silently regressed to a
    // full-census scan
    val an = SparkEntry.queries("q_substr_new_anchored")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(an.contains("PartitionFilters: [bkt"),
      s"anchored census scan lost its bucket pruning:\n$an")
    assert(!an.contains("CartesianProduct") &&
      !an.contains("BroadcastNestedLoopJoin"),
      s"q_substr_new_anchored degenerates:\n$an")
  }

  test("no-split packing: one shard exchange, local sort, no windows") {
    // packNoSplit is the surface's one deliberate per-group fold: the
    // plan must be scan → project → ONE hash exchange on the shard key
    // → per-partition (non-global) sort → MapGroups, plus the
    // presentation range sort — and nothing else. A Window here would
    // mean the fold regressed to a global pass; a third exchange that
    // the shard co-location broke.
    val plan = SparkEntry.queries("q_pack_nosplit")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("MapGroups"), s"lost the typed fold:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 2,
      s"expected shard + presentation exchanges only:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    val cols = scans("q_pack_nosplit").map(_.output.map(_.name))
    assert(cols.nonEmpty && cols.forall(_.toSet.subsetOf(Set("doc_id", "text"))),
      s"q_pack_nosplit scan reads: $cols")
  }

  test("scans are pruned to the referenced columns") {
    // q1_agg touches 4 of lineitem's 16 columns: the scan must not
    // read the other 12
    val cols = scans("q1_agg").map(_.output.map(_.name))
    assert(cols.nonEmpty && cols.forall(_.toSet.subsetOf(
      Set("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"))),
      s"q1_agg scan reads: $cols")
    val fp = scans("q_fingerprint").map(_.output.map(_.name))
    assert(fp.nonEmpty && fp.forall(_.toSet.subsetOf(Set("doc_id", "text"))))
  }
}
