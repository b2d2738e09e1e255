package graft

/** Whole-surface plan lint: every declared query, planned at sf0.001,
  * must be free of the two unconditional anti-patterns —
  * CartesianProduct (every intended cross join is a broadcast of a
  * 1-row/driver-sized frame → BroadcastNestedLoopJoin) and Scala UDFs
  * (the engine is expression-only by design; a UDF would break codegen
  * and the SQL-oracle reproducibility story).
  *
  * Queries that return through `localCheckpoint` have already executed
  * their interesting plan during construction and show a LogicalRDD
  * here — they pass trivially; their shapes are pinned by the
  * per-operator plan tests instead. This lint is the backstop for the
  * direct (non-materialized) majority. */
class PlanLintSpec extends SparkSpec {

  // exact `percentile` buffers every value of its group in one
  // aggregation buffer — corpus-sized when the group is global. The only
  // queries allowed to plan it are the documented exact ANCHORS, each of
  // which cross-references its bounded histogram/t-digest twin
  // (ops/Quantiles.exactQuantiles{,By}); everything else must use the
  // bounded route. `approx_percentile` (t-digest, constant state) is
  // always fine.
  private val percentileAnchors =
    Set("q_corpus_stats", "q_group_quantiles", "q_approx_quantile")
  private val exactPercentile = "(?<!approx_)percentile\\(".r

  test("no declared query plans a CartesianProduct, a Scala UDF, or an unsanctioned exact percentile") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        Seq(
          Option.when(plan.contains("CartesianProduct"))(s"$name: CartesianProduct"),
          Option.when(plan.contains("ScalaUDF"))(s"$name: ScalaUDF"),
          Option.when(!percentileAnchors(name) &&
            exactPercentile.findFirstIn(plan).isDefined)(
            s"$name: exact percentile outside the anchor set")).flatten
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
