package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the pre-training validation gate
  * (the Deequ/Great-Expectations shape): a rule list compiles to ONE
  * conditional-aggregation pass over the table, so a 100 TB audit costs
  * exactly one scan with map-side-combined counters — never a scan per
  * rule, never a driver loop.
  *
  * Two rule families:
  *  - [[rowRule]]: a boolean predicate evaluated per row; the report
  *    carries its violation count (`sum(!p)`).
  *  - [[uniqueRule]]: key uniqueness — duplicates can't be counted in a
  *    narrow pass, so each unique rule adds one map-side-combined
  *    `count - count_distinct` aggregate (exact, not HLL) in the same
  *    job; DISTINCT aggregates share the scan via Spark's expand.
  *
  * Output: one row per rule — (rule, n_violations, pass) — integer
  * counts only, engine-exact (`q_dq_checks`). */
object Checks {

  final case class Rule(name: String, agg: Column)

  /** Predicate rule: count rows where `p` is FALSE or NULL (a null
    * predicate is a violation — a null-tolerant rule must say so with
    * coalesce/isNull explicitly). */
  def rowRule(name: String, p: Column): Rule =
    Rule(name, sum((!coalesce(p, lit(false))).cast("long")))

  /** Uniqueness rule: `count(key) − count(DISTINCT key)` exact surplus
    * occurrences of duplicated keys (nulls excluded from both sides). */
  def uniqueRule(name: String, key: Column): Rule =
    Rule(name, count(key) - countDistinct(key))

  /** Run every rule in one aggregation pass; unpivot to the report. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    val aggs = rules.map(r => coalesce(r.agg, lit(0L)).as(r.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val pairs = rules.flatMap(r =>
      Seq(lit(r.name), col(r.name).cast("long")))
    wide.select(explode(map(pairs: _*)).as(Seq("rule", "n_violations")))
      .select(col("rule"), col("n_violations"),
        (col("n_violations") === 0).as("pass"))
  }
}
