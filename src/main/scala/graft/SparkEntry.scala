package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from SURVEY.md §2 (or a §7.1-10
  * LLM-pipeline extension), expressed Spark-first. `oracleSql` carries the
  * DuckDB-equivalent ANSI SQL for the driver's hash compare; aggregate
  * columns are cast to DECIMAL before summing on BOTH sides so the result is
  * exact and order-independent (double summation order would otherwise
  * diverge between engines).
  */
object SparkEntry {
  import Tables.load

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1-style status group-count, TPC-H Q1 shape: hash aggregate with
    // map-side partial aggregation; one shuffle on the (2-value) group keys.
    "q1_agg" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // P1: per-namespace user filter from a Mongo query doc ($in +
    // comparison, as in the reference's testdata/data-only.json), compiled
    // to a Column so Catalyst pushes it into the parquet scan.
    "q_filter_in" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(config.MongoPredicate.compile(
          """{"l_returnflag": {"$in": ["R"]}, "l_quantity": {"$gt": 45}}"""))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P1 + extended-JSON $date filter (reference testdata/quickstart.json)
    // with $or over status.
    "q_filter_date" -> ((s, dir) => {
      load(s, dir, "orders")
        .filter(config.MongoPredicate.compile(
          """{"o_orderdate": {"$gte": {"$date": "1999-01-01T00:00:00Z"}},
             "$or": [{"o_orderstatus": "F"}, {"o_totalprice": {"$lt": 1000}}]}"""))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_filter_in" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_returnflag IN ('R') AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_date" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND (o_orderstatus = 'F' OR o_totalprice < 1000)
        |ORDER BY o_orderkey""".stripMargin
  )
}
