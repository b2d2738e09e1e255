package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    // ---- A1: hash aggregate (status group-count shape, TPC-H Q1 style) ----
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

    // ---- P1: per-namespace user filter from a Mongo query doc ----
    // ($in + comparison, as in reference testdata/data-only.json), compiled
    // to a Column so Catalyst pushes it into the parquet scan.
    "q_filter_in" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(config.MongoPredicate.compile(
          """{"l_returnflag": {"$in": ["R"]}, "l_quantity": {"$gt": 45}}"""))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- P1 + extended-JSON $date filter (reference testdata/quickstart.json) ----
    "q_filter_date" -> ((s, dir) => {
      load(s, dir, "orders")
        .filter(config.MongoPredicate.compile(
          """{"o_orderdate": {"$gte": {"$date": "1999-01-01T00:00:00Z"}},
             "$or": [{"o_orderstatus": "F"}, {"o_totalprice": {"$lt": 1000}}]}"""))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // ---- S1: filtered range scan — user filter AND key∈[lo,hi] ----
    // (task.go:54-57); both predicates reach PushedFilters in the scan.
    "q_s1_range_scan" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(config.MongoPredicate.compile("""{"l_returnflag": "R"}""")
          && col("l_orderkey").between(1000, 3000))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- P7: limit (unwired in the reference; wired here) ----
    // deterministic via sort; becomes TakeOrderedAndProject (no full sort).
    "q_p7_limit" -> ((s, dir) => {
      load(s, dir, "orders")
        .orderBy("o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // ---- T1: default mask — every [a-zA-Z0-9] → X (mask.go:60-63) ----
    "q_t1_mask_default" -> ((s, dir) => {
      val df = load(s, dir, "customer")
      df.select(col("c_custkey"),
          ops.Mask.maskedValue(col("c_name"), ops.Mask.Default).as("name_masked"),
          col("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // ---- T2: partial mask — keep last 4 chars (mask.go:54-56) ----
    "q_t2_mask_partial" -> ((s, dir) => {
      val df = load(s, dir, "customer")
      df.select(col("c_custkey"),
          ops.Mask.maskedValue(col("c_name"), ops.Mask.Partial).as("name_masked"))
        .orderBy("c_custkey")
    }),

    // ---- T3: hex mask, deterministic variant (md5-prefix; SURVEY §7.4.4) ----
    "q_t3_mask_hash" -> ((s, dir) => {
      val df = load(s, dir, "customer")
      df.select(col("c_custkey"),
          ops.Mask.maskedValue(col("c_name"), ops.Mask.HexDeterministic).as("name_hex"))
        .orderBy("c_custkey")
    }),

    // ---- X1: range splitter — block-sized [first,last] bounds + counts ----
    // (splitter.go:76-102). Exact window variant; the scale path is
    // RangeSplitter.repartitionByKeyRange (sampling, no global sort).
    "q_x1_split_bounds" -> ((s, dir) =>
      ops.RangeSplitter.exactBounds(load(s, dir, "orders"), "o_orderkey", 1000)),

    // ---- A2: count-by-filter (task.go:96 reconciliation count) ----
    "q_a2_count" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .agg(count(lit(1)).as("cnt"))
    }),

    // ---- A4: sample + group (sim.go:244-247) ----
    // deterministic mod-sample so the oracle can reproduce it exactly;
    // production variant is df.sample(fraction).
    "q_a4_sample_group" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(col("l_orderkey") % 10 === 3)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("total"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // ---- J1: cluster diff (-compare) — full-outer join + row fingerprint ----
    // (compare.go:13-31). Target derived from source with deterministic
    // perturbations (drops, mutations, extras); output = per-status counts.
    "q_j1_compare" -> ((s, dir) => {
      val o = load(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
      val kept = o.filter(col("k") % 97 =!= 0)
      val tgt = kept
        .withColumn("o_totalprice",
          when(col("k") % 101 === 0, col("o_totalprice") + 1).otherwise(col("o_totalprice")))
        .unionByName(o.filter(col("k") % 97 === 0).withColumn("k", col("k") + 10000000L))
      verify.Compare.diff(o, tgt, "k")
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    }),

    // ---- J2: dup-key reconciliation semi-join (task.go:95-97) ----
    "q_j2_semi" -> ((s, dir) => {
      val orders = load(s, dir, "orders")
      val batch = orders.filter(col("o_orderkey") <= 2000)
      val target = orders.filter(col("o_orderkey") % 2 === 0)
      verify.Compare.existingKeys(batch, target, "o_orderkey").orderBy("o_orderkey")
    }),

    // ---- J3: last-write-wins per-key compaction (oplog apply ordering) ----
    // the micro-batch compaction inside K2's foreachBatch, run as a batch
    // query over the events change-log table.
    "q_j3_compaction" -> ((s, dir) => {
      // ts is ns-since-epoch (nanosAsLong); compact at µs precision because
      // DuckDB coerces parquet ns-timestamps to µs — ordering must use the
      // same precision on both sides or tie-breaks diverge.
      val tsUs = expr("ts DIV 1000")
      val w = Window.partitionBy("user_id").orderBy(tsUs.desc, col("event_id").desc)
      load(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), tsUs.as("ts_us"))
        .orderBy("user_id")
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
        |ORDER BY o_orderkey""".stripMargin,
    "q_s1_range_scan" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_orderkey BETWEEN 1000 AND 3000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_p7_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q_t1_mask_default" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[a-zA-Z0-9]', 'X', 'g') AS name_masked,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_t2_mask_partial" ->
      """SELECT c_custkey,
        |  CASE WHEN length(c_name) > 4
        |    THEN regexp_replace(substr(c_name, 1, length(c_name)-4), '[a-zA-Z0-9]', 'X', 'g')
        |         || substr(c_name, length(c_name)-3, 4)
        |    ELSE regexp_replace(c_name, '[a-zA-Z0-9]', 'X', 'g') END AS name_masked
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_t3_mask_hash" ->
      """SELECT c_custkey, substr(md5(c_name), 1, 24) AS name_hex
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_x1_split_bounds" ->
      """SELECT rn // 1000 AS task_seq,
        |  min(o_orderkey) AS id_first, max(o_orderkey) AS id_last,
        |  count(*) AS source_count
        |FROM (SELECT o_orderkey,
        |        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn
        |      FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_a2_count" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag = 'R'",
    "q_a4_sample_group" ->
      """SELECT l_returnflag, count(*) AS total,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_orderkey % 10 = 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_j1_compare" ->
      """WITH src AS (
        |  SELECT o_orderkey AS k, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |kept AS (SELECT * FROM src WHERE k % 97 <> 0),
        |tgt AS (
        |  SELECT k, o_custkey, o_orderstatus,
        |    CASE WHEN k % 101 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
        |  FROM kept
        |  UNION ALL
        |  SELECT k + 10000000, o_custkey, o_orderstatus, o_totalprice
        |  FROM src WHERE k % 97 = 0),
        |d AS (
        |  SELECT CASE WHEN s.k IS NULL THEN 'extra'
        |              WHEN t.k IS NULL THEN 'missing'
        |              WHEN s.o_custkey = t.o_custkey
        |               AND s.o_orderstatus = t.o_orderstatus
        |               AND s.o_totalprice = t.o_totalprice THEN 'match'
        |              ELSE 'mismatch' END AS status
        |  FROM src s FULL OUTER JOIN tgt t ON s.k = t.k)
        |SELECT status, count(*) AS n FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_j2_semi" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_orderkey <= 2000 AND o_orderkey % 2 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "q_j3_compaction" ->
      """SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin
  )
}
