package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exactQuantiles interpolates type-7 positions in integer milli-units") {
    val df = Seq(1L, 2L, 3L, 4L, 5L).toDF("x")
    val out = Quantiles.exactQuantiles(df, col("x"),
        Seq(0, 100, 250, 500, 1000))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // n=5: h = 4·q/1000; v_hi is always the NEXT order statistic
    // (clamped at the last) — with rem=0 it contributes nothing
    assert(out(0) == ((5L, 1L, 2L, 1000L))) // h=0 → exactly v[0]
    assert(out(100) == ((5L, 1L, 2L, 1400L))) // h=0.4 → 1 + 0.4·(2−1)
    assert(out(250) == ((5L, 2L, 3L, 2000L))) // h=1.0 → exactly v[1]
    assert(out(500) == ((5L, 3L, 4L, 3000L))) // h=2.0 → exactly v[2]
    assert(out(1000) == ((5L, 5L, 5L, 5000L))) // h=4 → last, v_hi clamps
  }

  test("exactQuantiles handles repeated values (histogram counts > 1)") {
    val df = Seq(10L, 10L, 10L, 20L).toDF("x")
    val out = Quantiles.exactQuantiles(df, col("x"), Seq(500, 750, 900))
      .collect().map(r => r.getInt(0) -> r.getLong(4)).toMap
    // n=4: h = 3·q/1000. q=500 → h=1.5, v[1]=v[2]=10 → 10000
    assert(out(500) == 10000L)
    // q=750 → h=2.25: v[2]=10, v[3]=20 → 10 + 0.25·10 = 12.5 → 12500
    assert(out(750) == 12500L)
    // q=900 → h=2.7 → 10 + 0.7·10 = 17 → 17000
    assert(out(900) == 17000L)
  }

  test("exactQuantilesBy equals the per-group percentile sort aggregate") {
    val d = Tables.load(spark, sf0001, "documents")
    val got = Quantiles.exactQuantilesBy(d, "lang", col("n_chars"),
        Seq(250, 500, 900))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(5) / 1000.0)
      .toMap
    val expect = d.filter(col("n_chars").isNotNull)
      .groupBy("lang")
      .agg(percentile(col("n_chars"),
        typedLit(Seq(0.25, 0.5, 0.9))).as("p"))
      .collect()
      .flatMap(r => Seq(250, 500, 900).zip(r.getSeq[Double](1))
        .map { case (q, v) => (r.getString(0), q) -> v })
      .toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    got.foreach { case (k, v) =>
      assert(math.abs(v - expect(k)) < 1e-6,
        s"$k: histogram says $v, percentile says ${expect(k)}")
    }
  }

  test("exactQuantilesBy windows are group-partitioned (no global sort stage)") {
    val d = Tables.load(spark, sf0001, "documents")
    val out = Quantiles.exactQuantilesBy(d, "lang", col("n_chars"), Seq(500))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "expected the cumulative window")
    // a windowspecdefinition that STARTS with the value column (no __g
    // partition key before it) would be the global-sort shape
    assert("windowspecdefinition\\(v#".r.findFirstIn(plan).isEmpty,
      s"unpartitioned window found:\n$plan")
  }

  test("percentileRanks matches percent_rank() and keeps nulls unranked") {
    val df = Seq[(Long, java.lang.Long)]((1L, 10L), (2L, 20L), (3L, 20L),
      (4L, 30L), (5L, null), (6L, 5L)).toDF("id", "v")
    val got = Quantiles.percentileRanks(df, col("v"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        Option(r.get(r.fieldIndex("rank_lt"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("pr_ppm"))).map(_.asInstanceOf[Long])))
    // 5 non-null values: 5,10,20,20,30 → rank_lt: 1,2,2,4,0; n-1 = 4
    assert(got.toSeq == Seq(
      (1L, Some(1L), Some(250000L)),
      (2L, Some(2L), Some(500000L)),
      (3L, Some(2L), Some(500000L)),
      (4L, Some(4L), Some(1000000L)),
      (5L, None, None),
      (6L, Some(0L), Some(0L))))
  }

  test("percentileRanks matches the window percent_rank on real lengths") {
    val lens = Tables.load(spark, sf0001, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("n_chars"))
    val got = Quantiles.percentileRanks(lens, col("n_chars"))
      .select(col("doc_id"), col("pr_ppm"))
    val expect = lens.select(col("doc_id"),
      floor(percent_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("n_chars"))
        * 1000000).cast("long").as("pr_ppm"))
    // percent_rank = rank_lt/(n-1) exactly; floor via double may differ
    // by 1 ppm at representation boundaries — allow that slack
    val joined = got.join(expect.withColumnRenamed("pr_ppm", "pr_w"), "doc_id")
      .select(abs(col("pr_ppm") - col("pr_w")).as("d"))
      .agg(max("d")).collect().head.getLong(0)
    assert(joined <= 1, s"ppm ranks diverged by $joined")
  }

  test("percentileRanksBy ranks within each group independently") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 5L), (5L, "b", 5L)).toDF("id", "g", "v")
    val got = Quantiles.percentileRanksBy(df, "g", col("v"))
      .orderBy("id")
      .select("id", "rank_lt", "n_group", "pr_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 3L, 0L), (2L, 1L, 3L, 500000L), (3L, 2L, 3L, 1000000L),
      (4L, 0L, 2L, 0L), (5L, 0L, 2L, 0L)))
    // matches the per-group window percent_rank on real data
    val lens = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val a = Quantiles.percentileRanksBy(lens, "lang", col("n_chars"))
      .select(col("doc_id"), col("pr_ppm"))
    val b = lens.select(col("doc_id"),
      floor(percent_rank().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy("n_chars")) * 1000000).cast("long").as("pr_w"))
    val maxD = a.join(b, "doc_id")
      .select(abs(col("pr_ppm") - col("pr_w")).as("d"))
      .agg(max("d")).collect().head.getLong(0)
    assert(maxD <= 1, s"ppm ranks diverged by $maxD")
  }

  test("percentileRanksBy ranks the NULL group as its own partition") {
    // SQL `percent_rank() OVER (PARTITION BY g ...)` puts NULL-keyed
    // rows in one partition and ranks them; a plain === join would
    // leave them rankless (the advisory case — join is null-safe <=>)
    val df = Seq[(Long, String, Long)]((1L, null, 10L), (2L, null, 20L),
      (3L, null, 30L), (4L, "a", 5L)).toDF("id", "g", "v")
    val got = Quantiles.percentileRanksBy(df, "g", col("v"))
      .orderBy("id")
      .select("id", "rank_lt", "n_group", "pr_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 3L, 0L), (2L, 1L, 3L, 500000L), (3L, 2L, 3L, 1000000L),
      (4L, 0L, 1L, 0L)))
  }

  test("percentileRanks has no row-sized unpartitioned window") {
    val df = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    val out = Quantiles.percentileRanks(df, col("v"))
    val plan = out.queryExecution.optimizedPlan.toString
    // the only Window in the plan consumes the histogram aggregate,
    // never the raw rows: Window's child chain must contain Aggregate
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0)
    assert(plan.indexOf("Aggregate", winIdx) > winIdx,
      s"window does not sit on the histogram:\n$plan")
  }

  test("exactQuantiles equals Spark's percentile aggregate on real lengths") {
    val lens = Tables.load(spark, sf0001, "documents")
      .filter(col("text").isNotNull)
      .select(size(graft.text.TextFunctions.whitespaceTokens(col("text")))
        .cast("long").as("len"))
    val qs = Seq(100, 250, 500, 750, 900, 950, 990, 999, 1000)
    val got = Quantiles.exactQuantiles(lens, col("len"), qs)
      .collect().map(r => r.getInt(0) -> r.getLong(4) / 1000.0).toMap
    val expect = lens.agg(
      percentile(col("len"), typedLit(qs.map(_ / 1000.0))).as("p"))
      .collect().head.getSeq[Double](0)
    qs.zip(expect).foreach { case (q, e) =>
      assert(math.abs(got(q) - e) < 1e-6,
        s"q=$q: histogram says ${got(q)}, percentile says $e")
    }
  }
}
