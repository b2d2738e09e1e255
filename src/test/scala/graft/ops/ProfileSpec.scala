package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("report profiles nulls, distincts, and canonical min/max per type") {
    val df = Seq(
      (Some(10L), Some(1.5), Some("b")),
      (Some(9L), Some(-2.25), Some("a")),
      (None, None, Some("a"))
    ).toDF("k", "x", "s")
    val out = Profile.report(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))).toMap
    // numeric min is NUMERIC (9 < 10 — a string min would say "10")
    assert(out("k") == ((1L, 2L, "9", "10")))
    // doubles milli-quantized: floor(-2.25*1000) = -2250
    assert(out("x") == ((1L, 2L, "-2250", "1500")))
    assert(out("s") == ((0L, 2L, "a", "b")))
  }

  test("parallelism floor is SCALE-GATED: fan-out planned only below one scan split per core") {
    val rows = Seq.tabulate(100)(i => (i.toLong, s"v$i"))
    def fannedOut(d: org.apache.spark.sql.DataFrame) =
      Profile.report(d).queryExecution.optimizedPlan.toString
        .contains("Repartition")
    // a tiny input (bytes << cores × maxPartitionBytes) gets the
    // explicit fan-out exchange before the EXPAND-heavy aggregate
    assert(fannedOut(rows.toDF("k", "s")))
    // the SAME input under a 1-byte split size measures as "already one
    // split per core" — the gate must NOT plan the exchange (the 100 TB
    // shape: a big scan never pays an unconditional repartition)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.files.maxPartitionBytes", "1")
    assert(!fannedOut(ss.createDataFrame(rows).toDF("k", "s")))
  }

  test("all-null columns report null min/max and zero distinct") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("k", "s")
    val row = Profile.report(df).filter(col("column") === "s").head()
    assert(row.getLong(1) == 2L && row.getLong(2) == 0L)
    assert(row.isNullAt(3) && row.isNullAt(4))
  }

  test("default path skips unprofilable columns; naming one fails loudly") {
    val df = Seq((1L, Seq(1, 2)), (2L, Seq(3))).toDF("k", "arr")
    // default: arr silently skipped, k still profiled (-profile works on
    // any namespace)
    val cols = Profile.report(df).select("column").as[String].collect().toSeq
    assert(cols == Seq("k"))
    // explicit request names the offending column
    val e = intercept[IllegalArgumentException] {
      Profile.report(df, Seq("arr"))
    }
    assert(e.getMessage.contains("arr"))
  }

  test("approx path: no EXPAND in the plan, estimates within tolerance") {
    val df = spark.range(2000).selectExpr("id AS k", "id % 37 AS m")
    val exactPlan = Profile.report(df)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-column distinct should use EXPAND (sanity)")
    val approx = Profile.report(df, approxRsd = Some(0.02))
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      s"sketch path must not multiply rows:\n$approxPlan")
    val est = approx.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(math.abs(est("k") - 2000L) <= 100 &&
      math.abs(est("m") - 37L) <= 3, s"estimates off: $est")
  }

  test("date columns profile as epoch days") {
    val df = Seq("2020-01-02", "1969-12-31").toDF("d")
      .select(to_date(col("d")).as("d"))
    val row = Profile.report(df).head()
    // 1969-12-31 = epoch day -1; 2020-01-02 = 18263
    assert(row.getString(3) == "-1" && row.getString(4) == "18263")
  }

  test("drift flags added/removed columns and bound changes") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val b = Seq((1L, 9.0), (3L, 8.0)).toDF("id", "d")
    val out = Profile.drift(a, b).collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), Option(r.get(r.fieldIndex("n_distinct_b")))
          .map(_.asInstanceOf[Long]),
          r.getBoolean(r.fieldIndex("bounds_changed"))))).toMap
    assert(out("id") == (("both", Some(2L), true)))  // max 2 → 3
    assert(out("s") == (("removed", None, true)))
    assert(out("d")._1 == "added" && out("d")._3)
    // identical snapshots: nothing drifts
    val same = Profile.drift(a, a)
    assert(same.filter(col("bounds_changed") ||
      col("presence") =!= "both").count() == 0)
  }

  test("correlations: exact ±1 poles, constant→null, pairwise nulls") {
    val df = Seq[(java.lang.Long, java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 2L, -1L, 7L), (2L, 4L, -2L, 7L), (3L, 6L, -3L, 7L),
      (4L, null, -4L, 7L)).toDF("x", "y2", "neg", "c")
    val out = Profile.correlations(df, Seq("x" -> col("x"), "y2" -> col("y2"),
        "neg" -> col("neg"), "c" -> col("c")))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), Option(r.get(8)).map(_.asInstanceOf[Long])))).toMap
    def m2(a: String, b: String) = out((a, b))
    assert(m2("x", "y2") == ((3L, Some(1000000L))))  // null row excluded pairwise
    assert(m2("x", "neg") == ((4L, Some(-1000000L))))
    assert(m2("x", "c") == ((4L, None)))             // constant side
    assert(m2("y2", "neg") == ((3L, Some(-1000000L)))) // pole, clamped
  }

  test("correlations match Spark's corr to 1e-6 and reuse one scan") {
    val e = Tables.load(spark, sf0001, "events")
      .select(floor(col("value") * 10).as("vd"),
        (col("event_id") % 24).as("hr"))
    val got = Profile.correlations(e, Seq("vd" -> col("vd"), "hr" -> col("hr")))
    val row = got.collect().head
    val rPpm = row.getLong(row.fieldIndex("r_ppm"))
    val expect = e.agg(corr(col("vd"), col("hr"))).collect().head.getDouble(0)
    assert(math.abs(rPpm / 1e6 - expect) < 1e-5,
      s"r_ppm $rPpm vs corr $expect")
    // the three metric pairs must share ONE scan+aggregate (explode of
    // the single wide row — never a per-pair union that re-scans)
    val three = Profile.correlations(e, Seq("vd" -> col("vd"),
      "hr" -> col("hr"), "id" -> (col("hr") + 1)))
    val plan = three.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 1, s"expected one corpus scan, saw $scans:\n$plan")
  }
}
