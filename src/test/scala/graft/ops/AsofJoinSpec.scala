package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // probes: (event_id, user_id, t)
  private def probes = Seq(
    (1L, 1L, 100L), // after both refs of user 1
    (2L, 1L, 50L),  // between the two refs
    (3L, 1L, 9L),   // before every ref → null payload
    (4L, 1L, 10L),  // EXACTLY at ref time → ties to the ref (<=)
    (5L, 2L, 100L), // user with no refs at all
    (6L, 3L, 30L),  // user 3: two refs share t=30 — tie goes to larger tieCol
    (7L, 1L, 50L)   // duplicate probe time: same answer as probe 2
  ).toDF("event_id", "user_id", "t")

  // refs: (user_id, t, rid, v)
  private def refs = Seq(
    (1L, 10L, 100L, 1.0),
    (1L, 50L, 101L, 2.0),
    (3L, 30L, 200L, 5.0),
    (3L, 30L, 201L, 6.0)
  ).toDF("user_id", "t", "rid", "v")

  test("asofLast picks the latest at-or-before reference per probe") {
    val out = AsofJoin.asofLast(probes, refs, key = "user_id", timeCol = "t",
        tieCol = "rid", payload = Seq("rid", "v"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, Some(101L), Some(2.0)),
      (2L, Some(101L), Some(2.0)), // ref at t=50 counts (at-or-before)
      (3L, None, None),
      (4L, Some(100L), Some(1.0)), // tie at t=10 matches the ref
      (5L, None, None),
      (6L, Some(201L), Some(6.0)), // larger rid wins the equal-t tie
      (7L, Some(101L), Some(2.0))))
  }

  test("asofLast equals the brute-force non-equi join + argmax") {
    // deterministic pseudo-random fixture, hundreds of rows
    val p = spark.range(500).select(
      $"id".as("event_id"), ($"id" % 17).as("user_id"),
      (($"id" * 37) % 1000).as("t"))
    val r = spark.range(300).select(
      ($"id" % 17).as("user_id"), (($"id" * 53) % 1000).as("t"),
      $"id".as("rid"), ($"id" % 7).cast("double").as("v"))
    val fast = AsofJoin.asofLast(p, r, "user_id", "t", "rid", Seq("rid", "v"))
      .select("event_id", "ref_rid", "ref_v")

    val w = Window.partitionBy("event_id")
      .orderBy(col("r_t").desc_nulls_last, col("rid").desc_nulls_last)
    val rr = r.select(col("user_id").as("r_uid"), col("t").as("r_t"),
      col("rid"), col("v"))
    val brute = p.join(rr,
        col("user_id") === col("r_uid") && col("r_t") <= col("t"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("rid").as("ref_rid"), col("v").as("ref_v"))

    val key = (row: org.apache.spark.sql.Row) =>
      (row.getLong(0), Option(row.get(1)), Option(row.get(2)))
    assert(fast.collect().map(key).sortBy(_._1).toSeq ==
      brute.collect().map(key).sortBy(_._1).toSeq)
    assert(fast.count() == p.count())
  }

  test("null-time references never match (non-equi semantics, not nulls-first)") {
    val p = Seq((1L, 1L, 100L)).toDF("event_id", "user_id", "t")
    val r = Seq((1L, Option.empty[Long], 999L, 1.0),
      (1L, Some(50L), 100L, 2.0)).toDF("user_id", "t", "rid", "v")
    val out = AsofJoin.asofLast(p, r, "user_id", "t", "rid", Seq("rid"))
      .head()
    assert(out.getLong(3) == 100L, "the null-time ref must be ignored")
  }

  test("asofNext picks the earliest at-or-after reference, smallest tie first") {
    val out = AsofJoin.asofNext(probes, refs, key = "user_id", timeCol = "t",
        tieCol = "rid", payload = Seq("rid", "v"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      (1L, 100L, None),        // after every ref
      (2L, 50L, Some(101L)),   // ref at t=50 counts (at-or-after)
      (3L, 9L, Some(100L)),    // next ref is t=10
      (4L, 10L, Some(100L)),   // tie at t=10 matches
      (5L, 100L, None),        // no refs for user 2
      (6L, 30L, Some(200L)),   // SMALLEST rid wins the equal-t tie
      (7L, 50L, Some(101L))))
    // probe times come back un-negated
    assert(out.map(_._2).toSeq == Seq(100L, 50L, 9L, 10L, 100L, 30L, 50L))
  }

  test("asofNext returns ref_<timeCol> un-negated when time is in the payload") {
    val out = AsofJoin.asofNext(probes, refs, key = "user_id", timeCol = "t",
        tieCol = "rid", payload = Seq("t", "rid"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      (1L, None, None),
      (2L, Some(50L), Some(101L)), // matched-ref time, positive
      (3L, Some(10L), Some(100L)),
      (4L, Some(10L), Some(100L)),
      (5L, None, None),
      (6L, Some(30L), Some(200L)),
      (7L, Some(50L), Some(101L))))
  }

  test("asofWithin nulls payloads older than the tolerance") {
    val out = AsofJoin.asofWithin(probes, refs, key = "user_id", timeCol = "t",
        tieCol = "rid", payload = Seq("rid", "v"), toleranceUs = 40L)
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, None, None),            // match at t=50 is 50 back — beyond 40
      (2L, Some(101L), Some(2.0)), // 0 back
      (3L, None, None),
      (4L, Some(100L), Some(1.0)), // exact tie, 0 back
      (5L, None, None),
      (6L, Some(201L), Some(6.0)),
      (7L, Some(101L), Some(2.0))))
    // tolerance columns: ref_t only survives when requested
    assert(!out.isEmpty)
    val cols = AsofJoin.asofWithin(probes, refs, "user_id", "t", "rid",
      Seq("rid", "v"), 40L).columns.toSeq
    assert(cols == Seq("event_id", "user_id", "t", "ref_rid", "ref_v"))
    val colsT = AsofJoin.asofWithin(probes, refs, "user_id", "t", "rid",
      Seq("t", "rid"), 40L).columns.toSeq
    assert(colsT == Seq("event_id", "user_id", "t", "ref_t", "ref_rid"))
  }

  test("asofWithin equals the tolerance-filtered brute-force join") {
    val p = spark.range(500).select(
      $"id".as("event_id"), ($"id" % 17).as("user_id"),
      (($"id" * 37) % 1000).as("t"))
    val r = spark.range(300).select(
      ($"id" % 17).as("user_id"), (($"id" * 53) % 1000).as("t"),
      $"id".as("rid"), ($"id" % 7).cast("double").as("v"))
    val tol = 60L
    val fast = AsofJoin.asofWithin(p, r, "user_id", "t", "rid",
        Seq("rid", "v"), tol)
      .select("event_id", "ref_rid", "ref_v")
    // brute force: latest at-or-before AND within the horizon — the
    // tolerance applies to the MATCHED ref, not as a search widening
    val w = Window.partitionBy("event_id")
      .orderBy(col("r_t").desc_nulls_last, col("rid").desc_nulls_last)
    val rr = r.select(col("user_id").as("r_uid"), col("t").as("r_t"),
      col("rid"), col("v"))
    val brute = p.join(rr,
        col("user_id") === col("r_uid") && col("r_t") <= col("t"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"),
        when(col("t") - col("r_t") <= tol, col("rid")).as("ref_rid"),
        when(col("t") - col("r_t") <= tol, col("v")).as("ref_v"))
    val key = (row: org.apache.spark.sql.Row) =>
      (row.getLong(0), Option(row.get(1)), Option(row.get(2)))
    assert(fast.collect().map(key).sortBy(_._1).toSeq ==
      brute.collect().map(key).sortBy(_._1).toSeq)
    assert(fast.count() == p.count())
  }

  test("asofWithin(Long.MaxValue tolerance) == asofLast") {
    val p = spark.range(200).select(
      $"id".as("event_id"), ($"id" % 11).as("user_id"),
      (($"id" * 37) % 500).as("t"))
    val r = spark.range(150).select(
      ($"id" % 11).as("user_id"), (($"id" * 53) % 500).as("t"),
      $"id".as("rid"), ($"id" % 7).cast("double").as("v"))
    val a = AsofJoin.asofLast(p, r, "user_id", "t", "rid", Seq("rid", "v"))
    val b = AsofJoin.asofWithin(p, r, "user_id", "t", "rid", Seq("rid", "v"),
      Long.MaxValue)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("asofLast plans one exchange and no join") {
    val out = AsofJoin.asofLast(probes, refs, "user_id", "t", "rid", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"no join expected:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
