package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("intervals collapses runs, reopens on re-appearing values, ties on tieCol") {
    val feed = Seq(
      // user 1: A A B A — three intervals (A re-appears)
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"),
      // user 2: tie at t=10 — event_id orders B(5) before A(6)
      (2L, 10L, 5L, "B"), (2L, 10L, 6L, "A"),
      // user 3: single observation
      (3L, 99L, 7L, "C")
    ).toDF("user_id", "ts_us", "event_id", "event_type")
    val out = Scd2.intervals(feed, "user_id", col("ts_us"), "event_id",
        "event_type")
      .orderBy("user_id", "valid_from", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "A", 10L, Some(30L), 2L),
      (1L, "B", 30L, Some(40L), 1L),
      (1L, "A", 40L, None, 1L),
      (2L, "A", 10L, None, 1L),
      (2L, "B", 10L, Some(10L), 1L),
      (3L, "C", 99L, None, 1L)))
  }

  test("null values merge into runs under null-safe equality") {
    val feed = Seq(
      (1L, 10L, 1L, Some("A")), (1L, 20L, 2L, None),
      (1L, 30L, 3L, None), (1L, 40L, 4L, Some("A"))
    ).toDF("user_id", "ts_us", "event_id", "v")
    val out = Scd2.intervals(feed, "user_id", col("ts_us"), "event_id", "v")
      .orderBy("valid_from").collect()
      .map(r => (Option(r.getString(1)), r.getLong(2), r.getLong(4)))
    assert(out.toSeq == Seq(
      (Some("A"), 10L, 1L), (None, 20L, 2L), (Some("A"), 40L, 1L)))
  }

  test("random feeds match a sequential driver reference (seeded)") {
    val r = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val rows = (0 until 400).map(i =>
        (r.nextInt(6).toLong, r.nextInt(50).toLong, i.toLong,
          "v" + r.nextInt(3)))
      val df = rows.toDF("k", "t", "tie", "v")
      val got = Scd2.intervals(df, "k", col("t"), "tie", "v").collect()
        .map(row => (row.getLong(0), row.getString(1), row.getLong(2),
          Option(row.get(3)).map(_.asInstanceOf[Long]), row.getLong(4)))
        .toSet
      val expect = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.sortBy(x => (x._2, x._3))
        val runs = sorted.foldLeft(Vector.empty[(String, Long, Long)]) {
          case (acc, (_, t, _, v)) =>
            acc.lastOption match {
              case Some((pv, from, n)) if pv == v =>
                acc.init :+ ((pv, from, n + 1))
              case _ => acc :+ ((v, t, 1L))
            }
        }
        runs.zipWithIndex.map { case ((v, from, n), i) =>
          val to = if (i + 1 < runs.size) Some(runs(i + 1)._2) else None
          (k, v, from, to, n)
        }
      }.toSet
      assert(got == expect)
    }
  }

  test("intervals tile each key's timeline: valid_to equals the successor's valid_from") {
    val feed = spark.range(2000).select(
      ($"id" % 7).as("user_id"), (($"id" * 37) % 500).as("ts_us"),
      $"id".as("event_id"),
      concat(lit("s"), ($"id" % 3)).as("event_type"))
    val out = Scd2.intervals(feed, "user_id", col("ts_us"), "event_id",
      "event_type").cache()
    // observation conservation
    assert(out.agg(sum("n_obs")).head().getLong(0) == 2000L)
    // per key: exactly one open interval; closures match successors
    val perKey = out.groupBy("user_id")
      .agg(sum(col("valid_to").isNull.cast("long")).as("open"))
    assert(perKey.filter(col("open") =!= 1).count() == 0)
    out.unpersist()
  }
}
