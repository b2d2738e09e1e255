package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.load(spark, sf0001, "events")

  test("tumbling window counts: streaming equals batch") {
    val batch = EventStream.tumblingCounts(events)
      .collect().map(_.toSeq).toSet

    val dir = Files.createTempDirectory("graft-ev").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = EventStream.tumblingCounts(stream)
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("tumbling_test").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("sliding window counts: streaming equals batch; 4 windows per event") {
    val batch = EventStream.slidingCounts(events)
      .collect().map(_.toSeq).toSet
    // 1h length / 15m slide: total event count across windows = 4 × events
    val total = EventStream.slidingCounts(events)
      .agg(sum("n_events")).head().getLong(0)
    assert(total == 4L * events.count())

    val dir = Files.createTempDirectory("graft-ev3").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = EventStream.slidingCounts(stream)
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("sliding_test").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("sessionize (flatMapGroupsWithState) equals the window-gap batch plan") {
    val gap = 3600L * 1000000
    val ev = events.select(col("user_id"), Tables.tsUs(events).as("tsUs"))
      .as[EventStream.SessionEvent]
    val stateful = EventStream.sessionize(ev, gap).collect()
      .map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events)).toSet
    val planned = EventStream.sessionizeBatch(events, gap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(stateful == planned && stateful.nonEmpty)
  }

  test("sessionize carries open sessions across micro-batches (GroupState)") {
    val dir = Files.createTempDirectory("graft-sess").toString
    val gap = 1000000L // 1s gap
    // batch 1: two events 0.5s apart (one open session);
    // batch 2: an event 5s later — closes the first session
    Seq((1L, 1000000L), (1L, 1500000L)).toDF("user_id", "tsUs")
      .coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(300)
    Seq((1L, 6500000L)).toDF("user_id", "tsUs")
      .coalesce(1).write.mode("append").parquet(dir)

    val src = spark.readStream
      .schema("user_id LONG, tsUs LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .as[EventStream.SessionEvent]
    val q = EventStream.sessionize(src, gap, emitOpen = false)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val closed = spark.table("sess_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // exactly ONE closed session: the first two events merged ACROSS the
    // batch boundary would be wrong — they are 0.5s apart in batch 1 and
    // close only when batch 2's event arrives 5s later
    assert(closed == Set((1L, 1000000L, 1500000L, 2L)))
  }

  test("ohlcBars: open/close pick the (ts, event_id)-first/last observation") {
    val s = spark
    import s.implicits._
    val h = 3600L * 1000000000L // 1h in ns (LongType ts branch)
    val df = Seq(
      // user 1, one bar: open ties at t=0 → event_id 1 wins; close at t=30m
      (1L, 0L, 1L, 5.0), (2L, 0L, 1L, 9.0), (3L, h / 2, 1L, 1.5),
      // user 1, next bar: single obs
      (4L, h + 1000L, 1L, 7.25),
      // null value dropped
      (5L, h / 4, 1L, Double.NaN)
    ).map { case (e, t, u, v) => (e, t, u, "click", if (v.isNaN) None else Some(v)) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStream.ohlcBars(df).orderBy("bar").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (0L, 5000L, 9000L, 1500L, 1500L, 3L),
      (1L, 7250L, 7250L, 7250L, 7250L, 1L)))
  }

  test("attributionJoin: stream equals batch across a micro-batch split") {
    val s = spark
    import s.implicits._
    // ts in ns (LongType branch of Tables.tsUs); purchase 100 opens a
    // 1h window; clicks at +30m (in), +59m59s (in), +1h (out, exclusive),
    // -1s (out, before); user 2 noise
    val h = 3600L * 1000000000L
    def row(id: Long, uid: Long, tpe: String, tsNs: Long) = (id, tsNs, uid, tpe)
    val batch1 = Seq(row(100, 1, "purchase", 10L * h),
      row(200, 1, "click", 10L * h - 1000000000L),
      row(201, 1, "click", 10L * h + h / 2))
    val batch2 = Seq(row(202, 1, "click", 10L * h + h - 1000000000L),
      row(203, 1, "click", 10L * h + h),
      row(300, 2, "click", 10L * h + h / 2),
      // late watermark driver so the stream closes state
      row(999, 9, "click", 20L * h))
    val all = (batch1 ++ batch2).toDF("event_id", "ts", "user_id", "event_type")

    val expected = Set((100L, 201L), (100L, 202L))
    val got = EventStream.attributionJoin(all, "purchase", "click")
      .select("open_id", "point_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)

    val dir = Files.createTempDirectory("graft-attr").toString
    batch1.toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(300)
    batch2.toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val q = EventStream.attributionJoin(src, "purchase", "click")
      .writeStream.format("memory").queryName("attr_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("attr_test")
      .select("open_id", "point_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == expected)
  }

  test("stepFunnel counts ordered completions, not mere event presence") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // user 1 completes A -> B -> C in order
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      // user 2 has B BEFORE A and no B after: stops at step 1
      (2L, "B", 5L), (2L, "A", 10L), (2L, "C", 20L),
      // user 3 completes A -> B, C happens BEFORE B: stops at step 2
      (3L, "A", 1L), (3L, "C", 2L), (3L, "B", 3L),
      // user 4 never does A
      (4L, "B", 1L), (4L, "C", 2L)).toDF("user_id", "event_type", "ts")
    val out = EventStream.stepFunnel(df, col("user_id"), col("event_type"),
        col("ts"), Seq("A", "B", "C"))
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((4L, 3L, 2L, 1L)))
  }

  test("outlierCounts flags |x - mean| > 2 sigma in exact squared-form arithmetic") {
    val s = spark
    import s.implicits._
    // user 1: nine 10.0s and one 100.0 — the spike is >2σ out;
    // user 2: constant values → σ=0, lhs=0, 0 > 0 false → no outliers;
    // user 3: single event → never an outlier
    val df = ((1 to 9).map(_ => (1L, 10.0)) ++ Seq((1L, 100.0)) ++
      Seq((2L, 5.0), (2L, 5.0), (3L, 42.0))).toDF("user_id", "value")
    val out = EventStream.outlierCounts(df, col("user_id"), col("value"))
      .orderBy("user_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L, 1L), (2L, 2L, 0L), (3L, 1L, 0L)))
  }

  test("outlierCounts: NULL values are excluded from n as well as the moments") {
    val s = spark
    import s.implicits._
    // user 1 has one NULL event among three valued ones; user 4 is
    // all-NULL. Counting NULL rows in n (the old count(*)) while the
    // sums skipped them would inflate n in the squared criterion.
    val df = Seq((1L, Some(10.0)), (1L, Some(10.0)), (1L, None),
        (1L, Some(100.0)), (4L, Option.empty[Double]))
      .toDF("user_id", "value")
    val out = EventStream.outlierCounts(df, col("user_id"), col("value"))
      .orderBy("user_id").as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(1L), "all-NULL keys carry no signal → absent")
    assert(out.head._2 == 3L, s"n must count valued events only: ${out.head}")
  }

  test("outlierCounts: out-of-domain values fail loudly instead of NULL-skipping") {
    val s = spark
    import s.implicits._
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    val wide = Seq((1L, 2.0e6), (1L, 1.0)).toDF("user_id", "value")
    val e = intercept[Exception] {
      EventStream.outlierCounts(wide, col("user_id"), col("value")).collect()
    }
    assert(msgs(e).contains("outlierCounts domain"), msgs(e))
  }
}
