package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream analytics over the `events` table shape (event_id, ts
  * [ns-long or µs-timestamp by fixture vintage — see Tables.tsUs],
  * user_id, event_type, value, props) — the
  * §7 streaming-analytics extensions beyond the reference's replication
  * surface (the reference has no event-time windows or stateful
  * aggregation at all, SURVEY §2.8 ST5).
  *
  * Both operators are written against a plain DataFrame/Dataset, so the
  * SAME code runs in batch (the oracle path: `q_w1_tumbling`) and under
  * `readStream` (the streaming path, with watermarking — EventStreamSpec
  * proves stream==batch on the fixture).
  */
object EventStream {

  /** Event-time timestamp column at µs precision (the truncation DuckDB
    * applies to parquet timestamps of any vintage) — schema-branched via
    * [[graft.Tables.tsUs]] so ns-long and µs-timestamp fixtures both
    * work. */
  def eventTime(events: DataFrame, ts: String = "ts"): org.apache.spark.sql.Column =
    timestamp_micros(graft.Tables.tsUs(events, ts))

  /** Tumbling event-time window counts per event_type. In streaming,
    * `watermark` (e.g. "1 hour") bounds state and late data; in batch it
    * is ignored by Spark — identical results, one code path. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("__et", eventTime(events))
      .withWatermark("__et", watermark)
      .groupBy(window(col("__et"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window counts: same aggregate as [[tumblingCounts]] but
    * each event lands in `windowLen / slide` overlapping windows
    * (Spark's `window(col, len, slide)` generates them — a small
    * deterministic explode, no self-join). With `windowLen` an exact
    * multiple of `slide`, every event is in exactly len/slide windows,
    * which is what the oracle enumerates. */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("__et", eventTime(events))
      .withWatermark("__et", watermark)
      .groupBy(window(col("__et"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  final case class SessionEvent(user_id: Long, tsUs: Long)
  final case class SessionState(start: Long, last: Long, events: Long)
  final case class UserSession(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  /** Gap-based sessionization via flatMapGroupsWithState — the custom
    * per-key state machine surface (KeyValueGroupedDataset) the brief
    * calls for. A session closes when no event arrives within `gapUs`
    * of the last one.
    *
    * Cross-micro-batch semantics: the open session CARRIES in GroupState,
    * so closed sessions emit exactly once regardless of how events split
    * across batches. `emitOpen=true` (batch mode / final flush) also
    * emits the still-open session and clears state; streaming deployments
    * leave it false and let later events (or a configured timeout
    * policy) close sessions.
    *
    * State per user is O(1) (start/last/count), so state size scales
    * with |active users|, not |events| — the 100 TB-safe shape. */
  def sessionize(events: Dataset[SessionEvent], gapUs: Long,
      emitOpen: Boolean = true): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(_.tsUs)
          var cur = state.getOption
          val out = Vector.newBuilder[UserSession]
          for (e <- sorted) cur match {
            case None => cur = Some(SessionState(e.tsUs, e.tsUs, 1))
            case Some(s) if e.tsUs - s.last <= gapUs =>
              cur = Some(s.copy(last = e.tsUs, events = s.events + 1))
            case Some(s) =>
              out += UserSession(user, s.start, s.last, s.events)
              cur = Some(SessionState(e.tsUs, e.tsUs, 1))
          }
          if (emitOpen) {
            cur.foreach(s => out += UserSession(user, s.start, s.last, s.events))
            state.remove()
          } else cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** Per-key outlier counts — |x − mean| > k·σ per user, evaluated in
    * EXACT integer/decimal arithmetic: values quantize to milli-units,
    * and the criterion is compared in its squared, denominator-cleared
    * form `(x·n − s1)² > k²·(n·s2 − s1²)` — no mean, no variance, no
    * sqrt, so the flag is bit-identical in any engine (a double
    * mean/stddev pipeline diverges in the last ulp and flips boundary
    * events).
    *
    * Every product runs in DECIMAL with widths chosen so no
    * multiplication exceeds precision 38 on either engine, under the
    * documented domain |value| ≤ 10⁶ and per-key events ≤ 10⁶ (i.e.
    * milli-quantized |v| ≤ 10⁹, Σv ≤ 10¹⁵, Σv² ≤ 10²⁴) — a LONG
    * formulation silently wraps at ~5 000 events of value ~1 000
    * (n·Σv² > 2⁶³). The domain is ENFORCED: out-of-domain values or
    * key cardinalities `raise_error` instead of letting the narrowing
    * casts NULL under Spark's non-ANSI mode (where `sum` would then
    * silently skip rows while DuckDB errors — divergent, partly silent
    * failure modes). Widen the decimals AND the guards for wider data.
    * NULL values carry no signal and are excluded entirely — from `n`
    * as well as the moments (a `count(*)` would inflate `n` in the
    * squared criterion relative to the null-skipping sums).
    *
    * Plan shape: one map-side-combined per-key moment aggregate
    * (n, Σv, Σv²) joined back on the key — no window, no sort; the
    * join is key-partitioned on both sides. The monitoring/fraud shape
    * over the change-feed `events` table. */
  def outlierCounts(events: DataFrame, userCol: Column, value: Column,
      k: Int = 2): DataFrame = {
    require(k > 0 && k <= 9, "k in [1, 9]")
    val e = events.filter(value.isNotNull)
      .select(userCol.as("user_id"),
        floor(value * 1000).cast("long").as("__vr"))
      .withColumn("__v", when(abs(col("__vr")) <= lit(1000000000L), col("__vr"))
        .otherwise(raise_error(concat(
          lit("outlierCounts domain: |value| > 1e6 (milli-quantized "),
          col("__vr").cast("string"), lit(")")))))
      .drop("__vr")
    val stats = e.groupBy("user_id").agg(
      count(lit(1)).as("__nr"),
      sum(col("__v").cast("decimal(16,0)")).cast("decimal(16,0)").as("__s1"),
      sum(col("__v").cast("decimal(10,0)") * col("__v").cast("decimal(10,0)"))
        .cast("decimal(25,0)").as("__s2"))
      .withColumn("n", when(col("__nr") <= lit(1000000L), col("__nr"))
        .otherwise(raise_error(concat(
          lit("outlierCounts domain: > 1e6 events for one key ("),
          col("__nr").cast("string"), lit(")")))))
      .drop("__nr")
    val nd = col("n").cast("decimal(7,0)")
    // widths: vd(10)·nd(7) → 18; −s1(16) → 19, narrowed to 18; lhs² → 37;
    // s1² → 33; nd·s2(25) → 33; rhs diff → 34; k²(3)·rhs → 38 — every
    // product ≤ precision 38 on both engines
    val lhs = (col("__v").cast("decimal(10,0)") * nd - col("__s1"))
      .cast("decimal(18,0)")
    val rhs = (nd * col("__s2") - col("__s1") * col("__s1"))
      .cast("decimal(34,0)")
    e.join(stats, Seq("user_id"))
      .withColumn("__out",
        ((lhs * lhs) > lit(k * k).cast("decimal(3,0)") * rhs).cast("long"))
      .groupBy("user_id")
      .agg(max(col("n")).as("n_events"), sum(col("__out")).as("n_outliers"))
  }

  /** OHLC time bars (the financial/monitoring downsampling shape): per
    * (key, bar) the opening, high, low, and closing value plus count.
    *
    * Open/close use the algebraic `min(struct)`/`max(struct)` trick
    * (the Lines.lineDedup discipline): the struct leads with
    * (time, tiebreak), so its min IS the first observation — map-side
    * combined, no per-key sort or window, hot keys safe. Values are
    * milli-quantized to integers BEFORE aggregation so every output is
    * engine-exact (`q_ohlc`); null values carry no signal and are
    * dropped. One hash aggregate — the same code path runs under
    * `readStream` with a watermark on the bar time. */
  def ohlcBars(events: DataFrame, barUs: Long = 3600000000L): DataFrame = {
    require(barUs > 0, "barUs must be positive")
    val ev = events.filter(col("value").isNotNull)
      .select(col("user_id"), graft.Tables.tsUs(events).as("ts_us"),
        col("event_id"), floor(col("value") * 1000).cast("long").as("v_milli"))
      // floor, not truncate: pre-1970 µs must bucket like DuckDB `//`
      .select(col("user_id"), graft.Tables.floorDiv("ts_us", barUs).as("bar"),
        col("ts_us"), col("event_id"), col("v_milli"))
    val obs = struct(col("ts_us"), col("event_id"), col("v_milli"))
    ev.groupBy("user_id", "bar")
      .agg(min(obs).getField("v_milli").as("open_milli"),
        max(col("v_milli")).as("high_milli"),
        min(col("v_milli")).as("low_milli"),
        max(obs).getField("v_milli").as("close_milli"),
        count(lit(1)).as("n"))
  }

  /** Stream-stream interval join (attribution): every `pointType` event
    * joins each `openType` event of the same user that opened within
    * the preceding `horizon` — the streaming twin of the batch
    * `RangeJoin`-backed attribution query (`q_range_join`).
    *
    * The SAME code runs in batch and under `readStream`. In streaming,
    * BOTH sides carry a watermark and the join condition bounds the
    * event-time gap, which is exactly what Spark's stream-stream join
    * needs to evict state: an open event leaves the join state once the
    * point-side watermark passes `open + horizon`, so state is bounded
    * by the event rate × (watermark + horizon), not by the stream's
    * history. Without the range condition the state would grow without
    * bound — the condition is load-bearing, not an optimization.
    * EventStreamSpec pins stream == batch across a micro-batch split
    * that separates an open from its points. */
  def attributionJoin(events: DataFrame, openType: String, pointType: String,
      horizon: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val et = eventTime(events)
    val opens = events.filter(col("event_type") === openType)
      .select(col("event_id").as("open_id"), col("user_id"),
        et.as("open_et"))
      .withWatermark("open_et", watermark)
    val points = events.filter(col("event_type") === pointType)
      .select(col("event_id").as("point_id"), col("user_id").as("__puid"),
        et.as("point_et"))
      .withWatermark("point_et", watermark)
    opens.join(points,
        col("user_id") === col("__puid") &&
        col("point_et") >= col("open_et") &&
        col("point_et") < col("open_et") + expr(s"INTERVAL $horizon"))
      .select(col("open_id"), col("point_id"), col("user_id"),
        unix_micros(col("open_et")).as("open_us"),
        unix_micros(col("point_et")).as("point_us"))
  }

  /** Behavioral step funnel: how many users completed step 1, then
    * step 2 AFTER step 1, then step 3 AFTER step 2 (first qualifying
    * occurrence each) — the product-analytics counterpart of the
    * curation funnel.
    *
    * Plan shape: one conditional-aggregation pass per step (map-side
    * combined, keyed on the user) with a key join between steps —
    * never a per-user event sort/window, so a bot user with 10⁸ events
    * costs its aggregate rows only. Earlier-step timestamps ride along
    * each join, so step k's filter `ts > t(k-1)` is a narrow
    * predicate. Output: one row — n_users plus a completion count per
    * step. */
  def stepFunnel(events: DataFrame, userCol: Column, typeCol: Column,
      tsCol: Column, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one step")
    val e = events.select(userCol.as("user_id"), typeCol.as("__t"),
      tsCol.as("__ts"))
    // per-step frames: (user, first qualifying ts) — step k+1 needs
    // only step k's timestamp, so each frame carries one column
    val frames = steps.tail.scanLeft(
      e.filter(col("__t") === steps.head)
        .groupBy("user_id").agg(min(col("__ts")).as("__tprev"))) {
      (prev, step) =>
        e.filter(col("__t") === step)
          .join(prev, Seq("user_id"))
          .filter(col("__ts") > col("__tprev"))
          .groupBy("user_id").agg(min(col("__ts")).as("__tprev"))
    }
    val counts = frames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as(s"n_step${i + 1}"))
    }
    counts.foldLeft(
        e.select(countDistinct(col("user_id")).as("n_users")))(
      (acc, c) => acc.crossJoin(c))
  }

  /** Batch-shape sessionization with identical semantics, expressed as a
    * window gap-and-sum plan (used as the oracle cross-check for
    * [[sessionize]]). */
  def sessionizeBatch(events: DataFrame, gapUs: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us")
    events
      .select(col("user_id"), graft.Tables.tsUs(events).as("ts_us"))
      .withColumn("__prev", lag("ts_us", 1).over(w))
      .withColumn("__new", (col("__prev").isNull ||
        col("ts_us") - col("__prev") > gapUs).cast("int"))
      .withColumn("__sid", sum("__new").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "__sid")
      .agg(min("ts_us").as("session_start_us"), max("ts_us").as("session_end_us"),
        count(lit(1)).as("n_events"))
      .drop("__sid")
  }
}
