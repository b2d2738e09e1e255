package graft.streaming

import graft.SparkSpec
import graft.config.MigratorConfig
import graft.sim.Simgen
import graft.sources.ParquetCatalog
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

class ApplyJobSpec extends SparkSpec {
  private val cfg = MigratorConfig(command = "data", source = "s", target = "t")
  private val ns = "app.gen"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Driver-side reference fold: the same skip/compile/fold logic applied
    * sequentially — the unit-tested ground truth the distributed,
    * checkpointed pipeline must reproduce exactly. */
  private def expectedState(oplogs: Seq[Oplog]): Map[String, String] = {
    val ops = oplogs.filterNot(Oplog.skip(_, cfg)).flatMap(Oplog.compile(_, cfg))
      .filter(_.ns == ns)
    ops.groupBy(_.id).flatMap { case (id, keyOps) =>
      JsonDocOps.fold(None, keyOps).map(id -> _)
    }
  }

  private def sinkState(sink: ParquetCatalog): Map[String, String] =
    sink.read(ns).collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("catch-up apply reproduces the sequential reference fold") {
    import spark.implicits._
    val logDir = tmp("graft-log")
    val ckpt = tmp("graft-ckpt")
    val sink = new ParquetCatalog(spark, tmp("graft-sink"), "app")
    Simgen.changeLog(spark, 30, ns).write.mode("overwrite").parquet(logDir)

    val counts = ApplyJob.catchUp(spark, logDir, sink, cfg, ckpt)
    val expected = expectedState(spark.read.parquet(logDir).as[Oplog].collect().toSeq)

    assert(sinkState(sink) == expected)
    // single micro-batch: keys deleted within the batch net out (never
    // materialize), so `inserted` equals exactly the surviving docs
    assert(counts.inserted == expected.size && expected.nonEmpty)
    // re-draining an unchanged backlog is a no-op
    val again = ApplyJob.catchUp(spark, logDir, sink, cfg, ckpt)
    assert(again.total == 0)
    assert(sinkState(sink) == expected)
  }

  test("kill mid-run + restart converges idempotently (ST4 restart-safety)") {
    import spark.implicits._
    val logDir = tmp("graft-log2")
    val ckpt = tmp("graft-ckpt2")
    val sink = new ParquetCatalog(spark, tmp("graft-sink2"), "app")
    // a change-log ARRIVES in time order (the reference replays spool
    // files in filename=time order, oplog_streamer.go:227-229): write one
    // file per ts-phase, modification-time-spaced, so maxFilesPerTrigger=1
    // yields several ts-ordered micro-batches
    val log = Simgen.changeLog(spark, 40, ns).persist()
    import org.apache.spark.sql.functions.{col, shiftright}
    for (p <- 0 to 5) {
      val slice = log.filter(
        ((shiftright(col("ts"), 32) - 1700000000L) / 40).cast("int") === p)
      if (!slice.isEmpty) {
        slice.coalesce(1).write.mode("append").parquet(logDir)
        Thread.sleep(200)
      }
    }
    log.unpersist()

    // phase 1: live-style stream, killed after at least one committed batch
    val h = ApplyJob.stream(spark, logDir, sink, cfg, ckpt,
      Trigger.ProcessingTime(0), maxFilesPerTrigger = 1)
    val deadline = System.currentTimeMillis() + 120000
    while (h.query.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    h.stop()
    assert(h.query.recentProgress.count(_.numInputRows > 0) >= 2, "no batch committed before kill")

    // phase 2: restart from the same checkpoint, drain the rest
    ApplyJob.catchUp(spark, logDir, sink, cfg, ckpt, maxFilesPerTrigger = 1)
    val expected = expectedState(spark.read.parquet(logDir).as[Oplog].collect().toSeq)
    assert(sinkState(sink) == expected)

    // lag metric was recorded (ST3)
    assert(!h.lagSeconds.isNaN)
  }

  test("live tail chases a rate-paced feed to convergence (ST3/G1-G4)") {
    import spark.implicits._
    val logDir = tmp("graft-log4")
    val ckpt = tmp("graft-ckpt4")
    val sink = new ParquetCatalog(spark, tmp("graft-sink4"), "app")

    // start the tail FIRST (ProcessingTime), then feed batches under it
    val feedDir = logDir + "/feed"
    new java.io.File(feedDir).mkdirs() // source dir must exist at start
    val h = ApplyJob.stream(spark, feedDir, sink, cfg, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(200))
    try {
      // G4: the feed ALSO runs the interval read load (find + aggregate)
      // against the sink the tail is concurrently rewriting
      Simgen.liveFeed(spark, feedDir, ns, batches = 3,
        docsPerBatch = 10, pauseMs = 500, readFrom = Some(sink))
      // generous: convergence takes ~5 s alone, but this suite shares a
      // loaded box with the driver's bench/verify runs
      val deadline = System.currentTimeMillis() + 180000
      val expected = expectedState(
        spark.read.parquet(feedDir).as[Oplog].collect().toSeq)
      var converged = false
      var lastErr: Option[Throwable] = None
      while (!converged && System.currentTimeMillis() < deadline) {
        Thread.sleep(300)
        // reads can transiently fail mid table-swap; retry until deadline
        val attempt = scala.util.Try(
          sink.dataExists(ns) && sinkState(sink) == expected)
        lastErr = attempt.failed.toOption
        converged = attempt.getOrElse(false)
      }
      assert(converged, "live tail did not converge to the fed state: " +
        s"queryException=${h.query.exception.map(_.getMessage)}, " +
        s"lastProgress=${Option(h.query.lastProgress)
          .map(p => s"batch=${p.batchId} rows=${p.numInputRows}")}, " +
        s"applied=${h.counts}, lastReadError=${lastErr.map(_.toString)}, " +
        s"sinkRows=${scala.util.Try(sink.read(ns).count()).getOrElse(-1L)}, " +
        s"expectedKeys=${expected.size}")
      // with the sink converged, the read load sees data: a fed interval
      // must run a non-trivial find+aggregate while the tail is still
      // applying. A single interval's reads can race the tail's atomic
      // table swap (Try → zero counts, by design — Simgen.liveFeed doc),
      // so retry intervals until one lands, like the real loop does.
      var statsOk = false
      var attempt = 0
      while (!statsOk && System.currentTimeMillis() < deadline) {
        val stats = Simgen.liveFeed(spark, feedDir, ns, batches = 1,
          docsPerBatch = 10, t0 = 1800000000L + attempt * 1000L,
          readFrom = Some(sink))
        statsOk = stats.findsMatched > 0 && stats.aggregateGroups > 0
        attempt += 1
      }
      assert(statsOk, "no read interval saw live rows before the deadline")
    } finally h.stop()
  }

  test("namespace rename (T6) applies through the wired pipeline") {
    import spark.implicits._
    val logDir = tmp("graft-log5")
    val sink = new ParquetCatalog(spark, tmp("graft-sink5"), "app")
    val renameCfg = MigratorConfig(command = "data", source = "s", target = "t",
      includes = Seq(graft.config.IncludeSpec(ns, to = "app.renamed")))
    Simgen.changeLog(spark, 15, ns).write.mode("overwrite").parquet(logDir)
    val counts = ApplyJob.applyBatch(
      spark.read.parquet(logDir).as[Oplog], sink, renameCfg).counts
    assert(counts.keySet == Set("app.renamed"))
    assert(sink.dataExists("app.renamed") && !sink.dataExists(ns))
    assert(sink.read("app.renamed").count() == counts("app.renamed").inserted)
  }

  test("kill + restart converges on a BUCKETED sink (incremental merge under streaming)") {
    import spark.implicits._
    val logDir = tmp("graft-logb")
    val ckpt = tmp("graft-ckptb")
    val sink = new ParquetCatalog(spark, tmp("graft-sinkb"), "app", buckets = 16)
    val log = Simgen.changeLog(spark, 40, ns).persist()
    import org.apache.spark.sql.functions.{col, shiftright}
    for (p <- 0 to 5) {
      val slice = log.filter(
        ((shiftright(col("ts"), 32) - 1700000000L) / 40).cast("int") === p)
      if (!slice.isEmpty) {
        slice.coalesce(1).write.mode("append").parquet(logDir)
        Thread.sleep(200)
      }
    }
    log.unpersist()
    val h = ApplyJob.stream(spark, logDir, sink, cfg, ckpt,
      Trigger.ProcessingTime(0), maxFilesPerTrigger = 1)
    val deadline = System.currentTimeMillis() + 120000
    while (h.query.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    h.stop()
    assert(h.query.recentProgress.count(_.numInputRows > 0) >= 2, "no batch committed before kill")
    ApplyJob.catchUp(spark, logDir, sink, cfg, ckpt, maxFilesPerTrigger = 1)
    val expected = expectedState(spark.read.parquet(logDir).as[Oplog].collect().toSeq)
    assert(sinkState(sink) == expected)
  }

  test("replayed micro-batch is a no-op — exactly-once marker guard") {
    import spark.implicits._
    val logDir = tmp("graft-log3")
    val sink = new ParquetCatalog(spark, tmp("graft-sink3"), "app")
    // the change-log contains $inc ops: a double-apply WOULD corrupt state
    Simgen.changeLog(spark, 20, ns).write.mode("overwrite").parquet(logDir)
    val batch = spark.read.parquet(logDir).as[Oplog]

    val first = ApplyJob.applyBatch(batch, sink, cfg, batchId = 0)
    val state1 = sinkState(sink)
    assert(first.counts(ns).total > 0)
    // lag numerator comes out of the SAME pass as the counts: the newest
    // applied ts must be the change-log's max applied entry
    assert(first.maxAppliedTs.contains(
      batch.filter(org.apache.spark.sql.functions.col("op") =!= "n")
        .filter(!org.apache.spark.sql.functions.col("ns").startsWith("local."))
        .agg(org.apache.spark.sql.functions.max("ts")).head().getLong(0)))

    val replay = ApplyJob.applyBatch(batch, sink, cfg, batchId = 0)
    assert(replay.counts(ns).total == 0)
    assert(sinkState(sink) == state1)

    // a LATER batch still applies — updates only, so the $inc genuinely
    // re-applies and the state visibly moves (this is exactly the
    // corruption the marker guard prevents on REPLAY)
    val updatesOnly = batch.filter(org.apache.spark.sql.functions.col("op") === "u")
    val later = ApplyJob.applyBatch(updatesOnly, sink, cfg, batchId = 1)
    assert(later.counts(ns).total > 0)
    assert(sinkState(sink) != state1)
  }
}
