package graft.monitor

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicLong

/** O5 — progress + ETA monitoring (Wait, data_copier.go:142-176; web
  * chart feed web_server.go:59-88).
  *
  * The reference polls its MongoDB task queue for status counts every
  * 10s/1min and logs `completed/total` with an ETA of
  * `elapsed × (1−p)/p`. Spark's scheduler already KNOWS the task
  * counts, so the poll loop becomes a [[SparkListener]]: stage
  * submissions contribute task totals, task completions tick the
  * counter, and a snapshot is computable at any moment without touching
  * the cluster. (The straggler "maid" that the same loop runs,
  * ResetLongRunningTasks, is Spark speculative-execution/task-retry —
  * O4, nothing to build.)
  *
  * The ETA formula is the reference's, computed on milliseconds (the
  * reference sums hours+minutes+seconds+millis into one scalar —
  * data_copier.go:157-158 — which we do not reproduce; the intent,
  * linear extrapolation of the remaining fraction, is the same).
  *
  * Streaming lag (ST3) is the sibling metric on
  * [[graft.streaming.ApplyJob.Handle.lagSeconds]].
  */
object Progress {

  final case class Snapshot(total: Long, completed: Long, failed: Long, elapsedMs: Long) {
    def percent: Double = if (total == 0) 0.0 else completed.toDouble / total
    /** elapsed × (1−p)/p — None until any task completed. */
    def etaMs: Option[Long] =
      if (completed == 0 || total == 0) None
      else Some(math.round(elapsedMs * (1 - percent) / percent))
    /** The reference's Wait log line shape (data_copier.go:164-166). */
    def statusLine: String = {
      val eta = etaMs.map(ms => f", ${ms / 1000}s (${(1 - percent) * 100}%.1f%%) to go").getOrElse("")
      s"completed:$completed, pending:${total - completed - failed}, failed:$failed$eta"
    }
  }

  /** Scheduler-fed progress counters. Attach with
    * `spark.sparkContext.addSparkListener`, or use [[tracked]]. */
  final class ProgressListener(clock: () => Long = () => System.currentTimeMillis())
      extends SparkListener {
    private val start = clock()
    private val total = new AtomicLong
    private val completed = new AtomicLong
    private val failed = new AtomicLong

    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
      total.addAndGet(s.stageInfo.numTasks.toLong); ()
    }

    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      if (t.reason == org.apache.spark.Success) completed.incrementAndGet()
      else failed.incrementAndGet()
      ()
    }

    def snapshot: Snapshot =
      Snapshot(total.get(), completed.get(), failed.get(), clock() - start)
  }

  /** Run `body` with a listener attached; returns (result, snapshot).
    * The listener bus is asynchronous, so the final snapshot polls
    * briefly until the completed count stabilizes. `publish` hands the
    * live listener to an observer (the [[StatusServer]]) before the body
    * runs, so an HTTP poll mid-copy sees counts advancing. */
  def tracked[T](spark: SparkSession,
      publish: ProgressListener => Unit = _ => ())(body: => T): (T, Snapshot) = {
    val listener = new ProgressListener()
    spark.sparkContext.addSparkListener(listener)
    publish(listener)
    try {
      val result = body
      val deadline = System.currentTimeMillis() + 5000
      var snap = listener.snapshot
      while (snap.completed + snap.failed < snap.total &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
        snap = listener.snapshot
      }
      (result, snap)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
