package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import scala.collection.mutable

/** Per-JOB wall-clock breakdown of a named query — the empirical half of
  * guide §1.1 without a UI (spark.ui.enabled=false in this harness):
  * every Spark job the query launches is listed with its wall, task
  * count, and the callsite, plus the UNACCOUNTED driver-side remainder
  * (planning, file listing, manifest I/O, commit) = query wall − union
  * of job intervals. A fixture whose time is mostly sub-100ms jobs is
  * paying scheduling/commit overhead, not compute; one with a single
  * fat job wants its plan looked at.
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <query> [query...] */
object JobProfile {
  private case class Job(id: Int, start: Long, var end: Long = -1L,
    var tasks: Int = 0, site: String = "", group: String = "")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg")
    val spark = GraftSession.create()
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val stageName = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')).getOrElse("")
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobs(js.jobId) = Job(js.jobId, System.nanoTime(),
            site = (if (desc.nonEmpty) desc + " | " else "") + stageName.take(90))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(je.jobId).foreach(_.end = System.nanoTime())
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          // attribute the stage's tasks to the job that owns it (last
          // started unfinished job is a good-enough local heuristic —
          // FAIR overlap is rare inside one query fixture)
          jobs.values.toSeq.filter(_.end < 0).lastOption
            .foreach(_.tasks += sc.stageInfo.numTasks)
        }
    }
    names.foreach { n =>
      // warm at the smallest fixture so codegen/JIT lands outside the
      // profiled run (the Bench warmup discipline)
      val warm = {
        val sib = java.nio.file.Paths.get(dir).resolveSibling("sf0.001")
        if (java.nio.file.Files.isDirectory(sib)) sib.toString else dir
      }
      try { SparkEntry.queries(n)(spark, warm).count(); () }
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      jobs.synchronized(jobs.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let trailing job-end events drain
      spark.sparkContext.removeSparkListener(listener)
      val snap = jobs.synchronized(jobs.values.toVector)
      println(f"==== $n wall=$wall%.2f s rows=$cnt jobs=${snap.size} ====")
      val done = snap.filter(_.end > 0).sortBy(_.start)
      // union of job intervals (FAIR overlap collapses instead of
      // double-counting)
      var busy = 0L
      var hi = Long.MinValue
      done.foreach { j =>
        val s = math.max(j.start, hi)
        if (j.end > s) busy += j.end - s
        hi = math.max(hi, j.end)
      }
      println(f"  busy=${busy / 1e9}%.2f s  driver/gap=${wall - busy / 1e9}%.2f s")
      done.foreach { j =>
        println(f"  job ${j.id}%4d  ${(j.end - j.start) / 1e9}%7.3f s  " +
          f"tasks=${j.tasks}%4d  @+${(j.start - t0) / 1e9}%7.3f  ${j.site}")
      }
    }
    spark.stop()
  }
}
