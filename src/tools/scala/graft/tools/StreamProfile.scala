package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import java.util.concurrent.ConcurrentHashMap

private final case class JobSpan(id: Int, start: Long, end: Long, site: String)

/** Where does a fixture's wall-clock actually go? Runs one declared
  * query and splits its wall time into JOB-BUSY (the union of Spark job
  * intervals — executor work plus per-job scheduling) and GAP (no job
  * running: driver-side logic, streaming trigger waits, checkpoint
  * fsync, stream start/stop latency). The split is what tells a
  * streaming-fixture optimization where to aim: a gap-dominated query
  * needs fewer/faster lifecycle cycles, a busy-dominated one needs a
  * cheaper plan. Builder-side tooling — not part of the driver contract.
  *
  * With a `floorsOut` path the tool becomes the WARM-FLOOR measurer
  * behind the streaming bench gate: each query runs `repeats` times in
  * this one JVM (so JIT/codegen reach steady state — a fresh JVM needs
  * 3–4 executions), and the MIN wall (with its busy/gap split) is the
  * query's warm floor, written as JSON for tools/stream_gate.py to gate
  * `streaming_total` against (`sum(mins) <= 1.25 × sum(floors)`). The
  * floor is a property of the FIXTURE (state round-trips, trigger
  * lifecycle, sink commits at steady state), so it re-measures only
  * when a fixture changes — the gate artifact records it explicitly.
  *
  * Usage: runMain graft.tools.StreamProfile
  *          <query>[,<query>...]|streaming [sfDir] [floorsOut.json] [repeats]
  * (`streaming` expands to every Bench.streamingQueries entry.)
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption match {
      case Some("streaming") => graft.Bench.streamingQueries.toSeq.sorted
      case Some(s) => s.split(",").toSeq
      case None => Seq("q_st2_catchup")
    }
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val floorsOut = args.lift(2)
    val repeats = args.lift(3).map(_.toInt).getOrElse(4)
    val spark = GraftSession.create("local[32]")
    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    val intervals = java.util.Collections.synchronizedList(
      new java.util.ArrayList[JobSpan]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site)): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null)
          intervals.add(JobSpan(je.jobId, s._1, System.nanoTime(), s._2)): Unit
      }
    })
    // one profiled execution; returns (wall, busy, gap)
    def profile(name: String, verbose: Boolean): (Double, Double, Double) = {
      intervals.clear()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat to drain
      Thread.sleep(300)
      val ivs = {
        import scala.jdk.CollectionConverters._
        intervals.asScala.toSeq.sortBy(_.start)
      }
      val busy = { // union of job intervals clipped to the query window
        var cover = 0L; var hi = Long.MinValue
        for (j <- ivs) {
          if (j.start > hi) { cover += j.end - j.start; hi = j.end }
          else if (j.end > hi) { cover += j.end - hi; hi = j.end }
        }
        cover / 1e9
      }
      val jobSum = ivs.map(j => j.end - j.start).sum / 1e9
      println(f"$name%-22s rows=$n%-7d wall=$wall%6.2f s  " +
        f"jobs=${ivs.size}%3d  busy=$busy%6.2f s  gap=${wall - busy}%6.2f s  " +
        f"jobsum=$jobSum%6.2f s")
      if (verbose) {
        for (j <- ivs.sortBy(j => j.start - j.end).take(8))
          println(f"    job ${j.id}%4d  ${(j.end - j.start) / 1e9}%6.2f s  " +
            f"@+${(j.start - t0) / 1e9}%6.2f  ${j.site}")
        // largest no-job windows: (after job X) →gap→ (before job Y)
        val gaps = ivs.sliding(2).collect {
          case Seq(a, b) if b.start > a.end => (b.start - a.end, a, b)
        }.toSeq.sortBy(-_._1).take(6)
        for ((g, a, b) <- gaps)
          println(f"    gap ${g / 1e9}%6.2f s  @+${(a.end - t0) / 1e9}%6.2f  " +
            f"after[${a.site}] before[${b.site}]")
      }
      (wall, busy, wall - busy)
    }

    floorsOut match {
      case None => for (name <- names) profile(name, verbose = true)
      case Some(out) =>
        val floors = names.map { name =>
          val runs = (0 until repeats).map(_ => profile(name, verbose = false))
          val (w, b, g) = runs.minBy(_._1)
          println(f"$name%-22s floor=$w%6.2f s (busy=$b%5.2f gap=$g%5.2f) " +
            s"over $repeats warm runs")
          name -> ((w, b, g, runs.map(_._1)))
        }
        val body = floors.map { case (n, (w, b, g, runs)) =>
          s""""$n":{"floor_sec":$w,"busy_sec":$b,"gap_sec":$g,""" +
            s""""runs":[${runs.mkString(",")}]}"""
        }.mkString(",")
        java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
          s"""{"queries":{$body},"repeats":$repeats,"sf":"$dir"}""" + "\n")
        println(s"wrote $out")
    }
    spark.stop()
  }
}
