package graft.monitor

import graft.SparkSpec

import java.net.{HttpURLConnection, URL}
import scala.collection.mutable.ArrayBuffer

/** O5's HTTP surface: /status JSON must be fetchable MID-COPY with
  * counts advancing, and keep answering after the run. */
class StatusServerSpec extends SparkSpec {

  private def get(url: String): String = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(2000); conn.setReadTimeout(2000)
    try scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
    finally conn.disconnect()
  }

  test("serves advancing progress JSON during a tracked job, and the final snapshot after") {
    val server = StatusServer.start(0) // ephemeral port
    try {
      val base = s"http://localhost:${server.port}"
      server.setPhase("copy data")
      assert(get(s"$base/status").contains("\"phase\":\"copy data\""))

      // poll /status from a background thread while a multi-second,
      // many-task job runs under the tracked listener
      val samples = ArrayBuffer.empty[Long]
      @volatile var polling = true
      val poller = new Thread(() => {
        while (polling) {
          val body = get(s"$base/status")
          val m = """"completed":(\d+)""".r.findFirstMatchIn(body)
          m.foreach(g => samples.synchronized { samples += g.group(1).toLong })
          Thread.sleep(25)
        }
      })
      poller.start()
      val ((), snap) = Progress.tracked(spark, server.attach) {
        spark.sparkContext.parallelize(1 to 64, 64)
          .mapPartitions { it => Thread.sleep(40); it }
          .count()
        ()
      }
      polling = false
      poller.join(2000)

      val seen = samples.synchronized(samples.toVector)
      assert(seen.nonEmpty, "poller never reached /status")
      // counts advanced across fetches: some sample mid-run was strictly
      // between zero and the final count
      assert(seen.last > 0)
      assert(seen.exists(c => c > 0 && c < snap.completed),
        s"no mid-run sample strictly inside (0, ${snap.completed}): $seen")
      // the endpoint still answers after the job with the final numbers
      val after = get(s"$base/status")
      assert(after.contains(s""""completed":${snap.completed}"""))
      val page = get(s"$base/")
      assert(page.contains("graft migration status"))
      // the chart page: an inline SVG stacked bar fed by /status
      assert(page.contains("<svg") && page.contains("id=\"done\"")
        && page.contains("id=\"fail\"") && page.contains("etaMs"))
    } finally server.stop()
  }
}
