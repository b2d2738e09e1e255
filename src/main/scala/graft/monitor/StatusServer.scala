package graft.monitor

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.streaming.ApplyJob

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicReference

/** O5's second half — the HTTP status surface (web_server.go:59-88).
  *
  * The reference serves a progress chart at `:3629`: task status counts,
  * percent complete, and the `elapsed × (1−p)/p` ETA line. Graft serves
  * the same numbers as JSON from the JDK's built-in [[HttpServer]] (no
  * new dependency): `GET /status` returns the live
  * [[Progress.Snapshot]] plus, when a live tail is running, the stream
  * lag (ST3). `GET /` returns a minimal HTML shell that polls
  * `/status` — the chart without the reference's inlined template.
  *
  * The server holds only ATOMIC REFERENCES published by the lifecycle
  * ([[attach]]/[[attachStream]]) — it never touches Spark itself, so a
  * request can't perturb a running job and the endpoint keeps answering
  * after the copy finishes (final snapshot, as the reference's chart
  * does once percent == 1).
  */
final class StatusServer private (server: HttpServer, val port: Int) {

  private val progress = new AtomicReference[Option[Progress.ProgressListener]](None)
  private val handle = new AtomicReference[Option[ApplyJob.Handle]](None)
  private val phase = new AtomicReference[String]("starting")

  /** Publish the copy-phase listener feeding /status. */
  def attach(listener: Progress.ProgressListener): Unit = progress.set(Some(listener))

  /** Publish the live-tail handle feeding the lag metric. */
  def attachStream(h: ApplyJob.Handle): Unit = handle.set(Some(h))

  /** Record the lifecycle phase string (the Workspace status line). */
  def setPhase(p: String): Unit = phase.set(p)

  private def json: String = {
    val snap = progress.get().map(_.snapshot)
    val base = snap match {
      case Some(s) =>
        val eta = s.etaMs.map(_.toString).getOrElse("null")
        f""""total":${s.total},"completed":${s.completed},"failed":${s.failed},""" +
          f""""percent":${s.percent}%.4f,"elapsedMs":${s.elapsedMs},"etaMs":$eta"""
      case None => """"total":0,"completed":0,"failed":0,"percent":0.0"""
    }
    val lag = handle.get() match {
      case Some(h) =>
        f""","lagSeconds":${h.lagSeconds}%.1f,"applied":${h.counts.total}"""
      case None => ""
    }
    s"""{"ok":1,"phase":"${phase.get()}",$base$lag}"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String, mime: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", mime)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  def stop(): Unit = server.stop(0)
}

object StatusServer {

  /** The chart page served at `/` — the reference's inlined progress
    * chart (web_server.go:59-88), template-free: the JSON the server
    * already publishes is rendered client-side as an inline SVG stacked
    * bar (completed / failed / remaining tasks) with the percent and
    * `elapsed × (1−p)/p` ETA line, re-polled every second. */
  private val Page =
    """<!DOCTYPE html><html><head><title>graft</title></head><body>
      |<h3>graft migration status</h3>
      |<svg id="bar" width="480" height="28" style="border:1px solid #888">
      |<rect id="done" x="0" y="0" height="28" width="0" fill="#2a4"/>
      |<rect id="fail" x="0" y="0" height="28" width="0" fill="#c33"/>
      |</svg>
      |<div id="line"></div><pre id="s">loading...</pre>
      |<script>setInterval(async()=>{const r=await fetch('/status');const j=await r.json();
      |const W=480,t=Math.max(j.total||0,1),dw=W*(j.completed||0)/t,fw=W*(j.failed||0)/t;
      |document.getElementById('done').setAttribute('width',dw);
      |const f=document.getElementById('fail');f.setAttribute('x',dw);f.setAttribute('width',fw);
      |const eta=j.etaMs==null?'n/a':(j.etaMs/1000).toFixed(1)+'s';
      |document.getElementById('line').textContent=
      |  (100*(j.percent||0)).toFixed(1)+'% of '+(j.total||0)+' tasks, eta '+eta;
      |document.getElementById('s').textContent=JSON.stringify(j,null,2);},1000);
      |</script></body></html>""".stripMargin

  /** Bind and start on `port` (0 = ephemeral; read the actual port from
    * the returned server — tests use this to avoid collisions). */
  def start(port: Int): StatusServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    val bound = new StatusServer(server, server.getAddress.getPort)
    server.createContext("/status", (ex: HttpExchange) =>
      bound.respond(ex, 200, bound.json, "application/json"))
    server.createContext("/", (ex: HttpExchange) =>
      bound.respond(ex, 200, Page, "text/html"))
    server.setExecutor(null) // default single-thread executor: status-sized load
    server.start()
    bound
  }
}
