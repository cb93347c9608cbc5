package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap, Executors, TimeUnit}

/** S17: SSE transaction fan-out (api/server.go:95-129, api/handler.go:15-53):
  * an embedded `text/event-stream` endpoint that pushes each forwarded tx
  * as `data: <0x-rlp-hex>\n\n` to every connected subscriber, with the
  * reference's per-subscriber buffer of 100 and drop-if-full (the
  * `select`/`default` send) so one slow client never blocks the rest.
  *
  * The reference's API server is a single process; matching that, the
  * foreachBatch sink collects each (already allowlist-filtered, typically
  * tiny) micro-batch to the driver and publishes from there — this is a
  * live fan-out endpoint, not a data-scale operator.
  */
final class SseBroadcast(port: Int = 0) {

  private val subscribers =
    new ConcurrentHashMap[String, ArrayBlockingQueue[String]]()
  @volatile private var closed = false
  @volatile private var draining = false
  private val dropped = new java.util.concurrent.atomic.AtomicLong(0)

  /** Readiness flag (api/server.go drain semantics): false once a
    * graceful shutdown has begun — new subscribers are refused with 503
    * while in-flight events keep flowing to existing ones. */
  def ready: Boolean = !closed && !draining

  /** Rows the batch cap has kept off the driver since startup. */
  def droppedRows: Long = dropped.get()

  /** Per-subscriber buffered channel (api/handler.go:29: `make(chan string, 100)`). */
  private[graft] def register(uid: String): ArrayBlockingQueue[String] = {
    val q = new ArrayBlockingQueue[String](100)
    subscribers.put(uid, q)
    q
  }
  private[graft] def unregister(uid: String): Unit = subscribers.remove(uid)

  /** SendTx semantics (api/server.go:108-129): non-blocking offer to every
    * subscriber; a full buffer drops the event for that subscriber only. */
  def publish(txHex: String): Unit =
    subscribers.values.forEach { q => q.offer(txHex); () }

  def subscriberCount: Int = subscribers.size

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/api/txs/sse", new com.sun.net.httpserver.HttpHandler {
    def handle(x: com.sun.net.httpserver.HttpExchange): Unit = {
      if (!ready) { // drain/shutdown: refuse new subscribers
        x.sendResponseHeaders(503, -1)
        x.close()
        return
      }
      val uid = java.util.UUID.randomUUID().toString
      val q = register(uid)
      try {
        x.getResponseHeaders.set("Content-Type", "text/event-stream")
        x.getResponseHeaders.set("Cache-Control", "no-cache")
        x.getResponseHeaders.set("Access-Control-Allow-Origin", "*")
        x.sendResponseHeaders(200, 0) // chunked stream
        val out = x.getResponseBody
        var idlePolls = 0
        while (!closed) {
          val tx = q.poll(250, TimeUnit.MILLISECONDS)
          if (tx != null) {
            out.write(s"data: $tx\n\n".getBytes("UTF-8"))
            out.flush()
            idlePolls = 0
          } else {
            idlePolls += 1
            if (idlePolls >= 20) { // ~5 s idle: SSE ping keepalive — also
              out.write(": ping\n\n".getBytes("UTF-8")) // detects dead peers
              out.flush()
              idlePolls = 0
            }
          }
        }
      } catch {
        case _: Exception => // client went away — same as ctx.Done()
      } finally {
        unregister(uid)
        x.close()
      }
    }
  })
  // /livez + /readyz probes (reference api/server.go:51-58). Liveness is
  // unconditional 200 "ok"; readiness mirrors the subscriber-admission
  // gate — once a graceful shutdown begins, /readyz flips to 503 so a
  // load balancer stops routing new subscribers while in-flight events
  // keep draining (the same `ready` flag that 503s /api/txs/sse).
  server.createContext("/livez", new com.sun.net.httpserver.HttpHandler {
    def handle(x: com.sun.net.httpserver.HttpExchange): Unit = {
      try {
        val body = "ok".getBytes("UTF-8")
        x.sendResponseHeaders(200, body.length.toLong)
        x.getResponseBody.write(body)
      } finally x.close()
    }
  })
  server.createContext("/readyz", new com.sun.net.httpserver.HttpHandler {
    def handle(x: com.sun.net.httpserver.HttpExchange): Unit = {
      try {
        if (ready) {
          val body = "ok".getBytes("UTF-8")
          x.sendResponseHeaders(200, body.length.toLong)
          x.getResponseBody.write(body)
        } else x.sendResponseHeaders(503, -1)
      } finally x.close()
    }
  })

  private val handlerPool = Executors.newCachedThreadPool()
  server.setExecutor(handlerPool)
  server.start()

  def address: String =
    s"http://127.0.0.1:${server.getAddress.getPort}/api/txs/sse"

  def close(): Unit = {
    closed = true // handler loops exit on their next poll tick
    // stop with a 1 s grace, not 0: a handler that polled an event just
    // before `closed` flipped is between poll() and write/flush — an
    // immediate stop tears the socket down under that in-flight write and
    // the subscriber silently loses the final event
    server.stop(1)
    handlerPool.shutdown() // non-daemon workers must not outlive the endpoint
    subscribers.clear()
  }

  /** Graceful shutdown (api/server.go:84-93 + the readiness flip):
    * immediately stop admitting subscribers (503), keep the handler loops
    * delivering buffered in-flight events for up to `drainMs` (exiting
    * early once every subscriber buffer is drained), then close. */
  def shutdown(drainMs: Long = 2000): Unit = {
    draining = true
    val deadline = System.nanoTime() + drainMs * 1000000L
    def buffered: Boolean = {
      val it = subscribers.values.iterator()
      var any = false
      while (it.hasNext && !any) any = !it.next().isEmpty
      any
    }
    while (System.nanoTime() < deadline && buffered) Thread.sleep(20)
    close()
  }

  /** foreachBatch sink: allowlist filter, then publish each row's raw tx
    * hex to all current subscribers. `maxRowsPerBatch` bounds the driver
    * intake — forwarding is best-effort fan-out (subscriber buffers drop
    * on overflow anyway), so an anomalous flood is capped and counted
    * rather than funneled through the driver. */
  def sink(
      rawHexCol: String = "raw_tx_hex",
      allowedSources: Seq[String] = Nil,
      sourceCol: String = "source",
      maxRowsPerBatch: Int = 10000): (DataFrame, Long) => Unit = { (batch, _) =>
    val allowed =
      if (allowedSources.isEmpty) batch
      else batch.filter(col(sourceCol).isin(allowedSources: _*))
    if (subscriberCount > 0) { // api/server.go:113 early return
      val rows = allowed.select(col(rawHexCol)).na.drop()
        .limit(maxRowsPerBatch + 1).collect()
      if (rows.length > maxRowsPerBatch) {
        // only an overflowing batch pays for the exact count
        val total = allowed.count()
        dropped.addAndGet(total - maxRowsPerBatch)
      }
      rows.iterator.take(maxRowsPerBatch).foreach(r => publish(r.getString(0)))
    }
  }
}
