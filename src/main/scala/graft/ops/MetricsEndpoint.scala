package graft.ops

import graft.streaming.CollectorMetrics

/** The collector's Prometheus scrape endpoint (reference metrics/metrics.go
  * + the VictoriaMetrics `/metrics` handler the collector mounts): serves
  * [[CollectorMetrics.render]] — counter names and `{source="…"}` label
  * forms match the reference exactly — in the Prometheus text exposition
  * format on `GET /metrics`.
  *
  * Driver-side by design, like every Prometheus scrape target: the
  * counters are folded on the driver by [[graft.streaming
  * .GraftMetricsListener]] from per-micro-batch `observe()` aggregates,
  * so serving them is a driver-local map read — no executor traffic, no
  * extra queries, scrape cost independent of data volume.
  *
  * `host` is the bind address (loopback default for this offline
  * container; pass the scrape interface in a deployment). Note `address`
  * echoes the bind host — for a wildcard bind (`0.0.0.0`) it names the
  * listen socket, not a connectable URL.
  */
final class MetricsEndpoint(metrics: CollectorMetrics, port: Int = 0,
    host: String = "127.0.0.1") {

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress(host, port), 0)

  server.createContext("/metrics", new com.sun.net.httpserver.HttpHandler {
    def handle(x: com.sun.net.httpserver.HttpExchange): Unit = {
      try {
        if (x.getRequestMethod != "GET") {
          x.sendResponseHeaders(405, -1)
        } else {
          val body = {
            val r = metrics.render
            (if (r.isEmpty) r else r + "\n").getBytes("UTF-8")
          }
          x.getResponseHeaders.set(
            "Content-Type", "text/plain; version=0.0.4; charset=utf-8")
          x.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length.toLong)
          if (body.nonEmpty) x.getResponseBody.write(body)
        }
      } finally x.close()
    }
  })

  // /livez + /readyz probes (reference api/server.go:51-58: both answer
  // 200 "ok"). The scrape endpoint has no drain state, so liveness and
  // readiness coincide — but they stay separate routes because a
  // deployment's probes address them separately.
  for (route <- Seq("/livez", "/readyz"))
    server.createContext(route, new com.sun.net.httpserver.HttpHandler {
      def handle(x: com.sun.net.httpserver.HttpExchange): Unit = {
        try {
          val body = "ok".getBytes("UTF-8")
          x.sendResponseHeaders(200, body.length.toLong)
          x.getResponseBody.write(body)
        } finally x.close()
      }
    })

  private val pool = java.util.concurrent.Executors.newCachedThreadPool()
  server.setExecutor(pool)
  server.start()

  def address: String =
    s"http://$host:${server.getAddress.getPort}/metrics"

  def close(): Unit = {
    server.stop(0)
    pool.shutdown() // non-daemon workers must not outlive the endpoint
  }
}
