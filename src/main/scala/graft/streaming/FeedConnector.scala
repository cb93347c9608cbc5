package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** S6-S10 connection manager: the reference collector's dial → read →
  * reconnect-with-backoff loop (collector/node_conn.go:87-118; every
  * node_conn_*.go adapter wraps the same shape) re-expressed Spark-first.
  *
  * The network adapter is DRIVER-SIDE plumbing, not an engine operator:
  * it maintains one TCP connection to the feed endpoint, stamps nothing
  * (the envelope lines already carry `{timestamp_ms, source, msg}`), and
  * spools received lines into a durable directory that
  * [[Collect.envelopeFeed]] reads with the replayable FILE source. That
  * split beats pointing the raw `socket` streaming source at the feed:
  * the socket source holds rows only in executor memory — a crash loses
  * them — while the spool is the collector's write-ahead record, so
  * everything downstream of the dial is exactly-once-replayable and the
  * only at-least-once window is the TCP gap itself, exactly like the
  * reference (its WS client also drops whatever the wire lost between
  * reconnects; real dedup happens in the daily merge, README.md:218).
  *
  * Reconnect policy matches node_conn.go: immediate redial after a drop,
  * capped exponential backoff between FAILED attempts, backoff reset on a
  * successful dial. Lines flush to the spool in small batches and on a
  * `soTimeoutMs` read-timeout tick, write-then-atomic-rename so the file
  * source never observes a partial file.
  */
final class FeedConnector(
    host: String,
    port: Int,
    spoolDir: String,
    sourceTag: String,
    baseBackoffMs: Long = 50,
    maxBackoffMs: Long = 2000,
    flushEvery: Int = 64,
    soTimeoutMs: Int = 200) {

  @volatile private var stopped = false
  /** Observability for specs/ops: successful dials and lines spooled. */
  @volatile var connects: Int = 0
  @volatile var linesReceived: Long = 0

  private val thread = new Thread(() => loop(), s"feed-connector-$sourceTag")

  def start(): this.type = {
    thread.setDaemon(true)
    thread.start()
    this
  }

  /** Stop the read loop, flush any buffered lines, join the thread. */
  def stop(): Unit = {
    stopped = true
    thread.interrupt()
    thread.join(5000)
  }

  private def loop(): Unit = {
    var backoff = baseBackoffMs
    var fileSeq = 0
    val batch = scala.collection.mutable.ArrayBuffer.empty[String]
    def flushBatch(): Unit = if (batch.nonEmpty) {
      fileSeq = flush(batch.toSeq, fileSeq)
      batch.clear()
    }
    while (!stopped) {
      var dialed = false
      try {
        val sock = new java.net.Socket()
        try {
          sock.connect(new java.net.InetSocketAddress(host, port), 2000)
          sock.setSoTimeout(soTimeoutMs)
          dialed = true
          connects += 1
          backoff = baseBackoffMs // reset once the endpoint answers
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(
            sock.getInputStream, StandardCharsets.UTF_8))
          var eof = false
          while (!stopped && !eof) {
            try {
              val line = in.readLine()
              if (line == null) eof = true
              else {
                batch += line
                linesReceived += 1
                if (batch.size >= flushEvery) flushBatch()
              }
            } catch {
              // read-timeout tick: nothing arrived for soTimeoutMs — push
              // whatever is buffered so stream latency stays bounded
              case _: java.net.SocketTimeoutException => flushBatch()
            }
          }
        } finally sock.close()
      } catch {
        case _: java.io.IOException => // dial failed or connection dropped
        case _: InterruptedException => // stop() interrupting a block
      }
      flushBatch() // connection ended: spool the tail before redialing
      if (!stopped) {
        if (dialed) {
          // the endpoint WAS up: redial immediately (reference behavior —
          // a served-then-closed connection is not a failing endpoint)
        } else {
          try Thread.sleep(backoff) catch { case _: InterruptedException => }
          backoff = math.min(backoff * 2, maxBackoffMs)
        }
      }
    }
    flushBatch()
  }

  /** Write-then-rename: the streaming file source lists only complete
    * files (dot-prefixed temp names are hidden to it). */
  private def flush(lines: Seq[String], seq: Int): Int = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val tmp = dir.resolve(f".part-$sourceTag-$seq%06d.tmp")
    val dst = dir.resolve(f"spool-$sourceTag-$seq%06d.json")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    seq + 1
  }
}
