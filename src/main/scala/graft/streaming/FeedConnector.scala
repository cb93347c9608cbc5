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
  * source never observes a partial file. Robustness contracts:
  *
  *  - Line assembly is byte-accurate across read-timeout ticks: a sender
  *    pausing mid-line only delays the line, never splits it.
  *  - A line truncated by a CONNECTION DROP is discarded, not spooled —
  *    a half message is wire loss, not a record.
  *  - A failed spool write keeps the batch buffered and retries on the
  *    next tick; it never kills the read loop.
  *  - The spool file sequence resumes after the largest existing file on
  *    restart, so an old spool is never overwritten (the file source
  *    tracks seen files by name — replacing one would lose BOTH copies).
  *
  * The wire protocol is pluggable ([[FeedConnector.Mode]]), sharing the
  * dial/backoff/spool plumbing:
  *
  *  - [[FeedConnector.Line]] — newline-delimited records (the raw-socket
  *    baseline).
  *  - [[FeedConnector.Ws]] — RFC 6455: opening handshake (key/accept
  *    validation), frame decode with fragmentation reassembly, ping→pong,
  *    close confirmation, via [[WsFraming]] — S6/S7's actual wire protocol
  *    (collector/node_conn.go:87-101 reads the same frames through its
  *    websocket library). One text message = one spooled envelope record.
  *  - [[FeedConnector.Grpc]] — gRPC server-streaming over HTTP/2 via
  *    [[H2Framing]]: preface/SETTINGS exchange, subscribe HEADERS + empty
  *    request message, DATA→gRPC-deframe (PADDED frames stripped per RFC
  *    9113 §6.1), ping acks, flow-control window updates — S8-S10's
  *    transport (node_conn_bloxroute.go:210-267, node_conn_eden.go:
  *    208-263, node_conn_chainbound.go:53-112). Each gRPC message body
  *    goes through the mode's [[ProtoWire.GrpcCodec]] — the per-source
  *    protobuf decoders ([[ProtoWire.BloxrouteProto]] etc.) extract the
  *    raw-tx payloads the reference reads via its generated getters, and
  *    undecodable bodies are skipped (counted), not fatal.
  *
  * In every mode a protocol error or a record truncated by a drop tears
  * the connection down and redials — wire loss, same policy as a torn
  * line.
  */
final class FeedConnector(
    host: String,
    port: Int,
    spoolDir: String,
    sourceTag: String,
    baseBackoffMs: Long = 50,
    maxBackoffMs: Long = 2000,
    flushEvery: Int = 64,
    soTimeoutMs: Int = 200,
    mode: FeedConnector.Mode = FeedConnector.Line) {

  @volatile private var stopped = false
  /** Observability for specs/ops: successful dials and lines spooled. */
  @volatile var connects: Int = 0
  @volatile var linesReceived: Long = 0
  /** gRPC message bodies the codec rejected (skip-on-error, reference
    * node_conn_*.go `continue` policy). */
  @volatile var messagesSkipped: Long = 0
  /** Last grpc-status trailer value decoded from the h2 response (0 = OK;
    * the RPC outcome per the public gRPC-over-HTTP2 spec). */
  @volatile var lastGrpcStatus: Option[Int] = None

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
    var fileSeq = nextSeq()
    val batch = scala.collection.mutable.ArrayBuffer.empty[String]
    def flushBatch(): Unit = if (batch.nonEmpty) {
      try {
        fileSeq = flush(batch.toSeq, fileSeq)
        batch.clear()
      } catch {
        // disk hiccup or an interrupt-closed channel: KEEP the batch —
        // it retries on the next tick / the post-loop final flush
        case _: java.io.IOException =>
      }
    }
    val partial = new java.io.ByteArrayOutputStream
    def emitPartialLine(): Unit = {
      val line = new String(partial.toByteArray, StandardCharsets.UTF_8)
      partial.reset()
      if (line.nonEmpty) {
        batch += line
        linesReceived += 1
      }
    }
    val buf = new Array[Byte](8192)
    while (!stopped) {
      var dialed = false
      try {
        val sock = new java.net.Socket()
        try {
          sock.connect(new java.net.InetSocketAddress(host, port), 2000)
          sock.setSoTimeout(soTimeoutMs)
          val in = sock.getInputStream
          var eof = false
          mode match {
          case FeedConnector.Ws(wsPath) =>
            // RFC 6455 opening handshake happens BEFORE the connection
            // counts as dialed: an endpoint that won't upgrade is a
            // failing endpoint, so the backoff keeps growing
            val out = sock.getOutputStream
            val key = WsFraming.newKey()
            out.write(WsFraming.handshakeRequest(host, port, wsPath, key))
            out.flush()
            val leftover = readHandshake(in, key)
            dialed = true
            connects += 1
            backoff = baseBackoffMs
            val dec = new WsFraming.Decoder
            def handle(events: Seq[WsFraming.Event]): Unit = events.foreach {
              case WsFraming.Message(text) =>
                // one WS message = one envelope record; raw newlines are
                // invalid inside a JSON envelope, so normalizing keeps the
                // spool line-oriented without corrupting valid messages
                val rec = text.replace('\r', ' ').replace('\n', ' ')
                if (rec.nonEmpty) { batch += rec; linesReceived += 1 }
              case WsFraming.Ping(p) =>
                out.write(WsFraming.encodeFrame(WsFraming.OpPong, p, masked = true))
                out.flush()
              case WsFraming.Pong(_) =>
              case WsFraming.Close =>
                try {
                  out.write(WsFraming.encodeFrame(WsFraming.OpClose,
                    Array.emptyByteArray, masked = true))
                  out.flush()
                } catch { case _: java.io.IOException => }
                eof = true
            }
            if (leftover.nonEmpty) handle(dec.feed(leftover, leftover.length))
            while (!stopped && !eof) {
              try {
                val n = in.read(buf)
                if (n < 0) eof = true
                else {
                  handle(dec.feed(buf, n))
                  if (batch.size >= flushEvery) flushBatch()
                }
              } catch {
                // read-timeout tick: a partial frame stays buffered in the
                // decoder byte-exact, complete messages flush
                case _: java.net.SocketTimeoutException => flushBatch()
              }
            }
          case FeedConnector.Grpc(path, codec) =>
            // h2 preface + our (empty) SETTINGS + the subscribe stream:
            // HEADERS then an empty request message with END_STREAM — a
            // server-streaming RPC half-closed from our side
            val out = sock.getOutputStream
            out.write(H2Framing.Preface)
            out.write(H2Framing.encodeFrame(H2Framing.TSettings, 0, 0,
              Array.emptyByteArray))
            out.write(H2Framing.encodeFrame(H2Framing.THeaders,
              H2Framing.FlagEndHeaders, 1,
              H2Framing.requestHeaderBlock(s"$host:$port", path)))
            out.write(H2Framing.encodeFrame(H2Framing.TData,
              H2Framing.FlagEndStream, 1,
              H2Framing.grpcMessage(Array.emptyByteArray)))
            out.flush()
            val frames = new H2Framing.FrameDecoder
            val grpc = new H2Framing.GrpcDeframer
            // per-connection HPACK state: the response HEADERS and the
            // grpc-status trailers decode through the full RFC 7541
            // surface (static+dynamic table, Huffman) — [[Hpack]]
            val hpack = new Hpack.Decoder
            val headerAcc = new java.io.ByteArrayOutputStream
            var endStreamPending = false
            def completeHeaderBlock(): Unit = {
              val fields =
                try hpack.decode(headerAcc.toByteArray)
                catch {
                  case e: Hpack.HpackError =>
                    // connection-level error per RFC 9113 §4.3
                    throw new java.io.IOException("hpack: " + e.getMessage)
                }
              headerAcc.reset()
              fields.find(_._1 == ":status").foreach { case (_, st) =>
                if (st == "200") {
                  if (!dialed) {
                    // the subscribe was ACCEPTED: now the dial succeeded
                    dialed = true
                    connects += 1
                    backoff = baseBackoffMs
                  }
                } else
                  // rejected subscribe = failing endpoint: backoff grows
                  throw new java.io.IOException(s"grpc subscribe rejected: :status $st")
              }
              fields.find(_._1 == "grpc-status").foreach { case (_, v) =>
                lastGrpcStatus = v.toIntOption
              }
              if (endStreamPending) eof = true
            }
            def handle(fs: Seq[H2Framing.Frame]): Unit = fs.foreach { f =>
              f.tpe match {
                case H2Framing.TSettings =>
                  if ((f.flags & H2Framing.FlagAck) == 0) {
                    out.write(H2Framing.encodeFrame(H2Framing.TSettings,
                      H2Framing.FlagAck, 0, Array.emptyByteArray))
                    out.flush()
                  }
                case H2Framing.TPing =>
                  if ((f.flags & H2Framing.FlagAck) == 0) {
                    out.write(H2Framing.encodeFrame(H2Framing.TPing,
                      H2Framing.FlagAck, 0, f.payload))
                    out.flush()
                  }
                case H2Framing.TData if f.streamId == 1 =>
                  // PADDED flag stripped per RFC 9113 §6.1 before the gRPC
                  // deframe (ADVICE r6); the codec maps each complete gRPC
                  // message body to spool records — protobuf decode for the
                  // real feeds, UTF-8 pass-through for envelope streams
                  grpc.feed(H2Framing.dataPayload(f)).foreach { msg =>
                    val recs = codec.records(msg, System.currentTimeMillis())
                    if (recs.isEmpty && msg.nonEmpty) messagesSkipped += 1
                    recs.foreach { rec => batch += rec; linesReceived += 1 }
                  }
                  // flow control: hand the consumed bytes back on both the
                  // connection and stream windows so the server can keep
                  // pushing past the 64 KiB initial window
                  if (f.payload.nonEmpty) {
                    val inc = f.payload.length
                    val wu = Array[Byte](((inc >> 24) & 0x7F).toByte,
                      ((inc >> 16) & 0xFF).toByte, ((inc >> 8) & 0xFF).toByte,
                      (inc & 0xFF).toByte)
                    out.write(H2Framing.encodeFrame(H2Framing.TWindowUpdate, 0, 0, wu))
                    out.write(H2Framing.encodeFrame(H2Framing.TWindowUpdate, 0, 1, wu))
                    out.flush()
                  }
                  if ((f.flags & H2Framing.FlagEndStream) != 0) eof = true
                case H2Framing.THeaders if f.streamId == 1 =>
                  // response headers / trailers: accumulate the block
                  // fragment (PADDED/PRIORITY stripped) until END_HEADERS,
                  // then HPACK-decode. END_STREAM on the HEADERS frame
                  // takes effect only once its block completes — trailers
                  // split across CONTINUATION must still decode.
                  headerAcc.write(H2Framing.headersFragment(f))
                  if (headerAcc.size > (1 << 20))
                    throw new java.io.IOException("header block over 1 MiB")
                  if ((f.flags & H2Framing.FlagEndStream) != 0) endStreamPending = true
                  if ((f.flags & H2Framing.FlagEndHeaders) != 0) completeHeaderBlock()
                case H2Framing.TContinuation if f.streamId == 1 =>
                  headerAcc.write(f.payload)
                  if (headerAcc.size > (1 << 20))
                    throw new java.io.IOException("header block over 1 MiB")
                  if ((f.flags & H2Framing.FlagEndHeaders) != 0) completeHeaderBlock()
                case H2Framing.TGoAway | H2Framing.TRstStream => eof = true
                case _ => // PRIORITY / unknown extension frames: ignored
              }
            }
            while (!stopped && !eof) {
              try {
                val n = in.read(buf)
                if (n < 0) eof = true
                else {
                  handle(frames.feed(buf, n))
                  if (batch.size >= flushEvery) flushBatch()
                }
              } catch {
                // read-timeout tick: partial frames stay buffered byte-exact
                case _: java.net.SocketTimeoutException => flushBatch()
              }
            }

          case FeedConnector.Line =>
            dialed = true
            connects += 1
            backoff = baseBackoffMs // reset once the endpoint answers
            partial.reset() // a new connection starts a new message stream
            while (!stopped && !eof) {
              try {
                val n = in.read(buf)
                if (n < 0) eof = true
                else {
                  var i = 0
                  while (i < n) {
                    val b = buf(i)
                    if (b == '\n') emitPartialLine()
                    else if (b != '\r') partial.write(b.toInt)
                    i += 1
                  }
                  if (batch.size >= flushEvery) flushBatch()
                }
              } catch {
                // read-timeout tick: nothing arrived for soTimeoutMs — push
                // whatever COMPLETE lines are buffered (the partial line
                // stays buffered byte-exact until its newline arrives)
                case _: java.net.SocketTimeoutException => flushBatch()
              }
            }
          }
        } finally sock.close()
      } catch {
        case _: java.io.IOException => // dial failed or connection dropped
        case _: InterruptedException => // stop() interrupting a block
      }
      // connection ended: a dangling partial line was truncated by the
      // drop — discard it (wire loss, same as the reference's WS gap);
      // spool the complete tail lines before redialing
      partial.reset()
      flushBatch()
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
    // final flush with the interrupt status cleared, so stop()'s own
    // interrupt cannot abort the write via ClosedByInterruptException
    Thread.interrupted()
    flushBatch()
  }

  /** Read + validate the server's 101 upgrade response (bounded: 5 s
    * deadline, 64 KiB header cap); returns any bytes past the header
    * terminator — frames the server pushed immediately after upgrading.
    * Throws IOException on rejection/timeout so the dial counts as
    * failed and the backoff grows. */
  private def readHandshake(in: java.io.InputStream, key: String): Array[Byte] = {
    val deadline = System.nanoTime() + 5000L * 1000000L
    val acc = new java.io.ByteArrayOutputStream
    val b = new Array[Byte](2048)
    while (!stopped && System.nanoTime() < deadline) {
      val n = try in.read(b) catch { case _: java.net.SocketTimeoutException => 0 }
      if (n < 0) throw new java.io.IOException("closed during ws handshake")
      if (n > 0) {
        acc.write(b, 0, n)
        val bytes = acc.toByteArray
        val end = headerEnd(bytes)
        if (end >= 0) {
          val head = new String(bytes, 0, end, StandardCharsets.US_ASCII)
          if (!WsFraming.validateHandshake(head, key))
            throw new java.io.IOException("ws handshake rejected")
          return java.util.Arrays.copyOfRange(bytes, end + 4, bytes.length)
        }
        if (acc.size > 65536)
          throw new java.io.IOException("ws handshake header too large")
      }
    }
    throw new java.io.IOException("ws handshake timeout")
  }

  /** Index of the \r\n\r\n header terminator, or -1. */
  private def headerEnd(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** First unused spool sequence number for this tag (restart-safe). */
  private def nextSeq(): Int = {
    val re = raw"spool-${java.util.regex.Pattern.quote(sourceTag)}-(\d+)\.json".r
    val existing = Option(new java.io.File(spoolDir).list()).toSeq.flatten
      .collect { case re(n) => n.toInt }
    if (existing.isEmpty) 0 else existing.max + 1
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

object FeedConnector {
  /** Wire protocol spoken after the TCP dial. */
  sealed trait Mode
  /** Newline-delimited records (raw-socket baseline). */
  case object Line extends Mode
  /** RFC 6455 WebSocket — S6/S7 (geth/Infura/Alchemy push feeds). */
  final case class Ws(path: String = "/ws") extends Mode
  /** gRPC server-streaming over HTTP/2 — S8-S10 (bloXroute/Eden/
    * Chainbound). `codec` decodes each gRPC message body into spool
    * records: [[ProtoWire.BloxrouteProto]] / [[ProtoWire.EdenProto]] /
    * [[ProtoWire.ChainboundProto]] for the real protobuf feeds,
    * [[ProtoWire.EnvelopeText]] (default) for envelope-JSON streams. */
  final case class Grpc(path: String = "/feed.Feed/Subscribe",
      codec: ProtoWire.GrpcCodec = ProtoWire.EnvelopeText) extends Mode
}
