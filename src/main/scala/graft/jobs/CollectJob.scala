package graft.jobs

import graft.streaming.{Collect, FeedConnector}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The `collect` CLI against a live feed endpoint (reference
  * cmd/collect/main.go + collector/node_conn*.go): dial the endpoint with
  * [[FeedConnector]] speaking the chosen wire protocol (raw lines,
  * RFC 6455 WebSocket, or gRPC-over-HTTP/2), spool the received envelopes
  * durably, and run the streaming collector pipeline (TTL dedup → F2
  * validation split → hourly-bucketed sinks) over the spool.
  *
  * The spool split mirrors the reference's at-least-once contract: the
  * only loss window is the wire itself; everything downstream of the dial
  * is exactly-once-replayable (see [[FeedConnector]]).
  *
  * Usage: runMain graft.Main collect <host> <port> <line|ws|grpc[-bloxroute|-eden|-chainbound]> <outDir> [seconds]
  *        runMain graft.Main collect            # fixture demo (StreamDemo)
  */
object CollectJob {

  def parseMode(s: String): FeedConnector.Mode = s match {
    case "line" => FeedConnector.Line
    case "ws"   => FeedConnector.Ws()
    case "grpc" => FeedConnector.Grpc() // envelope-JSON bodies (loopback/demo)
    // the real S8-S10 feeds: per-source protobuf body decode
    case "grpc-bloxroute"  => FeedConnector.Grpc(codec = graft.streaming.ProtoWire.BloxrouteProto)
    case "grpc-eden"       => FeedConnector.Grpc(codec = graft.streaming.ProtoWire.EdenProto)
    case "grpc-chainbound" => FeedConnector.Grpc(codec = graft.streaming.ProtoWire.ChainboundProto)
    case other  => sys.error(
      s"unknown feed protocol: $other (line|ws|grpc|grpc-bloxroute|grpc-eden|grpc-chainbound)")
  }

  /** Start the dial + the pipeline; callers own both lifecycles. */
  def start(spark: SparkSession, host: String, port: Int,
      mode: FeedConnector.Mode, spoolDir: String, outDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      sourceTag: String = "feed"): (FeedConnector, Seq[StreamingQuery]) = {
    // the connector only creates the spool on its first flush; the file
    // source needs the directory to exist when the stream starts
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(spoolDir))
    val conn = new FeedConnector(host, port, spoolDir, sourceTag, mode = mode).start()
    val queries = Collect.runEnvelopes(spark, spoolDir, outDir, trigger)
    (conn, queries)
  }

  def main(args: Array[String]): Unit = {
    val Array(host, portS, modeS, outDir) = args.take(4)
    val seconds = args.lift(4).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // long-running daemon: TTL dedup state lives in RocksDB (disk-bounded)
    // rather than on the executor heap
    Collect.useRocksDbState(spark)
    val spool = s"$outDir/_spool"
    val (conn, queries) = start(spark, host, portS.toInt, parseMode(modeS),
      spool, outDir, Trigger.ProcessingTime("1 second"))
    println(s"[collect] $modeS://$host:$portS → $outDir (spool: $spool)")
    seconds match {
      case Some(s) =>
        Thread.sleep(s * 1000L)
        // stop the connector FIRST: stop() final-flushes its buffered
        // tail batch to the spool, so the drain below processes every
        // spooled record in THIS run (ADVICE r6 — the old order spooled
        // the tail after the last drain and undercounted the output)
        conn.stop()
        queries.foreach(_.processAllAvailable())
      case None =>
        // run until interrupted, like the reference collector daemon
        queries.foreach(_.awaitTermination())
        conn.stop()
    }
    queries.foreach(_.stop())
    println(s"[collect] spooled ${conn.linesReceived} envelopes over " +
      s"${conn.connects} connection(s)")
    spark.stop()
  }
}
