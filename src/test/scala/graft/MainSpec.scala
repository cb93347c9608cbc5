package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dispatch-table checks for the root CLI (reference cmd/main.go:15-30);
  * the end-to-end `Main merge --demo` path is exercised by MergeJobSpec's
  * job-level coverage plus the README-documented manual run. */
class MainSpec extends AnyFunSuite {

  private def target(args: String*): Option[String] =
    Main.route(args.toList).map(_._1)

  test("subcommands route to the matching job main") {
    assert(target("collect") == Some("StreamDemo"))
    assert(target("collect", "h", "80", "ws", "out") == Some("CollectJob"))
    assert(target("merge", "a.csv", "b.csv", "out") == Some("MergeJob"))
    assert(target("merge", "--demo", "out") == Some("MergeJob"))
    assert(target("merge", "sourcelog", "g", "out") == Some("SourcelogMergeJob"))
    assert(target("merge", "trash", "g", "out") == Some("TrashMergeJob"))
    assert(target("analyze", "dir", "f") == Some("AnalyzeJob"))
    assert(target("corpus", "d", "o") == Some("CorpusBuildJob"))
    assert(target("compact", "dir") == Some("CompactJob"))
    assert(target("website", "dir", "out") == Some("WebsiteJob"))
    assert(target("teleport") == None)
  }

  test("feed protocol names map to wire modes incl. per-source protobuf codecs") {
    import graft.jobs.CollectJob.parseMode
    import graft.streaming.{FeedConnector, ProtoWire}
    assert(parseMode("line") == FeedConnector.Line)
    assert(parseMode("ws") == FeedConnector.Ws())
    assert(parseMode("grpc") == FeedConnector.Grpc())
    assert(parseMode("grpc-bloxroute") ==
      FeedConnector.Grpc(codec = ProtoWire.BloxrouteProto))
    assert(parseMode("grpc-eden") ==
      FeedConnector.Grpc(codec = ProtoWire.EdenProto))
    assert(parseMode("grpc-chainbound") ==
      FeedConnector.Grpc(codec = ProtoWire.ChainboundProto))
    assertThrows[RuntimeException](parseMode("smoke-signals"))
  }

  test("dispatch consumes the command words, passes the rest through") {
    assert(Main.consumed(List("merge", "sourcelog", "g", "o")) == 2)
    assert(Main.consumed(List("merge", "trash", "g", "o")) == 2)
    assert(Main.consumed(List("merge", "a", "b", "o")) == 1)
    assert(Main.consumed(List("analyze", "d", "f")) == 1)
  }
}
