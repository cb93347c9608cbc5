package graft

/** Root CLI dispatcher (reference cmd/main.go:15-30): one entry point with
  * the reference's subcommand surface, delegating to the existing job
  * mains. `corpus` is the training-data-pipeline extension; `website`
  * covers the reference's static-site build (S3 upload stays out of
  * scope offline).
  *
  * Usage:
  *   runMain graft.Main collect                      # streaming collector demo
  *   runMain graft.Main merge <tx…>                  # transactions merge (MergeJob)
  *   runMain graft.Main merge sourcelog <glob> <out> # sourcelog merge
  *   runMain graft.Main merge trash <glob> <out>     # trash merge
  *   runMain graft.Main analyze <archive> <outFile>  # summary report
  *   runMain graft.Main corpus <docs> <out> [eval]   # corpus build
  */
object Main {

  private val usage: String =
    """usage: graft <command> [args]
      |
      |commands:
      |  collect                                    streaming collector demo (fixtures)
      |  collect <host> <port> <line|ws|grpc[-bloxroute|-eden|-chainbound]> <out> [sec]  collect from a live feed
      |  merge <txCsvGlob> <slGlob> <out> [blGlob]  merge the day's transactions
      |  merge --demo <out>                         merge self-generated fixtures
      |  merge sourcelog <slCsvGlob> <out>          merge the day's sourcelog
      |  merge trash <trashCsvGlob> <out>           merge the day's trash
      |  analyze <archiveDir> <outFile> [maxRows]   summarize a merged archive
      |  corpus <docsPath> <outDir> [evalDocsPath]  build a training corpus
      |  compact <archiveDir> [targetMiB]           compact a day-partitioned archive
      |  website <archiveDir> <outDir>              build the archive index site
      |""".stripMargin

  /** Routing table, separated from main so the dispatch is spec-testable
    * without spinning a SparkSession or trapping sys.exit. */
  private[graft] def route(args: List[String]): Option[(String, Array[String] => Unit)] =
    args match {
      case "collect" :: Nil              => Some(("StreamDemo", StreamDemo.main _))
      case "collect" :: _                => Some(("CollectJob", jobs.CollectJob.main _))
      case "merge" :: "sourcelog" :: _   => Some(("SourcelogMergeJob", jobs.SourcelogMergeJob.main _))
      case "merge" :: "trash" :: _       => Some(("TrashMergeJob", jobs.TrashMergeJob.main _))
      case "merge" :: _                  => Some(("MergeJob", jobs.MergeJob.main _))
      case "analyze" :: _                => Some(("AnalyzeJob", jobs.AnalyzeJob.main _))
      case "corpus" :: _                 => Some(("CorpusBuildJob", jobs.CorpusBuildJob.main _))
      case "compact" :: _                => Some(("CompactJob", jobs.CompactJob.main _))
      case "website" :: _                => Some(("WebsiteJob", jobs.WebsiteJob.main _))
      case _                             => None
    }

  /** Args consumed by the dispatch itself (command + optional subcommand). */
  private[graft] def consumed(args: List[String]): Int = args match {
    case "merge" :: ("sourcelog" | "trash") :: _ => 2
    case _                                       => 1
  }

  def main(args: Array[String]): Unit = args.toList match {
    case Nil | ("help" | "--help" | "-h") :: _ =>
      println(usage)
    case rest =>
      route(rest) match {
        case Some((_, target)) => target(rest.drop(consumed(rest)).toArray)
        case None =>
          System.err.println(s"unknown command: ${rest.head}\n$usage")
          sys.exit(2)
      }
  }
}
