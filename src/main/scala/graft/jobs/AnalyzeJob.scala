package graft.jobs

import graft.ops.{Analyze, Sources}
import org.apache.spark.sql.SparkSession

/** The `analyze` entry point (SURVEY.md §3.2; cmd/analyze/main.go:46-140):
  * read a merged parquet archive, compute the summary aggregate pack, write
  * the text report.
  *
  * Usage: runMain graft.jobs.AnalyzeJob <archiveDir> <outFile> [maxRows]
  */
object AnalyzeJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AnalyzeJob <archiveDir> <outFile> [maxRows]")
    val Array(archive, outFile) = args.take(2)
    val max = args.lift(2).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val txs = Sources.readArchive(spark, archive, max)
    val report = Analyze.sprint(Analyze.summarize(txs))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), report)
    println(report)
    spark.stop()
  }
}
