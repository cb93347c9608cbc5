package graft.jobs

import graft.ops.{Sinks, Sources}
import org.apache.spark.sql.SparkSession

/** The `merge sourcelog` CLI subcommand (cmd/merge/sourcelog.go:64-108):
  * union the day's sourcelog CSVs, dedup to the earliest receipt per
  * (hash, source) (A2), write one ts-sorted CSV.
  *
  * Usage: runMain graft.jobs.SourcelogMergeJob <sourcelogCsvGlob> <outDir>
  */
object SourcelogMergeJob {
  def main(args: Array[String]): Unit = {
    val Array(glob, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val merged = Merge.mergeSourcelog(Sources.readSourcelogCsv(spark, glob))
    Sinks.writeSourcelogCsv(merged, s"$outDir/sourcelog_csv")
    println(s"[merge-sourcelog] ${merged.count()} rows → $outDir/sourcelog_csv")
    spark.stop()
  }
}
