package graft.jobs

import graft.ops.{Sinks, Sources}
import org.apache.spark.sql.SparkSession

/** The `merge trash` CLI subcommand (cmd/merge/trash.go:64-108): union the
  * day's trash CSVs, keep the earliest entry per (hash, source) (A3), write
  * one ts-sorted CSV with the frozen 5-column layout.
  *
  * Usage: runMain graft.jobs.TrashMergeJob <trashCsvGlob> <outDir>
  */
object TrashMergeJob {
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

    val merged = Merge.mergeTrash(Sources.readTrashCsv(spark, glob))
    Sinks.writeTrashCsv(merged, s"$outDir/trash_csv")
    println(s"[merge-trash] ${merged.count()} rows → $outDir/trash_csv")
    spark.stop()
  }
}
