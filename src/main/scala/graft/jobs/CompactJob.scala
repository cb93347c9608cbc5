package graft.jobs

import graft.ops.Sinks
import org.apache.spark.sql.SparkSession

/** `compact` CLI: rewrite a day-partitioned archive's fragmented
  * partitions into target-sized files (see
  * [[graft.ops.Sinks.compactDailyArchive]]) — the maintenance pass a
  * streaming-intake archive needs between the hourly sink and long-term
  * reads.
  *
  * Usage: runMain graft.Main compact <archiveDir> [targetMiB]
  */
object CompactJob {
  def main(args: Array[String]): Unit = {
    val (dir, targetMiB) = args.toSeq match {
      case Seq(d) => (d, 128L)
      case Seq(d, t) => (d, t.toLong)
      case _ => sys.error("usage: CompactJob <archiveDir> [targetMiB]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val done = Sinks.compactDailyArchive(spark, dir, targetMiB * 1024 * 1024)
    if (done.isEmpty) println(s"[compact] $dir already compact")
    else done.toSeq.sortBy(_._1).foreach { case (day, (before, after)) =>
      println(s"[compact] $day: $before -> $after files")
    }
    spark.stop()
  }
}
