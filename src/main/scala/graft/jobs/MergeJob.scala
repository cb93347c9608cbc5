package graft.jobs

import graft.functions.TxFixtures
import graft.ops.{Analyze, Sinks, Sources}
import org.apache.spark.sql.SparkSession

/** The `merge` CLI entry point (SURVEY.md §3.1; cmd/merge/transactions.go):
  * collector CSV inputs → merged, deduped, enriched archive + side outputs.
  *
  * Usage:
  *   runMain graft.jobs.MergeJob <txCsvGlob> <sourcelogGlob> <outDir> [blacklistCsvGlob]
  *   runMain graft.jobs.MergeJob --demo <outDir>   # self-generates fixture inputs
  *
  * Writes: outDir/transactions.parquet (S11), outDir/archive (the per-day
  * partitioned publish layout, day=yyyy-MM-dd/), outDir/metadata_csv
  * (S12), outDir/trash_csv (S12), outDir/summary.txt (S13).
  */
object MergeJob {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (txGlob, slGlob, outDir, blacklist) = args.toSeq match {
      case Seq("--demo", out) =>
        val in = java.nio.file.Files.createTempDirectory("merge-demo").toString
        writeDemoInputs(in, 2000)
        (s"$in/tx*.csv", s"$in/sourcelog.csv", out, None)
      case Seq(tx, sl, out) => (tx, sl, out, None)
      case Seq(tx, sl, out, bl) => (tx, sl, out, Some(bl))
      case _ => sys.error("usage: MergeJob <txCsvGlob> <sourcelogGlob> <outDir> [blacklistCsvGlob]")
    }

    val result = Merge.run(spark, Merge.Inputs(
      rawTxs = Sources.readTxCsv(spark, txGlob),
      sourcelog = Sources.readSourcelogCsv(spark, slGlob),
      blacklist = blacklist.map(Sources.readMetadataHashes(spark, _))))

    // DISK_ONLY, same measured rule as Merge's parsed stage: the sorted
    // O(input) output feeds five sinks plus the analyzer sequentially —
    // re-reads come off local disk / page cache instead of churning the
    // unified memory pool that the sort and sinks still need
    val txs = result.transactions
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    Sinks.writeParquetArchive(txs, s"$outDir/transactions.parquet")
    // the multi-day publish layout (reference README.md:82): one
    // day=yyyy-MM-dd partition per UTC receive day, pruned by day filters
    Sinks.writeDailyArchive(txs, s"$outDir/archive",
      org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.timestamp_millis(
          org.apache.spark.sql.functions.col("timestamp").cast("long")),
        "yyyy-MM-dd"))
    Sinks.writeMetadataCsv(txs, s"$outDir/metadata_csv")
    Sinks.writeTrashCsv(result.trash, s"$outDir/trash_csv")
    // opt-in raw payload CSV, like the reference's --write-tx-csv flag
    if (sys.env.get("SPARK_GRAFT_WRITE_TX_CSV").contains("1"))
      Sinks.writeRawTxCsv(txs, s"$outDir/transactions_csv")
    val report = Analyze.sprint(Analyze.summarize(txs))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/summary.txt"), report)
    println(s"[merge] archived ${txs.count()} txs, " +
      s"${result.trash.count()} trash rows → $outDir")
    spark.stop()
  }

  private def writeDemoInputs(dir: String, n: Int): Unit = {
    def txLines(lo: Int, hi: Int): String =
      (lo until hi).map { i =>
        val (ts, hash, raw) = TxFixtures.rawRow(i.toLong)
        s"$ts,$hash,$raw"
      }.mkString("\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/tx1.csv"), txLines(0, n * 2 / 3))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/tx2.csv"), txLines(n / 3, n))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/sourcelog.csv"),
      (0 until n).flatMap(i => TxFixtures.sourcelogRows(i.toLong))
        .map { case (ts, h, src) => s"$ts,$h,$src" }.mkString("\n"))
  }
}
