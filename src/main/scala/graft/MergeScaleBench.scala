package graft

import graft.functions.TxFixtures
import graft.ops.Sinks
import graft.jobs.Merge
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BASELINE.md comparison run: merge N synthetic raw txs end-to-end
  * (dedup → anti-join → parse w/ sender recovery → sources attach →
  * enrichment → F1 → sort → gzip parquet archive). The reference merges a
  * 1-2M-tx day in ≤30 min on one node (README.md:82).
  *
  * Usage: runMain graft.MergeScaleBench [nTx]  (default 1,000,000)
  */
object MergeScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val out = java.nio.file.Files.createTempDirectory("merge-scale").toString
    val t0 = System.nanoTime()
    val raw = spark.range(n).as[Long].mapPartitions(_.map(TxFixtures.rawRow))
      .toDF("timestamp_ms", "hash", "raw_tx_hex")
    val sl = spark.range(n).as[Long].mapPartitions(_.flatMap(TxFixtures.sourcelogRows))
      .toDF("timestamp_ms", "hash", "source")
    val blocks = spark.range(n).as[Long].filter((i: Long) => i % 4 == 0)
      .mapPartitions(_.map { i =>
        val (ts, hash, _) = TxFixtures.rawRow(i)
        (hash, 18000000L + i / 100, ts + 4000 + i % 2000)
      }).toDF("hash", "block_number", "block_ts_ms")

    val result = Merge.run(spark, Merge.Inputs(raw, sl, None, Some(blocks)))
    Sinks.writeParquetArchive(result.transactions, s"$out/archive")
    val secs = (System.nanoTime() - t0) / 1e9
    val archived = spark.read.parquet(s"$out/archive").count()
    val sizeMb = new java.io.File(s"$out/archive").listFiles()
      .map(_.length()).sum / 1e6
    println(f"""{"metric":"merge_1m","n_input":$n,"archived":$archived,"wall_sec":$secs%.1f,"archive_mb":$sizeMb%.1f,"tx_per_sec":${n / secs}%.0f}""")
    spark.stop()
  }
}
