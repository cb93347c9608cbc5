package graft

import graft.functions.TxFixtures
import graft.ops.Sinks
import graft.jobs.Merge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BASELINE.md comparison run: merge N synthetic raw txs end-to-end
  * (dedup → anti-join → parse w/ sender recovery → sources attach →
  * enrichment → F1 → sort → gzip parquet archive). The reference merges a
  * 1-2M-tx day in ≤30 min on one node (README.md:82).
  *
  * Usage: runMain graft.MergeScaleBench [nTx] [stages]
  *   nTx    input size (default 1,000,000)
  *   stages also print a per-phase attribution table (wall, task time,
  *          GC, spill, shuffle bytes) from real task metrics — the tool
  *          behind the r12 throughput-droop attribution (VERDICT r11
  *          item 1). The headline JSON line is measured the same either
  *          way; `stages` only adds observers.
  */
object MergeScaleBench {

  /** Accumulates executor task metrics; [[delta]] snapshots between
    * phases. All tasks run in this JVM (local mode), so jvmGCTime is the
    * executor-thread GC bill. */
  private final class MetricsAgg extends SparkListener {
    case class Snap(taskMs: Long, gcMs: Long, spillMemB: Long, spillDiskB: Long,
        shufReadB: Long, shufWriteB: Long, inputB: Long, outputB: Long)
    private var cur = Snap(0, 0, 0, 0, 0, 0, 0, 0)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      val m = e.taskMetrics
      if (m != null) cur = Snap(
        cur.taskMs + m.executorRunTime, cur.gcMs + m.jvmGCTime,
        cur.spillMemB + m.memoryBytesSpilled, cur.spillDiskB + m.diskBytesSpilled,
        cur.shufReadB + m.shuffleReadMetrics.totalBytesRead,
        cur.shufWriteB + m.shuffleWriteMetrics.bytesWritten,
        cur.inputB + m.inputMetrics.bytesRead,
        cur.outputB + m.outputMetrics.bytesWritten)
    }
    def snapshot(): Snap = synchronized(cur)
    def delta(a: Snap, b: Snap): Snap = Snap(b.taskMs - a.taskMs,
      b.gcMs - a.gcMs, b.spillMemB - a.spillMemB, b.spillDiskB - a.spillDiskB,
      b.shufReadB - a.shufReadB, b.shufWriteB - a.shufWriteB,
      b.inputB - a.inputB, b.outputB - a.outputB)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.filter(_.forall(_.isDigit)).map(_.toLong)
      .getOrElse(1000000L)
    val stages = args.contains("stages")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val agg = new MetricsAgg
    if (stages) spark.sparkContext.addSparkListener(agg)
    var last = agg.snapshot()
    def phase[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      if (stages) {
        // listener events post async; poll until the metric stream goes
        // quiet (two identical 200 ms-apart snapshots) before reading
        var prev = agg.snapshot()
        var settled = false
        var tries = 0
        while (!settled && tries < 50) {
          Thread.sleep(200)
          val s = agg.snapshot()
          settled = s == prev
          prev = s
          tries += 1
        }
        val now = agg.snapshot()
        val d = agg.delta(last, now)
        last = now
        println(f"[phase] $label%-22s wall=$sec%7.1fs task=${d.taskMs / 1e3}%8.1fs " +
          f"gc=${d.gcMs / 1e3}%6.1fs spill=${d.spillDiskB / 1e9}%6.2fGB " +
          f"shufR=${d.shufReadB / 1e9}%6.2fGB shufW=${d.shufWriteB / 1e9}%6.2fGB " +
          f"in=${d.inputB / 1e9}%6.2fGB out=${d.outputB / 1e9}%6.2fGB")
      }
      r
    }

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
    // Phase split mirrors the DAG's one materialization barrier (the
    // DISK_ONLY parsed cache): everything up to the parse runs under
    // "gen+dedup+parse"; the archive write then re-reads parsed from
    // disk and runs sources-agg, joins, range sort and the gzip write.
    if (stages) phase("gen+dedup+parse")(result.parsed.count())
    phase("attach+sort+write")(
      Sinks.writeParquetArchive(result.transactions, s"$out/archive"))
    val secs = (System.nanoTime() - t0) / 1e9
    val archived = phase("verify count")(
      spark.read.parquet(s"$out/archive").count())
    val sizeMb = new java.io.File(s"$out/archive").listFiles()
      .map(_.length()).sum / 1e6
    println(f"""{"metric":"merge_1m","n_input":$n,"archived":$archived,"wall_sec":$secs%.1f,"archive_mb":$sizeMb%.1f,"tx_per_sec":${n / secs}%.0f}""")
    spark.stop()
  }
}
