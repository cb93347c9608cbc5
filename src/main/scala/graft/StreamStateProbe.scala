package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev probe (VERDICT r11 item 4): wall cost of the A5 streaming TTL
  * dedup under the HDFS-backed vs RocksDB state-store provider, on the
  * SAME fixture feed q_stream_dedup_ttl uses. Separates three costs the
  * bench previously smeared into one number:
  *   - one-time engine warm-up (classload + stateful-operator codegen +
  *     RocksDB JNI init) — reported separately, untimed thereafter;
  *   - per-run provider cost (state put/get/commit per micro-batch);
  *   - the fixture publish (batch write, identical for both providers).
  * Prints one JSON line per run and a summary.
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixture: the exact q_stream_dedup_ttl feed (Core.streamDedupResult).
    // try/finally below walk-deletes it — the full sf0.1 event feed as
    // text would otherwise strand in /tmp on every probe run (the same
    // problem MergeScaleBench's archive cleanup fixes).
    val p = java.nio.file.Files.createTempDirectory("stream-state-probe")
    try {
    // synthetic hash, same form as the oracle layouts' syntheticHash
    def synHash(k: org.apache.spark.sql.Column) =
      concat(lit("0x"), md5(k.cast("string")), md5((k + 1).cast("string")))
    Tables.events(spark, dir).select(concat_ws(",",
      lit(1700000000000L) + col("event_id") * 10,
      synHash(col("user_id")),
      concat(lit("0x"), md5(col("event_id").cast("string"))),
      col("event_type")).as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(s"$p/in")

    val key = "spark.sql.streaming.stateStore.providerClass"
    def withProvider[T](rocks: Boolean)(f: => T): T = {
      val prev = spark.conf.getOption(key)
      if (rocks) graft.streaming.Collect.useRocksDbState(spark)
      else spark.conf.unset(key)
      try f finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
    var qid = 0
    // parts: state-partition count for THIS one-shot throwaway-checkpoint
    // run (captured from spark.sql.shuffle.partitions at query start) —
    // r22 probes whether the oracle fixture's 32 state-store instances
    // are engine floor or fixture shape
    def runOnce(rocks: Boolean, parts: Int = cpus.toInt): Double =
      withProvider(rocks) {
        val pKey = "spark.sql.shuffle.partitions"
        val pPrev = spark.conf.get(pKey)
        spark.conf.set(pKey, parts.toString)
        try {
          qid += 1
          val qn = s"probe_dedup_$qid"
          val t0 = System.nanoTime()
          val q = graft.streaming.Collect.dedupStateful(
            graft.streaming.Collect.feed(spark, s"$p/in"))
            .writeStream.format("memory").queryName(qn).outputMode("append")
            .trigger(Trigger.AvailableNow())
            .start()
          try q.processAllAvailable() finally q.stop()
          val sec = (System.nanoTime() - t0) / 1e9
          spark.catalog.dropTempView(qn)
          sec
        } finally spark.conf.set(pKey, pPrev)
      }

    // one-time engine/provider warm-up, timed for the record
    val tWarm = System.nanoTime()
    graft.streaming.Collect.warmStreamEngine(spark)
    val warmSec = (System.nanoTime() - tWarm) / 1e9

    val runs = 3
    val hdfs = (1 to runs).map(_ => runOnce(rocks = false))
    val rocks = (1 to runs).map(_ => runOnce(rocks = true))
    val hdfs4 = (1 to runs).map(_ => runOnce(rocks = false, parts = 4))
    val rocks4 = (1 to runs).map(_ => runOnce(rocks = true, parts = 4))
    val rocks1 = (1 to runs).map(_ => runOnce(rocks = true, parts = 1))
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"""{"metric":"stream_state_probe","sf":"$dir","warm_sec":${f"$warmSec%.3f"},""" +
      s""""hdfs_runs_sec":${fmt(hdfs)},"rocksdb_runs_sec":${fmt(rocks)},""" +
      s""""hdfs_min":${f"${hdfs.min}%.3f"},"rocksdb_min":${f"${rocks.min}%.3f"},""" +
      s""""hdfs4_runs_sec":${fmt(hdfs4)},"rocksdb4_runs_sec":${fmt(rocks4)},""" +
      s""""rocksdb1_runs_sec":${fmt(rocks1)}}""")
    spark.stop()
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(q => java.nio.file.Files.deleteIfExists(q))
    }
  }
}
