package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: wall-time attribution inside the sink/RPC oracle family —
  * which published-layout build steps (fixture writes, loopback servers,
  * JDBC endpoints, compaction passes) carry each query's bench seconds. */
object SinkStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = try f catch { case e: Throwable =>
        println(s"[sink] $label FAILED: ${e.getMessage}"); -1L }
      println(f"[sink] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2fs  (rows=$n)")
    }

    // generic warm-up: one scan+shuffle so the first probe isn't billed JIT
    spark.read.parquet(s"$dir/events.parquet").groupBy("event_type").count().collect()

    val q = SparkEntry.all
    time("q_sink_jdbc_roundtrip (cold)")(q("q_sink_jdbc_roundtrip").fn(spark, dir).count())
    time("q_sink_jdbc_roundtrip (warm)")(q("q_sink_jdbc_roundtrip").fn(spark, dir).count())
    time("q_source_jdbc_pushdown")(q("q_source_jdbc_pushdown").fn(spark, dir).count())
    time("q_rpc_enrich (cold)")(q("q_rpc_enrich").fn(spark, dir).count())
    time("q_rpc_enrich (warm)")(q("q_rpc_enrich").fn(spark, dir).count())
    time("q_sink_http_fanout (cold)")(q("q_sink_http_fanout").fn(spark, dir).count())
    time("q_sink_http_fanout (warm)")(q("q_sink_http_fanout").fn(spark, dir).count())
    time("q_sink_sse_fanout (cold)")(q("q_sink_sse_fanout").fn(spark, dir).count())
    time("q_archive_day (cold)")(q("q_archive_day").fn(spark, dir).count())
    time("q_archive_cap")(q("q_archive_cap").fn(spark, dir).count())
    time("q_archive_compact (cold)")(q("q_archive_compact").fn(spark, dir).count())
    time("q_sink_hourly (cold)")(q("q_sink_hourly").fn(spark, dir).count())
    time("q_stream_dedup_ttl (cold)")(q("q_stream_dedup_ttl").fn(spark, dir).count())
    time("q_stream_window_counts (cold)")(q("q_stream_window_counts").fn(spark, dir).count())
    time("q_stream_inclusion (cold)")(q("q_stream_inclusion").fn(spark, dir).count())
    time("q_sim_ann_ivf (cold)")(q("q_sim_ann_ivf").fn(spark, dir).count())
    time("pq warm (pq_sec)")(queries.SimilarityOps.warmPqIndex(spark, dir))
    time("coarse warm (coarse_sec)")(queries.SimilarityOps.warmCoarseKmeans(spark, dir))
    time("q_embed_pq own")(q("q_embed_pq").fn(spark, dir).count())
    time("q_embed_kmeans own")(q("q_embed_kmeans").fn(spark, dir).count())
    time("q_bpe_train6 (cold)")(q("q_bpe_train6").fn(spark, dir).count())
    time("q_dedup_ngram_jaccard (cold)")(q("q_dedup_ngram_jaccard").fn(spark, dir).count())
    time("q_dedup_incremental_sem (cold)")(q("q_dedup_incremental_sem").fn(spark, dir).count())
    spark.stop()
  }
}
