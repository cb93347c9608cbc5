package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: cold vs steady cost of the exact-decimal coarse k-means and
  * PQ training chains — attributes their Bench bills between one-time
  * codegen compilation and per-run decimal arithmetic. */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("warmup scan")(Tables.embeddings(spark, dir).count())
    time("coarse d2 (cold)")(queries.SimilarityOps.warmCoarseKmeans(spark, dir))
    queries.SimilarityOps.releaseCoarseKmeans(spark, dir)
    time("coarse d2 (steady)")(queries.SimilarityOps.warmCoarseKmeans(spark, dir))
    queries.SimilarityOps.releaseCoarseKmeans(spark, dir)
    time("coarse d2 (steady 2)")(queries.SimilarityOps.warmCoarseKmeans(spark, dir))
    time("pq codes (cold)")(queries.SimilarityOps.warmPqIndex(spark, dir))
    queries.SimilarityOps.releasePqIndex(spark, dir)
    time("pq codes (steady)")(queries.SimilarityOps.warmPqIndex(spark, dir))
    spark.stop()
  }
}
