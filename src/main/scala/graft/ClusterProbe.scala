package graft

import graft.queries.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where q_dedup_clusters time goes — pair generation vs the
  * label-propagation loop — measured twice so warm-up is visible
  * (bench noise on this box swings whole-run totals 4-8×; per-stage
  * deltas in one process are the reliable signal). */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // shuffle warm-up

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    for (pass <- 1 to 2) {
      val pairs = time(s"#$pass pairs gen+cache") {
        val p = DedupOps.embeddingCosPairs(spark, dir).select("vec_a", "vec_b").cache()
        p.count(); p
      }
      val edges = pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"))
        .union(pairs.select(col("vec_b").as("src"), col("vec_a").as("dst")))
        .cache()
      edges.count()
      val nodes = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id")
      val ml = time(s"#$pass min-label loop") {
        DedupOps.minLabelComponents(edges, nodes)
      }
      println(s"[probe] #$pass min-label rounds = ${ml.rounds}")
      val st = time(s"#$pass star loop") {
        DedupOps.starComponents(pairs.select(col("vec_a").as("src"), col("vec_b").as("dst")), nodes)
      }
      println(s"[probe] #$pass star rounds = ${st.rounds}")
      time(s"#$pass labels count") { ml.labels.count() }
      pairs.unpersist(); edges.unpersist()
    }
    spark.stop()
  }
}
