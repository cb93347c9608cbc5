package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: what post-shuffle partition count AQE hands the parse
  * stage under the bench session settings, and which knob restores full
  * parallelism for the CPU-bound parse projection without a second
  * shuffle. */
object AqeParseProbe {
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
    println(s"[aqe] defaultParallelism = ${spark.sparkContext.defaultParallelism}")

    val raw = queries.MempoolParse.rawTxs(spark, dir)
      .withColumn("hash", lower(col("hash"))).cache()
    raw.count()
    def dedup = raw.groupBy("hash")
      .agg(min(struct(col("timestamp_ms"), col("raw_tx_hex"))).as("f"))
      .select(col("hash"), col("f.timestamp_ms").as("timestamp_ms"),
        col("f.raw_tx_hex").as("raw_tx_hex"))

    def report(tag: String): Unit = {
      val parsed = graft.functions.ParseTx.project(dedup.drop("hash"))
      val t0 = System.nanoTime()
      val n = parsed.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val parts = parsed.rdd.getNumPartitions
      println(f"[aqe] $tag%-52s parts=$parts%3d  $sec%6.2fs (rows=$n)")
    }
    report("defaults")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
    report("minPartitionSize=64k")
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.minPartitionSize")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    report("parallelismFirst=true (explicit)")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    report("advisory=1m")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    report("coalesce disabled")
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    report("defaults again")
    spark.stop()
  }
}
