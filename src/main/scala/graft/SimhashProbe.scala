package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall costs of the simhash pipeline. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    time("warmup scan")(docs.count())
    val planted = queries.DedupOps.withPlanted(spark, dir)
    time("planted")(planted.count())
    val words = planted.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    time("explode words")(words.count())
    time("explode words (steady)")(words.count())
    val hashed = words.select(col("doc_id"), md5(col("w")).as("h"))
    time("+md5")(hashed.count())
    time("+md5 agg")(hashed.select(col("doc_id"), substring(col("h"), 1, 4).as("p"))
      .groupBy("doc_id").agg(max("p")).count())
    val chunked = hashed.select(col("doc_id") +: (0 until 8).map(j =>
      conv(substring(col("h"), 4 * j + 1, 4), 16, 10).cast("int").as(s"c$j")): _*)
    time("+conv chunks")(chunked.agg(sum("c0")).count())
    time("+conv chunks (steady)")(chunked.agg(sum("c0")).count())
    val bitAggs = (for (j <- 0 until 8; b <- 0 until 16) yield
      sum(shiftright(col(s"c$j"), b).bitwiseAND(1).cast("long"))
        .as(s"v${j}_$b")).toSeq
    val votes = chunked.groupBy("doc_id")
      .agg(count(lit(1)).as("w"), bitAggs: _*)
    time("+129-col vote agg")(votes.count())
    time("+129-col vote agg (steady)")(votes.count())
    time("full query")(SparkEntry.queries("q_dedup_simhash")(spark, dir).count())
    time("full query again")(SparkEntry.queries("q_dedup_simhash")(spark, dir).count())
    spark.stop()
  }
}
