package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: per-stage wall costs of the ngram-jaccard pipeline. */
object NgramProbe {
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
    graft.functions.GraftFunctions.register(spark)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val t = 0.7
    val docs = Tables.documents(spark, dir)
    time("warmup scan")(docs.count())
    val sh2 = docs.select(col("doc_id"), col("lang"), col("source"),
      explode(graft.functions.TextNgrams.char_ngram_codes(
        col("text"), lit(3))).as("s"))
    time("explode only")(sh2.count())
    val dfreq = sh2.groupBy("s").agg(count(lit(1)).as("df"))
    val dict = dfreq.select(col("s"),
      row_number().over(Window.orderBy(col("df"), col("s"))).as("sid"))
    time("dict")(dict.count())
    val perDoc = sh2.join(broadcast(dict), Seq("s"))
      .groupBy("doc_id", "lang", "source")
      .agg(array_sort(collect_list(col("sid"))).as("sh"))
      .withColumn("n", size(col("sh")))
      .withColumn("plen", (col("n") - ceil(col("n") * t) + 1).cast("int"))
      .cache()
    time("perDoc agg+cache")(perDoc.count())
    val prefix = perDoc.select(col("doc_id"), col("n"), col("lang"),
        col("source"), posexplode(slice(col("sh"), lit(1), col("plen"))))
      .select(col("doc_id"), col("n"), col("lang"), col("source"),
        col("pos").as("p"), col("col").as("sid"))
    time("prefix explode")(prefix.count())
    val key = xxhash64(col("lang"), col("source"), col("sid"))
    val a = prefix.select(key.as("k"), col("doc_id").as("doc_a"),
      col("n").as("na"), col("p").as("pa"))
    val b = prefix.select(key.as("k"), col("doc_id").as("doc_b"),
      col("n").as("nb"), col("p").as("pb"))
    val minO = floor((lit(7) * (col("na") + col("nb")) + lit(16)) / lit(17))
    val joined = a.join(b, Seq("k"))
      .filter(col("doc_a") < col("doc_b") &&
        col("na") * 10 >= col("nb") * 7 && col("nb") * 10 >= col("na") * 7 &&
        lit(1) + least(col("na") - col("pa") - 1, col("nb") - col("pb") - 1) >= minO)
    time("join+filters predistinct")(joined.count())
    val cand = joined.select("doc_a", "doc_b", "na", "nb").distinct()
    time("cand distinct")(cand.count())
    val sets = perDoc.select(col("doc_id"), col("sh"))
    val out = broadcast(cand)
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", col("i") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= t)
    time("verify")(out.count())
    perDoc.unpersist()
    time("full query")(SparkEntry.queries("q_dedup_ngram_jaccard")(spark, dir).count())
    time("full query 2nd")(SparkEntry.queries("q_dedup_ngram_jaccard")(spark, dir).count())
    spark.stop()
  }
}
