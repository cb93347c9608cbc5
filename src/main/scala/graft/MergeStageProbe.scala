package graft

import graft.queries.MempoolParse
import org.apache.spark.sql.SparkSession

/** Dev probe: stage-by-stage wall times of the flagship merge DAG at a
  * given SF dir, to locate where q_mempool_merge's bench time goes. */
object MergeStageProbe {
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

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs  (rows=$n)")
    }
    // warmup (same as Bench: one shuffle + JIT the parse stack)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    locally {
      var i = 0L
      while (i < 3000) {
        graft.functions.ParseTx.parseHex(graft.functions.TxFixtures.rawTxHex(i))
        i += 1
      }
    }

    // fresh full DAG, twice, BEFORE the per-stage probes: #1 is exactly
    // what Bench bills to q_mempool_merge (codegen+JIT cold), #2 is the
    // steady-state cost — the delta is warm-up, not engine work
    def freshMerge(d: String = dir) = {
      import graft.jobs.Merge
      import org.apache.spark.sql.functions._
      val raws = MempoolParse.rawTxs(spark, d)
      Merge.run(spark, Merge.Inputs(
        rawTxs = raws,
        sourcelog = MempoolParse.sourcelog(spark, d),
        blacklist = Some(raws.filter(col("timestamp_ms") % 31 === 0).select("hash")),
        blocks = Some(MempoolParse.blocks(spark, d))))
    }
    // optional warm-up merge first (arg 2): a dir measures how much of #1
    // a different-SF warm-up absorbs; "shape" runs the same-shape
    // disjoint-row warm-up Bench uses (MempoolParse.warmMergeShape)
    args.drop(1).headOption.foreach {
      case "shape" =>
        time(s"warm merge (same-shape)") {
          MempoolParse.warmMergeShape(spark, dir); 0L
        }
      case warmDir =>
        time(s"warm merge @$warmDir")(freshMerge(warmDir).transactions.count())
    }
    time("fresh merge #1 (bench-cold)")(freshMerge().transactions.count())
    time("fresh merge #2 (steady)")(freshMerge().transactions.count())

    time("rawTxs gen")(MempoolParse.rawTxs(spark, dir).count())
    time("sourcelog gen")(MempoolParse.sourcelog(spark, dir).count())
    time("blocks gen")(MempoolParse.blocks(spark, dir).count())

    // replicate Merge.run stage by stage
    import org.apache.spark.sql.functions._
    val raw = MempoolParse.rawTxs(spark, dir)
      .withColumn("hash", lower(col("hash")))
    val deduped = raw
      .groupBy("hash")
      .agg(min(struct(col("timestamp_ms"), col("raw_tx_hex"))).as("f"))
      .select(col("hash"), col("f.timestamp_ms").as("timestamp_ms"),
        col("f.raw_tx_hex").as("raw_tx_hex"))
    time("dedup agg")(deduped.count())
    val bl = MempoolParse.rawTxs(spark, dir)
      .filter(col("timestamp_ms") % 31 === 0)
      .select(lower(col("hash")).as("hash")).distinct()
    time("blacklist branch")(bl.count())
    val fresh = deduped.join(broadcast(bl), Seq("hash"), "left_anti")
    val parsed = graft.functions.ParseTx.project(fresh.drop("hash"))
    time("parse (post-dedup)")(parsed.count())
    // AQE coalesces the small dedup shuffle output by BYTES; the parse UDF
    // is CPU-bound (~70 µs secp recovery/row), so partition count here is
    // the parse stage's parallelism — 1 partition = serial parse.
    println(s"[stage] parse-stage partitions: " +
      parsed.rdd.getNumPartitions)
    val parsedWide = graft.functions.ParseTx.project(
      fresh.drop("hash").repartition(cpus.toInt))
    time("parse (repartitioned)")(parsedWide.count())
    val sourcesByHash = MempoolParse.sourcelog(spark, dir)
      .withColumn("hash", lower(col("hash")))
      .groupBy("hash", "source").agg(min("timestamp_ms").as("first_ts"))
      .groupBy("hash")
      .agg(transform(
        array_sort(collect_list(struct(col("first_ts"), col("source")))),
        x => x.getField("source")).as("sources"))
    time("sources double-agg")(sourcesByHash.count())

    val out = MempoolParse.mergeOutput(spark, dir)
    time("transactions (full DAG)")(out.transactions.count())
    time("transactions (cached)")(out.transactions.count())
    time("trash")(out.trash.count())
    spark.stop()
  }
}
