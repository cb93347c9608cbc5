package graft

import org.apache.spark.sql.SparkSession

/** Prints physical plans for headline queries so plan regressions (lost
  * pushdown, missed broadcast, surprise shuffles) are visible in review. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    // dir/cpus from the bench env so production-path plans (sf0.1 — where
    // the float paths run instead of the exact-decimal verify twins) can
    // be dumped too; defaults preserve the original sf0.01/local[8] shape
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filter_threshold", "q_agg_pricing", "q_join_dim_chain",
        "q_join_anti", "q_merge_pipeline", "q_sim_topk",
        "q_dedup_ngram_jaccard", "q_dedup_minhash", "q_envelope_decode",
        // the three queries the r9 driver bench flagged under contention —
        // plans on record so a flagged number can be reviewed against them
        "q_dedup_incremental", "q_select_dsir", "q_bpe_train6")
    names.foreach { n =>
      println(s"\n════════ $n ════════")
      SparkEntry.all(n).fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
